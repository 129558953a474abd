"""Headline benchmark: full-loop localization throughput on one chip.

Runs the complete per-frame pipeline (RDP featurization, dense
scan-to-map association against the mapCache prior, fusion, UKF) as a
jitted lax.scan rollout on the default JAX backend (TPU under the
driver; CPU elsewhere), and compares against the REAL C++ reference
engine compiled from its sources and timed live on this host
(scripts/refbench/; the reference's 30-thread pool gets all cores).
If the reference cannot be built/run here, falls back to the
reference-semantics numpy oracle (lsdtpu/oracle/).

Prints ONE JSON line:
  {"metric": "scans_per_sec", "value": N, "unit": "scans/s",
   "vs_baseline": N / reference_scans_per_sec, ...}

Auxiliary numbers (ATE, tracking rate, batch mode) go to stderr.

The headline number is the single-sequence rollout - the reference's
own execution shape (one sequential driver loop,
main_on_windows.cpp:105-185) and the measured per-chip optimum:
vmapping B sequences on one chip runs the sequential chains in
lockstep and loses throughput (docs/RESULTS.md r3 mode table).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

DATA = "/root/reference/data_20190513/data_f3key/data1"
# The headline value is the MEDIAN of >= 3 timed repeats - one sample
# taken right before a hang is not a measurement (VERDICT r2 weak #1).
# Each repeat is TIME-TO-VALUE: it materializes the poses on the host,
# because block_until_ready returns at enqueue through the relay
# (round-3 correction; see timed_run).
REPEATS = 5
FALLBACK_BASELINE = 105.2  # oracle scans/s measured on this host 2026-08-17


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def prepare_map_cached(ds):
    """Oracle map prep (LSD lines + distance field), cached by content
    hash under ~/.cache/lsdtpu (runtime/artifacts.py)."""
    from lsdtpu.runtime.artifacts import prepare_map_cached as pmc

    return pmc(ds.map_value, ds.param.resol, backend="oracle")


def measure_baseline(ds, art, n_frames: int = 60) -> float:
    from lsdtpu.oracle import driver as odrv

    class Art:
        lines_info, map_cache = art

    try:
        t0 = time.perf_counter()
        odrv.run_sequence(ds, Art, max_frames=n_frames)
        dt = time.perf_counter() - t0
        return n_frames / dt
    except Exception as e:  # pragma: no cover - keep bench robust
        log("baseline measurement failed:", e)
        return FALLBACK_BASELINE


def measure_reference_baseline(n_runs: int = 3):
    """Build (cached) and time the actual C++ reference engine on DATA.
    Returns (scans_per_sec, n_reset_frames, note) for the chosen run,
    or None if unavailable.  `note` quantifies the broken-run bias
    (see below).

    The reference is nondeterministic: its threadpool race can drop
    scoring tasks, which both LOSES TRACKING and makes the run FASTER
    (less work) - so a naive best-of-N favors broken runs.  Each run
    dumps its pose trace; the baseline is the fastest run with ZERO
    reset frames, falling back to the fastest overall (logged) when
    every run broke."""
    import re
    import subprocess
    import tempfile

    repo = os.path.dirname(os.path.abspath(__file__))
    bin_path = os.path.join(repo, "build", "refbench", "lsd_refbench")
    try:
        if not os.path.exists(bin_path):
            subprocess.run(
                ["sh", os.path.join(repo, "scripts", "refbench",
                                    "build.sh")],
                check=True, capture_output=True, timeout=300)
        runs = []   # (scans_per_sec, n_reset, n_frames)
        with tempfile.TemporaryDirectory() as td:
            for i in range(n_runs):
                dump = os.path.join(td, f"poses{i}.txt")
                out = subprocess.run([bin_path, DATA, "0", dump],
                                     check=True, capture_output=True,
                                     text=True, timeout=300)
                m = re.search(r"= ([0-9.]+) scans/s", out.stdout)
                if not m:
                    continue
                poses = np.loadtxt(dump, ndmin=2)
                runs.append((float(m.group(1)),
                             int((poses[:, 0] == -1.0).sum()),
                             poses.shape[0]))
        if not runs:
            return None
        clean = [r for r in runs if r[1] == 0]
        if clean:
            sps, resets, _ = max(clean)
            return sps, resets, "fastest tracking-clean run (no bias)"
        sps, resets, _ = max(runs)
        note = _healthy_run_note(runs)
        log(f"reference lost tracking in ALL {n_runs} runs "
            f"(resets: {[r[1] for r in runs]}) - baseline uses the "
            f"fastest broken run; {note}")
        return sps, resets, note
    except Exception as e:  # pragma: no cover - keep bench robust
        log("reference baseline unavailable:", e)
        return None


def _healthy_run_note(runs) -> str:
    """Estimate what a tracking-healthy reference run would cost.

    The reference's threadpool races drop scoring tasks, which loses
    tracking; a reset event changes the per-frame cost in BOTH
    directions (the lost frame skips most FA work - cheaper - while
    the following relock frame sweeps the full candidate set with the
    HMM gate open - dearer).  With per-run (total time, reset count)
    samples, a least-squares fit of
        time_i = (F - r_i) * t_track + r_i * t_event
    separates the per-tracking-frame cost from the per-reset-event
    cost; F / (F * t_track) is then the hypothetical healthy-run
    throughput.  With degenerate samples (all reset counts equal) the
    system is singular and only the observed band is reported.
    Reference for the races: LSD/myFA.cpp:45-62."""
    times = np.array([n / s for s, r, n in runs])       # total seconds
    resets = np.array([float(r) for _s, r, _n in runs])
    frames = np.array([float(n) for _s, _r, n in runs])
    band = f"broken-run band {min(s for s, _r, _n in runs):.0f}-" \
        f"{max(s for s, _r, _n in runs):.0f} scans/s"
    if len(runs) < 2 or np.ptp(resets) == 0:
        return f"healthy-run cost not separable ({band})"
    A = np.stack([frames - resets, resets], axis=1)
    (t_track, t_event), *_ = np.linalg.lstsq(A, times, rcond=None)
    if t_track <= 0:
        return f"healthy-run fit degenerate ({band})"
    healthy = 1.0 / t_track
    return (f"hypothetical tracking-healthy reference ~{healthy:.0f} "
            f"scans/s (lstsq over {len(runs)} runs: "
            f"{t_track * 1e3:.2f} ms/tracking-frame, "
            f"{t_event * 1e3:+.2f} ms/reset-event; {band})")


BEST = {"json": None}


def device_healthy(timeout_s: float, retries: int = 3,
                   retry_wait_s: float = 30.0) -> bool:
    """Probe the default JAX backend with a tiny device op in a
    SUBPROCESS (the axon TPU tunnel can wedge: device calls then hang
    forever and would take this process with them - CLAUDE.md).  A
    hung/failed probe means the bench must not touch the device.

    Retries with a pause: probe failures have been observed transient
    (other live jax processes can contend for the single-client relay),
    and a CPU fallback costs 3 orders of magnitude on the recorded
    number - worth a couple of minutes of patience.  The env is passed
    through UNCHANGED: PYTHONPATH points at the sitecustomize that
    registers the axon PJRT plugin (replacing or clearing it breaks
    device discovery entirely)."""
    import subprocess

    code = ("import jax, jax.numpy as jnp; x = jnp.ones((128, 128)); "
            "(x @ x).block_until_ready(); print('probe-ok')")
    for attempt in range(retries):
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               timeout=timeout_s, capture_output=True,
                               text=True)
            if r.returncode == 0 and "probe-ok" in r.stdout:
                return True
        except Exception:
            pass
        if attempt < retries - 1:
            log(f"device probe attempt {attempt + 1}/{retries} failed - "
                f"retrying in {retry_wait_s:.0f}s")
            time.sleep(retry_wait_s)
    return False


def _arm_watchdog(seconds: float):
    """The axon TPU tunnel can wedge (observed: device calls hang
    indefinitely, sometimes mid-benchmark).  If the bench stalls, emit
    the best result seen so far (or a zero marker) so the driver
    records something instead of hanging."""
    import threading

    def fire():
        log(f"WATCHDOG: no completion after {seconds:.0f}s - device hung")
        if BEST["json"]:
            print(BEST["json"], flush=True)
            os._exit(0)      # valid measurement despite the hang
        print(json.dumps(
            {"metric": "scans_per_sec", "value": 0.0, "unit": "scans/s",
             "vs_baseline": 0.0}), flush=True)
        os._exit(3)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def main():
    import jax

    probe_s = float(os.environ.get("LSDTPU_PROBE_TIMEOUT", "90"))
    if os.environ.get("LSDTPU_BENCH_BACKEND") == "cpu":
        # explicit CPU run (protocol testing / CI) - skip the probe
        log("LSDTPU_BENCH_BACKEND=cpu - forcing the host CPU backend")
        jax.config.update("jax_platforms", "cpu")
    elif not device_healthy(probe_s):
        # wedged tunnel / no device: measure on the CPU backend instead
        # of hanging into the watchdog's zero marker.  Logged loudly -
        # the recorded number is then host-CPU, not TPU.
        log(f"DEVICE PROBE FAILED ({probe_s:.0f}s x3) - "
            "falling back to the CPU backend for this run")
        jax.config.update("jax_platforms", "cpu")

    # Armed after the probe phase (probes run in subprocesses with their
    # own timeouts and cannot hang this process) so probe retries don't
    # eat the measurement budget.
    # default raised for the round-3 protocol: 3 C++ baseline runs
    # (~180 s) + ~80 s compile + 5 time-to-value repeats fit with room
    watchdog = _arm_watchdog(float(os.environ.get(
        "LSDTPU_BENCH_TIMEOUT", "600")))

    from lsdtpu.eval import ate as eval_ate
    from lsdtpu.io import load_dataset
    from lsdtpu.runtime import make_map_context, run_sequence, stack_frames

    t0 = time.perf_counter()
    ds = load_dataset(DATA)
    art = prepare_map_cached(ds)
    log(f"setup: {time.perf_counter() - t0:.1f}s, "
        f"{len(ds.frames)} frames, {art[0].shape[0]} map lines, "
        f"backend={jax.default_backend()} x{jax.device_count()}")

    ref = measure_reference_baseline()
    if ref is not None:
        baseline, baseline_resets, baseline_note = ref
        baseline_kind = "cpp-reference"
        log(f"baseline: {baseline:.1f} scans/s (REAL C++ reference, "
            f"best of 3 runs, {os.cpu_count()} cores, "
            f"{baseline_resets} reset frames in that run)")
    else:
        baseline, baseline_kind = measure_baseline(ds, art), "oracle"
        baseline_resets = 0
        baseline_note = "race-free numpy oracle (no broken-run bias)"
        log(f"baseline: {baseline:.1f} scans/s (numpy oracle fallback)")

    # pin the compiled shape that has proven stable on the axon tunnel
    # (K=4096 candidates x P=2048 pixels; data1 frames stay under the
    # pixel cap so results are identical to the full-cloud default)
    import dataclasses

    from lsdtpu.config import DEFAULT
    cfg = dataclasses.replace(
        DEFAULT, shapes=dataclasses.replace(
            DEFAULT.shapes, max_candidates=4096, max_scan_pixels=2048))

    ctx = make_map_context(art[0], art[1], ds.param.resol, ds.param.ori_x,
                           ds.param.ori_y, dtype=np.float32)
    frames = stack_frames(ds, dtype=np.float32)
    F = frames["ranges"].shape[0]

    t0 = time.perf_counter()
    outs = run_sequence(frames, ctx, cfg)
    np.asarray(outs["pose"])       # time-to-value (see timed_run note)
    log(f"compile+first run: {time.perf_counter() - t0:.1f}s")

    import statistics
    times = []

    def result_json(extra=None):
        # the headline is the MEDIAN of the completed repeats (min/max
        # are carried for the noise band); updated after every repeat
        # so the watchdog can always report a valid measurement
        med = statistics.median(times)
        rec = {
            "metric": "scans_per_sec",
            "value": round(F / med, 1),
            "unit": "scans/s",
            "vs_baseline": round(F / med / baseline, 2),
            "n_repeats": len(times),
            "median_ms": round(med * 1e3, 3),
            "min_ms": round(min(times) * 1e3, 3),
            "max_ms": round(max(times) * 1e3, 3),
            "max_scans_per_sec": round(F / min(times), 1),
            "baseline_scans_per_sec": round(baseline, 1),
            # vs the real C++ engine when buildable, else numpy oracle
            "baseline_kind": baseline_kind,
            # the reference races drop scoring tasks: a run with reset
            # frames did LESS WORK and ran faster - this counts the
            # frames its chosen run failed to track (we track all 279)
            "baseline_reset_frames": baseline_resets,
            # bias quantification: what a tracking-HEALTHY reference
            # run would cost (lstsq fit over the timed runs), so the
            # vs_baseline ratio carries its own error bars
            "baseline_note": baseline_note,
            # machine-readable record of WHICH backend produced the
            # number (the probe may have rerouted a wedged TPU to CPU)
            "backend": jax.default_backend(),
            # round-3 correction: block_until_ready returns at enqueue
            # through the device relay, so pre-r3 recorded numbers
            # (518k/364k) measured dispatch latency - this protocol
            # times to host-materialized value (docs/RESULTS.md r3)
            "method": "time-to-value"}
        rec.update(extra or {})
        return json.dumps(rec)

    def timed_run():
        t0 = time.perf_counter()
        o = run_sequence(frames, ctx, cfg)
        # TIME-TO-VALUE: materialize the poses on the host.  Through
        # the axon relay block_until_ready RETURNS AT ENQUEUE, so a
        # "timed" repeat without a transfer measures dispatch latency
        # (~0.5 ms) instead of execution (~0.6 s) - every pre-round-3
        # recorded number had exactly that flaw.  The (F, 3) pose
        # transfer forces completion and costs ~RTT on top.
        np.asarray(o["pose"])
        times.append(time.perf_counter() - t0)
        BEST["json"] = result_json()
        log(f"  repeat: {times[-1] * 1e3:.2f} ms")
        return o

    for _ in range(REPEATS):
        outs = timed_run()
    med = statistics.median(times)
    scans_per_sec = F / med

    # informational: the same rollout with the frame stack already
    # device-resident - isolates the per-call host->device transfer
    # share (~17-21 ms through the relay, docs/DESIGN.md r5 bound)
    # from compute.  The HEADLINE stays the host-frames number (the
    # honest serving cost: scans arrive from the host).  TPU-only:
    # on the CPU fallback there is no transfer to isolate and the
    # watchdog budget is better left for the headline repeats.
    dev_med = None
    if jax.default_backend() == "tpu":
        import jax.numpy as jnp
        frames_dev = jax.tree.map(jnp.asarray, frames)
        jax.block_until_ready(frames_dev)
        np.asarray(run_sequence(frames_dev, ctx, cfg)["pose"])   # warm
        dev_times = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run_sequence(frames_dev, ctx, cfg)["pose"])
            dev_times.append(time.perf_counter() - t0)
        dev_med = statistics.median(dev_times)
        log(f"device-resident frames: median {dev_med * 1e3:.2f} ms "
            f"(H2D share ~{(med - dev_med) * 1e3:.1f} ms)")

    poses = np.asarray(outs["pose"])
    scores = np.asarray(outs["score"])
    a = eval_ate.keyframe_ate(poses, ds.real_pos, ds.recorded_odom,
                              ds.param.resol, ds.param.ori_x, ds.param.ori_y)
    tracked = int(np.isfinite(scores).sum())
    log(f"{F} frames, median {med * 1e3:.2f} ms over {len(times)} repeats "
        f"({scans_per_sec:.0f} scans/s; min {min(times) * 1e3:.2f} ms); "
        f"ATE rmse {a.rmse:.3f} m, tracked {tracked}/{F}")
    if tracked < F or not np.isfinite(a.rmse):
        log("WARNING: tracking degraded - throughput number suspect")

    watchdog.cancel()
    extra = {"ate_rmse_m": round(float(a.rmse), 4),
             "tracked": tracked, "frames": F}
    if dev_med is not None:
        extra["device_resident_ms"] = round(dev_med * 1e3, 3)
        extra["device_resident_scans_per_sec"] = round(F / dev_med, 1)
    print(result_json(extra))


if __name__ == "__main__":
    main()
