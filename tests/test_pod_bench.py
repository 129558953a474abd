"""CI plumbing check for the pod scale-out recipe (scripts/pod_bench.py).

Runs the full recipe in dry mode on the virtual CPU mesh: all four
modes (solo baseline, dp sequences, sharded serving pool, temporal SP)
must execute end-to-end and write a well-formed SCALING json.  The
NUMBERS are meaningless here (virtual devices share host cores); real
scaling evidence is scripts/scaling_dp.py (process isolation) and a
real multi-chip run of this same script (VERDICT r4 missing #1).
"""

import importlib.util
import json
import os

import numpy as np


def _load_pod_bench():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "pod_bench.py")
    spec = importlib.util.spec_from_file_location("pod_bench", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_pod_bench_dry_all_modes(tmp_path):
    pb = _load_pod_bench()
    out = tmp_path / "scaling.json"
    # --repeats 2 exercises the serving per-repeat session reset
    # (review r5: a stale _prev_odom across repeats injected a bogus
    # whole-trajectory odometry jump)
    rc = pb.main(["--dry", "--cpu", "--n-devices", "2", "--frames", "40",
                  "--repeats", "2", "--out", str(out)])
    assert rc == 0
    got = json.loads(out.read_text())
    assert got["backend"] == "cpu"
    assert got["n_devices"] == 2
    assert got["frames"] == 40
    for mode in ("solo", "dp", "serving", "temporal"):
        assert mode in got, f"mode {mode} missing from SCALING json"
        assert got[mode]["scans_per_sec"] > 0
        assert np.isfinite(got[mode]["median_s"])
        assert got[mode]["n_repeats"] == 2
    assert got["dp"]["n_sequences"] == 2
    assert got["serving"]["n_sessions"] == 2
    assert got["temporal"]["n_segments"] == 2


def test_pod_bench_two_process_gloo(tmp_path):
    """The multi-host pod flow EXACTLY as documented: two processes,
    each running the unmodified pod_bench CLI with JAX_COORDINATOR /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID set - pod_bench initializes
    jax.distributed itself, globalizes the dp batch, runs the sharded
    rollout across processes, and process 0 writes the SCALING json.
    serving/temporal must be skipped (single-process-mesh modes)."""
    import json
    import socket
    import subprocess
    import sys

    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "pod_bench.py")
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    out = tmp_path / "scaling_pod.json"
    procs = []
    for pid in (0, 1):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)   # 1 local CPU device per process
        env.update(JAX_COORDINATOR=f"localhost:{port}",
                   JAX_NUM_PROCESSES="2", JAX_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, script, "--cpu", "--dry", "--frames", "10",
             "--modes", "solo,dp,serving,temporal", "--out", str(out)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env))
    outs = []
    try:
        for p in procs:
            txt, _ = p.communicate(timeout=420)
            outs.append(txt)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, txt) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid}\n{txt[-3000:]}"
    got = json.loads(out.read_text())
    assert got["n_processes"] == 2
    assert got["dp"]["n_sequences"] == 2
    assert got["dp"]["scans_per_sec"] > 0
    assert "serving" not in got and "temporal" not in got
