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
    rc = pb.main(["--dry", "--cpu", "--n-devices", "2", "--frames", "40",
                  "--out", str(out)])
    assert rc == 0
    got = json.loads(out.read_text())
    assert got["backend"] == "cpu"
    assert got["n_devices"] == 2
    assert got["frames"] == 40
    for mode in ("solo", "dp", "serving", "temporal"):
        assert mode in got, f"mode {mode} missing from SCALING json"
        assert got[mode]["scans_per_sec"] > 0
        assert np.isfinite(got[mode]["median_s"])
    assert got["dp"]["n_sequences"] == 2
    assert got["serving"]["n_sessions"] == 2
    assert got["temporal"]["n_segments"] == 2
