"""Smoke test for the C++ reference benchmark harness (scripts/refbench).

Builds the headless driver against the read-only reference sources and
runs 3 frames of data1.  Skipped when the reference mount or toolchain
is unavailable.  The full head-to-head is scripts/refbench/compare.py
(results recorded in docs/RESULTS.md).
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/LSD"
DATA = "/root/reference/data_20190513/data_f3key/data1"
BIN = os.path.join(REPO, "build", "refbench", "lsd_refbench")


@pytest.mark.skipif(not (os.path.isdir(REF) and os.path.isdir(DATA)),
                    reason="reference mount unavailable")
@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_refbench_builds_and_runs(tmp_path):
    if not os.path.exists(BIN):
        subprocess.run(
            ["sh", os.path.join(REPO, "scripts", "refbench", "build.sh")],
            check=True, capture_output=True, timeout=300)
    dump = tmp_path / "poses.txt"
    out = subprocess.run([BIN, DATA, "3", str(dump)], check=True,
                         capture_output=True, text=True, timeout=300)
    assert "scans/s" in out.stdout
    poses = np.loadtxt(dump)
    assert poses.shape == (3, 3)
    # the reference's own first-frame global match on data1 lands near
    # the known start (when its threadpool race doesn't eat the tasks);
    # either a tracked pose inside the map or the reset sentinel is legal
    for row in poses:
        assert (row[0] == -1.0) or (0 <= row[0] <= 1440)


@pytest.mark.skipif(not (os.path.isdir(REF) and os.path.isdir(DATA)),
                    reason="reference mount unavailable")
@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_map_artifacts_bitwise_parity_small_maps(tmp_path):
    """Oracle map prep is BITWISE the compiled reference engine's on
    the small bundled maps: mapCache elementwise-identical AND the LSD
    line list equal IN EXTRACTION ORDER with zero endpoint diff
    (round-3 parity closure - scripts/refbench/parity_trace.py
    documents the five replicated rounding/UB behaviors)."""
    import sys
    sys.path.insert(0, os.path.join(REPO, "scripts", "refbench"))
    import parity_map as pm
    if not os.path.exists(BIN):
        subprocess.run(
            ["sh", os.path.join(REPO, "scripts", "refbench", "build.sh")],
            check=True, capture_output=True, timeout=300)
    for name, pf, vf in pm.EXTRA_MAPS[:2]:        # map1, map2 (fast)
        import tempfile
        with tempfile.TemporaryDirectory() as td:
            rec = pm.compare_map(pm._extra_map_dir(td, pf, vf), name)
        assert rec["cache_diff"] == 0.0, rec
        assert rec["n_ref"] == rec["n_ours"], rec
        assert rec["order_max_diff"] == 0.0, rec


@pytest.mark.skipif(not (os.path.isdir(REF) and os.path.isdir(DATA)),
                    reason="reference mount unavailable")
@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_seed_trace_bitwise_parity_data1():
    """Full seed-by-seed trace of data1: every processed seed's region
    size, refined rectangle, logNFA, accept decision AND the usedMap
    evolution are bitwise identical between the oracle and the
    compiled reference engine (3850 records)."""
    import sys
    sys.path.insert(0, os.path.join(REPO, "scripts", "refbench"))
    import parity_trace as pt
    pt.build_trace_binary()
    ref = pt.ref_trace(DATA)
    ora = pt.oracle_trace(DATA)
    assert pt.diff(ref, ora) == 0
