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
