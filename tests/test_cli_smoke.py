"""End-to-end CLI smoke tests: the argument wiring of the main
subcommands (reference driver entry points, LSD/main_on_windows.cpp
and the ROS launch surface).  The pipeline internals each have deep
tests; these guard the arg->config->runner plumbing (flag renames,
preset composition, artifact-cache threading) that only the CLI path
exercises.  All on small frame counts, CPU."""

import json
import os

import numpy as np
import pytest

from lsdtpu.cli import main


@pytest.fixture(scope="module")
def data_dir(data_root):
    return os.path.join(data_root, "data")


def test_cli_run_smoke(data_dir, capsys):
    rc = main(["run", "--data", data_dir, "--frames", "8",
               "--mapprep", "oracle"])
    assert rc == 0
    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 8
    assert all(np.isfinite(fr["score"]) for fr in lines)
    assert all(len(fr["pose"]) == 3 for fr in lines)


def test_cli_run_with_overrides_and_unroll(data_dir, capsys):
    """--set reaches top-level EngineConfig fields (r5: scan_unroll)
    and the rollout still runs through the unrolled body."""
    rc = main(["run", "--data", data_dir, "--frames", "9",
               "--mapprep", "oracle", "--set", "scan_unroll=2"])
    assert rc == 0


def test_cli_prepare_map_sharded_and_batch(data_dir, tmp_path, capsys):
    # hermetic cache dir (review r5 finding: against the user-global
    # ~/.cache/lsdtpu a warm cache would short-circuit the sharded
    # prep path this test exists to exercise)
    rc = main(["prepare-map", "--data", data_dir,
               "--mapprep", "tpu-sharded",
               "--cache-dir", str(tmp_path / "cache")])
    assert rc == 0
    assert any(f.suffix == ".npz"
               for f in (tmp_path / "cache").iterdir())
    rc = main(["batch", "--data", data_dir, data_dir,
               "--mapprep", "oracle",
               "--cache-dir", str(tmp_path / "cache")])
    assert rc == 0
