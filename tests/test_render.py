"""Rasterizer vs the reference's golden line images.

data/MaplineIm.txt / ScanlineIm.txt are the C++ binary's saved lineIm
dumps paired with MaplinesInfo.txt / ScanlinesInfo.txt.  Rendering the
golden LINE SETS must reproduce the golden IMAGES bit-exactly (this
isolates the rasterizer from LSD extraction-order differences).

The dumps are offset by (+1, +1) relative to the in-memory lineIm (the
reference's MATLAB-heritage display path writes 1-based pixel
coordinates); the comparison shifts accordingly.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from lsdtpu.io import load_lines_info
from lsdtpu.render import render_line_image


def _check(data_root, name):
    golden = np.loadtxt(os.path.join(data_root, f"data/{name}Im.txt"),
                        dtype=np.int64)
    lines = load_lines_info(os.path.join(data_root,
                                         f"data/{name}sInfo.txt"))
    rows, cols = golden.shape
    img = np.asarray(render_line_image(
        jnp.asarray(lines), jnp.ones(len(lines), bool), rows, cols))
    shifted = np.zeros_like(img)
    shifted[:-1, :-1] = img[1:, 1:]
    np.testing.assert_array_equal(shifted > 0, golden > 0)


def test_map_line_image_matches_golden(data_root):
    _check(data_root, "Mapline")


def test_scan_line_image_matches_golden(data_root):
    _check(data_root, "Scanline")


def test_stage_timings_and_frame_log(dataset_small, tmp_path=None):
    """Observability smoke: stage harness returns all stages, frame log
    round-trips records."""
    import io
    import jax
    from lsdtpu.oracle import driver as odrv
    from lsdtpu.runtime import make_map_context, run_sequence, stack_frames
    from lsdtpu.runtime.trace import FrameLog, stage_timings
    ds = dataset_small
    art = odrv.prepare_map(ds.map_value, ds.param.resol)
    ctx = make_map_context(art.lines_info, art.map_cache, ds.param.resol,
                           ds.param.ori_x, ds.param.ori_y,
                           dtype=np.float64)
    frames = stack_frames(ds, dtype=np.float64, max_frames=3)
    fi = jax.tree.map(lambda x: jnp.asarray(x[0]), frames)
    t = stage_timings((fi["ranges"], fi["angles"], fi["valid"], fi["n"],
                       fi["odom_prev"], fi["odom_cur"]), ctx, repeats=2)
    assert set(t) == {"featurize_ms", "candidates_ms", "score_ms",
                      "fuse_ms", "ukf_ms"}
    assert all(v > 0 for v in t.values())

    outs = run_sequence(frames, ctx)
    buf = io.StringIO()
    log = FrameLog(buf)
    assert log.write_rollout(outs, seq="data") == 3
    import json as _json
    recs = [_json.loads(l) for l in buf.getvalue().splitlines()]
    assert len(recs) == 3 and recs[0]["frame"] == 1
    assert all(r["tracking"] for r in recs)


@pytest.mark.slow
def test_sweep_script_runs(data_root):
    """scripts/sweep_ate.py end-to-end on one dataset."""
    import json
    import subprocess
    import sys
    r = subprocess.run(
        [sys.executable, "scripts/sweep_ate.py", "--mapprep", "oracle",
         "--roots", f"{data_root}/data_20190513/data_f3key/data4"],
        capture_output=True, text=True, timeout=500,
        cwd=__file__.rsplit("/tests/", 1)[0],
        env={"PYTHONPATH": __file__.rsplit("/tests/", 1)[0],
             "JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
             "HOME": "/root"})
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [json.loads(l) for l in r.stdout.splitlines()]
    assert lines[0]["tracked"] == lines[0]["frames"]
    assert lines[-1]["summary"]["with_gt"] == 1
