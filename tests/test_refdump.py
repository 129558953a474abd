"""Reference-format artifact dumps (io/refdump.py): round-trips and
byte-level compatibility with the C++ build's own golden dumps."""

import os

import jax.numpy as jnp
import numpy as np

from lsdtpu.io import load_lines_info
from lsdtpu.io.refdump import (dump_map_artifacts, load_map_cache,
                               save_line_im, save_lines_info,
                               save_map_cache)
from lsdtpu.render import render_line_image


def test_lines_info_round_trip(tmp_path):
    rng = np.random.default_rng(0)
    lines = rng.normal(size=(17, 10)) * 100
    p = str(tmp_path / "lines.txt")
    n = save_lines_info(p, lines)
    assert n == 17
    back = load_lines_info(p)
    np.testing.assert_allclose(back, lines, rtol=1e-14, atol=0)


def test_lines_info_mask(tmp_path):
    lines = np.arange(50, dtype=np.float64).reshape(5, 10)
    mask = np.array([True, False, True, False, True])
    p = str(tmp_path / "lines.txt")
    assert save_lines_info(p, lines, mask) == 3
    np.testing.assert_array_equal(load_lines_info(p), lines[mask])


def test_map_cache_round_trip(tmp_path):
    cache = np.random.default_rng(1).uniform(0, 1, (37, 53))
    p = str(tmp_path / "mapCache.txt")
    save_map_cache(p, cache)
    np.testing.assert_allclose(load_map_cache(p), cache, rtol=1e-14)


def test_line_im_dump_matches_cpp_golden(data_root, tmp_path):
    """Render the golden line set, dump it with the 1-based shift, and
    compare against the C++ build's own MaplineIm.txt."""
    golden_img = np.loadtxt(os.path.join(data_root, "data/MaplineIm.txt"),
                            dtype=np.int64)
    lines = load_lines_info(os.path.join(data_root,
                                         "data/MaplinesInfo.txt"))
    rows, cols = golden_img.shape
    img = np.asarray(render_line_image(
        jnp.asarray(lines), jnp.ones(len(lines), bool), rows, cols))
    p = str(tmp_path / "MaplineIm.txt")
    save_line_im(p, img)
    ours = np.loadtxt(p, dtype=np.int64)
    np.testing.assert_array_equal(ours > 0, golden_img > 0)


def test_dump_map_artifacts_layout(tmp_path):
    lines = np.ones((2, 10))
    cache = np.zeros((8, 9))
    img = np.zeros((8, 9), np.int64)
    paths = dump_map_artifacts(str(tmp_path / "out"), lines, cache, img)
    assert sorted(os.path.basename(v) for v in paths.values()) == \
        ["MaplineIm.txt", "MaplinesInfo.txt", "mapCache.txt"]
    for v in paths.values():
        assert os.path.exists(v)
