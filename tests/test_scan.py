"""Scan featurization (clustering + RDP + extraction) vs the numpy oracle."""

import numpy as np
import pytest

from lsdtpu.oracle import rdp as ordp
from lsdtpu.scan import featurize


def _pad(frame, n_points=360):
    n = len(frame)
    r = np.zeros(n_points)
    a = np.zeros(n_points)
    v = np.zeros(n_points, bool)
    r[:n] = frame[:, 0]
    a[:n] = frame[:, 1]
    v[:n] = True
    return r, a, v, np.int32(n)


@pytest.mark.parametrize("fi", [0, 3, 7, 25, 60, 98])
def test_featurize_matches_oracle(dataset_small, fi):
    ds = dataset_small
    fr = ds.frames[fi]
    o = ordp.feature_scan(fr[:, 0], fr[:, 1], ds.param.resol,
                          ds.param.ori_x, ds.param.ori_y)
    r, a, v, n = _pad(fr)
    f = featurize(r, a, v, n, ds.param.resol, ds.param.ori_x, ds.param.ori_y)

    nl = int(np.asarray(f.lines_mask).sum())
    assert nl == len(o.lines_info)
    jl = np.asarray(f.lines)[:nl]
    # segment enumeration order may differ (cells vs rotated cells):
    # compare as sorted rows
    np.testing.assert_allclose(np.sort(jl, axis=0),
                               np.sort(o.lines_info, axis=0),
                               atol=1e-9, rtol=0)
    # lidar position exact
    np.testing.assert_array_equal(np.asarray(f.lidar_pos),
                                  np.asarray(o.lidar_pos, dtype=float))
    # pixel multiset: tolerate ulp-level FMA differences flipping a
    # rounding boundary on <0.5% of pixels
    jp = np.asarray(f.pixels)[np.asarray(f.pixels_mask)]
    assert len(jp) == len(o.scan_im_point)
    sj = sorted(map(tuple, jp.tolist()))
    so = sorted(map(tuple, o.scan_im_point.tolist()))
    diff = sum(1 for x, y in zip(sj, so) if x != y)
    assert diff <= max(2, int(0.005 * len(sj)))


def test_featurize_empty_frame():
    r = np.zeros(360)
    a = np.zeros(360)
    v = np.zeros(360, bool)
    f = featurize(r, a, v, np.int32(0), 0.025, -4.0, -5.0)
    assert int(np.asarray(f.lines_mask).sum()) == 0
    assert int(np.asarray(f.pixels_mask).sum()) == 0


def test_featurize_random_scans_match_oracle(dataset_small):
    """Property test: random synthetic scans (clusters, gaps, inf-like
    dropouts, wrap-around) must match the oracle RDP exactly."""
    import jax.numpy as jnp
    from lsdtpu.oracle import rdp as ordp
    from lsdtpu.scan.featurize import featurize
    ds = dataset_small
    rng = np.random.default_rng(42)
    for trial in range(12):
        n = int(rng.integers(40, 360))
        angles = np.sort(rng.uniform(0, 2 * np.pi, n))
        # piecewise-smooth ranges: random walls + jumps
        ranges = 2.0 + 1.5 * np.sin(angles * rng.integers(1, 4)) + \
            rng.normal(0, 0.01, n)
        jumps = rng.random(n) < 0.05
        ranges = np.where(jumps, ranges + rng.uniform(1, 4, n), ranges)
        ranges = np.abs(ranges) + 0.2

        fs_o = ordp.feature_scan(ranges, angles, ds.param.resol,
                                 ds.param.ori_x, ds.param.ori_y)
        N = 360
        r = np.zeros(N); a = np.zeros(N); v = np.zeros(N, bool)
        r[:n] = ranges; a[:n] = angles; v[:n] = True
        fs_j = featurize(jnp.asarray(r), jnp.asarray(a), jnp.asarray(v),
                         jnp.asarray(n), jnp.asarray(ds.param.resol),
                         jnp.asarray(ds.param.ori_x),
                         jnp.asarray(ds.param.ori_y))
        got = np.asarray(fs_j.lines)[np.asarray(fs_j.lines_mask)]
        want = fs_o.lines_info
        assert len(got) == len(want), (trial, len(got), len(want))
        if len(want):
            gs = got[np.lexsort(got[:, 4:6].T)]
            ws = want[np.lexsort(want[:, 4:6].T)]
            np.testing.assert_allclose(gs, ws, atol=1e-9,
                                       err_msg=f"trial {trial}")


def test_featurize_flags_step_grid_truncation(dataset_small):
    """A segment longer than the static max_steps grid would silently
    lose its tail pixels; the overflow flag must fire instead
    (ShapeConfig contract: caps are never silent).  Same scan under an
    ample grid must not flag."""
    import jax.numpy as jnp
    from lsdtpu.scan.featurize import featurize
    ds = dataset_small
    n = 180
    angles = np.linspace(0.1, np.pi - 0.1, n)
    ranges = np.abs(3.0 / np.sin(angles)) + 0.01  # long straight wall
    ranges = np.minimum(ranges, 25.0)
    N = 360
    r = np.zeros(N); a = np.zeros(N); v = np.zeros(N, bool)
    r[:n] = ranges; a[:n] = angles; v[:n] = True
    args = (jnp.asarray(r), jnp.asarray(a), jnp.asarray(v),
            jnp.asarray(n), jnp.asarray(ds.param.resol),
            jnp.asarray(ds.param.ori_x), jnp.asarray(ds.param.ori_y))
    tight = featurize(*args, max_steps=8)
    ample = featurize(*args, max_steps=4096)
    assert bool(tight.overflow)
    assert not bool(ample.overflow)
