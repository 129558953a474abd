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
