"""Legacy (ROS V2.2) matcher: jax vs numpy oracle on real data."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from lsdtpu.match import legacy as jlegacy
from lsdtpu.oracle import driver as odrv
from lsdtpu.oracle import legacy_fa as olegacy
from lsdtpu.oracle import rdp as ordp


@pytest.fixture(scope="module")
def setup(dataset_small):
    ds = dataset_small
    # the ROS node builds its cache with z = 2 m (main_on_linux.cpp:129)
    from lsdtpu.oracle import lsd as olsd
    cache = olsd.create_map_cache(ds.map_value, ds.param.resol, 2.0)
    lines = olsd.line_segment_detector(ds.map_value.copy()).lines_info
    return ds, cache, lines


def _frame_inputs(ds, f):
    fr = ds.frames[f]
    return fr[:, 0].astype(np.float64), fr[:, 1].astype(np.float64)


@pytest.mark.parametrize("f", [0, 7, 20])
def test_legacy_fa_matches_oracle(setup, f):
    ds, cache, map_lines = setup
    ranges, angles = _frame_inputs(ds, f)
    fs = ordp.feature_scan(ranges, angles, ds.param.resol,
                           ds.param.ori_x, ds.param.ori_y)
    pose_o, cands_o = olegacy.feature_association_legacy(
        fs.lines_info, map_lines, np.array(fs.lidar_pos, np.float64),
        cache, ranges, angles, ds.param.resol)

    S = 64
    M = 256
    N = 360
    sl = np.zeros((S, 10)); sl[:len(fs.lines_info)] = fs.lines_info
    sm = np.zeros(S, bool); sm[:len(fs.lines_info)] = True
    ml = np.zeros((M, 10)); ml[:len(map_lines)] = map_lines
    mm = np.zeros(M, bool); mm[:len(map_lines)] = True
    r = np.zeros(N); r[:len(ranges)] = ranges
    a = np.zeros(N); a[:len(angles)] = angles
    v = np.zeros(N, bool); v[:len(ranges)] = True

    cand = jlegacy.generate_candidates_legacy(
        jnp.asarray(sl), jnp.asarray(sm), jnp.asarray(ml), jnp.asarray(mm),
        jnp.asarray(np.array(fs.lidar_pos), jnp.float64), ds.param.resol,
        max_candidates=4096)
    assert int(cand.count) == len(cands_o)
    scores = jlegacy.score_candidates_legacy(
        cand, jnp.asarray(r), jnp.asarray(a), jnp.asarray(v),
        jnp.asarray(len(ranges)), jnp.asarray(cache), ds.param.resol)

    got = sorted(zip(np.asarray(cand.pose[:, 0])[np.asarray(cand.mask)],
                     np.asarray(scores)[np.asarray(cand.mask)]))
    want = sorted((c.x, c.score) for c in cands_o)
    np.testing.assert_allclose(np.array(got), np.array(want), atol=1e-9)

    pose_j, best = jlegacy.first_min_pose(cand, scores)
    if pose_o is not None and math.isfinite(float(best)):
        np.testing.assert_allclose(np.asarray(pose_j), pose_o, atol=1e-9)
