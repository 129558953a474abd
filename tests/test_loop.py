"""End-to-end: jitted sequence rollout vs the oracle driver."""

import numpy as np
import pytest

from lsdtpu.config import DEFAULT
from lsdtpu.oracle import driver as odrv
from lsdtpu.runtime import make_map_context, run_sequence, stack_frames


@pytest.fixture(scope="module")
def map_art(dataset_small):
    ds = dataset_small
    return odrv.prepare_map(ds.map_value, ds.param.resol)


def test_rollout_matches_oracle_f64(dataset_small, map_art):
    ds = dataset_small
    NF = 15
    ores = odrv.run_sequence(ds, map_art, max_frames=NF)
    ctx = make_map_context(map_art.lines_info, map_art.map_cache,
                           ds.param.resol, ds.param.ori_x, ds.param.ori_y,
                           dtype=np.float64)
    frames = stack_frames(ds, dtype=np.float64, max_frames=NF)
    outs = run_sequence(frames, ctx, DEFAULT)
    assert not bool(np.asarray(outs["candidate_overflow"]).any())
    np.testing.assert_allclose(np.asarray(outs["pose"]), ores.poses,
                               atol=1e-6)
    oracle_nc = np.array([r.n_candidates for r in ores.records])
    np.testing.assert_array_equal(np.asarray(outs["n_candidates"]),
                                  oracle_nc)


def test_rollout_f32_close_to_oracle(dataset_small, map_art):
    """Production precision: f32 poses must stay within a pixel of the
    f64 oracle over a short run (ATE-level tolerance policy)."""
    ds = dataset_small
    NF = 15
    ores = odrv.run_sequence(ds, map_art, max_frames=NF)
    ctx = make_map_context(map_art.lines_info, map_art.map_cache,
                           ds.param.resol, ds.param.ori_x, ds.param.ori_y,
                           dtype=np.float32)
    frames = stack_frames(ds, dtype=np.float32, max_frames=NF)
    outs = run_sequence(frames, ctx, DEFAULT)
    err = np.abs(np.asarray(outs["pose"])[:, :2] - ores.poses[:, :2])
    assert err.max() < 2.0, f"f32 pose drift {err.max()} px"


@pytest.mark.slow
def test_full_sequence_parity_f64(dataset_small, map_art):
    """All 99 frames of data/ vs the oracle driver, f64."""
    import numpy as np
    ds = dataset_small
    ores = odrv.run_sequence(ds, map_art)
    ctx = make_map_context(map_art.lines_info, map_art.map_cache,
                           ds.param.resol, ds.param.ori_x, ds.param.ori_y,
                           dtype=np.float64)
    frames = stack_frames(ds, dtype=np.float64)
    outs = run_sequence(frames, ctx, DEFAULT)
    assert not bool(np.asarray(outs["candidate_overflow"]).any())
    np.testing.assert_allclose(np.asarray(outs["pose"]), ores.poses,
                               atol=1e-5)
