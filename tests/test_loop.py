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


@pytest.mark.slow
def test_tpu_mapprep_end_to_end_ate(dataset_data1, tmp_path):
    """Flagship path fully self-hosted: map artifacts built by the
    TPU-native mapprep (lsdtpu/mapprep, not the numpy oracle) feed the
    full 279-frame rollout on data1.  Guards the measured result
    (docs/RESULTS.md): 100% tracked, keyframe ATE rmse ~0.64 m (the
    oracle-artifact rollout measures 0.654 m; the line sets differ only
    structurally, SURVEY.md hard-part 1)."""
    from lsdtpu.eval import ate as eval_ate
    from lsdtpu.runtime.artifacts import prepare_map_cached

    ds = dataset_data1
    # Fresh cache_dir: artifacts MUST be rebuilt by the current code, or
    # a warm ~/.cache/lsdtpu would mask a mapprep regression (ADVICE r1).
    lines, cache = prepare_map_cached(ds.map_value, ds.param.resol,
                                      backend="tpu",
                                      cache_dir=str(tmp_path))
    ctx = make_map_context(lines, cache, ds.param.resol, ds.param.ori_x,
                           ds.param.ori_y, dtype=np.float32)
    frames = stack_frames(ds, dtype=np.float32)
    outs = run_sequence(frames, ctx, DEFAULT)
    scores = np.asarray(outs["score"])
    assert np.isfinite(scores).all(), "tracking lost with tpu artifacts"
    a = eval_ate.keyframe_ate(
        np.asarray(outs["pose"]), ds.real_pos, ds.recorded_odom,
        ds.param.resol, ds.param.ori_x, ds.param.ori_y)
    assert a.rmse < 0.75, f"tpu-mapprep ATE regressed: {a.rmse}"
