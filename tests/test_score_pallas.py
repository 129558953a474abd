"""Pallas score kernel vs the XLA reference path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lsdtpu.match import associate as assoc
from lsdtpu.ops.score_pallas import score_candidates_pallas
from lsdtpu.oracle import driver as odrv
from lsdtpu.oracle import rdp as ordp


@pytest.fixture(scope="module")
def setup(dataset_small):
    ds = dataset_small
    art = odrv.prepare_map(ds.map_value, ds.param.resol)
    return ds, art


@pytest.mark.parametrize("f", [0, 11])
def test_pallas_scores_match_xla(setup, f):
    ds, art = setup
    fr = ds.frames[f]
    fs = ordp.feature_scan(fr[:, 0].astype(np.float64),
                           fr[:, 1].astype(np.float64), ds.param.resol,
                           ds.param.ori_x, ds.param.ori_y)
    S, M, P = 64, 256, 2048
    sl = np.zeros((S, 10), np.float32)
    sl[:len(fs.lines_info)] = fs.lines_info
    sm = np.zeros(S, bool); sm[:len(fs.lines_info)] = True
    ml = np.zeros((M, 10), np.float32)
    ml[:len(art.lines_info)] = art.lines_info
    mm = np.zeros(M, bool); mm[:len(art.lines_info)] = True

    ys, xs = np.nonzero(fs.line_im)
    pix = np.zeros((P, 2), np.int32)
    pmask = np.zeros(P, bool)
    k = min(len(xs), P)
    pix[:k, 0] = xs[:k]; pix[:k, 1] = ys[:k]
    pmask[:k] = True

    lp = jnp.asarray(np.floor(np.array(fs.lidar_pos) + 0.5), jnp.float32)
    cand = assoc.generate_candidates(
        jnp.asarray(sl), jnp.asarray(sm), jnp.asarray(ml), jnp.asarray(mm),
        lp, jnp.asarray([-1.0, -1.0, 0.0], jnp.float32),
        max_candidates=512)
    cache = jnp.asarray(art.map_cache, jnp.float32)

    want = np.asarray(assoc.score_candidates(
        cand, jnp.asarray(pix), jnp.asarray(pmask), cache))
    got = np.asarray(score_candidates_pallas(
        cand, jnp.asarray(pix), jnp.asarray(pmask), cache,
        interpret=True))
    fin = np.isfinite(want)
    np.testing.assert_array_equal(fin, np.isfinite(got))
    np.testing.assert_allclose(got[fin], want[fin], rtol=2e-6, atol=2e-6)


def test_pallas_config_path_in_loop(dataset_small, setup):
    """score_kernel='pallas' through localization_step (interpret mode
    on CPU) stays within f32 rounding of the XLA path."""
    import dataclasses
    import jax
    from lsdtpu.config import DEFAULT
    from lsdtpu.runtime import make_map_context, run_sequence, stack_frames
    ds, art = setup
    ctx = make_map_context(art.lines_info, art.map_cache, ds.param.resol,
                           ds.param.ori_x, ds.param.ori_y,
                           dtype=np.float32)
    frames = stack_frames(ds, dtype=np.float32, max_frames=3)
    cfgp = dataclasses.replace(
        DEFAULT, match=dataclasses.replace(DEFAULT.match,
                                           score_kernel="pallas"))
    a = jax.tree.map(np.asarray, run_sequence(frames, ctx, DEFAULT))
    b = jax.tree.map(np.asarray, run_sequence(frames, ctx, cfgp))
    np.testing.assert_array_equal(a["n_candidates"], b["n_candidates"])
    np.testing.assert_allclose(a["pose"], b["pose"], atol=0.2)
