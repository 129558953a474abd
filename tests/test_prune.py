"""Exact candidate pruning (match/associate.score_candidates_pruned).

The pruning bound must be SOUND (bound <= true score for every live
candidate - an unsound bound silently changes which candidates are
accepted) and the pruned scorer must leave every rollout output
bitwise identical to the unpruned path (the reference accepts only
score < 3, myFA.cpp:261-265, so provably-rejected candidates carry no
information).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lsdtpu.config import DEFAULT
from lsdtpu.io import load_dataset
from lsdtpu.match import associate as assoc
from lsdtpu import geometry as geo

DATA1 = "/root/reference/data_20190513/data_f3key/data1"


def _map_ctx(cache_dtype="f32"):
    from lsdtpu.runtime import make_map_context
    from lsdtpu.runtime.artifacts import prepare_map_cached

    ds = load_dataset(DATA1)
    lines, cache = prepare_map_cached(ds.map_value, ds.param.resol,
                                      backend="oracle")
    ctx = make_map_context(lines, cache, ds.param.resol, ds.param.ori_x,
                           ds.param.ori_y, dtype=np.float32,
                           cache_dtype=cache_dtype)
    return ds, ctx


def _cfg(**match_kw):
    return dataclasses.replace(
        DEFAULT, match=dataclasses.replace(DEFAULT.match, **match_kw))


@pytest.mark.parametrize("cache_dtype", ["f32", "u16"])
def test_rollout_bitwise_equal(cache_dtype):
    """Full data1 rollout: pruned == unpruned, bitwise, incl. scores."""
    from lsdtpu.runtime import run_sequence, stack_frames

    ds, ctx = _map_ctx(cache_dtype)
    frames = stack_frames(ds, dtype=np.float32, max_frames=60)
    op = run_sequence(frames, ctx, _cfg(prune=True,
                                        cache_dtype=cache_dtype))
    on = run_sequence(frames, ctx, _cfg(prune=False,
                                        cache_dtype=cache_dtype))
    for k in ("pose", "score", "n_candidates", "measurement",
              "candidate_overflow"):
        np.testing.assert_array_equal(np.asarray(op[k]), np.asarray(on[k]),
                                      err_msg=k)


def test_rollout_bitwise_equal_obstacle_tolerance():
    """The robust score's pruning slack (bound - pen*tol) stays exact."""
    from lsdtpu.runtime import run_sequence, stack_frames

    ds, ctx = _map_ctx()
    frames = stack_frames(ds, dtype=np.float32, max_frames=40)
    kw = dict(obstacle_tolerance=0.2, obstacle_min_dist=0.8)
    op = run_sequence(frames, ctx, _cfg(prune=True, **kw))
    on = run_sequence(frames, ctx, _cfg(prune=False, **kw))
    for k in ("pose", "score", "n_candidates"):
        np.testing.assert_array_equal(np.asarray(op[k]), np.asarray(on[k]),
                                      err_msg=k)


def _frame_candidates(ds, ctx, cfg, frame=0, last_pose=None):
    from lsdtpu.runtime import stack_frames
    from lsdtpu.runtime.loop import featurize_stage

    frames = stack_frames(ds, dtype=np.float32)
    fr = {k: v[frame] for k, v in frames.items()}
    inputs = (fr["ranges"], fr["angles"], fr["valid"], fr["n"],
              fr["odom_prev"], fr["odom_cur"])
    fs = featurize_stage(inputs, ctx, cfg)
    if last_pose is None:
        last_pose = jnp.array([-1.0, -1.0, 0.0], jnp.float32)
    cand = assoc.generate_candidates(
        fs.lines, fs.lines_mask, ctx.lines, ctx.lines_mask,
        geo.c_round(fs.lidar_pos), last_pose,
        max_candidates=cfg.shapes.max_candidates)
    return fs, cand


def test_bound_sound_and_effective_on_relock_frame():
    """Frame 0 (global relock, ~800 live candidates): every truly
    accepted candidate survives the bound, and the bound prunes a
    large fraction of the sweep."""
    ds, ctx = _map_ctx()
    cfg = DEFAULT
    fs, cand = _frame_candidates(ds, ctx, cfg)
    coarse = assoc.coarse_field(ctx.cache, cfg.match.prune_block)
    gs = assoc._group_stats(fs.pixels, fs.pixels_mask,
                            cfg.match.prune_group, jnp.float32)
    n_all = jnp.sum(fs.pixels_mask).astype(jnp.float32)
    ch, cw = coarse.shape
    bound = np.asarray(assoc._chunk_bound(
        (cand.ca, cand.sa, cand.sx, cand.sy, cand.mx, cand.my), gs,
        coarse.reshape(-1), cw, ch, cfg.match.prune_block,
        ctx.rows, ctx.cols, 1.0, 10.0, 0.0, 0.7, n_all, jnp.float32))
    exact = np.asarray(assoc.score_candidates(
        cand, fs.pixels, fs.pixels_mask, ctx.cache,
        rows=ctx.rows, cols=ctx.cols, dynamic_chunks=False))
    mask = np.asarray(cand.mask)
    live = int(np.asarray(cand.count))
    # soundness: bound <= exact score wherever the exact score is finite
    fin = mask & np.isfinite(exact)
    assert (bound[fin] <= exact[fin] + 1e-5).all(), \
        np.max(bound[fin] - exact[fin])
    # and inf bounds (validity-gate proof) imply inf exact scores
    assert np.isinf(exact[mask & np.isinf(bound)]).all()
    survivors = int(((bound < 3.0) & mask).sum())
    accepted = int((exact < 3.0).sum())
    assert accepted > 0 and live > 400
    assert survivors < live // 2, (survivors, live)
    assert accepted <= survivors


def test_bound_sound_fuzz():
    """Randomized soundness: random fields, pixel clouds and rigid
    transforms (incl. far off-map) - bound <= exact score always."""
    rng = np.random.default_rng(7)
    H, W = 160, 224
    for trial in range(8):
        cache = rng.uniform(0.0, 1.0, (H, W)).astype(np.float32)
        cache[cache > 0.9] = 1.0                 # at-cap patches
        cachej = jnp.asarray(cache)
        coarse = assoc.coarse_field(cachej, 16)
        P = 256
        # contiguous-ish pixel runs (like rasterized segments)
        base = rng.uniform(10, 150, 2)
        steps = rng.uniform(-1, 1, (P, 2)).cumsum(0)
        pix = np.round(base + steps).astype(np.int32)
        pixels = jnp.asarray(pix)
        n_live = int(rng.integers(50, P + 1))
        mask = jnp.arange(P) < n_live
        K = 64
        ang = rng.uniform(-180, 180, K)
        ca = jnp.asarray(np.cos(np.radians(ang)).astype(np.float32))
        sa = jnp.asarray(np.sin(np.radians(ang)).astype(np.float32))
        f32 = lambda a: jnp.asarray(a.astype(np.float32))  # noqa: E731
        sx = f32(rng.uniform(0, 160, K))
        sy = f32(rng.uniform(0, 160, K))
        mx = f32(rng.uniform(-200, W + 200, K))
        my = f32(rng.uniform(-200, H + 200, K))
        cand = assoc.Candidates(
            ca=ca, sa=sa, sx=sx, sy=sy, mx=mx, my=my,
            pose=jnp.zeros((K, 3)), mask=jnp.ones((K,), bool),
            count=jnp.asarray(K, jnp.int32))
        gs = assoc._group_stats(pixels, mask, 16, jnp.float32)
        n_all = jnp.sum(mask).astype(jnp.float32)
        ch, cw = coarse.shape
        bound = np.asarray(assoc._chunk_bound(
            (ca, sa, sx, sy, mx, my), gs, coarse.reshape(-1), cw, ch,
            16, H, W, 1.0, 10.0, 0.0, 0.7, n_all, jnp.float32))
        exact = np.asarray(assoc.score_candidates(
            cand, pixels, mask, cachej, dynamic_chunks=False))
        fin = np.isfinite(exact)
        assert (bound[fin] <= exact[fin] + 1e-4).all(), \
            (trial, np.max(bound[fin] - exact[fin]))
        assert np.isinf(exact[np.isinf(bound)]).all(), trial


def test_pruned_scorer_output_contract():
    """Per-candidate contract on a relock frame: survivors score
    bitwise-identically; pruned candidates come back as inf or their
    true (>= accept) score - never as an acceptable score."""
    ds, ctx = _map_ctx()
    cfg = DEFAULT
    fs, cand = _frame_candidates(ds, ctx, cfg)
    coarse = assoc.coarse_field(ctx.cache, cfg.match.prune_block)
    pruned = np.asarray(assoc.score_candidates(
        cand, fs.pixels, fs.pixels_mask, ctx.cache,
        rows=ctx.rows, cols=ctx.cols, coarse=coarse, prune_accept=3.0))
    exact = np.asarray(assoc.score_candidates(
        cand, fs.pixels, fs.pixels_mask, ctx.cache,
        rows=ctx.rows, cols=ctx.cols))
    same = pruned == exact
    dropped = ~same
    assert (exact[dropped & np.isfinite(exact)] >= 3.0).all()
    assert (np.isinf(pruned[dropped]) | (pruned[dropped] >= 3.0)).all()
    # every accepted candidate is bitwise identical
    assert same[exact < 3.0].all()
