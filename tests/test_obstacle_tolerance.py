"""Obstacle-tolerant scoring (match.obstacle_tolerance) - a
beyond-reference robustness mode (the reference charges every far-from-
wall pixel max_dist_penalty, CalcScore myFA.cpp:381, so a handful of
dynamic-obstacle returns can push all candidates past score_accept and
lose tracking).

Covers: the robust formula vs a direct numpy recomputation, exactness
of the map-block partial-sum decomposition with tolerance on, bitwise
no-op behavior when no pixel is forgivable, and an end-to-end rollout
where injected obstacle returns break faithful-mode tracking but not
the robust mode.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from lsdtpu.match.associate import (Candidates, finalize_scores,
                                    score_candidates,
                                    score_candidates_partial)


def _mk_candidates(offsets):
    """Pure-translation candidates: pixel (x, y) -> (x+dx, y+dy)."""
    K = len(offsets)
    z = jnp.zeros((K,), jnp.float64)
    dx = jnp.asarray([o[0] for o in offsets], jnp.float64)
    dy = jnp.asarray([o[1] for o in offsets], jnp.float64)
    return Candidates(ca=z + 1.0, sa=z, sx=z, sy=z, mx=dx, my=dy,
                      pose=jnp.zeros((K, 3), jnp.float64),
                      mask=jnp.ones((K,), bool),
                      count=jnp.asarray(K, jnp.int32))


def _numpy_score(cache, pix, pmask, offsets, cap=1.0, penalty=10.0,
                 tol=0.0, min_dist=None, valid_ratio=0.7):
    H, W = cache.shape
    if min_dist is None:
        min_dist = cap
    n_all = float(pmask.sum())
    out = []
    for dx, dy in offsets:
        ix = np.floor(pix[:, 0] + dx + 0.5).astype(int)
        iy = np.floor(pix[:, 1] + dy + 0.5).astype(int)
        inside = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H) & pmask
        v = cache[np.clip(iy, 0, H - 1), np.clip(ix, 0, W - 1)]
        at_cap = v >= cap
        contrib = np.where(at_cap, penalty, v)
        sum_d = float(np.where(inside, contrib, 0.0).sum())
        n_valid = float(inside.sum())
        far = inside & (at_cap | (v >= min_dist))
        sum_far = float(np.where(far, contrib, 0.0).sum())
        n_far = float(far.sum())
        if n_valid < valid_ratio * n_all:
            out.append(np.inf)
            continue
        if tol > 0:
            forgiven = min(n_far, tol * n_all)
            frac = forgiven / max(n_far, 1.0)
            s = (sum_d - frac * sum_far) / (n_valid - forgiven) + \
                penalty * (n_all - n_valid) / n_all
        else:
            s = sum_d / n_valid + penalty * (n_all - n_valid) / n_all
        out.append(s)
    return np.array(out)


@pytest.fixture
def scene():
    """A ramp distance field, a pixel cloud mixing near-wall, mid, and
    at-cap distances, and three translation candidates."""
    rng = np.random.default_rng(3)
    H, W = 16, 32
    cache = np.minimum(np.arange(W, dtype=np.float64) * 0.05, 1.0)
    cache = np.broadcast_to(cache, (H, W)).copy()
    P = 64
    pix = np.zeros((P, 2), np.int32)
    pix[:, 0] = rng.integers(0, W, P)
    pix[:, 1] = rng.integers(0, H, P)
    pmask = np.ones(P, bool)
    pmask[50:] = False
    offsets = [(0.0, 0.0), (3.0, 1.0), (-2.0, 0.0), (25.0, 0.0)]
    return cache, pix, pmask, offsets


@pytest.mark.parametrize("tol,min_dist", [(0.2, None), (0.5, 0.4),
                                          (0.1, 0.75)])
def test_robust_formula_matches_numpy(scene, tol, min_dist):
    cache, pix, pmask, offsets = scene
    cand = _mk_candidates(offsets)
    got = np.asarray(score_candidates(
        cand, jnp.asarray(pix), jnp.asarray(pmask), jnp.asarray(cache),
        obstacle_tolerance=tol, obstacle_min_dist=min_dist))
    want = _numpy_score(cache, pix, pmask, offsets, tol=tol,
                        min_dist=min_dist)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_tolerance_map_block_partials_additive(scene):
    """Two row-block partial scorings psum to the full robust score -
    the mp-sharding exactness contract with tolerance on."""
    cache, pix, pmask, offsets = scene
    cand = _mk_candidates(offsets)
    H, W = cache.shape
    tol, min_dist = 0.3, 0.5
    full = np.asarray(score_candidates(
        cand, jnp.asarray(pix), jnp.asarray(pmask), jnp.asarray(cache),
        obstacle_tolerance=tol, obstacle_min_dist=min_dist))
    h = H // 2
    parts = None
    for row0 in (0, h):
        p = score_candidates_partial(
            cand, jnp.asarray(pix), jnp.asarray(pmask),
            jnp.asarray(cache[row0:row0 + h]), row0, H, W,
            obstacle_min_dist=min_dist)
        parts = p if parts is None else tuple(
            a + b for a, b in zip(parts, p))
    n_all = jnp.asarray(float(pmask.sum()), jnp.float64)
    got = np.asarray(finalize_scores(
        cand, parts[0], parts[1], n_all, sum_far=parts[2],
        n_far=parts[3], obstacle_tolerance=tol))
    # f64 reduction-order noise only (block-partitioned vs full-row sum)
    np.testing.assert_allclose(got, full, atol=1e-12)


def test_no_far_pixels_is_bitwise_noop(scene):
    """With every pixel under the forgiveness threshold the robust
    score must be BITWISE the reference formula (x - 0.0 and
    /(n - 0.0) are exact)."""
    cache, pix, pmask, offsets = scene
    cache = np.minimum(cache, 0.8)           # nothing at/above cap
    cand = _mk_candidates(offsets)
    base = np.asarray(score_candidates(
        cand, jnp.asarray(pix), jnp.asarray(pmask), jnp.asarray(cache)))
    rob = np.asarray(score_candidates(
        cand, jnp.asarray(pix), jnp.asarray(pmask), jnp.asarray(cache),
        obstacle_tolerance=0.4))
    np.testing.assert_array_equal(rob, base)


def test_tolerance_out_of_range_raises(scene):
    cache, pix, pmask, offsets = scene
    cand = _mk_candidates(offsets)
    with pytest.raises(ValueError, match="obstacle_tolerance"):
        score_candidates(cand, jnp.asarray(pix), jnp.asarray(pmask),
                         jnp.asarray(cache), obstacle_tolerance=0.6)


def _inject_obstacle(frames, frac, scale, seed=11):
    """Scale a contiguous angular arc (frac of each scan's returns) to
    scale*range - a mid-room obstacle (person, cart) occluding the
    walls behind it.  The shortened returns land far from every wall,
    which is exactly the population the reference charges
    max_dist_penalty each (CalcScore myFA.cpp:381).  Returns a new
    frames dict (run_sequence input)."""
    ranges = np.array(frames["ranges"])
    rng = np.random.default_rng(seed)
    out = dict(frames)
    for f in range(len(ranges)):
        n = int(frames["n"][f])
        k = int(frac * n)
        start = int(rng.integers(0, max(n - k, 1)))
        ranges[f, start:start + k] *= scale
    out["ranges"] = ranges
    return out


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_rollout_obstacles_break_faithful_not_robust(dataset_data1,
                                                     dtype):
    """End-to-end on data1: occlude 40% of every scan with a mid-room
    obstacle arc.  The reference semantics loses tracking on a large
    minority of frames and mislocalizes by meters on others; the
    robust mode tracks every frame close to the obstacle-free
    trajectory - in both the parity dtype (f64) and the production
    dtype (f32).  (Calibrated 2026-08-20: faithful 59/80 tracked with
    643 px worst error; tol=0.35 robust 80/80 with 18-19 px worst.)"""
    from lsdtpu.config import DEFAULT
    from lsdtpu.oracle import driver as odrv
    from lsdtpu.runtime.loop import (make_map_context, run_sequence,
                                     stack_frames)

    ds = dataset_data1
    art = odrv.prepare_map(ds.map_value, ds.param.resol)
    ctx = make_map_context(art.lines_info, art.map_cache, ds.param.resol,
                           ds.param.ori_x, ds.param.ori_y, dtype=dtype)
    frames = stack_frames(ds, dtype=dtype, max_frames=80)
    dirty = _inject_obstacle(frames, frac=0.4, scale=0.5)

    cfg_rob = dataclasses.replace(
        DEFAULT, match=dataclasses.replace(
            DEFAULT.match, obstacle_tolerance=0.35))

    clean = run_sequence(frames, ctx, DEFAULT)
    faith = run_sequence(dirty, ctx, DEFAULT)   # same cfg: no recompile
    rob = run_sequence(dirty, ctx, cfg_rob)

    clean_pose = np.asarray(clean["pose"])
    tracked_f = np.isfinite(np.asarray(faith["score"]))
    tracked_r = np.isfinite(np.asarray(rob["score"]))
    assert np.isfinite(np.asarray(clean["score"])).all()

    # the scenario genuinely breaks the reference semantics...
    err_f = np.linalg.norm(
        (np.asarray(faith["pose"]) - clean_pose)[tracked_f, :2], axis=1)
    assert tracked_f.sum() <= len(tracked_f) - 5 or err_f.max() > 100.0

    # ...while the robust mode tracks everything, near the clean path
    err_r = np.linalg.norm(
        (np.asarray(rob["pose"]) - clean_pose)[tracked_r, :2], axis=1)
    assert tracked_r.sum() == len(tracked_r)
    assert err_r.max() < 50.0          # px; calibrated headroom ~3x
    assert np.median(err_r) < 10.0


def test_fully_forgiven_candidate_is_inf_not_nan(scene):
    """With a user-lowered valid_ratio, a candidate whose every valid
    pixel is forgiven (0/0) must score inf, not NaN (NaN would pass
    the validity gate and poison fuse's argmin relocalization path)."""
    cache, pix, pmask, _ = scene
    cache = np.full_like(cache, 1.0)        # everything at cap
    cand = _mk_candidates([(0.0, 0.0)])
    got = np.asarray(score_candidates(
        cand, jnp.asarray(pix), jnp.asarray(pmask), jnp.asarray(cache),
        obstacle_tolerance=0.5, valid_ratio=0.2))
    # n_far == n_valid == n_all, budget 0.5*n_all < n_valid -> finite;
    # shrink the mask so the budget covers every valid pixel instead
    pmask2 = pmask.copy()
    pmask2[:] = False
    pmask2[:10] = True
    ix = pix[:10]
    assert (ix >= 0).all()
    got = np.asarray(score_candidates(
        _mk_candidates([(0.0, 0.0)]), jnp.asarray(pix[:20]),
        jnp.asarray(np.concatenate([np.ones(10, bool),
                                    np.zeros(10, bool)])),
        jnp.asarray(cache), obstacle_tolerance=0.5, valid_ratio=0.2))
    # 10 valid pixels all at cap, budget = 0.5*10 = 5 -> denom 5 > 0:
    # still finite.  Force denom == 0 via finalize directly:
    from lsdtpu.match.associate import finalize_scores
    import jax.numpy as jnpp
    s = np.asarray(finalize_scores(
        _mk_candidates([(0.0, 0.0)]),
        jnpp.asarray([50.0]), jnpp.asarray([5.0]),
        jnpp.asarray(10.0), sum_far=jnpp.asarray([50.0]),
        n_far=jnpp.asarray([5.0]), obstacle_tolerance=0.5,
        valid_ratio=0.2))
    assert np.isinf(s[0]) and not np.isnan(s[0])
