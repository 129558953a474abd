"""Randomized synthetic-scene parity fuzz: oracle vs TPU modules on
maps and trajectories that appear in NO bundled dataset.

The bundled-data tests (test_mapprep, test_loop) pin parity on the 6
reference maps and 21 sequences; this file generates fresh geometry
per seed - random rooms with interior walls, raycast scans along a
random walk, noisy odometry - and checks the same contracts hold:

  * mapCache (BFS distance field): bit-exact (SURVEY.md #2);
  * LSD: structural line-set parity (endpoint-matched; seed tie order
    is undefined even in the reference, SURVEY.md 2.1);
  * full f64 rollout: pose trace matches the oracle driver to sub-1e-4
    pixels with identical tracking decisions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lsdtpu.io.loaders import Dataset, MapParam
from lsdtpu.oracle import driver as odrv
from lsdtpu.oracle import lsd as olsd

RESOL = 0.05
ORI_X = -2.0
ORI_Y = -1.5


def synth_map(seed, H=200, W=260):
    """Random room: free-space rectangle with boundary walls plus 2-4
    interior wall segments, surrounded by unknown cells - the dataset
    value convention {0 unknown, 1 occupied, 255 free}."""
    rng = np.random.default_rng(seed)
    g = np.zeros((H, W), np.uint8)
    y0, x0 = 8, 8
    y1, x1 = H - 8, W - 8
    g[y0:y1, x0:x1] = 255
    g[y0, x0:x1] = 1
    g[y1 - 1, x0:x1] = 1
    g[y0:y1, x0] = 1
    g[y0:y1, x1 - 1] = 1
    for _ in range(int(rng.integers(2, 5))):
        if rng.random() < 0.5:
            yy = int(rng.integers(y0 + 20, y1 - 20))
            xa = int(rng.integers(x0 + 5, x1 - 60))
            L = int(rng.integers(40, 90))
            g[yy, xa:xa + L] = 1
        else:
            xx = int(rng.integers(x0 + 20, x1 - 20))
            ya = int(rng.integers(y0 + 5, y1 - 60))
            L = int(rng.integers(40, 80))
            g[ya:ya + L, xx] = 1
    return g


def raycast(g, wx, wy, n=360, rmax=10.0):
    """Dense ray marching against the occupancy grid; returns the
    (range, angle) pairs that hit a wall - a synthetic Lidar frame."""
    H, W = g.shape
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    steps = np.arange(0.05, rmax, 0.01)
    X = wx + np.cos(ang)[:, None] * steps[None, :]
    Y = wy + np.sin(ang)[:, None] * steps[None, :]
    ix = np.clip(((X - ORI_X) / RESOL + 0.5).astype(int), 0, W - 1)
    iy = np.clip(((Y - ORI_Y) / RESOL + 0.5).astype(int), 0, H - 1)
    occ = g[iy, ix] == 1
    hit = occ.any(axis=1)
    r = steps[np.argmax(occ, axis=1)]
    return r[hit], ang[hit]


def synth_dataset(seed, F=10):
    """Random-walk trajectory + raycast scans + noisy odometry."""
    rng = np.random.default_rng(1000 + seed)
    g = synth_map(seed)
    H, W = g.shape
    pos = np.zeros((F, 2))
    pos[0] = (ORI_X + W / 2 * RESOL, ORI_Y + H / 2 * RESOL)
    for f in range(1, F):
        pos[f] = pos[f - 1] + rng.uniform(-0.15, 0.15, 2)
    frames = []
    for f in range(F):
        r, a = raycast(g, pos[f, 0], pos[f, 1])
        r = r + rng.normal(0, 0.003, len(r))
        frames.append(np.stack([r, a], axis=1))
    odom = np.zeros((F + 1, 3))
    odom[1:F + 1, :2] = pos - pos[0]
    odom = odom + rng.normal(0, 0.002, odom.shape)
    return Dataset(param=MapParam(W, H, RESOL, ORI_X, ORI_Y),
                   map_value=g, odom=odom, frames=frames,
                   name=f"synth{seed}")


def _match_lines(a, b, tol):
    """Greedy endpoint matching (either endpoint order) between two
    (n, 10) linesInfo sets; returns #matched rows of b."""
    used = np.zeros(len(a), bool)
    n = 0
    for rb in b:
        best, bi = np.inf, -1
        for i, ra in enumerate(a):
            if used[i]:
                continue
            d1 = max(abs(ra[4] - rb[4]), abs(ra[5] - rb[5]),
                     abs(ra[6] - rb[6]), abs(ra[7] - rb[7]))
            d2 = max(abs(ra[4] - rb[6]), abs(ra[5] - rb[7]),
                     abs(ra[6] - rb[4]), abs(ra[7] - rb[5]))
            d = min(d1, d2)
            if d < best:
                best, bi = d, i
        if bi >= 0 and best <= tol:
            used[bi] = True
            n += 1
    return n


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_map_cache_bit_exact(seed):
    from lsdtpu.mapprep.distance import create_map_cache
    g = synth_map(seed)
    want = olsd.create_map_cache(g.copy(), RESOL, 1.0)
    got = np.asarray(create_map_cache(jnp.asarray(g), RESOL, 1.0))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_lsd_structural_line_sets(seed):
    """Wall identity must agree on random rooms: every oracle line is
    endpoint-matched by a TPU line (25 px), most within 2 px; counts
    stay in the same regime (seed tie-order gives supersets, same as
    the bundled maps - docs/RESULTS.md all-6-maps comparison)."""
    from lsdtpu.mapprep.lsd import line_segment_detector
    g = synth_map(seed)
    want = olsd.line_segment_detector(g.copy()).lines_info
    infos, mask, _n, _ = line_segment_detector(
        jnp.asarray(g.astype(np.float64)))
    got = np.asarray(infos)[np.asarray(mask)]
    assert len(want) > 4          # the scene produced real structure
    assert 0.7 * len(want) <= len(got) <= 1.6 * len(want)
    assert _match_lines(got, want, 25.0) >= int(0.9 * len(want))
    assert _match_lines(got, want, 2.0) >= int(0.7 * len(want))


@pytest.mark.parametrize("seed", range(2))
def test_fuzz_rollout_matches_oracle_f64(seed):
    from lsdtpu.runtime.loop import (make_map_context, run_sequence,
                                     stack_frames)
    ds = synth_dataset(seed)
    art = odrv.prepare_map(ds.map_value.copy(), ds.param.resol)
    ores = odrv.run_sequence(ds, map_art=art)
    ctx = make_map_context(art.lines_info, art.map_cache, ds.param.resol,
                           ds.param.ori_x, ds.param.ori_y)
    outs = run_sequence(stack_frames(ds, dtype=np.float64), ctx)
    sc = np.asarray(outs["score"])
    osc = np.array([r.score for r in ores.records])
    np.testing.assert_array_equal(np.isfinite(sc), np.isfinite(osc))
    m = np.isfinite(osc)
    np.testing.assert_allclose(sc[m], osc[m], atol=1e-9)
    np.testing.assert_allclose(np.asarray(outs["pose"]), ores.poses,
                               atol=1e-4)


def test_perfect_score_nan_chain_parity():
    """A PERFECT candidate (score == 0.0 - reachable on noise-free
    synthetic geometry) drives the reference's inverse-square fusion
    to inf weights and a NaN fused pose (myFA.cpp:161: 1/pow(0,2));
    the NEXT frame's HMM gate then rejects everything (NaN distance
    fails `dis < maxEstiDist`, myFA.cpp:330) and the engine resets and
    relocks globally.  Both engines must walk that exact chain: the
    r5 fuzz campaign caught the oracle (a) raising ZeroDivisionError
    instead of inf, and (b) gating with the INVERTED comparison
    `d >= max: continue`, which ACCEPTS NaN distances (seed 101)."""
    from lsdtpu.runtime.loop import (make_map_context, run_sequence,
                                     stack_frames)
    ds = synth_dataset(101)
    art = odrv.prepare_map(ds.map_value.copy(), ds.param.resol)
    ores = odrv.run_sequence(ds, map_art=art)
    ctx = make_map_context(art.lines_info, art.map_cache, ds.param.resol,
                           ds.param.ori_x, ds.param.ori_y)
    outs = run_sequence(stack_frames(ds, dtype=np.float64), ctx)
    sc = np.asarray(outs["score"])
    osc = np.array([r.score for r in ores.records])
    # the scene actually exercises the chain: perfect frames exist,
    # followed by a lost (inf) frame, then a global relock
    perfect = np.nonzero(osc == 0.0)[0]
    assert len(perfect) > 0 and np.isinf(osc).any()
    # identical tracking decisions, scores, and NaN-pose frames
    np.testing.assert_array_equal(np.isfinite(sc), np.isfinite(osc))
    m = np.isfinite(osc)
    np.testing.assert_allclose(sc[m], osc[m], atol=1e-9)
    poses = np.asarray(outs["pose"])
    np.testing.assert_array_equal(np.isnan(poses).any(1),
                                  np.isnan(ores.poses).any(1))
    ok = m & ~np.isnan(poses).any(1)
    np.testing.assert_allclose(poses[ok], ores.poses[ok], atol=1e-4)


def test_fixed_mode_survives_perfect_scores():
    """cfg.faithful=False corrects the reference's perfect-score bug:
    the weight floor keeps a score-0 candidate from NaN-poisoning the
    fused pose, so tracking RIDES THROUGH the perfect frames that
    reset the faithful engine (seed 101: faithful loses frames 3/6/9
    to the NaN->reset chain; fixed tracks all 10 with finite poses)."""
    import dataclasses

    from lsdtpu.config import DEFAULT
    from lsdtpu.runtime.loop import (make_map_context, run_sequence,
                                     stack_frames)
    ds = synth_dataset(101)
    art = odrv.prepare_map(ds.map_value.copy(), ds.param.resol)
    ctx = make_map_context(art.lines_info, art.map_cache, ds.param.resol,
                           ds.param.ori_x, ds.param.ori_y)
    frames = stack_frames(ds, dtype=np.float64)
    faith = run_sequence(frames, ctx, DEFAULT)
    fixed = run_sequence(frames, ctx,
                         dataclasses.replace(DEFAULT, faithful=False))
    f_sc = np.asarray(faith["score"])
    x_sc = np.asarray(fixed["score"])
    assert np.isinf(f_sc).any()              # faithful loses frames
    assert np.isnan(np.asarray(faith["pose"])).any()
    assert np.isfinite(x_sc).all()           # fixed tracks everything
    assert np.isfinite(np.asarray(fixed["pose"])).all()


def test_nan_lane_isolation_in_batch_and_pool():
    """A perfect-score NaN chain in ONE lane of a vmapped batch (and
    one slot of the serving pool) must not perturb sibling lanes: the
    clean sequence's outputs stay bitwise its solo rollout.  Guards
    the production serving surface against cross-lane contamination
    (vmap lanes share compiled ops; a stray cross-lane reduction
    would smear the NaN)."""
    from lsdtpu.runtime.batch import run_batch
    from lsdtpu.runtime.loop import (MapContext, make_map_context,
                                     run_sequence, stack_frames)

    ds_nan = synth_dataset(101)     # hits score==0 -> NaN chain
    ds_ok = synth_dataset(100)      # clean tracking
    art_nan = odrv.prepare_map(ds_nan.map_value.copy(), ds_nan.param.resol)
    art_ok = odrv.prepare_map(ds_ok.map_value.copy(), ds_ok.param.resol)

    def ctx_for(ds, art, max_lines):
        return make_map_context(art.lines_info, art.map_cache,
                                ds.param.resol, ds.param.ori_x,
                                ds.param.ori_y, max_map_lines=max_lines)

    M = 64
    ctx_nan = ctx_for(ds_nan, art_nan, M)
    ctx_ok = ctx_for(ds_ok, art_ok, M)
    f_nan = stack_frames(ds_nan, dtype=np.float64)
    f_ok = stack_frames(ds_ok, dtype=np.float64)
    solo = jax.tree.map(np.asarray, run_sequence(f_ok, ctx_ok))
    assert np.isfinite(np.asarray(solo["pose"])).all()

    def batch(lane0_f, lane0_c):
        bf = jax.tree.map(lambda a, b: np.stack([np.asarray(a),
                                                 np.asarray(b)]),
                          lane0_f, f_ok)
        bc = jax.tree.map(lambda a, b: np.stack([np.asarray(a),
                                                 np.asarray(b)]),
                          lane0_c, ctx_ok)
        return jax.tree.map(np.asarray, run_batch(bf, bc))

    with_nan = batch(f_nan, ctx_nan)       # lane 0 = NaN chain
    clean_x2 = batch(f_ok, ctx_ok)         # lane 0 = clean twin
    assert np.isnan(with_nan["pose"][0]).any()
    assert np.isfinite(clean_x2["pose"]).all()
    # the SHARP contract: the clean lane is bitwise identical whether
    # its sibling walks the NaN chain or not (vmap lanes independent)
    for k in ("pose", "score", "n_candidates"):
        np.testing.assert_array_equal(with_nan[k][1], clean_x2[k][1],
                                      err_msg=k)
    # and vmap-vs-single numerics stay in the ulp tier (batched ops
    # compile with different FMA fusion than the single-sequence
    # rollout - scores land bitwise, the UKF pose chain ~1e-10)
    np.testing.assert_array_equal(with_nan["score"][1], solo["score"])
    np.testing.assert_allclose(with_nan["pose"][1], solo["pose"],
                               atol=1e-8)

    # --- the SERVING POOL surface (its own slot/state management on
    # top of the vmapped step): a NaN-chain session next to a clean
    # session vs the clean session next to a clean twin - the clean
    # slot's outputs must be bitwise identical tick for tick
    from lsdtpu.runtime.serving import SessionPool

    H = max(art_nan.map_cache.shape[0], art_ok.map_cache.shape[0])
    W = max(art_nan.map_cache.shape[1], art_ok.map_cache.shape[1])
    args_nan = (art_nan.lines_info, art_nan.map_cache,
                ds_nan.param.resol, ds_nan.param.ori_x, ds_nan.param.ori_y)
    args_ok = (art_ok.lines_info, art_ok.map_cache,
               ds_ok.param.resol, ds_ok.param.ori_x, ds_ok.param.ori_y)

    def pool_run(slot0_args, slot0_ds):
        pool = SessionPool(capacity=2, canvas_hw=(H, W), dtype=np.float64)
        pool.open_session("x", *slot0_args)
        pool.open_session("ok", *args_ok)
        got = []
        nf = min(len(slot0_ds.frames), len(ds_ok.frames), 10)
        for f in range(nf):
            fx, fo = slot0_ds.frames[f], ds_ok.frames[f]
            pool.submit_scan("x", fx[:, 0], fx[:, 1],
                             slot0_ds.odom[f + 1])
            pool.submit_scan("ok", fo[:, 0], fo[:, 1], ds_ok.odom[f + 1])
            res = pool.step()
            got.append((res["x"]["pose"], res["ok"]["pose"],
                        res["ok"]["score"]))
        return got

    with_nan_p = pool_run(args_nan, ds_nan)
    clean_p = pool_run(args_ok, ds_ok)
    assert any(np.isnan(r[0]).any() for r in with_nan_p)  # chain hit
    for f, (a, b) in enumerate(zip(with_nan_p, clean_p)):
        np.testing.assert_array_equal(a[1], b[1],
                                      err_msg=f"pool pose tick {f}")
        np.testing.assert_array_equal(a[2], b[2],
                                      err_msg=f"pool score tick {f}")

