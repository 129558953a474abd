"""Sub-pixel pose polish (match/polish.py) - a capability beyond the
reference: Gauss-Newton on the bilinear distance field.

1. Synthetic recovery: a pose perturbed off a known wall layout is
   pulled back to the truth.
2. Real-data rollout: with polish on, tracking is preserved and the
   mean wall-fit residual (field distance of the measurement) does not
   increase; with polish off the rollout is bitwise-unchanged (parity
   default).
3. Degenerate inputs (lost frame NaN pose, empty pixel cloud) pass
   through unchanged.
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from lsdtpu.config import DEFAULT
from lsdtpu.match import polish
from lsdtpu.oracle import driver as odrv
from lsdtpu.runtime import make_map_context, run_sequence, stack_frames


def _wall_field(H=96, W=128, wall_x=64.0, wall_y=48.0, cap=1.0, res=0.05):
    """Distance (m) to an L-shaped wall pair x=wall_x, y=wall_y."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    d = np.minimum(np.abs(xx - wall_x), np.abs(yy - wall_y)) * res
    return np.minimum(d, cap)


def test_polish_recovers_perturbed_pose():
    res = 0.05
    cache = jnp.asarray(_wall_field(res=res), jnp.float32)
    # scan-local pixel cloud lying exactly on both walls when the true
    # pose (x=64, y=48, theta=0) is applied with lidar at local (0, 0)
    xs = np.concatenate([np.zeros(30), np.arange(-20, 25, 1.5)])
    ys = np.concatenate([np.arange(-30, 30, 2.0), np.zeros(30)])
    P = 96
    pix = np.zeros((P, 2), np.int32)
    pix[:len(xs), 0] = np.round(xs)
    pix[:len(xs), 1] = np.round(ys)
    mask = np.zeros(P, bool)
    mask[:len(xs)] = True
    true_pose = jnp.array([64.0, 48.0, 0.0], jnp.float32)
    start = true_pose + jnp.array([2.2, -1.7, 0.0])
    out, c0, c1 = polish.polish_pose(
        start, jnp.zeros(2, jnp.float32), jnp.asarray(pix),
        jnp.asarray(mask), cache, iters=8)
    assert float(c1) < float(c0)
    # both wall families constrain x and y; theta is weakly observable
    np.testing.assert_allclose(np.asarray(out[:2]),
                               np.asarray(true_pose[:2]), atol=0.35)


def test_polish_degenerate_passthrough():
    cache = jnp.asarray(_wall_field(), jnp.float32)
    pix = jnp.zeros((8, 2), jnp.int32)
    no_mask = jnp.zeros(8, bool)
    pose = jnp.array([10.0, 10.0, 5.0], jnp.float32)
    out, _, _ = polish.polish_pose(pose, jnp.zeros(2, jnp.float32),
                                   pix, no_mask, cache)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(pose))
    nan_pose = jnp.array([jnp.nan, jnp.nan, jnp.nan], jnp.float32)
    out, _, _ = polish.polish_pose(nan_pose, jnp.zeros(2, jnp.float32),
                                   pix, jnp.ones(8, bool), cache)
    assert np.all(np.isnan(np.asarray(out)))


@pytest.fixture(scope="module")
def map_art(dataset_small):
    ds = dataset_small
    return odrv.prepare_map(ds.map_value, ds.param.resol)


def test_polish_rollout_tracks_and_tightens(dataset_small, map_art):
    ds = dataset_small
    NF = 25
    ctx = make_map_context(map_art.lines_info, map_art.map_cache,
                           ds.param.resol, ds.param.ori_x, ds.param.ori_y,
                           dtype=np.float32)
    frames = stack_frames(ds, dtype=np.float32, max_frames=NF)
    base = run_sequence(frames, ctx, DEFAULT)
    cfg_on = dataclasses.replace(
        DEFAULT, match=dataclasses.replace(DEFAULT.match, polish_pose=True))
    outs = run_sequence(frames, ctx, cfg_on)
    # tracking preserved frame-for-frame
    np.testing.assert_array_equal(np.isfinite(np.asarray(outs["score"])),
                                  np.isfinite(np.asarray(base["score"])))
    # the polished measurement never drifts beyond the basin cap
    m0 = np.asarray(base["measurement"])
    m1 = np.asarray(outs["measurement"])
    ok = np.isfinite(m0[:, 0])
    disp = np.hypot(m1[ok, 0] - m0[ok, 0], m1[ok, 1] - m0[ok, 1])
    assert disp.max() <= DEFAULT.match.polish_max_px + 1e-5
    # wall-fit residual: polished measurements sit at least as close to
    # the field (checked via polish's own cost at iters=0 equivalent)
    from lsdtpu import geometry as geo
    from lsdtpu.scan.featurize import featurize
    worse = 0
    for f in range(NF):
        if not ok[f]:
            continue
        fs = featurize(jnp.asarray(frames["ranges"][f]),
                       jnp.asarray(frames["angles"][f]),
                       jnp.asarray(frames["valid"][f]),
                       jnp.asarray(frames["n"][f]),
                       ctx.resol, ctx.ori_x, ctx.ori_y)
        lp = geo.c_round(fs.lidar_pos)
        _, c_base, _ = polish.polish_pose(
            jnp.asarray(m0[f]), lp, fs.pixels, fs.pixels_mask, ctx.cache,
            rows=ctx.rows, cols=ctx.cols, iters=1)
        _, c_pol, _ = polish.polish_pose(
            jnp.asarray(m1[f]), lp, fs.pixels, fs.pixels_mask, ctx.cache,
            rows=ctx.rows, cols=ctx.cols, iters=1)
        if float(c_pol) > float(c_base) + 1e-7:
            worse += 1
    assert worse == 0


def test_polish_zero_iters_is_bitwise_passthrough(dataset_small, map_art):
    """polish_pose=True with polish_iters=0 must reproduce the default
    (polish off) rollout bit-for-bit: the polish wiring in match_stage
    may not perturb the measurement path."""
    ds = dataset_small
    NF = 10
    ctx = make_map_context(map_art.lines_info, map_art.map_cache,
                           ds.param.resol, ds.param.ori_x, ds.param.ori_y,
                           dtype=np.float32)
    frames = stack_frames(ds, dtype=np.float32, max_frames=NF)
    cfg_noop = dataclasses.replace(
        DEFAULT, match=dataclasses.replace(DEFAULT.match, polish_pose=True,
                                           polish_iters=0))
    a = run_sequence(frames, ctx, DEFAULT)
    b = run_sequence(frames, ctx, cfg_noop)
    np.testing.assert_array_equal(np.asarray(a["pose"]),
                                  np.asarray(b["pose"]))
    np.testing.assert_array_equal(np.asarray(a["measurement"]),
                                  np.asarray(b["measurement"]))


def test_polish_rejects_pushing_pixels_off_map():
    """A candidate step that lowers the in-field mean only by shoving
    badly-fitting pixels off the map must be rejected (CalcScore-style
    off-field penalty in the acceptance cost)."""
    res = 0.05
    H, W = 32, 32
    # field is high (capped) everywhere except a low-cost trench at the
    # left edge: gradient points off-map at x<1
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    cache = jnp.asarray(np.clip(xx * res, 0, 1.0), jnp.float32)
    P = 16
    pix = np.zeros((P, 2), np.int32)
    pix[:, 0] = 2                      # all pixels near the left edge
    pix[:, 1] = np.arange(P)
    pose = jnp.array([0.0, 0.0, 0.0], jnp.float32)
    out, c0, c1 = polish.polish_pose(
        pose, jnp.zeros(2, jnp.float32), jnp.asarray(pix),
        jnp.ones(P, bool), cache, iters=6)
    # the gradient drives x negative; with the off-field penalty every
    # such step raises the acceptance cost, so the pose must not walk
    # the cloud off the map (x stays within one trust-region step)
    assert float(out[0]) > -1.6
    assert float(c1) <= float(c0)


def test_polish_mp_sharding_raises(dataset_small, map_art):
    import jax

    from lsdtpu.runtime.batch import stack_batch
    from lsdtpu.runtime.shard import (make_mesh_mp,
                                      run_batch_sharded_mapblocks)

    ds = dataset_small
    art = (map_art.lines_info, map_art.map_cache)
    frames, ctxs, _ = stack_batch([ds, ds], [art, art], dtype=np.float64,
                                  max_frames=2)
    cfg = dataclasses.replace(
        DEFAULT, match=dataclasses.replace(DEFAULT.match, polish_pose=True))
    with pytest.raises(ValueError, match="polish_pose"):
        jax.block_until_ready(
            run_batch_sharded_mapblocks(frames, ctxs, make_mesh_mp(), cfg))
