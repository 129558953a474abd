"""Ambiguity-aware relocalization (match.relock_margin).

In a symmetric environment the reference's global relock picks the
min-score candidate among near-identical distant hypotheses
(myFA.cpp:96-108) - an arbitrary choice.  The opt-in margin defers the
lock when the score landscape is multimodal at relock scale
(match/associate.relock_ambiguity: positional OR heading separation).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from lsdtpu.config import DEFAULT
from lsdtpu.io.loaders import Dataset, MapParam
from lsdtpu.oracle import driver as odrv
from lsdtpu.runtime.loop import make_map_context, run_sequence, stack_frames

from test_fuzz_parity import RESOL, ORI_X, ORI_Y, synth_map


def _twin_map(H=140, W=360):
    """Two IDENTICAL rooms - globally ambiguous by construction."""
    g = np.zeros((H, W), np.uint8)
    for x0 in (8, 200):
        x1 = x0 + 120
        y0, y1 = 8, H - 8
        g[y0:y1, x0:x1] = 255
        g[y0, x0:x1] = 1
        g[y1 - 1, x0:x1] = 1
        g[y0:y1, x0] = 1
        g[y0:y1, x1 - 1] = 1
    return g


def _raycast_gapped(g, wx, wy, n=360, rmax=10.0):
    """Raycast with corner-sector dropouts (a gapless closed ring
    yields no RDP cells - same convention as __graft_entry__)."""
    H, W = g.shape
    deg = np.arange(n)
    keep = np.ones(n, bool)
    for lo in (30, 135, 210, 315):
        keep &= ~((deg >= lo) & (deg <= lo + 15))
    ang = np.deg2rad(deg)
    steps = np.arange(0.05, rmax, 0.01)
    X = wx + np.cos(ang)[:, None] * steps[None, :]
    Y = wy + np.sin(ang)[:, None] * steps[None, :]
    ix = np.clip(((X - ORI_X) / RESOL + 0.5).astype(int), 0, W - 1)
    iy = np.clip(((Y - ORI_Y) / RESOL + 0.5).astype(int), 0, H - 1)
    occ = g[iy, ix] == 1
    hit = occ.any(axis=1) & keep
    r = steps[np.argmax(occ, axis=1)]
    return r[hit], ang[hit]


def _rollout(g, wx, wy, margin, n_frames=3):
    art = odrv.prepare_map(g.copy(), RESOL)
    H, W = g.shape
    ctx = make_map_context(art.lines_info, art.map_cache, RESOL,
                           ORI_X, ORI_Y)
    r, a = _raycast_gapped(g, wx, wy)
    frames = [np.stack([r, a], axis=1) for _ in range(n_frames)]
    ds = Dataset(param=MapParam(W, H, RESOL, ORI_X, ORI_Y),
                 map_value=g.copy(),
                 odom=np.zeros((n_frames + 1, 3)), frames=frames)
    cfg = dataclasses.replace(DEFAULT, match=dataclasses.replace(
        DEFAULT.match, relock_margin=margin))
    return jax.tree.map(np.asarray, run_sequence(
        stack_frames(ds, dtype=np.float64), ctx, cfg))


def test_twin_rooms_reference_locks_arbitrarily_margin_defers():
    g = _twin_map()
    wx = ORI_X + 48 * RESOL        # off-center inside room A
    wy = ORI_Y + g.shape[0] / 2 * RESOL

    # reference semantics: locks SOMEWHERE with a confident score -
    # the argmin between the two rooms' identical hypotheses
    ref = _rollout(g, wx, wy, margin=0.0)
    assert np.isfinite(ref["score"][0])
    assert not ref["relock_deferred"].any()

    # margin: the second mode (other room / flipped heading) ties the
    # winner, so every frame defers instead of guessing
    rob = _rollout(g, wx, wy, margin=0.3)
    assert rob["relock_deferred"].all()
    assert not np.isfinite(rob["score"]).any()
    assert (rob["pose"][:, 0] == -1).all()     # never locked


def test_asymmetric_room_not_deferred():
    """Control: a room with random interior walls (distinct geometry)
    locks on the first frame even with the margin on."""
    g = synth_map(0)
    H, W = g.shape
    wx = ORI_X + W / 2 * RESOL
    wy = ORI_Y + H / 2 * RESOL
    outs = _rollout(g, wx, wy, margin=0.3)
    assert np.isfinite(outs["score"][0])
    assert not outs["relock_deferred"].any()


def test_twin_rooms_deferral_exact_under_tp_sharding():
    """The second-mode pmin must reproduce the single-device deferral
    decisions exactly when candidates are sharded over map lines
    (DESIGN.md claims tp exactness for relock_ambiguity)."""
    from lsdtpu.runtime.shard import make_mesh, run_batch_sharded
    from lsdtpu.runtime.loop import MapContext

    g = _twin_map()
    wx = ORI_X + 48 * RESOL
    wy = ORI_Y + g.shape[0] / 2 * RESOL
    single = _rollout(g, wx, wy, margin=0.3)

    art = odrv.prepare_map(g.copy(), RESOL)
    H, W = g.shape
    ctx = make_map_context(art.lines_info, art.map_cache, RESOL,
                           ORI_X, ORI_Y)
    r, a = _raycast_gapped(g, wx, wy)
    frames_l = [np.stack([r, a], axis=1) for _ in range(3)]
    ds = Dataset(param=MapParam(W, H, RESOL, ORI_X, ORI_Y),
                 map_value=g.copy(), odom=np.zeros((4, 3)),
                 frames=frames_l)
    frames = stack_frames(ds, dtype=np.float64)
    cfg = dataclasses.replace(DEFAULT, match=dataclasses.replace(
        DEFAULT.match, relock_margin=0.3))

    mesh = make_mesh()
    batch = jax.tree.map(lambda x: np.asarray(x)[None], frames)
    ctxs = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)[None]), ctx)
    ctxs = MapContext(*ctxs) if not isinstance(ctxs, MapContext) else ctxs
    outs = jax.tree.map(np.asarray,
                        run_batch_sharded(batch, ctxs, mesh, cfg))
    np.testing.assert_array_equal(outs["relock_deferred"][0],
                                  single["relock_deferred"])
    np.testing.assert_array_equal(np.isfinite(outs["score"][0]),
                                  np.isfinite(single["score"]))
    assert outs["relock_deferred"][0].all()
