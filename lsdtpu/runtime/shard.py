"""Multi-chip execution: dp x tp sharding over a jax.sharding.Mesh.

The reference's only parallelism is a 30-thread pthread pool fanning out
candidate-scoring tasks on one host (LSD/myFA.cpp:22-62).  The TPU
design shards two axes over the device mesh:

  * **dp** (data parallel): independent sequences - no communication;
  * **tp** (tensor parallel): the map-line axis of the candidate space.
    Each device gates+scores the hypotheses of its map-line shard
    against the (replicated) scan features, and fusion reduces with a
    single `psum` of (sum_w, sum(pose*w), n) per frame - exact, because
    the reference's inverse-square-score weighted mean is itself a sum
    reduction (myFA.cpp:159-171).  First-frame argmin uses `pmin` with
    lowest-rank tie-break.

The mapCache prior is replicated (a few MB per map); for maps too large
to replicate, shard it spatially and psum the per-pixel partial sums of
CalcScore - see ops/score_pallas.py for the kernel-level variant.

All collectives ride ICI inside one slice; sequences never communicate,
so scaling to multi-host pods puts dp on DCN and tp on ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from lsdtpu.config import EngineConfig, DEFAULT
from lsdtpu.runtime.loop import (MapContext, init_state,
                                 localization_step, prepare_coarse,
                                 reset_carry)

TP_AXIS = "tp"
DP_AXIS = "dp"


def make_mesh_1d(n_devices: Optional[int] = None) -> Mesh:
    """1-D (dp,) mesh over the first n_devices devices - the shared
    constructor behind the serving-pool, temporal-segment, and
    map-prep-block meshes."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (DP_AXIS,))


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None
              ) -> Mesh:
    """Build a (dp, tp) mesh over the available devices.

    dp defaults to the largest power-of-two divisor <= sqrt(n); pass
    dp=1 for pure tensor parallelism or dp=n for pure data parallelism.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if dp is None:
        # largest power-of-two divisor with dp <= tp (dp divides n by
        # construction: it only doubles while n % (dp*2) == 0)
        dp = 1
        while dp * 2 <= n // (dp * 2) and n % (dp * 2) == 0:
            dp *= 2
    elif n % dp != 0:
        raise ValueError(f"dp={dp} does not divide {n} devices")
    tp = n // dp
    arr = np.array(devs).reshape(dp, tp)
    return Mesh(arr, (DP_AXIS, TP_AXIS))


def _frames_spec(has_reset: bool = False):
    spec = {
        "ranges": P(DP_AXIS), "angles": P(DP_AXIS), "valid": P(DP_AXIS),
        "n": P(DP_AXIS), "odom_prev": P(DP_AXIS), "odom_cur": P(DP_AXIS),
    }
    if has_reset:
        # corpus replay (batch.stack_concat): per-frame reset flags ride
        # the same (B, F) layout as every other frame input
        spec["reset"] = P(DP_AXIS)
    return spec


def _ctx_spec(kind: str = "tp"):
    if kind == "tp":
        return MapContext(
            lines=P(DP_AXIS, TP_AXIS), lines_mask=P(DP_AXIS, TP_AXIS),
            cache=P(DP_AXIS), rows=P(DP_AXIS), cols=P(DP_AXIS),
            resol=P(DP_AXIS), ori_x=P(DP_AXIS), ori_y=P(DP_AXIS))
    return MapContext(
        lines=P(DP_AXIS), lines_mask=P(DP_AXIS),
        cache=P(DP_AXIS, MP_AXIS), rows=P(DP_AXIS), cols=P(DP_AXIS),
        resol=P(DP_AXIS), ori_x=P(DP_AXIS), ori_y=P(DP_AXIS))


def _out_spec():
    return {
        "pose": P(DP_AXIS), "score": P(DP_AXIS),
        "n_candidates": P(DP_AXIS), "n_scan_lines": P(DP_AXIS),
        "candidate_overflow": P(DP_AXIS), "coasting": P(DP_AXIS),
        "relock_deferred": P(DP_AXIS),
        "measurement": P(DP_AXIS), "scan_pose": P(DP_AXIS),
    }


def _pad_to_mesh(frames, ctxs: MapContext, n_dp: int, n_tp: int):
    """Pad the batch axis to a multiple of dp (replicating the last
    sequence - the clones run on otherwise-idle dp shards and are
    sliced off) and the map-line axis to a multiple of tp (masked-out
    padding lines).  Returns (frames, ctxs, true_B)."""
    B = ctxs.lines.shape[0]
    bpad = (-B) % n_dp
    if bpad:
        rep = lambda a: jnp.concatenate(  # noqa: E731
            [a, jnp.broadcast_to(a[-1:], (bpad,) + a.shape[1:])])
        frames = jax.tree.map(rep, frames)
        ctxs = jax.tree.map(rep, ctxs)
    mpad = (-ctxs.lines.shape[1]) % n_tp
    if mpad:
        ctxs = dataclasses.replace(
            ctxs,
            lines=jnp.pad(ctxs.lines, ((0, 0), (0, mpad), (0, 0))),
            lines_mask=jnp.pad(ctxs.lines_mask, ((0, 0), (0, mpad))))
    return frames, ctxs, B


# jitted runners cached by (mesh, cfg, kind): a fresh closure per call
# would never hit XLA's compile cache (jit keys on function identity),
# so every invocation would re-trace + recompile the whole rollout
_RUNNERS: dict = {}


def _runner(mesh: Mesh, cfg: EngineConfig, kind: str,
            has_reset: bool = False):
    key = (mesh, cfg, kind, has_reset)
    fn = _RUNNERS.get(key)
    if fn is not None:
        return fn
    axis_kw = dict(tp_axis=TP_AXIS) if kind == "tp" else \
        dict(mp_axis=MP_AXIS)
    from lsdtpu.runtime.loop import vmapped_cfg
    cfg = vmapped_cfg(cfg)      # one_seq runs under vmap (see loop.py)

    def device_fn(fr, cx):
        # local shapes: fr (B/dp, F, ...); tp: cx.lines (B/dp, M/tp, 10);
        # mp: cx.cache (B/dp, H/mp, W)
        def one_seq(fr1, cx1):
            state = init_state(fr1["ranges"].dtype)
            # pruning needs the full-height field: tp replicates the
            # cache, mp owns only a row block (scores unpruned)
            coarse = prepare_coarse(cx1, cfg) if kind == "tp" else None

            def step(carry, f):
                carry = reset_carry(carry, f)
                inputs = (f["ranges"], f["angles"], f["valid"], f["n"],
                          f["odom_prev"], f["odom_cur"])
                return localization_step(carry, inputs, cx1, cfg,
                                         coarse=coarse, **axis_kw)

            _s, outs = jax.lax.scan(step, state, fr1)
            return outs

        return jax.vmap(one_seq)(fr, cx)

    ctx_spec = _ctx_spec(kind)
    sfn = shard_map(device_fn, mesh=mesh,
                    in_specs=(_frames_spec(has_reset), ctx_spec),
                    out_specs=_out_spec(), check_vma=False)
    fn = _RUNNERS[key] = jax.jit(sfn)
    return fn


def run_batch_sharded(frames, ctxs: MapContext, mesh: Mesh,
                      cfg: EngineConfig = DEFAULT):
    """Sharded batched rollout.

    frames: pytree with (B, F, ...) axes; ctxs: MapContext with (B, ...)
    axes.  B and the map-line axis need not divide the mesh - they are
    padded to it (and outputs sliced back).  Returns outputs with
    (B, F, ...) axes, replicated over tp.
    """
    frames, ctxs, B = _pad_to_mesh(frames, ctxs, mesh.shape[DP_AXIS],
                                   mesh.shape[TP_AXIS])
    with mesh:
        outs = _runner(mesh, cfg, "tp", "reset" in frames)(frames, ctxs)
    return jax.tree.map(lambda a: a[:B], outs)


MP_AXIS = "mp"


def make_mesh_mp(n_devices: Optional[int] = None, dp: Optional[int] = None
                 ) -> Mesh:
    """(dp, mp) mesh for map-block sharding (same split heuristic)."""
    m = make_mesh(n_devices, dp)
    return Mesh(m.devices, (DP_AXIS, MP_AXIS))


def run_batch_sharded_mapblocks(frames, ctxs: MapContext, mesh: Mesh,
                                cfg: EngineConfig = DEFAULT):
    """Sharded rollout with the mapCache prior row-sharded over `mp`.

    The TPU-native form of partitioning a giant map across devices
    (SURVEY.md 5.7c/5.8): each device owns a horizontal block of the
    distance field, scores the pixels that land in its block, and a
    psum of the additive (sum_d, n_valid) partials reproduces the
    replicated-field scores exactly.  Map lines and scans are
    replicated over mp (they are KBs; the field is the heavy part).
    """
    n_mp = mesh.shape[MP_AXIS]
    frames, ctxs, B = _pad_to_mesh(frames, ctxs, mesh.shape[DP_AXIS], 1)
    H = ctxs.cache.shape[1]
    pad = (-H) % n_mp
    if pad:
        ctxs = dataclasses.replace(
            ctxs, cache=jnp.pad(ctxs.cache, ((0, 0), (0, pad), (0, 0))))
    with mesh:
        outs = _runner(mesh, cfg, "mp", "reset" in frames)(frames, ctxs)
    return jax.tree.map(lambda a: a[:B], outs)
