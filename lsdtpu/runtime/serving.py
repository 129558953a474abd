"""Multi-session serving: N robots localized in one batched device call.

Production-serving layer with no reference equivalent (the reference
is one robot per process).  TPU-native design: a fixed pool of session
slots compiled once as a vmapped per-frame step; every tick executes
ALL active sessions' scans in a single device call, so one chip serves
a fleet.  Maps are padded onto a common canvas (the same batching rule
as runtime/batch.py); per-slot TrackState lives on device between
ticks; joining/leaving sessions just swaps a slot's map context and
resets its state.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lsdtpu.config import EngineConfig, DEFAULT
from lsdtpu.runtime.loop import (MapContext, TrackState, init_state,
                                 localization_step)
from lsdtpu.runtime.shard import DP_AXIS


def make_pool_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D (dp,) mesh for spreading a session pool's slot axis across
    chips - every tick's batched step then runs SPMD with zero
    collectives (slots are independent robots)."""
    from lsdtpu.runtime.shard import make_mesh_1d
    return make_mesh_1d(n_devices)


@partial(jax.jit, static_argnames=("cfg",))
def _pool_step(states: TrackState, inputs, ctxs: MapContext, active,
               cfg: EngineConfig, coarse=None):
    """Vmapped localization step; inactive slots keep their state.
    coarse: optional (B, ch, cw) per-slot pruning fields, maintained by
    the pool alongside the slot caches (loop-invariant across ticks)."""
    from lsdtpu.runtime.loop import vmapped_cfg
    cfg = vmapped_cfg(cfg)

    if coarse is None:
        def one(state, inp, ctx):
            return localization_step(state, inp, ctx, cfg)

        new_states, outs = jax.vmap(one)(states, inputs, ctxs)
    else:
        def one_p(state, inp, ctx, co):
            return localization_step(state, inp, ctx, cfg, coarse=co)

        new_states, outs = jax.vmap(one_p)(states, inputs, ctxs, coarse)
    keep = lambda new, old: jnp.where(
        active.reshape((-1,) + (1,) * (new.ndim - 1)), new, old)
    new_states = jax.tree.map(keep, new_states, states)
    return new_states, outs


class SessionPool:
    """Fixed-capacity pool of concurrent localization sessions.

    mesh: optional 1-D (dp,) Mesh (make_pool_mesh) - the slot axis of
    every per-tick array is then sharded over the mesh devices, so one
    batched step call serves the fleet across ALL chips (slots are
    independent: XLA partitions the vmapped step with no collectives;
    results match single-device to FMA-contraction level - the
    partitioned program's fusion choices differ).  The internal
    slot count is padded up to a mesh multiple; the extra slots are
    never handed out.
    """

    def __init__(self, capacity: int, canvas_hw, cfg: EngineConfig = DEFAULT,
                 dtype=np.float32, mesh: Optional[Mesh] = None):
        from lsdtpu.match.associate import quantize_cache
        self.capacity = capacity
        self.cfg = cfg
        self.dtype = dtype
        self.H, self.W = canvas_hw
        self._mesh = mesh
        self._sharding = None
        if mesh is not None:
            if mesh.devices.ndim != 1 or mesh.axis_names != (DP_AXIS,):
                raise ValueError(
                    f"SessionPool mesh must be 1-D ({DP_AXIS},); got "
                    f"{mesh.axis_names} shape {mesh.devices.shape}")
            n = mesh.devices.size
            capacity = -(-capacity // n) * n     # pad slots to the mesh
            self._sharding = lambda arr: jax.device_put(
                arr, NamedSharding(mesh, P(*([DP_AXIS] +
                                             [None] * (arr.ndim - 1)))))
        self._n_slots = capacity
        M = cfg.shapes.max_map_lines
        z = jnp.zeros
        # honor match.cache_dtype like make_map_context does (the
        # compressed field is per-POOL: all slots share one dtype)
        self._quantize = lambda c: quantize_cache(
            c, cfg.match.cache_dtype, cfg.map.z_occ_max_dis,
            float_dtype=dtype)
        self._ctxs = MapContext(
            lines=z((capacity, M, 10), dtype),
            lines_mask=z((capacity, M), bool),
            cache=self._quantize(np.full(
                (capacity, self.H, self.W), cfg.map.z_occ_max_dis,
                np.float32)),
            rows=z((capacity,), jnp.int32), cols=z((capacity,), jnp.int32),
            resol=jnp.ones((capacity,), dtype),
            ori_x=z((capacity,), dtype), ori_y=z((capacity,), dtype))
        self._states = jax.vmap(lambda _: init_state(jnp.dtype(dtype)))(
            jnp.arange(capacity))
        # per-slot pruning fields (match/associate.coarse_field),
        # recomputed only when a slot's map changes - never per tick
        if cfg.match.prune:
            from lsdtpu.match.associate import coarse_field
            self._coarse_fn = partial(coarse_field,
                                      block=cfg.match.prune_block)
            self._coarse = jax.vmap(self._coarse_fn)(self._ctxs.cache)
        else:
            self._coarse_fn = None
            self._coarse = None
        if self._sharding is not None:
            self._ctxs = jax.tree.map(self._sharding, self._ctxs)
            self._states = jax.tree.map(self._sharding, self._states)
            if self._coarse is not None:
                self._coarse = self._sharding(self._coarse)
        # only the user-requested capacity is ever handed out; padded
        # slots (mesh multiple) stay permanently free
        self._free: List[int] = list(range(self.capacity))
        self._sessions: Dict[str, int] = {}
        self._prev_odom: Dict[str, np.ndarray] = {}
        self._pending: Dict[int, tuple] = {}

    # -- session lifecycle ------------------------------------------------
    def open_session(self, sid: str, lines_info, map_cache, resol,
                     ori_x, ori_y) -> None:
        if sid in self._sessions:
            raise ValueError(f"session {sid!r} already open")
        if not self._free:
            raise RuntimeError("pool full")
        h, w = map_cache.shape
        if h > self.H or w > self.W:
            raise ValueError(f"map {h}x{w} exceeds canvas "
                             f"{self.H}x{self.W}")
        M = self.cfg.shapes.max_map_lines
        if len(lines_info) > M:
            # caps are never silent (ShapeConfig contract)
            raise ValueError(f"map has {len(lines_info)} lines > "
                             f"shapes.max_map_lines={M}; raise the cap")
        slot = self._free.pop(0)
        lines = np.zeros((M, 10), self.dtype)
        mask = np.zeros((M,), bool)
        k = len(lines_info)
        lines[:k] = lines_info
        mask[:k] = True
        cache = np.full((self.H, self.W), self.cfg.map.z_occ_max_dis,
                        np.float32)
        cache[:h, :w] = map_cache
        cache = self._quantize(cache)

        def set_slot(arr, val):
            return arr.at[slot].set(val)

        self._ctxs = MapContext(
            lines=set_slot(self._ctxs.lines, lines),
            lines_mask=set_slot(self._ctxs.lines_mask, mask),
            cache=set_slot(self._ctxs.cache, cache),
            rows=set_slot(self._ctxs.rows, h),
            cols=set_slot(self._ctxs.cols, w),
            resol=set_slot(self._ctxs.resol, resol),
            ori_x=set_slot(self._ctxs.ori_x, ori_x),
            ori_y=set_slot(self._ctxs.ori_y, ori_y))
        if self._coarse is not None:
            self._coarse = set_slot(self._coarse,
                                    self._coarse_fn(jnp.asarray(cache)))
        self._reset_slot(slot)
        self._sessions[sid] = slot

    def close_session(self, sid: str) -> None:
        slot = self._sessions.pop(sid)
        self._prev_odom.pop(sid, None)
        self._pending.pop(slot, None)
        self._free.append(slot)

    def _reset_slot(self, slot: int) -> None:
        fresh = init_state(jnp.dtype(self.dtype))
        self._states = jax.tree.map(
            lambda arr, v: arr.at[slot].set(v), self._states, fresh)

    @property
    def n_active(self) -> int:
        return len(self._sessions)

    # -- per-tick IO ------------------------------------------------------
    def submit_scan(self, sid: str, ranges, angles,
                    odom: Optional[np.ndarray] = None) -> None:
        slot = self._sessions[sid]
        N = self.cfg.shapes.points_per_scan
        n = len(ranges)
        if n > N:
            # caps are never silent (ShapeConfig contract)
            raise ValueError(f"scan has {n} points > "
                             f"shapes.points_per_scan={N}; raise the cap")
        r = np.zeros(N, self.dtype)
        a = np.zeros(N, self.dtype)
        v = np.zeros(N, bool)
        r[:n] = ranges
        a[:n] = angles[:n]
        v[:n] = True
        odom = np.zeros(3, self.dtype) if odom is None else \
            np.asarray(odom, self.dtype)
        prev = self._prev_odom.get(sid, odom)
        if slot in self._pending:
            # overwriting an unprocessed scan: keep ITS prev (the last
            # odometry the filter actually consumed), or the dropped
            # scan's motion would vanish from the UKF prediction
            prev = self._pending[slot][4]
        self._pending[slot] = (r, a, v, n, prev, odom)
        self._prev_odom[sid] = odom

    def step(self) -> Dict[str, dict]:
        """Run one batched device call over all submitted scans."""
        if not self._pending:
            return {}
        N = self.cfg.shapes.points_per_scan
        B = self._n_slots
        z = np.zeros
        ranges = z((B, N), self.dtype)
        angles = z((B, N), self.dtype)
        valid = z((B, N), bool)
        counts = z((B,), np.int32)
        prevs = z((B, 3), self.dtype)
        curs = z((B, 3), self.dtype)
        active = np.zeros((B,), bool)
        for slot, (r, a, v, n, p, c) in self._pending.items():
            ranges[slot], angles[slot], valid[slot] = r, a, v
            counts[slot], prevs[slot], curs[slot] = n, p, c
            active[slot] = True
        inputs = (jnp.asarray(ranges), jnp.asarray(angles),
                  jnp.asarray(valid), jnp.asarray(counts),
                  jnp.asarray(prevs), jnp.asarray(curs))
        active_dev = jnp.asarray(active)
        if self._sharding is not None:
            # shard every per-tick input on the slot axis so the jitted
            # step runs SPMD over the mesh (outputs/state follow)
            inputs = jax.tree.map(self._sharding, inputs)
            active_dev = self._sharding(active_dev)
        self._states, outs = _pool_step(self._states, inputs, self._ctxs,
                                        active_dev, self.cfg,
                                        self._coarse)
        outs = {k: np.asarray(v) for k, v in outs.items()}
        results = {}
        for sid, slot in self._sessions.items():
            if active[slot]:
                results[sid] = {k: v[slot] for k, v in outs.items()}
        self._pending.clear()
        return results
