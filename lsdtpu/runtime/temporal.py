"""Intra-sequence temporal parallelism: one long trajectory split
across devices (the SP/sequence-parallel axis, SURVEY.md 2 + 5.7d).

The reference (and the online loop here) rolls a trajectory strictly
sequentially - each frame's HMM gate and UKF depend on the previous
frame (LSD/myFA.cpp:13-184).  That chain is NOT a hard dependency for
offline/batch replay, because the engine itself defines a legal cold
start at any frame: from the (-1,-1) sentinel state the first frame
relocalizes GLOBALLY, ignoring the distance gate (myFA.cpp:96-108,
:330).  So a long sequence can be cut into S segments, each rolled out
in parallel from a speculative cold start, with a short overlap
("warmup") absorbed before each cut:

  * segment 0 processes frames [0, L+W) and keeps [0, L);
  * segment s>0 processes [sL-W, sL+L) and keeps [sL, sL+L).

Within the warmup the chain re-locks (global argmin) and the UKF
contracts onto the sequential chain: once both chains accept the same
candidate set (HMM radius 60 px >> the px-level state gap), their
MEASUREMENTS coincide exactly and the filter state converges
geometrically.  Residual differences (documented tolerance, not
bitwise): the running mean angle offset theta = ang_sum/ang_cnt
restarts per segment, so odometry deltas are rotated by a slightly
different theta estimate, and the faithful is_offset 360-degree fix
(main_on_windows.cpp:165-172) can only trigger inside segment 0.
Sequences that trip is_offset need the sequential path.

Execution is a shard_map over a 1-D (dp,) mesh: each device rolls
S/n_dev segments (vmap) as independent lax.scans - zero collectives,
wall-clock ~ (L+W)/F of the sequential rollout per device.  An optional
exact reconciliation pass feeds the stitched per-frame measurements to
the segment-parallel Schur chain solver (refine/pose_graph.py:180-265),
producing the jointly smoothed trajectory on top.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from lsdtpu.config import EngineConfig, DEFAULT
from lsdtpu.runtime.loop import (MapContext, init_state,
                                 localization_step, prepare_coarse,
                                 reset_carry)
from lsdtpu.runtime.shard import DP_AXIS


def make_mesh_sp(n_devices: Optional[int] = None) -> Mesh:
    """1-D (dp,) mesh: the segment axis of a split trajectory."""
    from lsdtpu.runtime.shard import make_mesh_1d
    return make_mesh_1d(n_devices)


def split_frames_temporal(frames, n_segments: int, warmup: int
                          ) -> Tuple[dict, int, int]:
    """Host-side: cut a (F, ...) frame stream into an (S, L+W, ...)
    overlapping segment stack.

    Tail padding uses dead frames (n=0, valid=False, repeated last
    odometry -> zero delta); their outputs land outside every keep
    window.  Returns (stack, L, F)."""
    F = frames["ranges"].shape[0]
    S = n_segments
    if S < 1:
        raise ValueError(f"n_segments={S} must be >= 1")
    L = -(-F // S)
    if warmup >= L and S > 1:
        raise ValueError(
            f"warmup={warmup} >= segment length {L} (F={F}, S={S}): "
            "every frame would be warmup; use fewer segments")
    Fp = max(S * L, L + warmup)

    def pad(a):
        pad_n = Fp - a.shape[0]
        if pad_n == 0:
            return np.asarray(a)
        tail = np.zeros((pad_n,) + a.shape[1:], a.dtype)
        return np.concatenate([np.asarray(a), tail])

    padded = {k: pad(v) for k, v in frames.items()}
    if F < Fp:
        # dead tail: pin BOTH odometry inputs to the final cumulative
        # odometry so every dead frame's delta is exactly zero (their
        # outputs land outside all keep windows regardless)
        for k in ("odom_prev", "odom_cur"):
            padded[k][F:] = padded["odom_cur"][F - 1]

    stack = {}
    starts = [0] + [s * L - warmup for s in range(1, S)]
    for k, v in padded.items():
        stack[k] = np.stack([v[st:st + L + warmup] for st in starts])
    return stack, L, F


# compile-cached runners (CLAUDE.md convention: never a fresh
# shard_map+jit closure per call)
_SP_RUNNERS: dict = {}


def _sp_runner(mesh: Mesh, cfg: EngineConfig, has_reset: bool):
    key = (mesh, cfg, has_reset)
    fn = _SP_RUNNERS.get(key)
    if fn is not None:
        return fn

    from lsdtpu.runtime.loop import vmapped_cfg
    cfg = vmapped_cfg(cfg)      # one_seg runs under vmap (see loop.py)

    def device_fn(fr, ctx):
        # fr: (S/n_dev, L+W, ...); ctx replicated
        def one_seg(fr1):
            state = init_state(fr1["ranges"].dtype)
            coarse = prepare_coarse(ctx, cfg)

            def step(carry, f):
                carry = reset_carry(carry, f)
                inputs = (f["ranges"], f["angles"], f["valid"], f["n"],
                          f["odom_prev"], f["odom_cur"])
                return localization_step(carry, inputs, ctx, cfg,
                                         coarse=coarse)

            _s, outs = jax.lax.scan(step, state, fr1)
            return outs

        return jax.vmap(one_seg)(fr)

    fspec = {k: P(DP_AXIS) for k in
             ("ranges", "angles", "valid", "n", "odom_prev", "odom_cur")}
    if has_reset:
        fspec["reset"] = P(DP_AXIS)
    ctx_spec = MapContext(*([P()] * 8))      # fully replicated map
    sfn = shard_map(device_fn, mesh=mesh, in_specs=(fspec, ctx_spec),
                    out_specs=P(DP_AXIS), check_vma=False)
    fn = _SP_RUNNERS[key] = jax.jit(sfn)
    return fn


def run_sequence_temporal(frames, ctx: MapContext, mesh: Mesh,
                          cfg: EngineConfig = DEFAULT, warmup: int = 24,
                          n_segments: Optional[int] = None):
    """Segment-parallel rollout of one long (possibly concatenated)
    frame stream.  frames: (F, ...) pytree (stack_frames/stack_concat);
    ctx: a single MapContext (no batch axis).  Returns (F, ...) outputs
    shaped exactly like run_sequence's.

    n_segments defaults to the mesh size and must be a multiple of it
    (each device rolls n_segments/n_dev segments).  warmup frames of
    overlap are re-processed before every cut and discarded - see the
    module docstring for the convergence argument and residual-
    difference caveats."""
    n_dev = mesh.devices.size
    S = n_dev if n_segments is None else n_segments
    if S % n_dev:
        raise ValueError(f"n_segments={S} not a multiple of "
                         f"{n_dev} mesh devices")
    stack, L, F = split_frames_temporal(frames, S, warmup)
    with mesh:
        outs = _sp_runner(mesh, cfg, "reset" in stack)(stack, ctx)
    outs = jax.tree.map(np.asarray, outs)

    def stitch(a):
        parts = [a[0][:L]]
        parts += [a[s][warmup:warmup + L] for s in range(1, S)]
        return np.concatenate(parts)[:F]

    return jax.tree.map(stitch, outs)


def reconcile_temporal(outs, odom_weight=(4.0, 4.0, 4.0)):
    """Exact joint smoothing of a stitched temporal rollout: the
    per-frame FA measurements + rotated odometry deltas feed the
    block-tridiagonal chain solver (refine/pose_graph.refine_trajectory
    - the Schur-complement machinery VERDICT r2 #2 points at), which
    reconciles segment boundaries globally.  Returns (refined (F, 3)
    poses, info)."""
    from lsdtpu.refine.pose_graph import refine_trajectory
    meas = np.asarray(outs["measurement"], np.float64)
    scores = np.asarray(outs["score"], np.float64)
    u = np.asarray(outs["scan_pose"], np.float64)
    refined, info = refine_trajectory(meas, scores, u,
                                      odom_weight=odom_weight)
    return np.asarray(refined), jax.tree.map(np.asarray, info)
