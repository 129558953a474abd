"""Pipeline parallelism: scan featurization and matching on different
devices, overlapped across consecutive frames.

The reference's pipeline (SURVEY.md 1: L3 FeatureScan -> L4
FeatureAssociation) runs serially per frame.  Here the two stages run
on a 2-device `pp` mesh axis with a one-frame skew: while device 1
matches frame t (the heavy stage: candidate scoring + UKF), device 0
featurizes frame t+1, and the ScanFeatures bundle (a few KB) crosses
the ICI via ppermute each step.  Stage work is rank-gated with
lax.cond, so each device executes only its own stage's FLOPs.

Outputs are identical to the sequential rollout (the skew only changes
WHERE stage A runs, not its inputs), at one extra scan step of
latency.  This axis composes with dp (independent sequences) the same
way tp/mp do; it is a demonstration of the dataflow - for this
workload stage A is far cheaper than stage B, so pp is not a
throughput win (SURVEY.md 2: PP "optional").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from lsdtpu.config import EngineConfig, DEFAULT
from lsdtpu.runtime.loop import (MapContext, featurize_stage, init_state,
                                 match_stage, prepare_coarse)

PP_AXIS = "pp"


def make_mesh_pp() -> Mesh:
    devs = jax.devices()[:2]
    if len(devs) < 2:
        raise ValueError("pipeline parallelism needs >= 2 devices "
                         f"(have {len(devs)})")
    return Mesh(np.array(devs), (PP_AXIS,))


def _as_inputs(d):
    return (d["ranges"], d["angles"], d["valid"], d["n"],
            d["odom_prev"], d["odom_cur"])


# cached jitted runner per (mesh, cfg): a fresh shard_map+jit closure
# per call would bake the frame stacks and the map cache into the HLO
# as constants AND miss the compile cache on every invocation
_RUNNERS: dict = {}


def _runner(mesh: Mesh, cfg: EngineConfig):
    key = (mesh, cfg)
    fn = _RUNNERS.get(key)
    if fn is not None:
        return fn

    def device_fn(_token, feat_in, match_in, ctx):
        dt = feat_in["ranges"].dtype
        rank = jax.lax.axis_index(PP_AXIS)
        dummy = tuple(jnp.zeros_like(v[0]) for v in _as_inputs(feat_in))
        fs0 = featurize_stage(dummy, ctx, cfg)
        state0 = init_state(dt)
        coarse = prepare_coarse(ctx, cfg)
        out_shapes = jax.eval_shape(
            lambda: match_stage(state0, fs0, dummy, ctx, cfg,
                                coarse=coarse)[1])
        outs0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                             out_shapes)

        def step(carry, inp):
            state, fs_prev = carry
            fa, ma, warmup = inp
            fs_t = jax.lax.cond(
                rank == 0,
                lambda: featurize_stage(_as_inputs(fa), ctx, cfg),
                lambda: fs0)
            fs_send = jax.tree.map(
                lambda x: jax.lax.ppermute(x, PP_AXIS, [(0, 1)]), fs_t)
            # rank 1 matches frame s-1; the s=0 warm-up step must not
            # advance the TrackState (frame counter / angRotate sums),
            # or the is_offset frame-1 fix and theta averages diverge
            # from the sequential rollout
            new_state, outs = jax.lax.cond(
                rank == 1,
                lambda: match_stage(state, fs_prev, _as_inputs(ma), ctx,
                                    cfg, coarse=coarse),
                lambda: (state, outs0))
            new_state = jax.tree.map(
                lambda new, old: jnp.where(warmup, old, new), new_state,
                state)
            return (new_state, fs_send), outs

        F1 = feat_in["ranges"].shape[0]
        warmups = jnp.arange(F1) == 0
        _c, outs = jax.lax.scan(step, (state0, fs0),
                                (feat_in, match_in, warmups))
        return jax.tree.map(lambda x: x[None], outs)   # (1, F+1, ...)

    sfn = shard_map(device_fn, mesh=mesh,
                    in_specs=(P(PP_AXIS), P(), P(), P()),
                    out_specs=P(PP_AXIS), check_vma=False)
    fn = _RUNNERS[key] = jax.jit(sfn)
    return fn


def run_sequence_pipelined(frames, ctx: MapContext, mesh: Mesh,
                           cfg: EngineConfig = DEFAULT):
    """2-stage pipelined rollout; returns the same outputs dict as
    run_sequence.  frames: dict with leading (F, ...) frame axis."""
    dt = frames["ranges"].dtype

    def pad(x, front: bool):
        z = jnp.zeros_like(x[:1])
        return jnp.concatenate([z, x] if front else [x, z], axis=0)

    # step s (s = 0..F): stage A featurizes frame s (dummy at s=F);
    # stage B matches frame s-1 (dummy warm-up at s=0)
    feat_in = {k: pad(jnp.asarray(v), front=False)
               for k, v in frames.items()}
    match_in = {k: pad(jnp.asarray(v), front=True)
                for k, v in frames.items()}
    outs = _runner(mesh, cfg)(jnp.zeros((2,), dt), feat_in, match_in, ctx)
    # rank 1 holds the real outputs; drop the warm-up step
    return jax.tree.map(lambda x: x[1][1:], outs)
