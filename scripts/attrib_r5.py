"""Round-5 residual attribution: candgen+fuse+UKF+glue measured
directly (not by subtraction).

The published bound (docs/DESIGN.md r5) infers the non-scoring match
residual as full minus every measured term.  This script measures it:
a match-stage-only rollout (featurize precomputed outside the timed
region, attrib_r4's protocol) is timed twice - once real, once with
`assoc.score_candidates` monkeypatched to a mask-only stub (no field
gather, constant accepted scores) traced into its own jit.  Then

    match      - match_noscore ~ exact scoring (gather + finalize)
    match_noscore - floor      ~ candgen + fuse + UKF + driver glue

The stub keeps shapes/dtypes and the acceptance path live (every
candidate accepted, so fuse's weighted mean still reduces over the
full live set - an upper-ish bound on fuse work).

CAVEAT (review r5): the stub's garbage fused poses diverge
state.last_pose from the real trajectory, so candgen's HMM gating
and the live-count-following chunk trip counts execute a DIFFERENT
per-frame workload than the real rollout - the decomposition is
workload-approximate, not exact.  On data1 it agrees with the
independent subtraction residual to ~1 ms (47 vs ~47, docs/DESIGN.md),
which is the evidence the approximation holds there; re-check that
agreement before trusting the split on other datasets.

This script intentionally does NOT share attrib_r4's harness: r4's
protocol (host-numpy frames re-uploaded per call) is kept frozen for
cross-round comparability, while this one times device-resident
inputs (the r5 H2D separation).  The two scripts' numbers are NOT
directly comparable.

Usage: python scripts/attrib_r5.py [--cpu] [--repeats N]
Chip rules apply (probe first, one process, time-to-value).
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = "/root/reference/data_20190513/data_f3key/data1"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args(argv)

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from lsdtpu.config import DEFAULT
    from lsdtpu.io import load_dataset
    from lsdtpu.match import associate as assoc
    from lsdtpu.runtime.artifacts import prepare_map_cached
    from lsdtpu.runtime.loop import (featurize_stage, init_state,
                                     make_map_context, match_stage,
                                     stack_frames)

    ds = load_dataset(DATA)
    lines, cache = prepare_map_cached(ds.map_value, ds.param.resol,
                                      backend="oracle")
    cfg = dataclasses.replace(
        DEFAULT, shapes=dataclasses.replace(
            DEFAULT.shapes, max_candidates=4096, max_scan_pixels=2048))
    ctx = make_map_context(lines, cache, ds.param.resol, ds.param.ori_x,
                           ds.param.ori_y, dtype=np.float32)
    frames = stack_frames(ds, dtype=np.float32)
    print(f"# backend={jax.default_backend()} "
          f"frames={frames['ranges'].shape[0]}", file=sys.stderr)

    def featurize_all(frames):
        return jax.vmap(lambda fr: featurize_stage(
            (fr["ranges"], fr["angles"], fr["valid"], fr["n"],
             fr["odom_prev"], fr["odom_cur"]), ctx, cfg))(frames)

    fs_all = jax.block_until_ready(jax.jit(featurize_all)(frames))
    frames_dev = jax.tree.map(jnp.asarray, frames)
    jax.block_until_ready(frames_dev)

    def make_match_roll():
        def match_roll(frames, fs_all):
            state = init_state(frames["ranges"].dtype)

            def step(carry, xs):
                fr, fs = xs
                inputs = (fr["ranges"], fr["angles"], fr["valid"],
                          fr["n"], fr["odom_prev"], fr["odom_cur"])
                return match_stage(carry, fs, inputs, ctx, cfg)

            _f, outs = jax.lax.scan(step, state, (frames, fs_all))
            return outs
        return jax.jit(match_roll)

    def timed(fn, n):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            np.asarray(fn(frames_dev, fs_all)["pose"])
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts), min(ts), max(ts)

    real = make_match_roll()
    np.asarray(real(frames_dev, fs_all)["pose"])   # compile+warm
    m_real = timed(real, args.repeats)
    print(f"match (real scorer)  {m_real[0]*1e3:8.2f} ms  "
          f"[{m_real[1]*1e3:.2f}, {m_real[2]*1e3:.2f}]", flush=True)

    # stub: no field gather; every live candidate accepted at score 1
    orig = assoc.score_candidates

    def stub(cand, pixels, pixels_mask, map_cache, **kw):
        return jnp.where(cand.mask, jnp.asarray(1.0, cand.ca.dtype),
                         jnp.inf)
    assoc.score_candidates = stub
    try:
        noscore = make_match_roll()
        np.asarray(noscore(frames_dev, fs_all)["pose"])
    finally:
        assoc.score_candidates = orig
    m_ns = timed(noscore, args.repeats)
    print(f"match (stub scorer)  {m_ns[0]*1e3:8.2f} ms  "
          f"[{m_ns[1]*1e3:.2f}, {m_ns[2]*1e3:.2f}]", flush=True)
    print(f"-> exact scoring ~ {(m_real[0]-m_ns[0])*1e3:.1f} ms; "
          f"candgen+fuse+UKF+glue (incl. streaming floor) ~ "
          f"{m_ns[0]*1e3:.1f} ms", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
