"""Round-4 time-to-value stage attribution for the headline rollout.

Measures, in ONE process on the current default backend (TPU under the
driver), median-of-N time-to-value for:

  * full      - the bench rollout (run_sequence, pinned K=4096/P=2048)
  * feat      - featurize-only rollout: lax.scan of featurize_stage
                over the same frames, materializing per-frame outputs
  * match     - match-stage-only rollout: featurize precomputed OUTSIDE
                the timed region (vmapped), timed scan runs
                match_stage (candgen + score + fuse + UKF + glue)
  * ukf       - UKF-chain-only rollout: lax.scan of ukf_step with
                fixed measurements

Every timing materializes outputs on the host (np.asarray): through
the axon relay block_until_ready returns at enqueue (docs/RESULTS.md
round-3 correction), so time-to-value is the only valid method here.

Usage: python scripts/attrib_r4.py [--cpu] [--repeats N]
       [--only full,feat,match,ukf]
Run it under `timeout` and never alongside another python process when
on-chip (CLAUDE.md relay notes).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import statistics
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = "/root/reference/data_20190513/data_f3key/data1"


def timed(fn, n):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts), min(ts), max(ts)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--only", default="full,feat,match,ukf")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from lsdtpu.config import DEFAULT
    from lsdtpu.filter import ukf as fukf
    from lsdtpu.io import load_dataset
    from lsdtpu.runtime.artifacts import prepare_map_cached
    from lsdtpu.runtime.loop import (featurize_stage, init_state,
                                     make_map_context, match_stage,
                                     run_sequence, stack_frames)

    ds = load_dataset(DATA)
    lines, cache = prepare_map_cached(ds.map_value, ds.param.resol,
                                      backend="oracle")
    cfg = dataclasses.replace(
        DEFAULT, shapes=dataclasses.replace(
            DEFAULT.shapes, max_candidates=4096, max_scan_pixels=2048))
    ctx = make_map_context(lines, cache, ds.param.resol, ds.param.ori_x,
                           ds.param.ori_y, dtype=np.float32)
    frames = stack_frames(ds, dtype=np.float32)
    F = frames["ranges"].shape[0]
    print(f"# backend={jax.default_backend()} frames={F} "
          f"map_lines_pad={int(ctx.lines.shape[0])}", file=sys.stderr)

    results = {}
    only = set(args.only.split(","))

    def record(name, run, materialize):
        jax.block_until_ready(run())        # compile
        materialize(run())                  # first-value warmup
        med, lo, hi = timed(lambda: materialize(run()), args.repeats)
        results[name] = {"median_ms": round(med * 1e3, 2),
                         "min_ms": round(lo * 1e3, 2),
                         "max_ms": round(hi * 1e3, 2)}
        print(f"{name:6s} {med * 1e3:9.2f} ms  "
              f"[{lo * 1e3:.2f}, {hi * 1e3:.2f}]", flush=True)

    if "full" in only:
        record("full", lambda: run_sequence(frames, ctx, cfg),
               lambda o: np.asarray(o["pose"]))

    if "feat" in only:
        @jax.jit
        def feat_roll(frames):
            def step(carry, fr):
                fs = featurize_stage(
                    (fr["ranges"], fr["angles"], fr["valid"], fr["n"],
                     fr["odom_prev"], fr["odom_cur"]), ctx, cfg)
                return carry, (fs.n_pixels, fs.lidar_pos,
                               jnp.sum(fs.lines_mask))
            _c, outs = jax.lax.scan(step, 0, frames)
            return outs

        record("feat", lambda: feat_roll(frames),
               lambda o: (np.asarray(o[0]), np.asarray(o[1])))

    if "match" in only:
        @jax.jit
        def featurize_all(frames):
            return jax.vmap(lambda fr: featurize_stage(
                (fr["ranges"], fr["angles"], fr["valid"], fr["n"],
                 fr["odom_prev"], fr["odom_cur"]), ctx, cfg))(frames)

        fs_all = jax.block_until_ready(featurize_all(frames))

        @jax.jit
        def match_roll(frames, fs_all):
            state = init_state(frames["ranges"].dtype)

            def step(carry, xs):
                fr, fs = xs
                inputs = (fr["ranges"], fr["angles"], fr["valid"],
                          fr["n"], fr["odom_prev"], fr["odom_cur"])
                return match_stage(carry, fs, inputs, ctx, cfg)

            _f, outs = jax.lax.scan(step, state, (frames, fs_all))
            return outs

        record("match", lambda: match_roll(frames, fs_all),
               lambda o: np.asarray(o["pose"]))

    for name in only:
        # per-chip execution modes (the RESULTS mode table): batchN =
        # run_batch over N clones of the sequence; temporalN = one-chip
        # temporal split into N segments
        if name.startswith("batch"):
            B = int(name[5:])
            from lsdtpu.runtime.batch import run_batch
            from lsdtpu.runtime.loop import MapContext
            bframes = jax.tree.map(
                lambda x: np.broadcast_to(x, (B,) + x.shape).copy(),
                frames)
            bctx = MapContext(*[jnp.broadcast_to(jnp.asarray(v),
                                                 (B,) + jnp.shape(v))
                                for v in (ctx.lines, ctx.lines_mask,
                                          ctx.cache, ctx.rows, ctx.cols,
                                          ctx.resol, ctx.ori_x,
                                          ctx.ori_y)])
            record(name,
                   lambda bframes=bframes, bctx=bctx: run_batch(
                       bframes, bctx, cfg),
                   lambda o: np.asarray(o["pose"]))
        elif name.startswith("temporal"):
            S = int(name[8:])
            from lsdtpu.runtime.temporal import (make_mesh_sp,
                                                 run_sequence_temporal)
            mesh = make_mesh_sp(1)
            record(name,
                   lambda mesh=mesh, S=S: run_sequence_temporal(
                       frames, ctx, mesh, cfg, n_segments=S),
                   lambda o: np.asarray(o["pose"]))

    if "floor" in only:
        # the cost of a 279-iteration lax.scan that only reduces its
        # per-frame inputs - the per-iteration overhead floor any
        # frame-sequential stage pays on this backend
        @jax.jit
        def floor_roll(frames):
            def step(c, fr):
                return c, jnp.sum(fr["ranges"]) + jnp.sum(fr["angles"])
            _c, outs = jax.lax.scan(step, 0, frames)
            return outs

        record("floor", lambda: floor_roll(frames),
               lambda o: np.asarray(o))

    if "cells" in only or "rdp" in only:
        # featurize sub-stages (scan/featurize.py internals): gap
        # clustering alone, then + the RDP fixpoint - the deltas
        # attribute the featurize cost between clustering, RDP rounds,
        # and extraction+pixels+compaction (= feat - rdp)
        import importlib
        sfeat = importlib.import_module("lsdtpu.scan.featurize")

        def _prep(fr):
            ranges, angles, valid, n = (fr["ranges"], fr["angles"],
                                        fr["valid"], fr["n"])
            xs = ranges * jnp.cos(angles)
            ys = ranges * jnp.sin(angles)
            return ranges, valid, n, xs, ys

        if "cells" in only:
            @jax.jit
            def cells_roll(frames):
                def step(c, fr):
                    ranges, valid, n, xs, ys = _prep(fr)
                    cid, rot = sfeat._segment_cells(
                        ranges, xs, ys, valid, n, cfg.rdp.least_point)
                    return c, (jnp.sum(cid), rot)
                _c, outs = jax.lax.scan(step, 0, frames)
                return outs

            record("cells", lambda: cells_roll(frames),
                   lambda o: np.asarray(o[0]))

        if "rdp" in only:
            @jax.jit
            def rdp_roll(frames):
                def step(c, fr):
                    ranges, valid, n, xs, ys = _prep(fr)
                    N = ranges.shape[0]
                    idx = jnp.arange(N)
                    cid, rot = sfeat._segment_cells(
                        ranges, xs, ys, valid, n, cfg.rdp.least_point)
                    r_abs = jnp.mod(idx + rot, jnp.maximum(n, 1))
                    r_abs = jnp.where(idx < n, r_abs, idx)
                    cid_r = cid[r_abs]
                    in_cell = cid_r < N
                    prev_id = jnp.concatenate([jnp.array([N]), cid_r[:-1]])
                    next_id = jnp.concatenate([cid_r[1:], jnp.array([N])])
                    start = in_cell & (cid_r != prev_id)
                    end = in_cell & (cid_r != next_id)
                    marker = sfeat._rdp_rounds(
                        xs[r_abs], ys[r_abs], ranges[r_abs],
                        start | end, in_cell & ~start & ~end,
                        cfg.rdp.thre_line, max_rounds=N)
                    return c, jnp.sum(marker)
                _c, outs = jax.lax.scan(step, 0, frames)
                return outs

            record("rdp", lambda: rdp_roll(frames),
                   lambda o: np.asarray(o))

    for name in only:
        # cfg variants of the full rollout, e.g. cfg:prefeaturize=true
        # or cfg:match.score_pixel_chunk=256 (cli.apply_overrides syntax)
        if not name.startswith("cfg:"):
            continue
        from lsdtpu.cli import apply_overrides
        vcfg = apply_overrides(cfg, name[4:].split(";"))
        vctx = ctx
        if vcfg.match.cache_dtype != cfg.match.cache_dtype:
            # cache compression is a make_map_context-time choice
            vctx = make_map_context(
                lines, cache, ds.param.resol, ds.param.ori_x,
                ds.param.ori_y, dtype=np.float32,
                cache_dtype=vcfg.match.cache_dtype,
                z_occ_max_dis=vcfg.map.z_occ_max_dis)
        record(name, lambda vcfg=vcfg, vctx=vctx: run_sequence(
            frames, vctx, vcfg), lambda o: np.asarray(o["pose"]))

    if "ukf" in only:
        @partial(jax.jit, static_argnums=0)
        def ukf_roll(n):
            x0 = jnp.asarray(fukf.RESET_X, jnp.float32)
            P0 = jnp.asarray(fukf.RESET_P, jnp.float32)
            sp = jnp.array([0.1, 0.05, 0.01], jnp.float32)

            def step(carry, _):
                x, P = carry
                x2, P2 = fukf.ukf_step(x, P, sp, x[:3] + 0.01)
                return (x2, P2), x2[0]

            (_x, _P), xs = jax.lax.scan(step, (x0, P0), None, length=n)
            return xs

        record("ukf", lambda: ukf_roll(F),
               lambda o: np.asarray(o))

    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
