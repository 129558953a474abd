"""Speed-of-light bound for the headline rollout (VERDICT r4 task 2).

Counts the EXACT number of distance-field cells the shipping scorer
gathers over a rollout (the dominant bound term) and prints the full
achievable-floor arithmetic with the measured machine constants.
docs/DESIGN.md "The published bound" is the authoritative write-up;
this script reproduces its gather-volume row and its bottom line from
a fresh rollout.

Counting (mirrors runtime/loop.py + match/associate.py exactly; the
candidate tensor is passed back into match_stage so the counted set
IS the scored set):

  * plain frames (live < match.prune_min_live): the dynamic chunk
    loops sweep ceil(live_cand/score_chunk)*score_chunk x
    ceil(live_pix/score_pixel_chunk)*score_pixel_chunk field cells;
  * pruned frames (live >= prune_min_live, match.prune on - the
    relock-scale sweeps): a (padded_cand x G) COARSE-field bound
    gather (G = P_cap/prune_group groups, score_candidates_pruned
    phase 1), then the exact sweep over the padded SURVIVOR count
    only (phase 2).  Survivors are counted with the real bound
    helpers (_group_stats/_chunk_bound), so the count is the count.

Machine constants (measured 2026-08-21, one healthy relay process,
time-to-value - docs/RESULTS.md r5):
  H2D of the frame stack ~17 ms, scan streaming floor ~31 ms
  (device-resident, flat in unroll factor), coherent gather rate
  ~134 M elem/s (rollout-attributed; random-index is 75 M elem/s),
  featurize math ~82 ms, UKF chain ~25 ms.

Usage: python scripts/sol_bound.py [--data PATH]
(CPU-forced; live counts are backend-independent.)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = "/root/reference/data_20190513/data_f3key/data1"
GATHER_RATE = 134e6   # measured v5e coherent-gather rate, elem/s (r3/r4)
H2D_MS, FLOOR_MS, FEAT_MS, UKF_MS = 17.0, 31.0, 82.0, 25.0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=DATA)
    args = ap.parse_args(argv)

    import dataclasses

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from lsdtpu.config import DEFAULT
    from lsdtpu.io import load_dataset
    from lsdtpu.oracle import driver as odrv
    from lsdtpu.runtime import make_map_context, stack_frames
    from lsdtpu.runtime import loop as rloop

    ds = load_dataset(args.data)
    art = odrv.prepare_map(ds.map_value, ds.param.resol)
    ctx = make_map_context(art.lines_info, art.map_cache, ds.param.resol,
                           ds.param.ori_x, ds.param.ori_y)
    frames = stack_frames(ds)
    # the bench-pinned shape (bench.py / attrib_r4.py): the published
    # bound must count the same chunk/group grids the bench runs
    cfg = dataclasses.replace(
        DEFAULT, shapes=dataclasses.replace(
            DEFAULT.shapes, max_candidates=4096, max_scan_pixels=2048))

    @jax.jit
    def rollout_counts(frames):
        state = rloop.init_state(frames["ranges"].dtype)
        coarse = rloop.prepare_coarse(ctx, cfg)

        def step(carry, fr):
            inputs = (fr["ranges"], fr["angles"], fr["valid"], fr["n"],
                      fr["odom_prev"], fr["odom_cur"])
            fs = rloop.featurize_stage(inputs, ctx, cfg)
            from lsdtpu import geometry as geo
            from lsdtpu.match import associate as assoc
            lidar_pose = geo.c_round(fs.lidar_pos)
            cand = assoc.generate_candidates(
                fs.lines, fs.lines_mask, ctx.lines, ctx.lines_mask,
                lidar_pose, carry.last_pose,
                max_candidates=cfg.shapes.max_candidates,
                ignore_scan_length=cfg.match.ignore_scan_length,
                scan_to_map_diff=cfg.match.scan_to_map_diff,
                max_esti_dist=cfg.match.max_esti_dist)
            # survivors of the pruning bound, computed with the REAL
            # bound helpers on the full candidate set (same math as
            # score_candidates_pruned phase 1, unchunked)
            dt = cand.ca.dtype
            n_all = jnp.sum(fs.pixels_mask).astype(dt)
            gs = assoc._group_stats(fs.pixels, fs.pixels_mask,
                                    cfg.match.prune_group, dt)
            ch, cw = coarse.shape
            bounds = assoc._chunk_bound(
                (cand.ca, cand.sa, cand.sx, cand.sy, cand.mx, cand.my),
                gs, coarse.reshape(-1), cw, ch, cfg.match.prune_block,
                ctx.rows, ctx.cols, cfg.map.z_occ_max_dis,
                cfg.match.max_dist_penalty, cfg.match.obstacle_tolerance,
                cfg.match.valid_ratio, n_all, dt)
            n_surv = jnp.sum((bounds < cfg.match.score_accept)
                             & cand.mask).astype(jnp.int32)
            new_carry, out = rloop.match_stage(
                carry, fs, inputs, ctx, cfg,
                coarse=coarse, cand=cand)
            rec = {"live_cand": jnp.sum(cand.mask.astype(jnp.int32)),
                   "live_pix": jnp.sum(fs.pixels_mask.astype(jnp.int32)),
                   "n_surv": n_surv,
                   "tracking": jnp.abs(carry.last_pose[0] + 1) >= 1e-4}
            return new_carry, rec

        _f, recs = jax.lax.scan(step, state, frames)
        return recs

    recs = jax.tree.map(np.asarray, rollout_counts(frames))
    kc = cfg.match.score_chunk
    kp = cfg.match.score_pixel_chunk
    lc = recs["live_cand"].astype(np.int64)
    lp = recs["live_pix"].astype(np.int64)
    ns = recs["n_surv"].astype(np.int64)
    pruned = (np.full(lc.shape, cfg.match.prune)
              & (lc >= cfg.match.prune_min_live))
    G = cfg.shapes.max_scan_pixels // cfg.match.prune_group
    pad = lambda x, c: -(-x // c) * c                       # noqa: E731
    swept = np.where(
        pruned,
        pad(lc, kc) * G + pad(ns, kc) * pad(lp, kp),        # bound+exact
        pad(lc, kc) * pad(lp, kp))                          # plain sweep
    live = np.where(pruned, lc * G + ns * lp, lc * lp)
    F = lc.shape[0]
    tr = recs["tracking"]
    print(f"frames={F} (tracking {tr.sum()}, relock {F - tr.sum()}; "
          f"pruned-path frames {pruned.sum()})")
    print(f"live candidates: tracking mean {lc[tr].mean():.1f} "
          f"(max {lc[tr].max()}), relock {lc[~tr].tolist()} "
          f"-> survivors {ns[~tr].tolist()}")
    print(f"live pixels: mean {lp.mean():.1f}  max {lp.max()}")
    print(f"gathered cells, chunk grids {kc}x{kp} (G={G}): "
          f"total {swept.sum():,} "
          f"(useful {live.sum():,}, padding {1 - live.sum()/swept.sum():.1%})")
    t_g = swept.sum() / GATHER_RATE * 1e3
    t_g0 = live.sum() / GATHER_RATE * 1e3
    print(f"\nbound arithmetic @ {GATHER_RATE/1e6:.0f} M elem/s "
          "(constants: docs/RESULTS.md r5):")
    print(f"  scoring gather   : {t_g:7.1f} ms (as chunked)  "
          f"/ {t_g0:.1f} ms (zero padding)")
    print(f"  + H2D            : {H2D_MS:7.1f} ms")
    print(f"  + scan floor     : {FLOOR_MS:7.1f} ms")
    print(f"  + featurize math : {FEAT_MS:7.1f} ms")
    print(f"  + UKF chain      : {UKF_MS:7.1f} ms")
    base = H2D_MS + FLOOR_MS + FEAT_MS + UKF_MS
    print(f"  = achievable floor {base + t_g:.0f} ms as-built / "
          f"{base + t_g0:.0f} ms zero-padding "
          "(assumes zero candgen/fuse/glue)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
