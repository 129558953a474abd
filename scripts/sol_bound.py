"""Speed-of-light bound for the headline rollout (VERDICT r4 task 2).

Computes the achievable floor of the 279-frame data1 rollout from
first principles plus measured machine constants:

    floor_total = scan streaming floor            (measured, reduce-only
                                                   k-sweep: ~26-30 ms)
                + gathered elements / gather rate (counted here /
                                                   measured 134 M elem/s)
                + UKF chain                        (measured: rides the
                                                   floor, ~+10 ms)
                + featurize math                   (measured stage minus
                                                   floor)

The gather-volume term is counted EXACTLY here on CPU (it is a
function of live candidate/pixel counts and the chunk grid, not of
the backend): per frame the scorer sweeps
ceil(live_cand/score_chunk)*score_chunk x
ceil(live_pix/score_pixel_chunk)*score_pixel_chunk gathered cells
(match/associate.py dynamic chunk loops), x4 when pruning pads the
relock frame's bound pass.

Usage: python scripts/sol_bound.py [--data PATH]
Prints per-frame stats and the bound arithmetic; paste the result
into docs/DESIGN.md's speed-of-light section.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = "/root/reference/data_20190513/data_f3key/data1"
GATHER_RATE = 134e6   # measured v5e arbitrary-gather rate, elem/s (r3/r4)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=DATA)
    args = ap.parse_args(argv)

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
    cfg = DEFAULT

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
            new_carry, out = rloop.match_stage(
                carry, fs, inputs, ctx, cfg, coarse=coarse)
            rec = {"live_cand": jnp.sum(cand.mask.astype(jnp.int32)),
                   "live_pix": jnp.sum(fs.pixels_mask.astype(jnp.int32)),
                   "tracking": jnp.abs(carry.last_pose[0] + 1) >= 1e-4}
            return new_carry, rec

        _f, recs = jax.lax.scan(step, state, frames)
        return recs

    recs = jax.tree.map(np.asarray, rollout_counts(frames))
    kc = cfg.match.score_chunk
    kp = cfg.match.score_pixel_chunk
    lc = recs["live_cand"].astype(np.int64)
    lp = recs["live_pix"].astype(np.int64)
    pad_c = -(-lc // kc) * kc
    pad_p = -(-lp // kp) * kp
    swept = pad_c * pad_p                       # gathered cells per frame
    live = lc * lp                              # useful cells per frame
    F = lc.shape[0]
    tr = recs["tracking"]
    print(f"frames={F} (tracking {tr.sum()}, relock {F - tr.sum()})")
    print(f"live candidates: tracking mean {lc[tr].mean():.1f} "
          f"(max {lc[tr].max()}), relock {lc[~tr].tolist()}")
    print(f"live pixels: mean {lp.mean():.1f}  max {lp.max()}")
    print(f"gathered cells, chunk-padded {kc}x{kp}: total {swept.sum():,} "
          f"(useful {live.sum():,}, padding {1 - live.sum()/swept.sum():.1%})")
    t_gather = swept.sum() / GATHER_RATE
    print(f"\nbound arithmetic @ {GATHER_RATE/1e6:.0f} M elem/s:")
    print(f"  scoring gather  : {t_gather*1e3:7.1f} ms")
    print("  + scan floor    : ~26-30 ms (measured, reduce-only k-sweep r5)")
    print("  + UKF-over-floor: ~10 ms (measured ukf-only minus floor)")
    print("  + featurize math: ~75-100 ms (measured feat-only minus floor)")
    lo = t_gather * 1e3 + 26 + 10 + 75
    hi = t_gather * 1e3 + 30 + 10 + 100
    print(f"  = achievable floor ~{lo:.0f}-{hi:.0f} ms "
          "(assumes zero candgen/fuse/glue)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
