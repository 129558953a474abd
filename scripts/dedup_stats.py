"""Measure exact candidate-transform duplication on a real rollout.

VERDICT r4 task 4: the 4 endpoint-alignment hypotheses
(reference: LSD/myFA.cpp:194-235) can produce coincident rigid
transforms - e.g. two map lines sharing an endpoint after direction
normalization, or fwd/rev hypotheses of symmetric pairs.  Two
candidates apply the SAME transform to every scan pixel iff their
(ca, sa, tx, ty) agree, where the affine form of the scorer's
transform (match/associate.py score path)

    px' = (px - sx)*ca - (py - sy)*sa + mx
        =  px*ca - py*sa + (mx - sx*ca + sy*sa)   ->  tx
    py' = (px - sx)*sa + (py - sy)*ca + my
        =  px*sa + py*ca + (my - sx*sa - sy*ca)   ->  ty

Duplicates therefore gather the identical (K,P) rows - pure waste in
the element-bound scorer.  This script replays a sequence, records
every frame's live candidate tuples, and reports exact-duplicate
rates (f32 bitwise equality on the affine tuple) split by
tracking/relock frames.  Decision rule (VERDICT): dedupe if >=~20%.

Usage: python scripts/dedup_stats.py [--data PATH] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = "/root/reference/data_20190513/data_f3key/data1"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=DATA)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
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

    from functools import partial

    @partial(jax.jit, static_argnames=())
    def rollout_with_cands(frames):
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
            # affine tuple of the transform each candidate applies
            tx = cand.mx - (cand.sx * cand.ca - cand.sy * cand.sa)
            ty = cand.my - (cand.sx * cand.sa + cand.sy * cand.ca)
            # hand the candidates back in: candgen runs ONCE and the
            # measured set is the set the scorer consumes by construction
            new_carry, out = rloop.match_stage(
                carry, fs, inputs, ctx, cfg, coarse=coarse, cand=cand)
            rec = {"ca": cand.ca, "sa": cand.sa, "tx": tx, "ty": ty,
                   "mask": cand.mask,
                   "tracking": jnp.abs(carry.last_pose[0] + 1) >= 1e-4}
            return new_carry, rec

        _f, recs = jax.lax.scan(step, state, frames)
        return recs

    recs = jax.tree.map(np.asarray, rollout_with_cands(frames))
    F = recs["mask"].shape[0]
    tot_live = tot_uniq = 0
    per_kind = {True: [0, 0, 0], False: [0, 0, 0]}  # live, uniq, frames
    worst = []
    for f in range(F):
        m = recs["mask"][f]
        tup = np.stack([recs[k][f][m] for k in ("ca", "sa", "tx", "ty")], 1)
        live = tup.shape[0]
        uniq = np.unique(tup.view([("", tup.dtype)] * 4)).shape[0] \
            if live else 0
        tot_live += live
        tot_uniq += uniq
        kind = bool(recs["tracking"][f])
        per_kind[kind][0] += live
        per_kind[kind][1] += uniq
        per_kind[kind][2] += 1
        if live:
            worst.append((1.0 - uniq / live, f, live, uniq))
    worst.sort(reverse=True)
    print(f"frames={F}  total live candidates={tot_live}  "
          f"unique transforms={tot_uniq}  "
          f"duplicate rate={1.0 - tot_uniq / max(tot_live, 1):.3%}")
    for kind, label in ((True, "tracking"), (False, "relock")):
        lv, un, nf = per_kind[kind]
        print(f"  {label:9s}: frames={nf:4d} live={lv:7d} uniq={un:7d} "
              f"dup={1.0 - un / max(lv, 1):.3%}")
    print("worst frames (dup_rate, frame, live, uniq):")
    for w in worst[:8]:
        print(f"  {w[0]:.3%}  f={w[1]}  live={w[2]}  uniq={w[3]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
