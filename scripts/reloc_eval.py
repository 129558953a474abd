"""Kidnapped-robot relocalization evaluation.

The reference's only recovery mechanism is global relocalization: with
no prior (the (-1,-1) sentinel) the HMM gate opens and the min-score
candidate wins (myFA.cpp:96-108, 330).  It ships no evaluation of how
reliably that works.  This script measures it on every ground-truth
sequence: the filter state is RESET mid-trajectory (the kidnapped-robot
protocol) at 25/50/75% of the rollout, and the restarted chain is
compared against the uninterrupted rollout of the same sequence.

Implementation: the corpus-replay reset flag (runtime/loop.py
run_sequence) restarts the carry in-sequence, so all starts of one
sequence share ONE compiled rollout; a reset-at-frame-k run is bitwise
the standalone rollout of frames[k:].

Metrics per (sequence, offset): lock latency (frames until a finite
score after the reset) and pose agreement with the uninterrupted
rollout at the lock frame and over the remaining trajectory.

Usage: python scripts/reloc_eval.py [--out docs/reloc_r2.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/root/reference")
    ap.add_argument("--out", default=None)
    ap.add_argument("--offsets", default="0.25,0.5,0.75")
    ap.add_argument("--backend", choices=("default", "cpu"),
                    default="cpu",
                    help="accuracy is backend-independent; default cpu "
                         "keeps the accelerator free")
    args = ap.parse_args()

    if args.backend == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np

    from lsdtpu.io import load_dataset
    from lsdtpu.runtime.artifacts import prepare_map_cached
    from lsdtpu.runtime.loop import (make_map_context, run_sequence,
                                     stack_frames)

    seqs = [f"data_20190513/data_f3key/data{i}" for i in range(1, 10)] + \
        [f"data_20190514/data_f4key/data{i}" for i in range(1, 11)]
    offsets = [float(x) for x in args.offsets.split(",")]

    rows = []
    for seq in seqs:
        ds = load_dataset(os.path.join(args.root, seq))
        lines, cache = prepare_map_cached(ds.map_value, ds.param.resol)
        ctx = make_map_context(lines, cache, ds.param.resol,
                               ds.param.ori_x, ds.param.ori_y)
        frames = stack_frames(ds, dtype=np.float32)
        F = frames["ranges"].shape[0]
        frames = dict(frames, reset=np.zeros((F,), bool))
        base = jax.tree.map(np.asarray, run_sequence(frames, ctx))
        bp = base["pose"]

        for off in offsets:
            # clamp: an offset of 1.0 would index one past the end
            k = min(max(int(off * F), 0), F - 1)
            fr = dict(frames)
            fr["reset"] = np.zeros((F,), bool)
            fr["reset"][k] = True
            outs = jax.tree.map(np.asarray, run_sequence(fr, ctx))
            sc = outs["score"][k:]
            fin = np.isfinite(sc)
            lock = int(np.argmax(fin)) if fin.any() else -1
            err = np.linalg.norm(outs["pose"][k:, :2] - bp[k:, :2],
                                 axis=1) * ds.param.resol
            row = {
                "seq": seq, "offset": off, "frames_after": int(F - k),
                "lock_latency": lock,
                "err_at_lock_m": (round(float(err[lock]), 4)
                                  if lock >= 0 else None),
                "err_rest_max_m": (round(float(err[lock:].max()), 4)
                                   if lock >= 0 else None),
                # relock judgment: the first locked pose agrees with the
                # uninterrupted rollout.  err_rest_max is reported
                # separately - the restarted chain legitimately differs
                # from the original's filter memory downstream.
                "relocked": bool(lock >= 0 and err[lock] < 0.5),
            }
            rows.append(row)
            print(f"{seq} @{off:.2f}: lock+{lock} "
                  f"err@lock {row['err_at_lock_m']} m "
                  f"rest_max {row['err_rest_max_m']} m "
                  f"{'OK' if row['relocked'] else 'FAIL'}")

    ok = sum(r["relocked"] for r in rows)
    lat = [r["lock_latency"] for r in rows if r["lock_latency"] >= 0]
    summary = {
        "n_starts": len(rows), "relocked": ok,
        "lock_latency_median": float(np.median(lat)) if lat else None,
        "lock_latency_max": int(max(lat)) if lat else None,
    }
    print("summary:", json.dumps(summary))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump({"summary": summary, "rows": rows}, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
