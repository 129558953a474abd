"""Accuracy sweep: every bundled ground-truth sequence.

Runs the full localization loop on each dataset (f32 production mode)
and reports keyframe ATE vs realPos.txt.  Usage:
    python scripts/sweep_ate.py [--mapprep oracle|tpu] [--out results.json]
                                [--backend cpu|default]

Default backend is the host CPU: a 19-sequence sweep is a long
many-transfer workload, exactly the shape that has wedged the fragile
axon TPU tunnel (CLAUDE.md); accuracy numbers are backend-independent.
Pass --backend default to run on the chip deliberately.
"""

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

# run as `python scripts/sweep_ate.py` from anywhere; PYTHONPATH must
# stay unset on this host (it breaks axon PJRT plugin registration)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mapprep", default="oracle",
                    choices=("oracle", "tpu"))
    ap.add_argument("--out", default=None)
    ap.add_argument("--backend", default="cpu",
                    choices=("cpu", "default"))
    ap.add_argument("--cache-dtype", default=None,
                    choices=("f32", "bf16", "u16", "u8"),
                    help="distance-field compression (match/associate."
                         "py quantize_cache); default: the config's "
                         "match.cache_dtype")
    ap.add_argument("--roots", nargs="*", default=[
        "/root/reference/data_20190513/data_f3key/data*",
        "/root/reference/data_20190514/data_f4key/data*",
    ])
    # lsdtpu.cli imports no jax at module level, so this is safe before
    # the backend flag is applied
    from lsdtpu.cli import PRESETS
    ap.add_argument("--preset", default="faithful",
                    choices=sorted(PRESETS),
                    help="config preset (lsdtpu/cli.py PRESETS)")
    ap.add_argument("--set", action="append", default=[],
                    metavar="PATH=VALUE", dest="overrides",
                    help="config override applied after --preset")
    args = ap.parse_args()

    import jax
    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from lsdtpu.cli import build_cfg
    from lsdtpu.eval import ate as eval_ate
    from lsdtpu.io import load_dataset
    from lsdtpu.runtime import make_map_context, run_sequence, stack_frames
    from lsdtpu.runtime.artifacts import prepare_map_cached

    cfg = build_cfg(args)

    paths = sorted(p for pat in args.roots for p in glob.glob(pat))
    results = []
    for p in paths:
        t0 = time.perf_counter()
        try:
            ds = load_dataset(p)
            lines, cache = prepare_map_cached(ds.map_value, ds.param.resol,
                                              z_occ_max_dis=cfg.map
                                              .z_occ_max_dis,
                                              backend=args.mapprep,
                                              growth=cfg.lsd.growth,
                                              nfa_kernel=cfg.lsd.nfa_kernel)
            ctx = make_map_context(lines, cache, ds.param.resol,
                                   ds.param.ori_x, ds.param.ori_y,
                                   dtype=np.float32,
                                   cache_dtype=(args.cache_dtype or
                                                cfg.match.cache_dtype),
                                   z_occ_max_dis=cfg.map.z_occ_max_dis)
            frames = stack_frames(ds, dtype=np.float32)
            outs = jax.block_until_ready(run_sequence(frames, ctx, cfg))
            F = frames["ranges"].shape[0]
            scores = np.asarray(outs["score"])
            poses = np.asarray(outs["pose"])
            rec = {"seq": p.split("reference/")[-1], "frames": F,
                   "tracked": int(np.isfinite(scores).sum()),
                   "map_lines": int(len(lines)),
                   "wall_s": round(time.perf_counter() - t0, 1)}
            if ds.real_pos is not None:
                a = eval_ate.keyframe_ate(
                    poses, ds.real_pos, ds.recorded_odom, ds.param.resol,
                    ds.param.ori_x, ds.param.ori_y)
                al = eval_ate.aligned_keyframe_ate(
                    poses, ds.real_pos, ds.recorded_odom, ds.param.resol,
                    ds.param.ori_x, ds.param.ori_y)
                rec.update(ate_rmse_m=round(a.rmse, 4),
                           ate_mean_m=round(a.mean, 4),
                           ate_max_m=round(a.max, 4), keyframes=a.n,
                           aligned_ate_rmse_m=round(al.rmse, 4))
        except Exception as e:
            rec = {"seq": p, "error": f"{type(e).__name__}: {e}"}
        print(json.dumps(rec), flush=True)
        results.append(rec)

    ates = [r["ate_rmse_m"] for r in results if "ate_rmse_m" in r]
    aligned = [r["aligned_ate_rmse_m"] for r in results
               if "aligned_ate_rmse_m" in r]
    summary = {"sequences": len(results),
               "with_gt": len(ates),
               "ate_rmse_mean": round(float(np.mean(ates)), 4) if ates
               else None,
               "ate_rmse_median": round(float(np.median(ates)), 4)
               if ates else None,
               "ate_rmse_worst": round(float(np.max(ates)), 4) if ates
               else None,
               "aligned_ate_rmse_mean": round(float(np.mean(aligned)), 4)
               if aligned else None,
               "aligned_ate_rmse_worst": round(float(np.max(aligned)), 4)
               if aligned else None}
    print(json.dumps({"summary": summary}), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"results": results, "summary": summary}, f,
                      indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
