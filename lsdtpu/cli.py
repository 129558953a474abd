"""Command-line drivers - the reference's L5 layer.

Subcommands:
  run          offline dataset rollout (the Windows driver,
               LSD/main_on_windows.cpp:16-195) with ATE summary
  prepare-map  build + cache map artifacts (mapCache + LSD lines)
  bench        the headline throughput benchmark (bench.py)
  batch        vmap-batched multi-sequence rollout over several datasets

Example:
  python -m lsdtpu.cli run --data /root/reference/data_20190513/data_f3key/data1
"""

from __future__ import annotations

import argparse
import json
import sys
import time


# Config bundles (applied before --set, which can still override any
# field).  "faithful" is the do-nothing default: reference-exact
# semantics.  Rationale + measurements: docs/RESULTS.md.
PRESETS = {
    "faithful": (),
    "robust": ("match.obstacle_tolerance=0.35", "match.coast_on_loss=5",
               "match.relock_margin=0.2"),
    "accuracy": ("faithful=false", "match.polish_pose=true"),
}


def _add_cfg_args(p):
    p.add_argument("--set", action="append", default=[],
                   metavar="PATH=VALUE", dest="overrides",
                   help="config override, e.g. --set match.score_accept=2.5"
                        " --set faithful=false")
    p.add_argument("--preset", choices=sorted(PRESETS), default="faithful",
                   help="config bundle applied before --set overrides: "
                        "'faithful' (reference-exact, default), 'robust' "
                        "(obstacle tolerance + coast-on-loss + relock "
                        "margin), 'accuracy' (corrected odometry math + "
                        "sub-pixel pose polish)")


def _add_common(p):
    p.add_argument("--data", required=True, help="dataset directory")
    p.add_argument("--mapprep", choices=("tpu", "oracle", "tpu-sharded"), default="tpu")
    p.add_argument("--cache-dir", default=None, metavar="DIR",
                   help="map-artifact cache directory "
                        "(default ~/.cache/lsdtpu; point at a temp dir "
                        "for hermetic runs)")
    p.add_argument("--f64", action="store_true",
                   help="float64 parity mode (slow on TPU)")
    p.add_argument("--frames", type=int, default=None)
    _add_cfg_args(p)
    p.add_argument("--viz", default=None, metavar="DIR",
                   help="dump run images (map+lines, mapCache, trajectory,"
                        " per-frame scan windows) - the reference's OpenCV"
                        " displays, main_on_windows.cpp:175-178")
    p.add_argument("--viz-frames", type=int, default=3,
                   help="number of per-frame scan images to dump")


# Config fields where None is a meaningful value (--set path=none).
# Everything else rejects 'none' immediately instead of storing a None
# that only explodes later at jit-trace time with a context-free error.
OPTIONAL_FIELDS = frozenset({"match.obstacle_min_dist"})


def apply_overrides(cfg, pairs):
    """Dotted-path overrides on the frozen EngineConfig tree."""
    import dataclasses

    def coerce(path, old, s):
        if s.lower() in ("none", "null"):
            # explicit reset of an Optional field only (works even
            # after a prior --set gave it a float value)
            if old is None or path in OPTIONAL_FIELDS:
                return None
            raise ValueError(
                f"--set {path}: {s!r} is not valid for a "
                f"{type(old).__name__} field")
        if isinstance(old, bool):
            return s.lower() in ("1", "true", "yes")
        if old is None:  # e.g. match.obstacle_min_dist (None = cap)
            try:
                return float(s)
            except ValueError:
                raise ValueError(
                    f"--set {path}: cannot parse {s!r} as a float "
                    "(or 'none')") from None
        try:
            return type(old)(s)
        except (ValueError, TypeError):
            raise ValueError(
                f"--set {path}: cannot parse {s!r} as "
                f"{type(old).__name__}") from None

    def set_path(obj, path, value, full):
        head = path[0]
        old = getattr(obj, head)
        if len(path) == 1:
            return dataclasses.replace(
                obj, **{head: coerce(full, old, value)})
        return dataclasses.replace(
            obj, **{head: set_path(old, path[1:], value, full)})

    for pair in pairs:
        path, _, value = pair.partition("=")
        cfg = set_path(cfg, path.split("."), value, path)
    return cfg


def build_cfg(args):
    """Preset bundle first, then explicit --set overrides on top."""
    from lsdtpu.config import DEFAULT
    cfg = apply_overrides(DEFAULT,
                          PRESETS[getattr(args, "preset", "faithful")])
    return apply_overrides(cfg, args.overrides)


def cmd_run(args) -> int:
    import numpy as np
    from lsdtpu.eval import ate as eval_ate
    from lsdtpu.io import load_dataset
    from lsdtpu.runtime import make_map_context, run_sequence, stack_frames
    from lsdtpu.runtime.artifacts import prepare_map_cached

    cfg = build_cfg(args)
    dtype = np.float64 if args.f64 else np.float32
    if getattr(args, "mode", "tracking") == "legacy":
        return _run_legacy(args, cfg, dtype)
    ds = load_dataset(args.data)
    t0 = time.perf_counter()
    lines, cache = prepare_map_cached(ds.map_value, ds.param.resol,
                                      z_occ_max_dis=cfg.map.z_occ_max_dis,
                                      backend=args.mapprep,
                                      cache_dir=getattr(args, 'cache_dir', None),
                                      growth=cfg.lsd.growth,
                                      nfa_kernel=cfg.lsd.nfa_kernel)
    print(f"map: {len(lines)} lines, cache {cache.shape} "
          f"({time.perf_counter() - t0:.1f}s)", file=sys.stderr)
    ctx = make_map_context(lines, cache, ds.param.resol, ds.param.ori_x,
                           ds.param.ori_y, dtype=dtype,
                           cache_dtype=cfg.match.cache_dtype,
                           z_occ_max_dis=cfg.map.z_occ_max_dis)
    frames = stack_frames(ds, dtype=dtype, max_frames=args.frames)
    t0 = time.perf_counter()
    import jax
    outs = jax.block_until_ready(run_sequence(frames, ctx, cfg))
    dt = time.perf_counter() - t0
    F = frames["ranges"].shape[0]
    poses = np.asarray(outs["pose"])
    scores = np.asarray(outs["score"])
    coasting = np.asarray(outs["coasting"])
    deferred = np.asarray(outs["relock_deferred"])
    for f in range(F):
        sc = float(scores[f])
        rec = {"frame": f + 1, "pose": [round(float(v), 3)
                                        for v in poses[f]],
               "score": round(sc, 4) if np.isfinite(sc) else None,
               "n_candidates": int(np.asarray(outs["n_candidates"])[f])}
        if coasting[f]:
            rec["coasting"] = True
        if deferred[f]:
            rec["relock_deferred"] = True
        print(json.dumps(rec))
    tracked = int(np.isfinite(scores).sum())
    summary_flags = {}
    if coasting.any():
        summary_flags["coasted"] = int(coasting.sum())
    if deferred.any():
        summary_flags["relock_deferred"] = int(deferred.sum())
    summary = {"frames": F, "tracked": tracked,
               "wall_s": round(dt, 2),
               "scans_per_sec": round(F / dt, 1), **summary_flags}
    if ds.real_pos is not None:
        a = eval_ate.keyframe_ate(poses, ds.real_pos, ds.recorded_odom,
                                  ds.param.resol, ds.param.ori_x,
                                  ds.param.ori_y)
        if a.n > 0:   # a truncated --frames run may reach no keyframe
            summary["ate_rmse_m"] = round(a.rmse, 4)
            summary["ate_max_m"] = round(a.max, 4)
        summary["ate_keyframes"] = a.n
    if getattr(args, "viz", None):
        from lsdtpu import viz
        from lsdtpu.runtime.loop import featurize_stage

        fs_dump = []
        for f in range(min(args.viz_frames, F)):
            fr = jax.tree.map(lambda x, f=f: x[f], frames)
            fs = featurize_stage((fr["ranges"], fr["angles"], fr["valid"],
                                  fr["n"], fr["odom_prev"], fr["odom_cur"]),
                                 ctx, cfg)
            fs_dump.append((f + 1, jax.tree.map(np.asarray, fs)))
        paths = viz.dump_run(
            args.viz, ds.map_value, lines, cache, outs, ds.param.resol,
            ds.param.ori_x, ds.param.ori_y, real_pos=ds.real_pos,
            scan_features=fs_dump, z_occ_max_dis=cfg.map.z_occ_max_dis)
        summary["viz"] = paths
    print(json.dumps(summary), file=sys.stderr)
    return 0


def _run_legacy(args, cfg, dtype) -> int:
    """ROS-generation driver: global first-minimum matcher per frame."""
    import numpy as np
    from lsdtpu.io import load_dataset
    from lsdtpu.runtime.artifacts import prepare_map_cached
    from lsdtpu.runtime.online import OnlineLocalizer

    ds = load_dataset(args.data)
    lines, cache = prepare_map_cached(ds.map_value, ds.param.resol,
                                      z_occ_max_dis=2.0,
                                      backend=args.mapprep,
                                      cache_dir=getattr(args, 'cache_dir', None))
    loc = OnlineLocalizer(cfg=cfg, mode="legacy", dtype=dtype)
    loc.set_map_artifacts(lines, cache, ds.param.resol, ds.param.ori_x,
                          ds.param.ori_y)
    F = len(ds.frames) if args.frames is None else \
        min(args.frames, len(ds.frames))
    tracked = 0
    for f in range(F):
        fr = ds.frames[f]
        out = loc.push_scan(fr[:, 0], fr[:, 1])
        sc = float(out["score"])
        tracked += int(np.isfinite(sc))
        print(json.dumps({
            "frame": f + 1,
            "pose": [round(float(v), 3) for v in out["pose"]],
            "pose_world": [round(float(v), 3) for v in out["pose_world"]],
            "score": round(sc, 4) if np.isfinite(sc) else None}))
    print(json.dumps({"frames": F, "tracked": tracked}), file=sys.stderr)
    return 0


def cmd_prepare_map(args) -> int:
    from lsdtpu.io import load_dataset
    from lsdtpu.runtime.artifacts import prepare_map_cached

    cfg = build_cfg(args)
    ds = load_dataset(args.data)
    t0 = time.perf_counter()
    lines, cache = prepare_map_cached(ds.map_value, ds.param.resol,
                                      z_occ_max_dis=cfg.map.z_occ_max_dis,
                                      backend=args.mapprep,
                                      cache_dir=getattr(args, 'cache_dir', None),
                                      growth=cfg.lsd.growth,
                                      nfa_kernel=cfg.lsd.nfa_kernel)
    dumped = None
    if getattr(args, "dump", None):
        import jax.numpy as jnp
        import numpy as np

        from lsdtpu.io.refdump import dump_map_artifacts
        from lsdtpu.render import render_line_image

        rows_, cols_ = ds.map_value.shape
        # default max_steps = max(rows, cols)+2: never truncates
        line_im = np.asarray(render_line_image(
            jnp.asarray(lines), jnp.ones(len(lines), bool), rows_, cols_))
        dumped = dump_map_artifacts(args.dump, lines, cache, line_im)
    print(json.dumps({"lines": len(lines),
                      "cache_shape": list(cache.shape),
                      "seconds": round(time.perf_counter() - t0, 2),
                      **({"dumped": dumped} if dumped else {})}))
    return 0


def cmd_refine(args) -> int:
    """Rollout + offline batch pose-graph refinement + ATE compare."""
    import jax
    import numpy as np
    from lsdtpu.eval import ate as eval_ate
    from lsdtpu.io import load_dataset
    from lsdtpu.refine.pose_graph import (refine_trajectory,
                                          refine_trajectory_distributed)
    from lsdtpu.runtime import make_map_context, run_sequence, stack_frames
    from lsdtpu.runtime.artifacts import prepare_map_cached

    cfg = build_cfg(args)
    dtype = np.float64 if args.f64 else np.float32
    ds = load_dataset(args.data)
    lines, cache = prepare_map_cached(ds.map_value, ds.param.resol,
                                      z_occ_max_dis=cfg.map.z_occ_max_dis,
                                      backend=args.mapprep,
                                      cache_dir=getattr(args, 'cache_dir', None),
                                      growth=cfg.lsd.growth,
                                      nfa_kernel=cfg.lsd.nfa_kernel)
    ctx = make_map_context(lines, cache, ds.param.resol, ds.param.ori_x,
                           ds.param.ori_y, dtype=dtype,
                           cache_dtype=cfg.match.cache_dtype,
                           z_occ_max_dis=cfg.map.z_occ_max_dis)
    frames = stack_frames(ds, dtype=dtype, max_frames=args.frames)
    outs = jax.tree.map(np.asarray, run_sequence(frames, ctx, cfg))
    meas = outs["measurement"].astype(np.float64)
    scores = outs["score"].astype(np.float64)
    u = outs["scan_pose"].astype(np.float64)
    F = meas.shape[0]
    segments = args.segments
    if segments > 1 and (F % segments or F // segments < 2):
        # pad with zero-weight frames to the segment grid (the
        # pose_graph contract) rather than silently changing solver
        pad = (-F) % segments
        if F // segments < 2:
            pad = max(pad, 2 * segments - F)
            pad += (-(F + pad)) % segments
        meas = np.concatenate([meas, np.full((pad, 3), np.nan)])
        scores = np.concatenate([scores, np.full((pad,), np.inf)])
        u = np.concatenate([u, np.zeros((pad, 3))])
    if segments > 1:
        refined, info = refine_trajectory_distributed(
            meas, scores, u, n_segments=segments)
        refined = refined[:F]
    else:
        refined, info = refine_trajectory(meas, scores, u)
    refined = np.asarray(refined)[:F]
    rec = {"frames": F, "n_measured": int(info["n_measured"]),
           "segments": segments}
    if ds.real_pos is not None:
        for name, poses in (("online", outs["pose"]), ("refined", refined)):
            a = eval_ate.keyframe_ate(poses, ds.real_pos,
                                      ds.recorded_odom, ds.param.resol,
                                      ds.param.ori_x, ds.param.ori_y)
            rec[f"ate_{name}_rmse_m"] = round(a.rmse, 4)
    if getattr(args, "viz", None):
        from lsdtpu import viz
        rec["viz"] = viz.dump_run(
            args.viz, ds.map_value, lines, cache, outs, ds.param.resol,
            ds.param.ori_x, ds.param.ori_y, real_pos=ds.real_pos,
            z_occ_max_dis=cfg.map.z_occ_max_dis, refined_px=refined)
    print(json.dumps(rec))
    return 0


def cmd_bench(_args) -> int:
    import os
    try:
        import bench
    except ImportError:
        # bench.py lives at the repo root, not inside the package; make
        # `lsdtpu bench` work from any CWD when run from a checkout
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        if not os.path.exists(os.path.join(repo, "bench.py")):
            print("bench.py not found (it ships with the repo checkout, "
                  "not the installed package) - run it from the repo: "
                  "python bench.py", file=sys.stderr)
            return 2
        sys.path.insert(0, repo)
        import bench
    bench.main()
    return 0


def cmd_profile(args) -> int:
    """Observability driver (SURVEY.md 5.1): per-stage wall times for
    one frame (runtime/trace.py harness), whole-rollout compile/steady
    timing, and an optional jax.profiler device trace - where the
    reference has only a run-level clock() (main_on_windows.cpp:17-18,
    189-190)."""
    import jax
    import numpy as np
    from lsdtpu.runtime import make_map_context, run_sequence, stack_frames
    from lsdtpu.runtime.artifacts import prepare_map_cached
    from lsdtpu.runtime.trace import device_trace, stage_timings
    from lsdtpu.io import load_dataset

    cfg = build_cfg(args)
    dtype = np.float64 if args.f64 else np.float32
    ds = load_dataset(args.data)
    lines, cache = prepare_map_cached(ds.map_value, ds.param.resol,
                                      z_occ_max_dis=cfg.map.z_occ_max_dis,
                                      backend=args.mapprep,
                                      cache_dir=getattr(args, 'cache_dir', None),
                                      growth=cfg.lsd.growth,
                                      nfa_kernel=cfg.lsd.nfa_kernel)
    ctx = make_map_context(lines, cache, ds.param.resol, ds.param.ori_x,
                           ds.param.ori_y, dtype=dtype,
                           cache_dtype=cfg.match.cache_dtype,
                           z_occ_max_dis=cfg.map.z_occ_max_dis)
    frames = stack_frames(ds, dtype=dtype, max_frames=args.frames)
    F = frames["ranges"].shape[0]
    f = min(max(args.frame, 0), F - 1)
    fi = tuple(frames[k][f] for k in ("ranges", "angles", "valid", "n",
                                      "odom_prev", "odom_cur"))
    st = stage_timings(fi, ctx, cfg, repeats=args.repeats)
    print(json.dumps({"per_stage_ms": {k: round(v, 4)
                                       for k, v in st.items()},
                      "frame": f,
                      "note": "separately-jitted stages incl. dispatch "
                              "overhead; relative costs only"}))
    import numpy as _np
    with device_trace(args.trace):
        # TIME-TO-VALUE: block_until_ready returns at enqueue through
        # the device relay (docs/RESULTS.md r3) - materialize poses
        t0 = time.perf_counter()
        _np.asarray(run_sequence(frames, ctx, cfg)["pose"])
        t_first = time.perf_counter() - t0
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            _np.asarray(run_sequence(frames, ctx, cfg)["pose"])
            best = min(best, time.perf_counter() - t0)
    rec = {"frames": F, "compile_plus_first_s": round(t_first, 2),
           "steady_ms": round(best * 1e3, 3),
           "scans_per_sec": round(F / best, 1)}
    if args.trace:
        rec["trace_dir"] = args.trace
    print(json.dumps(rec))
    return 0


def cmd_batch(args) -> int:
    import jax
    import numpy as np
    from lsdtpu.io import load_dataset
    from lsdtpu.runtime.artifacts import prepare_map_cached
    from lsdtpu.runtime.batch import run_batch, stack_batch, stack_concat

    cfg = build_cfg(args)
    if args.temporal > 1 and not args.concat:
        print("--temporal requires --concat (the segment-parallel "
              "replay runs over one concatenated stream)", file=sys.stderr)
        return 2
    dss = [load_dataset(p) for p in args.data]
    arts = [prepare_map_cached(d.map_value, d.param.resol,
                               z_occ_max_dis=cfg.map.z_occ_max_dis,
                               backend=args.mapprep,
                                      cache_dir=getattr(args, 'cache_dir', None),
                               growth=cfg.lsd.growth,
                               nfa_kernel=cfg.lsd.nfa_kernel)
            for d in dss]
    if args.concat:
        # corpus replay: one lax.scan over all sequences (they must
        # share the map; bitwise-identical to standalone rollouts)
        from lsdtpu.runtime import make_map_context, run_sequence
        for d in dss[1:]:
            if not np.array_equal(d.map_value, dss[0].map_value):
                print("--concat needs all sequences on one map",
                      file=sys.stderr)
                return 2
        ds0 = dss[0]
        ctx = make_map_context(arts[0][0], arts[0][1], ds0.param.resol,
                               ds0.param.ori_x, ds0.param.ori_y,
                               cache_dtype=cfg.match.cache_dtype,
                               z_occ_max_dis=cfg.map.z_occ_max_dis)
        frames, bounds = stack_concat(dss)
        t0 = time.perf_counter()
        if args.temporal > 1:
            # segment-parallel replay: the stream split over devices
            # with speculative cold starts (runtime/temporal.py;
            # px-level warmup tolerance vs the sequential chain)
            from lsdtpu.runtime.temporal import (make_mesh_sp,
                                                 run_sequence_temporal)
            outs = run_sequence_temporal(frames, ctx, make_mesh_sp(),
                                         cfg, n_segments=args.temporal)
        else:
            outs = jax.block_until_ready(run_sequence(frames, ctx, cfg))
        dt = time.perf_counter() - t0
        sc = np.asarray(outs["score"])
        for b in range(len(dss)):
            lo, hi = bounds[b], bounds[b + 1]
            print(json.dumps({
                "seq": args.data[b], "frames": int(hi - lo),
                "tracked": int(np.isfinite(sc[lo:hi]).sum())}))
        total = int(bounds[-1])
    else:
        frames, ctxs, lens = stack_batch(dss, arts, cfg,
                                         cache_dtype=cfg.match.cache_dtype)
        t0 = time.perf_counter()
        outs = jax.block_until_ready(run_batch(frames, ctxs, cfg))
        dt = time.perf_counter() - t0
        total = int(lens.sum())
        for b, (ds, n) in enumerate(zip(dss, lens)):
            sc = np.asarray(outs["score"][b][:n])
            print(json.dumps({
                "seq": args.data[b], "frames": int(n),
                "tracked": int(np.isfinite(sc).sum())}))
    print(json.dumps({"total_scans": total, "wall_s": round(dt, 2),
                      "scans_per_sec": round(total / dt, 1)}),
          file=sys.stderr)
    return 0


def cmd_serve(args) -> int:
    """Fleet replay through the multi-session serving pool: one robot
    per dataset, every tick = ONE batched device call for all robots."""
    import numpy as np
    from lsdtpu.eval import ate as eval_ate
    from lsdtpu.io import load_dataset
    from lsdtpu.runtime.artifacts import prepare_map_cached
    from lsdtpu.runtime.serving import SessionPool

    cfg = build_cfg(args)
    dss = [load_dataset(p) for p in args.data]
    arts = [prepare_map_cached(d.map_value, d.param.resol,
                               z_occ_max_dis=cfg.map.z_occ_max_dis,
                               backend=args.mapprep,
                                      cache_dir=getattr(args, 'cache_dir', None),
                               growth=cfg.lsd.growth,
                               nfa_kernel=cfg.lsd.nfa_kernel)
            for d in dss]
    H = max(a[1].shape[0] for a in arts)
    W = max(a[1].shape[1] for a in arts)
    pool = SessionPool(capacity=len(dss), canvas_hw=(H, W), cfg=cfg)
    for i, (ds, (lines, cache)) in enumerate(zip(dss, arts)):
        pool.open_session(f"robot{i}", lines, cache, ds.param.resol,
                          ds.param.ori_x, ds.param.ori_y)
    F = max(len(ds.frames) for ds in dss)
    if args.frames is not None:
        F = min(F, args.frames)
    poses = [[] for _ in dss]
    scores = [[] for _ in dss]
    n_scans = 0
    t0 = time.perf_counter()
    for f in range(F):
        for i, ds in enumerate(dss):
            # same guard as stack_frames: a dataset can have fewer
            # odometry rows than lidar frames
            if f < len(ds.frames) and f + 1 < ds.odom.shape[0]:
                fr = ds.frames[f]
                pool.submit_scan(f"robot{i}", fr[:, 0], fr[:, 1],
                                 ds.odom[f + 1])
                n_scans += 1
        res = pool.step()
        for i in range(len(dss)):
            out = res.get(f"robot{i}")
            if out is not None:
                poses[i].append(out["pose"])
                scores[i].append(float(out["score"]))
    dt = time.perf_counter() - t0
    for i, ds in enumerate(dss):
        rec = {"robot": i, "seq": args.data[i], "frames": len(poses[i]),
               "tracked": int(np.isfinite(scores[i]).sum())}
        if ds.real_pos is not None and poses[i]:
            a = eval_ate.keyframe_ate(
                np.stack(poses[i]), ds.real_pos, ds.recorded_odom,
                ds.param.resol, ds.param.ori_x, ds.param.ori_y)
            if np.isfinite(a.rmse):
                rec["ate_rmse_m"] = round(a.rmse, 4)
        print(json.dumps(rec))
    print(json.dumps({"robots": len(dss), "ticks": F,
                      "total_scans": n_scans, "wall_s": round(dt, 2),
                      "scans_per_sec": round(n_scans / dt, 1)}),
          file=sys.stderr)
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="lsdtpu")
    ap.add_argument("--backend", choices=("default", "cpu"),
                    default="default",
                    help="'cpu' forces the host CPU backend (accuracy is "
                         "backend-independent; use for sweeps, or when the "
                         "TPU is reserved/unstable)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("run", help="offline dataset rollout")
    _add_common(p)
    p.add_argument("--mode", choices=("tracking", "legacy"),
                   default="tracking",
                   help="tracking = Windows V2.6 pipeline (HMM+UKF); "
                        "legacy = ROS V2.2 global matcher")
    p.set_defaults(fn=cmd_run)

    p = sub.add_parser("prepare-map", help="build + cache map artifacts")
    _add_common(p)
    p.add_argument("--dump", default=None, metavar="DIR",
                   help="also write the artifacts in the C++ reference's "
                        "text formats (MaplinesInfo.txt, mapCache.txt, "
                        "MaplineIm.txt) for interop")
    p.set_defaults(fn=cmd_prepare_map)

    p = sub.add_parser("refine", help="offline pose-graph smoothing")
    _add_common(p)
    p.add_argument("--segments", type=int, default=1,
                   help=">1 uses the distributed Schur solver")
    p.set_defaults(fn=cmd_refine)

    p = sub.add_parser("bench", help="headline throughput benchmark")
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("profile", help="per-stage timing + device trace")
    _add_common(p)
    p.add_argument("--frame", type=int, default=5,
                   help="frame index for the per-stage harness")
    p.add_argument("--repeats", type=int, default=10)
    p.add_argument("--trace", default=None, metavar="DIR",
                   help="write a jax.profiler device trace here "
                        "(view with tensorboard/xprof)")
    p.set_defaults(fn=cmd_profile)

    p = sub.add_parser("batch", help="batched multi-sequence rollout")
    p.add_argument("--data", nargs="+", required=True)
    p.add_argument("--mapprep", choices=("tpu", "oracle", "tpu-sharded"), default="tpu")
    p.add_argument("--cache-dir", default=None, metavar="DIR")
    p.add_argument("--concat", action="store_true",
                   help="corpus replay: ONE lax.scan over all sequences "
                        "(must share the map) instead of a vmap batch")
    p.add_argument("--temporal", type=int, default=1, metavar="S",
                   help="with --concat: split the stream into S "
                        "segments rolled out in parallel across devices "
                        "(speculative cold starts + warmup; px-level "
                        "tolerance vs sequential - runtime/temporal.py)")
    _add_cfg_args(p)
    p.set_defaults(fn=cmd_batch)

    p = sub.add_parser("serve", help="robot-fleet replay through the "
                                     "multi-session serving pool")
    p.add_argument("--data", nargs="+", required=True,
                   help="one dataset directory per robot")
    p.add_argument("--mapprep", choices=("tpu", "oracle", "tpu-sharded"), default="tpu")
    p.add_argument("--cache-dir", default=None, metavar="DIR")
    p.add_argument("--frames", type=int, default=None)
    _add_cfg_args(p)
    p.set_defaults(fn=cmd_serve)

    # Accept --backend after the subcommand too (`lsdtpu run --backend
    # cpu`): SUPPRESS keeps the main parser's value unless given here.
    for sp in sub.choices.values():
        sp.add_argument("--backend", choices=("default", "cpu"),
                        default=argparse.SUPPRESS, help=argparse.SUPPRESS)

    args = ap.parse_args(argv)
    if args.backend == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
