"""Device-side cost attribution for the headline rollout (xplane).

Runs the bench-pinned whole-sequence rollout once under
`jax.profiler.trace` and aggregates the xplane op events into a
per-op cost table.  CAUTION: on the axon RELAY the profiler HANGS the
client (observed round 3) - there, the method of record is
time-to-value ablation (whole-rollout variants with stages removed;
results in docs/RESULTS.md r3).  This tool works on local CPU (use
--cpu; relative op structure) and on directly attached devices.

Usage:
  python scripts/profile_attrib.py [--data DIR] [--out JSON] [--top N]
         [--cpu]

Writes the top-N op table to stdout (and --out as JSON).  Op names are
XLA HLO ops; the `scope` column folds them by jax name-stack prefix
(featurize / candidates / score / fuse / ukf ...) when present.
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_xplanes(trace_dir: str):
    """Yield (plane_name, line_name, event_name, duration_ps, count)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    for p in paths:
        space = xplane_pb2.XSpace()
        with open(p, "rb") as fh:
            space.ParseFromString(fh.read())
        for plane in space.planes:
            meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                agg = collections.Counter()
                cnt = collections.Counter()
                for ev in line.events:
                    name = meta.get(ev.metadata_id, str(ev.metadata_id))
                    agg[name] += ev.duration_ps
                    cnt[name] += 1
                for name, dur in agg.items():
                    yield plane.name, line.name, name, dur, cnt[name]


def aggregate(trace_dir: str, device_only: bool = True):
    """Aggregate op durations on device planes (fallback: all planes)."""
    rows = collections.defaultdict(lambda: [0, 0])
    n_device = 0
    for plane, line, name, dur, cnt in parse_xplanes(trace_dir):
        is_dev = ("/device:" in plane or "TPU" in plane) and \
            "Steps" not in line
        if device_only and not is_dev:
            continue
        n_device += 1
        rows[name][0] += dur
        rows[name][1] += cnt
    if device_only and not rows:
        # CPU backend: XLA ops land on host planes named e.g.
        # "/host:CPU" with thread lines; retry without the filter but
        # keep only XLA-looking op events (fusion.N, while, scatter...)
        for plane, line, name, dur, cnt in parse_xplanes(trace_dir):
            if "XLA" in line or "TensorFlow" in line:
                rows[name][0] += dur
                rows[name][1] += cnt
    return rows


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data",
                    default="/root/reference/data_20190513/data_f3key/data1")
    ap.add_argument("--out", default=None)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--cpu", action="store_true",
                    help="force the host CPU backend")
    ap.add_argument("--trace-dir", default=None,
                    help="parse an EXISTING trace instead of running")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    td = args.trace_dir
    if td is None:
        import dataclasses

        import numpy as np

        from lsdtpu.config import DEFAULT
        from lsdtpu.runtime import (make_map_context, run_sequence,
                                    stack_frames)
        from lsdtpu.io import load_dataset
        from lsdtpu.runtime.artifacts import prepare_map_cached

        ds = load_dataset(args.data)
        lines, cache = prepare_map_cached(ds.map_value, ds.param.resol,
                                          backend="oracle")
        # bench-pinned compiled shape (CLAUDE.md: the proven-stable
        # on-chip shape)
        cfg = dataclasses.replace(
            DEFAULT, shapes=dataclasses.replace(
                DEFAULT.shapes, max_candidates=4096, max_scan_pixels=2048))
        ctx = make_map_context(lines, cache, ds.param.resol,
                               ds.param.ori_x, ds.param.ori_y,
                               dtype=np.float32)
        frames = stack_frames(ds, dtype=np.float32)
        jax.block_until_ready(run_sequence(frames, ctx, cfg))  # compile
        td = tempfile.mkdtemp(prefix="lsdtpu_xprof_")
        t0 = time.perf_counter()
        with jax.profiler.trace(td):
            jax.block_until_ready(run_sequence(frames, ctx, cfg))
        wall = time.perf_counter() - t0
        F = frames["ranges"].shape[0]
        print(f"# traced rollout: {F} frames in {wall * 1e3:.2f} ms "
              f"({F / wall:.0f} scans/s) on {jax.default_backend()}",
              file=sys.stderr)

    rows = aggregate(td)
    # drop framework wrapper events (runtime scheduling, not HLO ops)
    noise = ("ThunkExecutor", "XlaModule", "Xla Async", "TpuExecute",
             "program_v", "RunExecutable")
    rows = {k: v for k, v in rows.items()
            if not any(n in k for n in noise)}
    total = sum(d for d, _ in rows.values())
    top = sorted(rows.items(), key=lambda kv: -kv[1][0])[:args.top]
    table = [{"op": name, "ms": dur / 1e9, "pct": 100.0 * dur / total,
              "count": cnt} for name, (dur, cnt) in top]
    for r in table:
        print(f"{r['pct']:6.2f}%  {r['ms']:9.3f} ms  x{r['count']:<7d} "
              f"{r['op'][:100]}")
    print(f"total device op time: {total / 1e9:.2f} ms", file=sys.stderr)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump({"trace_dir": td, "total_ms": total / 1e9,
                       "ops": table}, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
