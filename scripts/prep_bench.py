"""Map-prep cost: growth="wave" vs growth="fifo", per bundled map.

VERDICT r3 weak #4: the bit-exact LSD tier (growth="fifo", line sets
bitwise the compiled reference) was never timed on-chip, so the
"wave" default was chosen blind.  Map prep runs ONCE per map - if
fifo lands within seconds the bitwise tier is an affordable default.

Times the full jitted offline stage (distance field + LSD) to VALUE,
uncached.  Usage:

  python scripts/prep_bench.py [--cpu] [--maps data1,f4data1,data]
  [--growth wave,fifo]

Run on-chip only with nothing else using the tunnel; the fifo path is
a long sequential while-loop - keep the `timeout` wrapper.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MAPS = {
    "data1": "/root/reference/data_20190513/data_f3key/data1",
    "f4data1": "/root/reference/data_20190514/data_f4key/data1",
    "data": "/root/reference/data",
}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--maps", default="data1,f4data1,data")
    ap.add_argument("--growth", default="wave,fifo")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from lsdtpu.io import load_dataset
    from lsdtpu.mapprep.distance import create_map_cache
    from lsdtpu.mapprep.lsd import line_segment_detector

    results = {}
    for name in args.maps.split(","):
        if name not in MAPS:
            raise SystemExit(f"unknown map {name!r}; valid: "
                             f"{', '.join(MAPS)}")
        ds = load_dataset(MAPS[name])
        mv = np.asarray(ds.map_value)
        print(f"# {name}: map {mv.shape}", file=sys.stderr, flush=True)
        # the distance field is growth-independent: build+time it once
        t0 = time.perf_counter()
        cache = create_map_cache(mv, ds.param.resol)
        np.asarray(cache)
        t_cache = time.perf_counter() - t0
        for growth in args.growth.split(","):
            t0 = time.perf_counter()
            lines, mask, n, _rm = line_segment_detector(
                mv, growth=growth)
            lines = np.asarray(lines)
            n = int(n)
            t_lsd = time.perf_counter() - t0
            # second run: warm compile cache = the marginal per-map cost
            t0 = time.perf_counter()
            lines2, mask2, n2, _rm = line_segment_detector(
                mv, growth=growth)
            np.asarray(lines2)
            t_lsd_warm = time.perf_counter() - t0
            key = f"{name}:{growth}"
            results[key] = {
                "cache_s": round(t_cache, 3),
                "lsd_compile_plus_run_s": round(t_lsd, 3),
                "lsd_warm_s": round(t_lsd_warm, 3),
                "n_lines": n,
            }
            print(f"{key:16s} cache {t_cache:7.3f}s  "
                  f"lsd(compile+run) {t_lsd:7.3f}s  "
                  f"lsd(warm) {t_lsd_warm:7.3f}s  lines {n}",
                  flush=True)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
