"""Map-artifact parity vs the REAL C++ reference engine.

Dumps the compiled reference's actual map artifacts (mapCache distance
field + LSD line set) for each dataset map and compares them against
lsdtpu's oracle-backed map prep:

  * mapCache: elementwise max |diff| (expected 0 - bit-exact);
  * LSD lines: greedy nearest-endpoint matching, reporting matched
    fraction at 1 px / 5 px / 25 px endpoint tolerance (tie order among
    equal-gradient seeds is unstable-qsort-defined in the reference, so
    SET equivalence - not ordering - is the meaningful criterion,
    SURVEY.md 2.1).

Usage: python scripts/refbench/parity_map.py [dataset_dir ...]
       (default: data1 of both f3key and f4key + data/ map)
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
BIN = os.path.join(REPO, "build", "refbench", "lsd_refbench")

DEFAULT_SETS = [
    "/root/reference/data_20190513/data_f3key/data1",
    "/root/reference/data_20190514/data_f4key/data1",
    "/root/reference/data",
]


def match_lines(a: np.ndarray, b: np.ndarray, tol: float) -> int:
    """Greedy endpoint matching (either endpoint order)."""
    used = np.zeros(len(b), bool)
    n = 0
    for la in a:
        e1 = la[4:8]
        best, bi = np.inf, -1
        for j, lb in enumerate(b):
            if used[j]:
                continue
            d1 = max(abs(e1[0] - lb[4]), abs(e1[1] - lb[5]),
                     abs(e1[2] - lb[6]), abs(e1[3] - lb[7]))
            d2 = max(abs(e1[0] - lb[6]), abs(e1[1] - lb[7]),
                     abs(e1[2] - lb[4]), abs(e1[3] - lb[5]))
            d = min(d1, d2)
            if d < best:
                best, bi = d, j
        if bi >= 0 and best <= tol:
            used[bi] = True
            n += 1
    return n


def main():
    from lsdtpu.io.loaders import load_dataset
    from lsdtpu.oracle import driver as odrv

    sets = sys.argv[1:] or DEFAULT_SETS
    if not os.path.exists(BIN):
        subprocess.run(["sh", os.path.join(REPO, "scripts", "refbench",
                                           "build.sh")], check=True)
    for root in sets:
        ds = load_dataset(root)
        with tempfile.TemporaryDirectory() as td:
            subprocess.run([BIN, root, "0", "-", td], check=True,
                           capture_output=True, timeout=600)
            ref_lines = np.loadtxt(os.path.join(td, "maplines.txt"),
                                   ndmin=2)
            ref_cache = np.loadtxt(os.path.join(td, "mapcache.txt"))
        art = odrv.prepare_map(ds.map_value, ds.param.resol)
        cache_diff = float(np.abs(art.map_cache - ref_cache).max())
        ours, theirs = art.lines_info, ref_lines
        name = "/".join(root.rstrip("/").split("/")[-2:])
        m1 = match_lines(theirs, ours, 1.0)
        m5 = match_lines(theirs, ours, 5.0)
        m25 = match_lines(theirs, ours, 25.0)
        print(f"{name}: mapCache max|diff| {cache_diff:.3g} "
              f"({'BIT-EXACT' if cache_diff == 0 else 'DIFFERS'}); "
              f"lines {len(theirs)} C++ vs {len(ours)} ours, matched "
              f"{m1}@1px {m5}@5px {m25}@25px")


if __name__ == "__main__":
    main()
