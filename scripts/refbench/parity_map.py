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


# the other bundled maps (SURVEY.md 4.2) live as suffixed files inside
# data/: (name, mapParam file, mapValue file).  mapValue_map2 pairs
# with mapParam_map1 (no own param file).
EXTRA_MAPS = [
    ("data:map1", "mapParam_map1.txt", "mapValue_map1.txt"),
    ("data:map2", "mapParam_map1.txt", "mapValue_map2.txt"),
    ("data:aisle1", "mapParam_aisle1.txt", "mapValue_aisle1.txt"),
    ("data:aisle2", "mapParam_aisle2.txt", "mapValue_aisle2.txt"),
    ("data:aisle3", "mapParam_aisle3.txt", "mapValue_aisle3.txt"),
]


def _extra_map_dir(td: str, param_file: str, value_file: str) -> str:
    """Materialize a suffixed map pair as a standard dataset dir (the
    reference driver and loaders only know mapParam/mapValue names);
    Lidar/Odom are symlinked from data/ (unused at max_frames=0)."""
    base = "/root/reference/data"
    d = os.path.join(td, "ds")
    os.makedirs(d)
    os.symlink(os.path.join(base, param_file),
               os.path.join(d, "mapParam.txt"))
    os.symlink(os.path.join(base, value_file),
               os.path.join(d, "mapValue.txt"))
    for aux in ("Lidar.txt", "Odom.txt"):
        os.symlink(os.path.join(base, aux), os.path.join(d, aux))
    return d


def compare_map(root: str, name: str = None) -> dict:
    """One map: dump the compiled engine's artifacts and compare.
    Returns a dict with exact-order stats (importable by the CI test)."""
    from lsdtpu.io.loaders import load_dataset
    from lsdtpu.oracle import driver as odrv

    ds = load_dataset(root)
    with tempfile.TemporaryDirectory() as td:
        subprocess.run([BIN, root, "0", "-", td], check=True,
                       capture_output=True, timeout=900)
        ref_lines = np.loadtxt(os.path.join(td, "maplines.txt"), ndmin=2)
        ref_cache = np.loadtxt(os.path.join(td, "mapcache.txt"))
    art = odrv.prepare_map(ds.map_value, ds.param.resol)
    cache_diff = float(np.abs(art.map_cache - ref_cache).max())
    ours, theirs = art.lines_info, ref_lines
    rec = {"name": name or "/".join(root.rstrip("/").split("/")[-2:]),
           "cache_diff": cache_diff,
           "n_ref": len(theirs), "n_ours": len(ours),
           "m1": match_lines(theirs, ours, 1.0),
           "m5": match_lines(theirs, ours, 5.0),
           "m25": match_lines(theirs, ours, 25.0)}
    # exact ORDER-ALIGNED comparison: since the oracle now reproduces
    # the compiled engine's extraction bitwise (sequential sums, libm
    # transcendentals, stable qsort, phantom-slot UB), the line LISTS
    # should agree elementwise
    if len(theirs) == len(ours):
        rec["order_max_diff"] = float(
            np.abs(theirs[:, 4:8] - ours[:, 4:8]).max()) if len(ours) \
            else 0.0
    return rec


def _report(rec: dict) -> None:
    omd = rec.get("order_max_diff")
    print(f"{rec['name']}: mapCache max|diff| {rec['cache_diff']:.3g} "
          f"({'BIT-EXACT' if rec['cache_diff'] == 0 else 'DIFFERS'}); "
          f"lines {rec['n_ref']} C++ vs {rec['n_ours']} ours, matched "
          f"{rec['m1']}@1px {rec['m5']}@5px {rec['m25']}@25px"
          + (f"; ordered max|d| {omd:.3g}" if omd is not None
             else "; COUNT MISMATCH"))


def main():
    sets = sys.argv[1:] or DEFAULT_SETS
    if not os.path.exists(BIN):
        subprocess.run(["sh", os.path.join(REPO, "scripts", "refbench",
                                           "build.sh")], check=True)
    for root in sets:
        _report(compare_map(root))
    if not sys.argv[1:]:
        for name, pf, vf in EXTRA_MAPS:
            with tempfile.TemporaryDirectory() as td:
                _report(compare_map(_extra_map_dir(td, pf, vf), name))


if __name__ == "__main__":
    main()
