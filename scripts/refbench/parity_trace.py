"""Seed-by-seed LSD parity diff: oracle vs the COMPILED reference.

Drives both engines over the same map with per-seed trace records
(scripts/refbench/trace_lsd.cpp on the C++ side; the oracle's `trace=`
hook) and reports the first divergence - the tool that root-caused the
round-3 parity closure:

  * np.sum's pairwise/8-accumulator reductions vs the reference's
    sequential `s += v` loops (kernel norms, moments, angle sums);
  * np.exp / np.arctan2 (numpy SIMD) vs glibc exp/atan2 (last-ulp);
  * np.hypot vs sqrt(pow(x,2)+pow(y,2));
  * RegionRadiusReducer's `i <= num` phantom-slot UB (the one-past
    slot reads (0,0) -> the real last point is dropped from the list
    while its curMap pixel stays set).

With all five replicated, the oracle's line lists are BITWISE equal to
the locally compiled engine on every bundled map (parity_map.py).

Usage: python scripts/refbench/parity_trace.py [dataset_dir]
       TRACE_SEED=<i> ... for per-seed growth/refine detail records.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
BIN = os.path.join(REPO, "build", "refbench", "lsd_trace")
DEFAULT = "/root/reference/data_20190513/data_f3key/data1"


def build_trace_binary() -> None:
    if os.path.exists(BIN):
        return
    subprocess.run(["sh", os.path.join(REPO, "scripts", "refbench",
                                       "build.sh")], check=True)


def ref_trace(dataset: str) -> list:
    build_trace_binary()
    out = subprocess.run([BIN, dataset], check=True, capture_output=True,
                         text=True, timeout=900).stdout
    return out.splitlines()


def oracle_trace(dataset: str) -> list:
    import io

    from lsdtpu.io.loaders import load_dataset
    from lsdtpu.oracle import lsd as olsd

    ds = load_dataset(dataset)
    buf = io.StringIO()
    olsd.line_segment_detector(ds.map_value.copy(), trace=buf)
    return buf.getvalue().splitlines()


def diff(ref: list, ora: list, max_report: int = 8) -> int:
    """Numeric-aware line diff; returns count of diverging records."""
    # compare only record types both sides emit (the C++ driver also
    # prints FIELDHASH checksums)
    keep = ("META", "SEED", "USED")
    ref = [ln for ln in ref if ln.split(" ", 1)[0] in keep]
    ora = [ln for ln in ora if ln.split(" ", 1)[0] in keep]
    n_bad = 0
    for k, (r, o) in enumerate(zip(ref, ora)):
        if r == o:
            continue
        rp, op = r.split(), o.split()
        if len(rp) == len(op) and all(
                a == b or _feq(a, b) for a, b in zip(rp, op)):
            continue
        n_bad += 1
        if n_bad <= max_report:
            print(f"line {k}:\n  C++   : {r}\n  oracle: {o}")
    if len(ref) != len(ora):
        print(f"record count differs: C++ {len(ref)} vs oracle {len(ora)}")
        n_bad += 1
    return n_bad


def _feq(a: str, b: str) -> bool:
    try:
        return float(a) == float(b)
    except ValueError:
        return False


def main():
    dataset = sys.argv[1] if len(sys.argv) > 1 else DEFAULT
    ref = ref_trace(dataset)
    ora = oracle_trace(dataset)
    bad = diff(ref, ora)
    print(f"{dataset}: {len(ref)} C++ records vs {len(ora)} oracle, "
          f"{bad} diverging" + (" - BIT-EXACT" if bad == 0 else ""))
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
