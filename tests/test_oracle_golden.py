"""Oracle vs the reference's golden intermediate dumps.

data/MaplinesInfo.txt is the reference build's LSD output for
data/mapValue.txt (10-column structLinesInfo rows).  The reference's
extraction order is unstable-qsort dependent and its libm differs in the
last ulp, so we require endpoint-set equivalence (>= 90% of golden lines
matched within 1 px), not row-wise equality (SURVEY.md section 7, hard
part 1).
"""

import os

import numpy as np
import pytest

from lsdtpu.io import load_lines_info
from lsdtpu.oracle import lsd as olsd


@pytest.mark.slow
def test_oracle_lsd_matches_golden_lines(dataset_small, data_root):
    golden = load_lines_info(os.path.join(data_root,
                                          "data/MaplinesInfo.txt"))
    res = olsd.line_segment_detector(dataset_small.map_value.copy())
    got = res.lines_info
    assert abs(len(got) - len(golden)) <= 3

    ge = golden[:, 4:8]
    oe = got[:, 4:8]
    d1 = np.abs(ge[:, None, :] - oe[None, :, :]).max(-1)
    d2 = np.abs(ge[:, None, :] - oe[:, [6 - 4, 7 - 4, 4 - 4, 5 - 4]][None, :, :]).max(-1)
    best = np.minimum(d1, d2).min(1)
    matched = (best < 1.0).sum()
    assert matched >= 0.9 * len(golden), f"only {matched}/{len(golden)}"


def test_oracle_map_cache_properties(dataset_small):
    """mapCache: zero at occupied cells, capped elsewhere, parent-distance
    quirk produces values in [0, cap]."""
    grid = dataset_small.map_value
    sub = grid[:120, :160].copy()
    cache = olsd.create_map_cache(sub, 0.025, 1.0)
    occ = sub == 1
    assert (cache[occ] == 0).all()
    assert cache.max() <= 1.0 + 1e-12
    assert cache.min() >= 0.0
