"""Fused Pallas NFA rasterize+count kernel vs the XLA dense pass.

Both paths consume the same packed rectangle scalars and share the
per-pixel math (ops/nfa_pallas.py), and the reductions sum exact 0/1
indicators - so counts, NFA values, and whole LSD line sets must be
BITWISE identical, not merely close.  Off-TPU the kernel runs in
interpret mode (tests/conftest.py forces the CPU backend)."""

import math

import jax
import numpy as np
import pytest

from lsdtpu.mapprep import nfa as mnfa
from lsdtpu.ops import nfa_pallas as onfa


def _rect(x1, y1, x2, y2, wid, rng):
    theta = math.atan2(y2 - y1, x2 - x1)
    p = 22.5 / 180.0
    return dict(x1=x1, y1=y1, x2=x2, y2=y2,
                dx=math.cos(theta), dy=math.sin(theta), wid=wid,
                deg=float(rng.uniform(-math.pi, math.pi)),
                prec=p * math.pi, p=p)


def _random_rects(H, W, n=24, seed=0):
    rng = np.random.default_rng(seed)
    rects = []
    for _ in range(n):
        x1, x2 = rng.uniform(0, W, 2)
        y1, y2 = rng.uniform(0, H, 2)
        rects.append(_rect(x1, y1, x2, y2, float(rng.uniform(0.5, 6.0)),
                           rng))
    # degenerate edges: vertical and horizontal rectangles produce
    # inf/nan slopes - the kernel must reproduce the INT_MIN conversion
    # semantics (_c_int) exactly
    rects.append(_rect(10.0, 5.0, 10.0, 30.0, 2.0, rng))
    rects.append(_rect(5.0, 12.0, 40.0, 12.0, 2.0, rng))
    # rectangle sticking out of the image
    rects.append(_rect(-8.0, -3.0, 20.0, 10.0, 4.0, rng))
    return rects


@pytest.fixture(scope="module")
def deg_map():
    rng = np.random.default_rng(42)
    return rng.uniform(-math.pi, math.pi, size=(48, 72))


def test_counts_bitwise_equal(deg_map):
    H, W = deg_map.shape
    count_xla = jax.jit(lambda d, s: onfa.rect_counts_math(
        d, [s[i] for i in range(onfa.N_SCALARS)]))
    count_pal = jax.jit(onfa.rect_counts_pallas)
    for rec in _random_rects(H, W):
        sc = mnfa.pack_rect_scalars(jax.tree.map(np.float64, rec))
        a0, b0 = count_xla(deg_map, sc)
        a1, b1 = count_pal(deg_map, sc)
        assert float(a0) == float(a1) and float(b0) == float(b1), rec
        assert float(a0) == int(a0)  # counts are exact integers


def test_rectangle_nfa_bitwise_equal(deg_map):
    H, W = deg_map.shape
    log_nt = 5 * (math.log10(H) + math.log10(W)) / 2.0
    f_xla = jax.jit(lambda r, d: mnfa.rectangle_nfa(r, d, log_nt, "xla"))
    f_pal = jax.jit(lambda r, d: mnfa.rectangle_nfa(r, d, log_nt,
                                                    "pallas"))
    for rec in _random_rects(H, W, seed=7):
        rec = jax.tree.map(np.float64, rec)
        v0 = float(f_xla(rec, deg_map))
        v1 = float(f_pal(rec, deg_map))
        assert v0 == v1 or (math.isnan(v0) and math.isnan(v1)), rec


def test_lsd_line_sets_bitwise_equal():
    """End-to-end: the full jitted LSD (improver loops and all) emits
    the identical line set under either NFA backend."""
    from lsdtpu.mapprep.lsd import line_segment_detector

    # synthetic occupancy map: free space with two walls ({0,1,255}
    # pre-remap encoding, loaders convention)
    grid = np.full((120, 160), 255, np.uint8)
    grid[30, 20:140] = 1
    grid[30:100, 140] = 1
    grid[0, :] = 0
    out0 = jax.tree.map(np.asarray, line_segment_detector(
        grid, max_lines=32, nfa_kernel="xla"))
    out1 = jax.tree.map(np.asarray, line_segment_detector(
        grid, max_lines=32, nfa_kernel="pallas"))
    assert int(out0[2]) == int(out1[2]) > 0
    np.testing.assert_array_equal(out0[0], out1[0])
    np.testing.assert_array_equal(out0[1], out1[1])
