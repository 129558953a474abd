"""Unit tests for geometry primitives vs the oracle's scalar versions."""

import numpy as np
import jax.numpy as jnp

from lsdtpu import geometry as geo
from lsdtpu.oracle import fa as ofa
from lsdtpu.oracle import lsd as olsd


def test_c_round_matches_c_semantics():
    v = np.array([0.5, 1.5, 2.5, -0.5, -1.5, -2.5, 0.49, -0.49, 2.51])
    want = np.array([1, 2, 3, -1, -2, -3, 0, 0, 3])
    got = np.asarray(geo.c_round(jnp.asarray(v)))
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(olsd.c_round(v), want)


def test_normalized_line_direction_matches_oracle():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-50, 50, size=(200, 4))
    # exact vertical / horizontal / reversed cases
    pts = np.concatenate([pts, np.array([
        [0, 0, 0, 5], [0, 5, 0, 0], [0, 0, 5, 0], [5, 0, 0, 0],
        [3, 3, 3, 3],
    ])])
    got = np.asarray(geo.normalized_line_direction(
        jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]),
        jnp.asarray(pts[:, 2]), jnp.asarray(pts[:, 3])))
    want = np.array([ofa.normalized_line_direction(*row) for row in pts])
    np.testing.assert_allclose(got, want, atol=1e-12, rtol=0)


def test_wrap_deg():
    a = np.array([0.0, 180.0, -180.0, 181.0, -181.0, 540.0, -540.0, 360.0])
    want = np.array([0.0, 180.0, 180.0, -179.0, 179.0, 180.0, 180.0, 0.0])
    np.testing.assert_allclose(np.asarray(geo.wrap_deg(jnp.asarray(a))),
                               want, atol=1e-12)


def test_masked_compact_preserves_order_and_counts():
    vals = jnp.arange(20, dtype=jnp.float64).reshape(10, 2)
    mask = jnp.asarray([1, 0, 1, 1, 0, 0, 1, 0, 0, 1], bool)
    out, omask, count = geo.masked_compact(vals, mask, 4)
    assert int(count) == 5
    np.testing.assert_array_equal(np.asarray(omask), [True] * 4)
    np.testing.assert_array_equal(np.asarray(out)[:, 0], [0, 4, 6, 12])


def test_lines_info_matches_oracle_builder():
    rng = np.random.default_rng(1)
    eps = rng.uniform(1, 400, size=(50, 4))
    got = np.asarray(geo.lines_info_from_endpoints(
        jnp.asarray(eps[:, 0]), jnp.asarray(eps[:, 1]),
        jnp.asarray(eps[:, 2]), jnp.asarray(eps[:, 3])))
    for i, (x1, y1, x2, y2) in enumerate(eps):
        want = olsd._line_info_from_endpoints(x1, y1, x2, y2, 10**9, 10**9)
        # XLA may fuse multiply-adds: allow last-ulp differences
        np.testing.assert_allclose(got[i], want, atol=1e-9, rtol=1e-12)


def test_masked_compact_rows_matches_masked_compact():
    """Chunked-scatter compaction == flat masked_compact for row counts
    that do and do NOT divide the chunk (clamped last chunk kept in
    sync - round-4 review finding #1), including tiny R < chunk."""
    import numpy as np

    rng = np.random.default_rng(3)
    for R, C, K in [(64, 24, 128), (12, 52, 64), (2, 9, 16),
                    (60, 16, 256), (7, 3, 8)]:
        for density in (0.0, 0.03, 0.4, 1.0):
            mask = rng.random((R, C)) < density
            vals = rng.integers(0, 1000, (R, C, 2)).astype(np.int32)
            a, am, ac = geo.masked_compact_rows(
                jnp.asarray(vals), jnp.asarray(mask), K)
            b, bm, bc = geo.masked_compact(
                jnp.asarray(vals.reshape(-1, 2)),
                jnp.asarray(mask.reshape(-1)), K)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            np.testing.assert_array_equal(np.asarray(am), np.asarray(bm))
            assert int(ac) == int(bc)
