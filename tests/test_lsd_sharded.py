"""Row-block-sharded LSD (mapprep/lsd_sharded) vs the single-device
"wave" tier: identical line count and matching endpoints (block-psum
reduce-order noise only) on an 8-virtual-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lsdtpu.io import load_dataset
from lsdtpu.mapprep.lsd import line_segment_detector
from lsdtpu.mapprep.lsd_sharded import (line_segment_detector_sharded,
                                        make_mesh_lsd)


def test_sharded_lsd_matches_single_device():
    ds = load_dataset("/root/reference/data")
    mv = np.asarray(ds.map_value)
    l1, m1, n1, r1 = line_segment_detector(jnp.asarray(mv))
    l2, m2, n2, r2 = line_segment_detector_sharded(jnp.asarray(mv))
    assert int(n1) == int(n2)
    n = int(n1)
    assert n > 10
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    # endpoints: identical up to psum-vs-sum reduction order
    np.testing.assert_allclose(np.asarray(l1)[:n, 4:8],
                               np.asarray(l2)[:n, 4:8],
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_sharded_lsd_uneven_rows():
    """A map whose downsampled height does not divide the mesh: the
    padded rows are prebanned and NFA-masked, so results still match."""
    ds = load_dataset("/root/reference/data")
    mv = np.asarray(ds.map_value)[:411]          # odd height on purpose
    mesh = make_mesh_lsd(4)
    l1, _m1, n1, _r1 = line_segment_detector(jnp.asarray(mv))
    l2, _m2, n2, _r2 = line_segment_detector_sharded(jnp.asarray(mv),
                                                     mesh=mesh)
    assert int(n1) == int(n2)
    n = int(n1)
    assert n > 5
    np.testing.assert_allclose(np.asarray(l1)[:n, 4:8],
                               np.asarray(l2)[:n, 4:8],
                               rtol=1e-4, atol=1e-3)


def test_sharded_lsd_rejects_fifo():
    from lsdtpu.mapprep.lsd import _seed_walk

    mag = jnp.ones((8, 8))
    with pytest.raises(ValueError, match="fifo"):
        # tracing the fifo walk with an axis must fail loudly
        jax.eval_shape(
            lambda: _seed_walk(mag, mag, mag > 2, jnp.float32(1.0), 5.0,
                               1.0, 22.5, 0.7, 1024, 16, "fifo", "xla",
                               jnp.float32, row0=0, axis="mp"))


def test_prepare_map_cached_tpu_sharded(tmp_path):
    """The artifacts plumbing for giant-map prep: backend='tpu-sharded'
    produces a cache bit-equal to the single-device build and the
    sharded wave line set, and round-trips through the disk cache."""
    from lsdtpu.mapprep.distance import create_map_cache
    from lsdtpu.runtime.artifacts import prepare_map_cached

    ds = load_dataset("/root/reference/data")
    mv = np.asarray(ds.map_value)
    lines, cache = prepare_map_cached(mv, ds.param.resol,
                                      backend="tpu-sharded",
                                      cache_dir=str(tmp_path))
    ref_cache = np.asarray(create_map_cache(jnp.asarray(mv),
                                            float(ds.param.resol)))
    np.testing.assert_array_equal(cache, ref_cache)
    assert lines.shape[0] > 10 and lines.shape[1] == 10
    # warm cache round-trip
    lines2, cache2 = prepare_map_cached(mv, ds.param.resol,
                                        backend="tpu-sharded",
                                        cache_dir=str(tmp_path))
    np.testing.assert_array_equal(lines, lines2)
    np.testing.assert_array_equal(cache, cache2)


def test_prologue_sharded_bitwise():
    """The slab-sharded dense prologue (r5) is BITWISE the unsharded
    remap + gaussian_sampler + gradient_field chain: same sequential
    tap sums per output cell, order-free max - on a real map (uneven
    height) and with blocks_per_device > 1."""
    import math

    from lsdtpu.mapprep.gaussian import gaussian_sampler
    from lsdtpu.mapprep.gradient import gradient_field
    from lsdtpu.mapprep.lsd_sharded import prologue_sharded

    ds = load_dataset("/root/reference/data")
    for mv, bpd in ((np.asarray(ds.map_value), 1),
                    (np.asarray(ds.map_value)[:411], 2)):
        deg_thre = 22.5 / 180.0 * math.pi
        mesh = make_mesh_lsd(8)
        remapped, mag, deg, banned, max_grad, (nr, nc) = \
            prologue_sharded(mv, 0.3, 0.6, deg_thre, mesh,
                             blocks_per_device=bpd)
        # unsharded reference chain
        g = jnp.asarray(mv)
        sub = g[1:, 1:]
        sub = jnp.where(sub == 1, jnp.asarray(255, g.dtype),
                        jnp.where(sub == 255, jnp.asarray(0, g.dtype),
                                  sub))
        rm1 = g.at[1:, 1:].set(sub)
        dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        gauss = gaussian_sampler(rm1.astype(dt), 0.3, 0.6)
        m1, d1, b1, mg1 = gradient_field(gauss, deg_thre)
        np.testing.assert_array_equal(remapped, np.asarray(rm1))
        np.testing.assert_array_equal(mag, np.asarray(m1))
        np.testing.assert_array_equal(deg, np.asarray(d1))
        np.testing.assert_array_equal(banned, np.asarray(b1))
        assert max_grad == float(mg1)
        assert (nr, nc) == m1.shape


def test_prologue_sharded_fuzz_sizes():
    """Slab-arithmetic edge cases the bundled map cannot reach: tiny
    maps where the downsampled height is smaller than the slab count
    (every tail slab all-dummy), heights right at the divisibility
    boundary, and non-square aspect ratios - all must stay bitwise."""
    import math

    from lsdtpu.mapprep.gaussian import gaussian_sampler
    from lsdtpu.mapprep.gradient import gradient_field
    from lsdtpu.mapprep.lsd_sharded import prologue_sharded

    rng = np.random.default_rng(7)
    deg_thre = 22.5 / 180.0 * math.pi
    mesh = make_mesh_lsd(8)
    dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    sizes = [(41, 333), (96, 96), (267, 55), (55, 267)]
    for (H, W), bpd in zip(sizes, (1, 2, 1, 2)):
        occ = np.full((H, W), 255, np.uint8)
        occ[rng.random((H, W)) < 0.05] = 1
        _rm, mag, deg, banned, max_grad, shape = prologue_sharded(
            occ, 0.3, 0.6, deg_thre, mesh, blocks_per_device=bpd)
        g = jnp.asarray(occ)
        sub = g[1:, 1:]
        sub = jnp.where(sub == 1, jnp.asarray(255, g.dtype),
                        jnp.where(sub == 255, jnp.asarray(0, g.dtype),
                                  sub))
        gauss = gaussian_sampler(g.at[1:, 1:].set(sub).astype(dt),
                                 0.3, 0.6)
        m1, d1, b1, mg1 = gradient_field(gauss, deg_thre)
        np.testing.assert_array_equal(mag, np.asarray(m1),
                                      err_msg=f"{H}x{W}")
        np.testing.assert_array_equal(deg, np.asarray(d1),
                                      err_msg=f"{H}x{W}")
        np.testing.assert_array_equal(banned, np.asarray(b1),
                                      err_msg=f"{H}x{W}")
        assert max_grad == float(mg1) and shape == m1.shape


def test_sharded_lsd_fuzz_synthetic_maps():
    """Randomized synthetic occupancy maps (rooms + wall noise):
    sharded == single-device wave line sets - guards the collective
    algebra (psum moments, pmin seed pairs, ppermute halo waves)
    against future drift on structures the bundled maps don't cover
    (regions crossing many block boundaries, near-empty blocks)."""
    rng = np.random.default_rng(11)
    for trial in range(3):
        H, W = int(rng.integers(96, 200)), int(rng.integers(96, 200))
        occ = np.full((H, W), 255, np.uint8)
        # a few axis-aligned wall segments + speckle
        for _ in range(int(rng.integers(3, 7))):
            y, x = int(rng.integers(8, H - 8)), int(rng.integers(8, W - 8))
            ln = int(rng.integers(20, max(H, W)))
            if rng.random() < 0.5:
                occ[y, x:min(W - 1, x + ln)] = 1
            else:
                occ[y:min(H - 1, y + ln), x] = 1
        sp = rng.random((H, W)) < 0.002
        occ[sp] = 1
        l1, _m1, n1, _ = line_segment_detector(jnp.asarray(occ),
                                               max_lines=128)
        l2, _m2, n2, _ = line_segment_detector_sharded(
            jnp.asarray(occ), max_lines=128, mesh=make_mesh_lsd(8))
        assert int(n1) == int(n2), (trial, int(n1), int(n2))
        k = int(n1)
        if k:
            np.testing.assert_allclose(
                np.asarray(l1)[:k, 4:8], np.asarray(l2)[:k, 4:8],
                rtol=1e-4, atol=1e-3, err_msg=f"trial {trial}")
