"""TPU-native mapprep vs the numpy oracle (f64).

Gaussian/gradient must match bit-for-bit; the distance field matches
everywhere except FIFO-contested cells (fixed direction priority vs
queue rank - see mapprep/distance.py), and LSD line sets are compared
as endpoint-matched sets since growth order may differ at wave
granularity (mapprep/lsd.py docstring)."""

import numpy as np
import pytest

from lsdtpu.io import loaders
from lsdtpu.oracle import lsd as olsd


@pytest.fixture(scope="module")
def map1(data_root):
    mp = loaders.load_map_param(f"{data_root}/data/mapParam_map1.txt")
    return loaders.load_map_value(f"{data_root}/data/mapValue_map1.txt", mp)


def test_gaussian_matches_oracle(map1):
    """XLA contracts mul+add into FMA, so the blur differs from numpy
    at ~1e-17 relative; that is the only deviation allowed."""
    from lsdtpu.mapprep.gaussian import gaussian_sampler
    want = olsd.gaussian_sampler(map1.astype(np.float64), 0.3, 0.6)
    got = np.asarray(gaussian_sampler(map1.astype(np.float64), 0.3, 0.6))
    np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-13)


def test_gradient_matches_oracle(map1):
    """Angles of numerically-zero gradients (FMA noise, pre-banned
    pixels) are arbitrary in both implementations; compare deg only
    where the magnitude is meaningful."""
    import math
    from lsdtpu.mapprep.gaussian import gaussian_sampler
    from lsdtpu.mapprep.gradient import gradient_field
    deg_thre = 22.5 / 180.0 * math.pi
    g = olsd.gaussian_sampler(map1.astype(np.float64), 0.3, 0.6)
    mag_o, deg_o, used_o, mg_o = olsd.gradient_field(g, deg_thre)
    mag, deg, banned, mg = gradient_field(
        np.asarray(gaussian_sampler(map1.astype(np.float64), 0.3, 0.6)),
        deg_thre)
    np.testing.assert_allclose(np.asarray(mag), mag_o, atol=1e-10)
    # pixels whose level-line sits exactly on the 0 / +-pi atan2 branch
    # (gx at noise level) flip branches under FMA noise; skip them
    boundary = (np.abs(deg_o) < 1e-6) | (np.abs(np.abs(deg_o) - np.pi)
                                         < 1e-6)
    real = (mag_o > 1e-8) & ~boundary
    np.testing.assert_allclose(np.asarray(deg)[real], deg_o[real],
                               atol=1e-7)
    np.testing.assert_array_equal(np.asarray(banned), used_o == 1)
    assert abs(float(mg) - mg_o) < 1e-10


def test_map_cache_matches_oracle(map1):
    """Bit-exact: FIFO queue ownership is reproduced via carried dense
    ranks (mapprep/distance.py)."""
    from lsdtpu.mapprep.distance import create_map_cache
    res = 0.05
    want = olsd.create_map_cache(map1, res, 1.0)
    got = np.asarray(create_map_cache(map1, res, 1.0))
    np.testing.assert_array_equal(got, want)


def _match_lines(a: np.ndarray, b: np.ndarray, tol: float):
    """Greedy endpoint matching between two (n, 10) line sets."""
    used = np.zeros(len(b), bool)
    n_match = 0
    for row in a:
        e1 = row[[4, 5, 6, 7]]
        best, bi = np.inf, -1
        for j, other in enumerate(b):
            if used[j]:
                continue
            e2 = other[[4, 5, 6, 7]]
            e2r = other[[6, 7, 4, 5]]
            d = min(np.abs(e1 - e2).max(), np.abs(e1 - e2r).max())
            if d < best:
                best, bi = d, j
        if bi >= 0 and best < tol:
            used[bi] = True
            n_match += 1
    return n_match


def test_lsd_matches_oracle_line_set(map1):
    """Wave mode (fast structural tier): same wall set as the oracle
    up to geometric tolerance and small count drift.  The oracle now
    replicates the compiled reference's point-order-dependent radius
    reducer incl. its phantom-slot quirk (oracle/lsd.py), which a
    mask-based wave pass cannot express - sparse fringe regions can
    split/merge differently.  Exact line sets are the fifo tier
    (test_fifo_growth_bit_exact_vs_oracle)."""
    import jax.numpy as jnp
    from lsdtpu.mapprep.lsd import line_segment_detector
    from lsdtpu.render import render_line_image
    res = olsd.line_segment_detector(map1.copy())
    want = res.lines_info
    lines, mask, n, _ = line_segment_detector(map1.copy())
    got = np.asarray(lines)[np.asarray(mask)]
    assert abs(len(got) - len(want)) <= 2, (len(got), len(want))
    # rasterized wall coverage: the wave set must trace the same wall
    # pixels the oracle set does (within a 2-px dilation), both ways
    H, W = map1.shape
    im_w = np.asarray(res.line_im) > 0
    im_g = np.asarray(render_line_image(
        jnp.asarray(got), jnp.ones(len(got), bool), H, W)) > 0

    def dilate(im, r=2):
        out = np.zeros_like(im)
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                out |= np.roll(np.roll(im, dy, 0), dx, 1)
        return out

    cov_wg = (im_w & dilate(im_g)).sum() / im_w.sum()
    cov_gw = (im_g & dilate(im_w)).sum() / im_g.sum()
    assert cov_wg > 0.9 and cov_gw > 0.9, (cov_wg, cov_gw)


def test_prepare_map_full_map_matches_oracle_ate_level(dataset_small):
    """Full data/ map: wall-set parity and an end-to-end check - the
    localization loop driven by TPU mapprep artifacts must track every
    frame and stay within a pixel of the oracle-artifact rollout."""
    from lsdtpu.config import DEFAULT
    from lsdtpu.mapprep import prepare_map
    from lsdtpu.oracle import driver as odrv
    from lsdtpu.runtime import make_map_context, run_sequence, stack_frames
    ds = dataset_small
    want = odrv.prepare_map(ds.map_value, ds.param.resol)
    got = prepare_map(ds.map_value, ds.param.resol)
    assert abs(len(got.lines_info) - len(want.lines_info)) <= 2
    m = _match_lines(got.lines_info, want.lines_info, tol=25.0)
    assert m >= min(len(want.lines_info), len(got.lines_info)) - 2
    np.testing.assert_array_equal(got.map_cache, want.map_cache)

    NF = 30
    frames = stack_frames(ds, dtype=np.float64, max_frames=NF)
    outs = {}
    for name, art in (("oracle", want), ("tpu", got)):
        ctx = make_map_context(art.lines_info, art.map_cache,
                               ds.param.resol, ds.param.ori_x,
                               ds.param.ori_y, dtype=np.float64)
        outs[name] = run_sequence(frames, ctx, DEFAULT)
    for name in outs:
        assert np.isfinite(np.asarray(outs[name]["score"])).all(), name
    d = np.abs(np.asarray(outs["tpu"]["pose"])[:, :2] -
               np.asarray(outs["oracle"]["pose"])[:, :2])
    assert d.max() < 1.5, f"pose divergence {d.max()} px"


def test_tpu_lsd_matches_reference_golden_dump(dataset_small, data_root):
    """Against the reference C++ binary's own saved LSD output
    (data/MaplinesInfo.txt) - the strongest available parity oracle.
    The C++ extraction order is unstable-qsort dependent, so require
    endpoint-set equivalence: >=85% of golden lines within 1 px and
    every golden wall recovered within 25 px."""
    import os
    from lsdtpu.io import load_lines_info
    from lsdtpu.mapprep.lsd import line_segment_detector
    golden = load_lines_info(os.path.join(data_root,
                                          "data/MaplinesInfo.txt"))
    lines, mask, n, _ = line_segment_detector(dataset_small.map_value.copy())
    got = np.asarray(lines)[np.asarray(mask)]
    assert abs(len(got) - len(golden)) <= 3
    ge = golden[:, 4:8]
    oe = got[:, 4:8]
    d1 = np.abs(ge[:, None, :] - oe[None, :, :]).max(-1)
    d2 = np.abs(ge[:, None, :] - oe[:, [2, 3, 0, 1]][None, :, :]).max(-1)
    best = np.minimum(d1, d2).min(1)
    assert (best < 1.0).sum() >= 0.85 * len(golden)
    assert (best < 25.0).all()


def test_lsd_aisle_map_wall_parity(data_root):
    """Largest bundled map family (aisle, 625x1621, 70+ lines): the
    static caps must hold and the wall set must match the oracle."""
    mp = loaders.load_map_param(f"{data_root}/data/mapParam_aisle1.txt")
    mv = loaders.load_map_value(f"{data_root}/data/mapValue_aisle1.txt",
                                mp)
    from lsdtpu.mapprep.lsd import line_segment_detector
    want = olsd.line_segment_detector(mv.copy()).lines_info
    lines, mask, n, _ = line_segment_detector(mv.copy())
    got = np.asarray(lines)[np.asarray(mask)]
    assert abs(len(got) - len(want)) <= 3
    ge, oe = want[:, 4:8], got[:, 4:8]
    d1 = np.abs(ge[:, None, :] - oe[None, :, :]).max(-1)
    d2 = np.abs(ge[:, None, :] - oe[:, [2, 3, 0, 1]][None, :, :]).max(-1)
    matched = (np.minimum(d1, d2).min(1) < 25).sum()
    assert matched >= len(want) - 2, f"{matched}/{len(want)}"


def test_fifo_growth_bit_exact_vs_oracle(dataset_small):
    """growth="fifo" reproduces the reference's exact FIFO acceptance
    order (per-pixel running-angle updates + re-sweep passes,
    myLSD.cpp:491-590): the jitted LSD must emit the oracle's line set
    INCLUDING extraction order, with values equal up to XLA FMA
    contraction (~1e-13 on these coordinates; see the module-level FMA
    note) - the strongest portable parity level (the remaining delta to
    the C++ binary's own dump is its unstable qsort seed tie order,
    SURVEY.md 2.1)."""
    from lsdtpu.mapprep.lsd import line_segment_detector
    lines, mask, n, _ = line_segment_detector(
        dataset_small.map_value.copy(), growth="fifo")
    got = np.asarray(lines)[np.asarray(mask)]
    want = olsd.line_segment_detector(
        dataset_small.map_value.copy()).lines_info
    assert len(got) == len(want)
    # endpoints: FMA-rounding-level agreement, order-aligned (observed
    # max 1.1e-13); derived b amplifies to ~5e-9
    np.testing.assert_allclose(got[:, 4:8], want[:, 4:8], rtol=0,
                               atol=1e-9)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_fifo_growth_cap_is_never_silent():
    """The FIFO queue's default cap (H*W) can never saturate - every
    pixel enters the queue at most once - and an explicit undersized
    cap raises at trace time instead of silently truncating growth
    (ShapeConfig contract; VERDICT r2 weak #6)."""
    import jax.numpy as jnp
    import pytest
    from lsdtpu.mapprep.lsd import _grow_fifo

    H = W = 16
    deg_map = jnp.zeros((H, W))          # uniform angle: grow everywhere
    ban = jnp.zeros((H, W), bool)
    cur, _, _, _, _ = _grow_fifo(jnp.int32(8), jnp.int32(8),
                                 jnp.float32(0.0), 0.5, ban, deg_map)
    assert int(np.asarray(cur).sum()) == H * W   # full flood, no cap
    with pytest.raises(ValueError, match="cap"):
        _grow_fifo(jnp.int32(8), jnp.int32(8), jnp.float32(0.0),
                   0.5, ban, deg_map, cap=64)
