"""Feature association + UKF vs the numpy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from lsdtpu.filter import ukf_step
from lsdtpu.match import fuse, generate_candidates, score_candidates
from lsdtpu.oracle import fa as ofa
from lsdtpu.oracle import rdp as ordp
from lsdtpu.oracle import driver as odrv


@pytest.fixture(scope="module")
def map_art(dataset_small):
    ds = dataset_small
    return odrv.prepare_map(ds.map_value, ds.param.resol)


def _features(ds, fi):
    fr = ds.frames[fi]
    return ordp.feature_scan(fr[:, 0], fr[:, 1], ds.param.resol,
                             ds.param.ori_x, ds.param.ori_y)


def _pad_lines(lines, cap):
    out = np.zeros((cap, 10))
    mask = np.zeros(cap, bool)
    out[:len(lines)] = lines
    mask[:len(lines)] = True
    return jnp.asarray(out), jnp.asarray(mask)


@pytest.mark.parametrize("fi,last_pose", [
    (0, (-1.0, -1.0, 0.0)),          # first frame: no HMM gate
    (5, (280.0, 220.0, -5.0)),       # tracking frame: gated
])
def test_candidates_and_scores_match_oracle(dataset_small, map_art, fi,
                                            last_pose):
    ds = dataset_small
    fs = _features(ds, fi)
    lidar = (round(fs.lidar_pos[0]), round(fs.lidar_pos[1]))
    ocands = ofa.scan_to_map_candidates(
        fs.lines_info, map_art.lines_info, fs.scan_im_point,
        lidar, last_pose, map_art.map_cache)

    sl, sm = _pad_lines(fs.lines_info, 64)
    ml, mm = _pad_lines(map_art.lines_info, 256)
    pix = np.zeros((2048, 2), np.int32)
    pmask = np.zeros(2048, bool)
    pix[:len(fs.scan_im_point)] = fs.scan_im_point
    pmask[:len(fs.scan_im_point)] = True

    cand = generate_candidates(sl, sm, ml, mm,
                               jnp.asarray(lidar, jnp.float64),
                               jnp.asarray(last_pose, jnp.float64), 4096)
    scores = np.asarray(score_candidates(cand, jnp.asarray(pix),
                                         jnp.asarray(pmask),
                                         jnp.asarray(map_art.map_cache)))
    acc = scores < 3.0
    # oracle only records accepted candidates; same count and same
    # (pose, score) multiset
    assert int(acc.sum()) == len(ocands)
    got = sorted(zip(np.asarray(cand.pose)[acc][:, 0].tolist(),
                     scores[acc].tolist()))
    want = sorted((c.x, c.score) for c in ocands)
    np.testing.assert_allclose(np.array(got), np.array(want), atol=1e-9)

    pw, fscore, pmin, minsc, nacc = fuse(cand, jnp.asarray(scores))
    est = ofa.fuse_candidates(ocands)
    if est is not None:
        np.testing.assert_allclose(np.asarray(pw),
                                   [est.x, est.y, est.ang], atol=1e-9)
        np.testing.assert_allclose(float(fscore), est.score, atol=1e-9)


@pytest.mark.parametrize("fi,last_pose", [
    (0, (-1.0, -1.0, 0.0)),          # relocalization: ~1000 candidates
    (5, (280.0, 220.0, -5.0)),       # tracking: tens of candidates
])
def test_dynamic_chunks_bitwise_equals_static(dataset_small, map_art, fi,
                                              last_pose):
    """The live-count fori_loop scorer must equal the full static sweep
    bitwise when only CANDIDATE chunks are dynamic (skipped chunks are
    entirely masked); dynamic PIXEL chunking (round-3 TPU gather fix)
    changes only the f64 reduction tree - verified <= 1e-9."""
    from lsdtpu.match.associate import score_candidates_partial

    ds = dataset_small
    fs = _features(ds, fi)
    sl, sm = _pad_lines(fs.lines_info, 64)
    ml, mm = _pad_lines(map_art.lines_info, 256)
    pix = np.zeros((2048, 2), np.int32)
    pmask = np.zeros(2048, bool)
    pix[:len(fs.scan_im_point)] = fs.scan_im_point
    pmask[:len(fs.scan_im_point)] = True
    lidar = (round(fs.lidar_pos[0]), round(fs.lidar_pos[1]))
    cand = generate_candidates(sl, sm, ml, mm,
                               jnp.asarray(lidar, jnp.float64),
                               jnp.asarray(last_pose, jnp.float64), 4096)
    cache = jnp.asarray(map_art.map_cache)
    s_dyn = np.asarray(score_candidates(cand, jnp.asarray(pix),
                                        jnp.asarray(pmask), cache,
                                        dynamic_chunks=True,
                                        pixel_chunk=0))
    s_sta = np.asarray(score_candidates(cand, jnp.asarray(pix),
                                        jnp.asarray(pmask), cache,
                                        dynamic_chunks=False))
    np.testing.assert_array_equal(s_dyn, s_sta)
    # pixel-chunked variant: same scores up to the reduction tree
    s_pc = np.asarray(score_candidates(cand, jnp.asarray(pix),
                                       jnp.asarray(pmask), cache,
                                       dynamic_chunks=True,
                                       pixel_chunk=512))
    ok = np.isfinite(s_sta)
    assert (np.isfinite(s_pc) == ok).all()
    np.testing.assert_allclose(s_pc[ok], s_sta[ok], rtol=0, atol=1e-9)

    # partials: identical on the live prefix (masked tail rows differ -
    # static computes garbage there, dynamic leaves zeros - but
    # finalize_scores masks both to inf)
    from lsdtpu.match.associate import finalize_scores
    H = map_art.map_cache.shape[0]
    n_all = jnp.sum(jnp.asarray(pmask)).astype(jnp.float64)
    res = {}
    for dyn in (True, False):
        sd, nv, sf, nf = score_candidates_partial(
            cand, jnp.asarray(pix), jnp.asarray(pmask), cache,
            row0=0, rows=H, cols=map_art.map_cache.shape[1],
            dynamic_chunks=dyn, pixel_chunk=0)
        res[dyn] = (np.asarray(sd), np.asarray(nv), np.asarray(sf),
                    np.asarray(nf),
                    np.asarray(finalize_scores(cand, sd, nv, n_all)))
    live = int(np.asarray(cand.count))
    for j in range(4):
        np.testing.assert_array_equal(res[True][j][:live],
                                      res[False][j][:live])
    np.testing.assert_array_equal(res[True][4], res[False][4])


def test_ukf_matches_oracle():
    rng = np.random.default_rng(7)
    x = rng.normal(size=9)
    A = rng.normal(size=(9, 9))
    P = A @ A.T + 9 * np.eye(9)
    sp = (0.4, -0.2, 0.05)
    meas = (x[0] + 0.5, x[1] - 0.3, x[2] + 0.01)
    ox, oP = ofa.ukf(x, P, sp, meas)
    jx, jP = ukf_step(jnp.asarray(x), jnp.asarray(P), jnp.asarray(sp),
                      jnp.asarray(meas))
    np.testing.assert_allclose(np.asarray(jx), ox, atol=1e-8)
    np.testing.assert_allclose(np.asarray(jP), oP, atol=1e-8)


def test_non_multiple_candidate_caps_work(dataset_small, map_art):
    """max_candidates values that are not chunk multiples must not
    crash the chunked score paths (regression: reshape without pad)."""
    import jax.numpy as jnp
    from lsdtpu.match.associate import (generate_candidates,
                                        score_candidates)
    from lsdtpu.oracle import rdp as ordp
    ds = dataset_small
    fr = ds.frames[0]
    fs = ordp.feature_scan(fr[:, 0].astype(np.float64),
                           fr[:, 1].astype(np.float64), ds.param.resol,
                           ds.param.ori_x, ds.param.ori_y)
    S, M = 64, 256
    sl = np.zeros((S, 10)); sl[:len(fs.lines_info)] = fs.lines_info
    sm = np.zeros(S, bool); sm[:len(fs.lines_info)] = True
    ml = np.zeros((M, 10)); ml[:len(map_art.lines_info)] = map_art.lines_info
    mm = np.zeros(M, bool); mm[:len(map_art.lines_info)] = True
    lp = jnp.asarray(np.floor(np.array(fs.lidar_pos) + 0.5))
    last = jnp.asarray([-1.0, -1.0, 0.0])
    base = None
    for cap in (1000, 100, 520):
        cand = generate_candidates(jnp.asarray(sl), jnp.asarray(sm),
                                   jnp.asarray(ml), jnp.asarray(mm),
                                   lp, last, max_candidates=cap)
        ys, xs = np.nonzero(fs.line_im)
        P = 2048
        pix = np.zeros((P, 2), np.int32); pm = np.zeros(P, bool)
        k = min(len(xs), P)
        pix[:k, 0] = xs[:k]; pix[:k, 1] = ys[:k]; pm[:k] = True
        sc = np.asarray(score_candidates(
            cand, jnp.asarray(pix), jnp.asarray(pm),
            jnp.asarray(map_art.map_cache)))
        fin = np.sort(sc[np.isfinite(sc)])
        if base is None and cap >= int(cand.count):
            base = fin
        elif cap >= int(cand.count):
            np.testing.assert_allclose(fin, base, atol=1e-12)
