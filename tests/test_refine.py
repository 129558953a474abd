"""Batch pose-graph refinement: solver correctness on synthetic chains
and end-to-end smoke on a real rollout."""

import numpy as np
import pytest

from lsdtpu.refine import refine_trajectory


def _synthetic(F=120, noise=2.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(F)
    truth = np.stack([10 + 2.0 * t, 5 + 1.5 * t, 0.1 * t], axis=1)
    u = np.diff(truth, axis=0, prepend=truth[:1])
    u[0] = 0
    meas = truth + rng.normal(0, noise, (F, 3))
    scores = np.full(F, 0.5)
    return truth, meas, scores, u


def test_refine_reduces_measurement_noise():
    truth, meas, scores, u = _synthetic()
    refined, info = refine_trajectory(meas, scores, u)
    refined = np.asarray(refined)
    err_meas = np.abs(meas[:, :2] - truth[:, :2]).mean()
    err_ref = np.abs(refined[:, :2] - truth[:, :2]).mean()
    assert err_ref < 0.6 * err_meas, (err_ref, err_meas)
    assert int(info["n_measured"]) == len(truth)


def test_refine_bridges_lost_frames():
    """Frames with no measurement (inf score) are held by odometry."""
    truth, meas, scores, u = _synthetic(noise=0.5)
    scores[40:60] = np.inf
    meas[40:60] = np.nan
    refined, info = refine_trajectory(meas, scores, u)
    refined = np.asarray(refined)
    assert np.isfinite(refined).all()
    err = np.abs(refined[40:60, :2] - truth[40:60, :2]).max()
    assert err < 2.0, err
    assert int(info["n_measured"]) == len(truth) - 20


def test_refine_exactness_single_measurement():
    """With one exact measurement and exact odometry the chain is
    reconstructed exactly (the solver solves the normal system, not an
    approximation)."""
    truth, meas, scores, u = _synthetic(noise=0.0)
    scores[:] = np.inf
    meas[:] = np.nan
    scores[0] = 0.1
    meas[0] = truth[0]
    refined, _ = refine_trajectory(meas, scores, u)
    np.testing.assert_allclose(np.asarray(refined)[:, :2], truth[:, :2],
                               atol=1e-5)


def test_refine_on_real_rollout(dataset_small):
    import jax
    from lsdtpu.oracle import driver as odrv
    from lsdtpu.runtime import make_map_context, run_sequence, stack_frames
    ds = dataset_small
    art = odrv.prepare_map(ds.map_value, ds.param.resol)
    ctx = make_map_context(art.lines_info, art.map_cache, ds.param.resol,
                           ds.param.ori_x, ds.param.ori_y,
                           dtype=np.float64)
    frames = stack_frames(ds, dtype=np.float64, max_frames=40)
    outs = jax.tree.map(np.asarray, run_sequence(frames, ctx))
    refined, info = refine_trajectory(outs["measurement"], outs["score"],
                                      outs["scan_pose"])
    refined = np.asarray(refined)
    assert np.isfinite(refined).all()
    # smoothing stays near the online estimate on a well-tracked run
    d = np.abs(refined[5:, :2] - outs["pose"][5:, :2])
    assert d.max() < 10.0, d.max()


def test_distributed_solver_matches_sequential():
    """Segment+separator Schur solve == sequential block Thomas."""
    from lsdtpu.refine.pose_graph import refine_trajectory_distributed
    truth, meas, scores, u = _synthetic(F=128, noise=1.5, seed=3)
    scores[30:40] = np.inf
    meas[30:40] = np.nan
    want, _ = refine_trajectory(meas, scores, u)
    for P in (2, 8, 16):
        got, _ = refine_trajectory_distributed(meas, scores, u,
                                               n_segments=P)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-7, err_msg=f"P={P}")


def test_distributed_solver_long_concatenated_sequence(dataset_small):
    """BASELINE config 5 shape: a long concatenated trajectory refined
    segment-parallel, equal to the sequential solve."""
    import jax
    from lsdtpu.oracle import driver as odrv
    from lsdtpu.refine.pose_graph import refine_trajectory_distributed
    from lsdtpu.runtime import make_map_context, run_sequence, stack_frames
    ds = dataset_small
    art = odrv.prepare_map(ds.map_value, ds.param.resol)
    ctx = make_map_context(art.lines_info, art.map_cache, ds.param.resol,
                           ds.param.ori_x, ds.param.ori_y,
                           dtype=np.float64)
    frames = stack_frames(ds, dtype=np.float64, max_frames=32)
    outs = jax.tree.map(np.asarray, run_sequence(frames, ctx))
    # concatenate the trajectory with itself (odometry chain restarts
    # are fine: the seam frame keeps its own measurement)
    meas = np.concatenate([outs["measurement"]] * 4)
    scores = np.concatenate([outs["score"]] * 4)
    u = np.concatenate([outs["scan_pose"]] * 4)
    want, _ = refine_trajectory(meas, scores, u)
    got, _ = refine_trajectory_distributed(meas, scores, u, n_segments=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6)


def test_refine_lost_first_frame_and_wrap_gap():
    """A lost frame 0 must not NaN-poison the solve, and a lost gap
    straddling +-180 deg must not tear the angle chain."""
    truth, meas, scores, u = _synthetic(F=60, noise=0.2)
    # angles crossing the branch cut during a lost gap
    meas[:, 2] = np.linspace(160, 200, 60)           # wraps at 180
    meas[:, 2] = ((meas[:, 2] + 180) % 360) - 180    # stored wrapped
    u[:, 2] = np.diff(np.linspace(160, 200, 60), prepend=160)
    u[0, 2] = 0
    scores[0] = np.inf
    meas[0] = np.nan
    scores[25:35] = np.inf
    meas[25:35] = np.nan
    refined, _ = refine_trajectory(meas, scores, u)
    refined = np.asarray(refined)
    assert np.isfinite(refined).all()
    # heading through the gap should progress smoothly across the cut
    un = np.unwrap(np.deg2rad(refined[:, 2]))
    assert np.abs(np.rad2deg(np.diff(un))).max() < 5.0


def test_refine_all_lost_is_finite():
    """With zero measured frames the normal system is the anchorless
    chain Laplacian; the solver must anchor pose 0 and dead-reckon the
    odometry instead of returning NaN (review finding r2)."""
    import numpy as np
    from lsdtpu.refine.pose_graph import refine_trajectory
    F = 16
    meas = np.full((F, 3), np.nan)
    scores = np.full((F,), np.inf)
    u = np.tile(np.array([1.0, 0.5, 0.0]), (F, 1))
    refined, info = refine_trajectory(meas, scores, u)
    refined = np.asarray(refined)
    assert np.isfinite(refined).all()
    assert int(info["n_measured"]) == 0
    # pure dead-reckoning from the origin anchor
    want = np.cumsum(u, axis=0) - u[0]
    np.testing.assert_allclose(refined[:, :2], want[:, :2], atol=1e-6)
