"""Trajectory metrics (eval/ate.py): keyframe indexing, interpolation,
and the rigid SE(2)-aligned ATE (TUM convention)."""

import numpy as np

from lsdtpu.eval import ate as eval_ate


def _rot(deg):
    r = np.deg2rad(deg)
    return np.array([[np.cos(r), -np.sin(r)], [np.sin(r), np.cos(r)]])


def test_umeyama_recovers_rigid_transform():
    rng = np.random.default_rng(3)
    src = rng.normal(size=(40, 2)) * 5
    R_true = _rot(37.0)
    t_true = np.array([1.25, -0.75])
    dst = src @ R_true.T + t_true
    R, t = eval_ate.umeyama_se2(src, dst)
    np.testing.assert_allclose(R, R_true, atol=1e-10)
    np.testing.assert_allclose(t, t_true, atol=1e-10)
    assert np.isclose(np.linalg.det(R), 1.0)   # proper rotation, no flip


def test_aligned_ate_removes_constant_offset():
    """A trajectory that is exact up to a constant frame-convention
    offset (the f4key situation) has raw ATE = |offset| but aligned
    ATE ~ 0."""
    resol, ox, oy = 0.05, -2.0, -3.0
    F = 50
    gt = np.stack([np.linspace(0, 4, F), np.sin(np.linspace(0, 3, F))], 1)
    offset = np.array([0.85, 1.93])
    est_world = gt + offset
    poses_px = np.zeros((F, 3))
    poses_px[:, 0] = (est_world[:, 0] - ox) / resol
    poses_px[:, 1] = (est_world[:, 1] - oy) / resol
    rec = np.arange(1, F + 1)
    raw = eval_ate.keyframe_ate(poses_px, gt, rec, resol, ox, oy)
    al = eval_ate.aligned_keyframe_ate(poses_px, gt, rec, resol, ox, oy)
    np.testing.assert_allclose(raw.rmse, np.linalg.norm(offset), atol=1e-9)
    assert al.rmse < 1e-9


def test_aligned_ate_keeps_shape_error():
    """Alignment must not hide genuine trajectory-shape error."""
    resol, ox, oy = 0.05, 0.0, 0.0
    F = 60
    gt = np.stack([np.linspace(0, 6, F), np.zeros(F)], 1)
    rng = np.random.default_rng(0)
    noise = rng.normal(scale=0.2, size=(F, 2))
    poses_px = np.zeros((F, 3))
    poses_px[:, 0] = (gt[:, 0] + noise[:, 0]) / resol
    poses_px[:, 1] = (gt[:, 1] + noise[:, 1]) / resol
    rec = np.arange(1, F + 1)
    al = eval_ate.aligned_keyframe_ate(poses_px, gt, rec, resol, ox, oy)
    assert 0.05 < al.rmse < 0.4


def test_aligned_ate_skips_nonfinite_poses():
    resol, ox, oy = 0.05, 0.0, 0.0
    F = 10
    gt = np.stack([np.arange(F, dtype=float), np.zeros(F)], 1)
    poses_px = np.zeros((F, 3))
    poses_px[:, 0] = gt[:, 0] / resol
    poses_px[2] = np.nan                       # lost frame
    rec = np.arange(1, F + 1)
    al = eval_ate.aligned_keyframe_ate(poses_px, gt, rec, resol, ox, oy)
    assert np.isfinite(al.rmse)
    assert al.n == F - 1
