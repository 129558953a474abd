"""Online streaming localizer + checkpoint/resume."""

import numpy as np
import pytest

from lsdtpu.oracle import driver as odrv
from lsdtpu.runtime.checkpoint import load_state, save_state
from lsdtpu.runtime.online import OnlineLocalizer


@pytest.fixture(scope="module")
def map_art(dataset_small):
    ds = dataset_small
    return odrv.prepare_map(ds.map_value, ds.param.resol)


def test_online_matches_offline_rollout(dataset_small, map_art):
    from lsdtpu.config import DEFAULT
    from lsdtpu.runtime import make_map_context, run_sequence, stack_frames
    ds = dataset_small
    NF = 10
    loc = OnlineLocalizer(dtype=np.float64)
    assert not loc.is_map_ready
    with pytest.raises(RuntimeError):
        loc.push_scan(np.ones(4), np.zeros(4))
    loc.set_map_artifacts(map_art.lines_info, map_art.map_cache,
                          ds.param.resol, ds.param.ori_x, ds.param.ori_y)
    poses = []
    for f in range(NF):
        fr = ds.frames[f]
        out = loc.push_scan(fr[:, 0], fr[:, 1], ds.odom[f + 1])
        poses.append(out["pose"])

    ctx = make_map_context(map_art.lines_info, map_art.map_cache,
                           ds.param.resol, ds.param.ori_x, ds.param.ori_y,
                           dtype=np.float64)
    frames = stack_frames(ds, dtype=np.float64, max_frames=NF)
    outs = run_sequence(frames, ctx, DEFAULT)
    np.testing.assert_allclose(np.stack(poses), np.asarray(outs["pose"]),
                               atol=1e-9)


def test_online_legacy_mode(dataset_small):
    from lsdtpu.oracle import lsd as olsd
    from lsdtpu.oracle import rdp as ordp
    from lsdtpu.oracle import legacy_fa as olegacy
    ds = dataset_small
    cache = olsd.create_map_cache(ds.map_value, ds.param.resol, 2.0)
    lines = olsd.line_segment_detector(ds.map_value.copy()).lines_info
    loc = OnlineLocalizer(mode="legacy", dtype=np.float64)
    loc.set_map_artifacts(lines, cache, ds.param.resol, ds.param.ori_x,
                          ds.param.ori_y)
    fr = ds.frames[0]
    out = loc.push_scan(fr[:, 0], fr[:, 1])

    fs = ordp.feature_scan(fr[:, 0].astype(np.float64),
                           fr[:, 1].astype(np.float64), ds.param.resol,
                           ds.param.ori_x, ds.param.ori_y)
    pose_o, _ = olegacy.feature_association_legacy(
        fs.lines_info, lines, np.array(fs.lidar_pos, np.float64), cache,
        fr[:, 0].astype(np.float64), fr[:, 1].astype(np.float64),
        ds.param.resol)
    np.testing.assert_allclose(out["pose"], pose_o, atol=1e-9)


def test_occupancy_grid_conversion():
    from lsdtpu.runtime.online import occupancy_grid_to_map_value
    # int8 payload: -1 unknown, 0 free, 100 occupied
    data = np.array([-1, 0, 100, 42], np.int8)
    m = occupancy_grid_to_map_value(data, width=2, height=2)
    np.testing.assert_array_equal(m, [[0, 255], [1, 1]])
    assert m.dtype == np.uint8


def test_laser_scan_adapter_matches_push_scan(dataset_small, map_art):
    from lsdtpu.runtime.online import laser_scan_to_polar
    ds = dataset_small
    fr = ds.frames[0]
    # ROS-shaped scan: recorded ranges on a uniform angle grid with
    # INF readings interleaved (dropped by the adapter)
    n = fr.shape[0]
    angle_min, inc = float(fr[0, 1]), 2.0 * np.pi / (n + 4)
    ranges = np.full(n + 4, np.inf)
    keep = np.ones(n + 4, bool)
    keep[[5, 17, n, n + 3]] = False
    ranges[keep] = fr[: keep.sum(), 0]
    r, a = laser_scan_to_polar(ranges, angle_min, inc)
    assert r.shape == (keep.sum(),)
    np.testing.assert_allclose(
        a, angle_min + np.flatnonzero(keep) * inc, atol=1e-12)

    loc1 = OnlineLocalizer(dtype=np.float64)
    loc1.set_map_artifacts(map_art.lines_info, map_art.map_cache,
                           ds.param.resol, ds.param.ori_x, ds.param.ori_y)
    out1 = loc1.push_laser_scan(ranges, angle_min, inc, ds.odom[1])
    loc2 = OnlineLocalizer(dtype=np.float64)
    loc2.set_map_artifacts(map_art.lines_info, map_art.map_cache,
                           ds.param.resol, ds.param.ori_x, ds.param.ori_y)
    out2 = loc2.push_scan(r, a, ds.odom[1])
    np.testing.assert_allclose(out1["pose"], out2["pose"], atol=1e-9)


def test_checkpoint_resume_mid_sequence(dataset_small, map_art, tmp_path):
    ds = dataset_small
    NF, CUT = 12, 5
    ref = OnlineLocalizer(dtype=np.float64)
    ref.set_map_artifacts(map_art.lines_info, map_art.map_cache,
                          ds.param.resol, ds.param.ori_x, ds.param.ori_y)
    ref_poses = [ref.push_scan(ds.frames[f][:, 0], ds.frames[f][:, 1],
                               ds.odom[f + 1])["pose"] for f in range(NF)]

    a = OnlineLocalizer(dtype=np.float64)
    a.set_map_artifacts(map_art.lines_info, map_art.map_cache,
                        ds.param.resol, ds.param.ori_x, ds.param.ori_y)
    for f in range(CUT):
        a.push_scan(ds.frames[f][:, 0], ds.frames[f][:, 1],
                    ds.odom[f + 1])
    ck = str(tmp_path / "state.npz")
    a.save(ck)   # carries TrackState AND the odometry anchor

    b = OnlineLocalizer(dtype=np.float64)
    b.set_map_artifacts(map_art.lines_info, map_art.map_cache,
                        ds.param.resol, ds.param.ori_x, ds.param.ori_y)
    b.restore(ck)
    got = [b.push_scan(ds.frames[f][:, 0], ds.frames[f][:, 1],
                       ds.odom[f + 1])["pose"] for f in range(CUT, NF)]
    np.testing.assert_allclose(np.stack(got), np.stack(ref_poses[CUT:]),
                               atol=1e-9)


def test_orbax_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    from lsdtpu.runtime.checkpoint import (load_state_orbax,
                                           save_state_orbax)
    from lsdtpu.runtime.loop import init_state
    st = init_state(jnp.float32)
    path = str(tmp_path / "ckpt")
    save_state_orbax(path, st)
    back = load_state_orbax(path)
    for f in ("kalman_x", "kalman_P", "last_pose", "ang_sum", "ang_cnt",
              "is_offset", "frame"):
        np.testing.assert_array_equal(np.asarray(getattr(back, f)),
                                      np.asarray(getattr(st, f)), f)
