"""LsdRosAdapter: the packaged ROS node's callback semantics over fake
(duck-typed) messages - no ROS install needed (reference wiring:
LSD/main_on_linux.cpp:33-134)."""

import math
from types import SimpleNamespace as NS

import numpy as np
import pytest

from lsdtpu.oracle import driver as odrv
from lsdtpu.runtime.online import OnlineLocalizer
from lsdtpu.runtime.ros_node import LsdRosAdapter


@pytest.fixture(scope="module")
def map_art(dataset_small):
    ds = dataset_small
    return odrv.prepare_map(ds.map_value, ds.param.resol, z_occ_max_dis=2.0)


def _grid_msgs(ds):
    """Dataset map -> fake (/map_metadata, /map) messages, inverting the
    reference's remap (main_on_linux.cpp:108-124): dataset 0 (unknown)
    <- grid 255, 255 (free) <- 0, 1 (occupied) <- anything else."""
    mv = ds.map_value
    grid = np.full(mv.shape, 100, np.int16)     # occupied percentage
    grid[mv == 0] = 255
    grid[mv == 255] = 0
    meta = NS(width=mv.shape[1], height=mv.shape[0],
              resolution=ds.param.resol,
              origin=NS(position=NS(x=ds.param.ori_x, y=ds.param.ori_y)))
    grid_msg = NS(data=grid.reshape(-1))
    return meta, grid_msg


def _scan_msg(frame, n_inf: int = 0):
    """Dataset polar frame -> fake LaserScan with evenly-spaced angles
    reconstructed from angle_min/angle_increment; optionally INF-holed."""
    r = frame[:, 0].astype(np.float64).copy()
    a = frame[:, 1].astype(np.float64)
    inc = np.diff(a).mean()
    if n_inf:
        r[::max(1, len(r) // n_inf)] = np.inf
    return NS(ranges=r, angle_min=a[0], angle_increment=inc)


def test_map_guard_order_and_scan_drop(dataset_small):
    """Scans before the map are dropped (isMapReady guard); /map before
    /map_metadata is dropped (oriMapCol<=0 guard)."""
    ad = LsdRosAdapter(use_tpu_mapprep=False)
    meta, grid = _grid_msgs(dataset_small)
    assert ad.on_scan(_scan_msg(dataset_small.frames[0])) is None
    assert ad.on_map(grid) is None              # metadata not seen yet
    ad.on_map_metadata(meta)
    n = ad.on_map(grid)
    assert n is not None and n > 10
    assert ad.loc.is_map_ready


def test_adapter_matches_direct_legacy_localizer(dataset_small, map_art):
    """A scan through the adapter == the same scan through a directly
    driven legacy OnlineLocalizer (angles reconstructed incrementally,
    INFs dropped - main_on_linux.cpp:54-64, compaction fixed)."""
    ds = dataset_small
    ad = LsdRosAdapter(use_tpu_mapprep=False)
    meta, grid = _grid_msgs(ds)
    ad.on_map_metadata(meta)
    ad.on_map(grid)

    loc = OnlineLocalizer(mode="legacy")
    loc.set_map_artifacts(map_art.lines_info, map_art.map_cache,
                          ds.param.resol, ds.param.ori_x, ds.param.ori_y)

    msg = _scan_msg(ds.frames[0], n_inf=20)
    out = ad.on_scan(msg)
    keep = np.isfinite(msg.ranges)
    angles = msg.angle_min + np.arange(len(msg.ranges)) * \
        msg.angle_increment
    want = loc.push_scan(np.asarray(msg.ranges)[keep].astype(np.float32),
                         angles[keep].astype(np.float32))
    np.testing.assert_allclose(out["pose"], want["pose"], atol=1e-5)
    np.testing.assert_allclose(out["pose_world"], want["pose_world"],
                               atol=1e-5)


def test_all_inf_scan_dropped(dataset_small):
    ad = LsdRosAdapter(use_tpu_mapprep=False)
    meta, grid = _grid_msgs(dataset_small)
    ad.on_map_metadata(meta)
    ad.on_map(grid)
    msg = NS(ranges=np.full(360, np.inf), angle_min=0.0,
             angle_increment=math.tau / 360)
    assert ad.on_scan(msg) is None              # len_lp == 0 path


def test_tracking_mode_consumes_odometry(dataset_small, map_art):
    """mode='tracking' (beyond the reference's legacy linux node):
    /odom quaternions feed the UKF's odometry deltas."""
    ds = dataset_small
    ad = LsdRosAdapter(mode="tracking", use_tpu_mapprep=False)
    # tracking mode uses the Windows cap (z=1) - set artifacts directly
    art = odrv.prepare_map(ds.map_value, ds.param.resol)
    ad.loc.set_map_artifacts(art.lines_info, art.map_cache,
                             ds.param.resol, ds.param.ori_x, ds.param.ori_y)

    def odom_msg(x, y, yaw):
        return NS(pose=NS(pose=NS(
            position=NS(x=x, y=y),
            orientation=NS(x=0.0, y=0.0, z=math.sin(yaw / 2),
                           w=math.cos(yaw / 2)))))

    for f in range(3):
        od = ds.odom[f + 1]
        ad.on_odom(odom_msg(od[0], od[1], 0.1 * f))
        out = ad.on_scan(_scan_msg(ds.frames[f]))
    assert np.isfinite(out["score"])
    assert np.asarray(ad._odom).shape == (3,)


def test_main_without_rclpy_exits_cleanly(capsys):
    """No ROS install: the entry point reports and exits 2 instead of
    crashing (import-guarded shell)."""
    from lsdtpu.runtime import ros_node
    assert ros_node.main([]) == 2
    assert "rclpy" in capsys.readouterr().err
