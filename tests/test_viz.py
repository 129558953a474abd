"""Visualization dumps (lsdtpu/viz.py) - the reference's display
windows (main_on_windows.cpp:175-178) as PNG files."""

import numpy as np
import pytest

from lsdtpu import viz


def test_map_to_gray_semantics():
    m = np.array([[0, 1, 255]], np.uint8)
    g = viz.map_to_gray(m)
    assert g.dtype == np.uint8
    assert g[0, 0] == 160 and g[0, 1] == 0 and g[0, 2] == 255


def test_cache_to_gray_range():
    c = np.array([[0.0, 0.5, 1.0, 2.0]])
    g = viz.cache_to_gray(c, z_occ_max_dis=1.0)
    assert g[0, 0] == 0 and g[0, 2] == 255 and g[0, 3] == 255
    assert 100 < g[0, 1] < 155


def test_draw_dots_skips_oob_and_nonfinite():
    rgb = np.zeros((10, 10, 3), np.uint8)
    pts = np.array([[5.0, 5.0], [50.0, 50.0], [np.nan, 2.0], [-4.0, 2.0]])
    viz.draw_dots(rgb, pts, (10, 20, 30), radius=1)
    assert tuple(rgb[5, 5]) == (10, 20, 30)
    # only the disk around (5,5) is painted
    assert (rgb != 0).any(axis=2).sum() == len(viz._disk_offsets(1))


def test_trajectory_image_colors():
    m = np.full((20, 20), 255, np.uint8)
    poses = np.array([[5.0, 5.0, 0.0], [12.0, 12.0, 0.0]])
    scores = np.array([1.0, np.inf])   # frame 2 lost
    rgb = viz.trajectory_image(m, poses, scores)
    assert tuple(rgb[5, 5]) == viz.POSE_GREEN
    assert tuple(rgb[12, 12]) == viz.LOST_ORANGE


def test_scan_image_auto_canvas():
    px = np.array([[3, 4], [7, 2], [0, 0]])
    mask = np.array([True, True, False])
    img = viz.scan_image(px, mask, lidar_pos=np.array([5.0, 5.0]))
    assert img.shape[0] >= 6 and img.shape[1] >= 8
    assert tuple(img[4, 3]) == (255, 255, 255)
    assert tuple(img[5, 5]) == viz.LIDAR_YELLOW


def test_dump_run_end_to_end(tmp_path):
    PIL = pytest.importorskip("PIL.Image")
    import jax

    import __graft_entry__ as ge
    from lsdtpu.config import DEFAULT
    from lsdtpu.runtime.loop import featurize_stage, run_sequence

    frames, ctx = ge._tiny_scene(n_frames=2)
    outs = jax.tree.map(np.asarray, run_sequence(frames, ctx, DEFAULT))

    H, W = np.asarray(ctx.cache).shape
    map_value = np.where(np.asarray(ctx.cache) < 0.03, 1, 255).astype(
        np.uint8)
    fr0 = jax.tree.map(lambda x: x[0], frames)
    fs = jax.tree.map(np.asarray, featurize_stage(
        (fr0["ranges"], fr0["angles"], fr0["valid"], fr0["n"],
         fr0["odom_prev"], fr0["odom_cur"]), ctx, DEFAULT))

    # ground truth in world meters at the known robot pose (origin)
    real_pos = np.zeros((2, 2))
    paths = viz.dump_run(
        str(tmp_path), map_value, np.asarray(ctx.lines), ctx.cache, outs,
        resol=float(ctx.resol), ori_x=float(ctx.ori_x),
        ori_y=float(ctx.ori_y), real_pos=real_pos,
        scan_features=[(1, fs)], z_occ_max_dis=1.0)

    names = sorted(p.split("/")[-1] for p in paths)
    assert names == ["map_cache.png", "map_lines.png", "scan_0001.png",
                     "trajectory.png"]
    for p in paths:
        img = PIL.open(p)
        img.load()
        assert img.size[0] > 1 and img.size[1] > 1
    # trajectory canvas matches the map
    traj = np.asarray(PIL.open(str(tmp_path / "trajectory.png")))
    assert traj.shape[:2] == (H, W)
    # LSD wall lines were painted
    assert (traj == np.array(viz.LINE_RED, np.uint8)).all(axis=2).any()
