"""Determinism and failure-detection semantics.

SURVEY.md 5.2/5.3: the reference has real races (thread-timing
dependent candidate order) and one failure mechanism (tracking-loss
reset to the (-1,-1) sentinel with global relocalization next frame).
The rebuild makes determinism a test invariant and keeps the reset
semantics exactly."""

import numpy as np
import pytest

from lsdtpu.oracle import driver as odrv
from lsdtpu.runtime.online import OnlineLocalizer


@pytest.fixture(scope="module")
def map_art(dataset_small):
    ds = dataset_small
    return odrv.prepare_map(ds.map_value, ds.param.resol)


def test_rollout_bitwise_deterministic(dataset_small, map_art):
    """Same inputs -> bitwise-identical outputs, run to run.  (The
    reference is nondeterministic here: its result vector order is
    thread-timing dependent, myFA.cpp:45-62.)"""
    import jax
    from lsdtpu.runtime import make_map_context, run_sequence, stack_frames
    ds = dataset_small
    ctx = make_map_context(map_art.lines_info, map_art.map_cache,
                           ds.param.resol, ds.param.ori_x, ds.param.ori_y,
                           dtype=np.float32)
    frames = stack_frames(ds, dtype=np.float32, max_frames=25)
    a = jax.tree.map(np.asarray, run_sequence(frames, ctx))
    b = jax.tree.map(np.asarray, run_sequence(frames, ctx))
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_tracking_loss_reset_and_relocalization(dataset_small, map_art):
    """A garbage scan resets the chain to the (-1,-1) sentinel
    (myFA.cpp:69-89); the next good scan relocalizes globally (the
    first-frame path ignores the HMM distance gate, myFA.cpp:330)."""
    ds = dataset_small
    loc = OnlineLocalizer(dtype=np.float64)
    loc.set_map_artifacts(map_art.lines_info, map_art.map_cache,
                          ds.param.resol, ds.param.ori_x, ds.param.ori_y)
    for f in range(5):
        out = loc.push_scan(ds.frames[f][:, 0], ds.frames[f][:, 1],
                            ds.odom[f + 1])
    assert np.isfinite(out["score"])
    pose_before = out["pose"].copy()

    # garbage scan: a tiny ring that matches nothing
    garbage = np.full(360, 0.4)
    angs = np.linspace(0, 2 * np.pi, 360, endpoint=False)
    out = loc.push_scan(garbage, angs, ds.odom[6])
    assert not np.isfinite(out["score"])
    assert out["pose"][0] == -1 and out["pose"][1] == -1  # sentinel

    # next good scan relocalizes near the pre-loss pose
    out = loc.push_scan(ds.frames[6][:, 0], ds.frames[6][:, 1],
                        ds.odom[7])
    assert np.isfinite(out["score"])
    assert np.abs(out["pose"][:2] - pose_before[:2]).max() < 30.0


def test_legacy_and_tracking_modes_share_map_guard():
    loc = OnlineLocalizer(mode="legacy")
    assert not loc.is_map_ready
    with pytest.raises(RuntimeError):
        loc.push_scan(np.ones(10), np.zeros(10))


def test_synthetic_room_localizes_to_truth():
    """Closed-loop sanity: a simulated rectangular room with the robot
    at the map center must localize to the center (no dataset, pure
    geometry)."""
    import jax
    from lsdtpu.runtime.loop import run_sequence
    import __graft_entry__ as g
    frames, ctx = g._tiny_scene(n_frames=3)
    outs = jax.tree.map(np.asarray, run_sequence(frames, ctx))
    assert np.isfinite(outs["score"]).all()
    # map is 128x128, robot at the center (64, 64)
    final = outs["pose"][-1]
    assert abs(final[0] - 64) < 2 and abs(final[1] - 64) < 2, final


def _blind(frames, lo, hi):
    """Frames [lo, hi) see a tiny ring that featurizes to nothing."""
    d = dict(frames)
    r = np.array(frames["ranges"])
    r[lo:hi] = 0.06
    d["ranges"] = r
    return d


def test_coast_on_loss_dead_reckons_through_blind_window(dataset_small,
                                                         map_art):
    """match.coast_on_loss > 0 (beyond the reference): a momentary
    blind window dead-reckons on odometry (pose stays near the clean
    trajectory, covariance inflates) instead of emitting the (-1,-1)
    sentinel, and recovery is a local re-lock."""
    import dataclasses
    import jax
    from lsdtpu.config import DEFAULT
    from lsdtpu.runtime import make_map_context, run_sequence, stack_frames

    ds = dataset_small
    ctx = make_map_context(map_art.lines_info, map_art.map_cache,
                           ds.param.resol, ds.param.ori_x, ds.param.ori_y)
    frames = stack_frames(ds, dtype=np.float64, max_frames=45)
    dirty = _blind(frames, 20, 27)

    clean = jax.tree.map(np.asarray, run_sequence(frames, ctx))
    faith = jax.tree.map(np.asarray, run_sequence(dirty, ctx))
    cfg = dataclasses.replace(DEFAULT, match=dataclasses.replace(
        DEFAULT.match, coast_on_loss=10))
    coast = jax.tree.map(np.asarray, run_sequence(dirty, ctx, cfg))

    assert np.isfinite(clean["score"]).all()
    # reference semantics: sentinel poses throughout the window
    assert (faith["pose"][20:27, 0] == -1).all()
    assert not faith["coasting"].any()
    # coast: flagged, score=inf, pose tracks the clean trajectory
    assert coast["coasting"][20:27].all()
    assert not np.isfinite(coast["score"][20:27]).any()
    err = np.linalg.norm(
        (coast["pose"] - clean["pose"])[:, :2], axis=1)
    assert err[20:27].max() < 15.0      # px drift on pure odometry
    # local re-lock on the first good frame, and the tail stays tight
    assert np.isfinite(coast["score"][27:]).all()
    assert not coast["coasting"][27:].any()
    assert err[27:].max() < 15.0


def test_coast_budget_exhausted_falls_back_to_reset(dataset_small,
                                                    map_art):
    """Past coast_on_loss consecutive lost frames the reference's
    global reset applies unchanged (the budget bounds how long pure
    odometry is trusted)."""
    import dataclasses
    import jax
    from lsdtpu.config import DEFAULT
    from lsdtpu.runtime import make_map_context, run_sequence, stack_frames

    ds = dataset_small
    ctx = make_map_context(map_art.lines_info, map_art.map_cache,
                           ds.param.resol, ds.param.ori_x, ds.param.ori_y)
    frames = stack_frames(ds, dtype=np.float64, max_frames=35)
    dirty = _blind(frames, 20, 27)
    cfg = dataclasses.replace(DEFAULT, match=dataclasses.replace(
        DEFAULT.match, coast_on_loss=3))
    outs = jax.tree.map(np.asarray, run_sequence(dirty, ctx, cfg))
    assert outs["coasting"][20:23].all()          # within budget
    assert not outs["coasting"][23:27].any()      # budget exhausted
    assert (outs["pose"][23:27, 0] == -1).all()   # reference reset
    # global relocalization still recovers after the window
    assert np.isfinite(outs["score"][28:]).all()


def test_checkpoint_roundtrip_carries_lost_streak(tmp_path):
    """lost_streak serializes; pre-round-2 checkpoints without the
    field load with the zero default."""
    import jax.numpy as jnp
    from lsdtpu.runtime.checkpoint import load_state, save_state
    from lsdtpu.runtime.loop import init_state

    st = init_state(np.float64)
    st = type(st)(**{**{f: getattr(st, f) for f in (
        "kalman_x", "kalman_P", "last_pose", "ang_sum", "ang_cnt",
        "is_offset", "frame")}, "lost_streak": jnp.asarray(4, jnp.int32)})
    p = str(tmp_path / "st.npz")
    save_state(p, st)
    back = load_state(p)
    assert int(back.lost_streak) == 4

    # simulate a legacy checkpoint: drop the field from the npz
    with np.load(p) as z:
        legacy = {k: z[k] for k in z.files if k != "lost_streak"}
    with open(p, "wb") as fh:
        np.savez(fh, **legacy)
    back = load_state(p)
    assert int(back.lost_streak) == 0


def test_cli_presets_compose_with_overrides():
    """--preset applies a bundle before --set; faithful == DEFAULT."""
    import argparse
    from lsdtpu.cli import build_cfg
    from lsdtpu.config import DEFAULT

    ns = argparse.Namespace(preset="faithful", overrides=[])
    assert build_cfg(ns) == DEFAULT
    ns = argparse.Namespace(preset="robust",
                            overrides=["match.coast_on_loss=7"])
    cfg = build_cfg(ns)
    assert cfg.match.obstacle_tolerance == 0.35
    assert cfg.match.coast_on_loss == 7          # --set wins
    ns = argparse.Namespace(preset="accuracy", overrides=[])
    cfg = build_cfg(ns)
    assert cfg.match.polish_pose and not cfg.faithful


def test_cli_override_coercion_errors_are_loud():
    """--set mistakes fail at parse time with the offending path, not
    later at jit-trace time (advisor r2)."""
    import pytest
    from lsdtpu.cli import apply_overrides
    from lsdtpu.config import DEFAULT

    # 'none' only valid for Optional fields
    cfg = apply_overrides(DEFAULT, ["match.obstacle_min_dist=0.6"])
    cfg = apply_overrides(cfg, ["match.obstacle_min_dist=none"])
    assert cfg.match.obstacle_min_dist is None
    with pytest.raises(ValueError, match="match.coast_on_loss"):
        apply_overrides(DEFAULT, ["match.coast_on_loss=none"])
    # unparseable value carries the path context
    with pytest.raises(ValueError, match="match.coast_on_loss"):
        apply_overrides(DEFAULT, ["match.coast_on_loss=0.5"])
    with pytest.raises(ValueError, match="match.obstacle_min_dist"):
        apply_overrides(DEFAULT, ["match.obstacle_min_dist=abc"])


def test_obstacle_min_dist_out_of_range_rejected(dataset_small, map_art):
    """obstacle_min_dist above the cache cap (or <= 0) is a config
    mistake, rejected loudly instead of degenerating silently
    (advisor r2; match/associate.py)."""
    import dataclasses
    import pytest
    from lsdtpu.config import DEFAULT
    from lsdtpu.runtime import make_map_context, run_sequence, stack_frames

    ds = dataset_small
    ctx = make_map_context(map_art.lines_info, map_art.map_cache,
                           ds.param.resol, ds.param.ori_x, ds.param.ori_y)
    frames = stack_frames(ds, dtype=np.float32, max_frames=2)
    cfg = dataclasses.replace(DEFAULT, match=dataclasses.replace(
        DEFAULT.match, obstacle_tolerance=0.2, obstacle_min_dist=1.5))
    with pytest.raises(ValueError, match="obstacle_min_dist"):
        run_sequence(frames, ctx, cfg)
