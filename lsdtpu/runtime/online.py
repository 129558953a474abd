"""Online (streaming) localization - the ROS node equivalent.

The reference's online entry is a ROS node: mapCallback builds the map
artifacts and sets an isMapReady guard, laserCallback runs
FeatureScan + FeatureAssociation per incoming scan (reference:
LSD/main_on_linux.cpp:33-176).  Here the same lifecycle is a plain
object wrapping the jitted per-frame step with persistent filter state;
scans stream in one at a time and each push returns the pose estimate.

Two matcher generations are supported, mirroring the two reference
drivers:
  * "tracking" (default): the current-generation dense matcher with
    HMM gating, weighted fusion, and the odometry-fused UKF
    (LSD/myFA.cpp) - the Windows V2.6 pipeline;
  * "legacy": the ROS V2.2 global first-minimum matcher over raw polar
    reprojection, stateless (ROS/lsd/src/FeatureAssociation.cpp).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lsdtpu.config import EngineConfig, DEFAULT
from lsdtpu.match import legacy as mlegacy
from lsdtpu.runtime.loop import (MapContext, TrackState, init_state,
                                 localization_step, make_map_context)
from lsdtpu.scan.featurize import featurize


@partial(jax.jit, static_argnames=("cfg",))
def _step(state, frame_inputs, ctx, cfg, coarse=None):
    return localization_step(state, frame_inputs, ctx, cfg,
                             coarse=coarse)


def occupancy_grid_to_map_value(data, width: int, height: int) -> np.ndarray:
    """ROS OccupancyGrid payload -> dataset-convention map values.

    The reference's mapCallback reads the int8 grid bytes as unsigned and
    remaps 255 (int8 -1, unknown) -> 0, 0 (free) -> 255, anything else
    (occupancy percentage, e.g. 100) -> 1 = occupied
    (LSD/main_on_linux.cpp:108-124).
    """
    d = np.asarray(data).astype(np.int16).astype(np.uint8)
    d = d.reshape(int(height), int(width))
    out = np.ones_like(d)
    out[d == 255] = 0
    out[d == 0] = 255
    return out


def laser_scan_to_polar(ranges, angle_min: float, angle_increment: float):
    """ROS LaserScan -> compacted (ranges, angles) with INF dropped.

    The reference's laserCallback drops INF readings and reconstructs
    angles incrementally (LSD/main_on_linux.cpp:48-64).  Note its
    compaction is buggy: valid points are stored at their ORIGINAL index
    i while only the first len_lp entries are consumed, so interleaved
    INFs make it read stale points from the previous frame.  We compact
    properly (the Windows file driver's behavior,
    main_on_windows.cpp:110-124).
    """
    r = np.asarray(ranges, np.float64)
    ang = angle_min + np.arange(r.shape[0], dtype=np.float64) \
        * angle_increment
    keep = np.isfinite(r)
    return r[keep], ang[keep]


@partial(jax.jit, static_argnames=("cfg", "z_occ_max_dis"))
def _legacy_step(ranges, angles, valid, n, ctx, cfg,
                 z_occ_max_dis: float = 2.0):
    fs = featurize(ranges, angles, valid, n, ctx.resol, ctx.ori_x,
                   ctx.ori_y,
                   least_point=cfg.rdp.least_point,
                   thre_line=cfg.rdp.thre_line,
                   least_dist=cfg.rdp.least_dist,
                   max_lines=cfg.shapes.max_scan_lines,
                   max_pixels=cfg.shapes.max_scan_pixels,
                   max_steps=cfg.shapes.max_scan_steps)
    cand = mlegacy.generate_candidates_legacy(
        fs.lines, fs.lines_mask, ctx.lines, ctx.lines_mask,
        fs.lidar_pos, ctx.resol,
        max_candidates=cfg.shapes.max_candidates)
    scores = mlegacy.score_candidates_legacy(
        cand, ranges, angles, valid, n, ctx.cache, ctx.resol,
        rows=ctx.rows, cols=ctx.cols, z_occ_max_dis=z_occ_max_dis)
    pose, best = mlegacy.first_min_pose(cand, scores)
    world = mlegacy.pixel_to_world(pose, ctx.resol, ctx.ori_x, ctx.ori_y)
    return {"pose": pose, "pose_world": world, "score": best,
            "n_candidates": jnp.sum(jnp.isfinite(scores)),
            "candidate_overflow": (cand.count > cand.mask.shape[0]) |
                                  fs.overflow}


class OnlineLocalizer:
    """Streaming localization session.

    >>> loc = OnlineLocalizer()
    >>> loc.set_map(map_value, resol, ori_x, ori_y)   # mapCallback
    >>> out = loc.push_scan(ranges, angles, odom_xyang)  # laserCallback
    """

    def __init__(self, cfg: EngineConfig = DEFAULT, mode: str = "tracking",
                 dtype=np.float32, use_tpu_mapprep: bool = True):
        if mode not in ("tracking", "legacy"):
            raise ValueError(f"unknown mode {mode!r}")
        self.cfg = cfg
        self.mode = mode
        self.dtype = dtype
        self.use_tpu_mapprep = use_tpu_mapprep
        self.ctx: Optional[MapContext] = None
        self.state: Optional[TrackState] = None
        self._prev_odom: Optional[np.ndarray] = None

    @property
    def is_map_ready(self) -> bool:
        """The reference's isMapReady guard (main_on_linux.cpp:31,50)."""
        return self.ctx is not None

    def set_map(self, map_value: np.ndarray, resol: float, ori_x: float,
                ori_y: float) -> int:
        """Build map artifacts (mapCache + LSD lines).  Returns #lines."""
        z = 2.0 if self.mode == "legacy" else self.cfg.map.z_occ_max_dis
        if self.use_tpu_mapprep:
            from lsdtpu.mapprep import prepare_map
            art = prepare_map(map_value, resol, z_occ_max_dis=z)
        else:
            from lsdtpu.oracle import driver as odrv
            art = odrv.prepare_map(map_value, resol, z_occ_max_dis=z)
        self.set_map_artifacts(art.lines_info, art.map_cache, resol,
                               ori_x, ori_y)
        return len(art.lines_info)

    def set_map_occupancy_grid(self, data, width: int, height: int,
                               resol: float, ori_x: float,
                               ori_y: float) -> int:
        """mapCallback over a ROS-shaped OccupancyGrid payload: converts
        the int8 grid (main_on_linux.cpp:108-124) and builds artifacts.
        Returns #lines."""
        return self.set_map(occupancy_grid_to_map_value(data, width,
                                                        height),
                            resol, ori_x, ori_y)

    def push_laser_scan(self, ranges, angle_min: float,
                        angle_increment: float,
                        odom: Optional[np.ndarray] = None) -> dict:
        """laserCallback over a ROS-shaped LaserScan: INF readings are
        dropped, angles reconstructed incrementally
        (main_on_linux.cpp:48-64)."""
        r, a = laser_scan_to_polar(ranges, angle_min, angle_increment)
        return self.push_scan(r.astype(self.dtype), a.astype(self.dtype),
                              odom)

    def set_map_artifacts(self, lines_info: np.ndarray,
                          map_cache: np.ndarray, resol: float,
                          ori_x: float, ori_y: float) -> None:
        cache_dtype = self.cfg.match.cache_dtype
        if self.mode == "legacy" and cache_dtype not in ("f32", "default"):
            # the legacy matcher gathers the raw float field and tests
            # the z=2 cap by equality (match/legacy.py) - it has no
            # dequant step, so compressed fields would score garbage
            raise ValueError(
                "legacy mode needs match.cache_dtype='f32' (the legacy "
                "scorer reads the raw float field)")
        self.ctx = make_map_context(
            lines_info, map_cache, resol, ori_x, ori_y,
            max_map_lines=self.cfg.shapes.max_map_lines, dtype=self.dtype,
            cache_dtype=cache_dtype,
            z_occ_max_dis=self.cfg.map.z_occ_max_dis)
        # per-map pruning field, loop-invariant: computed once here,
        # never per pushed scan (runtime/loop.prepare_coarse)
        from lsdtpu.runtime.loop import prepare_coarse
        self._coarse = prepare_coarse(self.ctx, self.cfg)
        self.reset()

    def reset(self) -> None:
        """Tracking-loss style reset of the filter chain."""
        self.state = init_state(jnp.dtype(self.dtype))
        self._prev_odom = None

    def push_scan(self, ranges: np.ndarray, angles: np.ndarray,
                  odom: Optional[np.ndarray] = None) -> dict:
        """Process one scan; returns per-frame outputs (pose in map px).

        ranges/angles: (n,) valid polar points; odom: (3,) [x, y, ang]
        cumulative odometry (tracking mode only; first frame may omit)."""
        if not self.is_map_ready:
            raise RuntimeError("map not set (isMapReady guard)")
        N = self.cfg.shapes.points_per_scan
        n = len(ranges)
        if n > N:
            # caps are never silent (ShapeConfig contract)
            raise ValueError(f"scan has {n} points > "
                             f"shapes.points_per_scan={N}; raise the cap")
        r = np.zeros(N, self.dtype)
        a = np.zeros(N, self.dtype)
        v = np.zeros(N, bool)
        r[:n] = ranges
        a[:n] = angles[:n]
        v[:n] = True

        if self.mode == "legacy":
            out = _legacy_step(jnp.asarray(r), jnp.asarray(a),
                               jnp.asarray(v), jnp.asarray(n, jnp.int32),
                               self.ctx, self.cfg)
            return {k: np.asarray(val) for k, val in out.items()}

        odom = np.zeros(3, self.dtype) if odom is None else \
            np.asarray(odom, self.dtype)
        prev = self._prev_odom if self._prev_odom is not None else odom
        inputs = (jnp.asarray(r), jnp.asarray(a), jnp.asarray(v),
                  jnp.asarray(n, jnp.int32), jnp.asarray(prev),
                  jnp.asarray(odom))
        self.state, out = _step(self.state, inputs, self.ctx, self.cfg,
                                getattr(self, "_coarse", None))
        self._prev_odom = odom
        res = {k: np.asarray(val) for k, val in out.items()}
        from lsdtpu.eval.ate import pixel_to_world
        xy = pixel_to_world(res["pose"][None], float(self.ctx.resol),
                            float(self.ctx.ori_x), float(self.ctx.ori_y))
        res["pose_world"] = np.array([xy[0, 0], xy[0, 1], res["pose"][2]])
        return res

    # -- checkpoint / resume (runtime/checkpoint.py) ---------------------
    def save(self, path: str) -> None:
        """Checkpoint the full session carry: TrackState AND the
        odometry anchor, so restore() resumes mid-trajectory with the
        correct first scan_pose delta."""
        from lsdtpu.runtime.checkpoint import save_state
        save_state(path, self.state, prev_odom=self._prev_odom)

    def restore(self, path: str) -> None:
        from lsdtpu.runtime.checkpoint import load_session
        self.state, prev = load_session(path, dtype=self.dtype)
        self._prev_odom = None if prev is None else np.asarray(prev)
