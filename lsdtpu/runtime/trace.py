"""Observability: per-stage timing, device profiling, structured logs.

The reference's only instrumentation is a run-level clock() and
per-frame printfs (LSD/main_on_windows.cpp:17-18,189-190;
LSD/myFA.cpp:106,173).  Rebuild (SURVEY.md 5.1/5.5): a per-stage
timing harness over the jitted pipeline stages, optional XLA device
profiling via jax.profiler, and structured per-frame JSONL records.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import IO, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lsdtpu.config import EngineConfig, DEFAULT
from lsdtpu.filter import ukf as fukf
from lsdtpu.match import associate as assoc
from lsdtpu.runtime.loop import MapContext
from lsdtpu.scan.featurize import featurize


def stage_timings(frame_inputs, ctx: MapContext,
                  cfg: EngineConfig = DEFAULT, repeats: int = 10) -> dict:
    """Per-stage wall times (ms) for one frame: featurize, candidate
    generation, scoring, fusion, UKF.  Each stage is jitted separately
    and timed TO VALUE (a leaf is materialized on the host every
    repeat): through the device relay block_until_ready returns at
    enqueue, so ready-based timing measures dispatch latency only
    (docs/RESULTS.md round-3 correction).  Numbers include per-dispatch
    + transfer overhead but expose the relative stage costs."""
    ranges, angles, valid, n, odom_prev, odom_cur = frame_inputs
    sh = cfg.shapes
    out = {}

    def timed(name, f, *args):
        r = f(*args)
        np.asarray(jax.tree.leaves(r)[0])       # compile + warm, to value
        t0 = time.perf_counter()
        for _ in range(repeats):
            r = f(*args)
            np.asarray(jax.tree.leaves(r)[0])   # time-to-value
        out[name] = (time.perf_counter() - t0) / repeats * 1e3
        return r

    fs = timed("featurize_ms", jax.jit(lambda *a: featurize(
        *a, least_point=cfg.rdp.least_point, thre_line=cfg.rdp.thre_line,
        least_dist=cfg.rdp.least_dist, max_lines=sh.max_scan_lines,
        max_pixels=sh.max_scan_pixels, max_steps=sh.max_scan_steps)),
        ranges, angles, valid, n, ctx.resol, ctx.ori_x, ctx.ori_y)

    last_pose = jnp.array([-1.0, -1.0, 0.0], ranges.dtype)
    lidar_pose = jnp.round(fs.lidar_pos)
    cand = timed("candidates_ms", jax.jit(lambda *a: assoc.generate_candidates(
        *a, max_candidates=sh.max_candidates,
        ignore_scan_length=cfg.match.ignore_scan_length,
        scan_to_map_diff=cfg.match.scan_to_map_diff,
        max_esti_dist=cfg.match.max_esti_dist)),
        fs.lines, fs.lines_mask, ctx.lines, ctx.lines_mask,
        lidar_pose, last_pose)

    scores = timed("score_ms", jax.jit(lambda *a: assoc.score_candidates(
        *a, z_occ_max_dis=cfg.map.z_occ_max_dis,
        max_dist_penalty=cfg.match.max_dist_penalty,
        valid_ratio=cfg.match.valid_ratio)),
        cand, fs.pixels, fs.pixels_mask, ctx.cache)

    timed("fuse_ms", jax.jit(assoc.fuse), cand, scores)
    timed("ukf_ms", jax.jit(fukf.ukf_step),
          jnp.asarray(fukf.RESET_X, ranges.dtype),
          jnp.asarray(fukf.RESET_P, ranges.dtype),
          jnp.zeros(3, ranges.dtype), jnp.zeros(3, ranges.dtype))
    return out


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """jax.profiler trace scope (no-op when log_dir is None).

    CAUTION: on the axon relay jax.profiler tracing HANGS the client
    (observed round 3); use on real local devices / CPU only.  For
    on-relay attribution use time-to-value ablation
    (scripts/profile_attrib.py docstring, docs/RESULTS.md)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class FrameLog:
    """Structured per-frame JSONL records (pose, score, gate counts)."""

    def __init__(self, fh: IO[str]):
        self._fh = fh
        self.n = 0

    def write_rollout(self, outs: dict, n_frames: Optional[int] = None,
                      seq: str = "") -> int:
        poses = np.asarray(outs["pose"])
        scores = np.asarray(outs["score"])
        ncand = np.asarray(outs["n_candidates"])
        nlines = np.asarray(outs["n_scan_lines"])
        F = n_frames if n_frames is not None else poses.shape[0]
        for f in range(F):
            sc = float(scores[f])
            rec = {"seq": seq, "frame": f + 1,
                   "pose": [float(v) for v in poses[f]],
                   "score": sc if np.isfinite(sc) else None,
                   "n_candidates": int(ncand[f]),
                   "n_scan_lines": int(nlines[f]),
                   "tracking": bool(np.isfinite(scores[f]))}
            self._fh.write(json.dumps(rec) + "\n")
            self.n += 1
        self._fh.flush()
        return F
