"""Legacy (ROS V2.2) feature association, compiled for TPU.

TPU-native redesign of the single-threaded first-generation matcher
(reference: ROS/lsd/src/FeatureAssociation.cpp).  Same dense-tensor
strategy as the current-generation matcher (associate.py) with the
legacy semantics:

  * absolute length gate |mapLen - scanLen| <= 0.3 m / resol
    (FeatureAssociation.cpp:64-73); no minimum-length or HMM gate;
  * candidate pose = floor((LidarPos - scan_base) R + map_base),
    heading = map-line direction (RotateScanIm, :254-299);
  * scoring reprojects the RAW polar ranges at the candidate pose with
    the 7x cap-count weighting and 0.75 in-bounds validity gate
    (ScanToMapMatchScore, :202-252; cache cap z=2 m in the ROS node,
    main_on_linux.cpp:129);
  * the global FIRST minimum wins (:119-124) - no fusion, no filter.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from lsdtpu import geometry as geo
from lsdtpu.match.associate import Candidates

PI = math.pi


def generate_candidates_legacy(scan_lines, scan_mask, map_lines, map_mask,
                               lidar_pos, resol, max_candidates: int,
                               len_diff_m: float = 0.3) -> Candidates:
    """Gate + compact the (S, M, 4) legacy hypothesis tensor."""
    S = scan_lines.shape[0]
    M = map_lines.shape[0]

    s_len = scan_lines[:, geo.LEN]
    m_len = map_lines[:, geo.LEN]
    len_diff = len_diff_m / resol
    gate_len = scan_mask[:, None] & map_mask[None, :] & \
        (m_len[None, :] >= (s_len - len_diff)[:, None]) & \
        (m_len[None, :] <= (s_len + len_diff)[:, None])

    def dirs(lines):
        fwd = geo.normalized_line_direction(
            lines[:, geo.X1], lines[:, geo.Y1],
            lines[:, geo.X2], lines[:, geo.Y2])
        rev = geo.normalized_line_direction(
            lines[:, geo.X2], lines[:, geo.Y2],
            lines[:, geo.X1], lines[:, geo.Y1])
        return fwd, rev

    s_fwd, s_rev = dirs(scan_lines)
    m_fwd, m_rev = dirs(map_lines)

    # hypothesis layout (FeatureAssociation.cpp:159-179):
    #   h0: map fwd + scan fwd   h1: map fwd + scan rev
    #   h2: map rev + scan fwd   h3: map rev + scan rev
    m_ang = jnp.stack([m_fwd, m_fwd, m_rev, m_rev], -1)
    m_bx = jnp.stack([map_lines[:, geo.X1], map_lines[:, geo.X1],
                      map_lines[:, geo.X2], map_lines[:, geo.X2]], -1)
    m_by = jnp.stack([map_lines[:, geo.Y1], map_lines[:, geo.Y1],
                      map_lines[:, geo.Y2], map_lines[:, geo.Y2]], -1)
    s_ang = jnp.stack([s_fwd, s_rev, s_fwd, s_rev], -1)
    s_bx = jnp.stack([scan_lines[:, geo.X1], scan_lines[:, geo.X2],
                      scan_lines[:, geo.X1], scan_lines[:, geo.X2]], -1)
    s_by = jnp.stack([scan_lines[:, geo.Y1], scan_lines[:, geo.Y2],
                      scan_lines[:, geo.Y1], scan_lines[:, geo.Y2]], -1)

    ang_diff = m_ang[None, :, :] - s_ang[:, None, :]
    ca = geo.cosd(ang_diff)
    sa = geo.sind(ang_diff)
    sx = jnp.broadcast_to(s_bx[:, None, :], (S, M, 4))
    sy = jnp.broadcast_to(s_by[:, None, :], (S, M, 4))
    mx = jnp.broadcast_to(m_bx[None, :, :], (S, M, 4))
    my = jnp.broadcast_to(m_by[None, :, :], (S, M, 4))

    lx, ly = lidar_pos[0], lidar_pos[1]
    px = jnp.floor((lx - sx) * ca - (ly - sy) * sa + mx)
    py = jnp.floor((lx - sx) * sa + (ly - sy) * ca + my)
    ang = jnp.broadcast_to(s_ang[:, None, :], (S, M, 4)) + ang_diff

    feat = jnp.stack([ca, sa, sx, sy, mx, my, px, py, ang],
                     -1).reshape(S * M * 4, 9)
    gate = jnp.broadcast_to(gate_len[:, :, None], (S, M, 4))
    comp, mask, count = geo.masked_compact(feat, gate.reshape(-1),
                                           max_candidates)
    return Candidates(
        ca=comp[:, 0], sa=comp[:, 1], sx=comp[:, 2], sy=comp[:, 3],
        mx=comp[:, 4], my=comp[:, 5],
        pose=comp[:, 6:9], mask=mask, count=count.astype(jnp.int32))


def score_candidates_legacy(cand: Candidates, ranges, angles, valid, n,
                            map_cache, resol, rows=None, cols=None,
                            z_occ_max_dis: float = 2.0,
                            chunk: int = 256) -> jnp.ndarray:
    """(K,) legacy scores: raw polar reprojection at each candidate pose
    (reference: ScanToMapMatchScore, FeatureAssociation.cpp:202-252)."""
    pad_rows, pad_cols = map_cache.shape
    if rows is None:
        rows = pad_rows
    if cols is None:
        cols = pad_cols
    dt = ranges.dtype
    nf = n.astype(dt)
    cache_flat = map_cache.reshape(-1)

    def score_chunk(c):
        px, py, ang = c["pose"][:, 0], c["pose"][:, 1], c["pose"][:, 2]
        th = ang * (PI / 180.0)
        gx = jnp.floor(ranges[None, :] *
                       jnp.cos(angles[None, :] + th[:, None]) / resol) + \
            px[:, None] - 1.0
        gy = jnp.floor(ranges[None, :] *
                       jnp.sin(angles[None, :] + th[:, None]) / resol) + \
            py[:, None] - 1.0
        inb = (gx > 1) & (gx < cols) & (gy > 1) & (gy < rows) & \
            valid[None, :]
        ix = jnp.clip(gx, 0, pad_cols - 1).astype(jnp.int32)
        iy = jnp.clip(gy, 0, pad_rows - 1).astype(jnp.int32)
        vals = jnp.take(cache_flat, (iy * pad_cols + ix).reshape(-1)
                        ).reshape(gx.shape)
        # exact equality is the reference semantic (the cap INIT value,
        # FeatureAssociation.cpp:238-242; above-cap stored distances
        # stay in the dist sum).  In f32 a below-cap value within
        # 2^-23 of the cap would round onto it, but BFS distances are
        # sqrt(int)*res-spaced ~1e-3 near z=2 on these maps, so the
        # cast preserves the predicate; quantized caches are rejected
        # upstream (online.py set_map_artifacts).
        at_cap = inb & (vals == z_occ_max_dis)
        scanlen = jnp.sum(inb, axis=1).astype(dt)
        max_count = jnp.sum(at_cap, axis=1).astype(dt)
        dist = jnp.sum(jnp.where(inb & ~at_cap, vals, 0.0), axis=1)
        dist_count = scanlen - max_count
        score = (dist + 7.0 * max_count) / (dist_count + max_count) + \
            10.0 * (nf - scanlen) / nf
        pose_ok = (px <= cols) & (px >= 1) & (py <= rows) & (py >= 1)
        ok = pose_ok & (scanlen >= nf * 0.75)
        return jnp.where(ok, score, jnp.inf)

    K = cand.pose.shape[0]
    nch = -(-K // chunk)
    Kp = nch * chunk
    pose_p = jnp.concatenate(
        [cand.pose, jnp.zeros((Kp - K, 3), cand.pose.dtype)])
    chunked = {"pose": pose_p.reshape(nch, chunk, 3)}
    scores = jax.lax.map(score_chunk, chunked).reshape(-1)[:K]
    return jnp.where(cand.mask, scores, jnp.inf)


def first_min_pose(cand: Candidates, scores
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Global first-minimum pose [x, y, ang_rad]
    (FeatureAssociation.cpp:119-127)."""
    best = jnp.argmin(jnp.where(cand.mask, scores, jnp.inf))
    p = cand.pose[best]
    return jnp.stack([p[0], p[1], p[2] * (PI / 180.0)]), scores[best]


def pixel_to_world(pose, resol, ori_x, ori_y):
    """estimatePose_realworld (FeatureAssociation.cpp:126-129)."""
    return jnp.stack([pose[0] * resol + ori_x, pose[1] * resol + ori_y,
                      pose[2]])
