"""Dense batched scan-to-map feature association, compiled for TPU.

TPU-native redesign of the reference matcher (reference: LSD/myFA.cpp).
The reference fans (scanLine, mapLine, 4 endpoint alignments) scoring
tasks onto a 30-thread pthread pool with mutex-guarded results
(myFA.cpp:22-62, threadpool.c); here the whole hypothesis space is a
dense (S, M, 4) tensor:

  1. gates (line length ratio, HMM distance) are evaluated for all
     hypotheses at once (myFA.cpp:29-41, 330);
  2. surviving candidates are compacted (order-preserving cumsum
     scatter) into a fixed (K,) buffer;
  3. each candidate rigidly transforms the scan pixel cloud and gathers
     the mapCache prior at every pixel - one fused
     transform+gather+reduce over (K, P) (myFA.cpp:307-396);
  4. fusion is the reference's inverse-square-score weighted mean
     (myFA.cpp:159-171), which is a plain sum reduction and therefore
     distributes over sharded candidate axes with a single psum.

No locks, no queue, no nondeterminism: the result is a deterministic
function of the inputs (the reference's output ordering is
thread-timing dependent; the weighted mean makes that immaterial).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lsdtpu import geometry as geo

PI = math.pi

U16_MAX = 65535
U8_MAX = 255


def quantize_cache(map_cache, cache_dtype: str, z_occ_max_dis: float = 1.0,
                   float_dtype=jnp.float32):
    """Optionally compress the distance field for capacity (VMEM/cache
    residency of bigger maps).

    Compression is THROUGHPUT-NEUTRAL on the bench workload - measured
    for u16 (438 vs 437 ms) and u8 (364 vs 346 ms, the convert even
    costs a little): the v5e gather-rate cliff at ~1.3-1.6 MB of table
    bytes exists for RANDOM indices (~100 vs ~65 M elem/s), but the
    scorer's indices are segment-coherent and already ride cache
    locality on the full f32 field (docs/RESULTS.md r4).  Modes:

      "f32"  - float at `float_dtype` (exact; default)
      "bf16" - bfloat16 (2 B/cell, ~3 decimal digits)
      "u16"  - fixed-point round(d / z * 65535) (2 B/cell, resolution
               z/65535 ~ 15 um at z=1 m - 256x finer than bf16)
      "u8"   - fixed-point round(d / z * 255) (1 B/cell, resolution
               z/255 ~ 3.9 mm at z=1 m - a sixth of a map cell at
               0.025 m/px; 4x the map area per byte of f32)

    Cells at/above the cap map to the top code in the compressed modes,
    preserving the reference's cap-penalty semantics (CalcScore,
    myFA.cpp:381: d >= z adds the fixed penalty, so only the at-cap
    PREDICATE must survive compression, not the cap value itself)."""
    if cache_dtype in ("f32", "default"):
        return jnp.asarray(map_cache, float_dtype)
    if cache_dtype == "bf16":
        c = jnp.asarray(map_cache, jnp.float32)
        b = c.astype(jnp.bfloat16)
        # the at-cap predicate (_dequant: v >= z) must survive rounding
        # even when bf16(z) rounds DOWN (e.g. z=0.7 -> 0.69921875):
        # force at/above-cap cells to the smallest bf16 >= z
        bz = jnp.asarray(z_occ_max_dis, jnp.bfloat16)
        bz_up = jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(bz, jnp.uint16) + 1, jnp.bfloat16)
        bz = jnp.where(bz.astype(jnp.float32) >= z_occ_max_dis, bz, bz_up)
        return jnp.where(c >= z_occ_max_dis, bz, b)
    if cache_dtype == "u16":
        q = jnp.round(jnp.clip(jnp.asarray(map_cache, jnp.float32)
                               / z_occ_max_dis, 0.0, 1.0) * U16_MAX)
        return q.astype(jnp.uint16)
    if cache_dtype == "u8":
        q = jnp.round(jnp.clip(jnp.asarray(map_cache, jnp.float32)
                               / z_occ_max_dis, 0.0, 1.0) * U8_MAX)
        return q.astype(jnp.uint8)
    raise ValueError(f"unknown cache_dtype {cache_dtype!r}")


def _dequant(vals, dt, z_occ_max_dis):
    """Gathered cache values -> (float values, at-cap predicate)."""
    if vals.dtype == jnp.uint16:
        at_cap = vals == U16_MAX
        return vals.astype(dt) * (z_occ_max_dis / U16_MAX), at_cap
    if vals.dtype == jnp.uint8:
        at_cap = vals == U8_MAX
        return vals.astype(dt) * (z_occ_max_dis / U8_MAX), at_cap
    v = vals.astype(dt)
    return v, v >= z_occ_max_dis


@dataclasses.dataclass
class Candidates:
    """Fixed-size compacted candidate set."""

    ca: jnp.ndarray        # (K,) cos(angDiff)
    sa: jnp.ndarray        # (K,) sin(angDiff)
    sx: jnp.ndarray        # (K,) scan base point
    sy: jnp.ndarray
    mx: jnp.ndarray        # (K,) map base point
    my: jnp.ndarray
    pose: jnp.ndarray      # (K, 3) transformed lidar pose (x, y, angDiff)
    mask: jnp.ndarray      # (K,)
    count: jnp.ndarray     # () int32 (pre-truncation count, for overflow checks)


jax.tree_util.register_pytree_node(
    Candidates,
    lambda c: ((c.ca, c.sa, c.sx, c.sy, c.mx, c.my, c.pose, c.mask,
                c.count), None),
    lambda _, c: Candidates(*c))


def generate_candidates(scan_lines, scan_mask, map_lines, map_mask,
                        lidar_pose, last_pose, max_candidates: int,
                        ignore_scan_length: float = 40.0,
                        scan_to_map_diff: float = 0.35,
                        max_esti_dist: float = 60.0) -> Candidates:
    """Gate + compact the (S, M, 4) hypothesis tensor
    (reference: myFA.cpp:29-41 length gates, myFA.cpp:186-235 alignment
    hypotheses, myFA.cpp:330 HMM gate)."""
    S = scan_lines.shape[0]
    M = map_lines.shape[0]
    dt = scan_lines.dtype

    s_len = scan_lines[:, geo.LEN]
    m_len = map_lines[:, geo.LEN]
    len_diff = s_len * scan_to_map_diff
    gate_len = (scan_mask & (s_len >= ignore_scan_length))[:, None] & \
        map_mask[None, :] & \
        (m_len[None, :] >= (s_len - len_diff)[:, None]) & \
        (m_len[None, :] <= (s_len + len_diff)[:, None])          # (S, M)

    # directions for both traversals of every line
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

    # hypothesis layout h=0..3 (myFA.cpp:194-235):
    #   h0: map fwd, scan fwd   h1: map fwd, scan rev
    #   h2: map rev, scan fwd   h3: map rev, scan rev
    m_ang = jnp.stack([m_fwd, m_fwd, m_rev, m_rev], -1)          # (M, 4)
    m_bx = jnp.stack([map_lines[:, geo.X1], map_lines[:, geo.X1],
                      map_lines[:, geo.X2], map_lines[:, geo.X2]], -1)
    m_by = jnp.stack([map_lines[:, geo.Y1], map_lines[:, geo.Y1],
                      map_lines[:, geo.Y2], map_lines[:, geo.Y2]], -1)
    s_ang = jnp.stack([s_fwd, s_rev, s_fwd, s_rev], -1)          # (S, 4)
    s_bx = jnp.stack([scan_lines[:, geo.X1], scan_lines[:, geo.X2],
                      scan_lines[:, geo.X1], scan_lines[:, geo.X2]], -1)
    s_by = jnp.stack([scan_lines[:, geo.Y1], scan_lines[:, geo.Y2],
                      scan_lines[:, geo.Y1], scan_lines[:, geo.Y2]], -1)

    ang_diff = m_ang[None, :, :] - s_ang[:, None, :]             # (S, M, 4)
    ca = geo.cosd(ang_diff)
    sa = geo.sind(ang_diff)
    sx = jnp.broadcast_to(s_bx[:, None, :], (S, M, 4))
    sy = jnp.broadcast_to(s_by[:, None, :], (S, M, 4))
    mx = jnp.broadcast_to(m_bx[None, :, :], (S, M, 4))
    my = jnp.broadcast_to(m_by[None, :, :], (S, M, 4))

    lx, ly = lidar_pose[0], lidar_pose[1]
    rlx = (lx - sx) * ca - (ly - sy) * sa + mx
    rly = (lx - sx) * sa + (ly - sy) * ca + my
    first = last_pose[0] == -1
    # the reference gates on sqrt(d2) < maxEstiDist (myFA.cpp:330);
    # keep the sqrt so the boundary rounding matches it bit-for-bit
    d = jnp.sqrt((rlx - last_pose[0]) ** 2 + (rly - last_pose[1]) ** 2)
    gate_hmm = first | (d < max_esti_dist)
    gate = gate_len[:, :, None] & gate_hmm

    # compact INDICES of the survivors, then gather the 9 features for
    # just the K slots (scattering the full (S*M*4, 9) feature tensor
    # costs ~9x more memory traffic).  Padded slots must be ZERO, not
    # row 0's values: degenerate padded lines yield NaN directions, and
    # a NaN pose row poisons the weighted-mean sum (0*NaN) even at
    # weight 0 - seen on all-padding tp shards.  The chunked-scatter
    # compaction's trip count covers only scan-line rows with any
    # gate-true slot (tracking frames: ~10 of the S-cap - the grid
    # scatter was the candgen cost on TPU, round-4 attribution).
    comp_idx, mask, count = geo.masked_compact_rows(
        jnp.arange(S * M * 4, dtype=jnp.int32).reshape(S, M * 4),
        gate.reshape(S, M * 4), max_candidates)
    take = lambda a: jnp.where(mask, a.reshape(-1)[comp_idx],  # noqa: E731
                               0.0)
    ang_c = take(ang_diff)
    return Candidates(
        ca=take(ca), sa=take(sa), sx=take(sx), sy=take(sy),
        mx=take(mx), my=take(my),
        pose=jnp.stack([take(rlx), take(rly),
                        jnp.where(mask, geo.wrap_deg(ang_c), 0.0)], -1),
        mask=mask, count=count.astype(jnp.int32))


def score_candidates(cand: Candidates, pixels, pixels_mask, map_cache,
                     rows=None, cols=None,
                     z_occ_max_dis: float = 1.0,
                     max_dist_penalty: float = 10.0,
                     valid_ratio: float = 0.7,
                     chunk: int = 64,
                     pixel_chunk: int = 512,
                     dynamic_chunks: bool = True,
                     obstacle_tolerance: float = 0.0,
                     obstacle_min_dist: float = None,
                     coarse=None,
                     prune_accept: float = None,
                     prune_block: int = 16,
                     prune_group: int = 16,
                     prune_min_live: int = 0,
                     window: int = 0,
                     window_center=None,
                     scan_radius=None,
                     window_gate: float = 60.0) -> jnp.ndarray:
    """Score every candidate against the mapCache prior
    (reference: CalcScore, myFA.cpp:357-396).

    With `coarse` (from coarse_field) and `prune_accept` both given
    (and dynamic_chunks on), dispatches to score_candidates_pruned -
    identical outputs, bound-pruned execution.  prune_min_live > 0
    gates that dispatch behind a lax.cond on the live candidate count:
    small tracking-frame sweeps take the plain path (the bound would
    cost more than it saves there), big relock sweeps take the pruned
    path - rollout outputs are identical either way.

    window > 0 (EXPERIMENTAL, config match.score_window) with
    window_center (last_pose[:2]) and scan_radius (max live-pixel
    distance from the rounded lidar pose): the plain path gathers from
    a (window, window) cut of the field around the center instead of
    the whole map - identical outputs, because every candidate passed
    the HMM gate (its transformed lidar pose is within window_gate of
    the center, myFA.cpp:330) and rigidity bounds each pixel within
    scan_radius of that pose, so a per-frame scalar cond takes the
    window only when window_gate + scan_radius + margin fits inside
    half the window (else: the full-field path; relock frames always
    fall back via the center's -1 sentinel).  The win is the v5e
    gather-rate cliff at ~1.3-1.6 MB of table bytes (RESULTS.md r4):
    a 768x768 u16 window sits on the fast side of it.

    pixels: (P, 2) int32 scan-local pixel coords, pixels_mask: (P,).
    PRECONDITION (with ``dynamic_chunks``, the default): pixels_mask
    must be a PREFIX mask - all live pixels compacted to the front, as
    scan/featurize.masked_compact produces.  Dynamic pixel chunking
    only executes ceil(n_live/pixel_chunk) leading chunks; live pixels
    past that prefix would be silently skipped.  Pass
    ``dynamic_chunks=False`` to score an arbitrary (non-prefix) mask.
    rows/cols: true map extent (traced); defaults to map_cache.shape -
    pass explicitly when the cache is padded to a common batch canvas.
    Returns (K,) scores (inf where gated/invalid).

    The (K, P) transform+gather+reduce is evaluated in K-chunks so the
    intermediate stays small; XLA fuses the rigid transform and penalty
    math into the gather consumer.  With ``dynamic_chunks`` (default)
    only ceil(count/chunk) chunks execute per frame - a bounded
    fori_loop whose trip count follows the LIVE candidate count, so a
    tracking frame (tens of survivors) does ~1 chunk of work instead of
    the full K cap, with bitwise-identical results (every live
    candidate is inside the looped prefix; the rest are masked to inf
    either way).

    Implemented as the row0=0, full-height case of
    score_candidates_partial + finalize_scores: the partial-sum body
    with a whole-field "block" computes the identical (sum_d, n_valid)
    (the extra block-row bound iy < pad_rows is implied by iy < rows),
    so the replicated and mp-sharded paths share one scoring kernel.
    """
    if coarse is not None and prune_accept is not None and dynamic_chunks:
        def pruned():
            return score_candidates_pruned(
                cand, pixels, pixels_mask, map_cache, coarse,
                rows=rows, cols=cols, z_occ_max_dis=z_occ_max_dis,
                max_dist_penalty=max_dist_penalty, valid_ratio=valid_ratio,
                chunk=chunk, pixel_chunk=pixel_chunk,
                obstacle_tolerance=obstacle_tolerance,
                obstacle_min_dist=obstacle_min_dist,
                prune_accept=prune_accept, prune_block=prune_block,
                prune_group=prune_group)

        if not prune_min_live:
            return pruned()

        def plain():
            return score_candidates(
                cand, pixels, pixels_mask, map_cache, rows=rows,
                cols=cols, z_occ_max_dis=z_occ_max_dis,
                max_dist_penalty=max_dist_penalty,
                valid_ratio=valid_ratio, chunk=chunk,
                pixel_chunk=pixel_chunk, dynamic_chunks=dynamic_chunks,
                obstacle_tolerance=obstacle_tolerance,
                obstacle_min_dist=obstacle_min_dist,
                window=window, window_center=window_center,
                scan_radius=scan_radius, window_gate=window_gate)

        return jax.lax.cond(cand.count >= prune_min_live, pruned, plain)
    pad_rows, pad_cols = map_cache.shape
    if rows is None:
        rows = pad_rows
    if cols is None:
        cols = pad_cols
    dt = cand.ca.dtype
    n_all = jnp.sum(pixels_mask).astype(dt)

    def _finalize(parts):
        sum_d, n_valid, sum_far, n_far = parts
        return finalize_scores(cand, sum_d, n_valid, n_all,
                               sum_far=sum_far, n_far=n_far,
                               max_dist_penalty=max_dist_penalty,
                               valid_ratio=valid_ratio,
                               obstacle_tolerance=obstacle_tolerance)

    def full_field():
        return _finalize(score_candidates_partial(
            cand, pixels, pixels_mask, map_cache, 0, rows, cols,
            z_occ_max_dis=z_occ_max_dis,
            max_dist_penalty=max_dist_penalty,
            chunk=chunk, pixel_chunk=pixel_chunk,
            dynamic_chunks=dynamic_chunks,
            obstacle_min_dist=obstacle_min_dist))

    use_win = (window and dynamic_chunks and window_center is not None
               and scan_radius is not None
               and pad_rows >= window and pad_cols >= window)
    if not use_win:
        return full_field()

    def windowed():
        half = window // 2
        wy0 = jnp.clip(geo.c_round(window_center[1]).astype(jnp.int32)
                       - half, 0, pad_rows - window)
        wx0 = jnp.clip(geo.c_round(window_center[0]).astype(jnp.int32)
                       - half, 0, pad_cols - window)
        win = jax.lax.dynamic_slice(map_cache, (wy0, wx0),
                                    (window, window))
        return _finalize(score_candidates_partial(
            cand, pixels, pixels_mask, win, wy0, rows, cols,
            z_occ_max_dis=z_occ_max_dis,
            max_dist_penalty=max_dist_penalty,
            chunk=chunk, pixel_chunk=pixel_chunk,
            dynamic_chunks=dynamic_chunks,
            obstacle_min_dist=obstacle_min_dist, col0=wx0))

    # coverage proof margin: |pixel - center| < window_gate +
    # scan_radius + 0.5 (index rounding); fits demands 2 px of slack
    # inside the half-window (see docstring soundness argument)
    need = window_gate + scan_radius + 2.0
    fits = (window_center[0] != -1) & (need <= window // 2 - 2)
    return jax.lax.cond(fits, windowed, full_field)


def _check_obstacle_min_dist(obstacle_min_dist, z_occ_max_dis):
    if obstacle_min_dist is None:
        return z_occ_max_dis
    if not 0.0 < obstacle_min_dist <= z_occ_max_dis:
        # above the cap it silently degenerates to cap-only forgiveness
        # (cache values never exceed the cap); <= 0 would forgive every
        # in-map pixel - both are config mistakes, reject loudly
        raise ValueError(
            f"obstacle_min_dist={obstacle_min_dist} must be in "
            f"(0, z_occ_max_dis={z_occ_max_dis}]")
    return obstacle_min_dist


def _make_part_all(pixels, pixels_mask, cache_block, row0, rows, cols,
                   z_occ_max_dis, max_dist_penalty, pixel_chunk,
                   dynamic_chunks, obstacle_min_dist, dt, col0=0):
    """Build the fused transform+gather+reduce over one candidate chunk:
    part_all(args6) -> (sum_d, n_valid, sum_far, n_far), each (C,).
    Shared by the chunked partial scorer (score_candidates_partial),
    the pruned scorer (score_candidates_pruned), and the windowed
    scorer (col0 != 0 rebases columns into a window cut from the
    field) so every path computes bit-identical per-candidate partials
    (CalcScore, myFA.cpp:357-396)."""
    block_h, pad_cols = cache_block.shape
    px = pixels[:, 0].astype(dt)
    py = pixels[:, 1].astype(dt)
    cache_flat = cache_block.reshape(-1)

    def part_chunk(args, pxs, pys, pms):
        ca, sa, sx, sy, mx, my = args
        tx = (pxs[None, :] - sx[:, None]) * ca[:, None] - \
            (pys[None, :] - sy[:, None]) * sa[:, None] + mx[:, None]
        ty = (pxs[None, :] - sx[:, None]) * sa[:, None] + \
            (pys[None, :] - sy[:, None]) * ca[:, None] + my[:, None]
        ix = geo.c_round(tx).astype(jnp.int32)
        iy = geo.c_round(ty).astype(jnp.int32)
        inside = (ix >= 0) & (ix < cols) & (iy >= 0) & (iy < rows) & \
            (iy >= row0) & (iy < row0 + block_h) & \
            (ix >= col0) & (ix < col0 + pad_cols) & pms[None, :]
        loc = jnp.clip(iy - row0, 0, block_h - 1) * pad_cols + \
            jnp.clip(ix - col0, 0, pad_cols - 1)
        vals, at_cap = _dequant(
            jnp.take(cache_flat, loc.reshape(-1)).reshape(loc.shape),
            dt, z_occ_max_dis)
        contrib = jnp.where(at_cap, max_dist_penalty, vals)
        sum_d = jnp.sum(jnp.where(inside, contrib, 0.0), axis=1)
        n_valid = jnp.sum(inside, axis=1).astype(dt)
        far = inside & (at_cap | (vals >= obstacle_min_dist))
        sum_far = jnp.sum(jnp.where(far, contrib, 0.0), axis=1)
        n_far = jnp.sum(far, axis=1).astype(dt)
        return sum_d, n_valid, sum_far, n_far

    # dynamic PIXEL chunking: live pixels sit in a compacted prefix
    # (scan/featurize.py masked_compact), so only ceil(n_live/pc)
    # pixel chunks carry work - the TPU gather is element-bound
    # (~134M gathered elements/s measured on the v5e), so skipping
    # masked pixels/candidates is the first-order cost lever.  The
    # skipped chunks' partials are exactly 0; chunked accumulation
    # changes only the f32 reduction tree (<=ulp-level, same tier as
    # the XLA reduce order itself).
    P = px.shape[0]
    use_pc = bool(pixel_chunk) and dynamic_chunks and P > pixel_chunk
    if use_pc:
        n_pc = -(-P // pixel_chunk)
        ppad = n_pc * pixel_chunk - P
        pxp = jnp.concatenate([px, jnp.zeros((ppad,), dt)]) if ppad else px
        pyp = jnp.concatenate([py, jnp.zeros((ppad,), dt)]) if ppad else py
        pmp = jnp.concatenate([pixels_mask,
                               jnp.zeros((ppad,), bool)]) if ppad \
            else pixels_mask
        live_pc = (jnp.sum(pixels_mask).astype(jnp.int32)
                   + pixel_chunk - 1) // pixel_chunk

    def part_all(args):
        if not use_pc:
            return part_chunk(args, px, py, pixels_mask)

        def pbody(j, acc):
            sl = lambda a: jax.lax.dynamic_slice_in_dim(  # noqa: E731
                a, j * pixel_chunk, pixel_chunk)
            parts = part_chunk(args, sl(pxp), sl(pyp), sl(pmp))
            return tuple(a + p for a, p in zip(acc, parts))

        z = jnp.zeros((args[0].shape[0],), dt)
        return jax.lax.fori_loop(0, live_pc, pbody, (z, z, z, z))

    return part_all, part_chunk


def score_candidates_partial(cand: Candidates, pixels, pixels_mask,
                             cache_block, row0, rows, cols,
                             z_occ_max_dis: float = 1.0,
                             max_dist_penalty: float = 10.0,
                             chunk: int = 64,
                             pixel_chunk: int = 512,
                             dynamic_chunks: bool = True,
                             obstacle_min_dist: float = None,
                             col0=0):
    """Map-block-sharded partial scoring: this device owns cache rows
    [row0, row0 + block_h) of the global field (and, for the windowed
    scorer, columns [col0, col0 + block_w)).  Returns per-candidate
    (sum_d, n_valid, sum_far, n_far) partial sums - plain additive
    reductions over the pixel axis, so a psum over the map axis
    reproduces score_candidates exactly (the TPU-native form of
    sharding the mapCache prior across hosts, SURVEY.md 5.7c/5.8).

    PRECONDITION (with ``dynamic_chunks``, the default): pixels_mask
    must be a prefix mask (see score_candidates).

    sum_far/n_far aggregate the in-map pixels whose field distance is
    >= obstacle_min_dist (default: the cap, i.e. exactly the
    reference's sumMaxDist population, myFA.cpp:381): the score mass a
    dynamic obstacle would contribute.  finalize_scores only reads
    them in the opt-in obstacle-tolerant mode; they ride the same
    fused pass for free (two extra masked reductions on values already
    gathered)."""
    if chunk < 1:
        raise ValueError(f"match.score_chunk={chunk} must be >= 1")
    if pixel_chunk < 0:
        raise ValueError(
            f"match.score_pixel_chunk={pixel_chunk} must be >= 0 "
            "(0 disables pixel chunking)")
    dt = cand.ca.dtype
    obstacle_min_dist = _check_obstacle_min_dist(obstacle_min_dist,
                                                 z_occ_max_dis)

    K = cand.ca.shape[0]
    n_chunks = -(-K // chunk) if K > chunk else 1
    part_all, part_chunk = _make_part_all(
        pixels, pixels_mask, cache_block, row0, rows, cols,
        z_occ_max_dis, max_dist_penalty, pixel_chunk, dynamic_chunks,
        obstacle_min_dist, dt, col0=col0)

    args = (cand.ca, cand.sa, cand.sx, cand.sy, cand.mx, cand.my)
    if n_chunks > 1:
        Kp = n_chunks * chunk
        args = jax.tree.map(
            lambda a: jnp.concatenate(
                [a, jnp.zeros((Kp - K,), a.dtype)]
            ).reshape(n_chunks, chunk), args)
        if dynamic_chunks:
            # skipped chunks hold only masked candidates; (0, 0)
            # partials keep the psum reduction exact (finalize_scores
            # masks them to inf regardless)
            n_live = jnp.clip(cand.count, 0, K)
            live_chunks = (n_live + chunk - 1) // chunk

            def body(i, bufs):
                parts = part_all(jax.tree.map(lambda a: a[i], args))
                return tuple(
                    jax.lax.dynamic_update_slice_in_dim(b, p, i * chunk, 0)
                    for b, p in zip(bufs, parts))

            zeros = jnp.zeros((Kp,), dt)
            parts = jax.lax.fori_loop(0, live_chunks, body,
                                      (zeros, zeros, zeros, zeros))
        else:
            # use_pc is off here (dynamic_chunks=False), so part_all is
            # exactly the full-pixel part_chunk
            parts = jax.lax.map(part_all, args)
        return tuple(p.reshape(-1)[:K] for p in parts)
    return part_all(args)


def coarse_field(map_cache, block: int = 16):
    """Min-pooled + 3x3-eroded coarse distance field for the pruning
    bound (round 4; loop-invariant - compute ONCE per rollout, outside
    the frame scan, and thread it in: XLA does not hoist the pool out
    of a lax.scan body, measured).

    Dlow[u, v] = min of map_cache over blocks (u+-1, v+-1), so
    Dlow[u, v] <= cache[y, x] for EVERY cell whose block index is
    within one of (u, v) - i.e. every cell within `block` px of any
    point of block (u, v) (floor(a/B) and floor(b/B) differ by <= 1
    when |a - b| <= B).  Out-of-grid neighbors contribute the identity
    (+inf / the top u16 code): no cells live there.  Works on the raw
    stored field (f32/bf16/u16 codes): min over codes is min over
    values for the nonneg fixed-point encoding, so the gathered code
    dequants exactly like a pixel gather (_dequant)."""
    if map_cache.dtype == jnp.uint16:
        init = np.uint16(U16_MAX)
    elif map_cache.dtype == jnp.uint8:
        init = np.uint8(U8_MAX)
    else:
        init = np.asarray(np.inf, map_cache.dtype)
    p = jax.lax.reduce_window(map_cache, init, jax.lax.min,
                              (block, block), (block, block), "SAME")
    return jax.lax.reduce_window(p, init, jax.lax.min,
                                 (3, 3), (1, 1), "SAME")


def _group_stats(pixels, pixels_mask, group: int, dt):
    """Per-group centroid / radius / live count of the compacted scan
    pixel cloud, groups of `group` CONSECUTIVE slots (consecutive
    pixels rasterize adjacent map cells, so groups are spatially tight
    - small radii keep the bound sharp).  Rigid transforms preserve
    the centroid distance, so the stats are computed once per frame in
    scan coordinates and reused by every candidate."""
    P = pixels.shape[0]
    pad = (-P) % group
    px = pixels[:, 0].astype(dt)
    py = pixels[:, 1].astype(dt)
    m = pixels_mask
    if pad:
        px = jnp.concatenate([px, jnp.zeros((pad,), dt)])
        py = jnp.concatenate([py, jnp.zeros((pad,), dt)])
        m = jnp.concatenate([m, jnp.zeros((pad,), bool)])
    G = px.shape[0] // group
    px = px.reshape(G, group)
    py = py.reshape(G, group)
    m = m.reshape(G, group)
    n = jnp.sum(m, axis=1).astype(dt)
    den = jnp.maximum(n, 1.0)
    cx = jnp.sum(jnp.where(m, px, 0.0), axis=1) / den
    cy = jnp.sum(jnp.where(m, py, 0.0), axis=1) / den
    r = jnp.max(jnp.where(m, jnp.sqrt((px - cx[:, None]) ** 2
                                      + (py - cy[:, None]) ** 2), 0.0),
                axis=1)
    return cx, cy, r, n


def _chunk_bound(args, gs, coarse_flat, coarse_w, coarse_h, block,
                 rows, cols, z_occ_max_dis, max_dist_penalty,
                 obstacle_tolerance, valid_ratio, n_all, dt):
    """Provable per-candidate lower bound on the CalcScore of one
    candidate chunk (C,) from the (G,) group stats.

    Soundness (score = sum_d/n_valid + pen*(n_all-n_valid)/n_all,
    myFA.cpp:357-396):
      * a group PROVEN fully in-map (centroid box test with margin r;
        rounding moves a pixel by <= 0.5, covered by the +-1-block
        erosion when r + 0.5 <= block) has every pixel contribution
        >= clow = (at-cap ? pen : Dlow), so sum_d >= S_low =
        sum(n_g * clow_g) over proven groups, and sum_d/n_valid >=
        S_low/n_all since n_valid <= n_all;
      * a group PROVEN fully out-of-map adds pen*n_g/n_all to the
        second term (n_all - n_valid >= O = sum of proven-out counts),
        and if O alone breaks the validity gate the score is inf;
      * with obstacle_tolerance t > 0 the robust score removes at most
        forgiven*mean_far <= t*n_all*pen from the numerator over a
        denominator <= n_all, so bound - pen*t stays a lower bound
        (numerator is provably >= 0: frac <= 1 and sum_far <= sum_d).
    Unproven groups contribute 0 - always sound, only less sharp."""
    ca, sa, sx, sy, mx, my = args
    cx, cy, r, n = gs
    tx = (cx[None, :] - sx[:, None]) * ca[:, None] - \
        (cy[None, :] - sy[:, None]) * sa[:, None] + mx[:, None]
    ty = (cx[None, :] - sx[:, None]) * sa[:, None] + \
        (cy[None, :] - sy[:, None]) * ca[:, None] + my[:, None]
    rr = r[None, :]
    live = n[None, :] > 0
    in_ok = live & (rr + 0.5 <= block) & \
        (tx - rr >= 0) & (tx + rr <= cols - 1) & \
        (ty - rr >= 0) & (ty + rr <= rows - 1)
    out_ok = live & ((tx + rr <= -1) | (tx - rr >= cols) |
                     (ty + rr <= -1) | (ty - rr >= rows))
    ub = jnp.clip((ty / block).astype(jnp.int32), 0, coarse_h - 1)
    vb = jnp.clip((tx / block).astype(jnp.int32), 0, coarse_w - 1)
    vals, at_cap = _dequant(
        jnp.take(coarse_flat, (ub * coarse_w + vb).reshape(-1)
                 ).reshape(ub.shape), dt, z_occ_max_dis)
    clow = jnp.where(at_cap, max_dist_penalty, vals)
    s_low = jnp.sum(jnp.where(in_ok, n[None, :] * clow, 0.0), axis=1)
    o = jnp.sum(jnp.where(out_ok, n[None, :], 0.0), axis=1)
    bound = jnp.maximum(
        s_low / n_all - max_dist_penalty * obstacle_tolerance, 0.0) + \
        max_dist_penalty * o / n_all
    return jnp.where(o > (1.0 - valid_ratio) * n_all, jnp.inf, bound)


def score_candidates_pruned(cand: Candidates, pixels, pixels_mask,
                            map_cache, coarse, rows=None, cols=None,
                            z_occ_max_dis: float = 1.0,
                            max_dist_penalty: float = 10.0,
                            valid_ratio: float = 0.7,
                            chunk: int = 64,
                            pixel_chunk: int = 512,
                            obstacle_tolerance: float = 0.0,
                            obstacle_min_dist: float = None,
                            prune_accept: float = 3.0,
                            prune_block: int = 16,
                            prune_group: int = 16) -> jnp.ndarray:
    """score_candidates with exact bound-based pruning (round 4).

    Identical rollout outputs to score_candidates, cheaper execution:
    every live candidate first gets the _chunk_bound lower bound (a
    (C, G) coarse gather, ~12x fewer gathered elements than the exact
    (C, P) sweep); candidates whose bound already fails prune_accept
    can never be accepted (the reference stores only score < 3,
    myFA.cpp:261-265, and the first-frame argmin / relock ambiguity
    also read accepted candidates only), so they skip the exact pass.
    Survivor INDICES are compacted and the exact loop's trip count
    follows the survivor count; partials scatter back to their slots,
    so each survivor's (sum_d, n_valid, ...) reduction is bit-identical
    to the unpruned path.  Pruned candidates finalize to a score that
    is either inf (never scored: 0-partials fail the validity gate) or
    their true score >= prune_accept (the last chunk's index padding
    re-scores slot 0) - both are rejected by every downstream consumer
    exactly like their true score would be.

    PRECONDITIONS: pixels_mask is a prefix mask; `coarse` comes from
    coarse_field(map_cache, prune_block) on the SAME stored field.
    Requires the full-height field (no mp map-block sharding)."""
    pad_rows, pad_cols = map_cache.shape
    if rows is None:
        rows = pad_rows
    if cols is None:
        cols = pad_cols
    dt = cand.ca.dtype
    obstacle_min_dist = _check_obstacle_min_dist(obstacle_min_dist,
                                                 z_occ_max_dis)
    part_all, _ = _make_part_all(
        pixels, pixels_mask, map_cache, 0, rows, cols,
        z_occ_max_dis, max_dist_penalty, pixel_chunk, True,
        obstacle_min_dist, dt)
    n_all = jnp.sum(pixels_mask).astype(dt)
    gs = _group_stats(pixels, pixels_mask, prune_group, dt)
    coarse_h, coarse_w = coarse.shape
    coarse_flat = coarse.reshape(-1)

    K = cand.ca.shape[0]
    n_chunks = -(-K // chunk)
    Kp = n_chunks * chunk
    flat = jax.tree.map(
        lambda a: jnp.concatenate([a, jnp.zeros((Kp - K,), a.dtype)])
        if Kp > K else a,
        (cand.ca, cand.sa, cand.sx, cand.sy, cand.mx, cand.my))
    chunked = jax.tree.map(lambda a: a.reshape(n_chunks, chunk), flat)

    # phase 1: bounds for the live candidate prefix
    n_live = jnp.clip(cand.count, 0, K)
    live_chunks = (n_live + chunk - 1) // chunk

    def bbody(i, buf):
        b = _chunk_bound(jax.tree.map(lambda a: a[i], chunked), gs,
                         coarse_flat, coarse_w, coarse_h, prune_block,
                         rows, cols, z_occ_max_dis, max_dist_penalty,
                         obstacle_tolerance, valid_ratio, n_all, dt)
        return jax.lax.dynamic_update_slice_in_dim(buf, b, i * chunk, 0)

    bounds = jax.lax.fori_loop(0, live_chunks, bbody,
                               jnp.full((Kp,), jnp.inf, dt))
    maybe = (bounds[:K] < prune_accept) & cand.mask

    # phase 2: exact partials for the compacted survivors only
    surv_idx, _sm, n_surv = geo.masked_compact(
        jnp.arange(K, dtype=jnp.int32), maybe, K)
    surv_idx = jnp.concatenate(
        [surv_idx, jnp.zeros((Kp - K,), jnp.int32)]) if Kp > K else surv_idx
    surv_chunks = (jnp.clip(n_surv, 0, K) + chunk - 1) // chunk

    def ebody(i, bufs):
        idx = jax.lax.dynamic_slice_in_dim(surv_idx, i * chunk, chunk)
        parts = part_all(jax.tree.map(lambda a: a[idx], flat))
        return tuple(b.at[idx].set(p) for b, p in zip(bufs, parts))

    zeros = jnp.zeros((Kp,), dt)
    parts = jax.lax.fori_loop(0, surv_chunks, ebody,
                              (zeros, zeros, zeros, zeros))
    sum_d, n_valid, sum_far, n_far = (p[:K] for p in parts)
    return finalize_scores(cand, sum_d, n_valid, n_all,
                           sum_far=sum_far, n_far=n_far,
                           max_dist_penalty=max_dist_penalty,
                           valid_ratio=valid_ratio,
                           obstacle_tolerance=obstacle_tolerance)


def finalize_scores(cand: Candidates, sum_d, n_valid, n_all,
                    sum_far=None, n_far=None,
                    max_dist_penalty: float = 10.0,
                    valid_ratio: float = 0.7,
                    obstacle_tolerance: float = 0.0):
    """Apply the CalcScore formula + gates to (psum-reduced) partials.

    obstacle_tolerance (opt-in, config match.obstacle_tolerance; no
    reference equivalent): forgive up to this fraction of the scan's
    pixels when they land far from every wall (field distance >=
    obstacle_min_dist, default the cap) - i.e. treat them as dynamic
    obstacles (people, unmapped furniture) rather than map
    disagreement: a forgiven pixel drops out of the score mean instead
    of charging the distance/penalty the reference does (CalcScore,
    myFA.cpp:381).  When the far population exceeds the budget
    tol*n_all, the forgiven fraction of the far mass is removed
    proportionally (all far contributions sit above the threshold, so
    this is a smooth lower bound on worst-first trimming that needs no
    per-candidate sort).  The counts come from the globally reduced
    partials, so the robust score stays exact under tp/mp sharding
    (everything remains additive partials + one elementwise finalize).
    0.0 (default) is bitwise the reference formula; capped at 0.5 so
    the validity gate (0.7) keeps the denominator strictly positive."""
    if not 0.0 <= obstacle_tolerance <= 0.5:
        raise ValueError("obstacle_tolerance must be in [0, 0.5], got "
                         f"{obstacle_tolerance}")
    if obstacle_tolerance > 0.0:
        if sum_far is None or n_far is None:
            raise ValueError(
                "obstacle_tolerance > 0 requires the sum_far/n_far "
                "partials from score_candidates_partial")
        forgiven = jnp.minimum(n_far, obstacle_tolerance * n_all)
        frac = forgiven / jnp.maximum(n_far, 1.0)
        denom = n_valid - forgiven
        # denom > 0 is guaranteed only for gate-passing candidates at
        # the default valid_ratio (0.7 > tol cap 0.5); with a
        # user-lowered valid_ratio a fully-forgiven candidate would be
        # 0/0 = NaN and NaN passes the gate below - such a candidate
        # carries no information, so it is explicitly inf
        score = jnp.where(
            denom > 0,
            (sum_d - frac * sum_far) / jnp.maximum(denom, 1e-9) +
            max_dist_penalty * (n_all - n_valid) / n_all,
            jnp.inf)
    else:
        score = sum_d / n_valid + \
            max_dist_penalty * (n_all - n_valid) / n_all
    score = jnp.where(n_valid < valid_ratio * n_all, jnp.inf, score)
    return jnp.where(cand.mask, score, jnp.inf)


def fuse(cand: Candidates, scores, score_accept: float = 3.0,
         axis_name: str | None = None, score_floor: float = 0.0
         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Accept (score < 3) and fuse candidates.

    Returns (pose_weighted (3,), fused_score, pose_argmin (3,),
    min_score, n_accepted): the weighted mean path for tracking frames
    (myFA.cpp:159-171) and the argmin path for HMM-chain first frames
    (myFA.cpp:96-108).

    With `axis_name`, candidates are sharded across that mesh axis (map-
    line tensor parallelism): the weighted mean is a plain sum reduction
    so a psum of (sum_w, sum_pose, n) reproduces the single-device result
    exactly; the argmin is a pmin with lowest-rank tie-breaking.

    score_floor: 0.0 (faithful default) reproduces the reference's
    IEEE behavior on a PERFECT candidate - 1/pow(0,2) = inf weight
    (myFA.cpp:161), fused pose inf/inf = NaN, next frame's NaN HMM
    distances reject everything (myFA.cpp:330) and tracking resets
    to a global relock.  A perfect match destroying tracking is a
    reference BUG; cfg.faithful=False clamps scores to this floor in
    the weights so a perfect candidate dominates the mean (w =
    1/floor^2) without poisoning it (runtime/loop.py wires 1e-6).
    """
    acc = scores < score_accept
    if score_floor > 0.0:
        w_scores = jnp.maximum(scores, jnp.asarray(score_floor,
                                                   scores.dtype))
    else:
        w_scores = scores
    w = jnp.where(acc, 1.0 / (w_scores * w_scores), 0.0)
    sum_w = jnp.sum(w)
    sum_pose = jnp.sum(cand.pose * w[:, None], axis=0)
    n_acc = jnp.sum(acc)
    masked = jnp.where(acc, scores, jnp.inf)
    best = jnp.argmin(masked)
    min_score = masked[best]
    pose_min = cand.pose[best]
    if axis_name is not None:
        sum_w = jax.lax.psum(sum_w, axis_name)
        sum_pose = jax.lax.psum(sum_pose, axis_name)
        n_acc = jax.lax.psum(n_acc, axis_name)
        g_min = jax.lax.pmin(min_score, axis_name)
        n_dev = jax.lax.axis_size(axis_name)
        rank = jax.lax.axis_index(axis_name)
        owner = jax.lax.pmin(jnp.where(min_score == g_min, rank, n_dev),
                             axis_name)
        pose_min = jax.lax.psum(
            jnp.where(rank == owner, pose_min, jnp.zeros_like(pose_min)),
            axis_name)
        min_score = g_min
    pose_w = sum_pose / sum_w
    fused_score = 1.0 / jnp.sqrt(sum_w / n_acc)
    return pose_w, fused_score, pose_min, min_score, n_acc


def relock_ambiguity(cand: Candidates, scores, pose_min, min_score,
                     min_dist: float = 60.0, margin: float = 0.2,
                     min_ang: float = 45.0, score_accept: float = 3.0,
                     axis_name: str | None = None):
    """Second-mode detection for the global relocalization path
    (opt-in, config match.relock_margin; no reference equivalent).

    The reference relocks on the min-score candidate with the HMM gate
    open (myFA.cpp:96-108,330); in symmetric environments (twin rooms,
    repeating bays, a bare rectangle's 180-degree self-symmetry)
    several DISTINCT hypotheses score almost identically and the
    argmin is an arbitrary pick - a wrong lock that then anchors the
    HMM chain.  This returns True when some accepted candidate
    separated from the winner by more than min_dist px OR min_ang
    degrees scores within (1+margin) of it, i.e. the score landscape
    is multimodal at relock scale; the caller defers the lock and
    retries next frame.  Under tp sharding pose_min/min_score are the
    globally-reduced winners and the far-mode min distributes via
    pmin."""
    d2 = jnp.sum((cand.pose[:, :2] - pose_min[None, :2]) ** 2, axis=1)
    dang = geo.wrap_deg(cand.pose[:, 2] - pose_min[2])
    apart = (d2 > min_dist * min_dist) | (jnp.abs(dang) > min_ang)
    far = (scores < score_accept) & apart
    second = jnp.min(jnp.where(far, scores, jnp.inf))
    if axis_name is not None:
        second = jax.lax.pmin(second, axis_name)
    return second <= min_score * (1.0 + margin)
