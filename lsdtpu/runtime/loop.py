"""Per-frame localization step and full-sequence rollout, compiled for TPU.

TPU-native replacement for the reference driver loop (reference:
LSD/main_on_windows.cpp:105-185).  The whole per-frame pipeline -
scan featurization, candidate generation, dense scoring, fusion, driver
state machine and UKF - is one jitted function; a sequence is a single
`lax.scan` over stacked frames, so an entire trajectory runs on-device
with no host round-trips.  Batching over sequences is `vmap`
(runtime/batch.py); multi-chip sharding is `shard_map` (runtime/shard.py).

Faithful-mode quirks (config.faithful):
  * odometry rotation bug ScanPose.y = ty*sind(th) + ty*cosd(th)
    (main_on_windows.cpp:151);
  * the is_offset 360-degree angle fix triggered on frame 1
    (main_on_windows.cpp:165-172).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lsdtpu import geometry as geo
from lsdtpu.config import EngineConfig, DEFAULT
from lsdtpu.filter import ukf as fukf
from lsdtpu.match import associate as assoc
from lsdtpu.match import polish
from lsdtpu.scan.featurize import featurize


@dataclasses.dataclass
class MapContext:
    """Per-map static inputs for the online loop.

    rows/cols are the TRUE map dims as traced scalars: cache may be
    padded to a common canvas when batching maps, and the reference's
    in-map bounds test (myFA.cpp:372) must use the real extent.
    """

    lines: jnp.ndarray       # (M, 10)
    lines_mask: jnp.ndarray  # (M,)
    cache: jnp.ndarray       # (H, W) distance field (meters, capped)
    rows: jnp.ndarray        # () int32 true height
    cols: jnp.ndarray        # () int32 true width
    resol: jnp.ndarray       # () scalars
    ori_x: jnp.ndarray
    ori_y: jnp.ndarray


jax.tree_util.register_pytree_node(
    MapContext,
    lambda m: ((m.lines, m.lines_mask, m.cache, m.rows, m.cols, m.resol,
                m.ori_x, m.ori_y), None),
    lambda _, c: MapContext(*c))


@dataclasses.dataclass
class TrackState:
    """Driver + filter carry (the reference's main()-local state)."""

    kalman_x: jnp.ndarray    # (9,)
    kalman_P: jnp.ndarray    # (9, 9)
    last_pose: jnp.ndarray   # (3,)
    ang_sum: jnp.ndarray     # () running sum of angRotate
    ang_cnt: jnp.ndarray     # () int32
    is_offset: jnp.ndarray   # () bool
    frame: jnp.ndarray       # () int32, 1-based after first step
    lost_streak: jnp.ndarray  # () int32 consecutive no-candidate frames


jax.tree_util.register_pytree_node(
    TrackState,
    lambda s: ((s.kalman_x, s.kalman_P, s.last_pose, s.ang_sum, s.ang_cnt,
                s.is_offset, s.frame, s.lost_streak), None),
    lambda _, c: TrackState(*c))


def init_state(dtype=jnp.float32) -> TrackState:
    return TrackState(
        kalman_x=jnp.asarray(fukf.RESET_X, dtype),
        kalman_P=jnp.asarray(fukf.RESET_P, dtype),
        last_pose=jnp.array([-1.0, -1.0, 0.0], dtype),
        ang_sum=jnp.zeros((), dtype),
        ang_cnt=jnp.zeros((), jnp.int32),
        is_offset=jnp.zeros((), jnp.bool_),
        frame=jnp.zeros((), jnp.int32),
        lost_streak=jnp.zeros((), jnp.int32))


def reset_carry(carry: TrackState, fr: dict) -> TrackState:
    """Corpus-replay re-initialization (batch.stack_concat): a True
    "reset" flag marks the first frame of a concatenated sequence - the
    carry is replaced by the initial state, so every sequence's rollout
    is bitwise the rollout it would get standalone.  Shared by the
    sequential, sharded, and temporal runners (a semantics change here
    changes all three together)."""
    if "reset" in fr:
        init = init_state(fr["ranges"].dtype)
        carry = jax.tree.map(
            lambda a, b: jnp.where(fr["reset"], a, b), init, carry)
    return carry


def featurize_stage(frame_inputs, ctx: MapContext,
                    cfg: EngineConfig = DEFAULT):
    """Pipeline stage A: scan featurization only (L3 of the reference).
    frame_inputs: (ranges, angles, valid, n, odom_prev, odom_cur)."""
    ranges, angles, valid, n, _op, _oc = frame_inputs
    sh = cfg.shapes
    return featurize(ranges, angles, valid, n, ctx.resol, ctx.ori_x,
                     ctx.ori_y,
                     least_point=cfg.rdp.least_point,
                     thre_line=cfg.rdp.thre_line,
                     least_dist=cfg.rdp.least_dist,
                     max_lines=sh.max_scan_lines,
                     max_pixels=sh.max_scan_pixels,
                     max_steps=sh.max_scan_steps)


def localization_step(state: TrackState, frame_inputs, ctx: MapContext,
                      cfg: EngineConfig = DEFAULT,
                      tp_axis: Optional[str] = None,
                      mp_axis: Optional[str] = None,
                      coarse=None) -> Tuple[TrackState, dict]:
    """One frame: featurize + associate + fuse + UKF + driver state update.

    frame_inputs: (ranges (N,), angles (N,), valid (N,), n (),
                   odom_prev (3,), odom_cur (3,)).
    coarse: optional precomputed pruning field (prepare_coarse) -
    LOOP-INVARIANT, so sequence runners compute it once outside their
    frame scan; None (or cfg.match.prune off) scores unpruned.
    Returns (new_state, outputs dict).
    """
    fs = featurize_stage(frame_inputs, ctx, cfg)
    return match_stage(state, fs, frame_inputs, ctx, cfg,
                       tp_axis=tp_axis, mp_axis=mp_axis, coarse=coarse)


def prepare_coarse(ctx: MapContext, cfg: EngineConfig = DEFAULT):
    """The per-map pruning field for localization_step/match_stage, or
    None when pruning is off.  Call ONCE per rollout, OUTSIDE the frame
    scan (XLA does not hoist the pool out of a scan body - measured;
    match/associate.coarse_field)."""
    if not cfg.match.prune:
        return None
    return assoc.coarse_field(ctx.cache, cfg.match.prune_block)


def vmapped_cfg(cfg: EngineConfig) -> EngineConfig:
    """Config variant for steps that run under jax.vmap (batched
    rollouts, the serving pool, sharded/temporal runners).

    A lax.cond whose predicate is batched lowers to select_n and
    executes BOTH branches, so the prune_min_live gate would run the
    plain AND the pruned scorer on every frame of every vmapped path
    (round-4 review finding).  Force the single always-pruned path
    instead: under vmap the dynamic chunk loops run to the batch-max
    trip count anyway, so bounding the worst (relocking) lane's sweep
    with the pruning bound helps the whole batch.  Outputs are
    identical either way (tests/test_prune.py).  The windowed-scorer
    cond (match.score_window) is per-frame scalar for the same reason
    and is likewise disabled under vmap."""
    changes = {}
    if cfg.match.prune and cfg.match.prune_min_live != 0:
        changes["prune_min_live"] = 0
    if cfg.match.score_window:
        changes["score_window"] = 0
    if not changes:
        return cfg
    return dataclasses.replace(cfg, match=dataclasses.replace(
        cfg.match, **changes))


def match_stage(state: TrackState, fs, frame_inputs, ctx: MapContext,
                cfg: EngineConfig = DEFAULT,
                tp_axis: Optional[str] = None,
                mp_axis: Optional[str] = None,
                coarse=None, cand=None) -> Tuple[TrackState, dict]:
    """Pipeline stage B: association + fusion + UKF + driver state
    (L4/L5 of the reference), consuming pre-computed ScanFeatures.

    cand: optional pre-generated Candidates for THIS (state, fs) pair -
    instrumentation scripts that need the candidate tensor (dedup_stats,
    sol_bound) pass it back in so candgen runs once and the measured
    set is by construction the set the scorer consumes."""
    ranges, angles, valid, n, odom_prev, odom_cur = frame_inputs
    sh = cfg.shapes

    # --- ScanPose from odometry (main_on_windows.cpp:132-153) ---
    dt = ranges.dtype
    is_first = jnp.abs(state.kalman_x[0] + 1) < 1e-4
    theta = state.ang_sum / jnp.maximum(state.ang_cnt, 1).astype(dt)
    tx = (odom_cur[0] - odom_prev[0]) / ctx.resol
    ty = (odom_cur[1] - odom_prev[1]) / ctx.resol
    tang = geo.atand(odom_cur[2] - odom_prev[2])
    sp_x = tx * geo.cosd(theta) - ty * geo.sind(theta)
    if cfg.faithful:
        sp_y = ty * geo.sind(theta) + ty * geo.cosd(theta)  # reference bug
    else:
        sp_y = tx * geo.sind(theta) + ty * geo.cosd(theta)
    scan_pose = jnp.where(is_first, jnp.zeros(3, dt),
                          jnp.stack([sp_x, sp_y, tang]))

    # --- association (trans2FA rounds the lidar pose, :229-230) ---
    lidar_pose = geo.c_round(fs.lidar_pos)
    if cand is None:
        cand = assoc.generate_candidates(
            fs.lines, fs.lines_mask, ctx.lines, ctx.lines_mask,
            lidar_pose, state.last_pose,
            max_candidates=sh.max_candidates,
            ignore_scan_length=cfg.match.ignore_scan_length,
            scan_to_map_diff=cfg.match.scan_to_map_diff,
            max_esti_dist=cfg.match.max_esti_dist)
    if mp_axis is not None:
        # map-block sharding: this device owns a row block of the cache;
        # psum of the additive partials reproduces the full-field score
        row0 = jax.lax.axis_index(mp_axis) * ctx.cache.shape[0]
        parts = assoc.score_candidates_partial(
            cand, fs.pixels, fs.pixels_mask, ctx.cache, row0,
            ctx.rows, ctx.cols,
            z_occ_max_dis=cfg.map.z_occ_max_dis,
            max_dist_penalty=cfg.match.max_dist_penalty,
            chunk=cfg.match.score_chunk,
            pixel_chunk=cfg.match.score_pixel_chunk,
            dynamic_chunks=cfg.match.score_dynamic_chunks,
            obstacle_min_dist=cfg.match.obstacle_min_dist)
        sum_d, n_valid, sum_far, n_far = (
            jax.lax.psum(p, mp_axis) for p in parts)
        n_all = jnp.sum(fs.pixels_mask).astype(dt)
        scores = assoc.finalize_scores(
            cand, sum_d, n_valid, n_all, sum_far=sum_far, n_far=n_far,
            max_dist_penalty=cfg.match.max_dist_penalty,
            valid_ratio=cfg.match.valid_ratio,
            obstacle_tolerance=cfg.match.obstacle_tolerance)
    elif (cfg.match.score_kernel == "pallas"
          and jax.default_backend() != "tpu"
          and cfg.match.obstacle_tolerance == 0.0
          and not jnp.issubdtype(ctx.cache.dtype, jnp.integer)):
        # (u16/u8 fixed-point caches and the obstacle-tolerant score both
        # fall through to the XLA path: the blueprint kernel reads the
        # raw float field and computes the plain reference formula -
        # same fallback pattern as on real TPU)
        # Interpret-mode only: Mosaic cannot lower the kernel's
        # arbitrary-index cache gather on real TPU (probed 2026-08-18 on
        # v5e, jax 0.9.0 - see scripts/probe_pallas_tpu.py).  On TPU the
        # XLA path below is used instead (native gather instruction);
        # the `else` branch handles that fallthrough.
        from lsdtpu.ops.score_pallas import score_candidates_pallas
        scores = score_candidates_pallas(
            cand, fs.pixels, fs.pixels_mask, ctx.cache,
            rows=ctx.rows, cols=ctx.cols,
            z_occ_max_dis=cfg.map.z_occ_max_dis,
            max_dist_penalty=cfg.match.max_dist_penalty,
            valid_ratio=cfg.match.valid_ratio,
            interpret=True)
    else:
        if cfg.match.score_window:
            # per-frame scan radius for the windowed-scorer coverage
            # bound: max live-pixel distance from the rounded lidar
            # pose (the rigid-transform base point)
            pdx = fs.pixels[:, 0].astype(dt) - lidar_pose[0]
            pdy = fs.pixels[:, 1].astype(dt) - lidar_pose[1]
            scan_radius = jnp.max(jnp.where(
                fs.pixels_mask, jnp.sqrt(pdx * pdx + pdy * pdy), 0.0))
        else:
            scan_radius = None
        scores = assoc.score_candidates(
            cand, fs.pixels, fs.pixels_mask, ctx.cache,
            rows=ctx.rows, cols=ctx.cols,
            z_occ_max_dis=cfg.map.z_occ_max_dis,
            max_dist_penalty=cfg.match.max_dist_penalty,
            valid_ratio=cfg.match.valid_ratio,
            chunk=cfg.match.score_chunk,
            pixel_chunk=cfg.match.score_pixel_chunk,
            dynamic_chunks=cfg.match.score_dynamic_chunks,
            obstacle_tolerance=cfg.match.obstacle_tolerance,
            obstacle_min_dist=cfg.match.obstacle_min_dist,
            coarse=coarse if cfg.match.prune else None,
            prune_accept=cfg.match.score_accept,
            prune_block=cfg.match.prune_block,
            prune_group=cfg.match.prune_group,
            prune_min_live=cfg.match.prune_min_live,
            window=cfg.match.score_window,
            window_center=state.last_pose[:2],
            scan_radius=scan_radius,
            window_gate=cfg.match.max_esti_dist)
    # faithful: a perfect (score 0) candidate NaN-poisons the fused
    # pose exactly like the reference's inf weight does (myFA.cpp:161)
    # and tracking resets next frame; fixed mode floors the weight
    # scores so a perfect match dominates instead of destroying
    # tracking (assoc.fuse docstring; test_fuzz_parity.py)
    pose_w, fused_score, pose_min, min_score, n_acc = assoc.fuse(
        cand, scores, cfg.match.score_accept, axis_name=tp_axis,
        score_floor=0.0 if cfg.faithful else 1e-6)
    if cfg.match.polish_pose and mp_axis is not None:
        raise ValueError(
            "match.polish_pose requires a full-field cache view and is "
            "not supported under map-block (mp) sharding; disable the "
            "polish or use a (dp, tp) mesh")
    if cfg.match.polish_pose:
        # sub-pixel Gauss-Newton polish of both measurement paths
        # (tracking weighted mean + first-frame argmin) against the
        # bilinear distance field; deterministic under tp sharding
        # (pose/pixels/cache are replicated over tp after fuse's psum)
        pose_w, _, _ = polish.polish_pose(
            pose_w, lidar_pose, fs.pixels, fs.pixels_mask, ctx.cache,
            rows=ctx.rows, cols=ctx.cols, iters=cfg.match.polish_iters,
            max_total_px=cfg.match.polish_max_px)
        pose_min, _, _ = polish.polish_pose(
            pose_min, lidar_pose, fs.pixels, fs.pixels_mask, ctx.cache,
            rows=ctx.rows, cols=ctx.cols, iters=cfg.match.polish_iters,
            max_total_px=cfg.match.polish_max_px)

    # --- three-way outcome (myFA.cpp:69-175) ---
    lost = n_acc == 0
    # the reference's first-frame branch tolerates |x+1| < 1e-4
    # (myFA.cpp:99), unlike the gate's exact == -1 escape (myFA.cpp:330)
    hmm_first = jnp.abs(state.last_pose[0] + 1) < 1e-4

    # --- ambiguity-aware relocalization (opt-in; see relock_ambiguity)
    if cfg.match.relock_margin > 0.0:
        ambig = assoc.relock_ambiguity(
            cand, scores, pose_min, min_score,
            min_dist=cfg.match.max_esti_dist,
            margin=cfg.match.relock_margin,
            score_accept=cfg.match.score_accept, axis_name=tp_axis)
        deferred = hmm_first & ~lost & ambig
        # a deferred relock behaves exactly like a lost frame: the
        # chain stays at the sentinel and retries globally next frame
        lost = lost | deferred
    else:
        deferred = jnp.zeros((), bool)

    ukf_x, ukf_P = fukf.ukf_step(state.kalman_x, state.kalman_P,
                                 scan_pose, pose_w,
                                 alpha=cfg.filter.alpha,
                                 beta=cfg.filter.beta,
                                 kappa=cfg.filter.kappa,
                                 dt_step=cfg.filter.dt)
    first_x = state.kalman_x.at[:3].set(pose_min)

    new_x = jnp.where(lost, jnp.asarray(fukf.RESET_X, dt),
                      jnp.where(hmm_first, first_x, ukf_x))
    new_P = jnp.where(lost, jnp.asarray(fukf.RESET_P, dt),
                      jnp.where(hmm_first, state.kalman_P, ukf_P))
    out_score = jnp.where(lost, jnp.inf,
                          jnp.where(hmm_first, min_score, fused_score))

    # --- coast-on-loss (opt-in; no reference equivalent) ---
    # The reference resets to the (-1,-1) sentinel on ANY no-candidate
    # frame and relocalizes GLOBALLY next frame (myFA.cpp:69-89) - a
    # momentary occlusion can re-lock the filter on the wrong corridor.
    # With match.coast_on_loss = C > 0, up to C consecutive lost frames
    # dead-reckon instead: the pose advances by the rotated odometry
    # delta (the same additive injection the UKF uses, myFA.cpp:425-427),
    # the covariance inflates by the process noise, and the HMM gate
    # stays anchored locally so recovery is a local re-lock.  Past C the
    # reference's global reset applies unchanged.
    streak = jnp.where(lost, state.lost_streak + 1,
                       jnp.zeros((), jnp.int32))
    if cfg.match.coast_on_loss > 0:
        coast = lost & ~is_first & (streak <= cfg.match.coast_on_loss)
        coast_x = state.kalman_x.at[:3].add(scan_pose)
        coast_P = state.kalman_P + jnp.asarray(fukf.process_noise(), dt)
        new_x = jnp.where(coast, coast_x, new_x)
        new_P = jnp.where(coast, coast_P, new_P)
    else:
        coast = jnp.zeros((), bool)

    # --- angRotate bookkeeping (main_on_windows.cpp:165-172) ---
    frame = state.frame + 1
    ang_diff = new_x[2] - geo.atand(odom_cur[2])
    is_offset = state.is_offset | ((jnp.abs(ang_diff) > 90) & (frame == 1))
    ang_diff = jnp.where(is_offset & (ang_diff < 0), ang_diff + 360,
                         ang_diff)

    new_state = TrackState(
        kalman_x=new_x, kalman_P=new_P, last_pose=new_x[:3],
        ang_sum=state.ang_sum + ang_diff, ang_cnt=state.ang_cnt + 1,
        is_offset=is_offset, frame=frame, lost_streak=streak)
    overflow = (cand.count > cand.mask.shape[0]) | fs.overflow
    if tp_axis is not None:
        # candidate counts are per map-line shard; overflow anywhere
        # must be visible everywhere (out_specs replicate over tp)
        overflow = jax.lax.pmax(overflow.astype(jnp.int32), tp_axis) > 0
    outputs = {
        "pose": new_x[:3],
        "score": out_score,
        "n_candidates": n_acc,
        "n_scan_lines": jnp.sum(fs.lines_mask),
        "candidate_overflow": overflow,
        "coasting": coast,
        "relock_deferred": deferred,
        # raw per-frame quantities for batch refinement (refine/):
        # the FA measurement (weighted-mean pose) and the rotated
        # odometry delta fed to the filter
        "measurement": jnp.where(lost, jnp.nan, pose_w),
        "scan_pose": scan_pose,
    }
    return new_state, outputs


@partial(jax.jit, static_argnames=("cfg",))
def run_sequence(frames, ctx: MapContext, cfg: EngineConfig = DEFAULT):
    """Whole-sequence rollout as one lax.scan.

    frames: dict of stacked per-frame inputs with leading frame axis:
      ranges (F, N), angles (F, N), valid (F, N), n (F,),
      odom_prev (F, 3), odom_cur (F, 3).
    Returns stacked per-frame outputs (poses (F, 3), scores (F,), ...).

    With cfg.prefeaturize (opt-in; helps CPU ~1.5x, measured slower
    on TPU - see config.py) all frames are featurized as one batched
    op up front and the scan carries only the sequential match+filter
    chain; outputs are identical either way.
    """
    state = init_state(frames["ranges"].dtype)
    coarse = prepare_coarse(ctx, cfg)

    if cfg.prefeaturize:
        fs_all = jax.vmap(
            lambda fr: featurize_stage(
                (fr["ranges"], fr["angles"], fr["valid"], fr["n"],
                 fr["odom_prev"], fr["odom_cur"]), ctx, cfg))(frames)

        def step(carry, xs):
            fr, fs = xs
            carry = reset_carry(carry, fr)
            inputs = (fr["ranges"], fr["angles"], fr["valid"], fr["n"],
                      fr["odom_prev"], fr["odom_cur"])
            return match_stage(carry, fs, inputs, ctx, cfg, coarse=coarse)

        _final, outs = jax.lax.scan(step, state, (frames, fs_all))
        return outs

    k = max(1, cfg.scan_unroll)
    F = frames["ranges"].shape[0]
    if k == 1 or F <= k:
        def step(carry, fr):
            carry = reset_carry(carry, fr)
            inputs = (fr["ranges"], fr["angles"], fr["valid"], fr["n"],
                      fr["odom_prev"], fr["odom_cur"])
            return localization_step(carry, inputs, ctx, cfg, coarse=coarse)

        _final, outs = jax.lax.scan(step, state, frames)
        return outs

    # --- k-frame unrolled body (cfg.scan_unroll > 1) ---
    # The scan runs ceil(F/k) iterations; each body featurizes its k
    # frames as ONE batched op and unrolls the sequential match+UKF
    # chain k times.  This divides the per-iteration loop overhead
    # (~0.18 ms on the v5e, docs/RESULTS.md r4) by k.  The sequence is
    # padded to a multiple of k by REPLICATING the last frame (a real,
    # featurize-safe scan); pad steps compute but never advance the
    # carry, and their outputs are sliced off, so results match k=1.
    n_iter = -(-F // k)
    pad = n_iter * k - F
    fr_p = frames
    if pad:
        fr_p = jax.tree.map(
            lambda a: jnp.concatenate(
                [a, jnp.repeat(a[-1:], pad, axis=0)]), frames)
    live = jnp.arange(n_iter * k) < F
    xs = jax.tree.map(lambda a: a.reshape((n_iter, k) + a.shape[1:]), fr_p)
    xs_live = live.reshape(n_iter, k)

    def kstep(carry, packed):
        fr_k, live_k = packed
        if cfg.scan_unroll_batch_featurize:
            fs_k = jax.vmap(lambda fr: featurize_stage(
                (fr["ranges"], fr["angles"], fr["valid"], fr["n"],
                 fr["odom_prev"], fr["odom_cur"]), ctx, cfg))(fr_k)
        else:
            fs_k = None
        outs = []
        for i in range(k):
            fr_i = jax.tree.map(lambda a: a[i], fr_k)
            stepped = reset_carry(carry, fr_i)
            inputs = (fr_i["ranges"], fr_i["angles"], fr_i["valid"],
                      fr_i["n"], fr_i["odom_prev"], fr_i["odom_cur"])
            if fs_k is None:
                fs_i = featurize_stage(inputs, ctx, cfg)
            else:
                fs_i = jax.tree.map(lambda a: a[i], fs_k)
            new_carry, out = match_stage(stepped, fs_i, inputs, ctx, cfg,
                                         coarse=coarse)
            carry = jax.tree.map(
                lambda new, old: jnp.where(live_k[i], new, old),
                new_carry, carry)
            outs.append(out)
        outs = jax.tree.map(lambda *o: jnp.stack(o), *outs)
        return carry, outs

    _final, outs = jax.lax.scan(kstep, state, (xs, xs_live))
    return jax.tree.map(
        lambda a: a.reshape((n_iter * k,) + a.shape[2:])[:F], outs)


def stack_frames(ds, dtype=np.float32, points_per_scan: int = 360,
                 max_frames: Optional[int] = None) -> dict:
    """Host-side: pad + stack a Dataset's frames for run_sequence."""
    F = min(len(ds.frames), ds.odom.shape[0] - 1)
    if max_frames is not None:
        F = min(F, max_frames)
    N = points_per_scan
    ranges = np.zeros((F, N), dtype)
    angles = np.zeros((F, N), dtype)
    valid = np.zeros((F, N), bool)
    counts = np.zeros((F,), np.int32)
    for f in range(F):
        fr = ds.frames[f]
        k = min(len(fr), N)
        ranges[f, :k] = fr[:k, 0]
        angles[f, :k] = fr[:k, 1]
        valid[f, :k] = True
        counts[f] = k
    odom = ds.odom.astype(dtype)
    return {
        "ranges": ranges, "angles": angles, "valid": valid, "n": counts,
        "odom_prev": odom[0:F], "odom_cur": odom[1:F + 1],
    }


def make_map_context(map_lines: np.ndarray, map_cache: np.ndarray,
                     resol: float, ori_x: float, ori_y: float,
                     max_map_lines: Optional[int] = None,
                     dtype=np.float32, cache_dtype: str = "f32",
                     z_occ_max_dis: float = 1.0) -> MapContext:
    """Host-side: pad map artifacts into a MapContext.

    max_map_lines None (default) sizes the pad to the map: the line
    count rounded up to a multiple of 64 (min 64).  The candidate
    domain is (S, M, 4), so padding a 47-line map to the old fixed 256
    made 5/6 of every per-frame gate+compact pass dead weight; auto
    sizing is output-identical (padding never passes the gates) but
    changes the compiled shape, so pass an explicit cap when several
    maps must share one compiled rollout (runtime/batch.stack_batch
    does its own common-cap padding via cfg.shapes.max_map_lines).

    cache_dtype: "f32" (exact, at `dtype`), "bf16", "u16", or "u8"
    (compressed fields - see assoc.quantize_cache; u8 additionally
    puts a data1-size field on the fast side of the v5e gather-rate
    cliff; z_occ_max_dis is the fixed-point scale and must match the
    cap the cache was built with)."""
    if max_map_lines is None:
        max_map_lines = max(64, -(-int(map_lines.shape[0]) // 64) * 64)
    M = max_map_lines
    k = int(map_lines.shape[0])
    if k > M:
        # caps are never silent (ShapeConfig contract): a truncated
        # line set would make the scorer silently disagree with the
        # prepared map
        raise ValueError(f"map has {k} lines > max_map_lines={M}; "
                         "raise the cap (or pass max_map_lines=None "
                         "to auto-size)")
    lines = np.zeros((M, 10), dtype)
    mask = np.zeros((M,), bool)
    lines[:k] = map_lines[:k]
    mask[:k] = True
    return MapContext(
        lines=jnp.asarray(lines), lines_mask=jnp.asarray(mask),
        cache=assoc.quantize_cache(map_cache, cache_dtype, z_occ_max_dis,
                                   float_dtype=dtype),
        rows=jnp.asarray(map_cache.shape[0], jnp.int32),
        cols=jnp.asarray(map_cache.shape[1], jnp.int32),
        resol=jnp.asarray(resol, dtype), ori_x=jnp.asarray(ori_x, dtype),
        ori_y=jnp.asarray(ori_y, dtype))
