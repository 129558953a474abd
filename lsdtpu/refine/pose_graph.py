"""Batch pose-graph refinement over a localized trajectory.

New capability beyond the reference (BASELINE.json north star:
"distributed pose-graph / Schur-complement batch refinement over
keyframe poses").  The online loop is causal - each pose sees only
past scans; offline, the whole trajectory can be re-estimated jointly:

    min_x  sum_t w_t ||x_t - m_t||^2                (FA measurements)
         + sum_t ||x_{t+1} - x_t - u_t||_Wu^2       (odometry chain)

with m_t the per-frame feature-association measurement (weight
w_t = 1/score_t^2, the reference's own confidence weighting,
myFA.cpp:159-171; frames with lost tracking get w_t = 0 and are
bridged by odometry), and u_t the rotated odometry delta the driver
feeds the filter.  Both residuals are linear in x (u_t is already in
map coordinates), so the normal system is a symmetric block-tridiagonal
(3x3 blocks) matrix solved exactly in one pass - a block Thomas
forward elimination + back substitution expressed as two lax.scans.
This is the Schur-complement elimination of a chain graph: each
forward step marginalizes one pose.  O(F) work, fully on device; for
multi-host scale the chain splits into per-device segments with a
small separator system (one pose per cut) reduced via all_gather.

Angles are unwrapped before solving (the chain is linear, so branch
cuts would otherwise tear it) and all weights are per-frame arrays so
callers can reweight or freeze poses.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _wrap_deg(a):
    return (a + 180.0) % 360.0 - 180.0


def _normal_system(meas, scores, scan_pose, odom_weight,
                   max_meas_weight):
    """Build the block-tridiagonal normal system (D (F,3,3), U (3,3),
    rhs (F,3)) plus the measurement mask/weights."""
    F = meas.shape[0]
    dt = meas.dtype

    ok = jnp.isfinite(scores) & jnp.all(jnp.isfinite(meas), axis=1)
    w_meas = jnp.where(ok, jnp.minimum(1.0 / (scores * scores),
                                       max_meas_weight), 0.0)

    # unwrap measurement angles along the trajectory so the linear
    # chain never spans a branch cut.  Lost frames (NaN meas) are
    # forward-filled with the last measured angle first: the diffs
    # through a gap then telescope to wrap(next - prev), so a gap
    # straddling +-180 does not tear, and a lost frame 0 cannot poison
    # the cumsum with NaN (leading gap backfills from the first ok).
    F_ = meas.shape[0]
    idx = jnp.arange(F_)
    last_ok = jax.lax.associative_scan(
        jnp.maximum, jnp.where(ok, idx, -1))
    first_ok = jnp.min(jnp.where(ok, idx, F_))
    src = jnp.where(last_ok >= 0, jnp.maximum(last_ok, 0),
                    jnp.clip(first_ok, 0, F_ - 1))
    any_ok = jnp.any(ok)
    ang = jnp.where(any_ok, meas[jnp.clip(src, 0, F_ - 1), 2], 0.0)
    dang = _wrap_deg(jnp.diff(ang))
    ang_unwrapped = jnp.concatenate([ang[:1],
                                     ang[0] + jnp.cumsum(dang)])
    m = meas.at[:, 2].set(jnp.where(ok, ang_unwrapped, 0.0))
    m = jnp.where(ok[:, None], m, 0.0)

    Wu = jnp.asarray(odom_weight, dt)                   # (3,) diagonal

    # D_t = w_t I + Wu * ([t>0] + [t<F-1]);  U = -diag(Wu)
    I3 = jnp.eye(3, dtype=dt)
    has_prev = (jnp.arange(F) > 0).astype(dt)
    has_next = (jnp.arange(F) < F - 1).astype(dt)
    D = (w_meas[:, None, None] * I3 +
         (has_prev + has_next)[:, None, None] * jnp.diag(Wu))
    # with NO measured frame the system is the anchorless chain
    # Laplacian (singular: the last Schur block is exactly 0) and the
    # solve would return NaN for every pose; anchor pose 0 at the
    # origin in that case - the result is then pure odometry
    # dead-reckoning, and info["n_measured"]==0 tells callers so
    D = D.at[0].add(jnp.where(any_ok, 0.0, 1.0) * I3)
    U = -jnp.diag(Wu)

    # rhs: w m_t + Wu u_t (pair t-1,t) - Wu u_{t+1} (pair t,t+1)
    u = scan_pose
    u_next = jnp.concatenate([u[1:], jnp.zeros((1, 3), dt)])
    rhs = (w_meas[:, None] * m +
           has_prev[:, None] * (Wu * u) -
           has_next[:, None] * (Wu * u_next))
    return D, U, rhs, ok, w_meas


@functools.partial(jax.jit, static_argnames=())
def refine_trajectory(meas, scores, scan_pose,
                      odom_weight=(4.0, 4.0, 4.0),
                      max_meas_weight: float = 100.0):
    """meas: (F, 3) FA measurements [x_px, y_px, ang_deg] (NaN where
    tracking lost); scores: (F,); scan_pose: (F, 3) odometry deltas in
    map pixel coords (frame t's delta from t-1).
    Returns (refined (F, 3), info dict).
    """
    D, U, rhs, ok, w_meas = _normal_system(meas, scores, scan_pose,
                                           odom_weight, max_meas_weight)
    # one shared block-Thomas kernel (U is symmetric, so the multi-rhs
    # form is numerically identical to the hand-rolled elimination)
    xs = _thomas_multi(D, U, rhs[:, :, None])[:, :, 0]
    refined = xs.at[:, 2].set(_wrap_deg(xs[:, 2]))
    info = {"n_measured": jnp.sum(ok),
            "mean_weight": jnp.sum(w_meas) / jnp.maximum(jnp.sum(ok), 1)}
    return refined, info


def _thomas_multi(D, U, R):
    """Block-Thomas solve of the chain system with diag blocks D
    (L, 3, 3), constant symmetric off-diag U (3, 3), and multi-column
    rhs R (L, 3, k).  Returns X (L, 3, k)."""
    L = D.shape[0]
    dt = D.dtype

    def fwd(carry, inp):
        Sp, Yp, first = carry
        Dt, Rt = inp
        SpinvU = jnp.linalg.solve(Sp, U)
        SpinvY = jnp.linalg.solve(Sp, Yp)
        St = Dt - jnp.where(first, 0.0, U @ SpinvU)
        Yt = Rt - jnp.where(first, 0.0, U @ SpinvY)
        return (St, Yt, jnp.zeros((), bool)), (St, Yt)

    k = R.shape[-1]
    (_, _, _), (S, Y) = jax.lax.scan(
        fwd, (jnp.eye(3, dtype=dt), jnp.zeros((3, k), dt), jnp.ones((), bool)),
        (D, R))

    def bwd(x_next, inp):
        St, Yt, last = inp
        rhs = Yt - jnp.where(last, 0.0, U @ x_next)
        x = jnp.linalg.solve(St, rhs)
        return x, x

    is_last = jnp.arange(L) == L - 1
    _, X = jax.lax.scan(bwd, jnp.zeros((3, k), dt), (S, Y, is_last),
                        reverse=True)
    return X


def _thomas_var(D, Uu, R):
    """Block-Thomas with per-edge off-diag blocks Uu (L-1, 3, 3)
    (Uu[t] couples t and t+1, symmetric system) and rhs R (L, 3)."""
    L = D.shape[0]
    dt = D.dtype
    Upad = jnp.concatenate([jnp.zeros((1, 3, 3), dt), Uu], axis=0)

    def fwd(carry, inp):
        Sp, yp = carry
        Dt, rt, Ut = inp        # Ut couples t-1 and t (zeros at t=0)
        St = Dt - Ut.T @ jnp.linalg.solve(Sp, Ut)
        yt = rt - Ut.T @ jnp.linalg.solve(Sp, yp)
        return (St, yt), (St, yt)

    (_, _), (S, y) = jax.lax.scan(
        fwd, (jnp.eye(3, dtype=dt), jnp.zeros(3, dt)), (D, R, Upad))

    Unext = jnp.concatenate([Uu, jnp.zeros((1, 3, 3), dt)], axis=0)

    def bwd(x_next, inp):
        St, yt, Ut = inp        # Ut couples t and t+1 (zeros at t=L-1)
        x = jnp.linalg.solve(St, yt - Ut @ x_next)
        return x, x

    _, X = jax.lax.scan(bwd, jnp.zeros(3, dt), (S, y, Unext),
                        reverse=True)
    return X


@functools.partial(jax.jit, static_argnames=("n_segments",))
def refine_trajectory_distributed(meas, scores, scan_pose,
                                  n_segments: int = 8,
                                  odom_weight=(4.0, 4.0, 4.0),
                                  max_meas_weight: float = 100.0):
    """Segment-parallel exact solve of the same normal system.

    The Schur-complement strategy of BASELINE config 5 ("distributed
    pose refinement across hosts over a concatenated long sequence"):
    the F-pose chain is cut into `n_segments` segments whose interiors
    condense - in parallel (vmap; shard_map/pjit distributes the same
    code) - onto the segment-boundary poses; the small separator chain
    (n_segments 3x3 blocks) is solved sequentially; interiors back-
    substitute in parallel.  Identical result to refine_trajectory up
    to solver rounding.  Requires F divisible by n_segments with
    segment length >= 2; callers pad with zero-weight frames.
    """
    F = meas.shape[0]
    P = n_segments
    assert F % P == 0 and F // P >= 2, (F, P)
    L = F // P
    dt = meas.dtype

    D, U, rhs, ok, w_meas = _normal_system(meas, scores, scan_pose,
                                           odom_weight, max_meas_weight)

    # segment s owns poses [sL, (s+1)L); separator s = pose sL+L-1
    D_seg = D.reshape(P, L, 3, 3)
    r_seg = rhs.reshape(P, L, 3)
    D_int = D_seg[:, :L - 1]                    # interiors (P, L-1, 3, 3)
    r_int = r_seg[:, :L - 1]

    I3 = jnp.eye(3, dtype=dt)
    Z3 = jnp.zeros((3, 3), dt)

    def condense(Di, ri, has_left):
        # multi-rhs: [b_I | E_left | E_right]
        Li = Di.shape[0]
        R = jnp.zeros((Li, 3, 7), dt)
        R = R.at[:, :, 0].set(ri)
        R = R.at[0, :, 1:4].set(jnp.where(has_left, I3, Z3))
        R = R.at[Li - 1, :, 4:7].set(I3)
        X = _thomas_multi(Di, U, R)
        zb = X[:, :, 0]                          # T^-1 b_I
        Ga = X[:, :, 1:4]                        # T^-1 E_left columns
        Gb = X[:, :, 4:7]                        # T^-1 E_right columns
        # couplings: left separator <-> first interior, right separator
        # <-> last interior, both with block U
        C_aa = -U @ Ga[0] @ U                    # onto (left, left)
        C_ab = -U @ Gb[0] @ U                    # (left, right)
        C_bb = -U @ Gb[Li - 1] @ U               # (right, right)
        y_a = -U @ zb[0]
        y_b = -U @ zb[Li - 1]
        return C_aa, C_ab, C_bb, y_a, y_b, zb

    has_left = jnp.arange(P) > 0
    C_aa, C_ab, C_bb, y_a, y_b, _zb = jax.vmap(condense)(
        D_int, r_int, has_left)

    # separator chain over P poses sL+L-1
    sep_idx = jnp.arange(P) * L + (L - 1)
    S_diag = D[sep_idx] + C_bb
    # segment s+1 contributes C_aa to separator s and C_ab as the
    # (s, s+1) coupling
    S_diag = S_diag.at[:P - 1].add(C_aa[1:])
    S_off = C_ab[1:]                              # (P-1, 3, 3)
    r_sep = rhs[sep_idx] + y_b
    r_sep = r_sep.at[:P - 1].add(y_a[1:])
    x_sep = _thomas_var(S_diag, S_off, r_sep)     # (P, 3)

    # parallel interior back-substitution with Dirichlet boundaries
    x_left = jnp.concatenate([jnp.zeros((1, 3), dt), x_sep[:-1]])

    def back(Di, ri, xl, xr, hl):
        Li = Di.shape[0]
        r = ri.at[0].add(-jnp.where(hl, U @ xl, jnp.zeros(3, dt)))
        r = r.at[Li - 1].add(-(U @ xr))
        return _thomas_multi(Di, U, r[:, :, None])[:, :, 0]

    x_int = jax.vmap(back)(D_int, r_int, x_left, x_sep, has_left)

    xs = jnp.concatenate([x_int, x_sep[:, None, :]], axis=1).reshape(F, 3)
    refined = xs.at[:, 2].set(_wrap_deg(xs[:, 2]))
    info = {"n_measured": jnp.sum(ok),
            "mean_weight": jnp.sum(w_meas) / jnp.maximum(jnp.sum(ok), 1)}
    return refined, info
