"""9-state constant-acceleration UKF, compiled for TPU.

Reference: LSD/myFA.cpp:404-536.  State [x, y, th, vx, vy, vth, ax, ay,
ath]; measurement = identity on the first three states; odometry is
injected additively into the state before the unscented transform
(myFA.cpp:425-427).  Sigma points via Cholesky with the reference's
A = c * chol(P)^T row convention (myFA.cpp:456-460).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

L = 9
ALPHA = 1e-2
KI = 0.0
BETA = 2.0
DT = 1.0

_Q = np.diag([1, 1, 1, .01, .01, .01, 1e-4, 1e-4, 1e-4])
_R = np.eye(3)
# constant-acceleration transition (myFA.cpp:477-487)
_F = np.eye(L)
for i in range(3):
    _F[i, i + 3] = DT
    _F[i + 3, i + 6] = DT
    _F[i, i + 6] = 0.5 * DT * DT

RESET_X = np.array([-1, -1, 0, 0, 0, 0, 0, 0, 0], dtype=np.float64)
RESET_P = np.diag([100, 100, 100, 1, 1, 1, 0.1, 0.1, 0.1]).astype(np.float64)


def process_noise() -> np.ndarray:
    """The UKF process-noise matrix Q (myFA.cpp:407-412); used by the
    coast-on-loss covariance inflation (runtime/loop.py)."""
    return _Q


def _cholesky_unrolled(P):
    """Lower Cholesky of a small SPD matrix, fully unrolled.

    jnp.linalg.cholesky lowers to a blocked while-loop routine that is
    both slow under vmap on TPU and run in bf16 matmul precision; the
    filter's 9x9 factor wants exact f32/f64 arithmetic (the reference
    uses Eigen llt, myFA.cpp:456-460).

    Right-looking (outer-product) form: each of the n unrolled steps is
    pure elementwise math + a rank-1 update on the full (n, n) tile -
    no dynamic-update-slices, so XLA fuses the whole factorization into
    a handful of VPU kernels (the previous at[].set form compiled to
    ~n*3 unfusable small updates and was a measurable slice of the
    per-frame driver glue on TPU)."""
    n = P.shape[0]
    rows = jnp.arange(n)
    A = P
    Lm = jnp.zeros_like(P)
    for j in range(n):
        d = jnp.sqrt(A[j, j])
        col = jnp.where(rows >= j, A[:, j] / d, 0.0)
        Lm = jnp.where(rows[None, :] == j, col[:, None], Lm)
        A = A - col[:, None] * col[None, :]
    return Lm


def _inv3(M):
    """Closed-form 3x3 inverse (adjugate / det)."""
    a, b, c = M[0, 0], M[0, 1], M[0, 2]
    d, e, f = M[1, 0], M[1, 1], M[1, 2]
    g, h, i = M[2, 0], M[2, 1], M[2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    adj = jnp.array([[A, -(b * i - c * h), b * f - c * e],
                     [B, a * i - c * g, -(a * f - c * d)],
                     [C, -(a * h - b * g), a * e - b * d]])
    return adj / det


def _transition(dt_step: float):
    F = np.eye(L)
    for i in range(3):
        F[i, i + 3] = dt_step
        F[i + 3, i + 6] = dt_step
        F[i, i + 6] = 0.5 * dt_step * dt_step
    return F


def ukf_step(kalman_x, kalman_P, scan_pose, measurement,
             alpha: float = ALPHA, beta: float = BETA, kappa: float = KI,
             dt_step: float = DT):
    """One UKF predict+update.  All args are jnp arrays:
    kalman_x (9,), kalman_P (9,9), scan_pose (3,), measurement (3,).
    alpha/beta/kappa/dt_step mirror FilterConfig (defaults = reference
    values, myFA.cpp:431-433).

    All matmuls run at HIGHEST precision: the default TPU bf16 matmul
    corrupts the covariance and the Cholesky goes NaN within a few
    hundred frames."""
    with jax.default_matmul_precision("highest"):
        dt = kalman_x.dtype
        Q = jnp.asarray(_Q, dt)
        R = jnp.asarray(_R, dt)
        F = jnp.asarray(_F if dt_step == DT else _transition(dt_step), dt)

        x = kalman_x.at[:3].add(scan_pose)
        lam = alpha * alpha * (L + kappa) - L
        c = L + lam
        w0 = jnp.arange(2 * L + 1) == 0
        Wm = jnp.where(w0, lam / c, 0.5 / c).astype(dt)
        Wc = jnp.where(w0, lam / c + (1 - alpha * alpha + beta),
                       0.5 / c).astype(dt)
        sc = math.sqrt(c) if isinstance(c, float) else jnp.sqrt(c)

        A = sc * _cholesky_unrolled(kalman_P).T
        Y = jnp.tile(x[:, None], (1, L))
        Xset = jnp.concatenate([x[:, None], Y + A, Y - A], axis=1)  # (9, 19)

        Xsig = F @ Xset
        Xmeans = Xsig @ Wm
        Xdiv = Xsig - Xmeans[:, None]
        P1 = (Xdiv * Wc[None, :]) @ Xdiv.T + Q

        Zmeans = Xmeans[:3]
        Zdiv = Xdiv[:3]
        Pzz = (Zdiv * Wc[None, :]) @ Zdiv.T + R
        Pxz = (Xdiv * Wc[None, :]) @ Zdiv.T
        K = Pxz @ _inv3(Pzz)
        new_x = Xmeans + K @ (measurement - Zmeans)
        new_P = P1 - K @ Pxz.T
        return new_x, new_P
