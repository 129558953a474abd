"""Sub-pixel pose polish against the mapCache distance field.

A capability the reference lacks: its pose measurement is a weighted
mean over endpoint-alignment hypotheses (LSD/myFA.cpp:159-171), so it
is quantized to the discrete (scan endpoint, map endpoint) alignment
grid.  This module runs a few damped Gauss-Newton iterations on the
fused lidar pose, descending the squared *bilinearly interpolated*
mapCache distance over the transformed scan pixel cloud (steps are
accepted on a CalcScore-style penalized mean, see polish_pose) - the
likelihood-field scan matcher of Probabilistic Robotics ch. 6.4 /
Hector SLAM, expressed as fixed-shape masked tensor math so the whole
polish jits into the per-frame step.

Geometry: every reference candidate transform "rotate the cloud by
angDiff about the scan base point, translate scan base -> map base"
(myFA.cpp:307-355) is identical to "rotate about the lidar position by
angDiff, translate lidar -> transformed lidar pose".  The fused pose
(x, y, theta) therefore parameterizes the cloud directly:

    p' = R(theta) (p - lidar) + (x, y)

The residual of pixel i is D(p'_i) (meters, bilinear); the normal
equations are additive over pixels, so the polish distributes over a
sharded pixel or map axis with a single psum (not currently needed:
the online pixel cloud is small and replicated).

Off by default (`MatchConfig.polish_pose`): parity runs must reproduce
the reference's quantized measurement.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

PI = math.pi


def _bilinear_with_grad(cache_flat, pad_rows, pad_cols, rows, cols, x, y):
    """Bilinear sample + gradient of the distance field at (x, y).

    Returns (value, d/dx, d/dy, inside).  `inside` requires the full
    2x2 support in the TRUE map extent (rows/cols may be smaller than
    the padded storage when maps are batched on a common canvas).
    """
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    inside = (x0i >= 0) & (x0i + 1 < cols) & (y0i >= 0) & (y0i + 1 < rows)
    xc = jnp.clip(x0i, 0, pad_cols - 2)
    yc = jnp.clip(y0i, 0, pad_rows - 2)
    base = yc * pad_cols + xc
    v00 = jnp.take(cache_flat, base)
    v01 = jnp.take(cache_flat, base + 1)            # (x+1, y)
    v10 = jnp.take(cache_flat, base + pad_cols)     # (x, y+1)
    v11 = jnp.take(cache_flat, base + pad_cols + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    val = top * (1 - fy) + bot * fy
    ddx = (v01 - v00) * (1 - fy) + (v11 - v10) * fy
    ddy = bot - top
    return val, ddx, ddy, inside


def _solve3(H, g):
    """Solve H d = g for symmetric 3x3 H via adjugate (TPU-friendly)."""
    a, b, c = H[0, 0], H[0, 1], H[0, 2]
    d, e, f = H[1, 1], H[1, 2], H[2, 2]
    A = d * f - e * e
    B = c * e - b * f
    C = b * e - c * d
    det = a * A + b * B + c * C
    inv_det = jnp.where(jnp.abs(det) > 1e-20, 1.0 / det, 0.0)
    D = a * f - c * c
    E = b * c - a * e
    F = a * d - b * b
    Hin = jnp.array([[A, B, C], [B, D, E], [C, E, F]]) * inv_det
    return Hin @ g


@partial(jax.jit, static_argnames=("iters",))
def polish_pose(pose, lidar_pose, pixels, pixels_mask, cache,
                rows=None, cols=None, iters: int = 4,
                max_step_px: float = 1.5, max_step_deg: float = 1.0,
                max_total_px: float = 4.0, damping: float = 1e-2,
                off_field_penalty: float = 10.0):
    """Gauss-Newton polish of a lidar pose against the distance field.

    pose: (3,) (x, y, theta_deg) in map pixel coords (the fused
    measurement); lidar_pose: (2,) scan-local lidar position; pixels:
    (P, 2) scan-local pixel coords with (P,) mask; cache: (H, W)
    distance field in meters.

    The GN step descends the sum of squared field distances; a step is
    accepted only if it lowers the CalcScore-style penalized mean

        (sum_inside D + off_field_penalty * n_off) / n_masked

    so pushing badly-fitting pixels off the map (which the reference
    scorer penalizes, myFA.cpp:381-389) can never look like progress.
    Per-iteration steps are trust-region clipped and the total
    displacement is capped at `max_total_px` so the polish can never
    leave the HMM acceptance basin (myFA.cpp:330).  Returns
    (polished_pose, cost_before, cost_after) with costs in that
    penalized-mean metric; a pose with no in-field support (or NaN) is
    returned unchanged.
    """
    pad_rows, pad_cols = cache.shape
    if rows is None:
        rows = pad_rows
    if cols is None:
        cols = pad_cols
    dt = pose.dtype
    if jnp.issubdtype(cache.dtype, jnp.integer):
        raise ValueError(
            "polish_pose needs a float distance field; integer fixed-point "
            "caches (match.cache_dtype='u16'/'u8') carry no scale here - "
            "use f32 or bf16 with the polish")
    # bf16 caches polish at full precision on the rounded values
    cache_flat = cache.reshape(-1).astype(dt)
    dxp = pixels[:, 0].astype(dt) - lidar_pose[0]
    dyp = pixels[:, 1].astype(dt) - lidar_pose[1]
    rad = jnp.asarray(PI / 180.0, dt)

    n_masked = jnp.maximum(jnp.sum(pixels_mask).astype(dt), 1.0)

    def cost_and_normal(p):
        th = p[2] * rad
        c = jnp.cos(th)
        s = jnp.sin(th)
        tx = c * dxp - s * dyp + p[0]
        ty = s * dxp + c * dyp + p[1]
        v, gx, gy, inside = _bilinear_with_grad(
            cache_flat, pad_rows, pad_cols, rows, cols, tx, ty)
        w = (inside & pixels_mask).astype(dt)
        n = jnp.sum(w)
        # CalcScore-style penalized mean: off-field pixels cost the cap
        # penalty so a step can't "improve" by shoving pixels off-map
        cost = (jnp.sum(v * w) + off_field_penalty * (n_masked - n)) \
            / n_masked
        # d p'/d theta (radians)
        jth = gx * (-s * dxp - c * dyp) + gy * (c * dxp - s * dyp)
        J = jnp.stack([gx, gy, jth], axis=-1) * w[:, None]   # (P, 3)
        r = v * w
        H = J.T @ J
        g = J.T @ r
        return cost, H, g, n

    cost0, H0, g0, n0 = cost_and_normal(pose)

    def body(_, carry):
        # H/g belong to best_pose, so each iteration evaluates the
        # field exactly once (at the trial pose)
        best_pose, best_cost, H, g = carry
        lam = damping * (H[0, 0] + H[1, 1] + H[2, 2]) / 3.0 + 1e-12
        delta = -_solve3(H + lam * jnp.eye(3, dtype=dt), g)
        # trust region: clip translation and rotation per iteration
        tn = jnp.sqrt(delta[0] ** 2 + delta[1] ** 2)
        tscale = jnp.minimum(1.0, max_step_px / jnp.maximum(tn, 1e-12))
        dth = jnp.clip(delta[2], -max_step_deg * rad, max_step_deg * rad)
        cand = best_pose + jnp.stack(
            [delta[0] * tscale, delta[1] * tscale, dth / rad])
        # total displacement guard (stay inside the HMM basin)
        disp = jnp.sqrt((cand[0] - pose[0]) ** 2 + (cand[1] - pose[1]) ** 2)
        new_cost, Hn, gn, new_n = cost_and_normal(cand)
        accept = (new_cost < best_cost) & (disp <= max_total_px) & \
            (new_n > 0) & jnp.all(jnp.isfinite(cand))
        pick = lambda a, b: jnp.where(accept, a, b)  # noqa: E731
        return (pick(cand, best_pose), pick(new_cost, best_cost),
                pick(Hn, H), pick(gn, g))

    ok = (n0 > 0) & jnp.all(jnp.isfinite(pose))
    safe_pose = jnp.where(ok, pose, jnp.zeros(3, dt))
    out_pose, out_cost, _, _ = jax.lax.fori_loop(
        0, iters, body,
        (safe_pose, jnp.where(ok, cost0, jnp.inf), H0, g0))
    return (jnp.where(ok, out_pose, pose), cost0,
            jnp.where(ok, out_cost, cost0))
