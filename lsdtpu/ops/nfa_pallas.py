"""Pallas TPU kernel for the NFA rectangle rasterize + count pass.

The reference's RectangleNFACalculator (LSD/myLSD.cpp:926-1016) walks
the rectangle's columns computing per-column [yLow, yHigh] bounds and
counts total/level-line-aligned pixels; SURVEY.md ranks this rasterize
among the per-map hot loops (it runs <= 26x per seed under the greedy
improver, myLSD.cpp:1061-1158).  The TPU-native dense form (nfa.py)
evaluates the bounds for every pixel at once and reduces twice; this
module provides that per-pixel pass as ONE fused Pallas kernel: the
downsampled level-line field stays resident in VMEM (~0.5 MB for the
bundled maps at sca=0.3, far under the ~16 MB budget) and both counts
come out of a single sweep.

Unlike the candidate scorer (ops/score_pallas.py), everything here is
Mosaic-lowerable on this stack: iota, elementwise selects/compares,
ceil/floor, and full-array sum reductions - no gathers.  The kernel is
therefore a real production path (config lsd.nfa_kernel="pallas"), not
an interpret-only blueprint; off-TPU it runs in interpret mode.

Bit-exactness: the per-pixel math is SHARED (rect_counts_math) between
the XLA path and the kernel body, and the reductions sum exact small
integers (0/1 pixel indicators, counts < 2^24 in f32), so both paths
return identical counts regardless of reduction order, and the NFA
values downstream are bitwise equal.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PI = math.pi
INT_MIN = float(-(2 ** 31))

# packed scalar layout (see pack_rect_scalars in mapprep/nfa.py):
# [x_start, x_len, vx0..vx3, vy0..vy3, ks0..ks3, deg, prec]
N_SCALARS = 16


def _c_int(v, up: bool):
    """C ceil/floor + cvttsd2si: non-finite / out-of-range -> INT_MIN
    (x86 conversion semantics the reference inherits, myLSD.cpp:983-999).
    NaN and +-inf fail both range compares, so no isfinite is needed."""
    r = jnp.ceil(v) if up else jnp.floor(v)
    ok = (v >= INT_MIN) & (v < 2.0 ** 31)
    return jnp.where(ok, r, INT_MIN)


def rect_counts_math(deg_map, s, row0=0, n_rows=None):
    """The per-pixel rectangle test + the two count reductions
    (reference: myLSD.cpp:973-1016).  `s` is a sequence of N_SCALARS
    traced scalars in the packed layout above.  Shared verbatim by the
    XLA path (mapprep/nfa.py) and the Pallas kernel body so the two
    backends agree bitwise.

    row0/n_rows (sharded map prep, mapprep/lsd_sharded): deg_map is a
    row block starting at global row row0, and rows at/after the TRUE
    global height n_rows are padding that must not count (the
    unsharded image simply ends there)."""
    dt = deg_map.dtype
    shape = deg_map.shape
    yi = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + row0
    yy = yi.astype(dt)
    xx = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(dt)
    (x_start, x_len, vx0, vx1, _vx2, vx3, vy0, vy1, _vy2, vy3,
     k0, k1, k2, k3, deg, prec) = s
    col_ok = (xx >= x_start) & (xx <= x_start + x_len - 1.0)
    y_low = _c_int(jnp.where(xx < vx3, vy0 + (xx - vx0) * k3,
                             vy3 + (xx - vx3) * k2), up=True)
    y_high = _c_int(jnp.where(xx < vx1, vy0 + (xx - vx0) * k0,
                              vy1 + (xx - vx1) * k1), up=False)
    inside = col_ok & (yy >= y_low) & (yy <= y_high)
    if n_rows is not None:
        inside = inside & (yi < n_rows)
    deg_dif = jnp.abs(deg - deg_map)
    deg_dif = jnp.where(deg_dif > PI * 1.5, jnp.abs(deg_dif - 2 * PI),
                        deg_dif)
    all_pix = jnp.sum(inside.astype(dt))
    ali_pix = jnp.sum((inside & (deg_dif < prec)).astype(dt))
    return all_pix, ali_pix


def _kernel(sc_ref, deg_ref, all_ref, ali_ref):
    s = [sc_ref[0, i] for i in range(N_SCALARS)]
    all_pix, ali_pix = rect_counts_math(deg_ref[...], s)
    all_ref[0, 0] = all_pix
    ali_ref[0, 0] = ali_pix


def rect_counts_pallas(deg_map: jnp.ndarray, scalars: jnp.ndarray,
                       interpret: bool | None = None):
    """(all_pix, ali_pix) for one rectangle via the fused VMEM kernel.

    deg_map: (H, W) level-line field (the downsampled image's, f32 on
    TPU); scalars: (N_SCALARS,) packed rectangle geometry.  Off-TPU the
    kernel runs in interpret mode (Pallas has no CPU backend)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dt = deg_map.dtype
    all_pix, ali_pix = pl.pallas_call(
        _kernel,
        out_shape=(jax.ShapeDtypeStruct((1, 1), dt),
                   jax.ShapeDtypeStruct((1, 1), dt)),
        in_specs=[pl.BlockSpec((1, N_SCALARS), memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        interpret=interpret,
    )(scalars.reshape(1, N_SCALARS).astype(dt), deg_map)
    return all_pix[0, 0], ali_pix[0, 0]
