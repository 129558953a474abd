"""Gaussian downsampler as two batched gather passes.

TPU-native form of the reference's separable blur + subsample
(reference: GaussianSampler, LSD/myLSD.cpp:378-484).  The reference
walks output pixels and inner-products a per-phase kernel against a
reflected window; here the reflected window indices for every output
column are a precomputed (new_x, hSize) gather, and each pass sums the
hSize taps over gathered whole rows/columns:

    aux[y, x']  = sum_i img[y, jx[x', i]] * kx[x', i]
    out[y', x'] = sum_i aux[jy[y', i], x'] * ky[y', i]

The tap sum is accumulated SEQUENTIALLY in ascending i (a small
unrolled loop, not one einsum contraction) so the floating-point
addition order matches the reference's scalar loop bit-for-bit
(myLSD.cpp:428-433; XLA's only remaining deviation is FMA contraction,
~1 ulp - see tests/test_mapprep.py).  The three phase-shifted kernels
(the V1.1 x%3 trick, myLSD.cpp:398-417) and the symmetric
double-domain reflection (myLSD.cpp:434-444) are reproduced exactly;
everything is static-shaped so the whole sampler jits once per map
size.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def kernel_bank(sca: float, sig: float):
    """The 3 phase-shifted normalized kernels; returns (ker (3, hSize), h)."""
    prec = 3
    if sca < 1:
        sig = sig / sca
    h = int(math.ceil(sig * math.sqrt(2 * prec * math.log(10))))
    h_size = 1 + 2 * h
    k = np.arange(h_size, dtype=np.float64)
    ker = np.stack([
        np.exp(-0.5 * ((k - h) / sig) ** 2),
        np.exp(-0.5 * ((k - h - 1.0 / 3) / sig) ** 2),
        np.exp(-0.5 * ((k - h + 1.0 / 3) / sig) ** 2),
    ])
    ker /= ker.sum(axis=1, keepdims=True)
    return ker, h


def _reflect_indices(centers: np.ndarray, h: int, lim: int) -> np.ndarray:
    """Symmetric reflection over the doubled domain (myLSD.cpp:434-444)."""
    idx = centers[:, None] + (np.arange(2 * h + 1)[None, :] - h)
    dou = 2 * lim
    idx = np.mod(idx, dou)
    return np.where(idx >= lim, dou - idx - 1, idx)


@partial(jax.jit, static_argnames=("sca", "sig"))
def gaussian_sampler(image: jnp.ndarray, sca: float = 0.3,
                     sig: float = 0.6) -> jnp.ndarray:
    """image: (row, col) array; returns (floor(row*sca), floor(col*sca))
    float blurred subsample."""
    y_lim, x_lim = image.shape
    new_x = int(math.floor(x_lim * sca))
    new_y = int(math.floor(y_lim * sca))
    ker, h = kernel_bank(sca, sig)
    dt = image.dtype if jnp.issubdtype(image.dtype, jnp.floating) \
        else jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    xc = np.floor(np.arange(new_x) / sca + 0.5).astype(np.int64)
    jx = jnp.asarray(_reflect_indices(xc, h, x_lim))      # (new_x, hS)
    kx = jnp.asarray(ker[np.arange(new_x) % 3], dt)       # (new_x, hS)
    yc = np.floor(np.arange(new_y) / sca + 0.5).astype(np.int64)
    jy = jnp.asarray(_reflect_indices(yc, h, y_lim))      # (new_y, hS)
    ky = jnp.asarray(ker[np.arange(new_y) % 3], dt)

    img = image.astype(dt)
    return tap_sum_rows(tap_sum_cols(img, jx, kx), jy, ky)


def tap_sum_cols(img, jx, kx):
    """x-pass: aux[y, x'] = sum_i img[y, jx[x', i]] * kx[x', i].

    Kernel taps accumulate SEQUENTIALLY (ascending i) to match the
    reference's scalar loop order (myLSD.cpp:428-433).  XLA still
    contracts mul+add into FMA (uncontrollably, even across
    optimization barriers), so results differ from plain-double C by
    ~1 ulp; downstream consumers that quantize must handle the
    boundary case explicitly (see lsd.py seed binning).  ONE shared
    body: the slab-sharded prologue (mapprep/lsd_sharded.py) calls
    this too - edit it once."""
    h_size = jx.shape[1]
    aux = img[:, jx[:, 0]] * kx[:, 0]
    for i in range(1, h_size):
        aux = aux + img[:, jx[:, i]] * kx[:, i]
    return aux


def tap_sum_rows(aux, jy, ky):
    """y-pass: out[y', x] = sum_i aux[jy[y', i], x] * ky[y', i] -
    same sequential-accumulation contract as tap_sum_cols."""
    h_size = jy.shape[1]
    out = aux[jy[:, 0], :] * ky[:, 0:1]
    for i in range(1, h_size):
        out = out + aux[jy[:, i], :] * ky[:, i:i + 1]
    return out
