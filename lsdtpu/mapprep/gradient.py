"""Level-line gradient field: one shifted-difference pass.

Reference: myLineSegmentDetector prologue, LSD/myLSD.cpp:145-174.
Row 0 and column 0 stay zero (the reference never writes them); pixels
below gradThre = 2/sin(degThre) are pre-banned in the used map.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

PI = math.pi


def gradient_core(gauss: jnp.ndarray):
    """Shifted-difference magnitude/level-line angle of a (sub)field
    (myLSD.cpp:145-174): row/col i of the output corresponds to input
    rows/cols (i, i+1).  ONE shared body: the slab-sharded prologue
    (mapprep/lsd_sharded.py) calls this on halo-extended slabs - edit
    it once."""
    a = gauss[1:, 1:]
    b = gauss[1:, :-1]
    c = gauss[:-1, 1:]
    d = gauss[:-1, :-1]
    gx = (b + d - a - c) / 2.0
    gy = (c + d - a - b) / 2.0
    m = jnp.sqrt(gx * gx + gy * gy)
    v = jnp.arctan2(gx, -gy)
    v = jnp.where(jnp.abs(v - PI) < 1e-6, 0.0, v)
    return m, v


@partial(jax.jit, static_argnames=("deg_thre",))
def gradient_field(gauss: jnp.ndarray, deg_thre: float):
    """Returns (mag, deg, banned, max_grad); banned is bool (pre-ban)."""
    m, v = gradient_core(gauss)
    grad_thre = 2.0 / math.sin(deg_thre)

    mag = jnp.zeros_like(gauss).at[1:, 1:].set(m)
    deg = jnp.zeros_like(gauss).at[1:, 1:].set(v)
    banned = jnp.zeros(gauss.shape, bool).at[1:, 1:].set(m < grad_thre)
    # row/col 0 are not seeds either: mag there is 0 -> bin 0 (skipped)
    return mag, deg, banned, jnp.max(m)
