"""mapCache: the BFS-approximate distance-to-wall prior, as
wave-synchronous source propagation with exact FIFO-rank ownership.

The reference (createMapCache, LSD/myLSD.cpp:11-127) runs a FIFO BFS
from all occupied cells: a claimed cell stores the Euclidean distance
from its *parent* to the parent's wavefront source (not its own - the
parent-distance quirk, myLSD.cpp:47-58), propagation stops when the
parent's distance exceeds z_occ_max_dis, unclaimed cells keep the cap,
and contested cells go to whichever parent dequeued first.

TPU-native form: one masked 4-neighbor propagation per BFS wave
(lax.while_loop to fixpoint), each claimed cell carrying its source
coordinates.  FIFO ownership is reproduced *exactly* by also carrying
each cell's dense queue rank: the initial ranks are the row-major
order of the occupied cells (the reference's seeding order,
myLSD.cpp:25-42), a contested cell goes to the minimum-rank eligible
parent (the reference's first-dequeued parent), and the new wave's
ranks are the dense sort order of (parent_rank, direction) - exactly
the order the reference enqueues them (neighbor scan order up, left,
down, right, myLSD.cpp:46-122).  One argsort per wave keeps ranks
bounded.  Values then match the reference bit-for-bit: the distance is
sqrt of an integer sum of squares times res in both.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

# parent offsets in the reference's neighbor scan order: the parent of
# a cell claimed by an "up" move sits below it, and so on.
_PARENT_OFFSETS = ((1, 0), (0, 1), (-1, 0), (0, -1))


def _shift(a, dy: int, dx: int, fill):
    """out[i, j] = a[i + dy, j + dx] (fill at borders)."""
    out = a
    if dy == 1:
        out = jnp.concatenate([out[1:], jnp.full_like(out[:1], fill)], 0)
    elif dy == -1:
        out = jnp.concatenate([jnp.full_like(out[:1], fill), out[:-1]], 0)
    if dx == 1:
        out = jnp.concatenate([out[:, 1:], jnp.full_like(out[:, :1], fill)],
                              1)
    elif dx == -1:
        out = jnp.concatenate([jnp.full_like(out[:, :1], fill), out[:, :-1]],
                              1)
    return out


@partial(jax.jit, static_argnames=("res", "z_occ_max_dis"))
def create_map_cache(map_gray: jnp.ndarray, res: float,
                     z_occ_max_dis: float = 1.0) -> jnp.ndarray:
    """map_gray: (H, W) occupancy with occupied == 1 (pre-remap values).
    Returns (H, W) float distance field in meters, capped."""
    cell_radius = math.floor(z_occ_max_dis / res)
    H, W = map_gray.shape
    dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    # dense ranks are < H*W, so rank*4+dir stays < 4*H*W + 4: int32-safe
    # for any realistic map (the int32-max sentinel would overflow *4)
    BIG = H * W
    KEY_BIG = 4 * H * W + 4

    occ = map_gray == 1
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)

    # initial ranks: row-major order of occupied cells
    rank0 = jnp.where(occ, jnp.cumsum(occ.reshape(-1)).reshape(H, W) - 1,
                      BIG).astype(jnp.int32)

    state = dict(
        claimed=occ,
        srcy=jnp.where(occ, yy, 0),
        srcx=jnp.where(occ, xx, 0),
        rank=rank0,
        cache=jnp.where(occ, 0.0, z_occ_max_dis).astype(dt),
        changed=jnp.array(True),
    )

    def body(s):
        dy_ = (yy - s["srcy"]).astype(dt)
        dx_ = (xx - s["srcx"]).astype(dt)
        d = jnp.sqrt(dy_ * dy_ + dx_ * dx_)
        eligible = s["claimed"] & (d <= cell_radius)
        # per-direction claim keys: (parent_rank, dir) lexicographic
        key = jnp.full((H, W), KEY_BIG, jnp.int32)
        srcy, srcx, cache = s["srcy"], s["srcx"], s["cache"]
        for di, (dy, dx) in enumerate(_PARENT_OFFSETS):
            par_ok = _shift(eligible, dy, dx, False)
            par_rank = _shift(s["rank"], dy, dx, BIG)
            k = par_rank * 4 + di
            k = jnp.where(par_ok & ~s["claimed"], k, KEY_BIG)
            better = k < key
            key = jnp.where(better, k, key)
            srcy = jnp.where(better, _shift(s["srcy"], dy, dx, 0), srcy)
            srcx = jnp.where(better, _shift(s["srcx"], dy, dx, 0), srcx)
            cache = jnp.where(better, (_shift(d, dy, dx, jnp.inf) * res
                                       ).astype(dt), cache)
        new = key < KEY_BIG
        # dense re-rank of this wave by enqueue order (one sort)
        order = jnp.argsort(key.reshape(-1))
        pos = jnp.zeros((H * W,), jnp.int32).at[order].set(
            jnp.arange(H * W, dtype=jnp.int32))
        rank = jnp.where(new, pos.reshape(H, W), s["rank"])
        return dict(claimed=s["claimed"] | new, srcy=srcy, srcx=srcx,
                    rank=rank, cache=cache, changed=jnp.any(new))

    final = jax.lax.while_loop(lambda s: s["changed"], body, state)
    return final["cache"]
