"""Degree trigonometry and line-info construction as vectorized jnp ops.

Line sets are SoA float arrays of shape (N, 10) in structLinesInfo field
order [k, b, dx, dy, x1, y1, x2, y2, len, orient] (reference:
LSD/baseFunc.h:33-44) with a boolean validity mask - the TPU-native
replacement for the reference's malloc'd arrays of structs.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

PI = math.pi

# structLinesInfo field indices
K, B, DX, DY, X1, Y1, X2, Y2, LEN, ORIENT = range(10)


def sind(x):
    """Degree sine (reference: baseFunc.cpp:6-8; same op order)."""
    return jnp.sin(x / 180.0 * PI)


def cosd(x):
    return jnp.cos(x / 180.0 * PI)


def atand(x):
    return jnp.arctan(x) * 180.0 / PI


def c_round(v):
    """C round(): half away from zero (jnp.round is half-to-even)."""
    return jnp.where(v >= 0, jnp.floor(v + 0.5), jnp.ceil(v - 0.5))


def lines_info_from_endpoints(x1, y1, x2, y2):
    """Build (..., 10) linesInfo rows from endpoint arrays
    (reference: LSD/myLSD.cpp:280-368 tail, LSD/myRDP.cpp:86-176).

    Division by zero follows IEEE (vertical lines get k=+-inf, exactly
    like the C code).
    """
    k = (y2 - y1) / (x2 - x1)
    ang = atand(k)
    neg = ang < 0
    ang = jnp.where(neg, ang + 180.0, ang)
    orient = jnp.where(neg, -1.0, 1.0)
    b = (y1 + y2) / 2.0 - k * (x1 + x2) / 2.0
    length = jnp.sqrt((y2 - y1) ** 2 + (x2 - x1) ** 2)
    return jnp.stack([k, b, cosd(ang), sind(ang), x1, y1, x2, y2,
                      length, orient], axis=-1)


def normalized_line_direction(sx, sy, ex, ey):
    """Line direction in degrees, [-180, 180] (reference: myFA.cpp:274-305).

    Branches use exact comparisons like the C code; the generic branch
    divides (ey-sy)/(ex-sx) which is +-inf for vertical lines, and
    atand(+-inf) = +-90 which coincides with the special-case branch, so
    only the exact-horizontal zero-vs-180 cases need explicit handling.
    """
    dy = ey - sy
    dx = ex - sx
    ang = atand(dy / dx)                       # NaN only if dx==dy==0
    ang = jnp.where((dx == 0) & (dy != 0),
                    jnp.where(dy > 0, 90.0, -90.0), ang)
    ang = jnp.where((dx != 0) & (dy == 0),
                    jnp.where(dx > 0, 0.0, 180.0), ang)
    ang = jnp.where((ang < 0) & (sx > ex), ang + 180.0,
                    jnp.where((ang > 0) & (sx > ex), ang - 180.0, ang))
    return ang


def wrap_deg(ang):
    """Wrap degrees into (-180, 180] (reference while-loop semantics)."""
    w = jnp.mod(ang + 180.0, 360.0)
    w = jnp.where(w == 0.0, 360.0, w)
    return w - 180.0


def masked_compact_rows(values, mask, out_size: int, n_live_rows=None,
                        row_chunk: int = 8, fill=0):
    """Chunked-scatter masked_compact over a row-structured grid.

    values: (R, C, ...) rows of candidate entries; mask: (R, C).
    Bitwise-identical to masked_compact(values.reshape(-1, ...),
    mask.ravel(), out_size), but the scatter runs in row_chunk-row
    chunks under a fori_loop whose trip count covers only rows up to
    ``n_live_rows`` (a traced upper bound on rows containing ANY live
    entry; None derives it from the mask with one reduce - no prefix
    precondition).  On TPU the scatter is element-bound, so skipping
    dead rows is the win: a frame with ~10 live rows of a 64-row grid
    scatters ~2 chunks instead of the whole grid.

    The last chunk's start is clamped (R need not divide by
    row_chunk); slot positions and values are sliced with the SAME
    clamped start, so overlap rows re-scatter identical (slot, value)
    pairs - idempotent, never desynchronized (review r4 finding #1).

    Returns (compacted (out_size, ...), out_mask, count) - count is the
    raw live total (count > out_size flags overflow; excess rows are
    dropped, matching masked_compact)."""
    import jax

    R, C = mask.shape[:2]
    row_chunk = min(row_chunk, R)
    flat = mask.reshape(-1)
    pos = jnp.cumsum(flat.astype(jnp.int32)) - 1
    count = jnp.sum(flat.astype(jnp.int32))
    slot = jnp.where(flat & (pos < out_size), pos, out_size).reshape(R, C)
    if n_live_rows is None:
        live_any = jnp.any(mask, axis=1)
        n_live_rows = jnp.max(jnp.where(live_any, jnp.arange(R), -1)) + 1
    n_chunks = -(-R // row_chunk)
    trips = jnp.clip((n_live_rows + row_chunk - 1) // row_chunk,
                     0, n_chunks)
    trailing = values.shape[2:]

    def body(c, buf):
        r0 = jnp.minimum(c * row_chunk, R - row_chunk)
        sl = jax.lax.dynamic_slice_in_dim(slot, r0, row_chunk, 0)
        vl = jax.lax.dynamic_slice_in_dim(values, r0, row_chunk, 0)
        return buf.at[sl.reshape(-1)].set(
            vl.reshape((row_chunk * C,) + trailing))

    buf = jnp.full((out_size + 1,) + trailing, fill, dtype=values.dtype)
    buf = jax.lax.fori_loop(0, trips, body, buf)
    out_mask = jnp.arange(out_size) < count
    return buf[:out_size], out_mask, count


def masked_compact(values, mask, out_size: int, fill=0):
    """Stable compaction: gather rows of `values` where mask, preserving
    order, into a fixed-size buffer (out_size, ...).  Returns
    (compacted, out_mask, count).  Rows past out_size are dropped.

    TPU-friendly: one cumsum + one scatter, no sort.
    """
    mask = mask.astype(jnp.int32)
    pos = jnp.cumsum(mask) - 1                  # target slot per valid row
    count = jnp.sum(mask)
    ok = (mask > 0) & (pos < out_size)
    slot = jnp.where(ok, pos, out_size)         # dump invalid into overflow
    out_shape = (out_size + 1,) + values.shape[1:]
    out = jnp.full(out_shape, fill, dtype=values.dtype)
    out = out.at[slot].set(values)
    out_mask = jnp.arange(out_size) < count
    return out[:out_size], out_mask, count
