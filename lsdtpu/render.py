"""Line-image rasterization: the reference's lineIm outputs.

The reference emits a rasterized image alongside every line set
(structLSD.lineIm, myLSD.cpp:296-357; structFeatureScan.lineIm,
myRDP.cpp:96-161) - used for display and by the legacy matcher.  Here
the per-line pixel sets are evaluated analytically on a fixed
(line, step) grid (major-axis stepping + C rounding, the same closed
form as scan/featurize.py) and scattered into the image in one op.

Quirks kept: out-of-bounds samples collapse to the (0, 0) sentinel and
any sample on row 0 or column 0 is dropped (myLSD.cpp:325-355).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lsdtpu import geometry as geo


@partial(jax.jit, static_argnames=("rows", "cols", "max_steps"))
def render_line_image(lines, lines_mask, rows: int, cols: int,
                      max_steps: int | None = None) -> jnp.ndarray:
    """lines: (L, 10) structLinesInfo rows; returns (rows, cols) uint8
    image with line pixels set to 255.

    max_steps defaults to the longest possible major-axis run on this
    canvas (max(rows, cols) + 2), so no in-bounds line can ever be
    truncated; pass a smaller cap only when the lines are known short
    and the (L, T) grid must stay small."""
    if max_steps is None:
        max_steps = max(rows, cols) + 2
    dt = lines.dtype
    x1 = lines[:, geo.X1]
    y1 = lines[:, geo.Y1]
    x2 = lines[:, geo.X2]
    y2 = lines[:, geo.Y2]
    k = lines[:, geo.K]

    x_low = jnp.floor(jnp.minimum(x1, x2))
    x_high = jnp.ceil(jnp.maximum(x1, x2))
    y_low = jnp.floor(jnp.minimum(y1, y2))
    y_high = jnp.ceil(jnp.maximum(y1, y2))
    x_major = jnp.abs(x2 - x1) > jnp.abs(y2 - y1)

    t = jnp.arange(max_steps, dtype=dt)[None, :]
    xxa = x_low[:, None] + t
    yya = geo.c_round((xxa - x1[:, None]) * k[:, None] + y1[:, None])
    yyb = y_low[:, None] + t
    xxb = geo.c_round((yyb - y1[:, None]) / k[:, None] + x1[:, None])
    xx = jnp.where(x_major[:, None], xxa, xxb)
    yy = jnp.where(x_major[:, None], yya, yyb)
    n_steps = jnp.where(x_major, x_high - x_low, y_high - y_low) + 1.0

    oob = (xx < 0) | (xx >= cols) | (yy < 0) | (yy >= rows)
    xx = jnp.where(oob, 0.0, xx)
    yy = jnp.where(oob, 0.0, yy)
    mark = (t < n_steps[:, None]) & (xx != 0) & (yy != 0) & \
        lines_mask[:, None]

    img = jnp.zeros((rows, cols), jnp.uint8)
    flat = (yy.astype(jnp.int32) * cols + xx.astype(jnp.int32)).reshape(-1)
    val = jnp.where(mark.reshape(-1), jnp.uint8(255), jnp.uint8(0))
    img = img.reshape(-1).at[flat].max(val).reshape(rows, cols)
    return img
