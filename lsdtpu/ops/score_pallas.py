"""Pallas TPU kernel for candidate scoring (the CalcScore hot loop).

The hottest op in the online pipeline (reference: CalcScore,
LSD/myFA.cpp:357-396, executed #scanLines x #mapLines x 4 times per
frame on the pthread pool): rigidly transform the scan pixel cloud per
candidate and average the mapCache prior at the landed pixels.

Kernel layout:
  * grid over candidate blocks (BK candidates / program);
  * the distance field stays resident in VMEM across the whole grid
    (one HBM->VMEM load for all K candidates - the XLA fallback reloads
    tiles per gather);
  * per candidate: the (P,) rigid transform is VPU element-wise math,
    the cache lookup is one dynamic gather from the flat VMEM field,
    and the three reductions (valid count, in-map count, distance sum)
    finish the score.

The pixel axis is padded to a (P8, 128) tile so every op is natively
tileable.  `score_candidates_pallas` is a drop-in for
associate.score_candidates (same masking/penalty semantics, same
results to f32 rounding); `interpret=True` runs the kernel on CPU for
tests.

REAL-CHIP STATUS (probed 2026-08-18, v5e via axon, jax 0.9.0): the
kernel does NOT lower on actual TPU hardware.  Its cache lookup is an
arbitrary-index gather (flat `jnp.take` into the VMEM-resident field),
and Mosaic only lowers `lax.gather` in the two `take_along_axis`
batched forms (jax/_src/pallas/mosaic/lowering.py:2465-2525); probing
on-chip: flat take -> "Only 2D gather is supported";
take_along_axis(axis=0) -> backend compiler crash; axis=1 (within-
sublane 128-lane table) -> OK but cannot express a random (row, col)
lookup into a map-sized field without a cross-sublane shuffle (itself
a gather).  One-hot-matmul or per-pixel scalar-loop reformulations are
orders of magnitude slower than XLA's native gather instruction, which
the default `score_kernel="xla"` path already uses, so on TPU the
runtime silently routes "pallas" to the XLA path (runtime/loop.py) and
this kernel remains an interpret-mode-validated blueprint for a future
Mosaic with general gather.  See scripts/probe_pallas_tpu.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BK = 8          # candidates per program
LANES = 128


def _score_kernel(meta_ref, cand_ref, px_ref, py_ref, pmask_ref,
                  cache_ref, out_ref):
    """One program scores BK candidates against the whole pixel cloud.

    meta_ref (SMEM): [rows, cols, pad_cols, z_cap, penalty, valid_ratio]
    cand_ref (VMEM): (BK, 8) [ca, sa, sx, sy, mx, my, mask, _pad]
    px/py    (VMEM): (P8, 128) pixel coords (f32), masked by pmask
    cache    (VMEM): (HW8, 128) flattened distance field
    out      (VMEM): (1, BK) scores
    """
    rows = meta_ref[0]
    cols = meta_ref[1]
    pad_cols = meta_ref[2]
    z_cap = meta_ref[3]
    penalty = meta_ref[4]
    valid_ratio = meta_ref[5]

    px = px_ref[:]
    py = py_ref[:]
    pmask = pmask_ref[:] > 0.0
    cache_flat = cache_ref[:].reshape(-1)
    n_all = jnp.sum(jnp.where(pmask, 1.0, 0.0))   # loop-invariant

    def one(i, _):
        ca = cand_ref[i, 0]
        sa = cand_ref[i, 1]
        sx = cand_ref[i, 2]
        sy = cand_ref[i, 3]
        mx = cand_ref[i, 4]
        my = cand_ref[i, 5]
        live = cand_ref[i, 6] > 0.0

        tx = (px - sx) * ca - (py - sy) * sa + mx
        ty = (px - sx) * sa + (py - sy) * ca + my
        # C round(): half away from zero (geometry.c_round)
        ix = jnp.where(tx >= 0, jnp.floor(tx + 0.5), jnp.ceil(tx - 0.5))
        iy = jnp.where(ty >= 0, jnp.floor(ty + 0.5), jnp.ceil(ty - 0.5))
        inside = (ix >= 0) & (ix < cols) & (iy >= 0) & (iy < rows) & pmask
        lin = (jnp.clip(iy, 0, rows - 1) * pad_cols +
               jnp.clip(ix, 0, cols - 1)).astype(jnp.int32)
        vals = jnp.take(cache_flat, lin.reshape(-1),
                        mode="clip").reshape(lin.shape)
        at_cap = vals >= z_cap
        contrib = jnp.where(at_cap, penalty, vals)
        n_in = jnp.sum(jnp.where(inside, 1.0, 0.0))
        s = jnp.sum(jnp.where(inside, contrib, 0.0))
        score = s / n_in + penalty * (n_all - n_in) / n_all
        ok = live & (n_in >= valid_ratio * n_all) & (n_in > 0)
        inf = jnp.asarray(jnp.inf, jnp.float32)
        out_ref[0, i] = jnp.where(ok, score, inf).astype(jnp.float32)
        return 0

    jax.lax.fori_loop(0, BK, one, 0)


@functools.partial(jax.jit, static_argnames=(
    "z_occ_max_dis", "max_dist_penalty", "valid_ratio", "interpret"))
def score_candidates_pallas(cand, pixels, pixels_mask, map_cache,
                            rows=None, cols=None,
                            z_occ_max_dis: float = 1.0,
                            max_dist_penalty: float = 10.0,
                            valid_ratio: float = 0.7,
                            interpret: bool = False) -> jnp.ndarray:
    """Drop-in for associate.score_candidates, as one Pallas kernel.

    cand: match.associate.Candidates; pixels (P, 2) int32;
    map_cache (H, W) f32.  Returns (K,) scores.
    """
    pad_rows, pad_cols = map_cache.shape
    if pad_rows * pad_cols >= 2 ** 24:
        # the kernel's flat cache index is computed in f32 (the meta is
        # SMEM f32): above 2^24 cells odd indices are not representable
        # and the gather would silently read neighboring cells
        raise ValueError(
            f"map {pad_rows}x{pad_cols} exceeds the kernel's f32 index "
            "range (2^24 cells); use the XLA scorer or mp sharding")
    if rows is None:
        rows = pad_rows
    if cols is None:
        cols = pad_cols
    K = cand.pose.shape[0]
    P = pixels.shape[0]
    f32 = jnp.float32

    Kp = -(-K // BK) * BK
    P8 = -(-P // LANES)
    px = jnp.zeros((P8 * LANES,), f32).at[:P].set(
        pixels[:, 0].astype(f32)).reshape(P8, LANES)
    py = jnp.zeros((P8 * LANES,), f32).at[:P].set(
        pixels[:, 1].astype(f32)).reshape(P8, LANES)
    pm = jnp.zeros((P8 * LANES,), f32).at[:P].set(
        pixels_mask.astype(f32)).reshape(P8, LANES)

    feats = jnp.stack([cand.ca.astype(f32), cand.sa.astype(f32),
                       cand.sx.astype(f32), cand.sy.astype(f32),
                       cand.mx.astype(f32), cand.my.astype(f32),
                       cand.mask.astype(f32),
                       jnp.zeros((K,), f32)], axis=-1)       # (K, 8)
    feats = jnp.zeros((Kp, 8), f32).at[:K].set(feats)

    HW = pad_rows * pad_cols
    HW8 = -(-HW // LANES)
    cache_flat = jnp.zeros((HW8 * LANES,), f32).at[:HW].set(
        map_cache.reshape(-1).astype(f32)).reshape(HW8, LANES)

    meta = jnp.array([rows, cols, pad_cols, z_occ_max_dis,
                      max_dist_penalty, valid_ratio], f32)

    out = pl.pallas_call(
        _score_kernel,
        grid=(Kp // BK,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BK, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P8, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P8, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P8, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HW8, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Kp), f32),
        interpret=interpret,
    )(meta, feats, px, py, pm, cache_flat)
    scores = out.reshape(-1)[:K]
    return jnp.where(cand.mask, scores.astype(cand.ca.dtype), jnp.inf)
