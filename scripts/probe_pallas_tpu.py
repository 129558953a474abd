"""Real-chip probe of the candidate-scoring kernels.

Measured 2026-08-18 on the v5e chip (jax 0.9.0):

* The Pallas score kernel (ops/score_pallas.py) CANNOT lower on real
  TPU: its cache lookup is an arbitrary-index gather (`jnp.take` on a
  flat VMEM table), and Mosaic only lowers `lax.gather` in the two
  `take_along_axis` forms (jax/_src/pallas/mosaic/lowering.py:2465-2525).
  Probed directly on-chip:
    - flat `jnp.take`               -> "Only 2D gather is supported"
    - `take_along_axis(axis=0)`     -> backend compiler crash (HTTP 500)
    - `take_along_axis(axis=1)`     -> OK (within-sublane 128-lane table)
  A within-sublane gather cannot express a random (row, col) lookup into
  a 1377x428 field without a cross-sublane shuffle (itself a gather), so
  the kernel stays interpret-mode-only; the XLA path uses the TPU's
  native gather instruction and is already memory-bound-fast.

This script verifies the XLA scoring path on-chip and times it; if the
Pallas kernel ever becomes lowerable (newer Mosaic), flip TRY_PALLAS.

    timeout 300 python scripts/probe_pallas_tpu.py
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lsdtpu.io import load_dataset
from lsdtpu.match import associate as assoc
from lsdtpu.ops.score_pallas import score_candidates_pallas
from lsdtpu.oracle import driver as odrv
from lsdtpu.oracle import rdp as ordp

TRY_PALLAS = os.environ.get("LSDTPU_TRY_PALLAS", "0") == "1"


def main():
    print("devices:", jax.devices())
    ds = load_dataset("/root/reference/data")
    art = odrv.prepare_map(ds.map_value, ds.param.resol)
    fr = ds.frames[0]
    fs = ordp.feature_scan(fr[:, 0].astype(np.float64),
                           fr[:, 1].astype(np.float64), ds.param.resol,
                           ds.param.ori_x, ds.param.ori_y)
    S, M, P = 64, 256, 2048
    sl = np.zeros((S, 10), np.float32)
    sl[:len(fs.lines_info)] = fs.lines_info
    sm = np.zeros(S, bool); sm[:len(fs.lines_info)] = True
    ml = np.zeros((M, 10), np.float32)
    ml[:len(art.lines_info)] = art.lines_info
    mm = np.zeros(M, bool); mm[:len(art.lines_info)] = True

    ys, xs = np.nonzero(fs.line_im)
    pix = np.zeros((P, 2), np.int32)
    pmask = np.zeros(P, bool)
    k = min(len(xs), P)
    pix[:k, 0] = xs[:k]; pix[:k, 1] = ys[:k]
    pmask[:k] = True

    lp = jnp.asarray(np.floor(np.array(fs.lidar_pos) + 0.5), jnp.float32)
    cand = assoc.generate_candidates(
        jnp.asarray(sl), jnp.asarray(sm), jnp.asarray(ml), jnp.asarray(mm),
        lp, jnp.asarray([-1.0, -1.0, 0.0], jnp.float32),
        max_candidates=512)
    cache = jnp.asarray(art.map_cache, jnp.float32)
    pixj, pmj = jnp.asarray(pix), jnp.asarray(pmask)

    t0 = time.time()
    want = np.asarray(assoc.score_candidates(cand, pixj, pmj, cache))
    print(f"XLA path ok ({time.time()-t0:.1f}s incl. compile), "
          f"{np.isfinite(want).sum()} finite scores")

    if TRY_PALLAS:
        t0 = time.time()
        got = np.asarray(score_candidates_pallas(cand, pixj, pmj, cache))
        print(f"Pallas path ok ({time.time()-t0:.1f}s incl. compile)")
        fin = np.isfinite(want)
        assert (fin == np.isfinite(got)).all()
        np.testing.assert_allclose(got[fin], want[fin], rtol=2e-6, atol=2e-6)
        print("PARITY OK")

    jitted = jax.jit(lambda c, px, pm, mc: assoc.score_candidates(
        c, px, pm, mc))
    fn = lambda: jitted(cand, pixj, pmj, cache)
    fn().block_until_ready()
    n = 200
    t0 = time.time()
    for _ in range(n):
        r = fn()
    r.block_until_ready()
    dt = (time.time() - t0) / n
    print(f"xla score_candidates: {dt*1e6:.1f} us/call "
          f"(512 cand x 2048 px = 1.05M gathers); NOTE: per-call time "
          f"through the axon tunnel is RTT-dominated (~7 ms/dispatch) - "
          f"bench.py's one-dispatch rollout is the honest device number")


if __name__ == "__main__":
    main()
