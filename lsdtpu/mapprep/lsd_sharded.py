"""Giant-map LSD: the seed-walk's inner passes sharded over row blocks.

Closes SURVEY.md 5.7c for the LSD stage (the distance field is already
block-built - mapprep/distance_sharded.py): for maps too large for one
device, `line_segment_detector_sharded` runs the SAME sequential seed
walk as the single-device driver (mapprep/lsd._seed_walk - literally
one shared body), but every full-field pass inside it is block-local
plus one collective:

  * seed selection: local masked argmax -> pmax of the bin + pmin of
    the first global flat index (order-isomorphic to the stable
    single-device walk);
  * wave growth: per-wave 8-neighbor dilation with a 1-row ppermute
    halo exchange in each direction, circular-mean sums psum'd
    (mapprep/lsd._grow / _dilate8);
  * rectangle moments / refinement: masked reductions -> psum
    (mapprep/rect.py row0/axis parameters);
  * NFA rasterize+count: block counts -> psum; the binomial tail runs
    replicated (mapprep/nfa.py).

All scalar state is replicated across devices, so every device carries
the identical line list; output is taken from any one.  Line sets equal
the single-device "wave" tier up to float reduction-order noise (block
psum vs full-field sum - the same tier as XLA's own reduce reordering);
the bit-parity "fifo" tier is inherently sequential and stays
single-device (reference: the FIFO queue of RegionGrower,
LSD/myLSD.cpp:491-590, is a global order).

The dense prologue (1<->255 remap, Gaussian downsample, gradient) runs
unsharded: they are single local passes whose cost is linear and tiny
next to the seed walk's O(lines x field) inner loops; block-local slab
variants (the distance_sharded halo trick) are the natural extension if
a map ever outgrows one device's memory for even a single pass.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from lsdtpu import geometry as geo
from lsdtpu.mapprep.gaussian import gaussian_sampler
from lsdtpu.mapprep.gradient import gradient_field
from lsdtpu.mapprep.lsd import _seed_walk

MP_AXIS = "mp"


def make_mesh_lsd(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the downsampled field's row-block axis."""
    from lsdtpu.runtime.shard import make_mesh_1d
    m = make_mesh_1d(n_devices)
    return Mesh(m.devices, (MP_AXIS,))


_RUNNERS: dict = {}


def _runner(mesh: Mesh, sca, sig, ang_thre, den_thre, pse_bin,
            max_lines, nfa_kernel):
    key = (mesh, sca, sig, ang_thre, den_thre, pse_bin, max_lines,
           nfa_kernel)
    fn = _RUNNERS.get(key)
    if fn is not None:
        return fn

    def device_fn(mag, deg_map, prebanned, max_grad, log_nt, n_rows):
        dt = mag.dtype
        row0 = jax.lax.axis_index(MP_AXIS) * mag.shape[0]
        lines, n = _seed_walk(mag, deg_map, prebanned, max_grad[0],
                              log_nt[0], sca, ang_thre, den_thre,
                              pse_bin, max_lines, "wave", nfa_kernel,
                              dt, row0=row0, axis=MP_AXIS,
                              n_rows=n_rows[0])
        return lines, n

    sfn = shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(MP_AXIS), P(MP_AXIS), P(MP_AXIS), P(), P(), P()),
        # every device carries the identical replicated line list
        out_specs=(P(), P()), check_vma=False)
    fn = _RUNNERS[key] = jax.jit(sfn)
    return fn


def line_segment_detector_sharded(map_gray, sca: float = 0.3,
                                  sig: float = 0.6,
                                  ang_thre: float = 22.5,
                                  den_thre: float = 0.7,
                                  pse_bin: int = 1024,
                                  max_lines: int = 256,
                                  nfa_kernel: str = "xla",
                                  mesh: Optional[Mesh] = None):
    """Row-block-sharded LSD ("wave" tier).  Same returns as
    line_segment_detector: (lines (max_lines, 10), mask, n_lines,
    remapped_map)."""
    if mesh is None:
        mesh = make_mesh_lsd()
    n_dev = mesh.devices.size
    map_gray = jnp.asarray(map_gray)
    ori_row, ori_col = map_gray.shape
    dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    # dense prologue, unsharded (see module docstring): in-place 1<->255
    # remap skipping row/col 0 (myLSD.cpp:135-142) + downsample + field
    sub = map_gray[1:, 1:]
    sub = jnp.where(sub == 1, jnp.asarray(255, map_gray.dtype),
                    jnp.where(sub == 255, jnp.asarray(0, map_gray.dtype),
                              sub))
    remapped = map_gray.at[1:, 1:].set(sub)
    gauss = gaussian_sampler(remapped.astype(dt), sca, sig)
    new_row, new_col = gauss.shape
    deg_thre = ang_thre / 180.0 * math.pi
    mag, deg_map, prebanned, max_grad = gradient_field(gauss, deg_thre)
    H, W = mag.shape
    log_nt = 5 * (math.log10(new_row) + math.log10(new_col)) / 2.0

    # pad the row axis to the mesh; padding rows are prebanned (never
    # seed, never grow) and masked out of the NFA counts via n_rows
    L = -(-H // n_dev)
    pad = n_dev * L - H
    if pad:
        mag = jnp.pad(mag, ((0, pad), (0, 0)))
        deg_map = jnp.pad(deg_map, ((0, pad), (0, 0)))
        prebanned = jnp.pad(prebanned, ((0, pad), (0, 0)),
                            constant_values=True)

    run = _runner(mesh, float(sca), float(sig), float(ang_thre),
                  float(den_thre), int(pse_bin), int(max_lines),
                  nfa_kernel)
    with mesh:
        lines, n = run(mag, deg_map, prebanned,
                       jnp.reshape(max_grad, (1,)),
                       jnp.full((1,), log_nt, dt),
                       jnp.full((1,), H, jnp.int32))
    mask = jnp.arange(max_lines) < n
    infos = geo.lines_info_from_endpoints(lines[:, 0], lines[:, 1],
                                          lines[:, 2], lines[:, 3])
    infos = jnp.where(mask[:, None], infos, 0.0)
    return infos, mask, n, remapped
