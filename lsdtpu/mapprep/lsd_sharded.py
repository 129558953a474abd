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

The dense prologue (1<->255 remap, Gaussian downsample, gradient) is
ALSO sharded (round 5, `prologue_sharded` - on by default here): the
input map and the x-pass aux matrix are the only full-resolution
intermediates (the downsampled field is sca^2 ~ 0.09x the map), so
each device receives a host-prepared halo-extended row slab of the
remapped map (the distance_sharded slab pattern), runs the x-pass
row-locally, gathers its own output rows' y-taps (the halo covers
every jy window incl. one extra gauss row for the gradient's shifted
differences), and returns its mag/deg/banned block.  Every output
cell is produced by exactly the same sequential tap sums and
elementwise ops as the unsharded prologue and the only cross-slab
reduction (max_grad) is an order-free max, so the sharded prologue is
BITWISE the single-device one (tests/test_lsd_sharded.py).
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


_PROLOGUE_RUNNERS: dict = {}


def _prologue_runner(mesh: Mesh, n_slabs: int, lin: int, w: int,
                     lo1: int, new_x: int, new_y: int, h_size: int,
                     grad_thre: float, dt):
    key = (mesh, n_slabs, lin, w, lo1, new_x, new_y, h_size,
           grad_thre, jnp.dtype(dt))
    fn = _PROLOGUE_RUNNERS.get(key)
    if fn is not None:
        return fn

    from lsdtpu.mapprep.gaussian import tap_sum_cols, tap_sum_rows
    from lsdtpu.mapprep.gradient import gradient_core

    def device_fn(img_slabs, jx, kx, jy_loc, ky_s):
        # img_slabs: (S/n_dev, Lin, W); jx/kx: (new_x, hS) replicated;
        # jy_loc/ky_s: (S/n_dev, Lo1, hS) per-slab local taps.
        # ONE shared numeric body with the unsharded chain: the tap
        # sums and the gradient core are the gaussian.py/gradient.py
        # functions themselves (sequential reference op order,
        # myLSD.cpp:428-433 / :145-174).
        def one(img, jyl, kys):
            aux = tap_sum_cols(img, jx, kx)
            # y-pass over this slab's halo-extended aux rows: produces
            # gauss rows [lo-1, hi) (one extra row for the gradient)
            g = tap_sum_rows(aux, jyl, kys)
            # the slab's m rows are global out rows [lo, hi)
            m, v = gradient_core(g)
            mag = jnp.zeros((lo1 - 1, new_x), dt).at[:, 1:].set(m)
            deg = jnp.zeros((lo1 - 1, new_x), dt).at[:, 1:].set(v)
            return mag, deg
        return jax.vmap(one)(img_slabs, jy_loc, ky_s)

    sfn = shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(MP_AXIS), P(), P(), P(MP_AXIS), P(MP_AXIS)),
        out_specs=(P(MP_AXIS), P(MP_AXIS)), check_vma=False)

    def full(img_slabs, jx, kx, jy_loc, ky_s):
        mag_s, deg_s = sfn(img_slabs, jx, kx, jy_loc, ky_s)
        lo = lo1 - 1
        mag = mag_s.reshape(n_slabs * lo, new_x)[:new_y]
        deg = deg_s.reshape(n_slabs * lo, new_x)[:new_y]
        # global row 0 is never written by the reference prologue
        mag = mag.at[0].set(0.0)
        deg = deg.at[0].set(0.0)
        banned = jnp.zeros((new_y, new_x), bool).at[1:, 1:].set(
            mag[1:, 1:] < grad_thre)
        return mag, deg, banned, jnp.max(mag)

    fn = _PROLOGUE_RUNNERS[key] = jax.jit(full)
    return fn


def prologue_sharded(map_gray, sca: float, sig: float, deg_thre: float,
                     mesh: Mesh, blocks_per_device: int = 1):
    """Row-block-sharded LSD dense prologue, BITWISE the unsharded
    remap + gaussian_sampler + gradient_field chain.

    map_gray: (H, W) host array.  Giant maps never materialize whole
    on a device: the slab stack is passed to the jitted shard_map as
    RAW host numpy (the distance_sharded pattern - each device
    receives only its in_spec shard) and the downsampled outputs
    (~sca^2 of the map) stay on device for the seed walk.  Returns
    (remapped (H, W) numpy, mag, deg, banned, max_grad,
    (new_row, new_col)) with mag/deg/banned/max_grad as device
    arrays - exactly gradient_field's outputs.

    Reference: LSD/myLSD.cpp:135-174 (remap + prologue),
    :378-484 (GaussianSampler)."""
    import numpy as np

    from lsdtpu.mapprep.gaussian import _reflect_indices, kernel_bank

    grid = np.asarray(map_gray)
    y_lim, x_lim = grid.shape
    dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    npdt = np.float64 if jax.config.jax_enable_x64 else np.float32

    # in-place 1<->255 remap skipping global row/col 0 (myLSD.cpp:135-142)
    remapped = grid.copy()
    sub = remapped[1:, 1:]
    sub_new = np.where(sub == 1, np.asarray(255, grid.dtype),
                       np.where(sub == 255, np.asarray(0, grid.dtype),
                                sub))
    remapped[1:, 1:] = sub_new

    ker, h = kernel_bank(sca, sig)
    new_x = int(math.floor(x_lim * sca))
    new_y = int(math.floor(y_lim * sca))
    xc = np.floor(np.arange(new_x) / sca + 0.5).astype(np.int64)
    jx = _reflect_indices(xc, h, x_lim).astype(np.int32)
    kx = ker[np.arange(new_x) % 3].astype(npdt)
    yc = np.floor(np.arange(new_y) / sca + 0.5).astype(np.int64)
    jy = _reflect_indices(yc, h, y_lim).astype(np.int64)
    ky = ker[np.arange(new_y) % 3].astype(npdt)
    h_size = 2 * h + 1

    n_dev = mesh.devices.size
    S = n_dev * blocks_per_device
    Lo = -(-new_y // S)
    Lo1 = Lo + 1   # one leading gauss row feeds the gradient's shifts

    # per-slab gauss-row ranges [lo-1, hi) and the img rows their jy
    # windows touch; slab 0's leading row is a dummy (global row 0's
    # mag/deg are fixed to the reference's untouched zeros below)
    rows_g, spans = [], []
    for d in range(S):
        lo = d * Lo
        # rows [lo-1, lo+Lo): local m row i pairs g rows (i, i+1) ->
        # global m row rg[i+1].  Slab 0's leading -1 clips to a dummy
        # copy of row 0 (its m output is global row 0, fixed below);
        # out-of-range tail rows clip to dummies (sliced off)
        rg = np.clip(np.arange(lo - 1, lo - 1 + Lo1), 0, new_y - 1)
        rows_g.append(rg)
        spans.append((int(jy[rg].min()), int(jy[rg].max())))
    lin = max(hi_ - lo_ + 1 for lo_, hi_ in spans)

    img_slabs = np.zeros((S, lin, x_lim), npdt)
    jy_loc = np.zeros((S, Lo1, h_size), np.int32)
    ky_s = np.zeros((S, Lo1, h_size), npdt)
    for d in range(S):
        lo_i, hi_i = spans[d]
        take = remapped[lo_i:hi_i + 1].astype(npdt)
        img_slabs[d, :take.shape[0]] = take
        jy_loc[d] = (jy[rows_g[d]] - lo_i).astype(np.int32)
        ky_s[d] = ky[rows_g[d]]

    grad_thre = 2.0 / math.sin(deg_thre)
    run = _prologue_runner(mesh, S, lin, x_lim, Lo1, new_x, new_y,
                           h_size, float(grad_thre), dt)
    with mesh:
        # raw numpy in: jit shards each input per its in_spec, so the
        # full-resolution slab stack is never staged on one device
        mag, deg, banned, max_grad = run(img_slabs, jx, kx, jy_loc,
                                         ky_s)
    return remapped, mag, deg, banned, max_grad, (new_y, new_x)


def line_segment_detector_sharded(map_gray, sca: float = 0.3,
                                  sig: float = 0.6,
                                  ang_thre: float = 22.5,
                                  den_thre: float = 0.7,
                                  pse_bin: int = 1024,
                                  max_lines: int = 256,
                                  nfa_kernel: str = "xla",
                                  mesh: Optional[Mesh] = None,
                                  shard_prologue: bool = True):
    """Row-block-sharded LSD ("wave" tier).  Same returns as
    line_segment_detector: (lines (max_lines, 10), mask, n_lines,
    remapped_map).

    shard_prologue=True (default) runs the remap/downsample/gradient
    prologue slab-sharded too (prologue_sharded - bitwise the
    unsharded chain), so no device ever materializes the full-
    resolution map; False keeps the round-4 single-device prologue."""
    if mesh is None:
        mesh = make_mesh_lsd()
    n_dev = mesh.devices.size
    dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    deg_thre = ang_thre / 180.0 * math.pi

    if shard_prologue:
        remapped, mag, deg_map, prebanned, max_grad, (new_row, new_col) \
            = prologue_sharded(map_gray, sca, sig, deg_thre, mesh)
        mag = jnp.asarray(mag)
        deg_map = jnp.asarray(deg_map)
        prebanned = jnp.asarray(prebanned)
        max_grad = jnp.asarray(max_grad, dt)
    else:
        # single-device prologue: in-place 1<->255 remap skipping
        # row/col 0 (myLSD.cpp:135-142) + downsample + field
        map_gray = jnp.asarray(map_gray)
        sub = map_gray[1:, 1:]
        sub = jnp.where(sub == 1, jnp.asarray(255, map_gray.dtype),
                        jnp.where(sub == 255,
                                  jnp.asarray(0, map_gray.dtype), sub))
        remapped = map_gray.at[1:, 1:].set(sub)
        gauss = gaussian_sampler(remapped.astype(dt), sca, sig)
        new_row, new_col = gauss.shape
        mag, deg_map, prebanned, max_grad = gradient_field(gauss,
                                                           deg_thre)
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
