"""Giant-map mapCache: the distance-field build sharded over devices.

Closes the last single-device piece of map prep (SURVEY.md 5.7c): for
maps too large to prep on one chip, the BFS-approximate distance field
(mapprep/distance.py) is built block-parallel with EXACT equality to
the single-device build.

Why blocks are exactly independent: propagation stops once the parent's
distance to its source exceeds cell_radius = floor(z_occ_max_dis/res)
(myLSD.cpp:47-58), so any wavefront that can touch a cell originates
within cell_radius + 2 cells of it - a row block extended by that halo
contains every source and every contested parent that can influence its
interior.  FIFO ownership also localizes: the initial queue ranks are
the row-major order of occupied cells (myLSD.cpp:25-42), and row-major
order RESTRICTED to a slab is order-isomorphic to the global order;
each wave's dense re-rank (argsort of (parent_rank, direction) keys)
preserves that isomorphism inductively, and ownership contests only
ever compare parents inside the same 3x3 neighborhood - all within the
halo.  So running the unmodified single-device kernel on each
halo-extended slab and keeping interiors reproduces the global field
bit-for-bit (test_distance_sharded.py).

Execution: one shard_map over a 1-D mesh, zero collectives (the halo
exchange is the host-side slab construction; for a production pipeline
feeding from sharded storage it becomes one ppermute of halo rows).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from lsdtpu.mapprep.distance import create_map_cache
from lsdtpu.runtime.shard import DP_AXIS


def make_mesh_prep(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the map's row-block axis."""
    from lsdtpu.runtime.shard import make_mesh_1d
    return make_mesh_1d(n_devices)


_RUNNERS: dict = {}


def _runner(mesh: Mesh, res: float, z: float, halo: int):
    key = (mesh, res, z, halo)
    fn = _RUNNERS.get(key)
    if fn is not None:
        return fn

    def device_fn(slabs):
        # slabs: (S/n_dev, halo + block + halo, W) - the unmodified
        # single-device kernel runs per slab; interiors are exact
        def one(slab):
            cache = create_map_cache(slab, res, z)
            return cache[halo:cache.shape[0] - halo]

        return jax.vmap(one)(slabs)

    sfn = shard_map(device_fn, mesh=mesh, in_specs=(P(DP_AXIS),),
                    out_specs=P(DP_AXIS), check_vma=False)
    fn = _RUNNERS[key] = jax.jit(sfn)
    return fn


def create_map_cache_sharded(map_gray: np.ndarray, res: float,
                             z_occ_max_dis: float = 1.0,
                             mesh: Optional[Mesh] = None,
                             blocks_per_device: int = 1) -> np.ndarray:
    """Block-parallel distance field, bit-identical to
    create_map_cache(map_gray, res, z_occ_max_dis).

    map_gray: (H, W) occupancy (occupied == 1, pre-remap values).
    mesh: 1-D mesh (make_mesh_prep()); defaults to all devices.
    """
    if mesh is None:
        mesh = make_mesh_prep()
    n_dev = mesh.devices.size
    S = n_dev * blocks_per_device
    H, W = map_gray.shape
    halo = math.floor(z_occ_max_dis / res) + 2
    L = -(-H // S)

    grid = np.asarray(map_gray)
    # halo-extended slabs; outside the map there are no occupied cells,
    # so zero padding (free space) leaves interiors untouched
    padded = np.zeros((S * L + 2 * halo, W), grid.dtype)
    padded[halo:halo + H] = grid
    slabs = np.stack([padded[s * L:s * L + L + 2 * halo]
                      for s in range(S)])
    with mesh:
        out = _runner(mesh, float(res), float(z_occ_max_dis), halo)(slabs)
    return np.asarray(out).reshape(S * L, W)[:H]
