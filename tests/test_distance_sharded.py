"""Sharded mapCache build (mapprep/distance_sharded.py): block-parallel
over the 8-device mesh must be BIT-IDENTICAL to the single-device
kernel - FIFO-rank ownership localizes within the halo (module
docstring has the argument)."""

import jax
import numpy as np
import pytest

from lsdtpu.mapprep.distance import create_map_cache
from lsdtpu.mapprep.distance_sharded import (create_map_cache_sharded,
                                             make_mesh_prep)


def test_sharded_matches_single_device_bundled_map(dataset_small):
    ds = dataset_small
    want = np.asarray(create_map_cache(ds.map_value, ds.param.resol, 1.0))
    mesh = make_mesh_prep()
    assert mesh.devices.size == 8
    got = create_map_cache_sharded(ds.map_value, ds.param.resol, 1.0,
                                   mesh=mesh)
    np.testing.assert_array_equal(got, want)


def test_sharded_matches_on_random_grids():
    """Randomized occupancy (contested wavefronts everywhere), several
    block counts including blocks smaller than the halo."""
    rng = np.random.default_rng(7)
    grid = (rng.random((97, 61)) < 0.04).astype(np.uint8)
    want = np.asarray(create_map_cache(jax.numpy.asarray(grid), 0.05, 1.0))
    for n_dev, bpd in ((2, 1), (4, 1), (8, 1), (4, 3)):
        mesh = make_mesh_prep(n_devices=n_dev)
        got = create_map_cache_sharded(grid, 0.05, 1.0, mesh=mesh,
                                       blocks_per_device=bpd)
        np.testing.assert_array_equal(got, want,
                                      err_msg=f"n_dev={n_dev} bpd={bpd}")


def test_sharded_z2_ros_cap(dataset_small):
    """ROS cap z=2 (larger halo) stays exact."""
    ds = dataset_small
    want = np.asarray(create_map_cache(ds.map_value, ds.param.resol, 2.0))
    got = create_map_cache_sharded(ds.map_value, ds.param.resol, 2.0,
                                   mesh=make_mesh_prep(n_devices=4))
    np.testing.assert_array_equal(got, want)
