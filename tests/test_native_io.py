"""Native C++ parser vs numpy loaders (exact), plus the IO
micro-benchmark the reference kept in LSD/test.cpp:8-30."""

import os
import time

import numpy as np
import pytest

from lsdtpu.io import loaders
from lsdtpu.io.native import (available, load_doubles_native,
                              load_grid_native)


pytestmark = pytest.mark.skipif(not available(),
                                reason="no C++ toolchain")


def test_native_grid_matches_numpy(data_root):
    p = os.path.join(data_root, "data/mapParam.txt")
    param = loaders.load_map_param(p)
    path = os.path.join(data_root, "data/mapValue.txt")
    want = np.loadtxt(path, dtype=np.int64).ravel()
    want = want[:param.row * param.col].astype(np.uint8).reshape(
        param.row, param.col)
    got = load_grid_native(path, param.row, param.col)
    np.testing.assert_array_equal(got, want)


def test_native_doubles_matches_numpy(data_root):
    path = os.path.join(data_root, "data/Odom.txt")
    want = np.loadtxt(path, dtype=np.float64, ndmin=2)
    got = load_doubles_native(path).reshape(-1, want.shape[1])
    np.testing.assert_array_equal(got, want)


def test_native_handles_inf(data_root):
    path = os.path.join(data_root, "data/Lidar.txt")
    want = np.loadtxt(path, dtype=np.float64, ndmin=2)
    got = load_doubles_native(path).reshape(-1, 2)
    np.testing.assert_array_equal(got, want)


def test_native_faster_than_numpy(data_root):
    """The test.cpp experiment, rebuilt: native parse of the big grid
    must beat numpy.loadtxt comfortably."""
    p = os.path.join(data_root, "data/mapParam.txt")
    param = loaders.load_map_param(p)
    path = os.path.join(data_root, "data/mapValue.txt")
    t0 = time.perf_counter()
    load_grid_native(path, param.row, param.col)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.loadtxt(path, dtype=np.int64)
    t_numpy = time.perf_counter() - t0
    assert t_native < t_numpy, (t_native, t_numpy)


def test_prefetch_feeder_order_and_laziness():
    from lsdtpu.io.feeder import PrefetchFeeder
    calls = []

    def slowish(x):
        calls.append(x)
        return x * 2

    out = list(PrefetchFeeder(slowish, list(range(10)), workers=3))
    assert out == [x * 2 for x in range(10)]
    assert sorted(calls) == list(range(10))
