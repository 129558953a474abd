"""Test configuration: force the CPU backend with 8 virtual devices so
sharding/collective code paths run without TPU hardware, and enable x64
so parity tests against the float64 numpy oracle are meaningful.

Must run before jax is imported anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# jax is already imported by the environment's sitecustomize (which also
# forces JAX_PLATFORMS=axon), so env vars are ineffective here: set the
# platform and virtual device count through the config API, which works
# until the first backend initialization.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DATA = "/root/reference"


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Release compiled executables between test modules.

    Every XLA:CPU executable holds many small memory mappings; the full
    suite's several hundred compiled programs push the process past the
    kernel's vm.max_map_count (65530 here) and mmap failures then
    SEGFAULT inside LLVM mid-compile (observed deterministically at
    ~150 tests / ~64k mappings, 2026-08-21).  Clearing jit caches per
    module keeps the mapping count bounded; cross-module recompiles
    cost a few seconds total."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def data_root():
    if not os.path.isdir(REFERENCE_DATA):
        pytest.skip("reference datasets not mounted")
    return REFERENCE_DATA


@pytest.fixture(scope="session")
def dataset_small(data_root):
    """data/ with the default 1377x428 map - 99 frames."""
    from lsdtpu.io import load_dataset
    return load_dataset(os.path.join(data_root, "data"))


@pytest.fixture(scope="session")
def dataset_data1(data_root):
    from lsdtpu.io import load_dataset
    return load_dataset(
        os.path.join(data_root, "data_20190513/data_f3key/data1"))
