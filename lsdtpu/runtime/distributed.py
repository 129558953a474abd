"""Multi-host initialization and mesh construction.

The reference is a single process (its only IPC is ROS pub/sub input,
main_on_linux.cpp:39-44).  The TPU-native scale-out path
(SURVEY.md 5.8): one JAX process per host, global device mesh, with

  * dp (sequences) laid out across hosts - sequences never communicate,
    so this axis rides DCN for free;
  * tp (map-line candidates) or mp (map row blocks) inside each host's
    chips - the per-frame psum fusion stays on ICI.

All collectives in the engine are plain psum/pmin over named axes, so
the same `run_batch_sharded*` functions work unchanged on a multi-host
mesh built here.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from lsdtpu.runtime.shard import DP_AXIS, TP_AXIS, MP_AXIS


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env fallbacks (JAX_COORDINATOR,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID).  No-op when single-process."""
    import jax
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR")
    n = num_processes if num_processes is not None else \
        int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if n <= 1:
        return
    pid_env = os.environ.get("JAX_PROCESS_ID")
    if process_id is not None:
        pid = process_id
    elif pid_env is not None:
        pid = int(pid_env)
    else:
        # defaulting to 0 on every host would give the coordinator
        # duplicate process ids and hang the job with no hint why
        raise ValueError(
            f"num_processes={n} but no process_id: pass process_id= or "
            "set JAX_PROCESS_ID per host")
    jax.distributed.initialize(coordinator_address=addr,
                               num_processes=n, process_id=pid)


def globalize_batch(frames, ctxs, mesh, inner: str = TP_AXIS):
    """Host-replicated numpy pytrees -> global jax.Arrays for a pod mesh.

    In the multi-controller model every process holds the FULL batch as
    numpy (loaders are host-side); jit over a mesh spanning processes
    needs proper global arrays - a bare numpy leaf would be committed to
    one local device.  Each leaf is built shard-by-shard with
    jax.make_array_from_callback using the same PartitionSpecs the
    sharded runners compile with, so `run_batch_sharded*` accepts the
    result unchanged on a real pod.  No-op-equivalent on single-process
    meshes (the specs just pre-place the shards)."""
    import jax
    from jax.sharding import NamedSharding

    from lsdtpu.runtime.shard import _ctx_spec, _frames_spec

    def one(x, spec):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, NamedSharding(mesh, spec), lambda idx: x[idx])

    fspec = _frames_spec("reset" in frames)
    kind = "tp" if inner == TP_AXIS else "mp"
    return (jax.tree.map(one, frames, fspec),
            jax.tree.map(one, ctxs, _ctx_spec(kind)))


def make_pod_mesh(inner: str = TP_AXIS):
    """(dp, inner) mesh with dp = number of hosts (DCN axis) and the
    inner axis spanning each host's local chips (ICI axis).

    inner: TP_AXIS (map-line sharding) or MP_AXIS (map-block sharding).
    """
    import jax
    from jax.sharding import Mesh
    assert inner in (TP_AXIS, MP_AXIS)
    devs = jax.devices()
    n_hosts = max(1, jax.process_count())
    if len(devs) % n_hosts:
        raise ValueError(f"{len(devs)} devices not divisible by "
                         f"{n_hosts} hosts")
    local = len(devs) // n_hosts
    # group rows by owning host explicitly: jax.devices() global order
    # is not guaranteed host-major, and a row mixing hosts would put
    # the per-frame psum fusion on DCN instead of ICI
    by_host: dict = {}
    for d in devs:
        by_host.setdefault(d.process_index, []).append(d)
    rows = [by_host[p] for p in sorted(by_host)]
    if len(rows) != n_hosts or any(len(r) != local for r in rows):
        raise ValueError("devices are not evenly spread over hosts: "
                         + str({p: len(r) for p, r in by_host.items()}))
    return Mesh(np.array(rows), (DP_AXIS, inner))
