"""Worker for the REAL 2-process collectives test (test_distributed.py).

Each process: 2 local CPU devices, jax.distributed.initialize against a
localhost coordinator, (dp=2 hosts, tp=2 chips) pod mesh, full sharded
rollout of a 2-sequence batch - dp rides the "DCN" axis (one sequence
per process), the per-frame psum fusion rides the "ICI" axis.  Run as:

    python two_process_worker.py <process_id> <port>

Not collected by pytest (no test_ prefix); launched as a subprocess.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

import numpy as np


def main(pid: int, port: str) -> None:
    from lsdtpu.runtime.distributed import (globalize_batch, initialize,
                                            make_pod_mesh)

    initialize(coordinator_address=f"localhost:{port}", num_processes=2,
               process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4 and jax.local_device_count() == 2
    mesh = make_pod_mesh()          # (dp=2 hosts, tp=2 local chips)
    assert mesh.devices.shape == (2, 2)
    # every dp row must be single-process (psum fusion stays "on ICI")
    for row in mesh.devices:
        assert len({d.process_index for d in row}) == 1

    import __graft_entry__ as g
    from lsdtpu.config import DEFAULT
    from lsdtpu.runtime.loop import run_sequence
    from lsdtpu.runtime.shard import run_batch_sharded

    frames, ctx = g._tiny_scene(n_frames=3)
    # two DISTINCT sequences (row 1 drops 40 scan points) so a dp
    # transposition or mis-sharding cannot cancel out
    B = 2
    bframes = {k: np.stack([v, v]) for k, v in frames.items()}
    k0 = int(frames["n"][0])
    bframes["valid"][1, :, k0 - 40:] = False
    bframes["n"][1] = k0 - 40
    from lsdtpu.runtime.loop import MapContext
    bctx = MapContext(*[np.broadcast_to(np.asarray(v), (B,) +
                                        np.shape(np.asarray(v)))
                        for v in (ctx.lines, ctx.lines_mask, ctx.cache,
                                  ctx.rows, ctx.cols, ctx.resol,
                                  ctx.ori_x, ctx.ori_y)])

    gf, gc = globalize_batch(bframes, bctx, mesh)
    outs = run_batch_sharded(gf, gc, mesh, DEFAULT)
    jax.block_until_ready(outs)

    # this process owns dp row `pid`: compare its addressable shard of
    # every output against a locally computed single-device rollout
    myframes = {k: v[pid] for k, v in bframes.items()}
    ref = jax.tree.map(np.asarray, run_sequence(myframes, ctx, DEFAULT))
    for k in ("pose", "score", "n_candidates"):
        shards = outs[k].addressable_shards
        got = np.asarray(shards[0].data)[0]     # (F, ...) for my row
        for s in shards[1:]:                    # replicated over tp
            np.testing.assert_array_equal(np.asarray(s.data), shards[0].data)
        if k == "n_candidates":
            np.testing.assert_array_equal(got, ref[k], err_msg=k)
        else:
            np.testing.assert_allclose(got, ref[k], atol=2e-3, err_msg=k)
    print(f"WORKER-{pid}-OK", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2])
