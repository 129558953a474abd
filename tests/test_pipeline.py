"""Pipeline-parallel rollout == sequential rollout (2-device pp mesh)."""

import jax
import numpy as np
import pytest

from lsdtpu.config import DEFAULT
from lsdtpu.oracle import driver as odrv
from lsdtpu.runtime import make_map_context, run_sequence, stack_frames
from lsdtpu.runtime.pipeline import make_mesh_pp, run_sequence_pipelined


def test_pipelined_matches_sequential(dataset_small):
    ds = dataset_small
    art = odrv.prepare_map(ds.map_value, ds.param.resol)
    ctx = make_map_context(art.lines_info, art.map_cache, ds.param.resol,
                          ds.param.ori_x, ds.param.ori_y,
                          dtype=np.float64)
    frames = stack_frames(ds, dtype=np.float64, max_frames=10)
    want = jax.tree.map(np.asarray, run_sequence(frames, ctx, DEFAULT))
    mesh = make_mesh_pp()
    got = jax.tree.map(np.asarray,
                       run_sequence_pipelined(frames, ctx, mesh, DEFAULT))
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)
