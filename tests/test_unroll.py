"""k-frame unrolled scan body (cfg.scan_unroll) - output equality.

The unrolled rollout must be BITWISE the plain per-frame scan: the
match+UKF chain runs the same ops in the same order inside the body,
pad steps (edge-replicated frames) never advance the carry, and pad
outputs are sliced off.  Covers both in-body featurize modes and the
corpus-replay reset flag (reference driver loop:
LSD/main_on_windows.cpp:105-185).

Perf note: on the v5e the unroll is throughput-NEUTRAL at best
(docs/RESULTS.md r5) - the sequential-scan floor is per-frame data
streaming, not per-iteration loop control, so dividing the iteration
count buys nothing.  The mode stays as the recorded experiment.
"""

import dataclasses

import numpy as np
import pytest

from lsdtpu.config import DEFAULT
from lsdtpu.oracle import driver as odrv
from lsdtpu.runtime import make_map_context, run_sequence, stack_frames

import jax


@pytest.fixture(scope="module")
def arts(dataset_small):
    ds = dataset_small
    art = odrv.prepare_map(ds.map_value, ds.param.resol)
    ctx = make_map_context(art.lines_info, art.map_cache, ds.param.resol,
                           ds.param.ori_x, ds.param.ori_y)
    return ds, ctx


@pytest.mark.parametrize("k,batch_feat", [(2, True), (3, True), (4, False)])
def test_unroll_bitwise_equal(arts, k, batch_feat):
    ds, ctx = arts
    # 41 frames: not a multiple of 2/3/4 -> every k exercises padding
    frames = stack_frames(ds, max_frames=41)
    ref = jax.tree.map(np.asarray, run_sequence(frames, ctx, DEFAULT))
    cfg = dataclasses.replace(DEFAULT, scan_unroll=k,
                              scan_unroll_batch_featurize=batch_feat)
    got = jax.tree.map(np.asarray, run_sequence(frames, ctx, cfg))
    for key in ("pose", "score", "n_candidates", "candidate_overflow"):
        np.testing.assert_array_equal(got[key], ref[key], err_msg=key)


def test_unroll_with_reset_flag(arts):
    """A concat-corpus reset landing mid-body must still re-initialize
    the carry exactly (reset_carry runs per unrolled step)."""
    ds, ctx = arts
    frames = stack_frames(ds, max_frames=30)
    # mark frame 15 as a sequence restart (odd position inside a k=2
    # body boundary at 14/16 -> lands on step i=1 of body 7)
    reset = np.zeros(30, bool)
    reset[0] = reset[15] = True
    frames = dict(frames, reset=reset)
    ref = jax.tree.map(np.asarray, run_sequence(frames, ctx, DEFAULT))
    cfg = dataclasses.replace(DEFAULT, scan_unroll=2)
    got = jax.tree.map(np.asarray, run_sequence(frames, ctx, cfg))
    np.testing.assert_array_equal(got["pose"], ref["pose"])
    np.testing.assert_array_equal(got["score"], ref["score"])
