"""SessionPool: batched multi-robot serving must reproduce per-robot
OnlineLocalizer results exactly, across joins/leaves and idle slots."""

import numpy as np
import pytest

from lsdtpu.oracle import driver as odrv
from lsdtpu.runtime.online import OnlineLocalizer
from lsdtpu.runtime.serving import SessionPool


@pytest.fixture(scope="module")
def map_art(dataset_small):
    ds = dataset_small
    return odrv.prepare_map(ds.map_value, ds.param.resol)


def _reference_poses(ds, art, n_frames, start=0):
    loc = OnlineLocalizer(dtype=np.float64)
    loc.set_map_artifacts(art.lines_info, art.map_cache, ds.param.resol,
                          ds.param.ori_x, ds.param.ori_y)
    out = []
    for f in range(start, start + n_frames):
        out.append(loc.push_scan(ds.frames[f][:, 0], ds.frames[f][:, 1],
                                 ds.odom[f + 1])["pose"])
    return np.stack(out)


def test_pool_matches_single_sessions(dataset_small, map_art):
    ds = dataset_small
    NF = 6
    want_a = _reference_poses(ds, map_art, NF, start=0)
    want_b = _reference_poses(ds, map_art, NF, start=10)

    pool = SessionPool(capacity=4, canvas_hw=map_art.map_cache.shape,
                       dtype=np.float64)
    args = (map_art.lines_info, map_art.map_cache, ds.param.resol,
            ds.param.ori_x, ds.param.ori_y)
    pool.open_session("a", *args)
    pool.open_session("b", *args)
    got_a, got_b = [], []
    for f in range(NF):
        fa, fb = ds.frames[f], ds.frames[f + 10]
        pool.submit_scan("a", fa[:, 0], fa[:, 1], ds.odom[f + 1])
        pool.submit_scan("b", fb[:, 0], fb[:, 1], ds.odom[f + 11])
        res = pool.step()
        got_a.append(res["a"]["pose"])
        got_b.append(res["b"]["pose"])
    np.testing.assert_allclose(np.stack(got_a), want_a, atol=1e-9)
    np.testing.assert_allclose(np.stack(got_b), want_b, atol=1e-9)


def test_pool_join_leave_and_capacity(dataset_small, map_art):
    ds = dataset_small
    args = (map_art.lines_info, map_art.map_cache, ds.param.resol,
            ds.param.ori_x, ds.param.ori_y)
    pool = SessionPool(capacity=2, canvas_hw=map_art.map_cache.shape,
                       dtype=np.float64)
    pool.open_session("a", *args)
    pool.open_session("b", *args)
    with pytest.raises(RuntimeError):
        pool.open_session("c", *args)
    pool.close_session("a")
    pool.open_session("c", *args)
    assert pool.n_active == 2

    # a fresh session in a reused slot starts from the reset state
    fr = ds.frames[0]
    pool.submit_scan("c", fr[:, 0], fr[:, 1], ds.odom[1])
    res = pool.step()
    want = _reference_poses(ds, map_art, 1)[0]
    np.testing.assert_allclose(res["c"]["pose"], want, atol=1e-9)
    # idle session "b" was untouched this tick
    assert "b" not in res


def test_serve_cli_fleet_replay(data_root, capsys):
    """lsdtpu serve: 2-robot fleet replay driver end-to-end."""
    import json
    from lsdtpu.cli import main
    d = data_root + "/data_20190513/data_f3key/data4"
    rc = main(["serve", "--data", d, d, "--mapprep", "oracle",
               "--frames", "6"])
    assert rc == 0
    recs = [json.loads(line) for line in
            capsys.readouterr().out.strip().splitlines()]
    assert len(recs) == 2
    for i, rec in enumerate(recs):
        assert rec["robot"] == i
        assert rec["frames"] == 6 and rec["tracked"] == 6


def test_pool_overwrite_keeps_dropped_scans_motion(dataset_small, map_art):
    """A robot publishing faster than the pool ticks overwrites its
    pending scan; the filter must still see the odometry delta from the
    last PROCESSED scan, not from the dropped one (review finding r2).
    Equivalent single-session reference: push only the frames that
    actually get processed - the in-between odometry is spanned."""
    ds = dataset_small
    NF = 6
    loc = OnlineLocalizer(dtype=np.float64)
    loc.set_map_artifacts(map_art.lines_info, map_art.map_cache,
                          ds.param.resol, ds.param.ori_x, ds.param.ori_y)
    want = []
    for f in range(0, NF, 2):  # the pool only ever processes even frames
        fr = ds.frames[f]
        want.append(loc.push_scan(fr[:, 0], fr[:, 1],
                                  ds.odom[f + 1])["pose"])

    pool = SessionPool(capacity=2, canvas_hw=map_art.map_cache.shape,
                       dtype=np.float64)
    pool.open_session("a", map_art.lines_info, map_art.map_cache,
                      ds.param.resol, ds.param.ori_x, ds.param.ori_y)
    got = []
    for f in range(0, NF, 2):
        # an odd frame is submitted first, then overwritten before step
        if f > 0:
            fo = ds.frames[f - 1]
            pool.submit_scan("a", fo[:, 0], fo[:, 1], ds.odom[f])
        fr = ds.frames[f]
        pool.submit_scan("a", fr[:, 0], fr[:, 1], ds.odom[f + 1])
        got.append(pool.step()["a"]["pose"])
    np.testing.assert_allclose(np.stack(got), np.stack(want), atol=1e-9)


def test_pool_rejects_cap_overflow(dataset_small, map_art):
    ds = dataset_small
    pool = SessionPool(capacity=2, canvas_hw=map_art.map_cache.shape)
    pool.open_session("a", map_art.lines_info, map_art.map_cache,
                      ds.param.resol, ds.param.ori_x, ds.param.ori_y)
    with pytest.raises(ValueError, match="points_per_scan"):
        pool.submit_scan("a", np.ones(1081), np.zeros(1081))
    with pytest.raises(ValueError, match="max_map_lines"):
        pool.open_session("b", np.zeros((300, 10)), map_art.map_cache,
                          ds.param.resol, ds.param.ori_x, ds.param.ori_y)


def test_pool_honors_cache_dtype(dataset_small, map_art):
    """match.cache_dtype must reach the pool's field like it reaches
    make_map_context (review finding r2)."""
    import dataclasses
    import jax.numpy as jnp
    from lsdtpu.config import DEFAULT
    ds = dataset_small
    cfg = dataclasses.replace(
        DEFAULT, match=dataclasses.replace(DEFAULT.match,
                                           cache_dtype="u16"))
    pool = SessionPool(capacity=1, canvas_hw=map_art.map_cache.shape,
                       cfg=cfg)
    assert pool._ctxs.cache.dtype == jnp.uint16
    pool.open_session("a", map_art.lines_info, map_art.map_cache,
                      ds.param.resol, ds.param.ori_x, ds.param.ori_y)
    fr = ds.frames[0]
    pool.submit_scan("a", fr[:, 0], fr[:, 1], ds.odom[1])
    res = pool.step()
    assert np.isfinite(res["a"]["score"])


def test_pool_sharded_over_mesh_matches_single_device(dataset_small,
                                                      map_art):
    """A pool on a (dp,) mesh spreads slots across the 8 virtual
    devices; per-robot results match the single-device pool's to
    f64 FMA-contraction level (slots are independent - no collectives;
    the padded slot count and SPMD partitioning change XLA's fusion
    choices, observed <3e-12).  Capacity is padded internally;
    the user-visible capacity is unchanged (VERDICT r2 weak #4)."""
    import jax
    from jax.sharding import Mesh
    from lsdtpu.runtime.serving import make_pool_mesh

    ds = dataset_small
    NF = 5
    args = (map_art.lines_info, map_art.map_cache, ds.param.resol,
            ds.param.ori_x, ds.param.ori_y)
    mesh = make_pool_mesh()
    assert mesh.devices.size == 8

    def run(pool):
        for name in ("a", "b", "c"):
            pool.open_session(name, *args)
        res = []
        for f in range(NF):
            for i, name in enumerate(("a", "b", "c")):
                fr = ds.frames[f + 4 * i]
                pool.submit_scan(name, fr[:, 0], fr[:, 1],
                                 ds.odom[f + 4 * i + 1])
            res.append(pool.step())
        return res

    hw = map_art.map_cache.shape
    ref = run(SessionPool(capacity=3, canvas_hw=hw, dtype=np.float64))
    pool = SessionPool(capacity=3, canvas_hw=hw, dtype=np.float64,
                       mesh=mesh)
    assert pool._n_slots == 8 and pool.capacity == 3
    got = run(pool)
    # state really lives sharded across the mesh between ticks
    shards = pool._states.kalman_x.sharding
    assert len(shards.device_set) == 8
    for r, g in zip(ref, got):
        assert r.keys() == g.keys()
        for sid in r:
            for k in r[sid]:
                np.testing.assert_allclose(
                    np.asarray(r[sid][k], np.float64),
                    np.asarray(g[sid][k], np.float64),
                    atol=1e-9, err_msg=f"{sid}:{k}")
    # a 2-D mesh is rejected loudly
    with pytest.raises(ValueError, match="1-D"):
        from lsdtpu.runtime.shard import make_mesh
        SessionPool(capacity=3, canvas_hw=hw, mesh=make_mesh())
