"""Checkpoint / resume of the tracking session.

The reference keeps all state in per-run RAM; a crash loses the filter
chain and relocalization restarts globally (SURVEY.md section 5.3-5.4).
Here the full per-sequence carry (TrackState: kalman_x, kalman_P,
lastPose, angRotate accumulators, frame counter) serializes to a
single npz, so a long-running localization service can resume
mid-trajectory after preemption - the standard TPU-pod failure model.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np

from lsdtpu.runtime.loop import TrackState

_FIELDS = ("kalman_x", "kalman_P", "last_pose", "ang_sum", "ang_cnt",
           "is_offset", "frame", "lost_streak")
# fields added after round-1 checkpoints shipped: default when absent
_FIELD_DEFAULTS = {"lost_streak": np.zeros((), np.int32)}


def save_state(path: str, state: TrackState, prev_odom=None) -> None:
    """Atomic write (tmp + rename) of the tracking carry.

    prev_odom: the session's last-consumed odometry (the anchor the
    next scan's delta is computed against) - REQUIRED for a faithful
    mid-trajectory resume of an OnlineLocalizer (its first post-resume
    scan_pose would otherwise be zero); omit only when checkpointing a
    bare TrackState whose caller tracks odometry itself."""
    arrs = {f: np.asarray(getattr(state, f)) for f in _FIELDS}
    if prev_odom is not None:
        arrs["prev_odom"] = np.asarray(prev_odom)
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as fh:
            np.savez(fh, **arrs)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_state(path: str, dtype=None) -> TrackState:
    return load_session(path, dtype)[0]


def load_session(path: str, dtype=None):
    """Returns (TrackState, prev_odom or None)."""
    import jax.numpy as jnp
    with np.load(path) as z:
        kw = {}
        for f in _FIELDS:
            a = z[f] if f in z.files else _FIELD_DEFAULTS[f]
            if dtype is not None and a.dtype.kind == "f":
                a = a.astype(dtype)
            kw[f] = jnp.asarray(a)
        prev = z["prev_odom"] if "prev_odom" in z.files else None
        if prev is not None and dtype is not None:
            prev = prev.astype(dtype)
    return TrackState(**kw), prev


def save_state_orbax(path: str, state: TrackState) -> None:
    """Orbax-backed checkpoint (async-capable, multi-host-aware) for
    production deployments; npz stays the dependency-free default."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path),
               {f: getattr(state, f) for f in _FIELDS}, force=True)
    ckptr.wait_until_finished()


def load_state_orbax(path: str) -> TrackState:
    import jax
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(os.path.abspath(path))
    return TrackState(**{
        f: jax.numpy.asarray(tree[f] if f in tree else _FIELD_DEFAULTS[f])
        for f in _FIELDS})
