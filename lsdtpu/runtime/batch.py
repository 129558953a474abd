"""Batched multi-sequence localization via vmap.

The reference processes one recorded sequence at a time in a host loop
(LSD/main_on_windows.cpp:105-185); on TPU the whole per-frame pipeline
is shape-static, so independent sequences (each with its own map) batch
trivially with `jax.vmap` - the TPU analog of running 21 copies of the
reference binary, in one compiled program.

All sequences in a batch share static shapes: frames are padded to the
longest sequence (masked by per-frame `n`), maps are padded to a common
(H, W) canvas.  Padding frames carry n=0 and produce the reset state,
which is harmless because each sequence's outputs are cut back to its
true length on the host.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lsdtpu.config import EngineConfig, DEFAULT
from lsdtpu.runtime.loop import MapContext, run_sequence, stack_frames


@partial(jax.jit, static_argnames=("cfg",))
def run_batch(frames, ctxs: MapContext, cfg: EngineConfig = DEFAULT):
    """frames: pytree with leading (B, F, ...) axes; ctxs: MapContext with
    leading (B, ...) axes.  Returns outputs with (B, F, ...) axes."""
    from lsdtpu.runtime.loop import vmapped_cfg
    cfg = vmapped_cfg(cfg)
    return jax.vmap(lambda fr, cx: run_sequence(fr, cx, cfg))(frames, ctxs)


def stack_batch(datasets: Sequence, map_arts: Sequence, cfg=DEFAULT,
                dtype=np.float32, max_frames: Optional[int] = None,
                cache_dtype: str = "f32"):
    """Host-side: pad sequences and maps to common shapes.

    datasets: list of io.Dataset; map_arts: list of (lines_info, map_cache)
    tuples (from oracle.driver.prepare_map or mapprep).  cache_dtype:
    "f32"/"bf16"/"u16" field compression (match/associate.py
    quantize_cache; scale = cfg.map.z_occ_max_dis for u16).
    Returns (frames pytree, MapContext pytree, true_lengths).
    """
    fs = [stack_frames(ds, dtype=dtype, max_frames=max_frames)
          for ds in datasets]
    F = max(f["ranges"].shape[0] for f in fs)
    lens = np.array([f["ranges"].shape[0] for f in fs])

    def pad_frames(f):
        out = {}
        for k, v in f.items():
            pad = [(0, F - v.shape[0])] + [(0, 0)] * (v.ndim - 1)
            out[k] = np.pad(v, pad)
        return out

    frames = jax.tree.map(lambda *xs: np.stack(xs),
                          *[pad_frames(f) for f in fs])

    H = max(a[1].shape[0] for a in map_arts)
    W = max(a[1].shape[1] for a in map_arts)
    M = cfg.shapes.max_map_lines
    lines = np.zeros((len(map_arts), M, 10), dtype)
    mask = np.zeros((len(map_arts), M), bool)
    cache = np.full((len(map_arts), H, W), 0.0, dtype)
    for i, (li, ca) in enumerate(map_arts):
        k = len(li)
        if k > M:
            # caps are never silent (ShapeConfig contract)
            raise ValueError(f"map {i} has {k} lines > "
                             f"shapes.max_map_lines={M}; raise the cap")
        lines[i, :k] = li[:k]
        mask[i, :k] = True
        # pad with the cap so out-of-map reads behave like far cells
        cache[i] = np.pad(ca, ((0, H - ca.shape[0]), (0, W - ca.shape[1])),
                          constant_values=ca.max())
    from lsdtpu.match.associate import quantize_cache
    ctxs = MapContext(
        lines=jnp.asarray(lines), lines_mask=jnp.asarray(mask),
        cache=quantize_cache(cache, cache_dtype, cfg.map.z_occ_max_dis,
                             float_dtype=dtype),
        rows=jnp.asarray([a[1].shape[0] for a in map_arts], jnp.int32),
        cols=jnp.asarray([a[1].shape[1] for a in map_arts], jnp.int32),
        resol=jnp.asarray([d.param.resol for d in datasets], dtype),
        ori_x=jnp.asarray([d.param.ori_x for d in datasets], dtype),
        ori_y=jnp.asarray([d.param.ori_y for d in datasets], dtype))
    return frames, ctxs, lens


def stack_concat(datasets: Sequence, dtype=np.float32,
                 max_frames: Optional[int] = None):
    """Corpus replay: concatenate sequences SHARING ONE MAP into a
    single frame stream with per-sequence reset flags.

    The whole corpus then runs as ONE `lax.scan` / one device dispatch
    (run_sequence honors the "reset" flag by re-initializing the carry),
    producing bitwise the same per-sequence outputs as standalone
    rollouts - a single-dispatch alternative to the vmap batch when the
    batch dimension is unavailable or the sequences' lengths are too
    ragged to pad efficiently.

    Returns (frames pytree with "reset", bounds): outputs split back as
    outs[k][bounds[i]:bounds[i+1]] for sequence i.
    """
    fs = [stack_frames(ds, dtype=dtype, max_frames=max_frames)
          for ds in datasets]
    lens = [f["ranges"].shape[0] for f in fs]
    frames = jax.tree.map(lambda *xs: np.concatenate(xs), *fs)
    reset = np.zeros((sum(lens),), bool)
    reset[np.cumsum([0] + lens[:-1])] = True
    frames["reset"] = reset
    return frames, np.cumsum([0] + lens)
