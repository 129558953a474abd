"""Host-side text loaders for the bundled datasets.

File formats (reference: LSD/main_on_windows.cpp:27-64,97-124):
  mapParam.txt    -> col row resol origX origY (whitespace separated)
  mapValue.txt    -> row-major uint8 grid {0=unknown, 1=occupied, 255=free}
  Lidar.txt       -> `range angle` pairs, up to 360 per frame; `inf` rows dropped
  Odom.txt        -> `x y ang` per frame
  realPos.txt     -> `x<TAB>y` ground-truth keyframes
  recored_Odom.txt-> keyframe frame indices (1-based)

A fast C++ loader (lsdtpu/io/native) accelerates the big mapValue grids;
these numpy fallbacks are always available and are the semantics oracle.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import numpy as np


@dataclasses.dataclass(frozen=True)
class MapParam:
    """Map metadata (reference struct: LSD/baseFunc.h:25-31)."""

    col: int
    row: int
    resol: float
    ori_x: float
    ori_y: float


def load_map_param(path: str) -> MapParam:
    vals = _read_tokens(path)
    return MapParam(int(vals[0]), int(vals[1]), float(vals[2]),
                    float(vals[3]), float(vals[4]))


def load_map_value(path: str, param: MapParam) -> np.ndarray:
    """Load the occupancy grid as (row, col) uint8."""
    try:
        from lsdtpu.io.native import load_grid_native
        arr = load_grid_native(path, param.row, param.col)
        if arr is not None:
            return arr
    except Exception:
        pass
    flat = np.loadtxt(path, dtype=np.int64).ravel()
    n = param.row * param.col
    if flat.size < n:
        raise ValueError(f"{path}: expected {n} values, got {flat.size}")
    return flat[:n].astype(np.uint8).reshape(param.row, param.col)


def _load_floats(path: str, cols: int) -> np.ndarray:
    """(N, cols) float64 via the native parser, numpy fallback."""
    try:
        from lsdtpu.io.native import load_doubles_native
        flat = load_doubles_native(path)
        if flat is not None and flat.size % cols == 0:
            return flat.reshape(-1, cols)
    except Exception:
        pass
    return np.loadtxt(path, dtype=np.float64, ndmin=2)


def load_odom(path: str, duplicate_last: bool = True) -> np.ndarray:
    """Load odometry rows (N, 3) float64.

    The reference driver reads with `while(!feof)` which appends one
    duplicate/stale final row (LSD/main_on_windows.cpp:51-60); with
    ``duplicate_last`` we reproduce that by repeating the last row, and
    the `Odom[0].x = 0` override (main_on_windows.cpp:61).
    """
    rows = _load_floats(path, 3)
    if duplicate_last and rows.shape[0] > 0:
        rows = np.concatenate([rows, rows[-1:]], axis=0)
    if rows.shape[0] > 0:
        rows = rows.copy()
        rows[0, 0] = 0.0
    return rows


def load_lidar_frames(path: str, points_per_loop: int = 360
                      ) -> List[np.ndarray]:
    """Split Lidar.txt into frames of (n_i, 2) [range, angle], inf dropped.

    Mirrors LSD/main_on_windows.cpp:110-124: each frame consumes exactly
    ``points_per_loop`` file rows; rows whose range is inf are discarded.
    """
    raw = _load_floats(path, 2)
    frames = []
    n_full = raw.shape[0] // points_per_loop
    for f in range(n_full):
        chunk = raw[f * points_per_loop:(f + 1) * points_per_loop]
        keep = np.isfinite(chunk[:, 0])
        frames.append(chunk[keep])
    return frames


def load_real_pos(path: str) -> np.ndarray:
    """Ground-truth keyframes (N, 2) in meters."""
    return _load_floats(path, 2)


def load_recorded_odom(path: str) -> np.ndarray:
    """Keyframe frame indices (1-based), (N,) int64."""
    return np.loadtxt(path, dtype=np.int64).ravel()


@dataclasses.dataclass
class Dataset:
    """One bundled sequence: map + scans + odometry (+ optional ground truth)."""

    param: MapParam
    map_value: np.ndarray
    odom: np.ndarray
    frames: List[np.ndarray]
    real_pos: Optional[np.ndarray] = None
    recorded_odom: Optional[np.ndarray] = None
    name: str = ""


def load_dataset(root: str, map_suffix: str = "",
                 points_per_loop: int = 360) -> Dataset:
    """Load a dataset directory (e.g. data_20190513/data_f3key/data1).

    ``map_suffix`` selects alternate maps in data/ (e.g. "_map1").
    """
    param = load_map_param(os.path.join(root, f"mapParam{map_suffix}.txt"))
    map_value = load_map_value(
        os.path.join(root, f"mapValue{map_suffix}.txt"), param)
    odom = load_odom(os.path.join(root, "Odom.txt"))
    frames = load_lidar_frames(os.path.join(root, "Lidar.txt"),
                               points_per_loop)
    real_pos = recorded = None
    rp = os.path.join(root, "realPos.txt")
    ro = os.path.join(root, "recored_Odom.txt")
    if os.path.exists(rp):
        real_pos = load_real_pos(rp)
    if os.path.exists(ro):
        recorded = load_recorded_odom(ro)
    return Dataset(param, map_value, odom, frames, real_pos, recorded,
                   name=os.path.basename(os.path.normpath(root)) + map_suffix)


def load_lines_info(path: str) -> np.ndarray:
    """Golden linesInfo dump: rows of [k b dx dy x1 y1 x2 y2 len orient]
    matching structLinesInfo field order (reference: LSD/baseFunc.h:33-44).
    """
    return _load_floats(path, 10)


def _read_tokens(path: str):
    with open(path) as f:
        return f.read().split()
