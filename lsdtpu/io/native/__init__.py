"""Native (C++) dataset parser, built on demand and cached.

The extension is compiled once per python version with the system
toolchain into ~/.cache/lsdtpu/ and loaded from there; everything
degrades gracefully to the numpy loaders if a compiler is unavailable.
"""

from __future__ import annotations

import hashlib
import importlib.machinery
import importlib.util
import os
import subprocess
import sys
import sysconfig
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "_parser.cpp")
_CACHE = os.path.join(os.path.expanduser("~"), ".cache", "lsdtpu")

_mod = None
_tried = False


def _build_and_load():
    global _mod, _tried
    if _mod is not None or _tried:
        return _mod
    _tried = True
    try:
        with open(_SRC, "rb") as f:
            tag = hashlib.sha256(f.read()).hexdigest()[:12]
        so = os.path.join(
            _CACHE, f"_lsdtpu_parser.{sys.version_info[0]}"
            f"{sys.version_info[1]}.{tag}.so")
        if not os.path.exists(so):
            os.makedirs(_CACHE, exist_ok=True)
            inc = sysconfig.get_paths()["include"]
            cc = os.environ.get("CXX", "g++")
            tmp = so + ".tmp"
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", f"-I{inc}", _SRC,
                 "-o", tmp],
                check=True, capture_output=True)
            os.replace(tmp, so)
        loader = importlib.machinery.ExtensionFileLoader(
            "_lsdtpu_parser", so)
        spec = importlib.util.spec_from_loader("_lsdtpu_parser", loader)
        _mod = importlib.util.module_from_spec(spec)
        loader.exec_module(_mod)
    except Exception:
        _mod = None
    return _mod


def available() -> bool:
    return _build_and_load() is not None


def load_grid_native(path: str, rows: int, cols: int
                     ) -> Optional[np.ndarray]:
    m = _build_and_load()
    if m is None:
        return None
    raw = m.parse_grid(path, rows * cols)
    return np.frombuffer(raw, dtype=np.uint8).reshape(rows, cols).copy()


def load_doubles_native(path: str) -> Optional[np.ndarray]:
    m = _build_and_load()
    if m is None:
        return None
    raw = m.parse_doubles(path)
    return np.frombuffer(raw, dtype=np.float64).copy()
