"""On-demand compilation + loading of the native library."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SOURCES = ["bvh_builder.cpp"]
_LIB = os.path.join(_DIR, "_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _stale() -> bool:
    if not os.path.exists(_LIB):
        return True
    lib_mtime = os.path.getmtime(_LIB)
    return any(
        os.path.getmtime(os.path.join(_DIR, s)) > lib_mtime for s in _SOURCES
    )


def _compile() -> bool:
    srcs = [os.path.join(_DIR, s) for s in _SOURCES]
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", _LIB] + srcs
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """Compile (if stale) and load the native library; None if the
    toolchain is unavailable — callers fall back to numpy."""
    global _lib, _failed
    with _lock:
        if _lib is not None:
            return _lib
        if _failed:
            return None
        if _stale() and not _compile():
            _failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _failed = True
            return None
        lib.bvh_build.restype = ctypes.c_int
        lib.bvh_build.argtypes = [
            ctypes.POINTER(ctypes.c_double),  # prim_min
            ctypes.POINTER(ctypes.c_double),  # prim_max
            ctypes.c_int,  # n
            ctypes.c_int,  # max_leaf
            ctypes.c_int,  # bins
            ctypes.POINTER(ctypes.c_int64),  # sorted_order out
            ctypes.POINTER(ctypes.c_double),  # node_bounds out
            ctypes.POINTER(ctypes.c_int64),  # node_info out
            ctypes.c_int,  # cap
        ]
        _lib = lib
        return _lib
