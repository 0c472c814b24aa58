"""ctypes bindings for the native click-robot kernels.

Compiles ``click_ops.cpp`` on first import (g++ -O3 -shared -fPIC) into the
package directory; every entry point degrades gracefully to the scipy path
in ``annotator/robots.py`` when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "click_ops.cpp"
_LIB = _HERE / "click_ops.so"

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             str(_SRC), "-o", str(_LIB)],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load():
    """Returns the ctypes library or None."""
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        return None

    lib.largest_component_center.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_longlong)]
    lib.largest_component_center.restype = None
    lib.nearest_true.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.nearest_true.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def _as_u8(mask: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(mask, dtype=bool)
                                .astype(np.uint8))


def largest_component_center(mask: np.ndarray):
    """-> (center_x, center_y, size) of the largest 8-connected component,
    or None when the mask is empty."""
    lib = load()
    assert lib is not None
    m = _as_u8(mask)
    h, w = m.shape
    ox = ctypes.c_int()
    oy = ctypes.c_int()
    osz = ctypes.c_longlong()
    lib.largest_component_center(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        ctypes.byref(ox), ctypes.byref(oy), ctypes.byref(osz))
    if osz.value == 0:
        return None
    return int(ox.value), int(oy.value), int(osz.value)


def nearest_true(mask: np.ndarray, x: int, y: int):
    """Nearest true pixel to (x, y); ties resolve like np.argmin over
    row-major np.where output. Returns (x, y) or None if mask empty."""
    lib = load()
    assert lib is not None
    m = _as_u8(mask)
    h, w = m.shape
    ox = ctypes.c_int()
    oy = ctypes.c_int()
    lib.nearest_true(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        int(x), int(y), ctypes.byref(ox), ctypes.byref(oy))
    if ox.value < 0:
        return None
    return int(ox.value), int(oy.value)
