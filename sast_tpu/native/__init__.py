"""Native (C++) host ops, compiled on demand and bound via ctypes.

Exposes numpy-facing wrappers for the event-pipeline hot loops; every entry
point transparently falls back to numpy when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "event_ops.cpp")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[ctypes.CDLL]:
    src = open(_SRC).read()
    tag = hashlib.sha1(src.encode()).hexdigest()[:12]
    so_path = os.path.join(_HERE, f"_event_ops_{tag}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".tmp{os.getpid()}"
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC",
            "-o", tmp, _SRC,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            os.rename(tmp, so_path)
        except (subprocess.CalledProcessError, FileNotFoundError, OSError) as e:
            print(f"native build unavailable ({e}); using numpy fallback",
                  file=sys.stderr)
            return None
    lib = ctypes.CDLL(so_path)

    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")

    lib.stacked_histogram.argtypes = [
        i32p, i32p, i32p, i64p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, u8p,
    ]
    lib.mixed_density_stack.argtypes = [
        i32p, i32p, i32p, i64p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i8p,
    ]
    lib.monotonize_time.argtypes = [i64p, ctypes.c_int64]
    lib.downsample2x_nearest_u8.argtypes = [
        u8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, u8p,
    ]
    lib.transpose_tchw_to_thwc.argtypes = [
        u8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, u8p,
    ]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if not _tried:
        _tried = True
        try:
            _lib = _build()
        except Exception as e:  # never break the import path
            print(f"native build failed: {e}", file=sys.stderr)
            _lib = None
    return _lib


def available() -> bool:
    return get_lib() is not None


def _as_i32(a) -> np.ndarray:
    return np.ascontiguousarray(a, np.int32)


def stacked_histogram(x, y, p, t, bins: int, height: int, width: int,
                      count_cutoff: int = 255) -> np.ndarray:
    lib = get_lib()
    n = int(np.asarray(x).size)
    out = np.empty((2 * bins, height, width), np.uint8)
    if lib is None:
        raise RuntimeError("native library unavailable")
    lib.stacked_histogram(
        _as_i32(x), _as_i32(y), _as_i32(p),
        np.ascontiguousarray(t, np.int64), n, bins, height, width,
        int(count_cutoff), out,
    )
    return out


def mixed_density_stack(x, y, p, t, bins: int, height: int, width: int,
                        count_cutoff: int = 0) -> np.ndarray:
    lib = get_lib()
    n = int(np.asarray(x).size)
    out = np.empty((bins, height, width), np.int8)
    if lib is None:
        raise RuntimeError("native library unavailable")
    lib.mixed_density_stack(
        _as_i32(x), _as_i32(y), _as_i32(p),
        np.ascontiguousarray(t, np.int64), n, bins, height, width,
        int(count_cutoff), out,
    )
    return out


def monotonize_time(t: np.ndarray) -> np.ndarray:
    lib = get_lib()
    t = np.ascontiguousarray(t, np.int64)
    if lib is None:
        return np.maximum.accumulate(t)
    lib.monotonize_time(t, t.size)
    return t


def downsample2x_nearest_u8(x: np.ndarray) -> np.ndarray:
    lib = get_lib()
    assert x.dtype == np.uint8 and x.ndim == 3
    c, h, w = x.shape
    out = np.empty((c, h // 2, w // 2), np.uint8)
    if lib is None:
        raise RuntimeError("native library unavailable")
    lib.downsample2x_nearest_u8(np.ascontiguousarray(x), c, h, w, out)
    return out


def transpose_tchw_to_thwc(x: np.ndarray) -> np.ndarray:
    """(T, C, H, W) uint8 -> contiguous (T, H, W, C) uint8.

    Cache-friendly native path for the loader's disk-layout (NCHW chunks) ->
    device-layout (NHWC) change; falls back to numpy when the toolchain is
    unavailable.
    """
    assert x.dtype == np.uint8 and x.ndim == 4, (x.dtype, x.shape)
    lib = get_lib()
    if lib is None:
        return np.ascontiguousarray(np.transpose(x, (0, 2, 3, 1)))
    t, c, h, w = x.shape
    out = np.empty((t, h, w, c), np.uint8)
    lib.transpose_tchw_to_thwc(np.ascontiguousarray(x), t, c, h, w, out)
    return out
