"""ctypes bridge to the native char-preprocessing library.

Builds native/charprep.cpp on first use (g++, cached .so) and exposes the
batched crop->scale->pad pipeline. Falls back to the PIL path transparently
when a compiler is unavailable; outputs are PIL-bicubic-compatible within
±2/255 (the native path computes the same separable Catmull-Rom convolution
in double precision where PIL uses int16 fixed point).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import List, Optional

import numpy as np

_LIB = None
_LOCK = threading.Lock()
_SRC = os.path.join(os.path.dirname(__file__), "..", "native", "charprep.cpp")


def _build_lib() -> Optional[ctypes.CDLL]:
    cache_dir = os.environ.get(
        "CALLIREADER_NATIVE_CACHE", os.path.expanduser("~/.cache/callireader_tpu")
    )
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, "libcharprep.so")
    src = os.path.abspath(_SRC)
    if not os.path.exists(so_path) or os.path.getmtime(so_path) < os.path.getmtime(src):
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
            src, "-o", so_path,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except Exception as e:  # noqa: BLE001
            print(f"[native] charprep build failed ({e}); using PIL path", file=sys.stderr)
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    lib.char_content_batch.argtypes = [
        ctypes.c_void_p,  # srcs
        ctypes.POINTER(ctypes.c_longlong),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_void_p,  # out
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.resize_bicubic_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is None:
        with _LOCK:
            if _LIB is None:
                _LIB = _build_lib() or False  # False = tried and failed
    return _LIB or None


def available() -> bool:
    return get_lib() is not None


def resize_bicubic(src: np.ndarray, dh: int, dw: int) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    src = np.ascontiguousarray(src, np.uint8)
    out = np.empty((dh, dw, 3), np.uint8)
    lib.resize_bicubic_u8(
        src.ctypes.data, src.shape[0], src.shape[1], out.ctypes.data, dh, dw
    )
    return out


def char_content_batch(
    crops: List[np.ndarray], canvas: int, lo: int, hi: int, nthreads: int = 0
) -> np.ndarray:
    """crops: list of HWC uint8 arrays -> (N, canvas, canvas, 3) uint8."""
    lib = get_lib()
    assert lib is not None
    n = len(crops)
    crops = [np.ascontiguousarray(c, np.uint8) for c in crops]
    packed = np.concatenate([c.reshape(-1) for c in crops])
    offsets = np.zeros(n, np.int64)
    shs = np.zeros(n, np.int32)
    sws = np.zeros(n, np.int32)
    off = 0
    for i, c in enumerate(crops):
        offsets[i] = off
        shs[i] = c.shape[0]
        sws[i] = c.shape[1]
        off += c.size
    out = np.empty((n, canvas, canvas, 3), np.uint8)
    if nthreads <= 0:
        nthreads = min(8, os.cpu_count() or 1)
    lib.char_content_batch(
        packed.ctypes.data,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        shs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        sws.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        out.ctypes.data, n, canvas, lo, hi, nthreads,
    )
    return out
