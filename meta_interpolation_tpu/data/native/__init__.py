"""ctypes bindings for the native preprocessing library (prep.cpp).

Builds on demand with g++ (cached as libprep.so next to the source);
callers fall back to the numpy path when no toolchain is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(__file__)
_SO = os.path.join(_DIR, "libprep.so")
_SRC = os.path.join(_DIR, "prep.cpp")
# None = not tried; False = build failed (memoized — retrying would spawn
# a g++ subprocess and print a warning once per BATCH); CDLL = loaded
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
             _SRC, "-o", _SO],
            check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"[native] build failed ({e}); using numpy preprocessing")
        return False


def load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib if _lib is not False else None
    # ALWAYS build from source on this machine (-march=native): a stale or
    # foreign-ISA libprep.so (e.g. from another host — checkout gives .so
    # and .cpp equal mtimes) would SIGILL in-process. The .so is a build
    # artifact, never committed (.gitignore).
    if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                   <= os.path.getmtime(_SRC)):
        if not _build():
            _lib = False
            return None
    lib = ctypes.CDLL(_SO)
    lib.prep_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.prep_batch.restype = None
    _lib = lib
    return _lib


def prep_batch(frames_u8: np.ndarray, crop_h: int, crop_w: int,
               oys: np.ndarray, oxs: np.ndarray, flips: np.ndarray,
               mean: np.ndarray, std: np.ndarray, inv255: float = 1.0 / 255.0,
               num_threads: int = 4) -> Optional[np.ndarray]:
    """frames_u8: (B, T, H, W, 3) uint8 → (B, T, crop_h, crop_w, 3) f32,
    or None when the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    frames_u8 = np.ascontiguousarray(frames_u8, np.uint8)
    b, t, h, w, _ = frames_u8.shape
    out = np.empty((b, t, crop_h, crop_w, 3), np.float32)
    i32 = lambda a: np.ascontiguousarray(a, np.int32).ctypes.data_as(
        ctypes.POINTER(ctypes.c_int))
    f32 = lambda a: np.ascontiguousarray(a, np.float32).ctypes.data_as(
        ctypes.POINTER(ctypes.c_float))
    lib.prep_batch(
        frames_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        b, t, h, w, crop_h, crop_w,
        i32(oys), i32(oxs), i32(flips),
        f32(mean), f32(std), ctypes.c_float(inv255),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_threads)
    return out
