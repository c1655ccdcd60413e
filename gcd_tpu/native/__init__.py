"""Native (C++/OpenMP) host kernels for the data pipeline, loaded via ctypes.

The point-splat renderer is the input-pipeline hot op — the reference reserves
a dedicated A100 for it (kubric_arbit.py:426-428). On TPU hosts it runs on the
host CPUs; gcd_tpu/native/splat.cpp is a streaming two-pass scatter that beats
the XLA-CPU lowering ~5x single-core and scales with cores via OpenMP.

The shared library is built lazily on first use (g++, cached next to the
source). Everything degrades gracefully: if no compiler is available the
callers fall back to the jittable jax implementation in
gcd_tpu/data/geometry.py, which stays the semantic reference
(tests/test_geometry.py holds both to per-pixel parity).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "splat.cpp")
_LIB = os.path.join(_DIR, "libgcdsplat.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> None:
    cmd = [
        "g++", "-O3", "-fopenmp", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if os.environ.get("GCD_NO_NATIVE_SPLAT") == "1":
            _load_failed = True
            return None
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB)
            lib.gcd_splat_points.restype = ctypes.c_int
            lib.gcd_splat_points.argtypes = [
                ctypes.POINTER(ctypes.c_float),  # xyz
                ctypes.POINTER(ctypes.c_float),  # rgb
                ctypes.c_int64,                  # n
                ctypes.POINTER(ctypes.c_float),  # intr 3x3
                ctypes.POINTER(ctypes.c_float),  # extr
                ctypes.c_int,                    # extr_cols
                ctypes.c_int, ctypes.c_int,      # height, width
                ctypes.c_int,                    # spread_radius
                ctypes.c_int,                    # mode_pardom
                ctypes.POINTER(ctypes.c_float),  # out_img
                ctypes.POINTER(ctypes.c_float),  # out_weight (nullable)
            ]
            lib.gcd_blur_into_black.restype = ctypes.c_int
            lib.gcd_blur_into_black.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
            ]
            _lib = lib
        except Exception:
            _load_failed = True
    return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def splat_points_native(
    xyz: np.ndarray,
    rgb: np.ndarray,
    intrinsics: np.ndarray,
    extrinsics: np.ndarray,
    height: int,
    width: int,
    spread_radius: int = 1,
    mode: str = "kubric",
    return_weight: bool = False,
):
    """Native equivalent of geometry.splat_points_to_image on unpadded inputs.

    Returns img (H, W, 3) f32, and weight (H, W) if return_weight.
    Raises RuntimeError if the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native splat library unavailable")
    xyz = np.ascontiguousarray(xyz, dtype=np.float32)
    rgb = np.ascontiguousarray(rgb, dtype=np.float32)
    intr = np.ascontiguousarray(intrinsics, dtype=np.float32)
    extr = np.ascontiguousarray(extrinsics, dtype=np.float32)
    img = np.empty((height, width, 3), dtype=np.float32)
    weight = np.empty((height, width), dtype=np.float32) if return_weight else None
    rc = lib.gcd_splat_points(
        _fptr(xyz), _fptr(rgb), ctypes.c_int64(xyz.shape[0]),
        _fptr(intr), _fptr(extr), ctypes.c_int(extr.shape[1]),
        ctypes.c_int(height), ctypes.c_int(width),
        ctypes.c_int(spread_radius),
        ctypes.c_int(1 if mode == "pardom" else 0),
        _fptr(img),
        _fptr(weight) if return_weight else
        ctypes.cast(None, ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise RuntimeError(f"gcd_splat_points failed rc={rc}")
    if return_weight:
        return img, weight
    return img


def blur_into_black_native(img: np.ndarray, kernel_size: int = 21,
                           sigma: Optional[float] = None) -> np.ndarray:
    """Native equivalent of geometry.blur_into_black (in a copy)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native splat library unavailable")
    out = np.ascontiguousarray(img, dtype=np.float32).copy()
    h, w = out.shape[:2]
    rc = lib.gcd_blur_into_black(
        _fptr(out), ctypes.c_int(h), ctypes.c_int(w),
        ctypes.c_int(kernel_size),
        ctypes.c_float(kernel_size / 4.0 if sigma is None else sigma),
    )
    if rc != 0:
        raise RuntimeError(f"gcd_blur_into_black failed rc={rc}")
    return out


def native_available() -> bool:
    return get_lib() is not None
