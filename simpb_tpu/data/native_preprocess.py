"""ctypes binding for the native (C++) preprocessing core.

Builds `csrc/preprocess.cpp` with g++ on first use (cached as a shared
object next to the source) and exposes the fused
resize+crop+flip+normalise kernel. Falls back to the numpy/PIL path
(`simpb_tpu/data/transforms.py`) when a compiler is unavailable.

Note: the native resize is bilinear; the reference's PIL default is
bicubic — a distribution-level difference only (both are standard
camera-input resamplers). `use_native=False` on the dataset keeps the
PIL path for strict parity runs.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from .transforms import IMG_MEAN, IMG_STD

_SRC = os.path.join(
    os.path.dirname(__file__), "..", "..", "csrc", "preprocess.cpp"
)
_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(_SRC)),
                         "libpreprocess.so")
_lib: Optional[ctypes.CDLL] = None


def _build() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    if not os.path.exists(_LIB_PATH) or (
        os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)
    ):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, src],
                check=True,
                capture_output=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.resize_crop_flip_normalize.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    lib.render_depth_map.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.c_float,
    ]
    lib.native_hang.argtypes = [ctypes.c_double]
    lib.native_hang.restype = None
    _lib = lib
    return lib


def available() -> bool:
    return _build() is not None


def native_hang(seconds: float) -> bool:
    """Fault injection: block the calling thread in native code for
    `seconds`, restarting through EINTR (csrc/preprocess.cpp). Simulates
    the signal-opaque native device-RPC stall the round-4 soak observed
    so tests can prove the preemption watchdog (utils/watchdog.py)
    fires. Returns False when the native library is unavailable."""
    lib = _build()
    if lib is None:
        return False
    lib.native_hang(ctypes.c_double(float(seconds)))
    return True


def preprocess_image(
    img: np.ndarray, aug: dict,
    mean: np.ndarray = IMG_MEAN, std: np.ndarray = IMG_STD,
) -> Optional[np.ndarray]:
    """uint8 [H, W, 3] -> normalised float32 network input, or None when
    the native library is unavailable."""
    lib = _build()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    crop = aug["crop"]
    out_w = crop[2] - crop[0]
    out_h = crop[3] - crop[1]
    out = np.empty((out_h, out_w, 3), np.float32)
    mean32 = np.ascontiguousarray(mean, np.float32)
    std32 = np.ascontiguousarray(std, np.float32)
    lib.resize_crop_flip_normalize(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img.shape[0], img.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_h, out_w,
        ctypes.c_float(aug.get("resize", 1.0)),
        int(crop[0]), int(crop[1]),
        int(bool(aug.get("flip", False))),
        mean32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
