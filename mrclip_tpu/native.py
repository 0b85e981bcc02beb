"""ctypes bindings for the native data-path library (threaded PNG loader).

The C++ side (`native/png_decode.cc`, `native/loader.cc`) replaces the
reference's torch-DataLoader worker processes for the host decode stage:
one call fills a contiguous [N, H, W, C] uint8 batch with an internal
thread pool, no GIL, no Python per-image overhead. Falls back to PIL when
the shared library hasn't been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

__all__ = ["native_available", "load_batch", "decode_png"]

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets", "libmrclip_native.so")
_lib = None


def _get_lib():
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.mrclip_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.mrclip_png_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def decode_png(data: bytes, channels: int = 3) -> Optional[np.ndarray]:
    """Decode PNG bytes -> [H, W, channels] uint8 via the native decoder."""
    lib = _get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    out = np.empty((4096 * 4096 * channels,), np.uint8)
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    rc = lib.mrclip_png_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        channels,
        ctypes.byref(w),
        ctypes.byref(h),
    )
    if rc != 0:
        return None
    return out[: h.value * w.value * channels].reshape(h.value, w.value, channels).copy()


def load_batch(
    paths: List[str],
    out_size: Tuple[int, int],
    channels: int = 3,
    num_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode+resize a list of PNGs into [N, H, W, C] uint8.

    Returns (batch, status) — status[i] == 0 on success; failed rows are
    zeroed (matching the data pipeline's swallow-and-continue posture,
    reference data.py:209-212).
    """
    lib = _get_lib()
    n = len(paths)
    oh, ow = out_size
    out = np.zeros((n, oh, ow, channels), np.uint8)
    status = np.zeros((n,), np.int32)
    if lib is None:
        from PIL import Image

        for i, p in enumerate(paths):
            try:
                img = Image.open(p)
                if channels == 3:
                    img = img.convert("RGB")
                else:
                    img = img.convert("L")
                img = img.resize((ow, oh), Image.BILINEAR)
                arr = np.asarray(img)
                out[i] = arr if arr.ndim == 3 else arr[..., None]
            except Exception:
                status[i] = -1
        return out, status

    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.mrclip_load_batch(
        c_paths,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        oh,
        ow,
        channels,
        num_threads,
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out, status
