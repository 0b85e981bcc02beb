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

__all__ = ["native_available", "load_batch", "decode_png", "augment_batch", "augment_matrices", "color_jitter_params", "png_size"]

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
            ctypes.c_int,  # resize mode
            ctypes.c_int,  # interp: 0=bilinear, 1=bicubic
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.mrclip_png_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_long,  # out buffer capacity (overflow guard)
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
        out.size,
        channels,
        ctypes.byref(w),
        ctypes.byref(h),
    )
    if rc != 0:
        return None
    return out[: h.value * w.value * channels].reshape(h.value, w.value, channels).copy()


# transforms.EvalTransform resize_mode -> native enum
_RESIZE_MODES = {"squash": 0, "cover": 1, "shortest": 1, "contain": 2, "longest": 2}
_INTERP = {"bilinear": 0, "bicubic": 1}


def load_batch(
    paths: List[str],
    out_size: Tuple[int, int],
    channels: int = 3,
    num_threads: int = 0,
    resize_mode: str = "squash",
    interpolation: str = "bicubic",
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode+resize a list of PNGs into [N, H, W, C] uint8.

    `resize_mode`: 'squash' stretches to the canvas; 'shortest'/'cover' does
    shortest-edge resize + center crop (EvalTransform semantics, reference
    transform.py:366-397); 'longest'/'contain' fits + zero-pads.
    `interpolation`: bicubic (reference eval default) or bilinear; both are
    PIL-equivalent antialiased resamplers in the C++ path.

    Returns (batch, status) — status[i] == 0 on success; failed rows are
    zeroed (matching the data pipeline's swallow-and-continue posture,
    reference data.py:209-212).
    """
    lib = _get_lib()
    n = len(paths)
    oh, ow = out_size
    mode = _RESIZE_MODES[resize_mode]
    interp = _INTERP[interpolation]
    out = np.zeros((n, oh, ow, channels), np.uint8)
    status = np.zeros((n,), np.int32)
    if lib is None:
        from PIL import Image

        pil_interp = Image.BICUBIC if interp == 1 else Image.BILINEAR
        for i, p in enumerate(paths):
            try:
                img = Image.open(p)
                img = img.convert("RGB" if channels == 3 else "L")
                w, h = img.size
                if mode == 1:  # cover: shortest-edge + center crop
                    scale = max(oh / h, ow / w)
                    img = img.resize((round(w * scale), round(h * scale)), pil_interp)
                    left = (img.size[0] - ow) // 2
                    top = (img.size[1] - oh) // 2
                    img = img.crop((left, top, left + ow, top + oh))
                    arr = np.asarray(img)
                elif mode == 2:  # contain: longest-edge + pad
                    scale = min(oh / h, ow / w)
                    dh, dw = round(h * scale), round(w * scale)
                    img = img.resize((dw, dh), pil_interp)
                    arr = np.asarray(img)
                    if arr.ndim == 2:
                        arr = arr[..., None]
                    canvas = np.zeros((oh, ow, channels), np.uint8)
                    t, l = (oh - dh) // 2, (ow - dw) // 2
                    canvas[t : t + dh, l : l + dw] = arr
                    arr = canvas
                else:
                    img = img.resize((ow, oh), pil_interp)
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
        mode,
        interp,
        num_threads,
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out, status


def png_size(path) -> Optional[tuple]:
    """(width, height) from a PNG's IHDR without decoding, or None.

    24 bytes per file — the page cache makes this ~free next to the decode
    the native loader does moments later. Used so RandomResizedCrop can be
    sampled in PIXEL space (torchvision semantics) for non-square sources.
    """
    try:
        with open(path, "rb") as f:
            head = f.read(24)
    except OSError:
        return None
    if len(head) == 24 and head[:8] == b"\x89PNG\r\n\x1a\n" and head[12:16] == b"IHDR":
        w = int.from_bytes(head[16:20], "big")
        h = int.from_bytes(head[20:24], "big")
        if w > 0 and h > 0:
            return (w, h)
    return None


def augment_matrices(
    rng: np.random.RandomState,
    n: int,
    crop_scale=(0.9, 1.0),
    ratio=(3.0 / 4.0, 4.0 / 3.0),
    degrees=(-20.0, 20.0),
    translate=(0.3, 0.3),
    affine_scale=(0.8, 1.2),
    hflip_prob: float = 0.5,
    src_sizes: Optional[list] = None,
) -> np.ndarray:
    """Per-image output->input affine matrices in normalized [0,1] coords.

    Composes the MR-CLIP chain (RandomResizedCrop -> RandomAffine -> flip,
    reference transform.py:334-347) into one 2x3 matrix per image, consumed
    by the native warp (`mrclip_augment_batch`). Rows: (a, b, tx, c, d, ty)
    with src_x = a*x + b*y + tx, src_y = c*x + d*y + ty.

    `src_sizes`: optional per-image (width, height) of the DECODED source
    (``png_size``). When given, the resized-crop box is sampled in pixel
    space with torchvision's 10-attempt loop — exactly the host
    TrainTransform semantics — so the aspect-ratio range is absolute. The
    normalized fallback (size unknown) samples the box in [0,1] coords,
    where `ratio` is relative to the source's own aspect.
    """
    out = np.empty((n, 6), np.float32)
    for i in range(n):
        # RandomAffine (output->crop space), rotation about center
        theta = np.deg2rad(rng.uniform(*degrees))
        s = rng.uniform(*affine_scale)
        tx = rng.uniform(-translate[0], translate[0])
        ty = rng.uniform(-translate[1], translate[1])
        cos, sin = np.cos(theta) / s, np.sin(theta) / s
        m_aff = np.array([[cos, sin], [-sin, cos]], np.float64)
        c = np.array([0.5, 0.5])
        off_aff = c - m_aff @ (c + np.array([tx, ty]))

        # flip in output space
        if rng.rand() < hflip_prob:
            m_flip = np.array([[-1.0, 0.0], [0.0, 1.0]])
            off_flip = np.array([1.0, 0.0])
        else:
            m_flip = np.eye(2)
            off_flip = np.zeros(2)

        # RandomResizedCrop (crop space -> input space)
        size = src_sizes[i] if src_sizes is not None else None
        if size is not None:
            # pixel-space sampling (torchvision RandomResizedCrop, matching
            # transforms.TrainTransform._random_resized_crop)
            sw, sh = size
            for _ in range(10):
                target_area = sw * sh * rng.uniform(*crop_scale)
                aspect = np.exp(rng.uniform(np.log(ratio[0]), np.log(ratio[1])))
                cw_px = int(round(np.sqrt(target_area * aspect)))
                ch_px = int(round(np.sqrt(target_area / aspect)))
                if 0 < cw_px <= sw and 0 < ch_px <= sh:
                    x0_px = rng.randint(0, sw - cw_px + 1)
                    y0_px = rng.randint(0, sh - ch_px + 1)
                    break
            else:  # fallback: centered min-square (host fallback semantics)
                cw_px = ch_px = min(sw, sh)
                x0_px, y0_px = (sw - cw_px) // 2, (sh - ch_px) // 2
            cw, ch = cw_px / sw, ch_px / sh
            x0, y0 = x0_px / sw, y0_px / sh
        else:
            # normalized box (source size unknown; ratio is source-relative)
            area = rng.uniform(*crop_scale)
            aspect = np.exp(rng.uniform(np.log(ratio[0]), np.log(ratio[1])))
            cw = min(1.0, np.sqrt(area * aspect))
            ch = min(1.0, np.sqrt(area / aspect))
            x0 = rng.uniform(0.0, 1.0 - cw) if cw < 1.0 else 0.0
            y0 = rng.uniform(0.0, 1.0 - ch) if ch < 1.0 else 0.0
        m_crop = np.diag([cw, ch])
        off_crop = np.array([x0, y0])

        # total: p_in = crop(aff(flip(p_out)))
        m = m_crop @ m_aff @ m_flip
        off = m_crop @ (m_aff @ off_flip + off_aff) + off_crop
        out[i] = [m[0, 0], m[0, 1], off[0], m[1, 0], m[1, 1], off[1]]
    return out


def color_jitter_params(
    rng: np.random.RandomState,
    n: int,
    color_jitter=None,
    color_jitter_prob: float = 0.0,
    gray_scale_prob: float = 0.0,
) -> Optional[np.ndarray]:
    """Per-image color params [n, 6] for the native warp:
    (brightness, contrast, saturation, hue_shift, apply_jitter, apply_gray).
    torchvision factor draws: f ~ U[max(0,1-s), 1+s]; hue ~ U[-h, h].
    Returns None when no color extras are requested."""
    if not color_jitter_prob and not gray_scale_prob:
        return None
    out = np.zeros((n, 6), np.float32)
    out[:, :3] = 1.0
    if color_jitter_prob and color_jitter is not None:
        b, c, s, h = color_jitter
        for j, strength in enumerate((b, c, s)):
            out[:, j] = rng.uniform(max(0.0, 1.0 - strength), 1.0 + strength, n)
        out[:, 3] = rng.uniform(-h, h, n)
        out[:, 4] = rng.rand(n) < color_jitter_prob
    if gray_scale_prob:
        out[:, 5] = rng.rand(n) < gray_scale_prob
    return out


def augment_batch(
    paths: List[str],
    out_size: Tuple[int, int],
    matrices: np.ndarray,
    blur_sigmas: Optional[np.ndarray] = None,
    color_params: Optional[np.ndarray] = None,
    channels: int = 3,
    num_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode + warp + blur (+ optional color jitter/grayscale) a batch
    natively -> [N, H, W, C] uint8."""
    lib = _get_lib()
    n = len(paths)
    oh, ow = out_size
    out = np.zeros((n, oh, ow, channels), np.uint8)
    status = np.zeros((n,), np.int32)
    matrices = np.ascontiguousarray(matrices, np.float32)
    if blur_sigmas is None:
        blur_sigmas = np.zeros((n,), np.float32)
    blur_sigmas = np.ascontiguousarray(blur_sigmas, np.float32)
    if lib is None:
        raise RuntimeError("libmrclip_native.so not built (make -C native)")
    if not hasattr(lib, "_augment_configured"):
        lib.mrclip_augment_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ]
        lib._augment_configured = True
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    cp_ptr = None
    if color_params is not None:
        color_params = np.ascontiguousarray(color_params, np.float32)
        assert color_params.shape == (n, 6)
        cp_ptr = color_params.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    lib.mrclip_augment_batch(
        c_paths, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        oh, ow, channels,
        matrices.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        blur_sigmas.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cp_ptr,
        num_threads,
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out, status
