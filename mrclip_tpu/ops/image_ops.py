"""Device-side (XLA) image ops: the fused augmentation pipeline.

TPU-native re-design of the reference's torchvision transform chain
(`src/open_clip/transform.py:334-397`). The reference runs, per image, on
CPU workers: RandomResizedCrop(bicubic) -> RandomAffine(+-20deg, translate
0.3, scale 0.8-1.2) -> GaussianBlur(3) -> RandomHorizontalFlip -> ToTensor ->
Normalize. All of those geometric ops are affine warps, so here they compose
into ONE sampling matrix per image and execute as a single batched gather on
device, followed by a separable 3x3 blur and the normalize — one fused XLA
program feeding HBM directly (BASELINE.json north star "fused pipeline").

Everything is batched [B, H, W, C] uint8/float32, jit-safe, static shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..constants import OPENAI_DATASET_MEAN, OPENAI_DATASET_STD

__all__ = [
    "normalize_images",
    "resize_bilinear",
    "affine_sample",
    "color_jitter_batch",
    "grayscale_batch",
    "random_augment_batch",
    "eval_preprocess_batch",
]


def normalize_images(
    images: jax.Array,
    mean: Tuple[float, ...] = OPENAI_DATASET_MEAN,
    std: Tuple[float, ...] = OPENAI_DATASET_STD,
) -> jax.Array:
    """uint8/float [B,H,W,C] -> normalized float32 (ToTensor + Normalize)."""
    x = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        x = x / 255.0
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (x - mean) / std


def resize_bilinear(images: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Batched resize via jax.image (bilinear, antialiased on downsample)."""
    b, _, _, c = images.shape
    return jax.image.resize(
        images.astype(jnp.float32), (b, size[0], size[1], c), method="bilinear", antialias=True
    )


def _bilinear_gather(img: jax.Array, ys: jax.Array, xs: jax.Array, fill: float) -> jax.Array:
    """Sample img [H,W,C] at float coords (ys, xs) [h,w]; out-of-bounds -> fill."""
    h, w, _ = img.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def tap(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(inb[..., None], v, fill)

    top = tap(y0i, x0i) * (1 - wx)[..., None] + tap(y0i, x0i + 1) * wx[..., None]
    bot = tap(y0i + 1, x0i) * (1 - wx)[..., None] + tap(y0i + 1, x0i + 1) * wx[..., None]
    return top * (1 - wy)[..., None] + bot * wy[..., None]


def affine_sample(
    images: jax.Array, matrices: jax.Array, out_size: Tuple[int, int], fill: float = 0.0
) -> jax.Array:
    """Warp each image by its 2x3 *inverse* affine matrix (output -> input).

    `images`: [B, H, W, C] float32. `matrices`: [B, 2, 3] mapping output pixel
    (x, y, 1) to input (x, y). Bilinear sampling; vmapped over the batch so
    XLA sees one fused gather kernel.
    """
    oh, ow = out_size
    ys = jnp.arange(oh, dtype=jnp.float32)
    xs = jnp.arange(ow, dtype=jnp.float32)
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")
    ones = jnp.ones_like(grid_x)
    coords = jnp.stack([grid_x, grid_y, ones], axis=-1)  # [oh, ow, 3] in (x, y, 1)

    def warp_one(img, mat):
        src = coords @ mat.T  # [oh, ow, 2] -> (x_in, y_in)
        return _bilinear_gather(img, src[..., 1], src[..., 0], fill)

    return jax.vmap(warp_one)(images.astype(jnp.float32), matrices)


def _compose(a: jax.Array, b: jax.Array) -> jax.Array:
    """Compose 2x3 affines: result(x) = a(b(x))."""
    a3 = jnp.concatenate([a, jnp.array([[0.0, 0.0, 1.0]])], axis=0)
    b3 = jnp.concatenate([b, jnp.array([[0.0, 0.0, 1.0]])], axis=0)
    return (a3 @ b3)[:2]


def _random_resized_crop_matrix(
    key: jax.Array,
    in_hw: Tuple[int, int],
    out_hw: Tuple[int, int],
    scale: Tuple[float, float],
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> jax.Array:
    """Output->input matrix equivalent to torchvision RandomResizedCrop.

    Samples target area fraction and aspect ratio, clamps the crop box inside
    the image (single-shot analytic version of torchvision's 10-try loop).
    """
    kh, kw, ky, kx = jax.random.split(key, 4)
    h, w = in_hw
    area = h * w
    target_area = area * jax.random.uniform(kh, minval=scale[0], maxval=scale[1])
    log_ratio = jax.random.uniform(
        kw, minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    aspect = jnp.exp(log_ratio)
    cw = jnp.clip(jnp.sqrt(target_area * aspect), 1.0, w)
    ch = jnp.clip(jnp.sqrt(target_area / aspect), 1.0, h)
    y0 = jax.random.uniform(ky) * (h - ch)
    x0 = jax.random.uniform(kx) * (w - cw)
    # map output pixel (x, y) -> input (x0 + x * cw/ow, y0 + y * ch/oh)
    oh, ow = out_hw
    return jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    ) * jnp.stack([cw / ow, ch / oh])[:, None] + jnp.array(
        [[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]]
    ) * jnp.stack([x0, y0])[:, None]


def _random_affine_matrix(
    key: jax.Array,
    out_hw: Tuple[int, int],
    degrees: Tuple[float, float] = (-20.0, 20.0),
    translate: Tuple[float, float] = (0.3, 0.3),
    scale: Tuple[float, float] = (0.8, 1.2),
) -> jax.Array:
    """Inverse (output->input) matrix for the MR-CLIP RandomAffine
    (reference transform.py:343-345), rotation about the image center."""
    ka, kt_x, kt_y, ks = jax.random.split(key, 4)
    oh, ow = out_hw
    angle = jnp.deg2rad(jax.random.uniform(ka, minval=degrees[0], maxval=degrees[1]))
    tx = jax.random.uniform(kt_x, minval=-translate[0], maxval=translate[0]) * ow
    ty = jax.random.uniform(kt_y, minval=-translate[1], maxval=translate[1]) * oh
    s = jax.random.uniform(ks, minval=scale[0], maxval=scale[1])

    cx, cy = ow * 0.5, oh * 0.5
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    # Forward op: translate-to-center^-1 . rot.scale . translate-to-center . shift
    # Inverse (what the sampler needs): undo shift, undo rot/scale about center.
    inv_s = 1.0 / s
    m = jnp.array([[cos * inv_s, sin * inv_s], [-sin * inv_s, cos * inv_s]])
    # x_in = m @ (x_out - c - t) + c
    offset = jnp.array([cx, cy]) - m @ (jnp.array([cx + tx, cy + ty]))
    return jnp.concatenate([m, offset[:, None]], axis=1)


def _gaussian_blur3(images: jax.Array, sigma: jax.Array) -> jax.Array:
    """Separable 3x3 Gaussian blur with per-batch sigma (torchvision
    GaussianBlur(kernel_size=3) samples sigma in [0.1, 2.0])."""
    offs = jnp.array([-1.0, 0.0, 1.0])
    k = jnp.exp(-0.5 * (offs[None, :] / sigma[:, None]) ** 2)
    k = k / jnp.sum(k, axis=1, keepdims=True)  # [B, 3]

    padded = jnp.pad(images, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge")
    blurred = (
        padded[:, :-2] * k[:, 0, None, None, None]
        + padded[:, 1:-1] * k[:, 1, None, None, None]
        + padded[:, 2:] * k[:, 2, None, None, None]
    )
    padded = jnp.pad(blurred, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
    return (
        padded[:, :, :-2] * k[:, 0, None, None, None]
        + padded[:, :, 1:-1] * k[:, 1, None, None, None]
        + padded[:, :, 2:] * k[:, 2, None, None, None]
    )


def _luminance(x: jax.Array) -> jax.Array:
    """ITU-R 601 luma, torchvision rgb_to_grayscale weights. [..., 3] -> [..., 1]."""
    w = jnp.asarray([0.2989, 0.587, 0.114], x.dtype)
    return jnp.sum(x * w, axis=-1, keepdims=True)


def _rgb_to_hsv(x: jax.Array) -> jax.Array:
    """[..., 3] in [0,1] -> HSV (h in turns)."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    mx = jnp.max(x, axis=-1)
    mn = jnp.min(x, axis=-1)
    d = mx - mn
    safe_d = jnp.where(d > 0, d, 1.0)
    h = jnp.where(
        mx == r, (g - b) / safe_d,
        jnp.where(mx == g, 2.0 + (b - r) / safe_d, 4.0 + (r - g) / safe_d),
    )
    h = jnp.where(d > 0, (h / 6.0) % 1.0, 0.0)
    s = jnp.where(mx > 0, d / jnp.where(mx > 0, mx, 1.0), 0.0)
    return jnp.stack([h, s, mx], axis=-1)


def _hsv_to_rgb(x: jax.Array) -> jax.Array:
    h, s, v = x[..., 0], x[..., 1], x[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.choose(i, [v, q, p, p, t, v], mode="clip")
    g = jnp.choose(i, [t, v, v, q, p, p], mode="clip")
    b = jnp.choose(i, [p, p, t, v, v, q], mode="clip")
    return jnp.stack([r, g, b], axis=-1)


def color_jitter_batch(
    x: jax.Array,
    key: jax.Array,
    jitter: Tuple[float, float, float, float],
    p: float,
) -> jax.Array:
    """Batched color jitter on [B,H,W,3] floats in [0,1]; per-sample factors
    and apply mask. torchvision-equivalent adjust fns in fixed order
    brightness -> contrast -> saturation -> hue (the host/PIL backend
    randomizes the order per sample; fixed order here keeps the device
    program static — documented divergence)."""
    bright, contrast, sat, hue = jitter
    b = x.shape[0]
    kb, kc, ks, kh, kp = jax.random.split(key, 5)
    orig = x

    def factors(k, strength):
        return jax.random.uniform(
            k, (b, 1, 1, 1), minval=max(0.0, 1.0 - strength), maxval=1.0 + strength
        )

    if bright:
        x = jnp.clip(x * factors(kb, bright), 0.0, 1.0)
    if contrast:
        mean_gray = jnp.mean(_luminance(x), axis=(1, 2), keepdims=True)
        x = jnp.clip(mean_gray + factors(kc, contrast) * (x - mean_gray), 0.0, 1.0)
    if sat:
        gray = _luminance(x)
        x = jnp.clip(gray + factors(ks, sat) * (x - gray), 0.0, 1.0)
    if hue:
        shift = jax.random.uniform(kh, (b, 1, 1), minval=-hue, maxval=hue)
        hsv = _rgb_to_hsv(x)
        hsv = hsv.at[..., 0].set((hsv[..., 0] + shift) % 1.0)
        x = _hsv_to_rgb(hsv)
    apply = jax.random.bernoulli(kp, p, (b, 1, 1, 1))
    return jnp.where(apply, x, orig)


def grayscale_batch(x: jax.Array, key: jax.Array, p: float) -> jax.Array:
    """Random grayscale (3-channel luma) with per-sample probability p."""
    apply = jax.random.bernoulli(key, p, (x.shape[0], 1, 1, 1))
    return jnp.where(apply, jnp.broadcast_to(_luminance(x), x.shape), x)


def random_augment_batch(
    images: jax.Array,
    key: jax.Array,
    *,
    out_size: Tuple[int, int] = (224, 224),
    crop_scale: Tuple[float, float] = (0.9, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
    degrees: Tuple[float, float] = (-20.0, 20.0),
    translate: Tuple[float, float] = (0.3, 0.3),
    affine_scale: Tuple[float, float] = (0.8, 1.2),
    blur_sigma: Tuple[float, float] = (0.1, 2.0),
    hflip_prob: float = 0.5,
    color_jitter: Tuple[float, float, float, float] = None,
    color_jitter_prob: float = 0.0,
    gray_scale_prob: float = 0.0,
    mean: Tuple[float, ...] = OPENAI_DATASET_MEAN,
    std: Tuple[float, ...] = OPENAI_DATASET_STD,
) -> jax.Array:
    """The full MR-CLIP train-time augmentation as one fused device program.

    [B, H, W, C] uint8 -> [B, oh, ow, C] normalized float32. Geometry
    (resized-crop, affine, hflip) is one warp; then 3x3 blur; then normalize.
    """
    b = images.shape[0]
    in_hw = images.shape[1:3]
    k_crop, k_aff, k_flip, k_blur, k_jit, k_gray = jax.random.split(key, 6)

    crop_keys = jax.random.split(k_crop, b)
    aff_keys = jax.random.split(k_aff, b)
    crop_m = jax.vmap(
        lambda k: _random_resized_crop_matrix(k, in_hw, out_size, crop_scale, ratio)
    )(crop_keys)
    aff_m = jax.vmap(
        lambda k: _random_affine_matrix(k, out_size, degrees, translate, affine_scale)
    )(aff_keys)

    # Horizontal flip as an output-space affine: x -> (ow - 1) - x.
    ow = out_size[1]
    flip = jax.random.bernoulli(k_flip, hflip_prob, (b,))
    flip_m = jnp.where(
        flip[:, None, None],
        jnp.array([[-1.0, 0.0, ow - 1.0], [0.0, 1.0, 0.0]]),
        jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]),
    )

    # output -> input = crop_m . affine_m . flip_m (applied to output coords).
    matrices = jax.vmap(_compose)(jax.vmap(_compose)(crop_m, aff_m), flip_m)

    x = affine_sample(images.astype(jnp.float32), matrices, out_size)
    sigma = jax.random.uniform(k_blur, (b,), minval=blur_sigma[0], maxval=blur_sigma[1])
    x = _gaussian_blur3(x, sigma)
    if images.dtype == jnp.uint8:
        x = x / 255.0
    # Optional color extras after geometry, matching the reference's placement
    # (transform.py:349-357), in [0,1] space.
    if color_jitter_prob and color_jitter is not None:
        x = color_jitter_batch(x, k_jit, tuple(color_jitter), color_jitter_prob)
    if gray_scale_prob:
        x = grayscale_batch(x, k_gray, gray_scale_prob)
    return (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)


def eval_preprocess_batch(
    images: jax.Array,
    *,
    out_size: Tuple[int, int] = (224, 224),
    method: str = "bicubic",
    mean: Tuple[float, ...] = OPENAI_DATASET_MEAN,
    std: Tuple[float, ...] = OPENAI_DATASET_STD,
) -> jax.Array:
    """Deterministic device-side eval path: resize(shortest) -> center crop ->
    normalize, for fixed-size input batches. Default bicubic+antialias
    matches the reference EvalTransform (transform.py:366-397, PIL BICUBIC
    = Keys a=-0.5, same kernel as jax.image 'bicubic')."""
    b, h, w, c = images.shape
    oh, ow = out_size
    scale = jnp.maximum(oh / h, ow / w)
    rh, rw = int(round(h * float(scale))), int(round(w * float(scale)))
    x = jax.image.resize(images.astype(jnp.float32), (b, rh, rw, c), method, antialias=True)
    top, left = (rh - oh) // 2, (rw - ow) // 2
    x = x[:, top : top + oh, left : left + ow]
    if images.dtype == jnp.uint8:
        x = x / 255.0
    return (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)
