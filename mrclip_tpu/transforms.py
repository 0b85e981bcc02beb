"""Host-side image preprocessing + transform config surface.

Capability parity with reference `src/open_clip/transform.py`:
- `PreprocessCfg` (:16-58) / `AugmentationCfg` (:61-72) dataclasses and merge
  helpers,
- `image_transform` / `image_transform_v2` (:274-414): eval resize modes
  `shortest` (default) / `longest` / `squash`, train-time MR-CLIP chain
  RandomResizedCrop(0.9-1.0) -> RandomAffine(+-20deg, translate 0.3, scale
  0.8-1.2) -> GaussianBlur(3) -> RandomHorizontalFlip -> Normalize
  (:334-365).

Two backends:
- host (this module): PIL geometry + numpy, sample-at-a-time — exact
  torchvision-equivalent semantics for CPU workers and eval parity.
- device: `ops.image_ops.random_augment_batch` fuses the whole train chain
  into one XLA program (the TPU-native path; train loop default).

Transforms return numpy float32 [H, W, C] (NHWC — TPU conv layout) rather
than torch CHW tensors.
"""

from __future__ import annotations

import dataclasses
import random
from dataclasses import asdict, dataclass
from typing import Any, Dict, Optional, Tuple, Union

import numpy as np
from PIL import Image, ImageFilter

from .constants import OPENAI_DATASET_MEAN, OPENAI_DATASET_STD


@dataclass
class PreprocessCfg:
    """Preprocessing config (reference transform.py:16-58)."""

    size: Union[int, Tuple[int, int]] = 224
    mode: str = "RGB"
    mean: Tuple[float, ...] = OPENAI_DATASET_MEAN
    std: Tuple[float, ...] = OPENAI_DATASET_STD
    interpolation: str = "bicubic"
    resize_mode: str = "shortest"
    fill_color: int = 0

    @property
    def num_channels(self) -> int:
        return 3

    @property
    def input_size(self) -> Tuple[int, int, int]:
        if isinstance(self.size, (tuple, list)):
            return (self.num_channels,) + tuple(self.size)
        return (self.num_channels, self.size, self.size)


_PREPROCESS_KEYS = {f.name for f in dataclasses.fields(PreprocessCfg)}


def merge_preprocess_dict(base: Union[PreprocessCfg, Dict], overlay: Dict) -> Dict:
    """Merge overlay into base, keeping only valid keys (reference :44-58)."""
    if isinstance(base, PreprocessCfg):
        base_clean = asdict(base)
    else:
        base_clean = {k: v for k, v in base.items() if k in _PREPROCESS_KEYS}
    if overlay:
        overlay_clean = {k: v for k, v in overlay.items() if k in _PREPROCESS_KEYS and v is not None}
        base_clean.update(overlay_clean)
    return base_clean


def merge_preprocess_kwargs(base: PreprocessCfg, **kwargs) -> PreprocessCfg:
    return PreprocessCfg(**merge_preprocess_dict(base, kwargs))


@dataclass
class AugmentationCfg:
    """Train-time augmentation knobs (reference transform.py:61-72)."""

    scale: Tuple[float, float] = (0.9, 1.0)
    ratio: Optional[Tuple[float, float]] = None
    color_jitter: Optional[Union[float, Tuple[float, float, float], Tuple[float, float, float, float]]] = None
    re_prob: Optional[float] = None
    re_count: Optional[int] = None
    use_timm: bool = False
    color_jitter_prob: Optional[float] = None
    gray_scale_prob: Optional[float] = None


def _to_2tuple(x):
    return tuple(x) if isinstance(x, (tuple, list)) else (x, x)


_PIL_INTERP = {
    "bicubic": Image.BICUBIC,
    "bilinear": Image.BILINEAR,
    "nearest": Image.NEAREST,
    "random": Image.BICUBIC,
}


def _to_rgb(img: Image.Image) -> Image.Image:
    return img.convert("RGB")


def _normalize(arr: np.ndarray, mean, std) -> np.ndarray:
    arr = arr.astype(np.float32) / 255.0
    return (arr - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


def _resize_shortest(img: Image.Image, size: Tuple[int, int], interp) -> Image.Image:
    """torchvision Resize(int) semantics: shortest edge to `size`."""
    target = size[0]
    w, h = img.size
    short, long = (w, h) if w <= h else (h, w)
    if short == target:
        return img
    new_short = target
    new_long = int(round(target * long / short))
    nw, nh = (new_short, new_long) if w <= h else (new_long, new_short)
    return img.resize((nw, nh), interp)


def _center_crop(img: Image.Image, size: Tuple[int, int], fill: int = 0) -> Image.Image:
    th, tw = size
    w, h = img.size
    if w < tw or h < th:
        # CenterCropOrPad behavior (reference :88-155): pad then crop.
        canvas = Image.new(img.mode, (max(w, tw), max(h, th)), fill)
        canvas.paste(img, ((canvas.width - w) // 2, (canvas.height - h) // 2))
        img, (w, h) = canvas, canvas.size
    left = (w - tw) // 2
    top = (h - th) // 2
    return img.crop((left, top, left + tw, top + th))


def _resize_longest(img: Image.Image, size: Tuple[int, int], interp) -> Image.Image:
    """ResizeKeepRatio(longest=1): longest edge to target (reference :88-135)."""
    w, h = img.size
    scale = min(size[1] / w, size[0] / h)
    return img.resize((int(round(w * scale)), int(round(h * scale))), interp)


class EvalTransform:
    """Deterministic eval preprocessing (reference transform.py:366-397)."""

    def __init__(self, cfg: PreprocessCfg):
        self.cfg = cfg
        self.size = _to_2tuple(cfg.size)
        self.interp = _PIL_INTERP.get(cfg.interpolation, Image.BICUBIC)

    def __call__(self, img: Image.Image) -> np.ndarray:
        cfg = self.cfg
        if cfg.resize_mode == "longest":
            img = _resize_longest(img, self.size, self.interp)
            img = _center_crop(img, self.size, cfg.fill_color)
        elif cfg.resize_mode == "squash":
            img = img.resize((self.size[1], self.size[0]), self.interp)
        else:  # shortest
            img = _resize_shortest(img, self.size, self.interp)
            img = _center_crop(img, self.size, cfg.fill_color)
        img = _to_rgb(img)
        return _normalize(np.asarray(img), cfg.mean, cfg.std)


def _adjust_hue(img: Image.Image, hue_factor: float) -> Image.Image:
    """torchvision F.adjust_hue PIL semantics: shift H in HSV space by
    hue_factor (in turns, |h| <= 0.5), uint8 wraparound."""
    if abs(hue_factor) > 0.5:
        raise ValueError(f"hue_factor {hue_factor} not in [-0.5, 0.5]")
    if img.mode in ("L", "1", "I", "F"):
        return img
    h, s, v = img.convert("HSV").split()
    np_h = np.asarray(h, dtype=np.uint8)
    np_h = (np_h.astype(np.int16) + int(round(hue_factor * 255))).astype(np.uint8)
    hsv = Image.merge("HSV", (Image.fromarray(np_h, "L"), s, v))
    return hsv.convert("RGB")


class ColorJitter:
    """torchvision ColorJitter on PIL images (reference wraps it with an
    apply-probability at transform.py:242-256).

    brightness/contrast/saturation: scalar b -> factor ~ U[max(0,1-b), 1+b]
    (PIL ImageEnhance, matching torchvision's PIL backend); hue: scalar h ->
    shift ~ U[-h, h]. The four ops run in a random order per call, like
    torchvision's randperm(4).
    """

    def __init__(self, brightness=0.0, contrast=0.0, saturation=0.0, hue=0.0, p=0.8):
        assert 0.0 <= p <= 1.0
        self.p = p
        self.brightness = self._range(brightness, "brightness")
        self.contrast = self._range(contrast, "contrast")
        self.saturation = self._range(saturation, "saturation")
        self.hue = self._range(hue, "hue", center=0.0, bound=0.5)

    @staticmethod
    def _range(value, name, center=1.0, bound=float("inf")):
        if value is None:
            return None
        if isinstance(value, (tuple, list)):
            lo, hi = float(value[0]), float(value[1])
        else:
            value = float(value)
            lo, hi = center - value, center + value
            lo = max(lo, 0.0 if center == 1.0 else -bound)
        if lo == hi == center:
            return None
        return (max(lo, -bound), min(hi, bound))

    def _jitter(self, img: Image.Image) -> Image.Image:
        from PIL import ImageEnhance

        ops = list(range(4))
        random.shuffle(ops)
        for idx in ops:
            if idx == 0 and self.brightness:
                img = ImageEnhance.Brightness(img).enhance(random.uniform(*self.brightness))
            elif idx == 1 and self.contrast:
                img = ImageEnhance.Contrast(img).enhance(random.uniform(*self.contrast))
            elif idx == 2 and self.saturation:
                img = ImageEnhance.Color(img).enhance(random.uniform(*self.saturation))
            elif idx == 3 and self.hue:
                img = _adjust_hue(img, random.uniform(*self.hue))
        return img

    def __call__(self, img: Image.Image) -> Image.Image:
        if random.random() < self.p:
            return self._jitter(img)
        return img


def _gaussian_blur3_pil(img: Image.Image, sigma: float) -> Image.Image:
    """torchvision GaussianBlur(kernel_size=3, sigma) on PIL.

    The reference chain uses a 3x3 kernel (transform.py:346) — PIL's
    ImageFilter.GaussianBlur(radius=sigma) has ~3*sigma support and blurs
    far more at sigma near 2, so a Kernel filter with the exact 3-tap
    weights (w = exp(-0.5/sigma^2), normalized) keeps the host backend
    aligned with ops/image_ops._gaussian_blur3 and native/loader.cc blur3.
    (Border handling differs by one pixel: PIL replicates edges only for
    interior-adjacent taps.)"""
    w = float(np.exp(-0.5 / (sigma * sigma)))
    k1 = np.array([w, 1.0, w]) / (1.0 + 2.0 * w)
    k2 = np.outer(k1, k1).reshape(-1)
    return img.filter(ImageFilter.Kernel((3, 3), tuple(k2), scale=1.0))


def _to_grayscale3(img: Image.Image) -> Image.Image:
    """torchvision Grayscale(num_output_channels=3) on PIL: L replicated."""
    return img.convert("L").convert("RGB")


def validate_aug_cfg(aug: AugmentationCfg, backend: str = "host") -> None:
    """Reject unusable augmentation requests loudly instead of silently
    dropping them (reference warns for non-timm leftovers, transform.py:363).

    backend: 'host' (PIL TrainTransform), 'device' (random_augment_batch),
    'native' (C++ loader — geometry/blur only, no color extras).
    """
    if aug.use_timm:
        raise NotImplementedError(
            "aug_cfg use_timm=True requests the timm training pipeline "
            "(reference transform.py:310-332); timm is not available in this "
            "build — use the native MR-CLIP chain (drop use_timm)."
        )
    if aug.re_prob or aug.re_count:
        raise NotImplementedError(
            "aug_cfg re_prob/re_count (random erasing) are timm-pipeline-only "
            "knobs in the reference (transform.py:61-72) and are not applied "
            "by the MR-CLIP chain; remove them or implement random erasing."
        )
    if aug.color_jitter_prob:
        if aug.color_jitter is None or (
            isinstance(aug.color_jitter, (tuple, list)) and len(aug.color_jitter) != 4
        ) or not isinstance(aug.color_jitter, (tuple, list)):
            raise ValueError(
                "color_jitter_prob requires color_jitter=(brightness, contrast, "
                "saturation, hue) 4-tuple (reference transform.py:349-352)"
            )
    elif aug.color_jitter is not None:
        raise ValueError(
            "aug_cfg color_jitter without color_jitter_prob is only consumed "
            "by the timm pipeline (unavailable); set color_jitter_prob to "
            "apply jitter in the MR-CLIP chain (reference transform.py:349-352)"
        )
    # All three backends (host PIL, device XLA, native C++) implement the
    # color extras; nothing further to gate per-backend.


class TrainTransform:
    """MR-CLIP train augmentation chain, host backend
    (reference transform.py:334-365). Per-sample PIL ops; the batched device
    backend is `ops.image_ops.random_augment_batch`."""

    def __init__(self, cfg: PreprocessCfg, aug: Optional[AugmentationCfg] = None):
        self.cfg = cfg
        self.aug = aug or AugmentationCfg()
        validate_aug_cfg(self.aug, backend="host")
        self.size = _to_2tuple(cfg.size)
        self.interp = _PIL_INTERP.get(cfg.interpolation, Image.BICUBIC)
        self.color_jitter = None
        if self.aug.color_jitter_prob:
            self.color_jitter = ColorJitter(
                *self.aug.color_jitter, p=self.aug.color_jitter_prob
            )

    def _random_resized_crop(self, img: Image.Image) -> Image.Image:
        scale = self.aug.scale or (0.9, 1.0)
        ratio = self.aug.ratio or (3.0 / 4.0, 4.0 / 3.0)
        w, h = img.size
        area = w * h
        for _ in range(10):
            target_area = area * random.uniform(*scale)
            aspect = np.exp(random.uniform(np.log(ratio[0]), np.log(ratio[1])))
            cw = int(round(np.sqrt(target_area * aspect)))
            ch = int(round(np.sqrt(target_area / aspect)))
            if 0 < cw <= w and 0 < ch <= h:
                x0 = random.randint(0, w - cw)
                y0 = random.randint(0, h - ch)
                box = (x0, y0, x0 + cw, y0 + ch)
                return img.resize((self.size[1], self.size[0]), self.interp, box=box)
        # fallback: center crop to in-range aspect
        img = _center_crop(img, (min(h, w), min(h, w)))
        return img.resize((self.size[1], self.size[0]), self.interp)

    def _random_affine(self, img: Image.Image) -> Image.Image:
        angle = random.uniform(-20.0, 20.0)
        tx = random.uniform(-0.3, 0.3) * img.width
        ty = random.uniform(-0.3, 0.3) * img.height
        s = random.uniform(0.8, 1.2)
        cx, cy = img.width * 0.5, img.height * 0.5
        a = np.deg2rad(angle)
        cos, sin = np.cos(a) / s, np.sin(a) / s
        # PIL takes the inverse (output->input) 6-tuple.
        ox = cx - cos * (cx + tx) - sin * (cy + ty)
        oy = cy + sin * (cx + tx) - cos * (cy + ty)
        return img.transform(
            img.size, Image.AFFINE, (cos, sin, ox, -sin, cos, oy), self.interp
        )

    def __call__(self, img: Image.Image) -> np.ndarray:
        img = self._random_resized_crop(img)
        img = _to_rgb(img)
        img = self._random_affine(img)
        img = _gaussian_blur3_pil(img, random.uniform(0.1, 2.0))
        if random.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        # Optional extras AFTER flip, matching reference order (transform.py:349-357).
        if self.color_jitter is not None:
            img = self.color_jitter(img)
        if self.aug.gray_scale_prob and random.random() < self.aug.gray_scale_prob:
            img = _to_grayscale3(img)
        return _normalize(np.asarray(img), self.cfg.mean, self.cfg.std)


def image_transform(
    image_size: Union[int, Tuple[int, int]],
    is_train: bool,
    mean: Optional[Tuple[float, ...]] = None,
    std: Optional[Tuple[float, ...]] = None,
    resize_mode: Optional[str] = None,
    interpolation: Optional[str] = None,
    fill_color: int = 0,
    aug_cfg: Optional[Union[Dict[str, Any], AugmentationCfg]] = None,
):
    """Reference `image_transform` API (transform.py:274-397)."""
    cfg = PreprocessCfg(
        size=image_size,
        mean=mean or OPENAI_DATASET_MEAN,
        std=std or OPENAI_DATASET_STD,
        interpolation=interpolation or "bicubic",
        resize_mode=resize_mode or "shortest",
        fill_color=fill_color,
    )
    if is_train:
        if isinstance(aug_cfg, dict):
            aug_cfg = AugmentationCfg(**aug_cfg)
        return TrainTransform(cfg, aug_cfg)
    return EvalTransform(cfg)


def image_transform_v2(
    cfg: PreprocessCfg,
    is_train: bool,
    aug_cfg: Optional[Union[Dict[str, Any], AugmentationCfg]] = None,
):
    """Reference `image_transform_v2` (transform.py:400-414)."""
    return image_transform(
        image_size=cfg.size,
        is_train=is_train,
        mean=cfg.mean,
        std=cfg.std,
        interpolation=cfg.interpolation,
        resize_mode=cfg.resize_mode,
        fill_color=cfg.fill_color,
        aug_cfg=aug_cfg,
    )
