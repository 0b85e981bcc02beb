"""Host transform chain tests (reference transform.py:274-414 semantics)."""

import random

import numpy as np
import pytest
from PIL import Image

from mrclip_tpu.constants import OPENAI_DATASET_MEAN, OPENAI_DATASET_STD
from mrclip_tpu.transforms import (
    AugmentationCfg,
    EvalTransform,
    PreprocessCfg,
    TrainTransform,
    image_transform,
    image_transform_v2,
    merge_preprocess_dict,
)


@pytest.fixture
def img():
    rng = np.random.RandomState(0)
    return Image.fromarray(rng.randint(0, 255, (180, 140), np.uint8), "L")


def test_eval_transform_shapes_and_normalization(img):
    t = EvalTransform(PreprocessCfg(size=96))
    out = t(img)
    assert out.shape == (96, 96, 3)
    assert out.dtype == np.float32
    # inverse-normalize lands back in [0, 1]
    restored = out * np.asarray(OPENAI_DATASET_STD) + np.asarray(OPENAI_DATASET_MEAN)
    assert restored.min() >= -1e-5 and restored.max() <= 1.0 + 1e-5


@pytest.mark.parametrize("mode", ["shortest", "longest", "squash"])
def test_eval_resize_modes(img, mode):
    t = EvalTransform(PreprocessCfg(size=64, resize_mode=mode))
    assert t(img).shape == (64, 64, 3)


def test_train_transform_randomness(img):
    t = TrainTransform(PreprocessCfg(size=96), AugmentationCfg())
    random.seed(0)
    a = t(img)
    b = t(img)
    assert a.shape == (96, 96, 3)
    assert not np.allclose(a, b)  # random augs differ call to call
    random.seed(0)
    c = t(img)
    np.testing.assert_allclose(a, c)  # seeded determinism


def test_image_transform_api(img):
    train_t = image_transform(64, is_train=True, aug_cfg={"scale": (0.8, 1.0)})
    eval_t = image_transform(64, is_train=False)
    assert train_t(img).shape == (64, 64, 3)
    assert eval_t(img).shape == (64, 64, 3)
    v2 = image_transform_v2(PreprocessCfg(size=64), is_train=False)
    assert v2(img).shape == (64, 64, 3)


def test_merge_preprocess_dict():
    merged = merge_preprocess_dict(PreprocessCfg(), {"size": 128, "bogus": 1, "mean": None})
    assert merged["size"] == 128
    assert "bogus" not in merged
    assert merged["mean"] == OPENAI_DATASET_MEAN  # None overlay ignored


def test_small_image_pads(img):
    small = Image.fromarray(np.zeros((20, 30), np.uint8), "L")
    t = EvalTransform(PreprocessCfg(size=64, resize_mode="longest"))
    assert t(small).shape == (64, 64, 3)


# ---- augmentation extras: color jitter / grayscale (reference transform.py:349-357)

@pytest.fixture
def rgb_img():
    rng = np.random.RandomState(1)
    return Image.fromarray(rng.randint(0, 255, (180, 140, 3), np.uint8), "RGB")


def _denorm(arr):
    return arr * np.asarray(OPENAI_DATASET_STD) + np.asarray(OPENAI_DATASET_MEAN)


def test_color_jitter_changes_pixels(rgb_img):
    base = TrainTransform(PreprocessCfg(size=96), AugmentationCfg())
    jit = TrainTransform(
        PreprocessCfg(size=96),
        AugmentationCfg(color_jitter=(0.4, 0.4, 0.4, 0.1), color_jitter_prob=1.0),
    )
    random.seed(3)
    a = base(rgb_img)
    random.seed(3)
    b = jit(rgb_img)
    # identical geometry draws happen first, so any difference is the jitter
    assert not np.allclose(a, b)
    assert np.abs(a - b).max() > 0.05


def test_color_jitter_prob_zero_path_noop(rgb_img):
    """color_jitter_prob falsy + color_jitter None builds the plain chain."""
    t = TrainTransform(PreprocessCfg(size=96), AugmentationCfg())
    assert t.color_jitter is None


def test_gray_scale_prob_one_gives_equal_channels(rgb_img):
    t = TrainTransform(PreprocessCfg(size=96), AugmentationCfg(gray_scale_prob=1.0))
    random.seed(0)
    out = _denorm(t(rgb_img))
    np.testing.assert_allclose(out[..., 0], out[..., 1], atol=1e-6)
    np.testing.assert_allclose(out[..., 1], out[..., 2], atol=1e-6)


def test_color_jitter_without_prob_rejected():
    with pytest.raises(ValueError, match="color_jitter_prob"):
        TrainTransform(PreprocessCfg(size=96), AugmentationCfg(color_jitter=(0.4, 0.4, 0.4, 0.1)))


def test_color_jitter_prob_requires_4tuple():
    with pytest.raises(ValueError, match="4-tuple"):
        TrainTransform(
            PreprocessCfg(size=96),
            AugmentationCfg(color_jitter=0.4, color_jitter_prob=0.8),
        )


def test_use_timm_rejected_loudly():
    with pytest.raises(NotImplementedError, match="timm"):
        TrainTransform(PreprocessCfg(size=96), AugmentationCfg(use_timm=True))


def test_random_erase_rejected_loudly():
    with pytest.raises(NotImplementedError, match="re_prob"):
        TrainTransform(PreprocessCfg(size=96), AugmentationCfg(re_prob=0.25))


def test_unknown_aug_key_raises():
    with pytest.raises(TypeError):
        image_transform(64, is_train=True, aug_cfg={"bogus_knob": 1})


def test_native_backend_accepts_color_extras():
    from mrclip_tpu.transforms import validate_aug_cfg

    # all three backends implement the color extras now
    validate_aug_cfg(
        AugmentationCfg(color_jitter=(0.4, 0.4, 0.4, 0.1), color_jitter_prob=0.8),
        backend="native",
    )
    validate_aug_cfg(AugmentationCfg(scale=(0.8, 1.0)), backend="native")


@pytest.mark.slow
def test_device_color_jitter_and_grayscale():
    import jax
    import jax.numpy as jnp

    from mrclip_tpu.ops.image_ops import (
        color_jitter_batch,
        grayscale_batch,
        random_augment_batch,
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(4, 32, 32, 3), jnp.float32)
    key = jax.random.PRNGKey(0)

    gray = np.asarray(grayscale_batch(x, key, 1.0))
    np.testing.assert_allclose(gray[..., 0], gray[..., 1], atol=1e-6)

    jit = np.asarray(color_jitter_batch(x, key, (0.4, 0.4, 0.4, 0.1), 1.0))
    assert not np.allclose(jit, np.asarray(x))
    assert jit.min() >= 0.0 and jit.max() <= 1.0

    # p=0 is a no-op
    noop = np.asarray(color_jitter_batch(x, key, (0.4, 0.4, 0.4, 0.1), 0.0))
    np.testing.assert_allclose(noop, np.asarray(x))

    # fused path: same key, jitter on vs off -> different pixels
    imgs = jnp.asarray(rng.randint(0, 255, (4, 64, 64, 3)), jnp.uint8)
    a = np.asarray(random_augment_batch(imgs, key, out_size=(32, 32)))
    b = np.asarray(
        random_augment_batch(
            imgs, key, out_size=(32, 32),
            color_jitter=(0.4, 0.4, 0.4, 0.1), color_jitter_prob=1.0,
        )
    )
    assert not np.allclose(a, b)


def test_device_hsv_roundtrip():
    import jax.numpy as jnp

    from mrclip_tpu.ops.image_ops import _hsv_to_rgb, _rgb_to_hsv

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(8, 8, 3), jnp.float32)
    rt = np.asarray(_hsv_to_rgb(_rgb_to_hsv(x)))
    np.testing.assert_allclose(rt, np.asarray(x), atol=1e-5)
