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
