"""CLIP module API surface: encode_image/encode_text/get_logits
(reference model.py:280-332) and logit-scale handling."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrclip_tpu.factory import create_model


@pytest.fixture(scope="module")
def m():
    model, variables = create_model("ViT-B-32-mini")
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(3, 64, 64, 3), jnp.float32)
    toks = jnp.asarray(rng.randint(1, 49400, (3, 32)), jnp.int32)
    return model, variables, imgs, toks


def test_encode_methods(m):
    model, variables, imgs, toks = m
    img_f = model.apply(variables, imgs, method="encode_image", normalize=True)
    txt_f = model.apply(variables, toks, method="encode_text", normalize=True)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(img_f), axis=-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(txt_f), axis=-1), 1.0, rtol=1e-5)
    raw = model.apply(variables, imgs, method="encode_image", normalize=False)
    assert not np.allclose(np.linalg.norm(np.asarray(raw), axis=-1), 1.0)


def test_get_logits(m):
    model, variables, imgs, toks = m
    li, lt = model.apply(variables, imgs, toks, method="get_logits")
    assert li.shape == (3, 3)
    np.testing.assert_allclose(np.asarray(li), np.asarray(lt).T, atol=1e-6)
    out = model.apply(variables, imgs, toks)
    expect = np.asarray(out["logit_scale"]) * np.asarray(out["image_features"]) @ np.asarray(
        out["text_features"]
    ).T
    np.testing.assert_allclose(np.asarray(li), expect, atol=1e-5)


def test_image_only_and_text_only_forward(m):
    model, variables, imgs, toks = m
    out_i = model.apply(variables, imgs, None)
    assert "image_features" in out_i and "text_features" not in out_i
    out_t = model.apply(variables, None, toks)
    assert "text_features" in out_t and "image_features" not in out_t


def test_frozen_logit_scale():
    model, variables = create_model("ViT-B-32-mini", logit_scale_trainable=False)
    assert "logit_scale" not in variables["params"]
    assert "logit_scale" in variables.get("constants", {})
    # Reference hard-codes ln(10) for the frozen buffer (model.py:254-258),
    # NOT init_logit_scale=ln(1/0.07): a --logitscaletrainable run trains at
    # temperature scale 10.
    np.testing.assert_allclose(
        np.asarray(variables["constants"]["logit_scale"]), np.log(10.0), rtol=1e-6
    )


@pytest.mark.slow
def test_logitscaletrainable_cli_trains_at_scale_10(tmp_path):
    """--logitscaletrainable freezes the temperature at ln(10) (reference
    model.py:254-258) and it survives training unchanged."""
    from mrclip_tpu.train.main import main as train_main

    state = train_main([
        "--dataset-type", "synthetic", "--train-num-samples", "16",
        "--model", "ViT-B-32-mini", "--batch-size", "8", "--epochs", "1",
        "--multipositiveloss", "--precision", "fp32", "--workers", "0",
        "--logs", str(tmp_path / "logs"), "--name", "ls", "--seed", "7",
        "--lr", "1e-2", "--save-frequency", "0", "--logitscaletrainable",
    ])
    assert "logit_scale" not in state.params
    np.testing.assert_allclose(
        np.asarray(state.constants["logit_scale"]), np.log(10.0), rtol=1e-6
    )


def test_trainable_logit_scale_keeps_init_value():
    model, variables = create_model("ViT-B-32-mini")
    np.testing.assert_allclose(
        np.asarray(variables["params"]["logit_scale"]), np.log(1 / 0.07), rtol=1e-6
    )


def test_gelu_approx_mode():
    """--gelu-approx builds tanh-GELU towers: output differs slightly from
    erf but stays close (throughput mode, bench default on TPU)."""
    m1, v1 = create_model("ViT-B-32-mini", rng_seed=0)
    m2, v2 = create_model("ViT-B-32-mini", rng_seed=0, gelu_approx=True)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    o1 = m1.apply(v1, imgs, None)["image_features"]
    o2 = m2.apply(v2, imgs, None)["image_features"]
    d = np.abs(np.asarray(o1) - np.asarray(o2)).max()
    assert 0 < d < 1e-2, d
