"""Every loss variant drives a real train step (finite loss, params move)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrclip_tpu.factory import create_loss, create_model
from mrclip_tpu.parallel import (
    build_train_step,
    create_optimizer,
    create_train_state,
    make_loss_apply,
)


def _args(**kw):
    class A:
        multipositiveloss = False
        delta = 0.5
        lam = None
        distance = False
        visiononly = False
        siglip = False
        distill = False
        model = "ViT-B-16-SigLIP-mini" if kw.get("siglip") else "ViT-B-32-mini"
        gather_with_grad = True
        loss_dist_impl = "bidir"

    a = A()
    for k, v in kw.items():
        setattr(a, k, v)
    return a


def _batch(with_times=False):
    rng = np.random.RandomState(0)
    b = {
        "images": jnp.asarray(rng.rand(8, 64, 64, 3), jnp.float32),
        "tokens": jnp.asarray(rng.randint(1, 49400, (8, 32)), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 4, (8,)), jnp.int32),
    }
    if with_times:
        b["echo_time"] = jnp.asarray(rng.uniform(0.01, 0.2, (8,)), jnp.float32)
        b["repetition_time"] = jnp.asarray(rng.uniform(0.5, 9.0, (8,)), jnp.float32)
    return b


@pytest.fixture(scope="module")
def mini():
    return create_model("ViT-B-32-mini")


def _step_once(args, model, variables, batch):
    tx = create_optimizer(lr=1e-3)
    state = create_train_state(variables, tx)
    step = build_train_step(model, make_loss_apply(create_loss(args)), tx, donate=False)
    new_state, metrics = step(state, batch, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"])), metrics
    moved = float(
        jnp.abs(
            variables["params"]["visual"]["positional_embedding"]
            - new_state.params["visual"]["positional_embedding"]
        ).max()
    )
    assert moved > 0
    return metrics


def test_distance_loss_train(mini):
    model, variables = mini
    m = _step_once(
        _args(multipositiveloss=True, distance=True), model, variables, _batch(with_times=True)
    )
    assert "image_to_text_loss" in m


@pytest.mark.slow
def test_lam_loss_train(mini):
    model, variables = mini
    m = _step_once(_args(lam=0.3), model, variables, _batch())
    assert "loss_img_to_img" in m


@pytest.mark.slow
def test_siglip_loss_train():
    # SigLIP config has logit_bias + no causal mask + 'last' pooling.
    from mrclip_tpu.factory import _MODEL_CONFIGS

    _MODEL_CONFIGS["ViT-B-16-SigLIP-mini"] = {
        "embed_dim": 64,
        "init_logit_scale": 2.302585,
        "init_logit_bias": -10.0,
        "vision_cfg": {"image_size": 64, "layers": 2, "width": 64, "head_width": 32, "patch_size": 32},
        "text_cfg": {
            "context_length": 32, "vocab_size": 49408, "width": 64, "heads": 2,
            "layers": 2, "no_causal_mask": True, "pool_type": "last",
        },
    }
    model, variables = create_model("ViT-B-16-SigLIP-mini")
    assert "logit_bias" in variables["params"]
    m = _step_once(_args(siglip=True), model, variables, _batch())
    assert np.isfinite(float(m["loss"]))


@pytest.mark.slow
def test_vision_only_loss_train(mini):
    model, variables = mini
    from mrclip_tpu.train.vision_only import build_vision_only_step

    tx = create_optimizer(lr=1e-3)
    state = create_train_state(variables, tx)
    step = build_vision_only_step(model, tx)
    state, metrics = step(state, _batch(), jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
