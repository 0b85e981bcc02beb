"""ModifiedResNet (RN50 family): forward, BN batch_stats update, train step."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # 80s RN50 fixture + 40s steps; fast RN parity lives in test_resnet_import.py

import jax
import jax.numpy as jnp

from mrclip_tpu.factory import create_loss, create_model
from mrclip_tpu.parallel import (
    build_train_step,
    create_optimizer,
    create_train_state,
    make_loss_apply,
)


class Args:
    multipositiveloss = True
    delta = 0.5
    distance = visiononly = siglip = distill = False
    lam = None
    model = "RN50-mini"
    gather_with_grad = True


@pytest.fixture(scope="module")
def rn50_mini():
    from mrclip_tpu.factory import _MODEL_CONFIGS

    _MODEL_CONFIGS["RN50-mini"] = {
        "embed_dim": 32,
        "vision_cfg": {"image_size": 64, "layers": [1, 1, 1, 1], "width": 16, "head_width": 16},
        "text_cfg": {"context_length": 16, "vocab_size": 1000, "width": 32, "heads": 2, "layers": 2},
    }
    return create_model("RN50-mini")


def test_forward_and_batch_stats(rn50_mini):
    model, variables = rn50_mini
    assert "batch_stats" in variables
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    toks = jnp.asarray(rng.randint(1, 999, (2, 16)), jnp.int32)
    out = model.apply(variables, imgs, toks)
    assert out["image_features"].shape == (2, 32)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["image_features"]), axis=-1), 1.0, rtol=1e-5
    )


def test_train_step_updates_bn_stats(rn50_mini):
    model, variables = rn50_mini
    tx = create_optimizer(lr=1e-3)
    state = create_train_state(variables, tx)
    step = build_train_step(model, make_loss_apply(create_loss(Args())), tx, donate=False)
    rng = np.random.RandomState(1)
    batch = {
        "images": jnp.asarray(rng.rand(8, 64, 64, 3), jnp.float32),
        "tokens": jnp.asarray(rng.randint(1, 999, (8, 16)), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 4, (8,)), jnp.int32),
    }
    before = jax.tree.map(np.asarray, state.batch_stats)
    state, metrics = step(state, batch, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    after = state.batch_stats
    deltas = jax.tree.leaves(
        jax.tree.map(lambda a, b: float(jnp.abs(jnp.asarray(a) - b).max()), before, after)
    )
    assert max(deltas) > 0.0, "BN running stats must update in train mode"
