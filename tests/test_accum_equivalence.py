"""Cached-feature grad accumulation preserves global negatives.

The reference scheme (train.py:134-183) exists so that accum_freq micro-
batches still contrast against the FULL accumulated batch. Property tested:
the per-microbatch loss computed with spliced cached features equals the
full-batch loss (same logits matrix), unlike plain microbatch accumulation
whose negatives shrink to the microbatch.
"""

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


class Args:
    multipositiveloss = True
    delta = 0.5
    distance = visiononly = siglip = distill = False
    lam = None
    model = "ViT-B-32-mini"
    gather_with_grad = True


def _batch(n):
    rng = np.random.RandomState(0)
    return {
        "images": jnp.asarray(rng.rand(n, 64, 64, 3), jnp.float32),
        "tokens": jnp.asarray(rng.randint(1, 49408, (n, 32)), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 4, (n,)), jnp.int32),
    }


@pytest.mark.slow
def test_cached_accum_loss_matches_full_batch():
    model, variables = create_model("ViT-B-32-mini")
    loss_apply = make_loss_apply(create_loss(Args()))
    tx = create_optimizer(lr=0.0, wd=0.0)  # lr 0: isolate the loss values
    batch = _batch(16)

    state = create_train_state(variables, tx)
    full_step = build_train_step(model, loss_apply, tx, donate=False)
    _, full_metrics = full_step(state, batch, jax.random.key(0))

    state2 = create_train_state(variables, tx)
    cached_step = build_train_step(
        model, loss_apply, tx, accum_freq=2, cached_features_accum=True, donate=False
    )
    _, cached_metrics = cached_step(state2, batch, jax.random.key(0))

    # each microbatch's loss is computed against the full 16-sample negative
    # set, so the mean equals the full-batch loss
    np.testing.assert_allclose(
        float(cached_metrics["loss"]), float(full_metrics["loss"]), rtol=1e-5
    )

    # plain microbatch accumulation contrasts within 8-sample batches only;
    # its loss is genuinely different (fewer negatives -> smaller loss)
    state3 = create_train_state(variables, tx)
    plain_step = build_train_step(
        model, loss_apply, tx, accum_freq=2, cached_features_accum=False, donate=False
    )
    _, plain_metrics = plain_step(state3, batch, jax.random.key(0))
    assert abs(float(plain_metrics["loss"]) - float(full_metrics["loss"])) > 1e-3
