"""Train-step integration on the 8-device CPU mesh.

Covers: factory model build, optimizer with wd mask, sharded train step
(loss decreases on a learnable synthetic task), grad accumulation modes,
logit-scale clamp, scheduler curves vs the reference formulas.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrclip_tpu.factory import create_loss, create_model, get_tokenizer, list_models
from mrclip_tpu.parallel import (
    LOGIT_SCALE_MAX,
    build_train_step,
    create_mesh,
    create_optimizer,
    create_train_state,
    local_batch_to_global,
    make_loss_apply,
)
from mrclip_tpu.train.scheduler import const_lr_cooldown, cosine_lr


class Args:
    multipositiveloss = True
    delta = 0.5
    distance = False
    visiononly = False
    siglip = False
    distill = False
    lam = None
    model = "ViT-B-32-mini"
    gather_with_grad = True


def _batch(n=16, img=64, ctx=32, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "images": rng.randint(0, 255, (n, img, img, 3)).astype(np.uint8).astype(np.float32) / 255.0,
        "tokens": rng.randint(1, 49400, (n, ctx)).astype(np.int32),
        "labels": rng.randint(0, 4, (n,)).astype(np.int32),
    }


def test_factory_registry():
    models = list_models()
    assert "ViT-B-16" in models and "RN50" in models and "ViT-B-32-mini" in models
    tok = get_tokenizer("ViT-B-16")
    assert tok.context_length == 98


@pytest.fixture(scope="module")
def model_and_state():
    model, variables = create_model("ViT-B-32-mini", scan_layers=True)
    mesh = create_mesh(dp=4, fsdp=1, tp=2)
    tx = create_optimizer(lr=cosine_lr(1e-3, 10, 100), wd=0.1, grad_clip_norm=1.0)
    state = create_train_state(variables, tx, mesh)
    return model, state, tx, mesh


@pytest.mark.slow
def test_train_step_loss_decreases(model_and_state):
    model, state, tx, mesh = model_and_state
    loss_fn = create_loss(Args())
    step = build_train_step(model, make_loss_apply(loss_fn, mesh), tx, mesh, donate=False)

    batch = local_batch_to_global(mesh, _batch())
    rng = jax.random.key(0)
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8
    assert float(state.params["logit_scale"]) <= LOGIT_SCALE_MAX + 1e-6


def test_param_sharding_applied(model_and_state):
    model, state, tx, mesh = model_and_state
    # TP rule: fused qkv kernel sharded over 'model' on its output dim.
    k = state.params["visual"]["transformer"]["blocks"]["block"]["attn"]["in_proj"]["kernel"]
    spec = k.sharding.spec
    assert "model" in str(spec), spec


def test_accum_matches_single_step_direction():
    """accum_freq microbatching runs and produces finite loss."""
    model, variables = create_model("ViT-B-32-mini")
    tx = create_optimizer(lr=1e-3, wd=0.0)
    state = create_train_state(variables, tx)
    loss_fn = create_loss(Args())
    step = build_train_step(
        model, make_loss_apply(loss_fn), tx, accum_freq=2, donate=False
    )
    state, metrics = step(state, _batch(n=16), jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_cached_features_accum():
    """Reference cached-feature accumulation scheme compiles + runs."""
    model, variables = create_model("ViT-B-32-mini")
    tx = create_optimizer(lr=1e-3, wd=0.0)
    state = create_train_state(variables, tx)
    loss_fn = create_loss(Args())
    step = build_train_step(
        model,
        make_loss_apply(loss_fn),
        tx,
        accum_freq=2,
        cached_features_accum=True,
        donate=False,
    )
    state, metrics = step(state, _batch(n=16), jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))


def test_scheduler_matches_reference_formulas():
    """Pure-python reimplementation of reference scheduler.py:4-57."""
    import math

    base_lr, warmup, steps = 3e-4, 5, 50
    sched = cosine_lr(base_lr, warmup, steps)
    for s in [0, 1, 4, 5, 20, 49]:
        if s < warmup:
            want = base_lr * (s + 1) / warmup
        else:
            e, es = s - warmup, steps - warmup
            want = 0.5 * (1 + math.cos(math.pi * e / es)) * base_lr
        np.testing.assert_allclose(float(sched(s)), want, rtol=1e-4)

    sched = const_lr_cooldown(base_lr, warmup, steps, 10, cooldown_power=2.0, cooldown_end_lr=1e-5)
    for s in [0, 4, 10, 39, 40, 45, 49]:
        if s < warmup:
            want = base_lr * (s + 1) / warmup
        elif s < steps - 10:
            want = base_lr
        else:
            e, es = s - (steps - 10), 10
            decay = (1 - (e / es)) ** 2.0
            want = decay * (base_lr - 1e-5) + 1e-5
        np.testing.assert_allclose(float(sched(s)), want, rtol=1e-4)


def test_bf16_moments_optimizer():
    """--bf16-moments: Adam mu stored in bf16, nu/params stay fp32, and a
    step still produces finite fp32 updates."""
    import optax

    params = {"w": jnp.ones((4, 4), jnp.float32)}
    tx = create_optimizer(lr=1e-3, wd=0.0, moments_dtype="bfloat16")
    state = tx.init(params)
    mus = [l for l in jax.tree.leaves(state) if getattr(l, "dtype", None) == jnp.bfloat16]
    assert mus, "no bf16 moment buffers found"
    grads = {"w": jnp.full((4, 4), 0.5, jnp.float32)}
    updates, state = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    assert new["w"].dtype == jnp.float32
    assert np.isfinite(np.asarray(new["w"])).all()
    assert float(jnp.abs(new["w"] - params["w"]).max()) > 0
