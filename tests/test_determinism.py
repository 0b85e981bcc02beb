"""Determinism controls (SURVEY.md §5): same seed -> identical results.

The reference's determinism story is seed-based (main.py:61-64, epoch-seeded
shuffles); on TPU the whole train step is a deterministic XLA program, so we
can assert bit-identical losses, which the reference never could.
"""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from mrclip_tpu.data import DistributedSampler, UniqueLabelSampler
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


def _run(seed):
    model, variables = create_model("ViT-B-32-mini", rng_seed=seed)
    tx = create_optimizer(lr=1e-3)
    state = create_train_state(variables, tx)
    step = build_train_step(model, make_loss_apply(create_loss(Args())), tx, donate=False)
    rng = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(rng.rand(8, 64, 64, 3), jnp.float32),
        "tokens": jnp.asarray(rng.randint(1, 49408, (8, 32)), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 4, (8,)), jnp.int32),
    }
    losses = []
    for i in range(3):
        state, m = step(state, batch, jax.random.fold_in(jax.random.key(seed), i))
        losses.append(float(m["loss"]))
    return losses


def test_same_seed_bitwise_identical():
    assert _run(0) == _run(0)


@pytest.mark.slow
def test_different_seed_differs():
    assert _run(0) != _run(1)


def test_sampler_epoch_determinism():
    s = DistributedSampler(100, seed=7)
    s.set_epoch(3)
    a = list(iter(s))
    s2 = DistributedSampler(100, seed=7)
    s2.set_epoch(3)
    assert a == list(iter(s2))

    u = UniqueLabelSampler([i % 5 for i in range(50)], batch_size=4, seed=7)
    u.set_epoch(2)
    a = list(iter(u))
    u2 = UniqueLabelSampler([i % 5 for i in range(50)], batch_size=4, seed=7)
    u2.set_epoch(2)
    assert a == list(iter(u2))
