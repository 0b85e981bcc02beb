"""Pallas fused loss vs dense reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrclip_tpu.losses.functional import (
    multi_positive_cross_entropy_loss,
    pos_mask_from_labels,
)
from mrclip_tpu.ops.pallas_loss import pallas_multipositive_loss


@pytest.fixture(scope="module")
def inputs():
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    n_q, n_k, d = 32, 64, 128
    q = jax.random.normal(k1, (n_q, d))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    k = jax.random.normal(k2, (n_k, d))
    k = k / jnp.linalg.norm(k, axis=-1, keepdims=True)
    lq = jax.random.randint(k3, (n_q,), 0, 5)
    lk = jax.random.randint(jax.random.key(9), (n_k,), 0, 5)
    return q, k, lq, lk


def test_pallas_forward_matches_dense(inputs):
    q, k, lq, lk = inputs
    scale = jnp.float32(20.0)
    dense = multi_positive_cross_entropy_loss(scale * q @ k.T, pos_mask_from_labels(lq, lk))
    fused = pallas_multipositive_loss(q, k, lq, lk, scale, 16, 32, True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(dense), rtol=1e-5)


def test_pallas_gradients_match_dense(inputs):
    q, k, lq, lk = inputs
    scale = jnp.float32(20.0)

    def dense_fn(q, k):
        return multi_positive_cross_entropy_loss(scale * q @ k.T, pos_mask_from_labels(lq, lk))

    def fused_fn(q, k):
        return pallas_multipositive_loss(q, k, lq, lk, scale, 16, 32, True)

    gd_q, gd_k = jax.grad(dense_fn, argnums=(0, 1))(q, k)
    gf_q, gf_k = jax.grad(fused_fn, argnums=(0, 1))(q, k)
    np.testing.assert_allclose(np.asarray(gf_q), np.asarray(gd_q), atol=2e-6)
    np.testing.assert_allclose(np.asarray(gf_k), np.asarray(gd_k), atol=2e-6)


def test_pallas_under_jit(inputs):
    q, k, lq, lk = inputs
    scale = jnp.float32(20.0)
    fused = jax.jit(
        lambda q, k: pallas_multipositive_loss(q, k, lq, lk, scale, 16, 32, True)
    )(q, k)
    assert np.isfinite(float(fused))
