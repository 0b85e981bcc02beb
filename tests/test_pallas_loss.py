"""Pallas fused loss vs dense reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrclip_tpu.losses.functional import (
    multi_positive_cross_entropy_loss,
    pos_mask_from_labels,
)
from mrclip_tpu.ops.pallas_loss import (
    pallas_multipositive_clip_loss,
    pallas_multipositive_loss,
)


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


@pytest.mark.slow
def test_logit_scale_gradient_matches_dense():
    """The custom VJP must return a real logit_scale cotangent (it used to
    return None -> the trainable temperature silently froze under
    --pallas-loss)."""
    from mrclip_tpu.losses.contrastive import multipositive_clip_loss

    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.randn(16, 32), jnp.float32)
    txt = jnp.asarray(rng.randn(16, 32), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 5, (16,)), jnp.int32)

    def loss_pallas(scale):
        return pallas_multipositive_clip_loss(img, txt, labels, scale)["loss"]

    def loss_dense(scale):
        return multipositive_clip_loss(img, txt, labels, scale)["loss"]

    s = jnp.float32(14.0)
    g_pallas = jax.grad(loss_pallas)(s)
    g_dense = jax.grad(loss_dense)(s)
    assert abs(float(g_dense)) > 1e-6  # the comparison is non-trivial
    np.testing.assert_allclose(float(g_pallas), float(g_dense), rtol=1e-4)


@pytest.mark.slow
def test_non_divisible_batch_matches_dense():
    """Batches that don't divide the block size must shrink the block to a
    divisor instead of silently dropping the tail (n_q=12 @ block 8 used to
    return NaN)."""
    from mrclip_tpu.losses.contrastive import multipositive_clip_loss

    rng = np.random.RandomState(4)
    img = jnp.asarray(rng.randn(12, 16), jnp.float32)
    txt = jnp.asarray(rng.randn(12, 16), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 3, (12,)), jnp.int32)
    s = jnp.float32(10.0)

    got = pallas_multipositive_clip_loss(img, txt, labels, s, block_q=8, block_k=8)
    want = multipositive_clip_loss(img, txt, labels, s)
    np.testing.assert_allclose(float(got["loss"]), float(want["loss"]), rtol=1e-5)

    g_got = jax.grad(
        lambda a: pallas_multipositive_clip_loss(a, txt, labels, s, block_q=8, block_k=8)["loss"]
    )(img)
    g_want = jax.grad(lambda a: multipositive_clip_loss(a, txt, labels, s)["loss"])(img)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want), atol=1e-5)
