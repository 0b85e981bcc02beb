"""Streaming-loss equivalence: chunked == dense multipositive SupCon."""

from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from mrclip_tpu.losses import multipositive_clip_loss
from mrclip_tpu.losses.functional import (
    multi_positive_cross_entropy_loss,
    pos_mask_from_labels,
)
from mrclip_tpu.ops.fused_loss import (
    chunked_multipositive_clip_loss,
    chunked_multipositive_loss,
)


@pytest.fixture(scope="module")
def inputs():
    key = jax.random.key(3)
    k1, k2, k3 = jax.random.split(key, 3)
    n, d = 128, 32
    q = jax.random.normal(k1, (n, d))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    k = jax.random.normal(k2, (n, d))
    k = k / jnp.linalg.norm(k, axis=-1, keepdims=True)
    labels = jax.random.randint(k3, (n,), 0, 7)
    return q, k, labels


@pytest.mark.parametrize("chunk", [16, 32, 128])
def test_chunked_equals_dense(inputs, chunk):
    q, k, labels = inputs
    scale = jnp.float32(25.0)
    dense = multi_positive_cross_entropy_loss(
        scale * q @ k.T, pos_mask_from_labels(labels, labels)
    )
    streamed = chunked_multipositive_loss(q, k, labels, labels, scale, chunk_size=chunk)
    np.testing.assert_allclose(np.asarray(streamed), np.asarray(dense), rtol=1e-5)


def test_chunked_gradients_match(inputs):
    q, k, labels = inputs
    scale = jnp.float32(25.0)

    def dense_fn(q, k):
        return multi_positive_cross_entropy_loss(
            scale * q @ k.T, pos_mask_from_labels(labels, labels)
        )

    def chunk_fn(q, k):
        return chunked_multipositive_loss(q, k, labels, labels, scale, chunk_size=32)

    gd = jax.grad(dense_fn, argnums=(0, 1))(q, k)
    gc = jax.grad(chunk_fn, argnums=(0, 1))(q, k)
    for a, b in zip(gd, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_chunked_clip_loss_single_device(inputs):
    q, k, labels = inputs
    scale = jnp.float32(25.0)
    dense = multipositive_clip_loss(q, k, labels, scale, delta=0.3)["loss"]
    streamed = chunked_multipositive_clip_loss(q, k, labels, scale, delta=0.3, chunk_size=32)["loss"]
    np.testing.assert_allclose(np.asarray(streamed), np.asarray(dense), rtol=1e-5)


def test_chunked_clip_loss_sharded(inputs):
    q, k, labels = inputs
    scale = jnp.float32(25.0)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    expected = multipositive_clip_loss(q, k, labels, scale)["loss"]

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=(P("data"),) * 3, out_specs=P())
    def sharded(q, k, labels):
        out = chunked_multipositive_clip_loss(
            q, k, labels, scale, axis_name="data", chunk_size=32
        )["loss"]
        return jax.lax.pmean(out, "data")

    np.testing.assert_allclose(
        np.asarray(sharded(q, k, labels)), np.asarray(expected), rtol=2e-5
    )


def test_diagonal_exclusion(inputs):
    q, _, labels = inputs
    scale = jnp.float32(25.0)
    pos = pos_mask_from_labels(labels, labels)
    rows = jnp.arange(q.shape[0])
    pos = pos.at[rows, rows].set(0.0)
    dense = multi_positive_cross_entropy_loss(scale * q @ q.T, pos)
    streamed = chunked_multipositive_loss(
        q, q, labels, labels, scale, chunk_size=32,
        exclude_diagonal_offset=jnp.int32(0),
    )
    np.testing.assert_allclose(np.asarray(streamed), np.asarray(dense), rtol=1e-5)
