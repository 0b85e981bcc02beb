"""Pallas depthwise conv (ops/dw_conv.py): fwd + grads == XLA conv.

The r5 MobileCLIP-S1 trace showed XLA's depthwise lowering at ~50% VPU
with a 6.3%-BW filter-grad fusion, 40% of the step; the Pallas kernel is
the replacement on the single-device path (models.layers.DepthwiseConv
dispatches). Parity here runs the kernel in interpret mode on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrclip_tpu.ops.dw_conv import dw_conv


def _xla_dw(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=kernel.shape[3],
    )


@pytest.mark.parametrize("k,h,w,c", [(3, 8, 8, 16), (7, 12, 10, 8), (5, 9, 9, 4)])
def test_dw_conv_forward_matches_xla(k, h, w, c):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, h, w, c), jnp.float32)
    kern = jnp.asarray(rng.randn(k, k, 1, c), jnp.float32) * 0.2
    got = dw_conv(x, kern, interpret=True)
    want = _xla_dw(x, kern)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k", [3, 7])
def test_dw_conv_grads_match_xla(k):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 10, 10, 8), jnp.float32)
    kern = jnp.asarray(rng.randn(k, k, 1, 8), jnp.float32) * 0.2
    cot = jnp.asarray(rng.randn(2, 10, 10, 8), jnp.float32)

    def loss_pallas(x, kern):
        return (dw_conv(x, kern, interpret=True) * cot).sum()

    def loss_xla(x, kern):
        return (_xla_dw(x, kern) * cot).sum()

    gx_p, gk_p = jax.grad(loss_pallas, argnums=(0, 1))(x, kern)
    gx_x, gk_x = jax.grad(loss_xla, argnums=(0, 1))(x, kern)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_x), rtol=1e-4, atol=1e-4)


def test_dw_conv_bf16_io():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 8, 8), jnp.bfloat16)
    kern = jnp.asarray(rng.randn(3, 3, 1, 8), jnp.float32) * 0.2
    y = dw_conv(x, kern, interpret=True)
    assert y.dtype == jnp.bfloat16
    want = _xla_dw(x.astype(jnp.float32), kern)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(want), rtol=2e-2, atol=2e-2
    )


def test_depthwise_conv_module_param_compat():
    """DepthwiseConv's param tree == nn.Conv's depthwise tree, and the two
    impls (env-switched) agree numerically."""
    from flax import linen as nn

    from mrclip_tpu.models.layers import DepthwiseConv

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 8, 16), jnp.float32)
    mod = DepthwiseConv(16, 7)
    ref = nn.Conv(16, (7, 7), padding=3, feature_group_count=16)
    v = mod.init(jax.random.key(0), x)
    v_ref = ref.init(jax.random.key(0), x)
    shapes = jax.tree.map(jnp.shape, v)
    shapes_ref = jax.tree.map(jnp.shape, v_ref)
    assert shapes == shapes_ref
    got = mod.apply(v_ref, x)  # same tree loads interchangeably
    want = ref.apply(v_ref, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
