"""Flash-attention path (ops/flash_attn.py): numerics vs XLA attention.

The Pallas kernel avoids materializing the [B, H, N, N] score matrix in HBM
(round-1 trace: attention = 41% of device time at ViT-B/16 b80, dominated by
fp32 score-matrix traffic). Sequences are padded to the 128-lane boundary
with segment-id masking — these tests pin that the padded kernel is
numerically the same attention, fwd and bwd, incl. the full CLIP model.
Runs in Pallas interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from mrclip_tpu.ops.flash_attn import flash_attention_unpadded


@pytest.mark.parametrize("n,causal", [(197, False), (98, True), (256, False), (70, True)])
def test_matches_xla_attention(n, causal):
    rng = np.random.RandomState(0)
    q, k, v = (jnp.asarray(rng.randn(2, n, 2, 64), jnp.float32) for _ in range(3))
    ref = jax.nn.dot_product_attention(q, k, v, is_causal=causal)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention_unpadded(q, k, v, is_causal=causal)
    assert float(jnp.abs(out - ref).max()) < 1e-4


def test_grads_match_xla_attention():
    rng = np.random.RandomState(1)
    q, k, v = (jnp.asarray(rng.randn(1, 197, 2, 64), jnp.float32) for _ in range(3))
    w = jnp.asarray(rng.randn(64), jnp.float32)

    def loss(fn, q, k, v):
        return (fn(q, k, v) * w).sum()

    # save_residuals=True: the default remat wrapper can't be partial-eval'd
    # in interpret mode (io-callback effects); on hardware both paths run.
    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(
            lambda *a: loss(
                lambda q, k, v: flash_attention_unpadded(q, k, v, save_residuals=True), *a
            ),
            argnums=(0, 1, 2),
        )(q, k, v)
    g_ref = jax.grad(
        lambda *a: loss(lambda q, k, v: jax.nn.dot_product_attention(q, k, v), *a),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(g_flash, g_ref):
        assert float(jnp.abs(a - b).max()) < 1e-3


def test_clip_model_manual_equals_xla():
    """Full mini-CLIP forward: attn_impl='manual' (bf16-probs einsum path)
    == attn_impl='xla' in fp32."""
    from mrclip_tpu.factory import create_model

    kw = dict(scan_layers=False, rng_seed=0)
    model_x, vars_x = create_model("ViT-B-32-mini", attn_impl="xla", **kw)
    model_m, vars_m = create_model("ViT-B-32-mini", attn_impl="manual", **kw)
    rng = np.random.RandomState(5)
    imgs = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    toks = jnp.asarray(rng.randint(1, 49408, (2, 32)), jnp.int32)
    out_x = model_x.apply(vars_x, imgs, toks)
    out_m = model_m.apply(vars_m, imgs, toks)
    for key in ("image_features", "text_features"):
        assert float(jnp.abs(out_x[key] - out_m[key]).max()) < 5e-5


def test_clip_model_bf16_scores_equals_xla_in_fp32():
    """attn_impl='bf16' stores scores in the compute dtype; under fp32
    precision that IS fp32, so it must match the xla path exactly."""
    from mrclip_tpu.factory import create_model

    kw = dict(scan_layers=False, rng_seed=0)
    model_x, vars_x = create_model("ViT-B-32-mini", attn_impl="xla", **kw)
    model_b, vars_b = create_model("ViT-B-32-mini", attn_impl="bf16", **kw)
    rng = np.random.RandomState(7)
    imgs = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    toks = jnp.asarray(rng.randint(1, 49408, (2, 32)), jnp.int32)
    out_x = model_x.apply(vars_x, imgs, toks)
    out_b = model_b.apply(vars_b, imgs, toks)
    for key in ("image_features", "text_features"):
        assert float(jnp.abs(out_x[key] - out_b[key]).max()) < 5e-5


@pytest.mark.slow
def test_clip_model_bf16_scores_close_under_bf16_compute():
    """Under bf16 compute the bf16-score path loses ~1 bf16 ulp on the
    logits; embeddings must stay essentially parallel to the xla path."""
    from mrclip_tpu.factory import create_model

    kw = dict(scan_layers=False, rng_seed=0, precision="bf16")
    model_x, vars_x = create_model("ViT-B-32-mini", attn_impl="xla", **kw)
    model_b, vars_b = create_model("ViT-B-32-mini", attn_impl="bf16", **kw)
    rng = np.random.RandomState(8)
    imgs = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    toks = jnp.asarray(rng.randint(1, 49408, (2, 32)), jnp.int32)
    out_x = model_x.apply(vars_x, imgs, toks)
    out_b = model_b.apply(vars_b, imgs, toks)
    for key in ("image_features", "text_features"):
        a = np.asarray(out_x[key], np.float64)
        b = np.asarray(out_b[key], np.float64)
        cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
        assert cos.min() > 0.999, f"{key} cosine {cos.min()}"


@pytest.mark.slow
def test_clip_model_flash_equals_xla():
    """Full mini-CLIP forward: attn_impl='flash' == attn_impl='xla'."""
    from mrclip_tpu.factory import create_model

    kw = dict(scan_layers=False, rng_seed=0)
    model_x, vars_x = create_model("ViT-B-32-mini", attn_impl="xla", **kw)
    with pltpu.force_tpu_interpret_mode():  # init runs a forward on CPU
        model_f, vars_f = create_model("ViT-B-32-mini", attn_impl="flash", **kw)
    # same seed -> identical params
    chex_equal = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        vars_x["params"], vars_f["params"],
    )
    assert all(jax.tree.leaves(chex_equal))

    rng = np.random.RandomState(2)
    imgs = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    toks = jnp.asarray(rng.randint(1, 49408, (2, 32)), jnp.int32)
    out_x = model_x.apply(vars_x, imgs, toks)
    with pltpu.force_tpu_interpret_mode():
        out_f = model_f.apply(vars_f, imgs, toks)
    for key in ("image_features", "text_features"):
        d = float(jnp.abs(out_x[key] - out_f[key]).max())
        assert d < 5e-5, f"{key} diverges: {d}"
