"""Int8 W8A8 quantized inference (ops/quant.py).

The reference has no quantized serving; this pins the TPU-native extension:
per-channel int8 weights + dynamic per-row int8 activations must (a) be
exact when the values are exactly representable, (b) keep full-model
embeddings essentially parallel to the fp32 forward, and (c) jit with the
quantized tables as pytree args (not baked constants).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mrclip_tpu.factory import create_model
from mrclip_tpu.ops.quant import (
    int8_matmul,
    make_quantized_apply,
    quantize_dense_kernels,
)


def test_int8_matmul_exact_on_representable_values():
    # Kernel with per-column max 127 and integer entries: scale = 1, the
    # quantization is lossless; activations likewise integers <= 127.
    rng = np.random.RandomState(0)
    k = rng.randint(-127, 128, (64, 32)).astype(np.float32)
    k[0, :] = 127  # pin every column's abs-max so scales are exactly 1
    x = rng.randint(-127, 128, (4, 64)).astype(np.float32)
    x[:, 0] = 127  # per-row abs-max -> row scales exactly 1
    s = jnp.maximum(jnp.max(jnp.abs(jnp.asarray(k)), axis=0), 1e-8) / 127.0
    q = jnp.clip(jnp.round(jnp.asarray(k) / s), -127, 127).astype(jnp.int8)
    out = int8_matmul(jnp.asarray(x), q, s, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), x @ k, rtol=1e-6)


def test_quantize_strips_kernels_and_keeps_structure():
    model, variables = create_model("ViT-B-32-mini", scan_layers=False, rng_seed=0)
    stripped, qkernels = quantize_dense_kernels(variables)
    assert len(qkernels) > 10  # attn in/out proj + mlp of every block
    embeds = 0
    for path, ent in qkernels.items():
        node = stripped["params"]
        for name in path:
            node = node[name]
        if "q" in ent:  # Dense kernel: stripped from the tree
            assert ent["q"].dtype == jnp.int8
            assert ent["s"].shape == (ent["q"].shape[1],)
            assert "kernel" not in node
        else:  # Embed table: int8 leaf replaced in place, per-row scales
            embeds += 1
            assert node["embedding"].dtype == jnp.int8
            assert ent["s"].shape == (node["embedding"].shape[0],)
    assert embeds >= 1  # token_embedding quantized too


def test_quantized_model_matches_fp32_embeddings():
    model, variables = create_model("ViT-B-32-mini", scan_layers=False, rng_seed=0)
    rng = np.random.RandomState(3)
    imgs = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    toks = jnp.asarray(rng.randint(1, 49408, (2, 32)), jnp.int32)

    ref = model.apply(variables, imgs, toks)
    stripped, qkernels = quantize_dense_kernels(variables)
    fn = jax.jit(make_quantized_apply(model))
    out = fn(stripped, qkernels, imgs, toks)

    for key in ("image_features", "text_features"):
        a = np.asarray(ref[key], np.float64)
        b = np.asarray(out[key], np.float64)
        cos = (a * b).sum(-1) / (
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
        )
        assert cos.min() > 0.99, f"{key} cosine {cos.min()}"
    # retrieval structure preserved: per-image logit ranking unchanged
    la = np.asarray(ref["image_features"]) @ np.asarray(ref["text_features"]).T
    lb = np.asarray(out["image_features"]) @ np.asarray(out["text_features"]).T
    assert (la.argmax(-1) == lb.argmax(-1)).all()


def test_quantized_hf_text_tower():
    """W8A8 over a CLIP with an HF (BERT) text tower: the HF Dense kernels
    and embedding tables quantize through the same interceptor (the
    BiomedCLIP serving combo)."""
    from tests.test_hf_text import TEXT_HF, VISION_MINI
    from mrclip_tpu.models.clip import CLIP

    model = CLIP(embed_dim=16, vision_cfg=VISION_MINI, text_cfg=TEXT_HF,
                 scan_layers=False)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
    toks = jnp.asarray(rng.randint(1, 128, (2, 16)), jnp.int32)
    variables = dict(model.init(jax.random.key(0), imgs, toks))

    stripped, qkernels = quantize_dense_kernels(variables, min_elems=512)
    hf_entries = [p for p in qkernels if "hf" in p]
    assert hf_entries, "no HF tower weights quantized"

    ref = model.apply(variables, imgs, toks)
    out = jax.jit(make_quantized_apply(model))(stripped, qkernels, imgs, toks)
    for key in ("image_features", "text_features"):
        a = np.asarray(ref[key], np.float64)
        b = np.asarray(out[key], np.float64)
        cos = (a * b).sum(-1) / (
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
        )
        assert cos.min() > 0.98, f"{key} cosine {cos.min()}"
