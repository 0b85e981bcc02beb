"""CoCa checkpoint import: torch-oracle parity for the pieces round 1 could
not load (reference transformer.py:185-207 AttentionalPooler, :210-262
cross-attention block, :830-926 MultimodalTransformer) plus a full
coca-layout checkpoint -> create_model round trip with zero overlay warnings.

The torch modules here re-implement the reference *semantics* (LN placement,
MultiheadAttention with kdim=context_dim) to produce oracle outputs; keys are
emitted in the open_clip state-dict layout the importer consumes.
"""

import logging

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from mrclip_tpu.checkpoint import (
    _attn_pool_params,
    _cross_block_params,
    import_torch_state_dict,
)


def _sd(prefix, module):
    return {f"{prefix}{k}": v.detach().numpy() for k, v in module.state_dict().items()}


class TorchAttnPool(torch.nn.Module):
    """Reference AttentionalPooler semantics (transformer.py:185-207)."""

    def __init__(self, d_model, context_dim, n_head, n_queries):
        super().__init__()
        self.query = torch.nn.Parameter(torch.randn(n_queries, d_model))
        self.attn = torch.nn.MultiheadAttention(
            d_model, n_head, kdim=context_dim, vdim=context_dim, batch_first=True
        )
        self.ln_q = torch.nn.LayerNorm(d_model)
        self.ln_k = torch.nn.LayerNorm(context_dim)

    def forward(self, x):
        n = x.shape[0]
        x = self.ln_k(x)
        q = self.ln_q(self.query)
        return self.attn(q.unsqueeze(0).expand(n, -1, -1), x, x, need_weights=False)[0]


@pytest.mark.parametrize("d_model,context_dim", [(16, 24), (16, 16)])
def test_attn_pool_import_parity(d_model, context_dim):
    """Covers both torch MHA storage modes: separate q/k/v projections
    (kdim != d_model — the real CoCa pooler) and fused in_proj."""
    from mrclip_tpu.models.layers import AttentionalPooler

    torch.manual_seed(0)
    ref = TorchAttnPool(d_model, context_dim, n_head=2, n_queries=5)
    x = torch.randn(2, 7, context_dim)
    with torch.no_grad():
        want = ref(x).numpy()

    params = _attn_pool_params(_sd("pool.", ref), "pool.")
    pooler = AttentionalPooler(d_model=d_model, num_heads=2, n_queries=5)
    got = pooler.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


class TorchCrossBlock(torch.nn.Module):
    """Reference ResidualAttentionBlock(is_cross_attention=True)
    (transformer.py:210-262), GELU MLP."""

    def __init__(self, d, heads, mlp_ratio=4.0):
        super().__init__()
        self.ln_1 = torch.nn.LayerNorm(d)
        self.ln_1_kv = torch.nn.LayerNorm(d)
        self.attn = torch.nn.MultiheadAttention(d, heads, batch_first=True)
        self.ln_2 = torch.nn.LayerNorm(d)
        hidden = int(d * mlp_ratio)
        self.mlp = torch.nn.Sequential()
        self.mlp.add_module("c_fc", torch.nn.Linear(d, hidden))
        self.mlp.add_module("gelu", torch.nn.GELU())
        self.mlp.add_module("c_proj", torch.nn.Linear(hidden, d))

    def forward(self, x, kv):
        k = self.ln_1_kv(kv)
        x = x + self.attn(self.ln_1(x), k, k, need_weights=False)[0]
        return x + self.mlp(self.ln_2(x))


@pytest.mark.slow
def test_cross_block_import_parity():
    from mrclip_tpu.models.transformer import ResidualAttentionBlock

    torch.manual_seed(1)
    ref = TorchCrossBlock(16, heads=2)
    x, kv = torch.randn(2, 6, 16), torch.randn(2, 9, 16)
    with torch.no_grad():
        want = ref(x, kv).numpy()

    layer = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = _cross_block_params(layer)
    block = ResidualAttentionBlock(num_heads=2, cross_attn=True)
    got = block.apply({"params": params}, jnp.asarray(x.numpy()), kv=jnp.asarray(kv.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def _rand(*shape):
    return np.random.RandomState(sum(shape)).randn(*shape).astype(np.float32) * 0.02


def _torch_self_block(d, hidden):
    return {
        "ln_1.weight": np.ones(d, np.float32), "ln_1.bias": np.zeros(d, np.float32),
        "attn.in_proj_weight": _rand(3 * d, d), "attn.in_proj_bias": _rand(3 * d),
        "attn.out_proj.weight": _rand(d, d), "attn.out_proj.bias": _rand(d),
        "ln_2.weight": np.ones(d, np.float32), "ln_2.bias": np.zeros(d, np.float32),
        "mlp.c_fc.weight": _rand(hidden, d), "mlp.c_fc.bias": _rand(hidden),
        "mlp.c_proj.weight": _rand(d, hidden), "mlp.c_proj.bias": _rand(d),
    }


def test_full_coca_checkpoint_roundtrip(tmp_path, caplog):
    """A complete coca-mini-layout torch checkpoint loads with every key
    consumed, every template param covered, and a finite forward pass."""
    d, hidden, vocab, ctx = 64, 256, 1000, 24
    sd = {
        "logit_scale": np.asarray(2.6593, np.float32),
        "visual.conv1.weight": _rand(d, 3, 32, 32),
        "visual.class_embedding": _rand(d),
        "visual.positional_embedding": _rand(5, d),
        "visual.ln_pre.weight": np.ones(d, np.float32),
        "visual.ln_pre.bias": np.zeros(d, np.float32),
        "visual.ln_post.weight": np.ones(d, np.float32),
        "visual.ln_post.bias": np.zeros(d, np.float32),
        "visual.proj": _rand(d, d),
        "visual.attn_pool.query": _rand(256, d),
        "visual.attn_pool.attn.in_proj_weight": _rand(3 * d, d),
        "visual.attn_pool.attn.in_proj_bias": _rand(3 * d),
        "visual.attn_pool.attn.out_proj.weight": _rand(d, d),
        "visual.attn_pool.attn.out_proj.bias": _rand(d),
        "visual.attn_pool.ln_q.weight": np.ones(d, np.float32),
        "visual.attn_pool.ln_q.bias": np.zeros(d, np.float32),
        "visual.attn_pool.ln_k.weight": np.ones(d, np.float32),
        "visual.attn_pool.ln_k.bias": np.zeros(d, np.float32),
        "text.token_embedding.weight": _rand(vocab, d),
        "text.positional_embedding": _rand(ctx + 1, d),
        "text.cls_emb": _rand(d),
        "text.ln_final.weight": np.ones(d, np.float32),
        "text.ln_final.bias": np.zeros(d, np.float32),
        "text.text_projection": _rand(d, d),
        "text_decoder.ln_final.weight": np.ones(d, np.float32),
        "text_decoder.ln_final.bias": np.zeros(d, np.float32),
        "text_decoder.text_projection": _rand(d, vocab),
    }
    for i in range(2):
        for key, val in _torch_self_block(d, hidden).items():
            sd[f"visual.transformer.resblocks.{i}.{key}"] = val
            sd[f"text.transformer.resblocks.{i}.{key}"] = val
            sd[f"text_decoder.resblocks.{i}.{key}"] = val
        cross = _torch_self_block(d, hidden)
        cross["ln_1_kv.weight"] = np.ones(d, np.float32)
        cross["ln_1_kv.bias"] = np.zeros(d, np.float32)
        for key, val in cross.items():
            sd[f"text_decoder.cross_attn.{i}.{key}"] = val

    path = str(tmp_path / "coca.pt")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, path)

    from mrclip_tpu.factory import create_model

    with caplog.at_level(logging.WARNING):
        model, variables = create_model("coca-mini", pretrained=path)
    overlay_warnings = [r for r in caplog.records if "Pretrained overlay" in r.message]
    assert not overlay_warnings, [r.message for r in overlay_warnings]

    rng = np.random.RandomState(0)
    out = model.apply(
        variables,
        jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32),
        jnp.asarray(rng.randint(1, vocab, (2, ctx)), jnp.int32),
    )
    for key in ("image_features", "text_features", "logits"):
        assert np.isfinite(np.asarray(out[key])).all(), key


def test_coca_export_import_roundtrip(tmp_path, caplog):
    """hub.export_torch_state_dict(CoCa) -> torch file -> create_model
    reproduces every param leaf exactly (two-way converter consistency)."""
    import jax

    from mrclip_tpu.factory import create_model
    from mrclip_tpu.hub import export_torch_state_dict

    model, variables = create_model("coca-mini", rng_seed=3)
    sd = export_torch_state_dict(variables["params"])
    path = str(tmp_path / "roundtrip.pt")
    torch.save({k: torch.from_numpy(np.array(v)) for k, v in sd.items()}, path)

    with caplog.at_level(logging.WARNING):
        _, variables2 = create_model("coca-mini", pretrained=path, rng_seed=7)
    overlay_warnings = [r for r in caplog.records if "Pretrained overlay" in r.message]
    assert not overlay_warnings, [r.message for r in overlay_warnings]

    flat1 = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    flat2 = jax.tree_util.tree_flatten_with_path(variables2["params"])[0]
    assert len(flat1) == len(flat2)
    for (p1, a), (p2, b) in zip(flat1, flat2):
        assert p1 == p2
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6,
            err_msg=jax.tree_util.keystr(p1),
        )


def test_coca_export_import_roundtrip_layerscale(tmp_path, caplog):
    """Same round trip with ls_init_value set: LayerScale gammas must
    survive export -> import (they are easy to silently drop)."""
    import json
    import os

    import jax

    import mrclip_tpu
    from mrclip_tpu.factory import create_model
    from mrclip_tpu.hub import export_torch_state_dict

    cfg_path = os.path.join(
        os.path.dirname(mrclip_tpu.__file__), "model_configs", "coca-mini.json"
    )
    cfg = json.load(open(cfg_path))
    for sub in ("vision_cfg", "text_cfg", "multimodal_cfg"):
        cfg[sub]["ls_init_value"] = 0.1

    model, variables = create_model(
        "coca-mini", rng_seed=2,
        vision_cfg=cfg["vision_cfg"], text_cfg=cfg["text_cfg"],
        multimodal_cfg=cfg["multimodal_cfg"],
    )
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    assert any("ls_1" in jax.tree_util.keystr(p) for p, _ in flat), "no LayerScale built"

    sd = export_torch_state_dict(variables["params"])
    assert any(k.endswith("ls_1.gamma") for k in sd), "export dropped LayerScale"
    path = str(tmp_path / "ls.pt")
    torch.save({k: torch.from_numpy(np.array(v)) for k, v in sd.items()}, path)

    with caplog.at_level(logging.WARNING):
        _, variables2 = create_model(
            "coca-mini", pretrained=path, rng_seed=9,
            vision_cfg=cfg["vision_cfg"], text_cfg=cfg["text_cfg"],
            multimodal_cfg=cfg["multimodal_cfg"],
        )
    overlay_warnings = [r for r in caplog.records if "Pretrained overlay" in r.message]
    assert not overlay_warnings, [r.message for r in overlay_warnings]
    flat2 = jax.tree_util.tree_flatten_with_path(variables2["params"])[0]
    for (p1, a), (p2, b) in zip(flat, flat2):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=jax.tree_util.keystr(p1))


def test_import_shape_mismatch_is_loud(tmp_path, caplog):
    """A wrong-shaped checkpoint leaf must keep the template param and warn,
    never silently corrupt the tree."""
    import torch as _torch

    from mrclip_tpu.factory import create_model

    sd = {"logit_scale": np.asarray(0.0, np.float32),
          "token_embedding.weight": _rand(7, 8),  # absurd vocab/width
          "positional_embedding": _rand(32, 8),
          "ln_final.weight": np.ones(8, np.float32),
          "ln_final.bias": np.zeros(8, np.float32)}
    path = str(tmp_path / "bad.pt")
    _torch.save({k: _torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, path)
    with caplog.at_level(logging.WARNING):
        model, variables = create_model("ViT-B-32-mini", pretrained=path)
    msgs = [r.message for r in caplog.records if "Pretrained overlay" in r.message]
    assert any("shape" in m for m in msgs), msgs
