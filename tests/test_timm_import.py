"""timm ViT tower: native build + checkpoint import parity.

TPU-native replacement for the reference TimmModel adapter
(`src/open_clip/timm_model.py:29-153`): `timm_model_name` configs build the
native VisionTransformer (timm conventions: patch-embed bias, final norm,
no pre-LN) and timm checkpoints remap onto it via
`convert.timm_vit_to_vision_params`. Parity is checked against a
minimal torch implementation of the timm ViT forward (timm itself is not
installed here; the block math is standard pre-LN ViT).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrclip_tpu.convert import timm_vit_to_vision_params
from mrclip_tpu.models.clip import CLIPVisionCfg, build_vision_tower

D, HEADS, LAYERS, PATCH, RES = 32, 2, 2, 8, 32
GRID = RES // PATCH


def _tiny_timm_sd(seed=0, with_norm_pre=False):
    rng = np.random.RandomState(seed)
    r = lambda *s: (rng.randn(*s) * 0.05).astype(np.float32)
    sd = {
        "cls_token": r(1, 1, D),
        "pos_embed": r(1, GRID * GRID + 1, D),
        "patch_embed.proj.weight": r(D, 3, PATCH, PATCH),
        "patch_embed.proj.bias": r(D),
        "norm.weight": 1 + r(D),
        "norm.bias": r(D),
    }
    if with_norm_pre:
        sd["norm_pre.weight"] = 1 + r(D)
        sd["norm_pre.bias"] = r(D)
    for i in range(LAYERS):
        p = f"blocks.{i}."
        sd.update({
            p + "norm1.weight": 1 + r(D), p + "norm1.bias": r(D),
            p + "attn.qkv.weight": r(3 * D, D), p + "attn.qkv.bias": r(3 * D),
            p + "attn.proj.weight": r(D, D), p + "attn.proj.bias": r(D),
            p + "norm2.weight": 1 + r(D), p + "norm2.bias": r(D),
            p + "mlp.fc1.weight": r(4 * D, D), p + "mlp.fc1.bias": r(4 * D),
            p + "mlp.fc2.weight": r(D, 4 * D), p + "mlp.fc2.bias": r(D),
        })
    return sd


def _torch_timm_forward(sd, images):
    """Minimal torch timm-ViT forward (pre-LN blocks, cls-token pool)."""
    import torch
    import torch.nn.functional as F

    t = lambda k: torch.tensor(sd[k])
    x = torch.tensor(images).permute(0, 3, 1, 2)
    x = F.conv2d(x, t("patch_embed.proj.weight"), t("patch_embed.proj.bias"), stride=PATCH)
    x = x.flatten(2).transpose(1, 2)  # [B, N, D]
    b, n, _ = x.shape
    x = torch.cat([t("cls_token").expand(b, -1, -1), x], dim=1) + t("pos_embed")
    if "norm_pre.weight" in sd:
        x = F.layer_norm(x, (D,), t("norm_pre.weight"), t("norm_pre.bias"))
    for i in range(LAYERS):
        p = f"blocks.{i}."
        h = F.layer_norm(x, (D,), t(p + "norm1.weight"), t(p + "norm1.bias"))
        qkv = F.linear(h, t(p + "attn.qkv.weight"), t(p + "attn.qkv.bias"))
        q, k, v = qkv.chunk(3, dim=-1)
        hd = D // HEADS
        shp = (b, n + 1, HEADS, hd)
        q, k, v = (z.view(*shp).transpose(1, 2) for z in (q, k, v))
        a = F.scaled_dot_product_attention(q, k, v)
        a = a.transpose(1, 2).reshape(b, n + 1, D)
        x = x + F.linear(a, t(p + "attn.proj.weight"), t(p + "attn.proj.bias"))
        h = F.layer_norm(x, (D,), t(p + "norm2.weight"), t(p + "norm2.bias"))
        h = F.gelu(F.linear(h, t(p + "mlp.fc1.weight"), t(p + "mlp.fc1.bias")))
        x = x + F.linear(h, t(p + "mlp.fc2.weight"), t(p + "mlp.fc2.bias"))
    x = F.layer_norm(x, (D,), t("norm.weight"), t("norm.bias"))
    return x[:, 0].numpy()


def _build_tower(tname, scan_layers=False, **cfg_kwargs):
    cfg = CLIPVisionCfg(
        layers=LAYERS, width=D, head_width=D // HEADS, patch_size=PATCH,
        image_size=RES, timm_model_name=tname, **cfg_kwargs,
    )
    return build_vision_tower(16, cfg, scan_layers=scan_layers)


@pytest.mark.parametrize("scan_layers", [False, True])
@pytest.mark.parametrize("clip_variant", [False, True])
def test_timm_vit_import_forward_parity(scan_layers, clip_variant):
    # real timm names would fix D/LAYERS; use a tiny custom cfg with the
    # timm conventions by building the tower directly
    from mrclip_tpu.models.vision import VisionTransformer

    sd = _tiny_timm_sd(seed=1, with_norm_pre=clip_variant)
    tower = VisionTransformer(
        image_size=RES, patch_size=PATCH, width=D, layers=LAYERS, heads=HEADS,
        output_dim=None, patch_bias=True, no_ln_pre=not clip_variant,
        pool_type="tok", scan_layers=scan_layers,
    )
    params = timm_vit_to_vision_params(sd, scan_layers=scan_layers)

    rng = np.random.RandomState(2)
    images = rng.rand(2, RES, RES, 3).astype(np.float32)

    # imported tree must exactly match the init template structure
    tpl = jax.eval_shape(
        lambda: tower.init(jax.random.key(0), jnp.asarray(images))
    )["params"]
    keys_t = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(tpl)[0]}
    keys_i = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]}
    assert keys_t == keys_i, f"missing: {keys_t - keys_i}, extra: {keys_i - keys_t}"

    out = tower.apply({"params": params}, jnp.asarray(images))
    ref = _torch_timm_forward(sd, images)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


def test_timm_named_tower_builds():
    """`timm_model_name='vit_base_patch16_224'` builds the native ViT with
    timm dims instead of raising (round-1 gap)."""
    cfg = CLIPVisionCfg(timm_model_name="vit_base_patch16_224", image_size=224)
    tower = build_vision_tower(512, cfg, scan_layers=False)
    assert tower.width == 768 and tower.layers == 12 and tower.heads == 12
    assert tower.patch_bias and tower.no_ln_pre
    cfg = CLIPVisionCfg(timm_model_name="vit_base_patch16_clip_224", image_size=224)
    tower = build_vision_tower(512, cfg, scan_layers=False)
    assert not tower.no_ln_pre  # CLIP variants carry norm_pre


def test_timm_unknown_family_rejected():
    # convnext_* now builds natively (models/convnext.py); efficientnet has
    # no TPU port and must still fail loudly
    cfg = CLIPVisionCfg(timm_model_name="efficientnet_b0", image_size=224)
    with pytest.raises(NotImplementedError, match="no TPU-native mapping"):
        build_vision_tower(512, cfg)
    cfg2 = CLIPVisionCfg(timm_model_name="convnext_base", image_size=256)
    tower = build_vision_tower(640, cfg2)
    assert type(tower).__name__ == "ConvNeXt"


def test_timm_checkpoint_through_load(tmp_path):
    """A bare timm ViT .pt file routes through load_torch_checkpoint into a
    {'visual': ...} tree (convert_state_dict dispatch)."""
    import torch

    from mrclip_tpu.checkpoint import load_torch_checkpoint

    sd = _tiny_timm_sd(seed=3)
    path = str(tmp_path / "timm_vit.pt")
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, path)
    params = load_torch_checkpoint(path, scan_layers=False)
    assert "visual" in params and "conv1" in params["visual"]
    assert params["visual"]["conv1"]["bias"].shape == (D,)


def test_biomedclip_layout_checkpoint_dispatch():
    """open_clip TimmModel + HF-text checkpoints (BiomedCLIP layout:
    `visual.trunk.<timm keys>` + `visual.head.proj` + `text.transformer.*`)
    dispatch through convert_state_dict into a full params tree (each
    sub-converter's numerics are parity-tested separately)."""
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel

    from mrclip_tpu.convert import convert_state_dict

    tiny_bert = {
        "model_type": "bert", "vocab_size": 64, "hidden_size": 16,
        "num_hidden_layers": 1, "num_attention_heads": 2,
        "intermediate_size": 32, "max_position_embeddings": 24,
        "type_vocab_size": 2, "pad_token_id": 0,
    }
    text_cfg = {"hf_model_name": "local/tiny", "hf_model_config": tiny_bert}

    sd = {f"visual.trunk.{k}": v for k, v in _tiny_timm_sd(seed=3).items()}
    sd["visual.head.proj.weight"] = np.random.RandomState(4).randn(16, D).astype(np.float32) * 0.05
    torch.manual_seed(0)
    tm = BertModel(BertConfig(**{k: v for k, v in tiny_bert.items() if k != "model_type"}))
    sd.update({f"text.transformer.{k}": v.numpy() for k, v in tm.state_dict().items()})
    sd["text.proj.weight"] = np.random.RandomState(5).randn(16, 16).astype(np.float32) * 0.05
    sd["logit_scale"] = np.asarray(2.659, np.float32)

    params = convert_state_dict(sd, scan_layers=False, hf_text_cfg=text_cfg)
    assert "visual" in params and "text" in params
    assert params["visual"]["proj"].shape == (D, 16)
    assert set(params["text"]) == {"hf", "proj"}
    assert "transformer" in params["visual"]
    assert float(params["logit_scale"]) == pytest.approx(2.659)
