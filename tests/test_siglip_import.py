"""webli SigLIP import: MAP-pool ViT trunk + released-layout checkpoint.

The reference's webli tags (`src/open_clip/pretrained.py` SigLIP entries)
load timm-trunk checkpoints: `visual.trunk.*` no-CLS ViT with an
AttentionPoolLatent ('map') head + open_clip text tower with proj bias.
Here: (a) the native MAPHead/no-CLS tower matches a minimal torch oracle of
the timm forward after `convert.timm_vit_to_vision_params`; (b) a synthetic
full checkpoint in the released layout round-trips through
`load_torch_checkpoint` into a working ViT-B-16-SigLIP-style model.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrclip_tpu.convert import timm_vit_to_vision_params
from mrclip_tpu.models.vision import VisionTransformer

D, HEADS, LAYERS, PATCH, RES = 32, 2, 2, 8, 32
N = (RES // PATCH) ** 2


def _tiny_siglip_trunk_sd(seed=0, d=D, layers=LAYERS, patch=PATCH, n=N):
    rng = np.random.RandomState(seed)
    r = lambda *s: (rng.randn(*s) * 0.05).astype(np.float32)
    sd = {
        "pos_embed": r(1, n, d),
        "patch_embed.proj.weight": r(d, 3, patch, patch),
        "patch_embed.proj.bias": r(d),
        "norm.weight": 1 + r(d),
        "norm.bias": r(d),
        "attn_pool.latent": r(1, 1, d),
        "attn_pool.q.weight": r(d, d), "attn_pool.q.bias": r(d),
        "attn_pool.kv.weight": r(2 * d, d), "attn_pool.kv.bias": r(2 * d),
        "attn_pool.proj.weight": r(d, d), "attn_pool.proj.bias": r(d),
        "attn_pool.norm.weight": 1 + r(d), "attn_pool.norm.bias": r(d),
        "attn_pool.mlp.fc1.weight": r(4 * d, d), "attn_pool.mlp.fc1.bias": r(4 * d),
        "attn_pool.mlp.fc2.weight": r(d, 4 * d), "attn_pool.mlp.fc2.bias": r(d),
    }
    for i in range(layers):
        p = f"blocks.{i}."
        sd.update({
            p + "norm1.weight": 1 + r(d), p + "norm1.bias": r(d),
            p + "attn.qkv.weight": r(3 * d, d), p + "attn.qkv.bias": r(3 * d),
            p + "attn.proj.weight": r(d, d), p + "attn.proj.bias": r(d),
            p + "norm2.weight": 1 + r(d), p + "norm2.bias": r(d),
            p + "mlp.fc1.weight": r(4 * d, d), p + "mlp.fc1.bias": r(4 * d),
            p + "mlp.fc2.weight": r(d, 4 * d), p + "mlp.fc2.bias": r(d),
        })
    return sd


def _torch_siglip_forward(sd, images, heads=HEADS):
    """Minimal torch oracle of the timm SigLIP ViT forward: patchify -> +pos
    -> pre-LN blocks -> final norm -> AttentionPoolLatent (map)."""
    import torch
    import torch.nn.functional as F

    t = lambda k: torch.tensor(sd[k])
    x = torch.tensor(images).permute(0, 3, 1, 2)
    x = F.conv2d(x, t("patch_embed.proj.weight"), t("patch_embed.proj.bias"), stride=PATCH)
    x = x.flatten(2).transpose(1, 2)
    x = x + t("pos_embed")
    b, n, d = x.shape
    dh = d // heads
    for i in range(LAYERS):
        p = f"blocks.{i}."
        h = F.layer_norm(x, (d,), t(p + "norm1.weight"), t(p + "norm1.bias"))
        qkv = F.linear(h, t(p + "attn.qkv.weight"), t(p + "attn.qkv.bias"))
        q, k, v = qkv.chunk(3, dim=-1)
        shp = lambda z: z.reshape(b, n, heads, dh).transpose(1, 2)
        a = F.scaled_dot_product_attention(shp(q), shp(k), shp(v))
        a = a.transpose(1, 2).reshape(b, n, d)
        x = x + F.linear(a, t(p + "attn.proj.weight"), t(p + "attn.proj.bias"))
        h = F.layer_norm(x, (d,), t(p + "norm2.weight"), t(p + "norm2.bias"))
        h = F.linear(h, t(p + "mlp.fc1.weight"), t(p + "mlp.fc1.bias"))
        h = F.gelu(h)
        x = x + F.linear(h, t(p + "mlp.fc2.weight"), t(p + "mlp.fc2.bias"))
    x = F.layer_norm(x, (d,), t("norm.weight"), t("norm.bias"))
    # AttentionPoolLatent
    q = F.linear(t("attn_pool.latent").expand(b, -1, -1),
                 t("attn_pool.q.weight"), t("attn_pool.q.bias"))
    kv = F.linear(x, t("attn_pool.kv.weight"), t("attn_pool.kv.bias"))
    k, v = kv.chunk(2, dim=-1)
    shp1 = lambda z, m: z.reshape(b, m, heads, dh).transpose(1, 2)
    a = F.scaled_dot_product_attention(shp1(q, 1), shp1(k, n), shp1(v, n))
    y = a.transpose(1, 2).reshape(b, 1, d)
    y = F.linear(y, t("attn_pool.proj.weight"), t("attn_pool.proj.bias"))
    h = F.layer_norm(y, (d,), t("attn_pool.norm.weight"), t("attn_pool.norm.bias"))
    h = F.linear(h, t("attn_pool.mlp.fc1.weight"), t("attn_pool.mlp.fc1.bias"))
    h = F.gelu(h)
    y = y + F.linear(h, t("attn_pool.mlp.fc2.weight"), t("attn_pool.mlp.fc2.bias"))
    return y[:, 0].detach().numpy()


def test_map_pool_tower_matches_torch_oracle():
    sd = _tiny_siglip_trunk_sd()
    rng = np.random.RandomState(1)
    images = rng.randn(2, RES, RES, 3).astype(np.float32)

    ref = _torch_siglip_forward(sd, images)

    tower = VisionTransformer(
        image_size=RES, patch_size=PATCH, width=D, layers=LAYERS, heads=HEADS,
        output_dim=None, patch_bias=True, use_cls_token=False, no_ln_pre=True,
        pool_type="map", scan_layers=False,
    )
    params = timm_vit_to_vision_params(sd, scan_layers=False)
    out = tower.apply({"params": params}, jnp.asarray(images))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_map_pool_tower_scan_layout_matches():
    sd = _tiny_siglip_trunk_sd()
    rng = np.random.RandomState(1)
    images = rng.randn(2, RES, RES, 3).astype(np.float32)
    tower_u = VisionTransformer(
        image_size=RES, patch_size=PATCH, width=D, layers=LAYERS, heads=HEADS,
        output_dim=None, patch_bias=True, use_cls_token=False, no_ln_pre=True,
        pool_type="map", scan_layers=False,
    )
    tower_s = tower_u.copy(scan_layers=True)
    out_u = tower_u.apply({"params": timm_vit_to_vision_params(sd, scan_layers=False)},
                          jnp.asarray(images))
    out_s = tower_s.apply({"params": timm_vit_to_vision_params(sd, scan_layers=True)},
                          jnp.asarray(images))
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(out_s), atol=1e-5)


def _released_layout_checkpoint(cfg, seed=0):
    """Synthetic full checkpoint with the released webli key layout:
    visual.trunk.* (timm SigLIP ViT) + open_clip text tower + logit buffers."""
    rng = np.random.RandomState(seed)
    r = lambda *s: (rng.randn(*s) * 0.05).astype(np.float32)
    vcfg, tcfg = cfg["vision_cfg"], cfg["text_cfg"]
    import re
    m = re.match(r"vit_(\w+?)_patch(\d+)_siglip_(\d+)", vcfg["timm_model_name"])
    dims = {"tiny": (192, 12, 3), "small": (384, 12, 6), "base": (768, 12, 12)}
    d, layers, _ = dims[m.group(1)]
    patch, res = int(m.group(2)), int(m.group(3))
    n = (res // patch) ** 2
    sd = {
        f"visual.trunk.{k}": v
        for k, v in _tiny_siglip_trunk_sd(seed, d=d, layers=layers, patch=patch, n=n).items()
    }
    w, tl = tcfg["width"], tcfg["layers"]
    sd.update({
        "text.token_embedding.weight": r(tcfg["vocab_size"], w),
        "text.positional_embedding": r(tcfg["context_length"], w),
        "text.ln_final.weight": 1 + r(w), "text.ln_final.bias": r(w),
        "text.text_projection.weight": r(cfg["embed_dim"], w),
        "text.text_projection.bias": r(cfg["embed_dim"]),
        "logit_scale": np.asarray(2.3026, np.float32),
        "logit_bias": np.asarray(-10.0, np.float32),
    })
    for i in range(tl):
        p = f"text.transformer.resblocks.{i}."
        sd.update({
            p + "ln_1.weight": 1 + r(w), p + "ln_1.bias": r(w),
            p + "attn.in_proj_weight": r(3 * w, w), p + "attn.in_proj_bias": r(3 * w),
            p + "attn.out_proj.weight": r(w, w), p + "attn.out_proj.bias": r(w),
            p + "ln_2.weight": 1 + r(w), p + "ln_2.bias": r(w),
            p + "mlp.c_fc.weight": r(4 * w, w), p + "mlp.c_fc.bias": r(4 * w),
            p + "mlp.c_proj.weight": r(w, 4 * w), p + "mlp.c_proj.bias": r(w),
        })
    return sd


@pytest.mark.slow
def test_webli_released_layout_loads_and_runs(tmp_path):
    """End-to-end: a ViT-B-16-SigLIP-shaped (scaled-down: tiny trunk)
    checkpoint in the released webli layout loads through create_model's
    pretrained path and produces working logits with the logit bias."""
    import torch

    from mrclip_tpu.factory import _MODEL_CONFIGS, create_model

    cfg = {
        "embed_dim": 192,
        "init_logit_scale": 2.302585,
        "init_logit_bias": -10.0,
        "vision_cfg": {
            "image_size": 64,
            "timm_model_name": "vit_tiny_patch16_siglip_64",
            "timm_pool": "map",
            "timm_proj": "none",
        },
        "text_cfg": {
            "context_length": 16,
            "vocab_size": 128,
            "width": 96,
            "heads": 2,
            "layers": 2,
            "no_causal_mask": True,
            "proj_bias": True,
            "pool_type": "last",
        },
    }
    _MODEL_CONFIGS["SigLIP-tiny-test"] = cfg
    try:
        sd = _released_layout_checkpoint(cfg)
        path = str(tmp_path / "open_clip_pytorch_model.bin")
        torch.save({k: torch.tensor(v) for k, v in sd.items()}, path)

        model, variables = create_model("SigLIP-tiny-test", pretrained=path)
        assert "attn_pool" in variables["params"]["visual"]
        assert "class_embedding" not in variables["params"]["visual"]
        np.testing.assert_allclose(
            float(variables["params"]["logit_bias"]), -10.0, rtol=1e-5
        )

        rng = np.random.RandomState(0)
        imgs = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
        toks = jnp.asarray(rng.randint(1, 128, (2, 16)), jnp.int32)
        out = model.apply(variables, imgs, toks)
        assert out["image_features"].shape == (2, 192)
        assert out["text_features"].shape == (2, 192)
        assert np.isfinite(np.asarray(out["image_features"])).all()

        # loaded trunk weights actually used: perturbing attn_pool changes output
        import copy
        v2 = jax.tree.map(lambda x: x, variables)
        v2 = {"params": copy.deepcopy(jax.tree.map(np.asarray, variables["params"]))}
        v2["params"]["visual"]["attn_pool"]["latent"] = (
            v2["params"]["visual"]["attn_pool"]["latent"] + 1.0
        )
        out2 = model.apply(v2, imgs, None)
        assert not np.allclose(
            np.asarray(out["image_features"]), np.asarray(out2["image_features"])
        )
    finally:
        _MODEL_CONFIGS.pop("SigLIP-tiny-test", None)


def test_webli_configs_registered():
    """The webli model configs + pretrained tags exist and build."""
    from mrclip_tpu.factory import get_model_config
    from mrclip_tpu.pretrained import get_pretrained_cfg, list_pretrained_tags_by_model

    for name in (
        "ViT-B-16-SigLIP", "ViT-B-16-SigLIP-256", "ViT-B-16-SigLIP-384",
        "ViT-B-16-SigLIP-512", "ViT-L-16-SigLIP-256", "ViT-L-16-SigLIP-384",
        "ViT-SO400M-14-SigLIP", "ViT-SO400M-14-SigLIP-378",
    ):
        cfg = get_model_config(name)
        assert cfg is not None, name
        assert cfg["vision_cfg"]["timm_pool"] == "map"
        assert "webli" in list_pretrained_tags_by_model(name), name
        assert get_pretrained_cfg(name, "webli").get("hf_hub"), name
