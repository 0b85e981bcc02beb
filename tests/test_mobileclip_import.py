"""MobileCLIP released-weight importer (convert.convert_mobile_clip_state_dict).

Reference `src/open_clip/convert.py:152-191` consumes Apple checkpoints via
timm's checkpoint_filter_fn at torch runtime; the rebuild fuses the reparam
branches directly (conv+BN fold, MobileOne branch sum, RepMixer reparam)
into the native deploy-form towers. Zero-egress environment — no released
checkpoint to oracle against — so validation is two-level:

  1. the FUSION MATH is oracle-tested against torch eval-mode conv+BN
     forwards (the part that could silently corrupt numerics);
  2. full synthetic Apple-layout state dicts round-trip through
     `create_model(..., pretrained=<file>)` and forward (structural
     self-consistency, the RN50/CoCa importer test pattern).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrclip_tpu.convert import (
    _fuse_large_kernel,
    _fuse_mobileone,
    _tconv,
    convert_mobile_clip_state_dict,
)


def _bn_dict(prefix, ch, rng):
    return {
        f"{prefix}.weight": rng.rand(ch).astype(np.float32) + 0.5,
        f"{prefix}.bias": rng.randn(ch).astype(np.float32) * 0.1,
        f"{prefix}.running_mean": rng.randn(ch).astype(np.float32) * 0.1,
        f"{prefix}.running_var": rng.rand(ch).astype(np.float32) + 0.5,
    }


def _torch_bn(sd, prefix, x):
    import torch

    return torch.nn.functional.batch_norm(
        x,
        torch.tensor(sd[f"{prefix}.running_mean"]),
        torch.tensor(sd[f"{prefix}.running_var"]),
        torch.tensor(sd[f"{prefix}.weight"]),
        torch.tensor(sd[f"{prefix}.bias"]),
        training=False,
        eps=1e-5,
    )


def test_mobileone_fusion_matches_torch_oracle():
    """Multi-branch MobileOne block (2x conv3x3+BN, 1x1 scale+BN, BN skip)
    == single fused conv, vs torch eval-mode forward."""
    import torch

    rng = np.random.RandomState(0)
    ch = 8
    sd = {}
    for j in range(2):
        sd[f"blk.rbr_conv.{j}.conv.weight"] = rng.randn(ch, ch, 3, 3).astype(np.float32) * 0.1
        sd.update(_bn_dict(f"blk.rbr_conv.{j}.bn", ch, rng))
    sd["blk.rbr_scale.conv.weight"] = rng.randn(ch, ch, 1, 1).astype(np.float32) * 0.1
    sd.update(_bn_dict("blk.rbr_scale.bn", ch, rng))
    sd.update(_bn_dict("blk.rbr_skip", ch, rng))

    x = torch.tensor(rng.randn(2, ch, 6, 6).astype(np.float32))
    want = torch.zeros_like(x)
    for j in range(2):
        y = torch.nn.functional.conv2d(
            x, torch.tensor(sd[f"blk.rbr_conv.{j}.conv.weight"]), padding=1
        )
        want = want + _torch_bn(sd, f"blk.rbr_conv.{j}.bn", y)
    y = torch.nn.functional.conv2d(x, torch.tensor(sd["blk.rbr_scale.conv.weight"]))
    want = want + _torch_bn(sd, "blk.rbr_scale.bn", y)
    want = want + _torch_bn(sd, "blk.rbr_skip", x)

    w, b = _fuse_mobileone(sd, "blk", 3)
    got = torch.nn.functional.conv2d(
        x, torch.tensor(np.asarray(w, np.float32)),
        torch.tensor(np.asarray(b, np.float32)), padding=1,
    )
    np.testing.assert_allclose(got.numpy(), want.numpy(), rtol=1e-4, atol=1e-5)


def test_large_kernel_fusion_matches_torch_oracle():
    """ReparamLargeKernelConv: dw7x7+BN + centered dw3x3+BN == one dw7x7."""
    import torch

    rng = np.random.RandomState(1)
    ch = 6
    sd = {
        "lk.lkb_origin.conv.weight": rng.randn(ch, 1, 7, 7).astype(np.float32) * 0.1,
        "lk.small_conv.conv.weight": rng.randn(ch, 1, 3, 3).astype(np.float32) * 0.1,
    }
    sd.update(_bn_dict("lk.lkb_origin.bn", ch, rng))
    sd.update(_bn_dict("lk.small_conv.bn", ch, rng))

    x = torch.tensor(rng.randn(2, ch, 10, 10).astype(np.float32))
    big = _torch_bn(sd, "lk.lkb_origin.bn", torch.nn.functional.conv2d(
        x, torch.tensor(sd["lk.lkb_origin.conv.weight"]), padding=3, stride=2, groups=ch))
    small = _torch_bn(sd, "lk.small_conv.bn", torch.nn.functional.conv2d(
        x, torch.tensor(sd["lk.small_conv.conv.weight"]), padding=1, stride=2, groups=ch))
    want = big + small

    w, b = _fuse_large_kernel(sd, "lk")
    got = torch.nn.functional.conv2d(
        x, torch.tensor(np.asarray(w, np.float32)),
        torch.tensor(np.asarray(b, np.float32)), padding=3, stride=2, groups=ch,
    )
    np.testing.assert_allclose(got.numpy(), want.numpy(), rtol=1e-4, atol=1e-5)


def test_conv_bn_affine_equivalence():
    """BN-after-conv == conv + ChannelAffine(_bn_stats) — the norm='affine'
    deploy-import mode's core identity (stem/ffn norm positions)."""
    import torch

    from mrclip_tpu.convert import _bn_stats

    rng = np.random.RandomState(2)
    ch = 5
    sd = _bn_dict("bn", ch, rng)
    x = torch.tensor(rng.randn(2, ch, 4, 4).astype(np.float32))
    want = _torch_bn(sd, "bn", x).numpy()
    scale, bias = _bn_stats(sd, "bn")
    got = x.numpy() * scale[None, :, None, None] + bias[None, :, None, None]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# --- synthetic full state dicts ------------------------------------------


def _mobileone_keys(sd, p, out_ch, in_ch, k, groups, rng, skip=False):
    sd[f"{p}.rbr_conv.0.conv.weight"] = (
        rng.randn(out_ch, in_ch // groups, k, k).astype(np.float32) * 0.05
    )
    sd.update(_bn_dict(f"{p}.rbr_conv.0.bn", out_ch, rng))
    if k > 1:
        sd[f"{p}.rbr_scale.conv.weight"] = (
            rng.randn(out_ch, in_ch // groups, 1, 1).astype(np.float32) * 0.05
        )
        sd.update(_bn_dict(f"{p}.rbr_scale.bn", out_ch, rng))
    if skip and out_ch == in_ch:
        sd.update(_bn_dict(f"{p}.rbr_skip", out_ch, rng))


def _corenet_text_keys(sd, width=512, layers=12, ctx=77, vocab=49408, rng=None):
    sd["text_encoder.embedding_layer.weight"] = rng.randn(vocab, width).astype(np.float32) * 0.02
    sd["text_encoder.positional_embedding.pos_embed.pos_embed"] = (
        rng.randn(1, ctx, width).astype(np.float32) * 0.01
    )
    for i in range(layers):
        p = f"text_encoder.transformer.{i}"
        for ln in ("pre_norm_mha.0", "pre_norm_ffn.0"):
            sd[f"{p}.{ln}.weight"] = np.ones(width, np.float32)
            sd[f"{p}.{ln}.bias"] = np.zeros(width, np.float32)
        sd[f"{p}.pre_norm_mha.1.qkv_proj.weight"] = rng.randn(3 * width, width).astype(np.float32) * 0.02
        sd[f"{p}.pre_norm_mha.1.qkv_proj.bias"] = np.zeros(3 * width, np.float32)
        sd[f"{p}.pre_norm_mha.1.out_proj.weight"] = rng.randn(width, width).astype(np.float32) * 0.02
        sd[f"{p}.pre_norm_mha.1.out_proj.bias"] = np.zeros(width, np.float32)
        sd[f"{p}.pre_norm_ffn.1.weight"] = rng.randn(4 * width, width).astype(np.float32) * 0.02
        sd[f"{p}.pre_norm_ffn.1.bias"] = np.zeros(4 * width, np.float32)
        sd[f"{p}.pre_norm_ffn.4.weight"] = rng.randn(width, 4 * width).astype(np.float32) * 0.02
        sd[f"{p}.pre_norm_ffn.4.bias"] = np.zeros(width, np.float32)
    sd["text_encoder.final_layer_norm.weight"] = np.ones(width, np.float32)
    sd["text_encoder.final_layer_norm.bias"] = np.zeros(width, np.float32)
    sd["text_encoder.projection_layer.weight"] = rng.randn(width, width).astype(np.float32) * 0.02
    sd["logit_scale"] = np.asarray(np.log(1 / 0.07), np.float32)


def _synthetic_s1_state_dict():
    """Apple-layout MobileCLIP-S1 (fastvit_mci1 trunk + corenet text)."""
    rng = np.random.RandomState(0)
    sd = {}
    pre = "image_encoder.model."
    dims = (64, 128, 256, 512)
    depths = (4, 12, 20, 4)
    # stem: conv3x3/s2, dw3x3/s2, pw1x1
    _mobileone_keys(sd, f"{pre}patch_embed.0", dims[0], 3, 3, 1, rng)
    _mobileone_keys(sd, f"{pre}patch_embed.1", dims[0], dims[0], 3, dims[0], rng)
    _mobileone_keys(sd, f"{pre}patch_embed.2", dims[0], dims[0], 1, 1, rng)

    net = 0
    for s in range(4):
        if s > 0:
            # downsample: ReparamLargeKernelConv (dw7x7) + MobileOne pw
            p = f"{pre}network.{net}.proj"
            sd[f"{p}.0.lkb_origin.conv.weight"] = (
                rng.randn(dims[s - 1], 1, 7, 7).astype(np.float32) * 0.05
            )
            sd.update(_bn_dict(f"{p}.0.lkb_origin.bn", dims[s - 1], rng))
            sd[f"{p}.0.small_conv.conv.weight"] = (
                rng.randn(dims[s - 1], 1, 3, 3).astype(np.float32) * 0.05
            )
            sd.update(_bn_dict(f"{p}.0.small_conv.bn", dims[s - 1], rng))
            _mobileone_keys(sd, f"{p}.1", dims[s], dims[s - 1], 1, 1, rng)
            net += 1
        if s == 3:
            # RepCPE before the attention stage
            sd[f"{pre}network.{net}.pe.weight"] = (
                rng.randn(dims[3], 1, 7, 7).astype(np.float32) * 0.05
            )
            sd[f"{pre}network.{net}.pe.bias"] = np.zeros(dims[3], np.float32)
            net += 1
        for i in range(depths[s]):
            p = f"{pre}network.{net}.{i}"
            if s < 3:
                _mobileone_keys(sd, f"{p}.token_mixer.mixer", dims[s], dims[s], 3, dims[s], rng)
                sd.update(_bn_dict(f"{p}.token_mixer.norm.rbr_skip", dims[s], rng))
                sd[f"{p}.token_mixer.layer_scale.gamma"] = (
                    np.full(dims[s], 1e-4, np.float32)
                )
            else:
                sd[f"{p}.norm.weight"] = np.ones(dims[3], np.float32)
                sd[f"{p}.norm.bias"] = np.zeros(dims[3], np.float32)
                sd[f"{p}.norm.running_mean"] = np.zeros(dims[3], np.float32)
                sd[f"{p}.norm.running_var"] = np.ones(dims[3], np.float32)
                sd[f"{p}.token_mixer.qkv.weight"] = (
                    rng.randn(3 * dims[3], dims[3], 1, 1).astype(np.float32) * 0.02
                )
                sd[f"{p}.token_mixer.qkv.bias"] = np.zeros(3 * dims[3], np.float32)
                sd[f"{p}.token_mixer.proj.weight"] = (
                    rng.randn(dims[3], dims[3], 1, 1).astype(np.float32) * 0.02
                )
                sd[f"{p}.token_mixer.proj.bias"] = np.zeros(dims[3], np.float32)
                sd[f"{p}.layer_scale_1.gamma"] = np.full(dims[3], 1e-4, np.float32)
                sd[f"{p}.layer_scale_2.gamma"] = np.full(dims[3], 1e-4, np.float32)
            ffn = f"{p}.convffn"
            hid = dims[s] * 3
            sd[f"{ffn}.conv.conv.weight"] = (
                rng.randn(dims[s], 1, 7, 7).astype(np.float32) * 0.05
            )
            sd.update(_bn_dict(f"{ffn}.conv.bn", dims[s], rng))
            sd[f"{ffn}.fc1.weight"] = rng.randn(hid, dims[s], 1, 1).astype(np.float32) * 0.02
            sd[f"{ffn}.fc1.bias"] = np.zeros(hid, np.float32)
            sd[f"{ffn}.fc2.weight"] = rng.randn(dims[s], hid, 1, 1).astype(np.float32) * 0.02
            sd[f"{ffn}.fc2.bias"] = np.zeros(dims[s], np.float32)
            if s < 3:
                sd[f"{ffn}.layer_scale.gamma"] = np.full(dims[s], 1e-4, np.float32)
        net += 1

    _mobileone_keys(sd, f"{pre}conv_exp", dims[3] * 2, dims[3], 3, dims[3], rng)
    sd[f"{pre}head.fc.weight"] = rng.randn(512, dims[3] * 2).astype(np.float32) * 0.02
    sd[f"{pre}head.fc.bias"] = np.zeros(512, np.float32)
    _corenet_text_keys(sd, rng=rng)
    return sd


def _synthetic_b_state_dict():
    """Apple-layout MobileCLIP-B (corenet conv-stem hybrid ViT)."""
    rng = np.random.RandomState(0)
    sd = {}
    pre = "image_encoder.model."
    stem = (96, 192, 384, 768)
    prev = 3
    for i, ch in enumerate(stem):
        sd[f"{pre}patch_emb.{i}.block.conv.weight"] = (
            rng.randn(ch, prev, 3, 3).astype(np.float32) * 0.05
        )
        sd.update(_bn_dict(f"{pre}patch_emb.{i}.block.norm", ch, rng))
        prev = ch
    sd[f"{pre}cls_token"] = rng.randn(1, 1, 768).astype(np.float32) * 0.02
    sd[f"{pre}pos_embed.pos_embed.pos_embed"] = (
        rng.randn(1, 197, 768).astype(np.float32) * 0.01
    )
    for i in range(12):
        p = f"{pre}transformer.{i}"
        for ln in ("pre_norm_mha.0", "pre_norm_ffn.0"):
            sd[f"{p}.{ln}.weight"] = np.ones(768, np.float32)
            sd[f"{p}.{ln}.bias"] = np.zeros(768, np.float32)
        sd[f"{p}.pre_norm_mha.1.qkv_proj.weight"] = rng.randn(2304, 768).astype(np.float32) * 0.02
        sd[f"{p}.pre_norm_mha.1.qkv_proj.bias"] = np.zeros(2304, np.float32)
        sd[f"{p}.pre_norm_mha.1.out_proj.weight"] = rng.randn(768, 768).astype(np.float32) * 0.02
        sd[f"{p}.pre_norm_mha.1.out_proj.bias"] = np.zeros(768, np.float32)
        sd[f"{p}.pre_norm_ffn.1.weight"] = rng.randn(3072, 768).astype(np.float32) * 0.02
        sd[f"{p}.pre_norm_ffn.1.bias"] = np.zeros(3072, np.float32)
        sd[f"{p}.pre_norm_ffn.4.weight"] = rng.randn(768, 3072).astype(np.float32) * 0.02
        sd[f"{p}.pre_norm_ffn.4.bias"] = np.zeros(768, np.float32)
    sd[f"{pre}post_transformer_norm.weight"] = np.ones(768, np.float32)
    sd[f"{pre}post_transformer_norm.bias"] = np.zeros(768, np.float32)
    sd[f"{pre}classifier.proj.weight"] = rng.randn(512, 768).astype(np.float32) * 0.02
    sd[f"{pre}classifier.proj.bias"] = np.zeros(512, np.float32)
    _corenet_text_keys(sd, rng=rng)
    return sd


def _deploy_tree(model_name):
    from mrclip_tpu.factory import create_model, get_model_config

    cfg = get_model_config(model_name)
    cfg["vision_cfg"]["timm_deploy_import"] = True
    model, _ = create_model(model_name, init_params=False, vision_cfg=cfg["vision_cfg"])
    img = cfg["vision_cfg"]["image_size"]
    ctx = cfg["text_cfg"]["context_length"]
    tree = jax.eval_shape(
        model.init, jax.random.key(0),
        jnp.zeros((1, img, img, 3), jnp.float32),
        jnp.zeros((1, ctx), jnp.int32),
    )
    return model, tree["params"]


@pytest.mark.parametrize("name,builder", [
    ("MobileCLIP-S1", _synthetic_s1_state_dict),
    ("MobileCLIP-B", _synthetic_b_state_dict),
])
def test_converted_tree_matches_model(name, builder):
    """Converter output == deploy-mode model param tree (paths + shapes)."""
    sd = builder()
    params = convert_mobile_clip_state_dict(sd, context_length=77)
    _, tpl = _deploy_tree(name)

    def paths(tree):
        return {
            jax.tree_util.keystr(p): tuple(np.shape(v))
            for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    got, want = paths(params), paths(tpl)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing and not extra, f"missing={missing[:6]} extra={extra[:6]}"
    mismatched = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not mismatched, dict(list(mismatched.items())[:6])


@pytest.mark.slow
def test_create_model_pretrained_mobileclip_forwards(tmp_path):
    """End-to-end: torch.save a synthetic Apple checkpoint, then
    create_model(..., pretrained=<file>) loads it (deploy mode switches on
    automatically) and forwards finite features."""
    import torch

    sd = _synthetic_s1_state_dict()
    path = str(tmp_path / "mobileclip_s1.pt")
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, path)

    from mrclip_tpu.factory import create_model

    model, variables = create_model("MobileCLIP-S1", pretrained=path)
    rng = np.random.RandomState(0)
    out = model.apply(
        variables,
        jnp.asarray(rng.rand(2, 256, 256, 3), jnp.float32),
        jnp.asarray(rng.randint(1, 49408, (2, 77)), jnp.int32),
    )
    assert np.all(np.isfinite(out["image_features"]))
    assert np.all(np.isfinite(out["text_features"]))
