"""Round-3 registry additions: CLIPA act/norm kwargs, EVA01-giant import
quirk, convnext_large_d MLP head, nllb-siglip pairing.

References: act/norm kwargs `src/open_clip/model.py:144-147,195-198`; CLIPA
tags `pretrained.py:509-527`; EVA01 tags `pretrained.py:446-453`; MLP head
`timm_model.py:106-107`.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrclip_tpu.factory import create_model, get_model_config
from mrclip_tpu.models.clip import _resolve_act_norm
from mrclip_tpu.models.layers import gelu_exact, gelu_tanh, quick_gelu


def test_resolve_act_norm():
    act, eps = _resolve_act_norm(False, None, None, "vision")
    assert act is gelu_exact and eps == 1e-5
    act, eps = _resolve_act_norm(
        False, {"approximate": "tanh"}, {"eps": 1e-6}, "vision"
    )
    assert act is gelu_tanh and eps == 1e-6
    # quick-gelu force flag overrides config act_kwargs (reference
    # factory.py force_quick_gelu path)
    act, _ = _resolve_act_norm(True, {"approximate": "tanh"}, None, "vision")
    assert act is quick_gelu
    with pytest.raises(NotImplementedError):
        _resolve_act_norm(False, {"approximate": "sigmoid"}, None, "t")
    with pytest.raises(NotImplementedError):
        _resolve_act_norm(False, None, {"elementwise_affine": False}, "t")


@pytest.mark.slow
def test_clipa_config_changes_numerics():
    """A CLIPA-style mini config (tanh GELU + eps 1e-6) must produce
    different numerics from the same config without the kwargs — proving
    the fields are plumbed, not silently dropped."""
    from mrclip_tpu.factory import _MODEL_CONFIGS

    base = {
        "embed_dim": 16,
        "vision_cfg": {"image_size": 32, "layers": 2, "width": 32,
                       "head_width": 16, "patch_size": 16, "no_ln_pre": True,
                       "pool_type": "avg", "final_ln_after_pool": True},
        "text_cfg": {"context_length": 12, "vocab_size": 64, "width": 32,
                     "heads": 2, "layers": 2, "pool_type": "last",
                     "no_causal_mask": True},
    }
    import copy

    clipa = copy.deepcopy(base)
    for tower in ("vision_cfg", "text_cfg"):
        clipa[tower]["act_kwargs"] = {"approximate": "tanh"}
        clipa[tower]["norm_kwargs"] = {"eps": 1e-6}
    _MODEL_CONFIGS["clipa-mini"] = clipa
    _MODEL_CONFIGS["clipa-mini-plain"] = base

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
    toks = jnp.asarray(rng.randint(1, 63, (2, 12)), jnp.int32)

    model_a, var_a = create_model("clipa-mini", rng_seed=0)
    model_b, _ = create_model("clipa-mini-plain", rng_seed=0)
    out_a = model_a.apply(var_a, imgs, toks)
    out_b = model_b.apply(var_a, imgs, toks)  # same params, different cfg
    diff = float(jnp.abs(out_a["image_features"] - out_b["image_features"]).max())
    assert diff > 0.0, "act/norm kwargs were silently ignored"


def test_eva_qv_bias_conversion():
    """EVA/BEiT split q/v bias (k bias zero) -> fused in_proj bias."""
    from mrclip_tpu.convert import timm_vit_to_vision_params

    rng = np.random.RandomState(1)
    r = lambda *s: rng.randn(*s).astype(np.float32) * 0.1
    W, P = 16, 8
    sd = {
        "patch_embed.proj.weight": r(W, 3, P, P),
        "patch_embed.proj.bias": r(W),
        "cls_token": r(1, 1, W),
        "pos_embed": r(1, 5, W),
        "norm.weight": 1 + r(W),
        "norm.bias": r(W),
    }
    for i in range(2):
        p = f"blocks.{i}."
        sd.update({
            p + "norm1.weight": 1 + r(W), p + "norm1.bias": r(W),
            p + "norm2.weight": 1 + r(W), p + "norm2.bias": r(W),
            p + "attn.qkv.weight": r(3 * W, W),
            p + "attn.q_bias": r(W), p + "attn.v_bias": r(W),
            p + "attn.proj.weight": r(W, W), p + "attn.proj.bias": r(W),
            p + "mlp.fc1.weight": r(4 * W, W), p + "mlp.fc1.bias": r(4 * W),
            p + "mlp.fc2.weight": r(W, 4 * W), p + "mlp.fc2.bias": r(W),
        })
    vis = timm_vit_to_vision_params(sd, scan_layers=False)
    got = np.asarray(vis["transformer"]["blocks_0"]["attn"]["in_proj"]["bias"])
    want = np.concatenate([
        sd["blocks.0.attn.q_bias"], np.zeros(W, np.float32), sd["blocks.0.attn.v_bias"]
    ])
    np.testing.assert_array_equal(got, want)


def test_unportable_towers_rejected():
    """EVA02 (r3) and ViTamin (r4) are natively supported; variants outside
    the known stage tables still reject loudly."""
    from mrclip_tpu.models.clip import CLIPVisionCfg, build_vision_tower

    for tname, match in (("eva02_large_patch14_448", "EVA02"),
                         ("vitamin_large_256", "vitamin variant")):
        with pytest.raises(NotImplementedError, match=match):
            build_vision_tower(768, CLIPVisionCfg(timm_model_name=tname))
    # the clip variant now builds
    tower = build_vision_tower(768, CLIPVisionCfg(
        timm_model_name="eva02_large_patch14_clip_224", timm_pool="token"))
    assert tower.use_rope and tower.mlp_type == "swiglu"
    # ViTamin trunks build natively as of r4 (models/vitamin.py)
    tower = build_vision_tower(768, CLIPVisionCfg(
        timm_model_name="vitamin_large", timm_pool="avg"))
    assert tower.dims == (160, 320, 1024)


def test_convnext_mlp_head_import_and_forward():
    """convnext_large_d-style checkpoint (trunk + head.mlp) imports and the
    MLP head matches torch fc1->GELU->fc2(no bias) semantics."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from mrclip_tpu.convert import convert_state_dict
    from mrclip_tpu.models.convnext import ConvNeXt
    from tests.test_convnext import DEPTHS, DIMS, RES, _tiny_convnext_sd, _torch_convnext_forward

    embed = 6
    sd_trunk = _tiny_convnext_sd(seed=7)
    rng = np.random.RandomState(8)
    sd = {f"visual.trunk.{k}": v for k, v in sd_trunk.items()}
    sd["visual.head.mlp.fc1.weight"] = rng.randn(2 * embed, DIMS[-1]).astype(np.float32) * 0.1
    sd["visual.head.mlp.fc1.bias"] = rng.randn(2 * embed).astype(np.float32) * 0.1
    sd["visual.head.mlp.fc2.weight"] = rng.randn(embed, 2 * embed).astype(np.float32) * 0.1
    sd["logit_scale"] = np.asarray(2.659, np.float32)

    params = convert_state_dict(sd, scan_layers=False)
    assert "mlp_fc1" in params["visual"] and "mlp_fc2" in params["visual"]

    images = np.random.RandomState(9).rand(2, RES, RES, 3).astype(np.float32)
    with torch.no_grad():
        feats = _torch_convnext_forward(sd_trunk, images)
        h = F.linear(torch.tensor(feats), torch.tensor(sd["visual.head.mlp.fc1.weight"]),
                     torch.tensor(sd["visual.head.mlp.fc1.bias"]))
        want = F.linear(F.gelu(h), torch.tensor(sd["visual.head.mlp.fc2.weight"])).numpy()

    tower = ConvNeXt(depths=DEPTHS, dims=DIMS, output_dim=embed, proj_type="mlp")
    got = tower.apply({"params": params["visual"]}, jnp.asarray(images))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_new_tags_registered():
    from mrclip_tpu.pretrained import get_pretrained_cfg

    for model, tag in (
        ("ViT-L-14-CLIPA", "datacomp1b"),
        ("ViT-H-14-CLIPA-336", "laion2b"),
        ("EVA01-g-14", "laion400m_s11b_b41k"),
        ("convnext_large_d", "laion2b_s26b_b102k_augreg"),
        ("nllb-clip-base-siglip", "v1"),
        ("nllb-clip-large-siglip", "mrl"),
    ):
        cfg = get_pretrained_cfg(model, tag)
        assert cfg and (cfg.get("hf_hub") or cfg.get("url")), (model, tag)
        assert get_model_config(model) is not None, model
    # CLIPA preprocessing: IMAGENET mean, bilinear squash (reference _apcfg)
    cfg = get_pretrained_cfg("ViT-L-14-CLIPA", "datacomp1b")
    assert cfg["resize_mode"] == "squash" and cfg["interpolation"] == "bilinear"


def test_convnext_drop_path():
    """Stochastic depth: inert in eval (and under remat), active in train."""
    from mrclip_tpu.convert import timm_convnext_to_vision_params
    from mrclip_tpu.models.convnext import ConvNeXt
    from tests.test_convnext import DEPTHS, DIMS, RES, _tiny_convnext_sd

    params = timm_convnext_to_vision_params(_tiny_convnext_sd(seed=11))
    images = jnp.asarray(np.random.RandomState(12).rand(2, RES, RES, 3), jnp.float32)

    plain = ConvNeXt(depths=DEPTHS, dims=DIMS, output_dim=None)
    dp = ConvNeXt(depths=DEPTHS, dims=DIMS, output_dim=None, drop_path=0.9)
    dp_remat = ConvNeXt(depths=DEPTHS, dims=DIMS, output_dim=None, drop_path=0.9, remat=True)

    a = plain.apply({"params": params}, images)
    b = dp.apply({"params": params}, images)  # eval: no-op
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    c = dp_remat.apply({"params": params}, images)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6)

    t = dp.apply(
        {"params": params}, images, deterministic=False,
        rngs={"dropout": jax.random.key(0)},
    )
    assert float(jnp.abs(t - a).max()) > 0.0, "drop_path inert in train mode"


@pytest.mark.slow
def test_vit_drop_path_unrolled_and_scan_guard():
    from mrclip_tpu.models.vision import VisionTransformer

    kw = dict(image_size=32, patch_size=16, width=32, layers=3, heads=2,
              output_dim=None, drop_path=0.9)
    tower = VisionTransformer(scan_layers=False, **kw)
    rng = np.random.RandomState(13)
    images = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
    variables = tower.init(jax.random.key(0), images)
    a = tower.apply(variables, images)
    t = tower.apply(variables, images, deterministic=False,
                    rngs={"dropout": jax.random.key(1)})
    assert float(jnp.abs(t - a).max()) > 0.0

    scanned = VisionTransformer(scan_layers=True, **kw)
    vs = scanned.init(jax.random.key(0), images)
    scanned.apply(vs, images)  # eval fine
    with pytest.raises(NotImplementedError, match="drop_path"):
        scanned.apply(vs, images, deterministic=False,
                      rngs={"dropout": jax.random.key(1)})


@pytest.mark.slow
def test_convnext_large_d_trains_with_drop_path():
    """The registered config (timm_drop_path=0.1) takes a real train step."""
    from mrclip_tpu.factory import _MODEL_CONFIGS, create_loss, create_model
    from mrclip_tpu.parallel import (
        build_train_step, create_optimizer, create_train_state, make_loss_apply,
    )
    import copy

    cfg = copy.deepcopy(get_model_config("convnext_large_d"))
    cfg["vision_cfg"].update({"timm_model_name": "convnext_tiny", "image_size": 32})
    cfg["text_cfg"].update({"width": 32, "heads": 2, "layers": 2,
                            "vocab_size": 64, "context_length": 8})
    cfg["embed_dim"] = 16
    _MODEL_CONFIGS["convnext-d-mini"] = cfg
    model, variables = create_model("convnext-d-mini")

    class Args:
        multipositiveloss = True
        delta = 0.5
        distance = visiononly = siglip = distill = False
        lam = None
        gather_with_grad = True

    step = build_train_step(
        model, make_loss_apply(create_loss(Args())), create_optimizer(lr=1e-3),
        donate=False,
    )
    state = create_train_state(variables, create_optimizer(lr=1e-3))
    rng = np.random.RandomState(14)
    batch = {
        "images": jnp.asarray(rng.rand(4, 32, 32, 3), jnp.float32),
        "tokens": jnp.asarray(rng.randint(1, 63, (4, 8)), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 2, (4,)), jnp.int32),
    }
    state, metrics = step(state, batch, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_remat_with_train_mode_dropout_and_drop_path():
    """nn.remat blocks must accept train mode: deterministic is pinned
    static (static_argnums) so drop_path/textdropout work under remat
    (was a TracerBoolConversionError)."""
    from mrclip_tpu.models.text import TextTransformer
    from mrclip_tpu.models.vision import VisionTransformer

    imgs = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    vit = VisionTransformer(image_size=32, patch_size=16, width=32, layers=2,
                            heads=2, output_dim=None, drop_path=0.5,
                            scan_layers=False, remat=True)
    v = vit.init(jax.random.key(0), imgs)
    train = vit.apply(v, imgs, deterministic=False,
                      rngs={"dropout": jax.random.key(1)})
    assert float(jnp.abs(train - vit.apply(v, imgs)).max()) > 0.0

    toks = jnp.asarray(np.random.RandomState(1).randint(1, 63, (2, 8)), jnp.int32)
    txt = TextTransformer(context_length=8, vocab_size=64, width=32, heads=2,
                          layers=2, output_dim=16, dropout=0.3,
                          scan_layers=False, remat=True)
    vt = txt.init(jax.random.key(0), toks)
    txt.apply(vt, toks, deterministic=False, rngs={"dropout": jax.random.key(1)})


@pytest.mark.parametrize("opt", [
    "sgd",  # default rep; lion/adafactor (~25s compiles) under --runslow
    pytest.param("lion", marks=pytest.mark.slow),
    pytest.param("adafactor", marks=pytest.mark.slow),
])
def test_optimizer_variants_step(opt):
    """Non-adamw optimizers (reference --opt delegates to timm; optax
    covers the space natively) take a finite train step and move params."""
    from mrclip_tpu.factory import create_loss
    from mrclip_tpu.parallel import (
        build_train_step, create_optimizer, create_train_state, make_loss_apply,
    )

    class Args:
        multipositiveloss = True
        delta = 0.5
        distance = visiononly = siglip = distill = False
        lam = None
        gather_with_grad = True

    model, variables = create_model("ViT-B-32-mini", rng_seed=0)
    tx = create_optimizer(lr=1e-3, opt=opt)
    state = create_train_state(variables, tx)
    step = build_train_step(model, make_loss_apply(create_loss(Args())), tx, donate=False)
    rng = np.random.RandomState(15)
    batch = {
        "images": jnp.asarray(rng.rand(4, 64, 64, 3), jnp.float32),
        "tokens": jnp.asarray(rng.randint(1, 49407, (4, 32)), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 2, (4,)), jnp.int32),
    }
    before = np.asarray(variables["params"]["logit_scale"])
    new_state, metrics = step(state, batch, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    moved = jax.tree.map(
        lambda a, b: float(jnp.abs(jnp.asarray(a) - jnp.asarray(b)).max()),
        state.params, new_state.params,
    )
    assert max(jax.tree.leaves(moved)) > 0.0
