"""Regression tests for the round-3 self-review fixes.

Covers: SigLIP act/eps parity (timm siglip defs: gelu_tanh + LN eps 1e-6;
upstream open_clip SigLIP text_cfg kwargs), the factory scan/unroll depth
resolution for timm-named towers, CoCa --gelu-approx threading, structurally
zero EVA k-bias (timm eva.py k_bias buffer), frozen-logit-scale serving
export, the hub-export SigLIP guard, save_for_hf layout derivation, and the
laion400m_e32 hf_hub tag typo.
"""

import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrclip_tpu.factory import create_model, get_model_config
from mrclip_tpu.models.clip import build_vision_tower, timm_vision_depth
from mrclip_tpu.models.layers import gelu_exact, gelu_tanh

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "mrclip_tpu", "model_configs")


def test_siglip_text_cfgs_carry_tanh_and_eps():
    # Upstream open_clip SigLIP configs (big_vision-trained towers) set
    # act_kwargs approximate=tanh and norm_kwargs eps=1e-6 on the text cfg.
    for path in glob.glob(os.path.join(CFG_DIR, "ViT-*SigLIP*.json")):
        cfg = json.load(open(path))["text_cfg"]
        if "hf_model_name" in cfg:
            continue
        assert cfg["act_kwargs"] == {"approximate": "tanh"}, path
        assert cfg["norm_kwargs"] == {"eps": 1e-6}, path


def test_siglip_vision_tower_uses_tanh_gelu_and_eps_1e6():
    cfg = get_model_config("ViT-B-16-SigLIP")
    tower = build_vision_tower(cfg["embed_dim"], cfg["vision_cfg"])
    assert tower.act is gelu_tanh
    assert tower.ln_eps == 1e-6


def test_timm_clip_variant_keeps_torch_eps():
    # timm _clip variants pin norm_layer=nn.LayerNorm (eps 1e-5, what the
    # CLIP weights were trained with); plain/siglip timm ViTs use 1e-6.
    tower = build_vision_tower(
        512, {"timm_model_name": "vit_base_patch16_clip_224", "image_size": 224}
    )
    assert tower.ln_eps == 1e-5


def test_timm_vision_depth():
    assert timm_vision_depth("eva_giant_patch14_clip_224") == 40
    assert timm_vision_depth("eva02_enormous_patch14_clip_224") == 64
    assert timm_vision_depth("eva02_large_patch14_clip_336") == 24
    assert timm_vision_depth("vit_so400m_patch14_siglip_224") == 27
    assert timm_vision_depth("vit_huge_patch14_clip_224") == 32
    assert timm_vision_depth("convnext_base_w") == 0
    assert timm_vision_depth(None) == 0


def test_deep_timm_towers_stay_scanned():
    # EVA01-g (40L) / EVA02-E (64L) carry no vision_cfg["layers"]; the
    # factory must resolve their depth from the timm name, not default-12.
    model, _ = create_model("EVA01-g-14", init_params=False)
    assert model.scan_layers is True
    model, _ = create_model("EVA02-B-16", init_params=False)
    assert model.scan_layers is False  # 12 layers: unrolled like ViT-B


def test_coca_gelu_approx_threads():
    model, _ = create_model("coca_ViT-B-32", init_params=False, gelu_approx=True)
    assert model.act_impl == "tanh"
    model, _ = create_model("coca_ViT-B-32", init_params=False)
    assert model.act_impl == "erf"


def test_eva_k_bias_is_structurally_zero():
    from mrclip_tpu.models.vision import VisionTransformer

    tower = VisionTransformer(
        image_size=32, patch_size=16, width=32, layers=1, heads=2,
        output_dim=None, patch_bias=True, no_ln_pre=True, pool_type="tok",
        attn_zero_k_bias=True, scan_layers=False,
    )
    imgs = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    variables = tower.init(jax.random.key(0), imgs)
    params = variables["params"]
    bias = params["transformer"]["blocks_0"]["attn"]["in_proj"]["bias"]
    d = bias.shape[0] // 3

    # A nonzero k segment must not change the forward (masked out)...
    poisoned = jax.tree_util.tree_map(lambda x: x, params)
    b2 = np.asarray(bias).copy()
    b2[d : 2 * d] = 7.0
    poisoned["transformer"]["blocks_0"]["attn"]["in_proj"]["bias"] = jnp.asarray(b2)
    out_ref = tower.apply({"params": params}, imgs)
    out_poisoned = tower.apply({"params": poisoned}, imgs)
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_poisoned))

    # ...and receives zero gradient, so it never drifts during fine-tuning.
    def loss_fn(p):
        return jnp.sum(tower.apply({"params": p}, imgs) ** 2)

    g = jax.grad(loss_fn)(params)
    gb = np.asarray(g["transformer"]["blocks_0"]["attn"]["in_proj"]["bias"])
    assert np.all(gb[d : 2 * d] == 0.0)
    assert np.any(gb[:d] != 0.0) and np.any(gb[2 * d :] != 0.0)


def test_export_model_frozen_scale_and_bias():
    from mrclip_tpu.serving import export_model

    model, variables = create_model(
        "ViT-B-32-mini", init_params=True, logit_scale_trainable=False
    )
    assert "logit_scale" in variables["constants"]
    exported = export_model(model, variables, batch_size=2)
    # Frozen scale is ln(10) (reference model.py:254-258) -> exp = 10.
    assert exported.meta["logit_scale"] == pytest.approx(10.0)
    assert exported.meta["logit_bias"] == 0.0


@pytest.mark.slow
def test_hub_export_siglip_raises_cleanly():
    from mrclip_tpu.hub import export_torch_state_dict

    model, variables = create_model("ViT-B-16-SigLIP", init_params=True)
    with pytest.raises(NotImplementedError, match="SigLIP"):
        export_torch_state_dict(variables["params"])


def test_save_for_hf_layout_derivation():
    from mrclip_tpu.hub import _vision_layout_from_config

    assert (
        _vision_layout_from_config(get_model_config("EVA01-g-14"))
        == "timm_eva02_postnorm"
    )
    assert (
        _vision_layout_from_config(get_model_config("EVA02-L-14"))
        == "timm_eva02"
    )
    assert _vision_layout_from_config(get_model_config("ViT-B-16")) == "auto"


def test_laion400m_e32_hub_tags_match_epoch():
    from mrclip_tpu.pretrained import get_pretrained_cfg

    for model in ("ViT-B-32", "ViT-B-16", "ViT-B-16-plus-240", "ViT-L-14"):
        cfg = get_pretrained_cfg(model, "laion400m_e32")
        if not cfg:
            continue
        hub = cfg.get("hf_hub", "")
        if hub:
            assert "e32" in hub, (model, hub)


def test_native_loader_honors_preprocess_cfg(tmp_path):
    """get_data's native path must carry the model family's PreprocessCfg
    (SigLIP squash/0.5-mean, CLIPA bilinear) into the loader instead of the
    cover/bicubic defaults."""
    import numpy as np
    from PIL import Image

    from mrclip_tpu.data import get_data
    from mrclip_tpu.transforms import EvalTransform, PreprocessCfg

    csv = tmp_path / "val.csv"
    rows = ["filepath,title,label"]
    for i in range(4):
        arr = (np.random.RandomState(i).rand(48, 40, 3) * 255).astype(np.uint8)
        p = tmp_path / f"img{i}.png"
        Image.fromarray(arr, "RGB").save(p)
        rows.append(f"{p},cap{i},{i % 2}")
    csv.write_text("\n".join(rows) + "\n")

    pp = PreprocessCfg(
        size=32, resize_mode="squash", interpolation="bilinear",
        mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
    )
    transform = EvalTransform(pp)

    class Args:
        val_data = str(csv)
        train_data = None
        dataset_type = "csv"
        batch_size = 2
        native_loader = True
        workers = 0
        image_size = 32

    data = get_data(Args(), (transform, transform), tokenizer=None)
    loader = data["val"].dataloader
    assert loader.eval_resize_mode == "squash"
    assert loader.eval_interpolation == "bilinear"
    assert loader.preprocess_cfg is pp

    from mrclip_tpu.train.loop import _mean_std

    assert _mean_std(loader.preprocess_cfg) == ((0.5,) * 3, (0.5,) * 3)
