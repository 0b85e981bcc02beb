"""IO tests: torch export/import roundtrip, big_vision converter, registry.

The hub exporter (`hub.export_torch_state_dict`) is the inverse of
`checkpoint.import_torch_state_dict`; roundtripping must be exact. The
big_vision converter is validated on a synthetic npz following the SigLIP
naming scheme (reference convert.py:13-150).
"""

import numpy as np
import pytest

import jax

from mrclip_tpu.checkpoint import import_torch_state_dict
from mrclip_tpu.convert import big_vision_npz_to_params, convert_state_dict
from mrclip_tpu.factory import create_model
from mrclip_tpu.hub import export_torch_state_dict, generate_readme, save_for_hf
from mrclip_tpu.pretrained import (
    get_pretrained_cfg,
    get_pretrained_url,
    is_pretrained_cfg,
    list_pretrained,
    list_pretrained_tags_by_model,
)


@pytest.mark.slow
def test_export_import_roundtrip():
    _, variables = create_model("ViT-B-32-mini", scan_layers=True)
    params = variables["params"]
    sd = export_torch_state_dict(params)
    assert "visual.conv1.weight" in sd
    assert sd["visual.conv1.weight"].shape[0] == 64  # OIHW
    back = import_torch_state_dict(sd, scan_layers=True)

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = dict(
        (jax.tree_util.keystr(p), v) for p, v in jax.tree_util.tree_flatten_with_path(back)[0]
    )
    for path, val in flat_a:
        key = jax.tree_util.keystr(path)
        assert key in flat_b, key
        np.testing.assert_allclose(np.asarray(val), np.asarray(flat_b[key]), atol=1e-6, err_msg=key)


def test_export_import_roundtrip_unrolled():
    _, variables = create_model("ViT-B-32-mini", scan_layers=False)
    params = variables["params"]
    sd = export_torch_state_dict(params)
    back = import_torch_state_dict(sd, scan_layers=False)
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = dict(
        (jax.tree_util.keystr(p), v) for p, v in jax.tree_util.tree_flatten_with_path(back)[0]
    )
    for path, val in flat_a:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(np.asarray(val), np.asarray(flat_b[key]), atol=1e-6, err_msg=key)


def _synthetic_big_vision(d=8, heads=2, layers=2, grid=2, ctx=5, vocab=11):
    rng = np.random.RandomState(0)
    w = {}
    hd = d // heads

    def blocks(prefix):
        for i in range(layers):
            bp = f"{prefix}Transformer/encoderblock_{i}/"
            w[bp + "LayerNorm_0/scale"] = rng.rand(d).astype(np.float32)
            w[bp + "LayerNorm_0/bias"] = rng.rand(d).astype(np.float32)
            w[bp + "LayerNorm_1/scale"] = rng.rand(d).astype(np.float32)
            w[bp + "LayerNorm_1/bias"] = rng.rand(d).astype(np.float32)
            mp = bp + "MultiHeadDotProductAttention_0/"
            for name in ("query", "key", "value"):
                w[mp + f"{name}/kernel"] = rng.rand(d, heads, hd).astype(np.float32)
                w[mp + f"{name}/bias"] = rng.rand(heads, hd).astype(np.float32)
            w[mp + "out/kernel"] = rng.rand(heads, hd, d).astype(np.float32)
            w[mp + "out/bias"] = rng.rand(d).astype(np.float32)
            w[bp + "MlpBlock_0/Dense_0/kernel"] = rng.rand(d, 4 * d).astype(np.float32)
            w[bp + "MlpBlock_0/Dense_0/bias"] = rng.rand(4 * d).astype(np.float32)
            w[bp + "MlpBlock_0/Dense_1/kernel"] = rng.rand(4 * d, d).astype(np.float32)
            w[bp + "MlpBlock_0/Dense_1/bias"] = rng.rand(d).astype(np.float32)

    w["img/embedding/kernel"] = rng.rand(4, 4, 3, d).astype(np.float32)
    w["img/embedding/bias"] = rng.rand(d).astype(np.float32)
    w["img/pos_embedding"] = rng.rand(1, grid * grid, d).astype(np.float32)
    w["img/Transformer/encoder_norm/scale"] = rng.rand(d).astype(np.float32)
    w["img/Transformer/encoder_norm/bias"] = rng.rand(d).astype(np.float32)
    w["img/head/kernel"] = rng.rand(d, d).astype(np.float32)
    blocks("img/")

    w["txt/Embed_0/embedding"] = rng.rand(vocab, d).astype(np.float32)
    w["txt/pos_embedding"] = rng.rand(1, ctx, d).astype(np.float32)
    w["txt/Transformer/encoder_norm/scale"] = rng.rand(d).astype(np.float32)
    w["txt/Transformer/encoder_norm/bias"] = rng.rand(d).astype(np.float32)
    w["txt/head/kernel"] = rng.rand(d, d).astype(np.float32)
    w["txt/head/bias"] = rng.rand(d).astype(np.float32)
    blocks("txt/")

    w["t"] = np.float32(10.0)
    w["b"] = np.float32(-10.0)
    return w


def test_big_vision_converter():
    w = _synthetic_big_vision()
    params = big_vision_npz_to_params(w, scan_layers=True)
    assert params["visual"]["conv1"]["kernel"].shape == (4, 4, 3, 8)
    blk = params["visual"]["transformer"]["blocks"]["block"]
    assert blk["attn"]["in_proj"]["kernel"].shape == (2, 8, 24)
    # fused qkv ordering: q then k then v columns
    q = np.asarray(w["img/Transformer/encoderblock_0/MultiHeadDotProductAttention_0/query/kernel"]).reshape(8, 8)
    np.testing.assert_allclose(np.asarray(blk["attn"]["in_proj"]["kernel"])[0, :, :8], q)
    assert params["text"]["token_embedding"]["embedding"].shape == (11, 8)
    assert params["text"]["text_projection"]["kernel"].shape == (8, 8)
    assert float(params["logit_scale"]) == 10.0
    # dispatch also routes npz-style dicts
    params2 = convert_state_dict(w)
    np.testing.assert_allclose(
        np.asarray(params2["visual"]["conv1"]["kernel"]), np.asarray(params["visual"]["conv1"]["kernel"])
    )


@pytest.mark.slow
def test_save_for_hf(tmp_path):
    _, variables = create_model("ViT-B-32-mini", scan_layers=True)
    save_for_hf(
        variables["params"],
        {"embed_dim": 64},
        str(tmp_path),
        preprocess_cfg={"size": 64},
    )
    import os

    files = os.listdir(tmp_path)
    assert "open_clip_config.json" in files
    assert any(f.startswith("open_clip_model") for f in files)
    readme = generate_readme({"details": {"Dataset": "MRI"}}, "test-model")
    assert "# Model card for test-model" in readme

    # Regression: safetensors' numpy writer silently serializes the RAW
    # buffer of non-contiguous views — every transposed kernel in the
    # export hit this before put() forced contiguity. Verify the FILE
    # round-trips bit-exact, not just the in-memory dict.
    sd_mem = export_torch_state_dict(variables["params"])
    try:
        from safetensors.numpy import load_file
        sd_disk = load_file(str(tmp_path / "open_clip_model.safetensors"))
    except ImportError:
        sd_disk = dict(np.load(str(tmp_path / "open_clip_model.npz")))
    for k, v in sd_mem.items():
        np.testing.assert_array_equal(sd_disk[k], v, err_msg=k)


def test_pretrained_registry():
    pairs = list_pretrained()
    assert ("ViT-B-16", "openai") in pairs
    assert is_pretrained_cfg("ViT-B-16", "openai")
    assert get_pretrained_url("ViT-B-16", "openai").startswith("https://")
    assert "openai" in list_pretrained_tags_by_model("RN50")
    cfg = get_pretrained_cfg("ViT-B-16", "openai")
    assert cfg.get("quick_gelu") is True


def test_pretrained_registry_breadth_and_config_consistency():
    """Every registry arch must ship a buildable config (the reference
    registers tags for archs whose configs it dropped; here tags and configs
    stay consistent), and the broadened r3 registry covers the openai RN
    scales, convnext family, SigLIP i18n/384 and xlm-large archs."""
    from mrclip_tpu.factory import list_models
    from mrclip_tpu.pretrained import _PRETRAINED

    models = set(list_models())
    missing = [a for a in _PRETRAINED if a not in models]
    assert not missing, f"registry archs without configs: {missing}"
    for arch, tag in [
        ("RN50x4", "openai"), ("RN50x16", "openai"), ("RN50x64", "openai"),
        ("ViT-B-16-plus-240", "laion400m_e32"),
        ("ViT-B-32-256", "datacomp_s34b_b86k"),
        ("ViT-H-14-378", "dfn5b"),
        ("coca_ViT-L-14", "laion2b_s13b_b90k"),
        ("convnext_base", "laion400m_s13b_b51k"),
        ("convnext_base_w_320", "laion_aesthetic_s13b_b82k"),
        ("convnext_xxlarge", "laion2b_s34b_b82k_augreg_soup"),
        ("ViT-B-16-SigLIP-i18n-256", "webli"),
        ("ViT-SO400M-14-SigLIP-384", "webli"),
        ("ViT-SO400M-16-SigLIP-i18n-256", "webli"),
        ("xlm-roberta-large-ViT-H-14", "frozen_laion5b_s13b_b90k"),
    ]:
        assert is_pretrained_cfg(arch, tag), f"missing tag {arch}:{tag}"
    assert len(list_pretrained()) >= 95


def test_patchify_crops_non_divisible_image():
    """Non-patch-divisible image sizes (SigLIP so400m @384, patch 14) drop
    the trailing remainder pixels exactly like a stride-p VALID conv
    (big_vision patchify semantics): forward(img) == forward(img cropped)."""
    import jax
    import jax.numpy as jnp

    from mrclip_tpu.models.vision import VisionTransformer

    vt = VisionTransformer(
        image_size=36, patch_size=16, width=32, layers=2, heads=2,
        output_dim=16, scan_layers=False,
    )
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(2, 36, 36, 3), jnp.float32)
    variables = vt.init(jax.random.key(0), imgs)
    full = vt.apply(variables, imgs)
    cropped = vt.apply(variables, imgs[:, :32, :32, :])
    np.testing.assert_allclose(np.asarray(full), np.asarray(cropped), atol=0)
