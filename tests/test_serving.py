"""Export/serve roundtrip: StableHLO artifacts reproduce the live model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrclip_tpu.factory import create_model
from mrclip_tpu.serving import export_model, load_exported, save_exported


def test_export_roundtrip(tmp_path):
    model, variables = create_model("ViT-B-32-mini")
    exported = export_model(model, variables, batch_size=2)
    path = str(tmp_path / "model.mrclip")
    save_exported(exported, path)
    served = load_exported(path)

    rng = np.random.RandomState(0)
    images = rng.rand(2, 64, 64, 3).astype(np.float32)
    tokens = rng.randint(1, 49408, (2, 32)).astype(np.int32)

    live = model.apply(variables, jnp.asarray(images), jnp.asarray(tokens))
    np.testing.assert_allclose(
        np.asarray(served.encode_image(images)), np.asarray(live["image_features"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(served.encode_text(tokens)), np.asarray(live["text_features"]), atol=1e-5
    )
    logits = served.logits(images, tokens)
    assert logits.shape == (2, 2)
    assert served.meta["context_length"] == 32


@pytest.mark.slow
def test_export_int8_roundtrip(tmp_path):
    """W8A8 export: artifact reloads without model code and stays parallel
    to the fp32 embeddings (ops/quant.py)."""
    model, variables = create_model("ViT-B-32-mini", scan_layers=False, rng_seed=0)
    exported = export_model(model, variables, batch_size=2, int8=True)
    path = str(tmp_path / "model_int8.mrclip")
    save_exported(exported, path)
    served = load_exported(path)
    assert served.meta["int8"] is True

    rng = np.random.RandomState(0)
    images = rng.rand(2, 64, 64, 3).astype(np.float32)
    tokens = rng.randint(1, 49408, (2, 32)).astype(np.int32)
    live = model.apply(variables, jnp.asarray(images), jnp.asarray(tokens))
    for got, want in (
        (served.encode_image(images), live["image_features"]),
        (served.encode_text(tokens), live["text_features"]),
    ):
        a = np.asarray(got, np.float64)
        b = np.asarray(want, np.float64)
        cos = (a * b).sum(-1) / (
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
        )
        assert cos.min() > 0.99


def test_export_int8_artifact_smaller(tmp_path):
    """The int8 artifact must actually be much smaller than the fp32 one
    (weights dominate; int8 + per-channel scales ~ 1/4 the bytes)."""
    import os

    model, variables = create_model("ViT-B-32-mini", scan_layers=False, rng_seed=0)
    p32 = str(tmp_path / "fp32.mrclip")
    p8 = str(tmp_path / "int8.mrclip")
    save_exported(export_model(model, variables, batch_size=2), p32)
    save_exported(export_model(model, variables, batch_size=2, int8=True), p8)
    ratio = os.path.getsize(p8) / os.path.getsize(p32)
    assert ratio < 0.45, f"int8 artifact only {ratio:.2f}x of fp32"


def test_export_cli_roundtrip(tmp_path):
    """`python -m mrclip_tpu.export` (the --torchscript replacement) writes
    an artifact the server loader accepts."""
    from mrclip_tpu.export import main as export_main

    out = str(tmp_path / "cli.mrclip")
    export_main(["--model", "ViT-B-32-mini", "--output", out,
                 "--batch-size", "2", "--int8"])
    served = load_exported(out)
    assert served.meta["int8"] is True
    feats = served.encode_image(np.random.rand(2, 64, 64, 3).astype(np.float32))
    assert np.asarray(feats).shape == (2, 64)


@pytest.mark.slow
def test_export_cli_attn_bf16(tmp_path):
    """--attn-impl bf16 --precision bf16 bakes the measured serving-throughput
    attention mode into the artifact (bench --infer's configuration)."""
    from mrclip_tpu.export import main as export_main

    out = str(tmp_path / "attn_bf16.mrclip")
    export_main(["--model", "ViT-B-32-mini", "--output", out,
                 "--batch-size", "2", "--precision", "bf16",
                 "--attn-impl", "bf16"])
    served = load_exported(out)
    feats = served.encode_image(np.random.rand(2, 64, 64, 3).astype(np.float32))
    assert np.asarray(feats).shape == (2, 64)
    assert np.all(np.isfinite(np.asarray(feats, np.float32)))


@pytest.mark.slow
def test_export_symbolic_batch(tmp_path):
    model, variables = create_model("ViT-B-32-mini")
    exported = export_model(model, variables, batch_size=None)
    path = str(tmp_path / "model_sym.mrclip")
    save_exported(exported, path)
    served = load_exported(path)
    for b in (1, 3, 5):
        out = served.encode_image(np.random.rand(b, 64, 64, 3).astype(np.float32))
        assert np.asarray(out).shape == (b, 64)


@pytest.mark.slow
def test_export_in_memory_callable():
    """export_model's in-memory result must be usable without a save/load
    round-trip (regression: raw jax.export.Exported is not callable)."""
    model, variables = create_model("ViT-B-32-mini")
    exported = export_model(model, variables, batch_size=2)
    images = np.random.RandomState(2).rand(2, 64, 64, 3).astype(np.float32)
    tokens = np.random.RandomState(3).randint(1, 49408, (2, 32)).astype(np.int32)
    embed = np.asarray(exported.encode_image(images)).shape[-1]
    live = model.apply(variables, jnp.asarray(images), None)
    assert embed == np.asarray(live["image_features"]).shape[-1]
    assert exported.logits(images, tokens).shape == (2, 2)


@pytest.mark.slow
def test_export_rn50_batch_stats_tower(tmp_path):
    """BN towers (RN family) export/serve: batch_stats baked into the
    artifact, eval-mode statistics."""
    from mrclip_tpu.factory import _MODEL_CONFIGS

    _MODEL_CONFIGS.setdefault("RN50-mini-serve", {
        "embed_dim": 32,
        "vision_cfg": {"image_size": 64, "layers": [1, 1, 1, 1], "width": 16,
                       "head_width": 16},
        "text_cfg": {"context_length": 16, "vocab_size": 1000, "width": 32,
                     "heads": 2, "layers": 2},
    })
    model, variables = create_model("RN50-mini-serve")
    exported = export_model(model, variables, batch_size=2)
    path = str(tmp_path / "rn.mrclip")
    save_exported(exported, path)
    served = load_exported(path)

    images = np.random.RandomState(4).rand(2, 64, 64, 3).astype(np.float32)
    live = model.apply(variables, jnp.asarray(images), None)
    np.testing.assert_allclose(
        np.asarray(served.encode_image(images)),
        np.asarray(live["image_features"]), atol=1e-5,
    )
