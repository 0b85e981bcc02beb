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


def test_export_symbolic_batch(tmp_path):
    model, variables = create_model("ViT-B-32-mini")
    exported = export_model(model, variables, batch_size=None)
    path = str(tmp_path / "model_sym.mrclip")
    save_exported(exported, path)
    served = load_exported(path)
    for b in (1, 3, 5):
        out = served.encode_image(np.random.rand(b, 64, 64, 3).astype(np.float32))
        assert np.asarray(out).shape == (b, 64)
