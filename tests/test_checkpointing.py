"""Checkpoint paths: factory pretrained loading (torch .pt) and Orbax
save/restore roundtrip (reference factory.py:377-415, main.py:401-420)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrclip_tpu import checkpoint as ckpt
from mrclip_tpu.factory import create_model
from mrclip_tpu.hub import export_torch_state_dict
from mrclip_tpu.parallel import create_optimizer, create_train_state


@pytest.mark.slow
def test_factory_pretrained_path(tmp_path):
    """create_model(pretrained=<torch .pt>) reproduces the source model."""
    import torch

    _, src_variables = create_model("ViT-B-32-mini", rng_seed=3)
    sd = export_torch_state_dict(src_variables["params"])
    path = str(tmp_path / "weights.pt")
    torch.save({"state_dict": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}}, path)

    model, variables = create_model("ViT-B-32-mini", pretrained=path)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    toks = jnp.asarray(rng.randint(1, 49400, (2, 32)), jnp.int32)

    out_loaded = model.apply(variables, imgs, toks)
    src_model, _ = create_model("ViT-B-32-mini", init_params=False)
    out_src = src_model.apply(src_variables, imgs, toks)
    np.testing.assert_allclose(
        np.asarray(out_loaded["image_features"]),
        np.asarray(out_src["image_features"]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_loaded["text_features"]),
        np.asarray(out_src["text_features"]),
        atol=1e-5,
    )


def test_orbax_roundtrip(tmp_path):
    _, variables = create_model("ViT-B-32-mini")
    tx = create_optimizer(lr=1e-3)
    state = create_train_state(variables, tx)
    state = state.replace(step=jnp.asarray(7, jnp.int32))

    ckpt_dir = str(tmp_path / "ckpts")
    ckpt.save_checkpoint(ckpt_dir, 7, state)
    assert ckpt.latest_step(ckpt_dir) == 7

    _, fresh = create_model("ViT-B-32-mini", rng_seed=99)
    template = create_train_state(fresh, tx)
    restored = ckpt.load_checkpoint(ckpt_dir, template=template)
    assert int(restored.step) == 7
    for path_a, leaf_a in jax.tree_util.tree_flatten_with_path(state.params)[0]:
        key = jax.tree_util.keystr(path_a)
        leaf_b = dict(
            (jax.tree_util.keystr(p), v)
            for p, v in jax.tree_util.tree_flatten_with_path(restored.params)[0]
        )[key]
        np.testing.assert_array_equal(np.asarray(leaf_a), np.asarray(leaf_b), err_msg=key)


def test_missing_checkpoint_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        ckpt.load_checkpoint(str(tmp_path / "empty"), template=None)
