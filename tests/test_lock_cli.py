"""Tower locking through the CLI: --lock-image keeps the visual tower's
params frozen across training while the text tower moves (reference
main.py:287-300, model.py lock())."""

import pytest
import numpy as np

from mrclip_tpu.factory import create_model
from mrclip_tpu.hub import export_torch_state_dict
from mrclip_tpu.train.main import main as train_main


def _leaves(params, prefix):
    # canonical flat (torch-layout) names — layout-independent comparison
    return {
        k: np.asarray(v)
        for k, v in export_torch_state_dict(params).items()
        if k.startswith(prefix)
    }


@pytest.mark.slow
def test_lock_image_cli(tmp_path):
    state = train_main([
        "--dataset-type", "synthetic", "--train-num-samples", "16",
        "--model", "ViT-B-32-mini", "--batch-size", "8", "--epochs", "1",
        "--multipositiveloss", "--precision", "fp32", "--workers", "0",
        "--logs", str(tmp_path / "logs"), "--name", "l", "--seed", "7",
        "--lr", "1e-2", "--save-frequency", "0", "--lock-image",
    ])
    _, init_vars = create_model("ViT-B-32-mini", rng_seed=7)

    trained_vis = _leaves(state.params, "visual.")
    init_vis = _leaves(init_vars["params"], "visual.")
    assert set(trained_vis) == set(init_vis)
    for k, v in init_vis.items():
        np.testing.assert_array_equal(trained_vis[k], v, err_msg=k)

    trained_txt = {
        k: v for k, v in _leaves(state.params, "").items() if not k.startswith("visual.")
    }
    init_txt = {
        k: v
        for k, v in _leaves(init_vars["params"], "").items()
        if not k.startswith("visual.")
    }
    moved = [k for k in init_txt if not np.array_equal(trained_txt[k], init_txt[k])]
    assert moved, "text tower should have trained"


def test_lock_image_unlocked_groups_cli(tmp_path):
    """--lock-image-unlocked-groups 2 trains the last block + proj, keeps the
    stem and earlier blocks frozen (unrolled 2-layer mini model)."""
    state = train_main([
        "--dataset-type", "synthetic", "--train-num-samples", "16",
        "--model", "ViT-B-32-mini", "--batch-size", "8", "--epochs", "1",
        "--multipositiveloss", "--precision", "fp32", "--workers", "0",
        "--logs", str(tmp_path / "logs"), "--name", "g", "--seed", "7",
        "--lr", "1e-2", "--save-frequency", "0",
        "--lock-image", "--lock-image-unlocked-groups", "2",
    ])
    _, init_vars = create_model("ViT-B-32-mini", rng_seed=7)
    trained = _leaves(state.params, "visual.")
    init = _leaves(init_vars["params"], "visual.")
    frozen = [k for k in init if "resblocks.0." in k or "conv1" in k or "ln_pre" in k]
    unlocked = [k for k in init if "resblocks.1." in k or k == "visual.proj"]
    assert frozen and unlocked
    for k in frozen:
        np.testing.assert_array_equal(trained[k], init[k], err_msg=k)
    assert any(not np.array_equal(trained[k], init[k]) for k in unlocked)
