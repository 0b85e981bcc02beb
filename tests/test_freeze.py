"""Tower locking / freezing masks (reference model.py:264,403; train.py:85-91).

A frozen subtree must receive exactly zero update (including weight decay);
unlocked groups keep training.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrclip_tpu.factory import create_loss, create_model
from mrclip_tpu.parallel import (
    build_train_step,
    create_optimizer,
    create_train_state,
    make_loss_apply,
)
from mrclip_tpu.parallel.freeze import build_trainable_mask, chain_with_mask


class Args:
    multipositiveloss = True
    delta = 0.5
    distance = visiononly = siglip = distill = False
    lam = None
    model = "ViT-B-32-mini"
    gather_with_grad = True
    lock_image = False
    lock_image_unlocked_groups = 0
    lock_text = False
    lock_text_unlocked_layers = 0
    freeze = False
    freezelast = False


def _delta_tree(a, b):
    return jax.tree.map(lambda x, y: float(jnp.abs(x - y).max()), a, b)


def _run_step(args):
    model, variables = create_model("ViT-B-32-mini", scan_layers=True)
    mask = build_trainable_mask(variables["params"], args)
    tx = chain_with_mask(create_optimizer(lr=1e-2, wd=0.1), mask)
    state = create_train_state(variables, tx)
    step = build_train_step(model, make_loss_apply(create_loss(Args())), tx, donate=False)
    rng = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(rng.rand(8, 64, 64, 3), jnp.float32),
        "tokens": jnp.asarray(rng.randint(1, 49408, (8, 32)), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 4, (8,)), jnp.int32),
    }
    new_state, _ = step(state, batch, jax.random.key(0))
    return variables["params"], new_state.params


@pytest.mark.slow
def test_lock_image_freezes_visual():
    args = Args()
    args.lock_image = True
    before, after = _run_step(args)
    vis_delta = jax.tree.leaves(_delta_tree(before["visual"], after["visual"]))
    assert max(vis_delta) == 0.0
    txt_delta = jax.tree.leaves(_delta_tree(before["text"], after["text"]))
    assert max(txt_delta) > 0.0


@pytest.mark.slow
def test_lock_image_unlocked_proj():
    args = Args()
    args.lock_image = True
    args.lock_image_unlocked_groups = 1  # only the final projection trains
    before, after = _run_step(args)
    assert float(jnp.abs(before["visual"]["proj"] - after["visual"]["proj"]).max()) > 0.0
    assert float(
        jnp.abs(
            before["visual"]["conv1"]["kernel"] - after["visual"]["conv1"]["kernel"]
        ).max()
    ) == 0.0


@pytest.mark.slow
def test_freeze_text_except_last():
    args = Args()
    args.freeze = True
    args.freezelast = True  # last 2 blocks stay trainable
    before, after = _run_step(args)
    blk_b = before["text"]["transformer"]["blocks"]["block"]
    blk_a = after["text"]["transformer"]["blocks"]["block"]
    k_b = blk_b["mlp"]["c_fc"]["kernel"]  # [L, d, 4d]
    k_a = blk_a["mlp"]["c_fc"]["kernel"]
    per_layer = np.array(
        [float(jnp.abs(k_b[i] - k_a[i]).max()) for i in range(k_b.shape[0])]
    )
    assert (per_layer[:-2] == 0.0).all() if k_b.shape[0] > 2 else True
    assert per_layer[-1] > 0.0
    # non-transformer text params (embeddings) keep training (--freeze only
    # touches the transformer, reference train.py:87)
    emb_delta = float(
        jnp.abs(
            before["text"]["token_embedding"]["embedding"]
            - after["text"]["token_embedding"]["embedding"]
        ).max()
    )
    assert emb_delta > 0.0
