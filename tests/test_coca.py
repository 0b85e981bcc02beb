"""CoCa model tests: forward contract, caption loss, generation modes.

Reference behavior: coca_model.py:171-202 (forward returns contrastive
features + teacher-forced caption logits/labels), :204-330 (sampling
generation), :331-479 (beam search).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrclip_tpu.factory import create_model
from mrclip_tpu.losses import coca_loss
from mrclip_tpu.models.coca import generate


@pytest.fixture(scope="module")
def coca():
    model, variables = create_model("coca-mini")
    return model, variables


def _batch(n=2, img=64, ctx=24, vocab=1000, seed=0):
    rng = np.random.RandomState(seed)
    images = jnp.asarray(rng.rand(n, img, img, 3), jnp.float32)
    tokens = rng.randint(1, vocab - 2, (n, ctx)).astype(np.int32)
    tokens[:, 0] = 1
    tokens[:, -1] = vocab - 1
    return images, jnp.asarray(tokens)


def test_forward_contract(coca):
    model, variables = coca
    images, tokens = _batch()
    out = jax.jit(lambda v, i, t: model.apply(v, i, t))(variables, images, tokens)
    assert out["image_features"].shape == (2, 64)
    assert out["text_features"].shape == (2, 64)
    # teacher forcing: logits align with text[:, 1:]
    assert out["logits"].shape == (2, 23, 1000)
    assert out["labels"].shape == (2, 23)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["image_features"]), axis=-1), 1.0, rtol=1e-5
    )


def test_caption_loss(coca):
    model, variables = coca
    images, tokens = _batch()
    out = model.apply(variables, images, tokens)
    ldict = coca_loss(
        out["image_features"],
        out["text_features"],
        out["logits"],
        out["labels"],
        out["logit_scale"],
    )
    assert np.isfinite(float(ldict["loss"]))
    assert float(ldict["caption_loss"]) > 0


@pytest.mark.parametrize("mode", ["greedy", "top_k", "top_p", "beam_search"])
def test_generation(coca, mode):
    model, variables = coca
    images, _ = _batch()
    toks = generate(
        model,
        variables,
        images,
        seq_len=12,
        sot_token_id=1,
        eot_token_id=999,
        pad_token_id=0,
        generation_type=mode,
        num_beams=3,
        rng=jax.random.key(0),
    )
    toks = np.asarray(toks)
    assert toks.shape == (2, 12)
    assert (toks[:, 0] == 1).all()
    # after an EOT, everything is pad
    for row in toks:
        eots = np.where(row == 999)[0]
        if len(eots):
            assert (row[eots[0] + 1 :] == 0).all()


@pytest.mark.slow
def test_chunked_caption_loss_matches_dense(coca):
    """coca_loss_chunked == coca_loss (value + grads), incl. the pad tail
    (T=23 is not divisible by chunk 5) and pad-label masking."""
    from mrclip_tpu.ops.fused_loss import coca_loss_chunked

    model, variables = coca
    images, tokens = _batch()
    # real pad tail: last 4 positions pad_id=0 -> masked out of the CE
    tokens = tokens.at[:, -4:].set(0)

    def dense(v):
        out = model.apply(v, images, tokens)
        return coca_loss(
            out["image_features"], out["text_features"], out["logits"],
            out["labels"], out["logit_scale"],
        )["loss"]

    def chunked(v):
        out = model.apply(v, images, tokens)
        return coca_loss_chunked(
            out["image_features"], out["text_features"], out["caption_hidden"],
            out["caption_proj"], out["labels"], out["logit_scale"],
            chunk_size=5,
        )["loss"]

    ld, gd = jax.value_and_grad(dense)(variables)
    lc, gc = jax.value_and_grad(chunked)(variables)
    np.testing.assert_allclose(float(ld), float(lc), rtol=1e-6)
    maxdiff = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gc))
    )
    assert maxdiff < 1e-5, f"grad maxdiff {maxdiff}"


@pytest.mark.slow
def test_chunked_coca_dispatch_and_train_step(coca):
    """factory dispatches coca + chunked_loss to the streaming captioning CE
    and the train-step adapter feeds it caption_hidden/caption_proj."""
    from mrclip_tpu.factory import create_loss
    from mrclip_tpu.parallel.train_step import (
        build_train_step, create_optimizer, create_train_state, make_loss_apply,
    )

    model, variables = coca

    class Args:
        model = "coca-mini"
        chunked_loss = True

    loss_fn = create_loss(Args())
    assert loss_fn.func.__name__ == "coca_loss_chunked"

    images, tokens = _batch()
    tx = create_optimizer(lr=1e-3, wd=0.0)
    state = create_train_state(variables, tx)
    step = build_train_step(model, make_loss_apply(loss_fn), tx, donate=False)
    state2, metrics = step(
        state, {"images": images, "tokens": tokens}, jax.random.key(0)
    )
    assert np.isfinite(float(metrics["loss"]))
    # params actually moved
    moved = any(
        float(jnp.max(jnp.abs(a - b))) > 0
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state2.params))
    )
    assert moved
