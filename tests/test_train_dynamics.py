"""End-to-end training-dynamics parity vs the reference torch loop.

Identical init + identical batches: K steps of the reference's
CLIP->MultiPositiveClipLoss->AdamW(wd split)->clip_grad_norm->cosine_lr->
logit_scale clamp (train.py:70-269, main.py:339-378) vs K steps of
build_train_step. Asserts per-step losses and final weights agree — the
"R@1 parity" north star rests on trained-model parity, not forward-only
parity (VERDICT r2 item 1).
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tools")


@pytest.mark.slow
def test_train_dynamics_parity():
    from train_dynamics_parity import run_parity

    r = run_parity(steps=8, batch=8, lr=5e-4, wd=0.1, warmup=3, delta=0.5,
                   grad_clip=1.0, seed=0)
    assert not r["missing_keys"], r["missing_keys"]
    assert r["loss_maxdiff"] < 1e-4, (r["ref_losses"], r["jax_losses"])
    assert r["weight_maxdiff"] < 1e-4, r["worst_weight"]
    # trajectories genuinely move (not a frozen-model tautology)
    assert r["ref_losses"][0] - r["ref_losses"][-1] > 0.05


@pytest.mark.slow
def test_train_dynamics_parity_no_clip_no_warmup():
    """Different knob corner: no grad clipping, no warmup, delta=0.3."""
    from train_dynamics_parity import run_parity

    r = run_parity(steps=5, batch=8, lr=1e-3, wd=0.2, warmup=0, delta=0.3,
                   grad_clip=None, seed=1)
    assert not r["missing_keys"], r["missing_keys"]
    assert r["loss_maxdiff"] < 1e-4
    assert r["weight_maxdiff"] < 1e-4


@pytest.mark.slow
def test_cached_accum_dynamics_parity():
    """Cached-feature grad accumulation matches the reference scheme
    end-to-end (train.py:134-183): per-microbatch backwards SUM into the
    grads (no 1/accum_freq scaling) before one optimizer step."""
    from train_dynamics_parity import run_parity_accum

    r = run_parity_accum(steps=4, batch=6, accum=2)
    assert not r["missing_keys"], r["missing_keys"]
    assert r["loss_maxdiff"] < 1e-4, (r["ref_losses"], r["jax_losses"])
    assert r["weight_maxdiff"] < 1e-4, r["worst_weight"]
