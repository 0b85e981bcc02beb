"""create_loss flag dispatch matrix (reference factory.py:432-503)."""

from functools import partial

from mrclip_tpu.factory import create_loss
from mrclip_tpu.losses import (
    clip_loss,
    coca_loss,
    distill_clip_loss,
    multipositive_clip_loss,
    multipositive_clip_loss_vision_only,
    multipositive_clip_loss_with_distance,
    multipositive_clip_loss_with_vision,
    siglip_loss,
)


def _args(**kw):
    class A:
        multipositiveloss = False
        delta = 0.5
        lam = None
        distance = False
        visiononly = False
        siglip = False
        distill = False
        model = "ViT-B-16"
        gather_with_grad = False

    a = A()
    for k, v in kw.items():
        setattr(a, k, v)
    return a


def _target(fn):
    while isinstance(fn, partial):
        fn = fn.func
    return fn


def test_dispatch_matrix():
    assert _target(create_loss(_args())) is clip_loss
    assert _target(create_loss(_args(multipositiveloss=True))) is multipositive_clip_loss
    assert (
        _target(create_loss(_args(multipositiveloss=True, distance=True)))
        is multipositive_clip_loss_with_distance
    )
    assert (
        _target(create_loss(_args(multipositiveloss=True, visiononly=True)))
        is multipositive_clip_loss_vision_only
    )
    assert _target(create_loss(_args(lam=0.3))) is multipositive_clip_loss_with_vision
    assert _target(create_loss(_args(siglip=True))) is siglip_loss
    assert _target(create_loss(_args(distill=True))) is distill_clip_loss
    assert _target(create_loss(_args(model="coca_ViT-B-32"))) is coca_loss


def test_hparams_bound():
    fn = create_loss(_args(multipositiveloss=True, delta=0.3))
    assert fn.keywords["delta"] == 0.3
    fn = create_loss(_args(lam=0.7))
    assert fn.keywords["lam"] == 0.7
