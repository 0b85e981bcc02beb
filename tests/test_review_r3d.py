"""Round-3 review batch d: accum grad scale, tracepreds tie order,
vision-only accum gating, expand_urls -O-safe guards."""

import numpy as np
import pytest

from mrclip_tpu.data import _loader_batch
from mrclip_tpu.data.shards import expand_urls
from mrclip_tpu.train.metrics import get_clip_metrics


class _A:
    batch_size = 8
    accum_freq = 4
    visiononly = False
    multipositiveloss = True


def test_loader_batch_accum_chunking():
    a = _A()
    assert _loader_batch(a, is_train=True) == 32
    assert _loader_batch(a, is_train=False) == 8
    a.visiononly = True  # vision-only step has no accum: no inflation
    assert _loader_batch(a, is_train=True) == 8
    a.multipositiveloss = False  # not the vision_only path -> normal accum
    assert _loader_batch(a, is_train=True) == 32


def test_vision_only_rejects_accum():
    """train.main must reject --visiononly --accum-freq>1 loudly: the
    vision-only step consumes one loader batch per device step with no
    microbatching, so accum would silently change semantics / OOM."""
    import inspect

    from mrclip_tpu.train import main as train_main

    src = inspect.getsource(train_main.main)
    assert "accum-freq > 1 is not supported with --visiononly" in src


def test_expand_urls_guards_survive_O():
    with pytest.raises(ValueError):
        expand_urls("a.tar::b.tar", weights="1.0")
    with pytest.raises(ValueError):
        expand_urls(["a.tar", "b.tar"], weights="1.0::2.0")


def test_tracepreds_topk_tie_order_matches_stable_argsort():
    """The argpartition fast path must reproduce np.argsort(-logit,
    kind='stable') exactly, including ties inside the window and at the
    k-th boundary (lowest column index first)."""
    rng = np.random.RandomState(0)
    n = 24
    # heavy ties: quantized logits; identity text features make
    # logits_per_image == image_features exactly (logit_scale 1)
    logits = rng.randint(0, 4, size=(n, n)).astype(np.float32)
    gt = np.arange(n) % 5

    metrics, vocab = get_clip_metrics(
        image_features=logits,
        text_features=np.eye(n, dtype=np.float32),
        logit_scale=1.0,
        ground_truth_general=gt,
        trace=True,
    )
    got = vocab["image_to_text_general"]
    for i in range(n):
        want = np.argsort(-logits[i], kind="stable")[:10].tolist()
        assert got[i]["indices"] == want, f"row {i}"
