"""Zero-shot classification eval.

Capability parity with reference `src/open_clip/zero_shot_classifier.py:21-109`
(batched classifier build: classnames x templates, per-class template-mean +
renorm) and `src/open_clip_train/zero_shot.py:11-86` (top-1/5 accuracy,
frequency gating). ImageNet classnames/templates ship as a JSON data asset
(extracted from the reference's zero_shot_metadata.py data tables).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "load_imagenet_metadata",
    "build_zero_shot_classifier",
    "zero_shot_accuracy",
    "zero_shot_eval",
]

_META_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets", "zero_shot_metadata.json")


def load_imagenet_metadata():
    with open(_META_PATH) as f:
        meta = json.load(f)
    return meta["imagenet_classnames"], meta["openai_imagenet_templates"]


def build_zero_shot_classifier(
    encode_text: Callable[[np.ndarray], jax.Array],
    tokenizer: Callable,
    classnames: Sequence[str],
    templates: Sequence[str],
    num_classes_per_batch: Optional[int] = 10,
) -> jax.Array:
    """[embed_dim, n_classes] classifier (reference zero_shot_classifier.py:21-68).

    Encodes `len(templates)` prompts per class in batched chunks, means over
    templates, L2-normalizes per class.
    """
    def fill(template, classname):
        return template(classname) if callable(template) else template.format(classname)

    n_t = len(templates)
    chunks = []
    batch = num_classes_per_batch or len(classnames)
    for start in range(0, len(classnames), batch):
        names = classnames[start : start + batch]
        texts = [fill(t, c) for c in names for t in templates]
        tokens = tokenizer(texts)
        feats = encode_text(tokens)  # [n*t, d], normalized
        feats = feats.reshape(len(names), n_t, -1).mean(axis=1)
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        chunks.append(feats)
    return jnp.concatenate(chunks, axis=0).T  # [d, n_classes]


def zero_shot_accuracy(logits: np.ndarray, target: np.ndarray, topk=(1, 5)):
    """top-k accuracies (reference zero_shot.py:11-16)."""
    order = np.argsort(-logits, axis=1)
    out = []
    for k in topk:
        hit = (order[:, :k] == target[:, None]).any(axis=1)
        out.append(float(hit.mean()))
    return out


def zero_shot_eval(
    encode_image: Callable,
    classifier: jax.Array,
    dataloader,
) -> dict:
    """Run the classifier over a loader (reference zero_shot.py:17-42)."""
    top1s, top5s, n = [], [], 0
    for batch in dataloader:
        feats = encode_image(batch["images"])
        logits = 100.0 * feats @ classifier
        t1, t5 = zero_shot_accuracy(np.asarray(logits), np.asarray(batch["labels"]))
        b = len(batch["labels"])
        top1s.append(t1 * b)
        top5s.append(t5 * b)
        n += b
    if n == 0:
        return {}
    return {"top1": sum(top1s) / n, "top5": sum(top5s) / n}
