"""Pure loss math (single-array forms, no collectives).

Capability parity with reference `src/open_clip/loss.py` /
`loss copy.py`:

- `multi_positive_cross_entropy_loss` — the core MR-CLIP objective, SupCon
  Eq. (2) with log inside the positive sum (loss.py:626-644).
- `multi_positive_cross_entropy_loss_with_distance` — Eq. (3)-style form with
  a TE/TR distance penalty added to negative logits before the row-max
  stabilization (loss copy.py:726-760).
- `weighted_euclidean_distance` / `mahalanobis_distance` pairwise metadata
  distances (loss copy.py:978-1025).
- arange-label InfoNCE cross entropy (ClipLoss core, loss.py:104-139).
- SigLIP pairwise sigmoid loss core (loss.py:357-380).
- SupCon with self-exclusion matching `example_sup_contrastive_loss.py:4-43`
  (the de-facto spec used by the parity tests).

All functions are jit-safe and operate on explicit arrays; distributed
variants live in `contrastive.py`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "multi_positive_cross_entropy_loss",
    "multi_positive_cross_entropy_loss_with_distance",
    "weighted_euclidean_distance",
    "mahalanobis_distance",
    "arange_cross_entropy",
    "sigmoid_pair_loss",
    "supervised_contrastive_loss",
    "pos_mask_from_labels",
]

_EPS = 1e-12


def pos_mask_from_labels(labels_row: jax.Array, labels_col: Optional[jax.Array] = None) -> jax.Array:
    """pos_mask[i, j] = 1 if labels match (reference loss.py:724-730). fp32."""
    if labels_col is None:
        labels_col = labels_row
    return (labels_row[:, None] == labels_col[None, :]).astype(jnp.float32)


def multi_positive_cross_entropy_loss(logits: jax.Array, pos_mask: jax.Array) -> jax.Array:
    """SupCon Eq. (2): `-mean_i mean_{j in P(i)} log softmax(logits)_ij`.

    Row-max stabilization with detached max; positives averaged inside the
    log-softmax sum; rows with no positives contribute 0 via the clamp
    (reference loss.py:626-644, numerics replicated including the 1e-12).
    """
    logits = logits.astype(jnp.float32)
    row_max = jax.lax.stop_gradient(jnp.max(logits, axis=1, keepdims=True))
    shifted = logits - row_max
    log_denom = jnp.log(jnp.sum(jnp.exp(shifted), axis=1, keepdims=True) + _EPS)
    log_prob = shifted - log_denom
    num_pos = jnp.clip(jnp.sum(pos_mask, axis=1), min=1.0)
    per_sample = -jnp.sum(pos_mask * log_prob, axis=1) / num_pos
    return jnp.mean(per_sample)


def multi_positive_cross_entropy_loss_with_distance(
    logits: jax.Array, pos_mask: jax.Array, distance: jax.Array
) -> jax.Array:
    """Distance-weighted variant (reference loss copy.py:726-760).

    The metadata distance is added to *negative* logits only, pushing
    metadata-far negatives further apart; the log is outside the positive sum
    (Eq. (3) form) and normalized by |P(i)| after the log.
    """
    logits = logits.astype(jnp.float32)
    dist_neg = distance.astype(jnp.float32) * (1.0 - pos_mask)
    row_max = jax.lax.stop_gradient(jnp.max(logits + dist_neg, axis=1, keepdims=True))
    exp_shifted = jnp.exp(logits - row_max)
    pos_sum = jnp.sum(exp_shifted * pos_mask, axis=1)
    all_sum = jnp.sum(exp_shifted, axis=1)
    per_sample = -jnp.log(pos_sum / (all_sum + _EPS) + _EPS)
    num_pos = jnp.clip(jnp.sum(pos_mask, axis=1), min=1.0)
    return jnp.mean(per_sample / num_pos)


def weighted_euclidean_distance(
    te: jax.Array,
    tr: jax.Array,
    all_te: jax.Array,
    all_tr: jax.Array,
    w_te: float = 0.2,
    w_tr: float = 10.0,
) -> jax.Array:
    """Pairwise `sqrt(dTE^2/w_te + dTR^2/w_tr)` (reference loss copy.py:978-997)."""
    te_diff = te[:, None] - all_te[None, :]
    tr_diff = tr[:, None] - all_tr[None, :]
    return jnp.sqrt(te_diff**2 / w_te + tr_diff**2 / w_tr)


def mahalanobis_distance(
    te: jax.Array, tr: jax.Array, all_te: jax.Array, all_tr: jax.Array, eps: float = 1e-6
) -> jax.Array:
    """Pairwise Mahalanobis distance in (TE, TR) space using the global-batch
    covariance (reference loss copy.py:999-1025)."""
    local = jnp.stack([te, tr], axis=1)
    global_ = jnp.stack([all_te, all_tr], axis=1)
    cov = jnp.cov(global_.T) + eps * jnp.eye(2)
    inv_cov = jnp.linalg.inv(cov)
    diffs = local[:, None, :] - global_[None, :, :]
    return jnp.sqrt(jnp.einsum("bij,jk,bik->bi", diffs, inv_cov, diffs))


def arange_cross_entropy(logits: jax.Array, label_offset: jax.Array | int = 0) -> jax.Array:
    """Mean CE with diagonal targets `arange(B) + offset` (InfoNCE core).

    `label_offset` is the rank offset used by the reference's `local_loss`
    mode (loss.py:104-114).
    """
    b = logits.shape[0]
    labels = jnp.arange(b) + label_offset
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(logp[jnp.arange(b), labels])


def sigmoid_pair_loss(
    image_features: jax.Array,
    text_features: jax.Array,
    logit_scale: jax.Array,
    logit_bias: Optional[jax.Array] = None,
    negative_only: bool = False,
) -> jax.Array:
    """SigLIP pairwise sigmoid loss, summed over pairs / batch
    (reference loss.py:357-380). `negative_only=True` is the ring-chunk form
    where every pair is a negative."""
    logits = logit_scale * image_features @ text_features.T
    if logit_bias is not None:
        logits = logits + logit_bias
    b = image_features.shape[0]
    labels = -jnp.ones((b, text_features.shape[0]), dtype=jnp.float32)
    if not negative_only:
        labels = labels + 2.0 * jnp.eye(b, text_features.shape[0], dtype=jnp.float32)
    return -jnp.sum(jax.nn.log_sigmoid(labels * logits.astype(jnp.float32))) / b


def supervised_contrastive_loss(
    features: jax.Array, labels: jax.Array, temperature: float = 0.07
) -> jax.Array:
    """Reference SupCon with self-exclusion — the executable spec in
    `open_clip_train/example_sup_contrastive_loss.py:4-43`."""
    b = features.shape[0]
    mask = pos_mask_from_labels(labels)
    logits = (features @ features.T / temperature).astype(jnp.float32)
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=1, keepdims=True))
    self_mask = 1.0 - jnp.eye(b)
    mask = mask * self_mask
    exp_logits = jnp.exp(logits) * self_mask
    log_prob = logits - jnp.log(jnp.sum(exp_logits, axis=1, keepdims=True) + _EPS)
    mean_log_prob_pos = jnp.sum(mask * log_prob, axis=1) / (jnp.sum(mask, axis=1) + _EPS)
    return -jnp.mean(mean_log_prob_pos)
