"""Contrastive losses with optional mesh-axis distribution.

Capability parity with the reference loss classes, re-designed as pure
functions: inside `shard_map` pass `axis_name` and each loss computes the
reference's *local x global* formulation (local B queries vs W*B gathered
keys — the `local_loss=True` memory layout, reference loss.py:104-126, which
is the only sane layout at large world size). With `axis_name=None` they are
the single-device forms.

| reference class (loss.py / loss copy.py)        | function here                       |
|-------------------------------------------------|-------------------------------------|
| ClipLoss :68-139                                | clip_loss                           |
| MultiPositiveClipLoss :671-747                  | multipositive_clip_loss             |
| MultiPositiveClipLossWithDistance (copy :762)   | multipositive_clip_loss_with_distance |
| MultiPositiveClipLossVisionOnly (copy :829)     | multipositive_clip_loss_vision_only |
| MultiPositiveClipLosswithVision (copy :894)     | multipositive_clip_loss_with_vision |
| SigLipLoss :314-448 (bidir/shift/reduce/gather) | siglip_loss                         |
| CoCaLoss :142-184                               | coca_loss                           |
| DistillClipLoss :187-223                        | distill_clip_loss                   |

Every function returns a dict of named scalars including `"loss"`, mirroring
the reference's `output_dict=True` convention (train loop sums/loys them).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .functional import (
    arange_cross_entropy,
    mahalanobis_distance,
    multi_positive_cross_entropy_loss,
    multi_positive_cross_entropy_loss_with_distance,
    pos_mask_from_labels,
    sigmoid_pair_loss,
    weighted_euclidean_distance,
)
from .gather import gather_features, neighbour_exchange, neighbour_exchange_bidir

__all__ = [
    "clip_loss",
    "multipositive_clip_loss",
    "multipositive_clip_loss_with_distance",
    "multipositive_clip_loss_vision_only",
    "multipositive_clip_loss_with_vision",
    "siglip_loss",
    "coca_loss",
    "distill_clip_loss",
]


def _rank_offset(axis_name: Optional[str], batch: int):
    if axis_name is None:
        return 0
    return jax.lax.axis_index(axis_name) * batch


def _pair_logits(
    image_features, text_features, logit_scale, axis_name, gather_with_grad,
    constrain=None,
):
    """(logits_per_image, logits_per_text) in local x global layout.

    `constrain` (GSPMD mode): sharding-constraint callable applied to the
    logit matrices so the N x N pairwise block stays row-sharded across the
    mesh (the jit-with-sharding equivalent of the reference's `local_loss`
    B x WB memory layout).
    """
    all_img = gather_features(image_features, axis_name, gather_with_grad=gather_with_grad)
    all_txt = gather_features(text_features, axis_name, gather_with_grad=gather_with_grad)
    logits_i = logit_scale * image_features @ all_txt.T
    logits_t = logit_scale * text_features @ all_img.T
    if constrain is not None:
        logits_i, logits_t = constrain(logits_i), constrain(logits_t)
    return logits_i, logits_t


def clip_loss(
    image_features: jax.Array,
    text_features: jax.Array,
    logit_scale: jax.Array,
    *,
    axis_name: Optional[str] = None,
    gather_with_grad: bool = True,
    constrain=None,
) -> dict:
    """Symmetric InfoNCE with arange labels (reference ClipLoss :68-139)."""
    logits_i, logits_t = _pair_logits(
        image_features, text_features, logit_scale, axis_name, gather_with_grad, constrain
    )
    offset = _rank_offset(axis_name, image_features.shape[0])
    loss = (arange_cross_entropy(logits_i, offset) + arange_cross_entropy(logits_t, offset)) / 2.0
    return {"loss": loss, "contrastive_loss": loss}


def multipositive_clip_loss(
    image_features: jax.Array,
    text_features: jax.Array,
    labels: jax.Array,
    logit_scale: jax.Array,
    *,
    delta: float = 0.5,
    axis_name: Optional[str] = None,
    gather_with_grad: bool = True,
    constrain=None,
) -> dict:
    """Core MR-CLIP objective (reference MultiPositiveClipLoss :671-747).

    Any (i, j) with matching acquisition-parameter labels is a positive pair;
    `delta` weights image->text vs text->image.
    """
    logits_i, logits_t = _pair_logits(
        image_features, text_features, logit_scale, axis_name, gather_with_grad, constrain
    )
    all_labels = gather_features(labels, axis_name, gather_with_grad=True) if axis_name else labels
    pos_mask = pos_mask_from_labels(labels, all_labels)
    loss_img = multi_positive_cross_entropy_loss(logits_i, pos_mask)
    loss_txt = multi_positive_cross_entropy_loss(logits_t, pos_mask)
    loss = delta * loss_img + (1.0 - delta) * loss_txt
    return {
        "loss": loss,
        "multi_contrastive_loss": loss,
        "image_to_text_loss": loss_img,
        "text_to_image_loss": loss_txt,
    }


def multipositive_clip_loss_with_distance(
    image_features: jax.Array,
    text_features: jax.Array,
    labels: jax.Array,
    echo_time: jax.Array,
    repetition_time: jax.Array,
    logit_scale: jax.Array,
    *,
    delta: float = 0.5,
    distance_fn: str = "weighted_euclidean",
    axis_name: Optional[str] = None,
    gather_with_grad: bool = True,
    constrain=None,
) -> dict:
    """Distance-weighted multipositive loss
    (reference MultiPositiveClipLossWithDistance, loss copy.py:762-827)."""
    logits_i, logits_t = _pair_logits(
        image_features, text_features, logit_scale, axis_name, gather_with_grad, constrain
    )
    if axis_name is not None:
        all_labels = gather_features(labels, axis_name, gather_with_grad=True)
        all_te = gather_features(echo_time, axis_name, gather_with_grad=True)
        all_tr = gather_features(repetition_time, axis_name, gather_with_grad=True)
    else:
        all_labels, all_te, all_tr = labels, echo_time, repetition_time

    pos_mask = pos_mask_from_labels(labels, all_labels)
    if distance_fn == "mahalanobis":
        distance = mahalanobis_distance(echo_time, repetition_time, all_te, all_tr)
    else:
        distance = weighted_euclidean_distance(echo_time, repetition_time, all_te, all_tr)

    loss_img = multi_positive_cross_entropy_loss_with_distance(logits_i, pos_mask, distance)
    loss_txt = multi_positive_cross_entropy_loss_with_distance(logits_t, pos_mask, distance)
    loss = delta * loss_img + (1.0 - delta) * loss_txt
    return {
        "loss": loss,
        "multi_contrastive_loss": loss,
        "image_to_text_loss": loss_img,
        "text_to_image_loss": loss_txt,
    }


def multipositive_clip_loss_vision_only(
    image_features: jax.Array,
    labels: jax.Array,
    logit_scale: jax.Array,
    *,
    axis_name: Optional[str] = None,
    gather_with_grad: bool = True,
    constrain=None,
) -> dict:
    """Image<->image SupCon, diagonal (self) pairs excluded
    (reference MultiPositiveClipLossVisionOnly, loss copy.py:829-892)."""
    all_img = gather_features(image_features, axis_name, gather_with_grad=gather_with_grad)
    logits = logit_scale * image_features @ all_img.T
    if constrain is not None:  # keep the B x WB block row-sharded (GSPMD)
        logits = constrain(logits)
    all_labels = gather_features(labels, axis_name, gather_with_grad=True) if axis_name else labels
    pos_mask = pos_mask_from_labels(labels, all_labels)
    # Zero the self-pair: in local x global layout the "diagonal" sits at
    # column rank*B + i (reference zeroes .diagonal(), loss copy.py:889).
    b = image_features.shape[0]
    offset = _rank_offset(axis_name, b)
    rows = jnp.arange(b)
    pos_mask = pos_mask.at[rows, rows + offset].set(0.0)
    loss = multi_positive_cross_entropy_loss(logits, pos_mask)
    return {"loss": loss, "multi_contrastive_loss": loss}


def multipositive_clip_loss_with_vision(
    image_features: jax.Array,
    text_features: jax.Array,
    labels: jax.Array,
    logit_scale: jax.Array,
    *,
    lam: float = 0.3,
    axis_name: Optional[str] = None,
    gather_with_grad: bool = True,
    constrain=None,
) -> dict:
    """i2t + t2i + lambda * img2img three-term variant
    (reference MultiPositiveClipLosswithVision, loss copy.py:894-976)."""
    logits_i, logits_t = _pair_logits(
        image_features, text_features, logit_scale, axis_name, gather_with_grad, constrain
    )
    all_img = gather_features(image_features, axis_name, gather_with_grad=gather_with_grad)
    logits_ii = logit_scale * image_features @ all_img.T
    if constrain is not None:  # same row-sharding as the i<->t matrices
        logits_ii = constrain(logits_ii)

    all_labels = gather_features(labels, axis_name, gather_with_grad=True) if axis_name else labels
    pos_mask = pos_mask_from_labels(labels, all_labels)
    loss_img = multi_positive_cross_entropy_loss(logits_i, pos_mask)
    loss_txt = multi_positive_cross_entropy_loss(logits_t, pos_mask)

    b = image_features.shape[0]
    rows = jnp.arange(b)
    pos_mask_ii = pos_mask.at[rows, rows + _rank_offset(axis_name, b)].set(0.0)
    loss_ii = multi_positive_cross_entropy_loss(logits_ii, pos_mask_ii)

    loss = (loss_img + loss_txt) / 2.0 + lam * loss_ii
    return {
        "loss": loss,
        "loss_img": loss_img,
        "loss_txt": loss_txt,
        "loss_img_to_img": loss_ii,
    }


def siglip_loss(
    image_features: jax.Array,
    text_features: jax.Array,
    logit_scale: jax.Array,
    logit_bias: jax.Array,
    *,
    axis_name: Optional[str] = None,
    impl: str = "bidir",
) -> dict:
    """SigLIP pairwise sigmoid loss with ring-passed negatives.

    Reference SigLipLoss (loss.py:314-448) with its 4 distributed impls:
    'bidir' (default two-direction ring), 'shift' (one-direction ring),
    'gather' (all-gather negatives). The 'reduce' impl is mathematically
    the 'gather' form — on TPU both lower to the same ICI collective.
    """
    loss = sigmoid_pair_loss(image_features, text_features, logit_scale, logit_bias)
    if axis_name is None:
        return {"loss": loss, "contrastive_loss": loss}

    world = jax.lax.axis_size(axis_name)
    if impl == "gather" or impl == "reduce":
        all_txt = gather_features(text_features, axis_name, gather_with_grad=True)
        b = text_features.shape[0]
        rank = jax.lax.axis_index(axis_name)
        # Full local x global matrix; positives only on the local diagonal.
        logits = logit_scale * image_features @ all_txt.T + logit_bias
        labels = -jnp.ones_like(logits)
        rows = jnp.arange(b)
        labels = labels.at[rows, rank * b + rows].set(1.0)
        loss = -jnp.sum(jax.nn.log_sigmoid(labels * logits.astype(jnp.float32))) / b
        return {"loss": loss, "contrastive_loss": loss}

    if impl == "bidir":
        # Two simultaneous rings halve the number of steps (reference :383-414).
        txt_left = txt_right = text_features

        def body(i, carry):
            loss, txt_left, txt_right = carry
            recv_r, recv_l = neighbour_exchange_bidir(txt_left, txt_right, axis_name)
            loss = loss + sigmoid_pair_loss(
                image_features, recv_r, logit_scale, logit_bias, negative_only=True
            )
            loss = loss + sigmoid_pair_loss(
                image_features, recv_l, logit_scale, logit_bias, negative_only=True
            )
            # Streams keep their direction: the chunk received from the right
            # continues moving left, and vice versa (reference loss.py:389).
            return loss, recv_r, recv_l

        steps = (world - 1) // 2
        loss, txt_left, txt_right = jax.lax.fori_loop(
            0, steps, body, (loss, txt_left, txt_right)
        )
        if world % 2 == 0:
            extra = neighbour_exchange(txt_right, axis_name, shift=1)
            loss = loss + sigmoid_pair_loss(
                image_features, extra, logit_scale, logit_bias, negative_only=True
            )
        return {"loss": loss, "contrastive_loss": loss}

    # 'shift': single-direction ring (reference :416-420).
    def body(i, carry):
        loss, txt = carry
        txt = neighbour_exchange(txt, axis_name, shift=1)
        loss = loss + sigmoid_pair_loss(
            image_features, txt, logit_scale, logit_bias, negative_only=True
        )
        return loss, txt

    loss, _ = jax.lax.fori_loop(0, world - 1, body, (loss, text_features))
    return {"loss": loss, "contrastive_loss": loss}


def coca_loss(
    image_features: jax.Array,
    text_features: jax.Array,
    caption_logits: jax.Array,
    caption_labels: jax.Array,
    logit_scale: jax.Array,
    *,
    caption_loss_weight: float = 2.0,
    clip_loss_weight: float = 1.0,
    pad_id: int = 0,
    axis_name: Optional[str] = None,
    gather_with_grad: bool = True,
) -> dict:
    """Contrastive + captioning CE, pad ignored (reference CoCaLoss :142-184)."""
    contrastive = clip_loss(
        image_features,
        text_features,
        logit_scale,
        axis_name=axis_name,
        gather_with_grad=gather_with_grad,
    )["loss"] * clip_loss_weight

    logp = jax.nn.log_softmax(caption_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, caption_labels[..., None], axis=-1)[..., 0]
    valid = (caption_labels != pad_id).astype(jnp.float32)
    caption = caption_loss_weight * jnp.sum(nll * valid) / jnp.clip(jnp.sum(valid), min=1.0)
    return {
        "loss": contrastive + caption,
        "contrastive_loss": contrastive,
        "caption_loss": caption,
    }


def distill_clip_loss(
    image_features: jax.Array,
    text_features: jax.Array,
    logit_scale: jax.Array,
    dist_image_features: jax.Array,
    dist_text_features: jax.Array,
    dist_logit_scale: jax.Array,
    *,
    axis_name: Optional[str] = None,
    gather_with_grad: bool = True,
    constrain=None,
) -> dict:
    """ClipLoss + teacher->student soft CE both directions
    (reference DistillClipLoss :187-223)."""
    logits_i, logits_t = _pair_logits(
        image_features, text_features, logit_scale, axis_name, gather_with_grad, constrain
    )
    t_logits_i, t_logits_t = _pair_logits(
        dist_image_features, dist_text_features, dist_logit_scale, axis_name, True
    )

    offset = _rank_offset(axis_name, image_features.shape[0])
    contrastive = (
        arange_cross_entropy(logits_i, offset) + arange_cross_entropy(logits_t, offset)
    ) / 2.0

    def soft_ce(student, teacher):
        t = jax.nn.softmax(teacher.astype(jnp.float32), axis=-1)
        s = jax.nn.log_softmax(student.astype(jnp.float32), axis=-1)
        return -jnp.mean(jnp.sum(t * s, axis=-1))

    distill = (soft_ce(logits_i, t_logits_i) + soft_ce(logits_t, t_logits_t)) / 2.0
    return {
        "loss": contrastive + distill,
        "contrastive_loss": contrastive,
        "distill_loss": distill,
    }
