"""Streaming multipositive contrastive loss (no N x N logits in HBM).

At 32k global batch the reference's WB x WB logit matrix is ~4 GB in fp32
(SURVEY.md §7 "hard parts"); this computes the exact same SupCon Eq. (2)
value with flash-attention-style online log-sum-exp over column chunks of
the negative set: per row it keeps only (running max, running sumexp,
positive dot-sum, positive count) — O(B x chunk) memory.

The positive-term sum needs no rescaling (it is linear in the logits), so a
single pass suffices. `jax.checkpoint` on the scan body keeps the backward
pass O(B x chunk) too (chunks are recomputed, not stored).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "chunked_multipositive_loss",
    "chunked_multipositive_clip_loss",
    "chunked_caption_xent",
    "coca_loss_chunked",
]

_EPS = 1e-12


def chunked_multipositive_loss(
    queries: jax.Array,
    keys: jax.Array,
    labels_q: jax.Array,
    labels_k: jax.Array,
    logit_scale: jax.Array,
    *,
    chunk_size: int = 1024,
    exclude_diagonal_offset: Optional[jax.Array] = None,
) -> jax.Array:
    """SupCon Eq. (2) over `scale * queries @ keys.T` without materializing it.

    Matches `losses.functional.multi_positive_cross_entropy_loss` bit-for-all
    practical purposes (same eps, same positive normalization; the row max is
    the true max so the stabilized sums agree to float rounding).

    `exclude_diagonal_offset`: when set (vision-only SupCon), position
    (i, offset + i) is removed from the positive set (reference
    loss copy.py:889).
    """
    n_q, d = queries.shape
    n_k = keys.shape[0]
    assert n_k % chunk_size == 0 or n_k < chunk_size, (
        f"keys ({n_k}) must tile by chunk_size ({chunk_size})"
    )
    chunk_size = min(chunk_size, n_k)
    n_chunks = n_k // chunk_size

    keys_c = keys.reshape(n_chunks, chunk_size, d)
    labels_c = labels_k.reshape(n_chunks, chunk_size)
    scale = logit_scale.astype(jnp.float32)

    def body(carry, chunk):
        m, s, pos_sum, pos_cnt = carry
        k_blk, lbl_blk, blk_idx = chunk
        z = scale * (queries @ k_blk.T).astype(jnp.float32)  # [Nq, C]
        pos = (labels_q[:, None] == lbl_blk[None, :]).astype(jnp.float32)
        if exclude_diagonal_offset is not None:
            rows = jnp.arange(n_q)
            cols = rows + exclude_diagonal_offset - blk_idx * chunk_size
            in_blk = (cols >= 0) & (cols < chunk_size)
            pos = jnp.where(
                in_blk[:, None]
                & (jnp.arange(chunk_size)[None, :] == jnp.clip(cols, 0, chunk_size - 1)[:, None]),
                0.0,
                pos,
            )

        blk_max = jnp.max(z, axis=1)
        new_m = jnp.maximum(m, blk_max)
        s = s * jnp.exp(m - new_m) + jnp.sum(jnp.exp(z - new_m[:, None]), axis=1)
        pos_sum = pos_sum + jnp.sum(pos * z, axis=1)
        pos_cnt = pos_cnt + jnp.sum(pos, axis=1)
        return (new_m, s, pos_sum, pos_cnt), None

    # Derive the init carry from `queries` so it inherits the same varying
    # mesh axes under shard_map (a plain jnp.zeros would be "unvarying" and
    # trip scan's carry type check).
    zeros = jnp.zeros_like(queries[:, 0], dtype=jnp.float32)
    init = (zeros - jnp.inf, zeros, zeros, zeros)
    (m, s, pos_sum, pos_cnt), _ = jax.lax.scan(
        jax.checkpoint(body),
        init,
        (keys_c, labels_c, jnp.arange(n_chunks)),
    )

    # No detach needed: in `-(pos_sum - P*m)/P + log(sum exp(z - m))` the
    # dm/dz terms cancel analytically, so AD yields the exact softmax
    # gradient (the reference's `.detach()` is only a stabilization detail).
    log_denom = jnp.log(s + _EPS)
    num_pos = jnp.clip(pos_cnt, min=1.0)
    per_sample = -(pos_sum - num_pos * m) / num_pos + log_denom
    # rows with zero positives contribute -0 + log_denom... reference gives
    # exactly log_denom there too (pos sums are 0); keep identical.
    return jnp.mean(per_sample)


def chunked_multipositive_clip_loss(
    image_features: jax.Array,
    text_features: jax.Array,
    labels: jax.Array,
    logit_scale: jax.Array,
    *,
    delta: float = 0.5,
    chunk_size: int = 1024,
    axis_name: Optional[str] = None,
    gather_with_grad: bool = True,
    constrain=None,
) -> dict:
    """Drop-in `multipositive_clip_loss` with streaming negatives.

    Same signature/result as `losses.multipositive_clip_loss`; use inside
    shard_map at large world size (keys = the gathered global features).
    """
    from ..losses.gather import gather_features

    all_img = gather_features(image_features, axis_name, gather_with_grad=gather_with_grad)
    all_txt = gather_features(text_features, axis_name, gather_with_grad=gather_with_grad)
    all_labels = (
        gather_features(labels, axis_name, gather_with_grad=True) if axis_name else labels
    )

    loss_img = chunked_multipositive_loss(
        image_features, all_txt, labels, all_labels, logit_scale, chunk_size=chunk_size
    )
    loss_txt = chunked_multipositive_loss(
        text_features, all_img, labels, all_labels, logit_scale, chunk_size=chunk_size
    )
    loss = delta * loss_img + (1.0 - delta) * loss_txt
    return {
        "loss": loss,
        "multi_contrastive_loss": loss,
        "image_to_text_loss": loss_img,
        "text_to_image_loss": loss_txt,
    }


def chunked_caption_xent(
    hidden: jax.Array,
    proj: jax.Array,
    labels: jax.Array,
    *,
    pad_id: int = 0,
    chunk_size: int = 16,
) -> jax.Array:
    """Captioning CE without materializing the [B, T, vocab] logits.

    The dense path (`losses.contrastive.coca_loss`) holds the decoder's full
    vocab projection plus two fp32 [B, T, V] softmax intermediates — ~6 GB at
    B=128/T=75/V=49408, which OOMs the 16G chip. This streams `hidden @ proj`
    per sequence chunk inside a rematerialized `lax.scan`: live memory is
    O(B x chunk x V) and the backward recomputes each chunk's logits instead
    of storing them. Exact same value as the dense fp32-log-softmax CE with
    pad positions ignored (reference CoCaLoss, loss.py:142-184).
    """
    b, t, d = hidden.shape
    n_chunks = -(-t // chunk_size)
    pad = n_chunks * chunk_size - t
    if pad:
        # padded positions get pad_id labels -> masked out of the CE
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        labels = jnp.pad(labels, ((0, 0), (0, pad)), constant_values=pad_id)

    h_c = hidden.reshape(b, n_chunks, chunk_size, d).transpose(1, 0, 2, 3)
    y_c = labels.reshape(b, n_chunks, chunk_size).transpose(1, 0, 2)
    proj_c = proj.astype(hidden.dtype)

    def body(carry, chunk):
        nll_sum, cnt = carry
        h, y = chunk  # [B, C, D], [B, C]
        z = (h @ proj_c).astype(jnp.float32)  # [B, C, V]
        # NLL via logsumexp - z[label]: only `z` is ever [B, C, V]-live.
        # (log_softmax would materialize a SECOND fp32 [B, C, V] for logp —
        # 400 MB extra at B=128/C=16/V=49408, the b128 OOM margin.)
        lse = jax.nn.logsumexp(z, axis=-1)
        zy = jnp.take_along_axis(z, y[..., None], axis=-1)[..., 0]
        nll = lse - zy
        valid = (y != pad_id).astype(jnp.float32)
        return (nll_sum + jnp.sum(nll * valid), cnt + jnp.sum(valid)), None

    init = (jnp.float32(0.0), jnp.float32(0.0))
    (nll_sum, cnt), _ = jax.lax.scan(jax.checkpoint(body), init, (h_c, y_c))
    return nll_sum / jnp.clip(cnt, min=1.0)


def coca_loss_chunked(
    image_features: jax.Array,
    text_features: jax.Array,
    caption_hidden: jax.Array,
    caption_proj: jax.Array,
    caption_labels: jax.Array,
    logit_scale: jax.Array,
    *,
    caption_loss_weight: float = 2.0,
    clip_loss_weight: float = 1.0,
    pad_id: int = 0,
    chunk_size: int = 16,
    axis_name: Optional[str] = None,
    gather_with_grad: bool = True,
) -> dict:
    """`coca_loss` with the captioning CE streamed per sequence chunk.

    Consumes the decoder's pre-projection hidden states + projection matrix
    (CoCa emits both; XLA DCE removes the unused dense logits), so the
    [B, T, vocab] tensor never exists. Value matches
    `losses.contrastive.coca_loss` to float rounding.
    """
    from ..losses.contrastive import clip_loss

    contrastive = clip_loss(
        image_features,
        text_features,
        logit_scale,
        axis_name=axis_name,
        gather_with_grad=gather_with_grad,
    )["loss"] * clip_loss_weight

    caption = caption_loss_weight * chunked_caption_xent(
        caption_hidden, caption_proj, caption_labels,
        pad_id=pad_id, chunk_size=chunk_size,
    )
    return {
        "loss": contrastive + caption,
        "contrastive_loss": contrastive,
        "caption_loss": caption,
    }
