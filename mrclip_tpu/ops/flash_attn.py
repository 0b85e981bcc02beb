"""Flash attention for ViT/text sequences on TPU (Pallas).

Why: XLA's dot-product-attention materializes the [B, H, N, N] score matrix
in fp32 through HBM (softmax fwd writes it, the AV matmul reads it, the
backward pass reads it again). At ViT-B/16 shapes ([80, 12, 197, 197] ~ 149MB
per layer per direction) this is pure HBM-bandwidth burn — the round-1 trace
showed attention at 41% of device time vs its ~16% FLOP share. The Pallas
flash kernel keeps score tiles in VMEM and never writes them out.

This wraps `jax.experimental.pallas.ops.tpu.flash_attention` for arbitrary
sequence lengths: ViT's 197 (grid 14x14 + CLS) and text's 98 are padded to
the 128-lane boundary, with padded KV positions masked via segment ids
(padded *query* rows attend to real keys and are sliced off — their outputs
and cotangents never reach the caller, so gradients are exact).

Single-device only: pallas_call is opaque to GSPMD, so the multi-chip path
keeps XLA attention (sharding rules apply there); select via
`attn_impl='flash'` (bench/serving) vs the default 'xla'.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = ["flash_attention_unpadded", "flash_available"]

_LANE = 128


def flash_available() -> bool:
    try:
        from jax.experimental.pallas.ops.tpu import flash_attention  # noqa: F401
        return True
    except ImportError:  # pragma: no cover
        return False


def flash_attention_unpadded(
    q: jax.Array, k: jax.Array, v: jax.Array, *, is_causal: bool = False,
    save_residuals: bool = False,
) -> jax.Array:
    """Fused attention; `q`,`k`,`v`: [B, N, H, D] -> [B, N, H, D].

    Matches `jax.nn.dot_product_attention(q, k, v, is_causal=...)` (scale
    1/sqrt(D), fp32 softmax) with O(N) memory instead of O(N^2).

    By default the call is wrapped in `jax.checkpoint`: the kernel's custom
    vjp would otherwise stash padded q/k/v copies + output + logsumexp as
    residuals (~1.2 GB at ViT-B/16 b80 — enough to OOM a 16G chip that the
    XLA path fits on). Recomputing the flash forward in the backward costs
    ~1 extra fwd kernel per layer and keeps only the unpadded inputs live.
    Set `save_residuals=True` to trade that FLOP back for memory.
    """
    if not save_residuals:
        fn = jax.checkpoint(
            lambda q_, k_, v_: flash_attention_unpadded(
                q_, k_, v_, is_causal=is_causal, save_residuals=True
            )
        )
        return fn(q, k, v)
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, n_q, h, d = q.shape
    n_k = k.shape[1]
    pad_q = -n_q % _LANE
    pad_k = -n_k % _LANE
    np_q, np_k = n_q + pad_q, n_k + pad_k

    def to_bhnd(t, pad):
        if pad:
            t = jnp.pad(t, ((0, 0), (0, pad), (0, 0), (0, 0)))
        return t.transpose(0, 2, 1, 3)

    qp, kp, vp = to_bhnd(q, pad_q), to_bhnd(k, pad_k), to_bhnd(v, pad_k)

    segment_ids = None
    if pad_k:
        # Real tokens = segment 1. Padded KV columns get segment 0 so no real
        # query attends to them. Padded query ROWS keep segment 1 (attending
        # real keys) so their softmax is well-defined; they are sliced off.
        q_seg = jnp.ones((b, np_q), jnp.int32)
        kv_seg = jnp.broadcast_to(
            (jnp.arange(np_k) < n_k).astype(jnp.int32), (b, np_k)
        )
        segment_ids = SegmentIds(q=q_seg, kv=kv_seg)

    # Largest multiple of 128 that DIVIDES the padded length: the kernel
    # requires seq_len % block == 0, so min(256, np) breaks at e.g. 384
    # (ViT-L-14's 257 tokens pad to 384) or 640 (ViT-L-14-336).
    def pick_block(n):
        for cand in (256, 128):
            if n % cand == 0:
                return cand
        return n  # n < 128: single block

    blk_q = pick_block(np_q)
    blk_k = pick_block(np_k)
    block_sizes = BlockSizes(
        block_q=blk_q, block_k_major=blk_k, block_k=blk_k, block_b=1,
        block_q_major_dkv=blk_q, block_k_major_dkv=blk_k,
        block_k_dkv=blk_k, block_q_dkv=blk_q,
        block_k_major_dq=blk_k, block_k_dq=blk_k, block_q_dq=blk_q,
    )
    out = flash_attention(
        qp, kp, vp,
        segment_ids=segment_ids,
        causal=is_causal,
        sm_scale=1.0 / math.sqrt(d),
        block_sizes=block_sizes,
    )
    out = out.transpose(0, 2, 1, 3)
    return out[:, :n_q] if pad_q else out
