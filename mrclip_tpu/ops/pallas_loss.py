"""Pallas TPU kernel: fused multipositive contrastive loss.

The hot op of MR-CLIP training at scale: `scale * Q @ K.T` plus SupCon
Eq. (2) statistics over the full negative set. The XLA path (`fused_loss.py`)
already streams chunks; this kernel goes further and keeps each logit tile
entirely in VMEM — the MXU computes the tile, the VPU folds it into online
log-sum-exp + positive-sum accumulators, and only O(N) row statistics ever
touch HBM. Backward is a second pair of kernels recomputing tiles and
contracting the softmax-minus-positives coefficient against K (for dQ) and
Q (for dK).

Forward per row i: m_i = max_j z_ij, s_i = sum_j exp(z_ij - m_i),
pos_sum_i = sum_{j in P(i)} z_ij, P_i = |P(i)|;
loss = mean_i [ -(pos_sum_i - P_i m_i)/P_i + log s_i ].

Grid layout: (row-blocks, key-blocks) with the key dimension innermost —
TPU grids execute sequentially, so VMEM accumulators persist across the
inner key sweep and reset when the row block changes (pallas_guide:
Grid/BlockSpec + double-buffered pipelining comes for free from BlockSpecs).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_multipositive_loss"]

_NEG_INF = -1e30


def _fwd_kernel(
    scale_ref, q_ref, k_ref, lq_ref, lk_ref,
    m_ref, s_ref, pos_sum_ref, pos_cnt_ref,
    acc_m, acc_s, acc_pos, acc_cnt,
):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_m[:] = jnp.full_like(acc_m, _NEG_INF)
        acc_s[:] = jnp.zeros_like(acc_s)
        acc_pos[:] = jnp.zeros_like(acc_pos)
        acc_cnt[:] = jnp.zeros_like(acc_cnt)

    scale = scale_ref[0]
    z = scale * jnp.dot(
        q_ref[:], k_ref[:].T, preferred_element_type=jnp.float32
    )  # [TQ, TK]
    pos = (lq_ref[:] == lk_ref[:].reshape(1, -1)).astype(jnp.float32)

    m_old = acc_m[:]
    blk_max = jnp.max(z, axis=1, keepdims=True)
    m_new = jnp.maximum(m_old, blk_max)
    acc_s[:] = acc_s[:] * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.exp(z - m_new), axis=1, keepdims=True
    )
    acc_m[:] = m_new
    acc_pos[:] = acc_pos[:] + jnp.sum(pos * z, axis=1, keepdims=True)
    acc_cnt[:] = acc_cnt[:] + jnp.sum(pos, axis=1, keepdims=True)

    @pl.when(j == nj - 1)
    def _():
        m_ref[:] = acc_m[:]
        s_ref[:] = acc_s[:]
        pos_sum_ref[:] = acc_pos[:]
        pos_cnt_ref[:] = acc_cnt[:]


def _grad_q_kernel(
    scale_ref, q_ref, k_ref, lq_ref, lk_ref, m_ref, s_ref, cnt_ref, gbar_ref,
    dq_ref, ds_ref, acc, acc_ds,
):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        acc_ds[:] = jnp.zeros_like(acc_ds)

    scale = scale_ref[0]
    qk = jnp.dot(q_ref[:], k_ref[:].T, preferred_element_type=jnp.float32)
    z = scale * qk
    pos = (lq_ref[:] == lk_ref[:].reshape(1, -1)).astype(jnp.float32)
    p = jnp.exp(z - m_ref[:]) / s_ref[:]
    # dL_i/dz_ij (with the mean over rows folded into gbar = g / N_q)
    coeff = (p - pos / cnt_ref[:]) * gbar_ref[0] * scale
    acc[:] = acc[:] + jnp.dot(coeff, k_ref[:], preferred_element_type=jnp.float32)
    # dL/dscale contribution: sum_j dL/dz_ij * qk_ij (rowwise; coeff carries
    # one extra factor of scale from the z->q chain, so divide it back out)
    acc_ds[:] = acc_ds[:] + jnp.sum(coeff * qk, axis=1, keepdims=True) / scale

    @pl.when(j == nj - 1)
    def _():
        dq_ref[:] = acc[:]
        ds_ref[:] = acc_ds[:]


def _grad_k_kernel(
    scale_ref, q_ref, k_ref, lq_ref, lk_ref, m_ref, s_ref, cnt_ref, gbar_ref,
    dk_ref, acc,
):
    i = pl.program_id(1)
    ni = pl.num_programs(1)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    scale = scale_ref[0]
    z = scale * jnp.dot(q_ref[:], k_ref[:].T, preferred_element_type=jnp.float32)
    pos = (lq_ref[:] == lk_ref[:].reshape(1, -1)).astype(jnp.float32)
    p = jnp.exp(z - m_ref[:]) / s_ref[:]
    coeff = (p - pos / cnt_ref[:]) * gbar_ref[0] * scale  # [TQ, TK]
    acc[:] = acc[:] + jnp.dot(coeff.T, q_ref[:], preferred_element_type=jnp.float32)

    @pl.when(i == ni - 1)
    def _():
        dk_ref[:] = acc[:]


def _round_up(x, m):
    return -(-x // m) * m


def _fit_block(n: int, want: int) -> int:
    """Largest divisor of n that is <= want.

    The grid floor-divides, so a non-dividing block would silently drop the
    tail rows/keys (and leave output rows unwritten -> NaN). Shrinking to a
    divisor keeps every shape correct; power-of-two batches keep the full
    requested block."""
    b = min(want, n)
    while n % b:
        b -= 1
    if b < 8 and n > 8:
        import warnings

        warnings.warn(
            f"pallas loss block collapsed to {b} for size {n} (no divisor "
            f"near {want}); the kernel will run a tiny-block grid — prefer "
            "a batch size with a divisor >= 8, or the chunked/dense loss",
            stacklevel=3,
        )
    return b


def _stats(
    q, k, labels_q, labels_k, scale, block_q, block_k, interpret
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    n_q, d = q.shape
    n_k = k.shape[0]
    assert n_q % block_q == 0 and n_k % block_k == 0, (n_q, block_q, n_k, block_k)
    grid = (n_q // block_q, n_k // block_k)

    kernel = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scale
            pl.BlockSpec((block_q, d), lambda i, j: (i, 0)),
            pl.BlockSpec((block_k, d), lambda i, j: (j, 0)),
            pl.BlockSpec((block_q, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((block_k, 1), lambda i, j: (j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_q, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((block_q, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((block_q, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((block_q, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[jax.ShapeDtypeStruct((n_q, 1), jnp.float32)] * 4,
        scratch_shapes=[pltpu.VMEM((block_q, 1), jnp.float32)] * 4,
        interpret=interpret,
    )
    return kernel(
        jnp.asarray([scale], jnp.float32),
        q.astype(jnp.float32),
        k.astype(jnp.float32),
        labels_q.reshape(-1, 1).astype(jnp.int32),
        labels_k.reshape(-1, 1).astype(jnp.int32),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def pallas_multipositive_loss(
    q: jax.Array,
    k: jax.Array,
    labels_q: jax.Array,
    labels_k: jax.Array,
    logit_scale: jax.Array,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """SupCon Eq. (2) over `scale * q @ k.T` as one fused Pallas program.

    Block sizes auto-shrink to divisors of (n_q, n_k) so any shape is
    exact; batches with no divisor near the requested block (e.g. prime)
    degrade to tiny grid steps — see `_fit_block`. Matches
    `losses.functional.multi_positive_cross_entropy_loss` numerics.
    """
    loss, _ = _fwd(q, k, labels_q, labels_k, logit_scale, block_q, block_k, interpret)
    return loss


def _fwd(q, k, labels_q, labels_k, logit_scale, block_q, block_k, interpret):
    block_q = _fit_block(q.shape[0], block_q)
    block_k = _fit_block(k.shape[0], block_k)
    m, s, pos_sum, pos_cnt = _stats(
        q, k, labels_q, labels_k, logit_scale, block_q, block_k, interpret
    )
    m, s = m[:, 0], s[:, 0]
    pos_sum, pos_cnt = pos_sum[:, 0], pos_cnt[:, 0]
    cnt = jnp.clip(pos_cnt, min=1.0)
    per_sample = -(pos_sum - cnt * m) / cnt + jnp.log(s + 1e-12)
    loss = jnp.mean(per_sample)
    residuals = (q, k, labels_q, labels_k, logit_scale, m, s, cnt)
    return loss, residuals


def _bwd(block_q, block_k, interpret, residuals, g):
    q, k, labels_q, labels_k, logit_scale, m, s, cnt = residuals
    n_q, d = q.shape
    n_k = k.shape[0]
    bq = _fit_block(n_q, block_q)
    bk = _fit_block(n_k, block_k)
    gbar = jnp.asarray([g / n_q], jnp.float32)
    scale_arr = jnp.asarray([logit_scale], jnp.float32)
    common = (
        scale_arr,
        q.astype(jnp.float32),
        k.astype(jnp.float32),
        labels_q.reshape(-1, 1).astype(jnp.int32),
        labels_k.reshape(-1, 1).astype(jnp.int32),
        m.reshape(-1, 1),
        s.reshape(-1, 1),
        cnt.reshape(-1, 1),
        gbar,
    )

    row_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # scale
    ]

    dq, ds_rows = pl.pallas_call(
        _grad_q_kernel,
        grid=(n_q // bq, n_k // bk),
        in_specs=row_specs
        + [
            pl.BlockSpec((bq, d), lambda i, j: (i, 0)),
            pl.BlockSpec((bk, d), lambda i, j: (j, 0)),
            pl.BlockSpec((bq, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((bk, 1), lambda i, j: (j, 0)),
            pl.BlockSpec((bq, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((bq, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((bq, 1), lambda i, j: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # gbar
        ],
        out_specs=(
            pl.BlockSpec((bq, d), lambda i, j: (i, 0)),
            pl.BlockSpec((bq, 1), lambda i, j: (i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_q, d), jnp.float32),
            jax.ShapeDtypeStruct((n_q, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
        ],
        interpret=interpret,
    )(*common)

    dk = pl.pallas_call(
        _grad_k_kernel,
        grid=(n_k // bk, n_q // bq),
        in_specs=row_specs
        + [
            pl.BlockSpec((bq, d), lambda j, i: (i, 0)),
            pl.BlockSpec((bk, d), lambda j, i: (j, 0)),
            pl.BlockSpec((bq, 1), lambda j, i: (i, 0)),
            pl.BlockSpec((bk, 1), lambda j, i: (j, 0)),
            pl.BlockSpec((bq, 1), lambda j, i: (i, 0)),
            pl.BlockSpec((bq, 1), lambda j, i: (i, 0)),
            pl.BlockSpec((bq, 1), lambda j, i: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bk, d), lambda j, i: (j, 0)),
        out_shape=jax.ShapeDtypeStruct((n_k, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bk, d), jnp.float32)],
        interpret=interpret,
    )(*common)

    # logit_scale cotangent: dL/dscale = sum_ij dL/dz_ij * (q_i . k_j)
    # (gbar — the g/N_q factor — is already folded into ds_rows)
    dscale = jnp.sum(ds_rows).astype(jnp.asarray(logit_scale).dtype)
    dscale = dscale.reshape(jnp.shape(logit_scale))
    return dq.astype(q.dtype), dk.astype(k.dtype), None, None, dscale


pallas_multipositive_loss.defvjp(_fwd, _bwd)


def pallas_multipositive_clip_loss(
    image_features: jax.Array,
    text_features: jax.Array,
    labels: jax.Array,
    logit_scale: jax.Array,
    *,
    delta: float = 0.5,
    block_q: int = 256,
    block_k: int = 512,
    axis_name=None,
    gather_with_grad: bool = True,
    constrain=None,
) -> dict:
    """Drop-in `multipositive_clip_loss` backed by the fused Pallas kernel.

    Batch sizes must tile by the block sizes (blocks shrink automatically to
    the batch). Interpret mode engages off-TPU so tests/CPU runs work.
    """
    if axis_name is not None:
        from ..losses.gather import gather_features

        all_img = gather_features(image_features, axis_name, gather_with_grad=gather_with_grad)
        all_txt = gather_features(text_features, axis_name, gather_with_grad=gather_with_grad)
        all_labels = gather_features(labels, axis_name, gather_with_grad=True)
    else:
        all_img, all_txt, all_labels = image_features, text_features, labels

    interpret = jax.default_backend() != "tpu"
    bq = min(block_q, image_features.shape[0])
    bk = min(block_k, all_txt.shape[0])
    loss_img = pallas_multipositive_loss(
        image_features, all_txt, labels, all_labels, logit_scale, bq, bk, interpret
    )
    loss_txt = pallas_multipositive_loss(
        text_features, all_img, labels, all_labels, logit_scale, bq, bk, interpret
    )
    loss = delta * loss_img + (1.0 - delta) * loss_txt
    return {
        "loss": loss,
        "multi_contrastive_loss": loss,
        "image_to_text_loss": loss_img,
        "text_to_image_loss": loss_txt,
    }
