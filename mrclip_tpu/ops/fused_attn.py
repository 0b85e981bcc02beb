"""Single-tile fused attention for ViT/text sequence lengths (Pallas TPU).

Why another attention kernel: the r2/r3 traces show XLA attention is the
largest single cost in the ViT-B/16 train step (42.6% of device time) and it
is MEMORY-bound at ~100% HBM bandwidth — every fused op is at the roofline
*for its bytes*, and the bytes are the two [B, H, N, N] score tensors
(logits + probs) written in the forward and re-read in the backward. The
attention matmuls themselves are only ~4% of the step's FLOPs. The stock
loop-based Pallas flash attention lost 2x at these shapes (r2: 377 pairs/s vs
721 — per-(batch, head) grid programs of tiny work, fp32 compute, plus a
jax.checkpoint forward recompute to avoid residual OOM).

This kernel exploits that CLIP sequences are TINY (ViT-B/16: 197 tokens,
text: 98): the ENTIRE padded sequence fits in VMEM, so there is no KV loop
at all — one program computes softmax(QK^T)V for G heads outright, and the
[Np, Np] scores live and die in VMEM. The custom VJP stores only
(q, k, v, o, lse) — O(N*D) residuals, ~4x the layer's activations instead of
the XLA path's 2x [B,H,N,N] score tensors — and the backward is a second
single-tile kernel that recomputes P from lse (one extra QK^T matmul, ~0.3%
of step FLOPs) and produces dq/dk/dv in one pass.

HBM traffic per layer direction: read q,k,v + write o (+lse) ~ 110 MB at
ViT-B/16 b88 vs ~434 MB for the XLA path's score round-trips.

`attn_impl='fused'` (the [B*H, Np, D] variant) is single-device only:
pallas_call is opaque to GSPMD and the flattened batch*head dim has no
clean sharding story. `attn_impl='fusedp'` IS mesh-capable: attention is
embarrassingly parallel over (batch, heads), so the packed kernels are
wrapped in `jax.experimental.custom_partitioning` with an einsum sharding
rule `b n (h d) ...` — the partitioner runs the kernel per shard with the
local batch slice and local head count (batch over data/fsdp axes, heads
over the tensor-parallel axis; sequence and head_dim are replicated).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

try:  # pragma: no cover - exercised on TPU/interpret paths
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except ImportError:  # pragma: no cover
    pltpu = None
    _VMEM = None

__all__ = ["fused_attention", "fused_attention_packed"]

_LANE = 128
_NEG = -1e30


def _pad_to(n: int) -> int:
    return -n % _LANE + n


def _pick_group(bh: int, np_q: int, np_k: int, budget: int) -> int:
    """Mosaic-legal group size G dividing bh, BEST-EFFORT under the VMEM
    budget (G * Npq * Npk * 4B): for multiple-of-8 bh the floor is g=8 even
    when that exceeds the budget — at CLIP sequence lengths (Np <= 384) the
    8-group scores block tops out at ~4.7 MB, which fits, and a smaller
    group would be Mosaic-illegal anyway.

    G is constrained to multiples of 8 (or bh itself): the [bh, Np_q] lse
    output is 2-D, and Mosaic requires a 2-D block's second-to-last dim to
    be divisible by 8 or equal the array dim — g=4 at bh=12 (batch-1 init
    trace, 12 heads) was rejected with "block shape (4, 256) ... array
    shape (12, 256)" (r4 queue10 log). `fused_attention` pads bh up to a
    multiple of 8 before calling, so the g == bh whole-array fallback
    (unbounded VMEM for large odd bh, e.g. bh=36 at Np=256 is ~9.4 MB)
    is only reachable for bh < 8."""
    for g in (16, 8):
        if bh % g == 0 and g * np_q * np_k * 4 <= budget:
            return g
    if bh % 8 == 0:
        return 8  # over budget but legal — beats a whole-array block
    return bh


def _mask(np_q: int, np_k: int, n_k: int, causal: bool, dtype):
    """[Np_q, Np_k] additive mask: padded kv columns (and the causal upper
    triangle) get -1e30. Padded *query* rows stay unmasked — their outputs
    are sliced off and their cotangents arrive as zeros, so they contribute
    nothing to dk/dv."""
    col = jax.lax.broadcasted_iota(jnp.int32, (np_q, np_k), 1)
    bad = col >= n_k
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (np_q, np_k), 0)
        bad = jnp.logical_or(bad, col > row)
    return jnp.where(bad, jnp.asarray(_NEG, dtype), jnp.asarray(0, dtype))


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, n_k, causal):
    q, k, v = q_ref[:], k_ref[:], v_ref[:]  # [G, Npq|Npk, D]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale  # [G, Npq, Npk] fp32, never leaves VMEM
    s = s + _mask(s.shape[1], s.shape[2], n_k, causal, jnp.float32)[None]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    lse_ref[:] = (m + jnp.log(l))[..., 0]
    pn = (p / l).astype(q.dtype)
    o = jax.lax.dot_general(
        pn, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    o_ref[:] = o.astype(q.dtype)


def _bwd_kernel(
    q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, dq_ref, dk_ref, dv_ref,
    *, scale, n_k, causal,
):
    q, k, v = q_ref[:], k_ref[:], v_ref[:]
    o, do = o_ref[:], do_ref[:]
    lse = lse_ref[:]  # [G, Npq]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale
    s = s + _mask(s.shape[1], s.shape[2], n_k, causal, jnp.float32)[None]
    p = jnp.exp(s - lse[..., None])  # rows already normalized
    pb = p.astype(q.dtype)
    # dv[g, nk, d] = sum_nq p[g, nq, nk] * do[g, nq, d]
    dv = jax.lax.dot_general(
        pb, do, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    # dp[g, nq, nk] = sum_d do[g, nq, d] * v[g, nk, d]
    dp = jax.lax.dot_general(
        do, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    ds = (p * (dp - delta[..., None]) * scale).astype(q.dtype)
    dq = jax.lax.dot_general(
        ds, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    # dk[g, nk, d] = sum_nq ds[g, nq, nk] * q[g, nq, d]
    dk = jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dq_ref[:] = dq.astype(q.dtype)
    dk_ref[:] = dk.astype(q.dtype)
    dv_ref[:] = dv.astype(q.dtype)


def _spec(g, n, d):
    return pl.BlockSpec((g, n, d), lambda i: (i, 0, 0), memory_space=_VMEM)


def _lse_spec(g, n):
    return pl.BlockSpec((g, n), lambda i: (i, 0), memory_space=_VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _core(qp, kp, vp, n_k, causal, interpret):
    o, _ = _core_fwd(qp, kp, vp, n_k, causal, interpret)
    return o


def _run_fwd(qp, kp, vp, n_k, causal, interpret):
    bh, np_q, d = qp.shape
    np_k = kp.shape[1]
    g = _pick_group(bh, np_q, np_k, 2 * 1024 * 1024)
    kern = functools.partial(
        _fwd_kernel, scale=1.0 / math.sqrt(d), n_k=n_k, causal=causal
    )
    o, lse = pl.pallas_call(
        kern,
        grid=(bh // g,),
        in_specs=[_spec(g, np_q, d), _spec(g, np_k, d), _spec(g, np_k, d)],
        out_specs=(_spec(g, np_q, d), _lse_spec(g, np_q)),
        out_shape=(
            jax.ShapeDtypeStruct((bh, np_q, d), qp.dtype),
            jax.ShapeDtypeStruct((bh, np_q), jnp.float32),
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return o, lse


def _core_fwd(qp, kp, vp, n_k, causal, interpret):
    o, lse = _run_fwd(qp, kp, vp, n_k, causal, interpret)
    return o, (qp, kp, vp, o, lse)


def _core_bwd(n_k, causal, interpret, res, do):
    qp, kp, vp, o, lse = res
    bh, np_q, d = qp.shape
    np_k = kp.shape[1]
    g = _pick_group(bh, np_q, np_k, 1024 * 1024)
    kern = functools.partial(
        _bwd_kernel, scale=1.0 / math.sqrt(d), n_k=n_k, causal=causal
    )
    dq, dk, dv = pl.pallas_call(
        kern,
        grid=(bh // g,),
        in_specs=[
            _spec(g, np_q, d), _spec(g, np_k, d), _spec(g, np_k, d),
            _spec(g, np_q, d), _spec(g, np_q, d), _lse_spec(g, np_q),
        ],
        out_specs=(_spec(g, np_q, d), _spec(g, np_k, d), _spec(g, np_k, d)),
        out_shape=(
            jax.ShapeDtypeStruct((bh, np_q, d), qp.dtype),
            jax.ShapeDtypeStruct((bh, np_k, d), qp.dtype),
            jax.ShapeDtypeStruct((bh, np_k, d), qp.dtype),
        ),
        interpret=interpret,
    )(qp, kp, vp, o, do.astype(qp.dtype), lse)
    return dq, dk, dv


_core.defvjp(_core_fwd, _core_bwd)


def _rot_matrix(d: int, dtype):
    """Constant [d, d] pair-swap matrix R with x @ R == rot(x), where
    rot(x)[2i] = -x[2i+1], rot(x)[2i+1] = x[2i] (the rotate-half of
    interleaved-pair rope). Realizing the pair swap as a tiny MXU matmul
    avoids lane shuffles inside the kernel; entries are 0/±1 so the product
    is exact in any dtype. Constant-folded by Mosaic."""
    i = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)
    plus = jnp.logical_and(i + 1 == j, j % 2 == 1)
    minus = jnp.logical_and(i - 1 == j, j % 2 == 0)
    return (plus.astype(jnp.float32) - minus.astype(jnp.float32)).astype(dtype)


def _rope_rotate(x, sin, cos, rmat):
    """y = x*cos + rot(x)*sin in fp32, back to x.dtype. x: [N, d]."""
    rot = jax.lax.dot_general(
        x, rmat, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    y = x.astype(jnp.float32) * cos + rot * sin
    return y.astype(x.dtype)


def _rope_unrotate_grad(g, sin, cos, rmat, dtype):
    """VJP of `_rope_rotate` w.r.t. x: dx = g*cos + (g*sin) @ R^T, and
    R^T = -R (R is antisymmetric), so dx = g*cos - (g*sin) @ R. g: fp32."""
    gs = (g * sin).astype(dtype)
    rot = jax.lax.dot_general(
        gs, rmat, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return g * cos - rot


# Head scheduling inside the packed kernels:
#   'loop'    — per-head python loop (12 small K=64 matmuls interleaved
#               with their softmax VPU chains).
#   'batched' — per-head lane slices copied once into a VMEM scratch
#               [H, N, D] (plain stores; an in-kernel
#               reshape(n, h, d).transpose would be a `tpu.reshape` Mosaic
#               rejects — "unsupported shape cast", q8 log 10:02), then
#               every stage is a single H-batched dot_general / vectorized
#               softmax over [H, N, Nk].
# The analytic per-op table (tools/mxu_table.py) shows the loop bwd kernel
# at ~16% MXU / ~30% HBM BW on EVA02/B-16 shapes — bound by neither
# roofline, i.e. serialization — so 'batched' trades the scratch copies
# for MXU ops the compiler can pipeline. On-chip A/B (r4 queue10, logs in
# tools/r4_bench.log) confirmed 'batched' wins everywhere measured:
# ViT-B-16 b88 950.4 vs 896.4 pairs/s (+6.0%, 62.0% MFU), EVA02-B-16 b64
# 816.7 vs 754.2 (+8.3%) — so 'batched' is the default; set
# MRCLIP_FUSEDP_HEADS=loop for the serialized per-head variant (numerics
# are identical: on-chip probe maxdiff 0.0, CPU parity test
# tests/test_fused_attn.py::test_batched_head_mode_matches_loop).
_HEAD_MODE_VAR = "MRCLIP_FUSEDP_HEADS"


def _head_mode() -> bool:
    return os.environ.get(_HEAD_MODE_VAR, "batched") == "batched"


# Where the bwd kernel's delta = rowsum(do * o) term comes from:
#   'kernel' (default) — o is a kernel operand and delta is reduced
#            in-VMEM (the r4 behavior).
#   'pre'    — computed OUTSIDE the kernel by XLA; the kernel drops the o
#            operand and the VPU reduction. MEASURED ON-CHIP AND LOST
#            (r5 queue3): ViT-B-16 b88 939.7 vs 957.6 (-1.9%), EVA02-B-16
#            b64 784.1 vs 816.7 (-4.0%). The hoped-for fusion into the
#            out_proj bwd does not materialize — XLA emits a separate
#            rowsum+[B,N,H]->[B,H,N] transpose fusion that re-reads do and
#            o from HBM, costing more than the kernel's o operand saved
#            (which rides the grid's double-buffered DMA pipeline anyway).
#            Kept as an env switch because the trade flips if a future
#            layer layout hands the kernel a pre-transposed delta for free.
_DELTA_MODE_VAR = "MRCLIP_FUSEDP_DELTA"


def _delta_outside() -> bool:
    return os.environ.get(_DELTA_MODE_VAR, "kernel") == "pre"


def _packed_fwd_kernel(*refs, heads, scale, causal, rope, batched=False):
    """Natural-layout variant: blocks are [1, N, H*D] slabs (no HBM-side
    transpose or pad — Mosaic masks the unaligned sequence edge). Heads are
    sliced on the lane dim in VMEM; one (batch,) grid program computes all
    heads of one sample.

    With `rope=True` an extra [N, 2*D] sin||cos table operand (identity
    rows for the CLS prefix) follows v, and q/k rotate IN VMEM before the
    score matmul — the rotated tensors never exist in HBM. Out-of-kernel
    rope costs 2 full q/k round-trips per layer per direction (pallas_call
    is opaque, so XLA must materialize the rotated q/k); EVA02's attention
    is byte-bound (profiles/r4_eva02: 75-80% HBM BW), making those bytes
    pure overhead."""
    if batched:
        if rope:
            (q_ref, k_ref, v_ref, r_ref, o_ref, lse_ref, q3, k3, v3) = refs
        else:
            (q_ref, k_ref, v_ref, o_ref, lse_ref, q3, k3, v3), r_ref = refs, None
    elif rope:
        q_ref, k_ref, v_ref, r_ref, o_ref, lse_ref = refs
    else:
        (q_ref, k_ref, v_ref, o_ref, lse_ref), r_ref = refs, None
    n, hd = q_ref.shape[1], q_ref.shape[2]
    d = hd // heads
    nk = k_ref.shape[1]
    mask = None
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (n, nk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (n, nk), 1)
        mask = jnp.where(col > row, jnp.asarray(_NEG, jnp.float32), 0.0)
    if r_ref is not None:
        sin = r_ref[:, :d].astype(jnp.float32)
        cos = r_ref[:, d:].astype(jnp.float32)
        rmat = _rot_matrix(d, q_ref.dtype)
    if batched:
        for h in range(heads):
            sl = slice(h * d, (h + 1) * d)
            qh, kh = q_ref[0, :, sl], k_ref[0, :, sl]
            if r_ref is not None:
                qh = _rope_rotate(qh, sin, cos, rmat)
                kh = _rope_rotate(kh, sin, cos, rmat)
            q3[h] = qh
            k3[h] = kh
            v3[h] = v_ref[0, :, sl]
        q, k, v = q3[:], k3[:], v3[:]  # [H, N|Nk, D]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale  # [H, N, Nk]
        if mask is not None:
            s = s + mask[None]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        lse_ref[0] = (m + jnp.log(l))[..., 0]
        o = jax.lax.dot_general(
            (p / l).astype(q.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [H, N, D]
        for h in range(heads):
            o_ref[0, :, h * d : (h + 1) * d] = o[h].astype(q.dtype)
        return
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        qh, kh, vh = q_ref[0, :, sl], k_ref[0, :, sl], v_ref[0, :, sl]
        if r_ref is not None:
            qh = _rope_rotate(qh, sin, cos, rmat)
            kh = _rope_rotate(kh, sin, cos, rmat)
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if mask is not None:
            s = s + mask
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        lse_ref[0, h, :] = (m + jnp.log(l))[:, 0]
        o_ref[0, :, sl] = jax.lax.dot_general(
            (p / l).astype(qh.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(qh.dtype)


def _packed_bwd_kernel(*refs, heads, scale, causal, rope, batched=False,
                       delta_pre=False):
    # `delta_pre`: the o operand slot instead carries the precomputed
    # [1, H, N] fp32 delta = rowsum(do * o) (see _DELTA_MODE_VAR), and the
    # o3 scratch is absent.
    if batched:
        if rope:
            if delta_pre:
                (q_ref, k_ref, v_ref, r_ref, o_ref, do_ref, lse_ref,
                 dq_ref, dk_ref, dv_ref, q3, k3, v3, do3) = refs
                o3 = None
            else:
                (q_ref, k_ref, v_ref, r_ref, o_ref, do_ref, lse_ref,
                 dq_ref, dk_ref, dv_ref, q3, k3, v3, o3, do3) = refs
        else:
            if delta_pre:
                (q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
                 dq_ref, dk_ref, dv_ref, q3, k3, v3, do3), r_ref = refs, None
                o3 = None
            else:
                (q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
                 dq_ref, dk_ref, dv_ref, q3, k3, v3, o3, do3), r_ref = refs, None
    elif rope:
        (q_ref, k_ref, v_ref, r_ref, o_ref, do_ref, lse_ref,
         dq_ref, dk_ref, dv_ref) = refs
    else:
        (q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
         dq_ref, dk_ref, dv_ref), r_ref = refs, None
    n, hd = q_ref.shape[1], q_ref.shape[2]
    d = hd // heads
    nk = k_ref.shape[1]
    mask = None
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (n, nk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (n, nk), 1)
        mask = jnp.where(col > row, jnp.asarray(_NEG, jnp.float32), 0.0)
    if r_ref is not None:
        sin = r_ref[:, :d].astype(jnp.float32)
        cos = r_ref[:, d:].astype(jnp.float32)
        rmat = _rot_matrix(d, q_ref.dtype)
    if batched:
        for h in range(heads):
            sl = slice(h * d, (h + 1) * d)
            qh, kh = q_ref[0, :, sl], k_ref[0, :, sl]
            if r_ref is not None:
                qh = _rope_rotate(qh, sin, cos, rmat)
                kh = _rope_rotate(kh, sin, cos, rmat)
            q3[h] = qh
            k3[h] = kh
            v3[h] = v_ref[0, :, sl]
            if o3 is not None:
                o3[h] = o_ref[0, :, sl]
            do3[h] = do_ref[0, :, sl]
        q, k, v = q3[:], k3[:], v3[:]
        do = do3[:]
        lse = lse_ref[0]  # [H, N]
        dt = q.dtype
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale
        if mask is not None:
            s = s + mask[None]
        p = jnp.exp(s - lse[..., None])
        pb = p.astype(dt)
        dv = jax.lax.dot_general(
            pb, do, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # [H, Nk, D]
        dp = jax.lax.dot_general(
            do, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # [H, N, Nk]
        if delta_pre:
            delta = o_ref[0]  # [H, N] fp32, precomputed rowsum(do * o)
        else:
            o = o3[:]
            delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
        ds = (p * (dp - delta[..., None]) * scale).astype(dt)
        dq = jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # [H, N, D]
        dk = jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # [H, Nk, D]
        for h in range(heads):
            sl = slice(h * d, (h + 1) * d)
            dqh, dkh = dq[h], dk[h]
            if r_ref is not None:
                # dx = g*cos - (g*sin) @ R  (R^T = -R)
                dqh = _rope_unrotate_grad(dqh, sin, cos, rmat, dt)
                dkh = _rope_unrotate_grad(dkh, sin, cos, rmat, dt)
            dq_ref[0, :, sl] = dqh.astype(dt)
            dk_ref[0, :, sl] = dkh.astype(dt)
            dv_ref[0, :, sl] = dv[h].astype(dt)
        return
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        qh, kh, vh = q_ref[0, :, sl], k_ref[0, :, sl], v_ref[0, :, sl]
        if r_ref is not None:
            # residuals hold the UNROTATED q/k; re-rotate in VMEM (the same
            # two tiny matmuls as the forward) and un-rotate dq/dk on the
            # way out — rotated tensors and their grads never touch HBM.
            qh = _rope_rotate(qh, sin, cos, rmat)
            kh = _rope_rotate(kh, sin, cos, rmat)
        doh = do_ref[0, :, sl]
        lse = lse_ref[0, h, :]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if mask is not None:
            s = s + mask
        p = jnp.exp(s - lse[:, None])
        pb = p.astype(qh.dtype)
        dv = jax.lax.dot_general(
            pb, doh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            doh, vh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if delta_pre:
            delta = o_ref[0, h, :]
        else:
            oh = o_ref[0, :, sl]
            delta = jnp.sum(doh.astype(jnp.float32) * oh.astype(jnp.float32), axis=-1)
        ds = (p * (dp - delta[:, None]) * scale).astype(qh.dtype)
        dq = jax.lax.dot_general(
            ds, kh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dk = jax.lax.dot_general(
            ds, qh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        if r_ref is not None:
            dq = _rope_unrotate_grad(dq, sin, cos, rmat, qh.dtype)
            dk = _rope_unrotate_grad(dk, sin, cos, rmat, qh.dtype)
        dq_ref[0, :, sl] = dq.astype(qh.dtype)
        dk_ref[0, :, sl] = dk.astype(qh.dtype)
        dv_ref[0, :, sl] = dv.astype(qh.dtype)


def _pspec(n, hd):
    return pl.BlockSpec((1, n, hd), lambda i: (i, 0, 0), memory_space=_VMEM)


def _rspec(n, r):
    # rope table [N, 2*D]: one block shared by every grid program
    return pl.BlockSpec((n, r), lambda i: (0, 0), memory_space=_VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _pcore(q, k, v, heads, causal, interpret):
    o, _ = _pcore_fwd(q, k, v, heads, causal, interpret)
    return o


def _pfwd_impl(q, k, v, head_dim, causal, interpret, tab=None):
    b, n, hd = q.shape
    nk = k.shape[1]
    assert hd % head_dim == 0, (
        f"packed width {hd} is not a whole number of {head_dim}-wide heads "
        "(is the tensor-parallel axis size a divisor of num_heads?)"
    )
    heads = hd // head_dim
    batched = _head_mode()
    kern = functools.partial(
        _packed_fwd_kernel, heads=heads, scale=1.0 / math.sqrt(head_dim),
        causal=causal, rope=tab is not None, batched=batched,
    )
    in_specs = [_pspec(n, hd), _pspec(nk, hd), _pspec(nk, hd)]
    args = (q, k, v)
    if tab is not None:
        in_specs.append(_rspec(n, tab.shape[1]))
        args += (tab,)
    scratch = []
    if batched:
        scratch = [
            pltpu.VMEM((heads, n, head_dim), q.dtype),
            pltpu.VMEM((heads, nk, head_dim), q.dtype),
            pltpu.VMEM((heads, nk, head_dim), q.dtype),
        ]
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=in_specs,
        out_specs=(_pspec(n, hd), _pspec(heads, n)),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, hd), q.dtype),
            jax.ShapeDtypeStruct((b, heads, n), jnp.float32),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)


def _pbwd_impl(q, k, v, aux, do, lse, head_dim, causal, interpret, tab=None,
               delta_pre=False):
    """`aux` is either the forward output o [B, N, H*D] (delta computed
    in-kernel, delta_pre=False) or the precomputed fp32 delta [B, H, N]
    (delta_pre=True; see _DELTA_MODE_VAR)."""
    b, n, hd = q.shape
    nk = k.shape[1]
    heads = hd // head_dim
    batched = _head_mode()
    kern = functools.partial(
        _packed_bwd_kernel, heads=heads, scale=1.0 / math.sqrt(head_dim),
        causal=causal, rope=tab is not None, batched=batched,
        delta_pre=delta_pre,
    )
    in_specs = [_pspec(n, hd), _pspec(nk, hd), _pspec(nk, hd)]
    args = (q, k, v)
    if tab is not None:
        in_specs.append(_rspec(n, tab.shape[1]))
        args += (tab,)
    aux_spec = _pspec(heads, n) if delta_pre else _pspec(n, hd)
    in_specs += [aux_spec, _pspec(n, hd), _pspec(heads, n)]
    args += (aux, do, lse)
    scratch = []
    if batched:
        scratch = [
            pltpu.VMEM((heads, n, head_dim), q.dtype),
            pltpu.VMEM((heads, nk, head_dim), q.dtype),
            pltpu.VMEM((heads, nk, head_dim), q.dtype),
        ]
        if not delta_pre:
            scratch.append(pltpu.VMEM((heads, n, head_dim), q.dtype))
        scratch.append(pltpu.VMEM((heads, n, head_dim), q.dtype))
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=in_specs,
        out_specs=(_pspec(n, hd), _pspec(nk, hd), _pspec(nk, hd)),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, hd), q.dtype),
            jax.ShapeDtypeStruct((b, nk, hd), q.dtype),
            jax.ShapeDtypeStruct((b, nk, hd), q.dtype),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)


# --- GSPMD mesh support for the packed variant --------------------------
#
# Attention is independent over (batch, heads): under a dp/fsdp x tp mesh
# the partitioner may run the kernel per shard with the local batch and the
# local contiguous head slab ([B, N, H*D] slices on head boundaries).
# `custom_partitioning` + a shardy einsum rule teaches it that: b and the
# h half of the packed (h d) dim are free factors, while the sequence dims
# and head_dim must be replicated. The per-shard lowering recomputes the
# local head count from the shard's packed width.

def _qkv_lse_shardings(mesh, q_sharding):
    """q: [B, N, H*D] sharding -> (qkv sharding w/ seq replicated, lse)."""
    spec = getattr(q_sharding, "spec", P())
    b_ax = spec[0] if len(spec) > 0 else None
    hd_ax = spec[2] if len(spec) > 2 else None
    qkv = NamedSharding(mesh, P(b_ax, None, hd_ax))
    lse = NamedSharding(mesh, P(b_ax, hd_ax, None))
    return qkv, lse


@functools.lru_cache(maxsize=None)
def _pfwd_gspmd(head_dim, causal, interpret):
    fn = custom_partitioning(
        lambda q, k, v: _pfwd_impl(q, k, v, head_dim, causal, interpret)
    )

    def partition(mesh, arg_shapes, result_shape):
        qkv_sh, lse_sh = _qkv_lse_shardings(mesh, arg_shapes[0].sharding)

        def lower(q, k, v):
            return _pfwd_impl(q, k, v, head_dim, causal, interpret)

        return mesh, lower, (qkv_sh, lse_sh), (qkv_sh,) * 3

    def infer(mesh, arg_shapes, result_shape):
        return _qkv_lse_shardings(mesh, arg_shapes[0].sharding)

    fn.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b n (h d), b m (h d), b m (h d) -> b n (h d), b h n",
        # shardy wants these sorted by first-appearance factor index
        need_replication_factors=("n", "d", "m"),
        d=head_dim,
    )
    return fn


@functools.lru_cache(maxsize=None)
def _pbwd_gspmd(head_dim, causal, interpret, pre):
    fn = custom_partitioning(
        lambda q, k, v, aux, do, lse: _pbwd_impl(
            q, k, v, aux, do, lse, head_dim, causal, interpret, delta_pre=pre
        )
    )

    def partition(mesh, arg_shapes, result_shape):
        qkv_sh, lse_sh = _qkv_lse_shardings(mesh, arg_shapes[0].sharding)
        aux_sh = lse_sh if pre else qkv_sh

        def lower(q, k, v, aux, do, lse):
            return _pbwd_impl(q, k, v, aux, do, lse, head_dim, causal,
                              interpret, delta_pre=pre)

        return mesh, lower, (qkv_sh,) * 3, (qkv_sh,) * 3 + (aux_sh, qkv_sh, lse_sh)

    def infer(mesh, arg_shapes, result_shape):
        qkv_sh, _ = _qkv_lse_shardings(mesh, arg_shapes[0].sharding)
        return (qkv_sh,) * 3

    aux_rule = "b h n" if pre else "b n (h d)"
    fn.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule=(
            f"b n (h d), b m (h d), b m (h d), {aux_rule}, b n (h d), b h n"
            " -> b n (h d), b m (h d), b m (h d)"
        ),
        need_replication_factors=("n", "d", "m"),
        d=head_dim,
    )
    return fn


def _pcore_fwd(q, k, v, heads, causal, interpret):
    head_dim = q.shape[2] // heads
    if jax.device_count() > 1:
        o, lse = _pfwd_gspmd(head_dim, causal, interpret)(q, k, v)
    else:
        o, lse = _pfwd_impl(q, k, v, head_dim, causal, interpret)
    return o, (q, k, v, o, lse)


def _delta_rowsum(do, o, heads):
    """[B, H, N] fp32 delta = per-head rowsum(do * o). Lives in the same
    XLA fusion neighborhood as the out_proj bwd that produces `do`."""
    b, n, hd = o.shape
    d = hd // heads
    prod = (do.astype(jnp.float32) * o.astype(jnp.float32)).reshape(b, n, heads, d)
    return prod.sum(-1).transpose(0, 2, 1)


def _pcore_bwd(heads, causal, interpret, res, do):
    q, k, v, o, lse = res
    head_dim = q.shape[2] // heads
    do = do.astype(q.dtype)
    aux = _delta_rowsum(do, o, heads) if _delta_outside() else o
    if jax.device_count() > 1:
        return _pbwd_gspmd(head_dim, causal, interpret, _delta_outside())(
            q, k, v, aux, do, lse
        )
    return _pbwd_impl(q, k, v, aux, do, lse, head_dim, causal, interpret,
                      delta_pre=_delta_outside())


_pcore.defvjp(_pcore_fwd, _pcore_bwd)


# --- rope-in-kernel variant (EVA02 towers) -------------------------------
#
# Same packed kernels with a fourth operand: the [N, 2*head_dim] sin||cos
# table (identity rows over the CLS prefix, replicated across the mesh).
# Residuals keep the UNROTATED q/k; both kernels re-rotate in VMEM. The
# table is a position constant, not a parameter — its cotangent is zero.

def _rope_sharding(mesh):
    return NamedSharding(mesh, P(None, None))


@functools.lru_cache(maxsize=None)
def _pfwd_rope_gspmd(head_dim, causal, interpret):
    fn = custom_partitioning(
        lambda q, k, v, tab: _pfwd_impl(q, k, v, head_dim, causal, interpret, tab)
    )

    def partition(mesh, arg_shapes, result_shape):
        qkv_sh, lse_sh = _qkv_lse_shardings(mesh, arg_shapes[0].sharding)

        def lower(q, k, v, tab):
            return _pfwd_impl(q, k, v, head_dim, causal, interpret, tab)

        return mesh, lower, (qkv_sh, lse_sh), (qkv_sh,) * 3 + (_rope_sharding(mesh),)

    def infer(mesh, arg_shapes, result_shape):
        return _qkv_lse_shardings(mesh, arg_shapes[0].sharding)

    fn.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule=(
            "b n (h d), b m (h d), b m (h d), n r -> b n (h d), b h n"
        ),
        need_replication_factors=("n", "d", "m", "r"),
        d=head_dim,
    )
    return fn


@functools.lru_cache(maxsize=None)
def _pbwd_rope_gspmd(head_dim, causal, interpret, pre):
    fn = custom_partitioning(
        lambda q, k, v, aux, do, lse, tab: _pbwd_impl(
            q, k, v, aux, do, lse, head_dim, causal, interpret, tab,
            delta_pre=pre,
        )
    )

    def partition(mesh, arg_shapes, result_shape):
        qkv_sh, lse_sh = _qkv_lse_shardings(mesh, arg_shapes[0].sharding)
        aux_sh = lse_sh if pre else qkv_sh

        def lower(q, k, v, aux, do, lse, tab):
            return _pbwd_impl(q, k, v, aux, do, lse, head_dim, causal,
                              interpret, tab, delta_pre=pre)

        return (
            mesh, lower, (qkv_sh,) * 3,
            (qkv_sh,) * 3 + (aux_sh, qkv_sh, lse_sh, _rope_sharding(mesh)),
        )

    def infer(mesh, arg_shapes, result_shape):
        qkv_sh, _ = _qkv_lse_shardings(mesh, arg_shapes[0].sharding)
        return (qkv_sh,) * 3

    aux_rule = "b h n" if pre else "b n (h d)"
    fn.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule=(
            f"b n (h d), b m (h d), b m (h d), {aux_rule}, b n (h d), b h n, n r"
            " -> b n (h d), b m (h d), b m (h d)"
        ),
        need_replication_factors=("n", "d", "m", "r"),
        d=head_dim,
    )
    return fn


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _pcore_rope(q, k, v, tab, heads, causal, interpret):
    o, _ = _pcore_rope_fwd(q, k, v, tab, heads, causal, interpret)
    return o


def _pcore_rope_fwd(q, k, v, tab, heads, causal, interpret):
    head_dim = q.shape[2] // heads
    if jax.device_count() > 1:
        o, lse = _pfwd_rope_gspmd(head_dim, causal, interpret)(q, k, v, tab)
    else:
        o, lse = _pfwd_impl(q, k, v, head_dim, causal, interpret, tab)
    return o, (q, k, v, tab, o, lse)


def _pcore_rope_bwd(heads, causal, interpret, res, do):
    q, k, v, tab, o, lse = res
    head_dim = q.shape[2] // heads
    do = do.astype(q.dtype)
    aux = _delta_rowsum(do, o, heads) if _delta_outside() else o
    if jax.device_count() > 1:
        dq, dk, dv = _pbwd_rope_gspmd(head_dim, causal, interpret, _delta_outside())(
            q, k, v, aux, do, lse, tab
        )
    else:
        dq, dk, dv = _pbwd_impl(q, k, v, aux, do, lse, head_dim, causal,
                                interpret, tab, delta_pre=_delta_outside())
    return dq, dk, dv, jnp.zeros_like(tab)


_pcore_rope.defvjp(_pcore_rope_fwd, _pcore_rope_bwd)


def fused_attention_packed(
    q: jax.Array, k: jax.Array, v: jax.Array, *, is_causal: bool = False,
    rope: jax.Array | None = None, rope_prefix: int = 1,
    interpret: bool | None = None,
) -> jax.Array:
    """Natural-layout fused attention; q, k, v: [B, N, H, D] -> [B, N, H, D].

    Same math as `fused_attention`, but the kernel consumes contiguous
    [1, N, H*D] slabs of the tensors exactly as the QKV projection produced
    them — zero HBM-side transpose/pad copies. Mosaic masks the unaligned
    sequence edge; heads are lane-dim slices relayouted inside VMEM.

    `rope`: optional [N - rope_prefix, 2*D] sin||cos table (the
    `ops.pos_embed.rope_cat_2d` layout, same semantics as
    `models.layers.apply_rope_cat`): q and k rotate INSIDE the kernel, in
    VMEM, via a constant pair-swap matmul — the rotated tensors (and their
    gradients) never round-trip through HBM. The first `rope_prefix` rows
    (CLS) pass through via identity (sin=0, cos=1) padding. Self-attention
    only (requires N == M).

    Mesh-capable: on multi-device processes the kernels are wrapped in
    `custom_partitioning`, so under a dp/fsdp x tp mesh each device runs
    its local batch slice and head slab (tp size must divide num_heads;
    sequence/head_dim shardings are replicated by the partitioner; the
    rope table is replicated).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, h, d = q.shape
    nk = k.shape[1]
    if rope is not None:
        assert nk == n, "rope-in-kernel applies to self-attention only"
        assert d % 2 == 0, "rope head_dim must be even (interleaved pairs)"
        sin, cos = jnp.split(rope, 2, axis=-1)  # [N - prefix, D]
        if rope_prefix:
            sin = jnp.pad(sin, ((rope_prefix, 0), (0, 0)))
            cos = jnp.pad(cos, ((rope_prefix, 0), (0, 0)), constant_values=1.0)
        tab = jnp.concatenate([sin, cos], axis=-1).astype(q.dtype)  # [N, 2D]
        o = _pcore_rope(
            q.reshape(b, n, h * d), k.reshape(b, n, h * d),
            v.reshape(b, n, h * d), tab, h, is_causal, interpret,
        )
        return o.reshape(b, n, h, d)
    o = _pcore(
        q.reshape(b, n, h * d), k.reshape(b, nk, h * d), v.reshape(b, nk, h * d),
        h, is_causal, interpret,
    )
    return o.reshape(b, n, h, d)


def fused_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, *, is_causal: bool = False,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused single-tile attention; q, k, v: [B, N, H, D] -> [B, N, H, D].

    Matches `jax.nn.dot_product_attention` (scale 1/sqrt(D), fp32 softmax)
    with the [N, N] scores VMEM-resident. Sequences are padded to the
    128-lane boundary; padded kv columns are masked, padded query rows are
    sliced off (their cotangents are zero, so gradients are exact).

    `interpret=None` auto-selects: compiled on TPU, Pallas interpreter
    elsewhere (CPU tests).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n_q, h, d = q.shape
    n_k = k.shape[1]
    np_q, np_k = _pad_to(n_q), _pad_to(n_k)

    # Pad the flattened batch*head dim to a multiple of 8 so _pick_group
    # always finds a bounded Mosaic-legal group (a bh=36-style whole-array
    # block is ~9.4 MB of VMEM scores). Padded rows compute softmax over a
    # zero (then kv-masked) sequence — garbage, but sliced off, and their
    # cotangents are zero so gradients of real rows are untouched.
    bh = b * h
    bh_pad = (-bh % 8) if bh >= 8 else 0

    def prep(t, n, np_):
        t = t.transpose(0, 2, 1, 3).reshape(b * h, n, d)
        if np_ != n or bh_pad:
            t = jnp.pad(t, ((0, bh_pad), (0, np_ - n), (0, 0)))
        return t

    qp, kp, vp = prep(q, n_q, np_q), prep(k, n_k, np_k), prep(v, n_k, np_k)
    o = _core(qp, kp, vp, n_k, is_causal, interpret)
    o = o[:bh, :n_q].reshape(b, h, n_q, d).transpose(0, 2, 1, 3)
    return o
