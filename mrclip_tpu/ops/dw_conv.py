"""Pallas TPU depthwise convolution (stride 1, SAME padding, NHWC).

Why: the r5 MobileCLIP-S1 trace (`profiles/r5_mcs1_b128`,
`tools/mxu_table.py`) shows the FastViT towers' depthwise convs consuming
40.1% of device time at ~2% MXU / 38-46% HBM BW — bound by NEITHER
roofline. A K x K depthwise conv is a per-channel linear combination of
K^2 spatially shifted images: pure VPU FMAs, no MXU use possible, so the
relevant roofline is VPU throughput (~7.7 TFLOP/s fp32 on v5e) — XLA's
lowering reaches ~4.0 TF/s forward and 3.2 TF/s backward, with the
depthwise *filter gradient* lowered as a multiply_add_fusion measured at
6.3% of HBM bandwidth (the single worst op in the trace).

This kernel processes one whole sample per grid program (CLIP-scale stage
feature maps are tiny: 64x64x64 bf16 = 0.5 MB — VMEM holds the full
image), computing the K^2 shifted multiply-adds over static slices. The
backward is ONE kernel producing both dx (conv with the spatially flipped
filter) and dw (per-tap full-image reductions accumulated across the
sequential grid into a revisited [K*K, C] block) — x and dy are read from
HBM exactly once for the whole backward.

Scope: stride 1, square kernel, SAME padding, feature_group_count == C
(one filter per channel). The FastViT/MCi stride-2 downsample convs stay
on XLA (3 convs vs ~73 stride-1 block convs in MCi1). Single-device (the
bench/serving path); under a multi-device mesh call sites fall back to
XLA's conv (see models.layers.DepthwiseConv).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pragma: no cover
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except ImportError:  # pragma: no cover
    pltpu = None
    _VMEM = None

__all__ = ["dw_conv"]


def _tap_slices(h: int, w: int, di: int, dj: int):
    """Static (out_rows, out_cols, in_rows, in_cols) for accumulating
    `x` shifted by (di, dj) into an [h, w] output."""
    or0, or1 = max(0, -di), h - max(0, di)
    oc0, oc1 = max(0, -dj), w - max(0, dj)
    ir0, ir1 = or0 + di, or1 + di
    ic0, ic1 = oc0 + dj, oc1 + dj
    return (or0, or1, oc0, oc1, ir0, ir1, ic0, ic1)


def _fwd_kernel(x_ref, w_ref, y_ref, acc, *, k: int):
    # Mosaic supports static ref slicing (masked loads/stores) but not
    # lax.dynamic_slice on VALUES — so accumulate via read-modify-write
    # into an fp32 VMEM scratch instead of jnp .at[].add on an array.
    _, h, w_, _ = y_ref.shape
    p = k // 2
    acc[...] = jnp.zeros(acc.shape, acc.dtype)
    for i in range(k):
        for j in range(k):
            di, dj = i - p, j - p
            (or0, or1, oc0, oc1, ir0, ir1, ic0, ic1) = _tap_slices(h, w_, di, dj)
            acc[or0:or1, oc0:oc1, :] += (
                x_ref[0, ir0:ir1, ic0:ic1, :].astype(jnp.float32)
                * w_ref[i * k + j, :]
            )
    y_ref[0] = acc[...].astype(y_ref.dtype)


def _bwd_kernel(x_ref, w_ref, dy_ref, dx_ref, dw_ref, acc, *, k: int):
    _, h, w_, _ = dx_ref.shape
    p = k // 2

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)

    acc[...] = jnp.zeros(acc.shape, acc.dtype)
    for i in range(k):
        for j in range(k):
            di, dj = i - p, j - p
            (or0, or1, oc0, oc1, ir0, ir1, ic0, ic1) = _tap_slices(h, w_, di, dj)
            x_sl = x_ref[0, ir0:ir1, ic0:ic1, :].astype(jnp.float32)
            dy_sl = dy_ref[0, or0:or1, oc0:oc1, :].astype(jnp.float32)
            # dx: correlation of dy with the flipped filter — dy positions
            # that consumed x[ir...] sit at the output slices.
            acc[ir0:ir1, ic0:ic1, :] += dy_sl * w_ref[i * k + j, :]
            # dw[t, c] += sum_{pixels} x_shifted * dy
            t = i * k + j
            dw_ref[t : t + 1, :] += jnp.sum(x_sl * dy_sl, axis=(0, 1))[None, :]
    dx_ref[0] = acc[...].astype(dx_ref.dtype)


def _img_spec(h, w, c):
    return pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=_VMEM)


def _w_spec(taps, c):
    return pl.BlockSpec((taps, c), lambda i: (0, 0), memory_space=_VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _core(x, w2, k, interpret):
    y, _ = _core_fwd(x, w2, k, interpret)
    return y


def _core_fwd(x, w2, k, interpret):
    b, h, w_, c = x.shape
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, k=k),
        grid=(b,),
        in_specs=[_img_spec(h, w_, c), _w_spec(k * k, c)],
        out_specs=_img_spec(h, w_, c),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((h, w_, c), jnp.float32)]
        if pltpu is not None else [],
        interpret=interpret,
    )(x, w2)
    return y, (x, w2)


def _core_bwd(k, interpret, res, dy):
    x, w2 = res
    b, h, w_, c = x.shape
    dx, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, k=k),
        grid=(b,),
        in_specs=[_img_spec(h, w_, c), _w_spec(k * k, c), _img_spec(h, w_, c)],
        out_specs=(_img_spec(h, w_, c), _w_spec(k * k, c)),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((k * k, c), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((h, w_, c), jnp.float32)]
        if pltpu is not None else [],
        interpret=interpret,
    )(x, w2, dy.astype(x.dtype))
    return dx, dw.astype(w2.dtype)


_core.defvjp(_core_fwd, _core_bwd)


def dw_conv(x: jax.Array, kernel: jax.Array, *, interpret: bool | None = None) -> jax.Array:
    """Depthwise conv, stride 1, SAME padding.

    `x`: [B, H, W, C]; `kernel`: [K, K, 1, C] (the flax `nn.Conv`
    depthwise HWIO layout, so parameters are interchangeable with the XLA
    path). Returns [B, H, W, C] in x.dtype. Differentiable via a fused
    one-pass Pallas backward (dx + dw).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k = kernel.shape[0]
    assert kernel.shape[:2] == (k, k) and kernel.shape[2] == 1, kernel.shape
    assert k % 2 == 1, "SAME padding needs an odd kernel"
    w2 = kernel.reshape(k * k, kernel.shape[3]).astype(jnp.float32)
    return _core(x, w2, k, interpret)
