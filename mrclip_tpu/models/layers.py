"""Core NN building blocks, TPU-first.

Capability parity with reference `src/open_clip/transformer.py:15-207`
(LayerNorm variants, QuickGELU, LayerScale, PatchDropout, Attention,
AttentionalPooler) re-designed for JAX/XLA:

- LayerNorm always computes statistics in fp32 regardless of the bf16 compute
  dtype (the fp32-island pattern the reference implements as `LayerNormFp32`).
- Attention uses one fused QKV matmul (MXU-friendly) and
  `jax.nn.dot_product_attention` so XLA can pick its fused attention path.
- PatchDropout keeps a *static* number of patches so shapes stay
  jit-compatible (FLIP-style, reference transformer.py:49-86).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

__all__ = [
    "LayerNorm",
    "QuickGELU",
    "LayerScale",
    "PatchDropout",
    "MultiHeadAttention",
    "AttentionalPooler",
    "MAPHead",
    "MLP",
    "SwiGLU",
    "apply_rope_cat",
    "fuse_swiglu_params",
    "split_swiglu_params",
]


class DepthwiseConv(nn.Module):
    """Stride-1 SAME depthwise conv, param-compatible with
    `nn.Conv(features, (k, k), feature_group_count=features)`.

    The r5 MobileCLIP-S1 trace showed XLA's depthwise lowering at ~50% of
    the VPU roofline (filter-grad fusion at 6.3% HBM BW) eating 40% of the
    step, so a whole-image-per-program Pallas kernel (`ops.dw_conv`) was
    built and A/B'd ON-CHIP: it LOSES 2x (S1 b128: 517 vs 1020 pairs/s) —
    the per-tap fp32 VMEM read-modify-write accumulation (Mosaic cannot
    keep a full-image accumulator in registers) plus unaligned-sublane
    masked stores cost more than XLA's fused, tiled lowering. Default is
    therefore the XLA path; set `MRCLIP_DW_IMPL=pallas` (single device
    only) to re-measure the experimental kernel."""

    features: int
    kernel_size: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        import os

        k = self.kernel_size
        use_pallas = (
            os.environ.get("MRCLIP_DW_IMPL", "xla") == "pallas"
            and jax.device_count() == 1
        )
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, 1, self.features),
            jnp.float32,
        )
        if use_pallas:
            from ..ops.dw_conv import dw_conv

            y = dw_conv(x.astype(self.dtype), kernel)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                window_strides=(1, 1),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.features,
            )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(y.dtype)
        return y


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics; output cast back to the input dtype.

    Mirrors `LayerNormFp32` / `LayerNorm` (reference transformer.py:15-30) —
    on TPU there is no reason to ever norm in bf16, so both variants collapse
    into this one numerically-safe implementation.
    """

    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        orig_dtype = x.dtype
        x = x.astype(jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale:
            scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
            y = y * scale
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],), jnp.float32)
            y = y + bias
        return y.astype(orig_dtype)


def quick_gelu(x: jax.Array) -> jax.Array:
    """OpenAI CLIP activation `x * sigmoid(1.702 x)` (reference :33-36)."""
    return x * jax.nn.sigmoid(1.702 * x)


def gelu_exact(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU — matches torch nn.GELU's default, unlike flax
    nn.gelu whose default is the tanh approximation."""
    return nn.gelu(x, approximate=False)


def gelu_tanh(x: jax.Array) -> jax.Array:
    """Tanh-approximate GELU — opt-in throughput mode (--gelu-approx): the
    erf evaluation runs on the VPU inside the c_fc matmul fusion and can
    stall the MXU; tanh is cheaper there. Max |erf-tanh| deviation ~1e-3,
    learnability-validated like the attn-bf16 mode."""
    return nn.gelu(x, approximate=True)


class QuickGELU(nn.Module):
    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return quick_gelu(x)


class LayerScale(nn.Module):
    """Learned per-channel residual scaling (reference transformer.py:39-46)."""

    init_value: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gamma = self.param(
            "gamma",
            lambda key, shape: jnp.full(shape, self.init_value, jnp.float32),
            (x.shape[-1],),
        )
        return x * gamma.astype(x.dtype)


class PatchDropout(nn.Module):
    """FLIP-style patch dropout with a static keep count (reference :49-86).

    Keeps `ceil(n * (1 - prob))` patches per sample (at least 1), optionally
    excluding the CLS token from the lottery. Shapes are static under jit.
    """

    prob: float = 0.0
    exclude_first_token: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        if deterministic or self.prob == 0.0:
            return x
        assert 0.0 <= self.prob < 1.0

        if self.exclude_first_token:
            cls, patches = x[:, :1], x[:, 1:]
        else:
            cls, patches = None, x

        b, n, _ = patches.shape
        keep = max(1, int(n * (1.0 - self.prob)))
        rng = self.make_rng("dropout")
        # Per-sample random subset: rank random noise, take top-`keep` slots.
        noise = jax.random.uniform(rng, (b, n))
        keep_idx = jnp.argsort(noise, axis=-1)[:, :keep]
        patches = jnp.take_along_axis(patches, keep_idx[..., None], axis=1)

        if cls is not None:
            patches = jnp.concatenate([cls, patches], axis=1)
        return patches


class MLP(nn.Module):
    """Transformer MLP: c_fc -> act -> c_proj (reference :231-236)."""

    width: int
    hidden: int
    act: Callable[[jax.Array], jax.Array] = gelu_exact
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.hidden, dtype=self.dtype, name="c_fc")(x)
        x = self.act(x)
        x = nn.Dense(self.width, dtype=self.dtype, name="c_proj")(x)
        return x


class SwiGLU(nn.Module):
    """Gated-SiLU MLP with optional sub-LN, the EVA02 FFN.

    silu(fc1_g(x)) * fc1_x(x) -> [LN] -> fc2 (timm `layers/mlp.py::SwiGLU`
    as instantiated by the reference's TimmModel-wrapped `eva02_*_clip_*`
    towers; the original EVA02 naming w1/w2/ffn_ln/w3 maps onto
    fc1_g/fc1_x/norm/fc2 in `convert.py`).

    `fused_gate=True` (throughput option) keeps the same math but holds the
    gate and value projections as ONE parameter `fc1` with kernel
    [D, 2H] = gate||value: while two [D, H] matmuls tile the MXU like one
    [D, 2H], they are separate XLA dots that each read x from HBM (fwd) and
    produce separate dW/dx dots in the backward — the fused form halves the
    x reads and gives the backward one [B*N, 2H] x [2H, D] dx matmul.
    `models.layers.{fuse,split}_swiglu_params` convert checkpoints between
    layouts (timm's own `SwiGLU` vs `SwiGLUPacked` distinction).
    """

    width: int
    hidden: int
    use_norm: bool = True  # sub-LN between gate and down-projection
    ln_eps: float = 1e-6
    fused_gate: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.fused_gate:
            gv = nn.Dense(2 * self.hidden, dtype=self.dtype, name="fc1")(x)
            g, v = gv[..., : self.hidden], gv[..., self.hidden :]
        else:
            g = nn.Dense(self.hidden, dtype=self.dtype, name="fc1_g")(x)
            v = nn.Dense(self.hidden, dtype=self.dtype, name="fc1_x")(x)
        y = jax.nn.silu(g) * v
        if self.use_norm:
            y = LayerNorm(epsilon=self.ln_eps, name="norm")(y)
        return nn.Dense(self.width, dtype=self.dtype, name="fc2")(y)


def _map_swiglu_mlps(params, fn):
    """Apply `fn` to every SwiGLU mlp subtree (detected by fc1_g/fc1)."""
    if not isinstance(params, dict):
        return params
    out = {}
    for k, v in params.items():
        if k == "mlp" and isinstance(v, dict) and ("fc1_g" in v or "fc1" in v):
            out[k] = fn(dict(v))
        else:
            out[k] = _map_swiglu_mlps(v, fn)
    return out


def fuse_swiglu_params(params):
    """Rewrite split-gate SwiGLU params (fc1_g + fc1_x) to the fused layout
    (fc1 with kernel [.., D, 2H] = gate||value). Handles scan-stacked
    [L, D, H] kernels (concat on the output axis). Inverse of
    `split_swiglu_params`; subtrees already fused pass through."""

    def fuse(mlp):
        if "fc1_g" not in mlp:
            return mlp
        g, v = mlp.pop("fc1_g"), mlp.pop("fc1_x")
        mlp["fc1"] = {
            "kernel": jnp.concatenate([g["kernel"], v["kernel"]], axis=-1),
            "bias": jnp.concatenate([g["bias"], v["bias"]], axis=-1),
        }
        return mlp

    return _map_swiglu_mlps(params, fuse)


def split_swiglu_params(params):
    """Inverse of `fuse_swiglu_params` (fused fc1 -> fc1_g + fc1_x), for
    exporting a fused-gate model to the torch/timm split layout."""

    def split(mlp):
        if "fc1" not in mlp:
            return mlp
        gv = mlp.pop("fc1")
        gk, vk = jnp.split(gv["kernel"], 2, axis=-1)
        gb, vb = jnp.split(gv["bias"], 2, axis=-1)
        mlp["fc1_g"] = {"kernel": gk, "bias": gb}
        mlp["fc1_x"] = {"kernel": vk, "bias": vb}
        return mlp

    return _map_swiglu_mlps(params, split)


def apply_rope_cat(
    t: jax.Array, rope: jax.Array, prefix: int, compute_dtype=None
) -> jax.Array:
    """Rotate q/k by a concatenated sin||cos rope table.

    `t`: [B, N, H, hd]; `rope`: [N - prefix, 2*hd] from
    `ops.pos_embed.rope_cat_2d`. The first `prefix` tokens (CLS) pass
    through unrotated, exactly timm `eva.py`'s
    `cat([q[:, :, :npt], apply_rot_embed_cat(q[:, :, npt:], rope)])` — but
    realized here by padding the table with identity rows (sin=0, cos=1)
    and rotating the WHOLE tensor: y[0] = x*1 + rot*0 = x exactly, and the
    bf16->fp32->bf16 round-trip of the prefix is lossless, so the result is
    bit-identical to the slice+concat form while avoiding a full-tensor
    concat copy per q/k per layer (the pad is a constant-folded table op).
    Rotation runs in fp32 by default and casts back. `compute_dtype` (set by
    the attention layer under `attn_impl='bf16'`, the throughput mode that
    already stores QK logits/probs in compute dtype) rotates in that dtype
    instead: EVA02's visual attention is HBM-bound at 100-116% BW with
    intensity 41-60 f/B (profiles/r3_eva02), and the fp32 intermediates are
    pure byte overhead at those rooflines.
    """
    rdt = jnp.float32 if compute_dtype is None else compute_dtype
    sin, cos = jnp.split(rope.astype(rdt), 2, axis=-1)  # [P, hd]
    if prefix:
        sin = jnp.pad(sin, ((prefix, 0), (0, 0)))
        cos = jnp.pad(cos, ((prefix, 0), (0, 0)), constant_values=1.0)
    x = t.astype(rdt)
    pairs = x.reshape(*x.shape[:-1], -1, 2)
    rot = jnp.stack([-pairs[..., 1], pairs[..., 0]], axis=-1).reshape(x.shape)
    # broadcast [N, hd] over [B, N, H, hd]
    y = x * cos[None, :, None, :] + rot * sin[None, :, None, :]
    return y.astype(t.dtype)


class ZeroKBiasQKV(nn.Module):
    """Fused qkv projection whose k-bias third is structurally zero.

    timm `eva.py` registers `k_bias` as a non-trainable zeros buffer (the
    torch EVA state-dict layout has no k-bias parameter at all), so the
    fused `in_proj` bias here masks its middle third out of the forward:
    the k segment receives no gradient, never drifts from zero during
    fine-tuning, and torch export round-trips losslessly. Param tree
    matches nn.Dense (`kernel`, `bias`) so importers/sharding rules are
    unchanged.
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.features)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        third = self.features // 3
        mask = jnp.concatenate(
            [
                jnp.ones((third,), jnp.float32),
                jnp.zeros((third,), jnp.float32),
                jnp.ones((third,), jnp.float32),
            ]
        )
        return x.astype(self.dtype) @ kernel.astype(self.dtype) + (
            bias * mask
        ).astype(self.dtype)


class MultiHeadAttention(nn.Module):
    """Multi-head attention with fused QKV projection.

    Covers both the torch built-in MHA used by `ResidualAttentionBlock` and
    the custom `Attention` (reference transformer.py:89-184): optional
    scaled-cosine attention with a per-head learned logit scale, and optional
    per-head output scaling (`scale_heads`).
    """

    num_heads: int
    scaled_cosine: bool = False
    scale_heads: bool = False
    logit_scale_max: float = 4.6052  # ln(100)
    use_bias: bool = True
    # 'xla' = jax.nn.dot_product_attention (GSPMD-shardable);
    # 'flash' = Pallas fused kernel, no HBM score matrix (single-device TPU;
    # see ops/flash_attn.py for why it is not the multi-chip default).
    attn_impl: str = "xla"
    # EVA02 sub-LN: LayerNorm over the merged heads before out_proj
    # (timm eva.py EvaAttention `scale_attn_inner`).
    inner_norm: bool = False
    # EVA towers: the in_proj bias's k third is structurally zero
    # (timm eva.py k_bias buffer) — see ZeroKBiasQKV.
    zero_k_bias: bool = False
    ln_eps: float = 1e-6  # inner-norm eps (timm Eva default)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        kv: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
        is_causal: bool = False,
        rope: Optional[jax.Array] = None,
        rope_prefix: int = 1,
    ) -> jax.Array:
        """`x`: [B, N, D] queries. `kv`: [B, M, D] for cross-attention.

        `mask`: additive fp32 bias [..., N, M] or boolean (True = attend).
        `rope`: optional [N - rope_prefix, 2*head_dim] sin||cos table
        rotating q and k (self-attention only).
        """
        d = x.shape[-1]
        head_dim = d // self.num_heads
        assert head_dim * self.num_heads == d

        if kv is None:
            if self.zero_k_bias and self.use_bias:
                qkv = ZeroKBiasQKV(3 * d, dtype=self.dtype, name="in_proj")(x)
            else:
                qkv = nn.Dense(
                    3 * d, use_bias=self.use_bias, dtype=self.dtype, name="in_proj"
                )(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            # Cross-attention: separate projections, shared naming with the
            # fused path for checkpoint import symmetry.
            q = nn.Dense(d, use_bias=self.use_bias, dtype=self.dtype, name="q_proj")(x)
            k = nn.Dense(d, use_bias=self.use_bias, dtype=self.dtype, name="k_proj")(kv)
            v = nn.Dense(d, use_bias=self.use_bias, dtype=self.dtype, name="v_proj")(kv)

        def split_heads(t):
            return t.reshape(t.shape[0], t.shape[1], self.num_heads, head_dim)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)

        # Under fusedp the rotation happens INSIDE the Pallas kernel (q/k
        # rotate in VMEM; the rotated tensors never reach HBM — pallas_call
        # is opaque to XLA, so an out-of-kernel rotation must materialize
        # rotated q and k per layer per direction, and EVA02's attention is
        # byte-bound at 75-100% HBM BW per profiles/r4_eva02).
        rope_in_kernel = (
            rope is not None
            and self.attn_impl == "fusedp"
            and mask is None
            and not self.scaled_cosine
        )
        if rope is not None and not rope_in_kernel:
            assert kv is None, "rope applies to self-attention only"
            # under the throughput modes (bf16 score storage, Pallas fused
            # kernels), rotate in compute dtype too — the fp32 round-trip is
            # pure HBM bytes on a BW-bound op, and the Pallas kernels consume
            # compute-dtype q/k anyway so fp32 rotation buys nothing.
            rdt = (
                self.dtype
                if self.attn_impl in ("bf16", "flash", "fused", "fusedp")
                else None
            )
            q = apply_rope_cat(q, rope, rope_prefix, compute_dtype=rdt)
            k = apply_rope_cat(k, rope, rope_prefix, compute_dtype=rdt)

        if self.scaled_cosine:
            logit_scale = self.param(
                "logit_scale",
                lambda key, shape: jnp.full(shape, jnp.log(10.0), jnp.float32),
                (self.num_heads, 1, 1),
            )
            qn = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-6)
            kn = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-6)
            attn = jnp.einsum("bqhd,bkhd->bhqk", qn, kn, preferred_element_type=jnp.float32)
            attn = attn * jnp.exp(jnp.clip(logit_scale, max=self.logit_scale_max))
            if is_causal:
                n = attn.shape[-2]
                causal = jnp.tril(jnp.ones((n, attn.shape[-1]), dtype=bool))
                attn = jnp.where(causal, attn, -jnp.inf)
            if mask is not None:
                if mask.dtype == jnp.bool_:
                    attn = jnp.where(mask, attn, -jnp.inf)
                else:
                    attn = attn + mask
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        elif self.attn_impl == "flash" and mask is None:
            from ..ops.flash_attn import flash_attention_unpadded

            out = flash_attention_unpadded(q, k, v, is_causal=is_causal)
        elif self.attn_impl in ("fused", "fusedp") and mask is None:
            # Single-tile Pallas kernels: the whole sequence lives in VMEM,
            # scores never reach HBM (ops/fused_attn.py rationale). 'fused'
            # pads/transposes to [B*H, Np, D] blocks (single-device only);
            # 'fusedp' consumes the natural [B, N, H*D] layout (zero HBM-side
            # copies) and is mesh-capable via custom_partitioning.
            from ..ops.fused_attn import fused_attention, fused_attention_packed

            if self.attn_impl == "fused":
                out = fused_attention(q, k, v, is_causal=is_causal)
            elif rope_in_kernel:
                assert kv is None, "rope applies to self-attention only"
                out = fused_attention_packed(
                    q, k, v, is_causal=is_causal, rope=rope,
                    rope_prefix=rope_prefix,
                )
            else:
                out = fused_attention_packed(q, k, v, is_causal=is_causal)
        elif self.attn_impl in ("manual", "bf16"):
            # Same math as the xla path, with explicit control over what the
            # [B, H, N, N] score tensors are stored as in HBM (the r1 trace
            # showed fp32 score traffic dominating attention time):
            #   'manual': fp32 logits + softmax, probs cast to compute dtype
            #             before the AV matmul (halves only the probs).
            #   'bf16':   logits emitted in the compute dtype and softmax
            #             upcast happens inside the fusion, so neither score
            #             tensor materializes in fp32 (~3 significant digits
            #             on the logits; opt-in, parity tests pin fp32).
            score_dtype = jnp.float32 if self.attn_impl == "manual" else self.dtype
            head_scale = 1.0 / math.sqrt(head_dim)
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=score_dtype
            ) * jnp.asarray(head_scale, score_dtype)
            if is_causal:
                n_q, n_k = logits.shape[-2], logits.shape[-1]
                causal = jnp.tril(jnp.ones((n_q, n_k), dtype=bool))
                logits = jnp.where(causal, logits, -jnp.inf)
            if mask is not None:
                if mask.dtype == jnp.bool_:
                    logits = jnp.where(mask, logits, -jnp.inf)
                else:
                    logits = logits + mask.astype(score_dtype)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        else:
            bias = None
            bool_mask = None
            if mask is not None:
                if mask.dtype == jnp.bool_:
                    bool_mask = mask
                else:
                    bias = mask.astype(jnp.float32)
            out = jax.nn.dot_product_attention(
                q, k, v, bias=bias, mask=bool_mask, is_causal=is_causal
            )

        if self.scale_heads:
            head_scale = self.param("head_scale", nn.initializers.ones, (self.num_heads, 1))
            out = out * head_scale.astype(out.dtype)

        out = out.reshape(out.shape[0], out.shape[1], d)
        if self.inner_norm:
            out = LayerNorm(epsilon=self.ln_eps, name="norm")(out)
        return nn.Dense(d, use_bias=self.use_bias, dtype=self.dtype, name="out_proj")(out)


class AttentionalPooler(nn.Module):
    """Learned-query cross-attention pooling (reference transformer.py:187-207).

    `n_queries` learned queries attend over the sequence; returns [B, Q, D].
    """

    d_model: int
    num_heads: int = 8
    n_queries: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        query = self.param(
            "query", nn.initializers.normal(stddev=self.d_model**-0.5), (self.n_queries, self.d_model)
        )
        q = jnp.broadcast_to(query, (x.shape[0],) + query.shape).astype(self.dtype)
        x = LayerNorm(name="ln_k")(x)
        q = LayerNorm(name="ln_q")(q)
        # k/v project straight from context_dim -> d_model inside the MHA
        # (reference uses nn.MultiheadAttention(kdim=context_dim)); no extra
        # bottleneck projection, so torch checkpoints map 1:1.
        return MultiHeadAttention(num_heads=self.num_heads, dtype=self.dtype, name="attn")(q, kv=x)


class MAPHead(nn.Module):
    """timm `AttentionPoolLatent` ("map" global pool) — the SigLIP ViT pooling
    head (big_vision MAPHead_0; timm/layers/attention_pool.py). One learned
    latent query cross-attends over all tokens, then a residual MLP:

        q = W_q latent; k,v = W_kv x
        y = W_o softmax(q k^T / sqrt(dh)) v
        out = (y + MLP(LN(y)))[:, 0]

    Param names mirror the timm checkpoint keys (latent/q/kv/proj/norm +
    mlp fc1/fc2 -> c_fc/c_proj) so `convert.timm_vit_to_vision_params` maps
    1:1; reference adapter surface: timm_model.py:29-153 (`pool='map'`).
    """

    width: int
    num_heads: int = 12
    mlp_ratio: float = 4.0
    act: Callable[[jax.Array], jax.Array] = gelu_exact
    ln_eps: float = 1e-6  # timm AttentionPoolLatent norm_layer eps
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, n, c = x.shape
        dh = self.width // self.num_heads
        latent = self.param(
            "latent", nn.initializers.normal(stddev=self.width**-0.5),
            (1, 1, self.width),
        )
        q = nn.Dense(self.width, dtype=self.dtype, name="q")(
            jnp.broadcast_to(latent, (b, 1, self.width)).astype(self.dtype)
        )
        kv = nn.Dense(2 * self.width, dtype=self.dtype, name="kv")(x)
        k, v = jnp.split(kv, 2, axis=-1)
        q = q.reshape(b, 1, self.num_heads, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, self.num_heads, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, self.num_heads, dh).transpose(0, 2, 1, 3)
        scores = (q @ k.transpose(0, 1, 3, 2)) * (dh**-0.5)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
        y = (probs @ v).transpose(0, 2, 1, 3).reshape(b, 1, self.width)
        y = nn.Dense(self.width, dtype=self.dtype, name="proj")(y)
        y = y + MLP(
            width=self.width, hidden=int(self.width * self.mlp_ratio),
            act=self.act, dtype=self.dtype, name="mlp",
        )(LayerNorm(epsilon=self.ln_eps, name="norm")(y))
        return y[:, 0]
