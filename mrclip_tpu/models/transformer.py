"""Transformer stack, TPU-first.

Capability parity with reference `src/open_clip/transformer.py:210-431`
(`ResidualAttentionBlock`, `Transformer`, `CustomTransformer`), re-designed
for XLA:

- `scan_layers=True` folds the layer loop into one `lax.scan` so the stack
  compiles once regardless of depth (params stacked along a leading layer
  axis — also the natural layout for pipeline sharding).
- `remat=True` applies `jax.checkpoint` per block, the reference's
  `grad_checkpointing` (transformer.py:359-361) done the JAX way.
- Pre-LN residual blocks with optional LayerScale, scaled-cosine attention
  and head scaling cover the `CustomTransformer` surface via flags.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from .layers import MLP, LayerNorm, LayerScale, MultiHeadAttention, SwiGLU, gelu_exact

Dtype = Any

__all__ = ["ResidualAttentionBlock", "Transformer", "text_global_pool"]


class ResidualAttentionBlock(nn.Module):
    """Pre-LN block: x += attn(ln_1(x)); x += mlp(ln_2(x)).

    With `cross_attn=True` the block is CROSS-ONLY, exactly the reference
    `ResidualAttentionBlock(is_cross_attention=True)` (transformer.py:
    210-262): queries are ln_1(x), keys/values are ln_1_kv(kv), then the
    MLP — no self-attention sublayer (the CoCa decoder interleaves separate
    causal self-attn and cross-attn blocks, reference :830-926).
    `is_causal` is a static field so XLA sees a fixed attention pattern.
    """

    num_heads: int
    mlp_ratio: float = 4.0
    ls_init_value: Optional[float] = None
    act: Callable[[jax.Array], jax.Array] = gelu_exact
    scaled_cosine: bool = False
    scale_heads: bool = False
    cross_attn: bool = False
    is_causal: bool = False
    dropout: float = 0.0  # --textdropout injection (reference main.py:47-59)
    # timm stochastic depth: drop the whole residual branch per-sample in
    # train mode (reference TimmModel threads timm_drop_path into timm).
    drop_path: float = 0.0
    attn_impl: str = "xla"
    ln_eps: float = 1e-5  # torch default; CLIPA/big_vision configs use 1e-6
    # EVA02 block shape (timm eva.py via the reference's TimmModel towers):
    # 'swiglu' MLP (+ sub-LN when mlp_norm), inner attention LN, and the
    # post-norm residual form (EvaBlockPostNorm, EVA02-E) where ln_1/ln_2
    # normalize the sublayer OUTPUT instead of its input.
    mlp_type: str = "mlp"  # 'mlp' | 'swiglu'
    mlp_norm: bool = False
    mlp_fused_gate: bool = False  # SwiGLU gate||value as one [D, 2H] param
    attn_inner_norm: bool = False
    attn_zero_k_bias: bool = False
    post_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        kv: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
        deterministic: bool = True,
        rope: Optional[jax.Array] = None,
    ) -> jax.Array:
        # `deterministic` is positional so nn.remat can pin it static
        # (static_argnums in _remat_block); a traced bool would break the
        # python branches in drop()/branch_drop().
        width = x.shape[-1]

        def drop(t):
            if self.dropout == 0.0:
                return t
            return nn.Dropout(rate=self.dropout)(t, deterministic=deterministic)

        def branch_drop(t):
            if self.drop_path <= 0.0 or deterministic:
                return t
            keep = 1.0 - self.drop_path
            mask = jax.random.bernoulli(
                self.make_rng("dropout"), keep, (t.shape[0],) + (1,) * (t.ndim - 1)
            )
            return jnp.where(mask, t / keep, jnp.zeros_like(t))

        def maybe_ls(name):
            if self.ls_init_value is None:
                return lambda t: t
            return LayerScale(init_value=self.ls_init_value, name=name)

        if self.cross_attn:
            # Cross-only block (reference transformer.py:227-262): q from
            # ln_1(x), k/v from ln_1_kv(kv). No self-attention here — a
            # causal-leak-free decoder comes from interleaving this with
            # separate causal self-attn blocks.
            assert kv is not None, "cross_attn block requires kv"
            y = LayerNorm(epsilon=self.ln_eps, name="ln_1")(x)
            kv_n = LayerNorm(epsilon=self.ln_eps, name="ln_1_kv")(kv)
            y = MultiHeadAttention(
                num_heads=self.num_heads, attn_impl=self.attn_impl,
                dtype=self.dtype, name="attn",
            )(y, kv=kv_n)
            y = checkpoint_name(y, "attn_out")
            x = x + branch_drop(maybe_ls("ls_1")(drop(y)))
        else:
            attn = MultiHeadAttention(
                num_heads=self.num_heads,
                scaled_cosine=self.scaled_cosine,
                scale_heads=self.scale_heads,
                attn_impl=self.attn_impl,
                inner_norm=self.attn_inner_norm,
                zero_k_bias=self.attn_zero_k_bias,
                ln_eps=self.ln_eps,
                dtype=self.dtype,
                name="attn",
            )
            y = x if self.post_norm else LayerNorm(epsilon=self.ln_eps, name="ln_1")(x)
            y = attn(y, mask=mask, is_causal=self.is_causal, rope=rope)
            # remat tag: `mlp_only` policy saves this and recomputes the MLP
            y = checkpoint_name(y, "attn_out")
            if self.post_norm:
                y = LayerNorm(epsilon=self.ln_eps, name="ln_1")(y)
            x = x + branch_drop(maybe_ls("ls_1")(drop(y)))

        y = x if self.post_norm else LayerNorm(epsilon=self.ln_eps, name="ln_2")(x)
        if self.mlp_type == "swiglu":
            y = SwiGLU(
                width=width, hidden=int(width * self.mlp_ratio),
                use_norm=self.mlp_norm, ln_eps=self.ln_eps,
                fused_gate=self.mlp_fused_gate,
                dtype=self.dtype, name="mlp",
            )(y)
        else:
            y = MLP(width=width, hidden=int(width * self.mlp_ratio), act=self.act, dtype=self.dtype, name="mlp")(y)
        if self.post_norm:
            y = LayerNorm(epsilon=self.ln_eps, name="ln_2")(y)
        x = x + branch_drop(maybe_ls("ls_2")(drop(y)))
        return x


REMAT_POLICIES = {
    # recompute everything (minimum memory, +~30% flops)
    "full": None,
    # save weight-matmul outputs; recompute cheap elementwise/softmax — the
    # standard transformer policy: near no-remat speed at a fraction of the
    # activation memory.
    "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
    # save only the attention sublayer output (tagged `attn_out` below);
    # the backward pass recomputes just the MLP hidden activations — the
    # 4x-width buffers that dominate activation memory — at ~1/3 of a
    # block's forward FLOPs. Cheapest memory/FLOPs trade for batch scaling.
    "mlp_only": jax.checkpoint_policies.save_only_these_names("attn_out"),
}


def _remat_block(cls, policy_name: str):
    policy = REMAT_POLICIES.get(policy_name)
    # argnums count the module as 0: (self, x, kv, mask, deterministic)
    return nn.remat(cls, prevent_cse=False, policy=policy, static_argnums=(4,))


class _ScanBlock(nn.Module):
    """Carry adapter so ResidualAttentionBlock fits nn.scan's (carry, out) contract."""

    block_kwargs: dict
    remat: bool = False
    remat_policy: str = "dots"

    @nn.compact
    def __call__(self, x, kv, mask, deterministic, rope):
        cls = ResidualAttentionBlock
        if self.remat:
            cls = _remat_block(cls, self.remat_policy)
        x = cls(name="block", **self.block_kwargs)(x, kv, mask, deterministic, rope)
        return x, None


class Transformer(nn.Module):
    """Stack of residual attention blocks.

    Reference `Transformer` (transformer.py:319-366). The layer loop is a
    `lax.scan` when `scan_layers=True`; per-block remat when `remat=True`.
    """

    width: int
    layers: int
    heads: int
    mlp_ratio: float = 4.0
    ls_init_value: Optional[float] = None
    act: Callable[[jax.Array], jax.Array] = gelu_exact
    scaled_cosine: bool = False
    scale_heads: bool = False
    cross_attn: bool = False
    is_causal: bool = False
    dropout: float = 0.0
    # Stochastic depth, timm schedule: block i trains at rate
    # drop_path * i / (layers - 1). Unrolled stacks only (scan shares one
    # static block, so per-layer rates cannot vary inside it).
    drop_path: float = 0.0
    attn_impl: str = "xla"
    ln_eps: float = 1e-5
    mlp_type: str = "mlp"
    mlp_norm: bool = False
    mlp_fused_gate: bool = False
    attn_inner_norm: bool = False
    attn_zero_k_bias: bool = False
    post_norm: bool = False
    scan_layers: bool = True
    remat: bool = False
    remat_policy: str = "dots"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        kv: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
        rope: Optional[jax.Array] = None,
    ) -> jax.Array:
        block_kwargs = dict(
            num_heads=self.heads,
            mlp_ratio=self.mlp_ratio,
            ls_init_value=self.ls_init_value,
            act=self.act,
            scaled_cosine=self.scaled_cosine,
            scale_heads=self.scale_heads,
            cross_attn=self.cross_attn,
            is_causal=self.is_causal,
            dropout=self.dropout,
            attn_impl=self.attn_impl,
            ln_eps=self.ln_eps,
            mlp_type=self.mlp_type,
            mlp_norm=self.mlp_norm,
            mlp_fused_gate=self.mlp_fused_gate,
            attn_inner_norm=self.attn_inner_norm,
            attn_zero_k_bias=self.attn_zero_k_bias,
            post_norm=self.post_norm,
            dtype=self.dtype,
        )

        if self.scan_layers:
            if self.drop_path > 0.0 and not deterministic:
                raise NotImplementedError(
                    "drop_path (stochastic depth) trains with per-layer "
                    "rates, which a scanned stack cannot express — build "
                    "with scan_layers=False to train with drop_path"
                )
            scanned = nn.scan(
                _ScanBlock,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast),
                length=self.layers,
            )(
                block_kwargs=block_kwargs,
                remat=self.remat,
                remat_policy=self.remat_policy,
                name="blocks",
            )
            x, _ = scanned(x, kv, mask, deterministic, rope)
        else:
            cls = ResidualAttentionBlock
            if self.remat:
                cls = _remat_block(cls, self.remat_policy)
            for i in range(self.layers):
                x = cls(
                    name=f"blocks_{i}",
                    drop_path=self.drop_path * i / max(self.layers - 1, 1),
                    **block_kwargs,
                )(x, kv, mask, deterministic, rope)
        return x


def text_global_pool(x: jax.Array, tokens: Optional[jax.Array] = None, pool_type: str = "argmax"):
    """Pool a text sequence (reference transformer.py:659-671).

    'argmax' takes the position of the highest token id (EOT has the largest
    id in the CLIP vocab); 'first'/'last' take fixed positions; 'none' is
    identity. Returns (pooled, tokens_out).
    """
    if pool_type == "first":
        return x[:, 0], x[:, 1:]
    if pool_type == "last":
        return x[:, -1], x[:, :-1]
    if pool_type == "argmax":
        assert tokens is not None
        eot = jnp.argmax(tokens, axis=-1)
        return x[jnp.arange(x.shape[0]), eot], x
    return x, x
