"""Text tower: causal transformer encoder, TPU-first.

Capability parity with reference `src/open_clip/transformer.py:674-827`
(`TextTransformer`): token embed -> +pos embed -> causally-masked Transformer
-> ln_final -> pool (argmax-EOT / first / last) -> projection. Optional
appended CLS token for CoCa (`embed_cls`, reference :715-719, :784-806).

MR-CLIP default context length is 98 (reference :679 via tokenizer.py:23).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import LayerNorm, gelu_exact
from .transformer import Transformer, text_global_pool

Dtype = Any


class TextTransformer(nn.Module):
    context_length: int = 98
    vocab_size: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12
    mlp_ratio: float = 4.0
    ls_init_value: Optional[float] = None
    output_dim: Optional[int] = 512
    embed_cls: bool = False
    no_causal_mask: bool = False
    pad_id: int = 0
    pool_type: str = "argmax"  # 'argmax' | 'first' | 'last' | 'none'
    proj_bias: bool = False
    dropout: float = 0.0
    act: Callable[[jax.Array], jax.Array] = gelu_exact
    ln_eps: float = 1e-5  # CLIPA/big_vision-trained configs use 1e-6
    output_tokens: bool = False
    attn_impl: str = "xla"
    scan_layers: bool = True
    remat: bool = False
    remat_policy: str = "dots"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array, *, deterministic: bool = True):
        """`tokens`: [B, L] int32 token ids, zero-padded after EOT."""
        b, seq_len = tokens.shape

        tok_emb = nn.Embed(
            num_embeddings=self.vocab_size,
            features=self.width,
            embedding_init=nn.initializers.normal(stddev=0.02),
            dtype=self.dtype,
            name="token_embedding",
        )
        x = tok_emb(tokens)

        if self.embed_cls:
            # CoCa: a learned CLS appended at the END of the sequence
            # (reference transformer.py:715-719,784-806).
            cls_emb = self.param(
                "cls_emb", nn.initializers.normal(stddev=0.01), (self.width,)
            )
            x = jnp.concatenate(
                [x, jnp.broadcast_to(cls_emb.astype(x.dtype), (b, 1, self.width))], axis=1
            )
            seq_len = seq_len + 1

        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=0.01),
            (self.context_length + (1 if self.embed_cls else 0), self.width),
        )
        x = x + pos[:seq_len].astype(x.dtype)

        mask = None
        is_causal = not self.no_causal_mask
        if self.embed_cls and is_causal:
            # Causal mask + padding columns masked out so the CLS (and every
            # query) never attends to pad tokens (reference `build_cls_mask`
            # :784-791). Keep additive fp32 bias form for fused attention.
            causal = jnp.tril(jnp.ones((seq_len, seq_len), dtype=bool))
            pad_ok = tokens != self.pad_id  # [B, L]
            pad_ok = jnp.concatenate([pad_ok, jnp.ones((b, 1), dtype=bool)], axis=1)
            allowed = causal[None] & pad_ok[:, None, :]
            mask = jnp.where(allowed, 0.0, -jnp.inf).astype(jnp.float32)[:, None]
            is_causal = False

        x = Transformer(
            width=self.width,
            layers=self.layers,
            heads=self.heads,
            mlp_ratio=self.mlp_ratio,
            ls_init_value=self.ls_init_value,
            act=self.act,
            is_causal=is_causal,
            dropout=self.dropout,
            attn_impl=self.attn_impl,
            scan_layers=self.scan_layers,
            remat=self.remat,
            remat_policy=self.remat_policy,
            ln_eps=self.ln_eps,
            dtype=self.dtype,
            name="transformer",
        )(x, mask=mask, deterministic=deterministic)

        if self.embed_cls:
            # CLS sits at the end; pool it, tokens are the rest.
            pooled, tokens_out = x[:, -1], x[:, :-1]
            pooled = LayerNorm(epsilon=self.ln_eps, name="ln_final")(pooled)
        else:
            x = LayerNorm(epsilon=self.ln_eps, name="ln_final")(x)
            pooled, tokens_out = text_global_pool(x, tokens, pool_type=self.pool_type)

        if self.output_dim is not None:
            if self.proj_bias:
                pooled = nn.Dense(self.output_dim, dtype=self.dtype, name="text_projection")(pooled)
            else:
                proj = self.param(
                    "text_projection",
                    nn.initializers.normal(stddev=self.width**-0.5),
                    (self.width, self.output_dim),
                )
                pooled = pooled @ proj.astype(pooled.dtype)

        if self.output_tokens:
            return pooled, tokens_out
        return pooled
