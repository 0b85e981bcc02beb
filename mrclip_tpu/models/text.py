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


def build_cls_attn_mask(tokens: jax.Array, pad_id: int) -> jax.Array:
    """Causal + CLS-pad mask for `embed_cls` towers, additive fp32 [B,1,S,S].

    Exact reference semantics (`build_cls_mask`, transformer.py:784-791 +
    the additive combination in forward :806): the pad gate applies to the
    CLS query row ONLY (the torch code top-pads the query dim with True
    rows), and the key gate is the pad mask right-shifted by one — F.pad's
    (1, 0) left-pads the key dim, so key 0 is always attendable, key j is
    gated by text[j-1], and the CLS key itself is gated by the LAST text
    token (masked whenever the caption is padded). Every other query row
    sees the plain causal mask.
    """
    b, n_text = tokens.shape
    seq_len = n_text + 1  # + appended CLS
    causal = jnp.tril(jnp.ones((seq_len, seq_len), dtype=bool))
    # keys: [True, text != pad] — the reference's left-pad shift
    keys_ok = jnp.concatenate(
        [jnp.ones((b, 1), dtype=bool), tokens != pad_id], axis=1
    )  # [B, S]
    q_is_cls = jnp.arange(seq_len) == seq_len - 1  # [S]
    gate = jnp.where(q_is_cls[None, :, None], keys_ok[:, None, :], True)
    allowed = causal[None] & gate
    return jnp.where(allowed, 0.0, -jnp.inf).astype(jnp.float32)[:, None]


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
            mask = build_cls_attn_mask(tokens, self.pad_id)
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
