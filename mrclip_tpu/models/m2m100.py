"""Flax M2M100/NLLB text encoder — the nllb-clip text tower.

The reference loads nllb-clip tags through `HFTextEncoder` with
`arch_dict["m2m_100"]` (hf_configs.py:57-66), taking the ENCODER half of the
seq2seq M2M100 (`hf_model.py:123-126`: `self.transformer =
self.transformer.encoder`). transformers ships no Flax port of M2M100, so
this module implements the encoder natively (fairseq pre-norm layout):

    x = embed_tokens(ids) * sqrt(d)  +  sinusoidal_pos(ids)    # offset 2,
                                                               # pad row zero
    per layer:  x += SelfAttn(LN(x));  x += FC2(relu(FC1(LN(x))))
    out = LN(x)

Weight layout mirrors the torch `model.encoder.*` names so
`m2m100_torch_encoder_to_flax` is a mechanical transpose; parity vs the
torch `M2M100Model().encoder` oracle is tested in tests/test_m2m100.py.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import LayerNorm

Dtype = Any

__all__ = ["M2M100Encoder", "m2m100_torch_encoder_to_flax"]


def sinusoidal_position_table(num_positions: int, dim: int, padding_idx: int) -> np.ndarray:
    """transformers M2M100SinusoidalPositionalEmbedding.get_embedding: interleaved
    [sin | cos] halves, zeroed padding row, fp32."""
    half = dim // 2
    freq = math.log(10000) / (half - 1)
    freqs = np.exp(np.arange(half, dtype=np.float64) * -freq)
    pos = np.arange(num_positions, dtype=np.float64)
    angles = pos[:, None] * freqs[None, :]
    table = np.concatenate([np.sin(angles), np.cos(angles)], axis=1)
    if dim % 2:
        table = np.concatenate([table, np.zeros((num_positions, 1))], axis=1)
    if padding_idx is not None:
        table[padding_idx] = 0.0
    return table.astype(np.float32)


class _EncoderLayer(nn.Module):
    d_model: int
    heads: int
    ffn_dim: int
    dropout: float
    dtype: Dtype

    @nn.compact
    def __call__(self, x, attn_bias, *, deterministic: bool = True):
        d, h = self.d_model, self.heads
        dh = d // h
        b, n, _ = x.shape

        residual = x
        y = LayerNorm(name="self_attn_layer_norm")(x)
        q = nn.Dense(d, dtype=self.dtype, name="self_attn_q_proj")(y) * dh**-0.5
        k = nn.Dense(d, dtype=self.dtype, name="self_attn_k_proj")(y)
        v = nn.Dense(d, dtype=self.dtype, name="self_attn_v_proj")(y)
        shp = lambda t: t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
        scores = shp(q) @ shp(k).transpose(0, 1, 3, 2) + attn_bias
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
        y = (probs @ shp(v)).transpose(0, 2, 1, 3).reshape(b, n, d)
        y = nn.Dense(d, dtype=self.dtype, name="self_attn_out_proj")(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        x = residual + y

        residual = x
        y = LayerNorm(name="final_layer_norm")(x)
        y = nn.relu(nn.Dense(self.ffn_dim, dtype=self.dtype, name="fc1")(y))
        y = nn.Dense(d, dtype=self.dtype, name="fc2")(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return residual + y


class M2M100Encoder(nn.Module):
    """Encoder-only M2M100/NLLB, callable like a HF Flax module."""

    config: Any  # transformers M2M100Config (or any obj with these fields)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, *, deterministic: bool = True, **_):
        cfg = self.config
        d = cfg.d_model
        pad = cfg.pad_token_id
        if attention_mask is None:
            attention_mask = (input_ids != pad).astype(jnp.int32)

        x = nn.Embed(
            cfg.vocab_size, d, dtype=self.dtype,
            embedding_init=nn.initializers.normal(stddev=0.02),
            name="embed_tokens",
        )(input_ids)
        if getattr(cfg, "scale_embedding", True):
            x = x * math.sqrt(d)

        # Sinusoidal positions, fairseq convention: table has a +2 offset,
        # non-pad tokens take incremental ids starting at pad_idx+1, pad
        # tokens hit the zeroed padding row. Deterministic, so baked as an
        # XLA constant rather than stored in a variable collection.
        table = jnp.asarray(
            sinusoidal_position_table(cfg.max_position_embeddings + 2, d, pad)
        )
        position_ids = jnp.cumsum(attention_mask, axis=1) * attention_mask + pad
        x = x + jnp.take(table, position_ids, axis=0).astype(x.dtype)
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)

        neg = jnp.finfo(jnp.float32).min
        attn_bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, neg)

        for i in range(cfg.encoder_layers):
            x = _EncoderLayer(
                d_model=d, heads=cfg.encoder_attention_heads,
                ffn_dim=cfg.encoder_ffn_dim, dropout=cfg.dropout,
                dtype=self.dtype, name=f"layers_{i}",
            )(x, attn_bias, deterministic=deterministic)

        x = LayerNorm(name="layer_norm")(x)
        return (x,)  # tuple like HF outputs: out[0] = last_hidden_state


def m2m100_torch_encoder_to_flax(sd) -> dict:
    """torch `model.encoder.*` (or `encoder.*`) state dict -> M2M100Encoder
    params tree. Sinusoidal pos-embed tables are recomputed, not loaded."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    # normalize prefixes: model.encoder.X / encoder.X -> X
    for pref in ("model.encoder.", "encoder."):
        if any(k.startswith(pref) for k in sd):
            sd = {k[len(pref):]: v for k, v in sd.items() if k.startswith(pref)}
            break

    def ln(p):
        return {"scale": sd[p + ".weight"], "bias": sd[p + ".bias"]}

    def dense(p):
        return {"kernel": sd[p + ".weight"].T, "bias": sd[p + ".bias"]}

    params = {
        "embed_tokens": {"embedding": sd["embed_tokens.weight"]},
        "layer_norm": ln("layer_norm"),
    }
    i = 0
    while f"layers.{i}.fc1.weight" in sd:
        p = f"layers.{i}."
        params[f"layers_{i}"] = {
            "self_attn_layer_norm": ln(p + "self_attn_layer_norm"),
            "self_attn_q_proj": dense(p + "self_attn.q_proj"),
            "self_attn_k_proj": dense(p + "self_attn.k_proj"),
            "self_attn_v_proj": dense(p + "self_attn.v_proj"),
            "self_attn_out_proj": dense(p + "self_attn.out_proj"),
            "final_layer_norm": ln(p + "final_layer_norm"),
            "fc1": dense(p + "fc1"),
            "fc2": dense(p + "fc2"),
        }
        i += 1
    if i == 0:
        raise ValueError("not an M2M100 encoder state dict: no layers.N.fc1 keys")
    return jax.tree.map(jnp.asarray, params)
