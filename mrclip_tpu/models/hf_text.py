"""HuggingFace text tower adapter (Flax).

Capability parity with reference `src/open_clip/hf_model.py:96-193`
(`HFTextEncoder`): wraps a HF transformer as the text tower with a pooler
(mean / cls / last) and linear or MLP projection head. Uses HF's Flax model
classes; architectures without a Flax port raise an informative error
(the torch-side `arch_dict` registry of hf_configs.py:2-67 maps onto HF's
own Flax configs here).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import gelu_exact

Dtype = Any


def _pool(hidden: jax.Array, mask: jax.Array, pooler_type: str) -> jax.Array:
    """Poolers (reference hf_model.py:45-93)."""
    if pooler_type == "cls_pooler" or pooler_type == "cls_last_hidden_state_pooler":
        return hidden[:, 0]
    if pooler_type == "max_pooler":
        masked = jnp.where(mask[..., None] > 0, hidden, -jnp.inf)
        return jnp.max(masked, axis=1)
    # mean_pooler (default)
    m = mask[..., None].astype(hidden.dtype)
    return jnp.sum(hidden * m, axis=1) / jnp.clip(jnp.sum(m, axis=1), min=1.0)


class HFTextEncoder(nn.Module):
    """HF flax transformer + pooler + projection."""

    model_name: str
    output_dim: int
    proj_type: str = "mlp"  # 'linear' | 'mlp' | None
    pooler_type: str = "mean_pooler"
    pretrained: bool = True
    output_tokens: bool = False
    pad_id: int = 0
    dtype: Dtype = jnp.float32

    def setup(self):
        try:
            from transformers import FlaxAutoModel
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "transformers with Flax support is required for HF text towers"
            ) from e
        try:
            if self.pretrained:
                hf = FlaxAutoModel.from_pretrained(self.model_name)
            else:
                from transformers import AutoConfig, FlaxAutoModel

                hf = FlaxAutoModel.from_config(AutoConfig.from_pretrained(self.model_name))
        except Exception as e:
            raise RuntimeError(
                f"Could not load a Flax version of '{self.model_name}'. "
                "HF text towers require an architecture with a Flax port "
                "(e.g. bert, roberta, t5); torch-only architectures are not "
                "supported on the TPU path."
            ) from e
        self._hf_module = hf.module
        self._hf_params = hf.params
        self._hf_width = hf.config.hidden_size

        d_model = self._hf_width
        if self.proj_type == "linear" and d_model != self.output_dim:
            self.proj = nn.Dense(self.output_dim, use_bias=False, dtype=self.dtype, name="proj")
        elif self.proj_type == "mlp":
            hidden = (d_model + self.output_dim) // 2
            self.proj_fc1 = nn.Dense(hidden, use_bias=False, dtype=self.dtype, name="proj_fc1")
            self.proj_fc2 = nn.Dense(self.output_dim, use_bias=False, dtype=self.dtype, name="proj_fc2")

    def __call__(self, tokens: jax.Array, *, deterministic: bool = True):
        mask = (tokens != self.pad_id).astype(jnp.int32)
        out = self._hf_module.apply(
            {"params": self._hf_params}, input_ids=tokens, attention_mask=mask
        )
        hidden = out.last_hidden_state
        pooled = _pool(hidden, mask, self.pooler_type)
        if self.proj_type == "linear" and hasattr(self, "proj"):
            pooled = self.proj(pooled)
        elif self.proj_type == "mlp":
            pooled = self.proj_fc2(gelu_exact(self.proj_fc1(pooled)))
        if self.output_tokens:
            return pooled, hidden
        return pooled
