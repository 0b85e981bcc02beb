"""HuggingFace text tower adapter (Flax).

Capability parity with reference `src/open_clip/hf_model.py:96-193`
(`HFTextEncoder`): wraps a HF transformer as the text tower with a pooler
(mean / cls / max) and linear or MLP projection head, plus partial-layer
locking (reference `lock`, hf_model.py:171-193 — here expressed as optax
update masks, see `parallel/freeze.py`).

TPU design: the HF *Flax module class* is mounted as a flax child module, so
its weights live inside the params pytree (under `<tower>/hf/...`) — they
receive gradients, are checkpointed by orbax, shard under GSPMD rules, and
can be frozen per-layer. (Round 1 kept them as module attributes, which made
the tower silently untrainable.)

Offline builds: pass `config` (a dict mirroring the HF config JSON) to build
the architecture with zero hub access; pretrained weights are overlaid by the
factory via `load_hf_pretrained_params` when the hub is reachable.
"""

from __future__ import annotations

import inspect
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import gelu_exact

Dtype = Any

__all__ = ["HFTextEncoder", "resolve_hf_config", "load_hf_pretrained_params"]


def resolve_hf_config(model_name: str, config: Optional[dict] = None):
    """HF config from an inline dict (offline) or the hub/cache."""
    try:
        from transformers import CONFIG_MAPPING, AutoConfig
    except ImportError as e:  # pragma: no cover
        raise ImportError("transformers is required for HF text towers") from e
    if config:
        d = dict(config)
        model_type = d.pop("model_type", "bert")
        return CONFIG_MAPPING[model_type](**d)
    return AutoConfig.from_pretrained(model_name)


def _flax_module_class(hf_config):
    """The underlying flax.linen module class for a HF config (reference
    hf_model.py:117-125 uses AutoModel; torch-only archs have no Flax port)."""
    from transformers import FlaxAutoModel

    if hf_config.model_type == "m2m_100":
        # nllb-clip text tower: the reference takes the seq2seq model's
        # encoder half (hf_model.py:123-126). transformers has no Flax
        # M2M100, so the native port hosts it (models/m2m100.py).
        from .m2m100 import M2M100Encoder

        return M2M100Encoder
    if hf_config.model_type in ("t5", "mt5"):
        # Reference hf_model.py:117-126 builds the seq2seq model and keeps
        # only `.encoder`; transformers ships an encoder-only Flax class
        # (FlaxT5EncoderModule, shared by t5 and mt5) with a plain
        # (input_ids, attention_mask) signature — no decoder inputs needed.
        from transformers import FlaxT5EncoderModel

        return FlaxT5EncoderModel.module_class
    mapping = FlaxAutoModel._model_mapping
    if getattr(hf_config, "is_encoder_decoder", False):
        raise RuntimeError(
            f"HF architecture '{hf_config.model_type}' is encoder-decoder "
            "and has no encoder-only Flax class; it is not usable as a "
            "CLIP text tower here (m2m_100/nllb has a native encoder port; "
            "t5/mt5 use FlaxT5EncoderModel)."
        )
    if type(hf_config) not in mapping:
        raise RuntimeError(
            f"No Flax port for HF architecture '{hf_config.model_type}'. "
            "HF text towers on the TPU path require an encoder architecture "
            "with a Flax implementation (bert, roberta, distilbert, electra, "
            "t5, mt5, ...) or the native m2m_100 port."
        )
    return mapping[type(hf_config)].module_class


def load_hf_pretrained_params(model_name: str) -> dict:
    """Download/convert pretrained weights into a Flax params tree (no init).

    Used by the factory to overlay `params/<tower>/hf` after `model.init`.
    """
    from transformers import AutoConfig, FlaxAutoModel

    cfg = AutoConfig.from_pretrained(model_name)
    if cfg.model_type == "m2m_100":
        # No Flax M2M100 in transformers: pull the torch weights and remap
        # the encoder half onto the native module.
        from transformers import AutoModel

        from .m2m100 import m2m100_torch_encoder_to_flax

        torch_model = AutoModel.from_pretrained(model_name)
        sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
        return m2m100_torch_encoder_to_flax(sd)
    if cfg.model_type in ("t5", "mt5"):
        from transformers import FlaxT5EncoderModel

        try:
            res = FlaxT5EncoderModel.from_pretrained(model_name, _do_init=False)
        except (OSError, EnvironmentError):
            res = FlaxT5EncoderModel.from_pretrained(
                model_name, _do_init=False, from_pt=True
            )
        params = res[1] if isinstance(res, tuple) else res.params
        return jax.tree.map(jnp.asarray, dict(params))
    try:
        res = FlaxAutoModel.from_pretrained(model_name, _do_init=False)
    except (OSError, EnvironmentError):
        # Most biomed hub repos (e.g. PubMedBERT) ship only PyTorch weights;
        # convert on the fly rather than failing the flagship overlay.
        res = FlaxAutoModel.from_pretrained(model_name, _do_init=False, from_pt=True)
    if isinstance(res, tuple):  # (_do_init=False) -> (model, params)
        _, params = res
    else:
        params = res.params
    return jax.tree.map(jnp.asarray, dict(params))


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
    """HF flax transformer (as a child module named `hf`) + pooler + proj."""

    model_name: str
    output_dim: int
    proj_type: str = "mlp"  # 'linear' | 'mlp' | None
    pooler_type: str = "mean_pooler"
    pretrained: bool = True  # weight overlay happens in the factory
    config: Optional[dict] = None  # inline HF config for offline builds
    output_tokens: bool = False
    pad_id: Optional[int] = None  # None -> HF config pad_token_id (ref
    # hf_model.py masks with config.pad_token_id)
    dtype: Dtype = jnp.float32

    def setup(self):
        hf_config = resolve_hf_config(self.model_name, self.config)
        if self.pad_id is not None:
            self._pad_id = self.pad_id
        else:
            self._pad_id = getattr(hf_config, "pad_token_id", None) or 0
        module_cls = _flax_module_class(hf_config)
        # Child module: params live at <tower>/hf/... in the pytree.
        # The transformer-internal pooler only exists for cls_pooler
        # (reference hf_model.py:115,128 add_pooling_layer) — without this,
        # every pretrained load would carry dead pooler params and a
        # spurious missing-subtree warning.
        kwargs = {}
        if "add_pooling_layer" in getattr(module_cls, "__dataclass_fields__", {}):
            kwargs["add_pooling_layer"] = self.pooler_type == "cls_pooler"
        self.hf = module_cls(config=hf_config, dtype=self.dtype, **kwargs)
        # width attr varies by arch (reference hf_configs.py arch_dict:
        # bert/roberta hidden_size, t5/mt5 d_model, m2m100 d_model)
        self._hf_width = getattr(hf_config, "hidden_size", None) or hf_config.d_model

        d_model = self._hf_width
        if self.proj_type == "linear":
            # The reference builds the linear proj even when d_model ==
            # output_dim (hf_model.py:142-145 — only proj_type=None gets the
            # identity shortcut), so reference checkpoints carry its weights.
            self.proj = nn.Dense(self.output_dim, use_bias=False, dtype=self.dtype, name="proj")
        elif self.proj_type == "mlp":
            hidden = (d_model + self.output_dim) // 2
            self.proj_fc1 = nn.Dense(hidden, use_bias=False, dtype=self.dtype, name="proj_fc1")
            self.proj_fc2 = nn.Dense(self.output_dim, use_bias=False, dtype=self.dtype, name="proj_fc2")

    def __call__(self, tokens: jax.Array, *, deterministic: bool = True):
        mask = (tokens != self._pad_id).astype(jnp.int32)
        # HF flax module signatures vary by arch; fill the common optional
        # inputs the wrapper classes normally default for us.
        sig = inspect.signature(type(self.hf).__call__).parameters
        kwargs = {}
        if "token_type_ids" in sig:
            kwargs["token_type_ids"] = jnp.zeros_like(tokens)
        if "position_ids" in sig:
            if getattr(self.hf.config, "model_type", "") in (
                "roberta", "xlm-roberta", "camembert",
            ):
                # Roberta-family positions are padding-offset: pretrained
                # weights reserve rows [0, pad_idx] and real tokens start at
                # pad_idx+1 (transformers create_position_ids_from_input_ids
                # — the Flax *module* does NOT apply this itself, only the
                # PreTrainedModel wrapper does). Plain arange silently
                # shifts every position embedding by pad_idx+1.
                incremental = jnp.cumsum(mask, axis=1) * mask
                kwargs["position_ids"] = incremental + self.hf.config.pad_token_id
            else:
                kwargs["position_ids"] = jnp.broadcast_to(
                    jnp.arange(tokens.shape[1]), tokens.shape
                )
        if "head_mask" in sig:
            kwargs["head_mask"] = None
        if "deterministic" in sig:
            kwargs["deterministic"] = deterministic
        out = self.hf(input_ids=tokens, attention_mask=mask, **kwargs)
        hidden = out.last_hidden_state if hasattr(out, "last_hidden_state") else out[0]
        if (
            self.pooler_type == "cls_pooler"
            and getattr(out, "pooler_output", None) is not None
        ):
            # Reference ClsPooler defaults to use_pooler_output=True
            # (hf_model.py:64-81): BERT-family towers return the
            # transformer's tanh pooler head, not the raw CLS state.
            # Archs without a pooler head (e.g. M2M100) fall through.
            pooled = out.pooler_output
        else:
            pooled = _pool(hidden, mask, self.pooler_type)
        if self.proj_type == "linear":
            pooled = self.proj(pooled)
        elif self.proj_type == "mlp":
            pooled = self.proj_fc2(gelu_exact(self.proj_fc1(pooled)))
        if self.output_tokens:
            return pooled, hidden
        return pooled
