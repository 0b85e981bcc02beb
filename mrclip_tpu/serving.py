"""Model export + serving: AOT-compiled/StableHLO inference artifacts.

The reference's deployment story is TorchScript (`--torchscript`/`--trace`,
reference main.py:293-294, model.py:574-587). The TPU-native equivalent is
`jax.export`: the jitted encode functions serialize to portable StableHLO
that reloads and runs without Python model code — suitable for serving
stacks and cross-version deployment.

API:
  exp = export_model(model, variables, batch_size=32)      # in-memory
  save_exported(exp, "model.mrclip")                        # bytes on disk
  served = load_exported("model.mrclip")                    # -> callables
  served.encode_image(images); served.encode_text(tokens); served.logits(...)
"""

from __future__ import annotations

import dataclasses
import json
import zipfile
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["export_model", "save_exported", "load_exported", "ServedModel"]


@dataclasses.dataclass
class ExportedModel:
    """In-memory export: raw `jax.export.Exported` programs + callable
    encoders (`Exported` objects themselves are not callable — use the
    methods, exactly like the post-load `ServedModel`)."""

    exported_image: Any  # jax.export.Exported
    exported_text: Any
    meta: dict

    def encode_image(self, images) -> np.ndarray:
        return self.exported_image.call(jnp.asarray(images, jnp.float32))

    def encode_text(self, tokens) -> np.ndarray:
        return self.exported_text.call(jnp.asarray(tokens, jnp.int32))

    def logits(self, images: np.ndarray, tokens: np.ndarray) -> np.ndarray:
        img = self.encode_image(images)
        txt = self.encode_text(tokens)
        return (
            self.meta.get("logit_scale", 100.0) * np.asarray(img) @ np.asarray(txt).T
            + self.meta.get("logit_bias", 0.0)
        )


@dataclasses.dataclass
class ServedModel:
    encode_image: Callable[[np.ndarray], np.ndarray]
    encode_text: Callable[[np.ndarray], np.ndarray]
    meta: dict

    def logits(self, images: np.ndarray, tokens: np.ndarray) -> np.ndarray:
        img = self.encode_image(images)
        txt = self.encode_text(tokens)
        return (
            self.meta.get("logit_scale", 100.0) * np.asarray(img) @ np.asarray(txt).T
            + self.meta.get("logit_bias", 0.0)
        )


def export_model(
    model,
    variables: dict,
    *,
    batch_size: Optional[int] = None,
    image_size: Optional[Tuple[int, int]] = None,
    context_length: Optional[int] = None,
    int8: bool = False,
    tokenizer_name: Optional[str] = None,
) -> ExportedModel:
    """Export the two encoders as StableHLO with params baked in.

    `batch_size=None` exports with a symbolic batch dimension (any batch at
    serve time); fixed sizes produce maximally-optimized programs.
    `int8=True` exports W8A8-quantized encoders (ops/quant.py): int8 MXU
    matmuls and ~4x smaller weight constants in the artifact.
    """
    from jax import export as jexport

    cfg_vision = getattr(model, "vision_cfg", None)
    img_hw = image_size
    if img_hw is None:
        size = cfg_vision["image_size"] if isinstance(cfg_vision, dict) else getattr(cfg_vision, "image_size", 224)
        if hasattr(size, "items"):
            size = dict(size).get("image_size", 224)
        img_hw = (size, size) if isinstance(size, int) else tuple(size)
    cfg_text = getattr(model, "text_cfg", None)
    ctx = context_length
    if ctx is None:
        ctx = cfg_text["context_length"] if isinstance(cfg_text, dict) else getattr(cfg_text, "context_length", 98)

    if batch_size is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = batch_size

    img_spec = jax.ShapeDtypeStruct((b,) + tuple(img_hw) + (3,), jnp.float32)
    tok_spec = jax.ShapeDtypeStruct((b, ctx), jnp.int32)

    # Trainable scale lives in params; frozen scale (logitscaletrainable=False,
    # reference model.py:254-258) lives in the constants collection.
    scale = variables.get("params", {}).get("logit_scale")
    if scale is None:
        scale = variables.get("constants", {}).get("logit_scale")
    bias = variables.get("params", {}).get("logit_bias")

    if int8:
        from .ops.quant import make_quantized_apply, quantize_dense_kernels

        variables, qkernels = quantize_dense_kernels(variables)
        qapply = make_quantized_apply(model)

        def enc_img(images):
            return qapply(variables, qkernels, images, None)["image_features"]

        def enc_txt(tokens):
            return qapply(variables, qkernels, None, tokens)["text_features"]

    else:

        def enc_img(images):
            out = model.apply(variables, images, None)
            return out["image_features"]

        def enc_txt(tokens):
            out = model.apply(variables, None, tokens)
            return out["text_features"]

    exp_img = jexport.export(jax.jit(enc_img))(img_spec)
    exp_txt = jexport.export(jax.jit(enc_txt))(tok_spec)

    meta = {
        "image_size": list(img_hw),
        "context_length": int(ctx),
        "int8": bool(int8),
        # None = symbolic batch (any size; enables server-side dynamic
        # batching); an int pins the only accepted batch size.
        "batch_size": batch_size,
        # "clip-bpe" = SimpleTokenizer; anything else is an HF tokenizer
        # name the serve layer must use (HF text towers expect its ids).
        "tokenizer": tokenizer_name or "clip-bpe",
        "logit_scale": float(np.exp(np.asarray(scale))) if scale is not None else 100.0,
        # SigLIP-style additive bias (0.0 for plain CLIP): logits = s*sim + b.
        "logit_bias": float(np.asarray(bias)) if bias is not None else 0.0,
    }
    return ExportedModel(exp_img, exp_txt, meta)


def save_exported(exported: ExportedModel, path: str) -> None:
    """Serialize both encoders + metadata into one zip artifact."""
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("encode_image.hlo", exported.exported_image.serialize())
        zf.writestr("encode_text.hlo", exported.exported_text.serialize())
        zf.writestr("meta.json", json.dumps(exported.meta))


def load_exported(path: str) -> ServedModel:
    """Load a serialized artifact into callables (no model code needed)."""
    from jax import export as jexport

    with zipfile.ZipFile(path) as zf:
        exp_img = jexport.deserialize(zf.read("encode_image.hlo"))
        exp_txt = jexport.deserialize(zf.read("encode_text.hlo"))
        meta = json.loads(zf.read("meta.json"))

    return ServedModel(
        encode_image=lambda x: exp_img.call(jnp.asarray(x, jnp.float32)),
        encode_text=lambda t: exp_txt.call(jnp.asarray(t, jnp.int32)),
        meta=meta,
    )
