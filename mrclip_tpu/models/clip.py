"""CLIP model assembly: dual towers + temperature, TPU-first.

Capability parity with reference `src/open_clip/model.py`:
- `CLIPVisionCfg` / `CLIPTextCfg` dataclasses (:26-84),
- `CLIP` combined module (:222-332) with `encode_image` / `encode_text` /
  `get_logits` / `__call__` and the MR-CLIP `logit_scale_trainable` toggle
  (:236,254-258),
- `CustomTextCLIP` (:370-460) — in JAX both variants collapse into one
  module holding separate tower submodules (params are a pytree either way),
- MR-CLIP extras `SimCLRProjectionHead` (:334-344) and `TabularEncoder`
  (:346-368; rebuilt working — the reference references an undefined `args`).

Precision: params live in fp32; `dtype=bfloat16` sets the compute/activation
dtype (the autocast equivalent). The logit scale is always fp32.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Any, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import gelu_exact, gelu_tanh, quick_gelu
from .resnet import ModifiedResNet
from .text import TextTransformer
from .vision import VisionTransformer

Dtype = Any


def _select_act(quick_gelu_act):
    """Activation selector: True/'quick' -> QuickGELU, 'tanh' -> tanh-approx
    GELU (throughput mode), else exact erf GELU (torch parity default)."""
    if quick_gelu_act is True or quick_gelu_act == "quick":
        return quick_gelu
    if quick_gelu_act == "tanh":
        return gelu_tanh
    return gelu_exact


def _resolve_act_norm(act_sel, act_kwargs, norm_kwargs, what):
    """Config-level act/norm kwargs (reference model.py:144-147, 195-198:
    `partial(act_layer, **act_kwargs)` / `partial(norm_layer, **norm_kwargs)`)
    — CLIPA configs carry GELU approximate='tanh' + LN eps 1e-6 (they were
    trained in JAX, whose defaults those are). The quick-gelu force flag and
    the tanh throughput mode override act_kwargs; unknown keys raise rather
    than silently changing numerics. Returns (act, ln_eps)."""
    act = _select_act(act_sel)
    if act_kwargs and not (act_sel is True or act_sel in ("quick", "tanh")):
        unknown = set(act_kwargs) - {"approximate"}
        if unknown:
            raise NotImplementedError(
                f"unsupported {what} act_kwargs keys: {sorted(unknown)}"
            )
        approx = act_kwargs.get("approximate", "none")
        if approx == "tanh":
            act = gelu_tanh
        elif approx not in ("none", None):
            raise NotImplementedError(f"unsupported GELU approximate={approx!r}")
    ln_eps = 1e-5
    if norm_kwargs:
        unknown = set(norm_kwargs) - {"eps"}
        if unknown:
            raise NotImplementedError(
                f"unsupported {what} norm_kwargs keys: {sorted(unknown)}"
            )
        ln_eps = float(norm_kwargs["eps"])
    return act, ln_eps


@dataclass
class CLIPVisionCfg:
    """Vision tower config (reference model.py:26-54)."""

    layers: Union[Tuple[int, int, int, int], int] = 12
    width: int = 768
    head_width: int = 64
    mlp_ratio: float = 4.0
    patch_size: int = 16
    image_size: Union[int, Tuple[int, int]] = 224
    ls_init_value: Optional[float] = None
    patch_dropout: float = 0.0
    attentional_pool: bool = False
    attn_pooler_queries: int = 256
    attn_pooler_heads: int = 8
    no_ln_pre: bool = False
    pos_embed_type: str = "learnable"
    final_ln_after_pool: bool = False
    pool_type: str = "tok"
    output_tokens: bool = False
    act_kwargs: Optional[dict] = None
    norm_kwargs: Optional[dict] = None
    # SwiGLU towers (EVA02): hold gate||value as one fused [D, 2H] param
    # (throughput option; see models.layers.SwiGLU.fused_gate).
    mlp_fused_gate: bool = False
    # timm adapter surface (reference :47-54); resolved by the factory.
    timm_model_name: Optional[str] = None
    timm_model_pretrained: bool = False
    timm_pool: str = "avg"
    timm_proj: str = "linear"
    timm_proj_bias: bool = False
    timm_drop: float = 0.0
    timm_drop_path: Optional[float] = None
    # Deploy-import mode for the native MobileCLIP towers: conv-side norms
    # become folded-BN affines (and the FastViT stem takes the 3-conv
    # MobileOne layout) so released Apple conv+BN checkpoints convert
    # exactly. Set automatically by the factory when `pretrained` points at
    # an Apple-layout MobileCLIP state dict (convert.py).
    timm_deploy_import: bool = False


@dataclass
class CLIPTextCfg:
    """Text tower config (reference model.py:57-84)."""

    context_length: int = 98
    vocab_size: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12
    mlp_ratio: float = 4.0
    ls_init_value: Optional[float] = None
    embed_cls: bool = False
    pad_id: Optional[int] = None  # None: HF towers fall back to the HF
    # config's pad_token_id (reference hf_model.py uses config.pad_token_id);
    # native towers use 0.
    dropout: float = 0.0
    no_causal_mask: bool = False
    final_ln_after_pool: bool = False
    pool_type: str = "argmax"
    proj_bias: bool = False
    output_tokens: bool = False
    act_kwargs: Optional[dict] = None
    norm_kwargs: Optional[dict] = None
    # HF adapter surface (reference :76-82); resolved by the factory.
    hf_model_name: Optional[str] = None
    hf_model_pretrained: bool = True
    hf_tokenizer_name: Optional[str] = None
    hf_proj_type: str = "mlp"
    hf_pooler_type: str = "mean_pooler"
    # Inline HF config dict: builds the tower with zero hub access (the
    # pretrained-weight overlay is separate; see factory.create_model).
    hf_model_config: Optional[dict] = None


def _filter_cfg(cfg_cls, d):
    if isinstance(d, cfg_cls):
        return d
    names = {f.name for f in dataclasses.fields(cfg_cls)}
    return cfg_cls(**{k: v for k, v in dict(d).items() if k in names})


_TIMM_VIT_DIMS = {
    # width, layers, heads (timm vit_* family)
    "tiny": (192, 12, 3),
    "small": (384, 12, 6),
    "base": (768, 12, 12),
    "large": (1024, 24, 16),
    "huge": (1280, 32, 16),
    # SigLIP shape-optimized 400M (big_vision): mlp hidden 4304
    "so400m": (1152, 27, 16),
}
_TIMM_VIT_MLP_RATIO = {"so400m": 4304 / 1152}


def timm_vision_depth(tname: Optional[str]) -> int:
    """Transformer depth of a supported timm vision-tower name (0 for conv
    towers / unknown names). Used by the factory's scan/unroll heuristic so
    that e.g. 40-layer eva_giant and 64-layer eva02_enormous stay scanned."""
    import re as _re

    if not tname:
        return 0
    if tname.startswith("convnext"):
        return 0
    if tname.startswith("eva_giant"):
        return 40
    m = _re.match(r"eva02_(base|large|enormous)_", tname)
    if m:
        return {"base": 12, "large": 24, "enormous": 64}[m.group(1)]
    m = _re.match(r"vit_([a-z0-9]+)_patch", tname)
    if m and m.group(1) in _TIMM_VIT_DIMS:
        return _TIMM_VIT_DIMS[m.group(1)][1]
    return 0


def _build_timm_vit_tower(
    embed_dim, vision_cfg, dtype, scan_layers, remat, remat_policy, attn_impl,
    name, act=gelu_exact,
) -> nn.Module:
    """TPU-native stand-in for the reference TimmModel vision adapter
    (`src/open_clip/timm_model.py:29-153`): `vit_*_patch*` names build the
    native VisionTransformer with timm conventions (patch-embed bias, no
    pre-LN unless a `_clip_` variant, final norm before pool) and
    `convnext_*` names build the native NHWC ConvNeXt; matching timm
    checkpoints load via `convert.timm_vit_to_vision_params` /
    `convert.timm_convnext_to_vision_params`. Other timm families
    (efficientnet, ...) have no TPU port."""
    import re as _re

    tname = vision_cfg.timm_model_name
    if tname in ("convnext",) or tname.startswith("convnext_"):
        from .convnext import CONVNEXT_DIMS, ConvNeXt

        if tname not in CONVNEXT_DIMS:
            raise NotImplementedError(
                f"timm convnext variant '{tname}' has no TPU-native stage "
                f"table; supported: {sorted(CONVNEXT_DIMS)}"
            )
        # The native tower implements avg-pool + bias-free linear proj
        # (convnext_base_w checkpoints) or the timm Mlp head (proj='mlp',
        # convnext_large_d); reject other head configurations loudly like
        # the ViT path does.
        if vision_cfg.timm_pool not in ("avg", ""):
            raise NotImplementedError(
                f"timm_pool='{vision_cfg.timm_pool}' unsupported for the "
                "native ConvNeXt (avg pooling only)"
            )
        if vision_cfg.timm_proj not in ("linear", "mlp", "none"):
            raise NotImplementedError(
                f"timm_proj='{vision_cfg.timm_proj}' unsupported for the "
                "native ConvNeXt (linear | mlp | none)"
            )
        if vision_cfg.timm_proj_bias:
            raise NotImplementedError(
                "timm_proj_bias=True unsupported: the native ConvNeXt "
                "projection is bias-free"
            )
        depths, dims = CONVNEXT_DIMS[tname]
        return ConvNeXt(
            depths=depths, dims=dims,
            output_dim=None if vision_cfg.timm_proj == "none" else embed_dim,
            proj_type="mlp" if vision_cfg.timm_proj == "mlp" else "linear",
            drop_path=vision_cfg.timm_drop_path or 0.0,
            act=act, remat=remat, dtype=dtype, name=name,
        )
    m_eva = _re.match(r"eva_giant_patch14(?:_clip)?_(224|336)$", tname)
    if m_eva:
        # EVA01 giant (reference EVA01-g-14 tags): a plain pre-LN ViT —
        # width 1408, 40 layers, 16 heads (head dim 88), MLP hidden 6144 —
        # with token pooling and norm-before-pool; the only EVA quirk is
        # the split q/v bias, handled in convert.timm_vit_to_vision_params.
        if vision_cfg.timm_pool not in ("token", "tok", ""):
            raise NotImplementedError(
                f"timm_pool='{vision_cfg.timm_pool}' unsupported for EVA "
                "giant (token pooling only)"
            )
        return VisionTransformer(
            image_size=vision_cfg.image_size or int(m_eva.group(1)),
            patch_size=14,
            width=1408,
            layers=40,
            heads=16,
            mlp_ratio=6144 / 1408,
            output_dim=None if vision_cfg.timm_proj in ("none",) else embed_dim,
            patch_bias=True,
            no_ln_pre=True,
            pool_type="tok",
            attn_zero_k_bias=True,  # timm eva.py: k_bias is a zeros buffer
            ln_eps=1e-6,  # timm Eva norm_layer eps (r3 fix: was torch-default 1e-5)
            drop_path=vision_cfg.timm_drop_path or 0.0,
            act=act,
            attn_impl=attn_impl,
            scan_layers=scan_layers,
            remat=remat,
            remat_policy=remat_policy,
            dtype=dtype,
            name=name,
        )
    m_eva02 = _re.match(
        r"eva02_(base|large|enormous)_patch(\d+)(?:_plus)?_clip_(224|336)$", tname
    )
    if m_eva02:
        # EVA02 CLIP towers (timm eva.py; reference pretrained.py:454-474).
        # B/L: pre-norm blocks with axial 2D rope (+ learned abs pos),
        # SwiGLU MLP (hidden = int(width*8/3)) with sub-LN, inner attention
        # LN, split q/k/v projections (k bias-free — the converter fuses
        # with a zero k-bias segment). E (enormous): post-norm blocks,
        # fused qkv, plain GELU MLP, no rope. All use LN eps 1e-6.
        size, res = m_eva02.group(1), int(m_eva02.group(3))
        width, layers, heads = {
            "base": (768, 12, 12),
            "large": (1024, 24, 16),
            "enormous": (1792, 64, 16),
        }[size]
        if vision_cfg.timm_pool not in ("token", "tok", ""):
            raise NotImplementedError(
                f"timm_pool='{vision_cfg.timm_pool}' unsupported for EVA02 "
                "(token pooling only)"
            )
        enormous = size == "enormous"
        return VisionTransformer(
            image_size=vision_cfg.image_size or res,
            patch_size=int(m_eva02.group(2)),
            width=width,
            layers=layers,
            heads=heads,
            mlp_ratio=(15360 / 1792) if enormous else (4 * 2 / 3),
            output_dim=None if vision_cfg.timm_proj in ("none",) else embed_dim,
            patch_bias=True,
            no_ln_pre=True,
            pool_type="tok",
            use_rope=not enormous,
            # MIM pretraining grid (224/14); fine-tuned resolutions rescale
            # their patch coordinates onto it (timm ref_feat_shape).
            rope_ref_feat_shape=None if enormous else (16, 16),
            mlp_type="mlp" if enormous else "swiglu",
            mlp_norm=not enormous,
            mlp_fused_gate=vision_cfg.mlp_fused_gate and not enormous,
            attn_inner_norm=not enormous,
            attn_zero_k_bias=True,  # timm eva.py: k_bias is a zeros buffer
            post_norm_blocks=enormous,
            ln_eps=1e-6,
            drop_path=vision_cfg.timm_drop_path or 0.0,
            act=act,
            attn_impl=attn_impl,
            scan_layers=scan_layers,
            remat=remat,
            remat_policy=remat_policy,
            dtype=dtype,
            name=name,
        )
    if tname.startswith("eva02_"):
        raise NotImplementedError(
            f"timm model '{tname}' (EVA02) has no TPU-native mapping for "
            "this variant; supported: eva02_{base,large,enormous}[_plus]"
            "_patch{14,16}_clip_{224,336} and EVA01 giant "
            "(eva_giant_patch14_*)."
        )
    if tname.startswith("vitamin_"):
        # ViTamin hybrids (reference pretrained.py:554-599 tags; the
        # reference needs timm's vitamin module). Native NHWC build —
        # see models/vitamin.py PROVENANCE note (paper-recalled dims,
        # conversion gated on an oracle).
        from .vitamin import VITAMIN_DIMS, ViTamin

        if tname not in VITAMIN_DIMS:
            raise NotImplementedError(
                f"timm vitamin variant '{tname}' has no TPU-native stage "
                f"table; supported: {sorted(VITAMIN_DIMS)}"
            )
        depths, dims, vheads = VITAMIN_DIMS[tname]
        if vision_cfg.timm_pool not in ("avg", ""):
            raise NotImplementedError(
                f"timm_pool='{vision_cfg.timm_pool}' unsupported for the "
                "native ViTamin (global average pooling only)"
            )
        return ViTamin(
            image_size=vision_cfg.image_size or 224,
            depths=depths,
            dims=dims,
            heads=vheads,
            output_dim=None if vision_cfg.timm_proj == "none" else embed_dim,
            drop_path=vision_cfg.timm_drop_path or 0.0,
            act=act,
            attn_impl=attn_impl,
            scan_layers=scan_layers,
            remat=remat,
            remat_policy=remat_policy,
            dtype=dtype,
            name=name,
        )
    if tname.startswith("fastvit_") or tname == "vit_base_mci_224":
        # MobileCLIP towers (reference pretrained.py:545-552 tags;
        # convert.py:152-199 expects timm fastvit / hybrid-ViT modules).
        # Native deploy-form build — see models/fastvit.py PROVENANCE.
        from .fastvit import FASTVIT_DIMS, FastViT, HybridViT

        deploy = getattr(vision_cfg, "timm_deploy_import", False)
        if tname == "vit_base_mci_224":
            return HybridViT(
                image_size=vision_cfg.image_size or 224,
                output_dim=None if vision_cfg.timm_proj == "none" else embed_dim,
                act=act,
                attn_impl=attn_impl,
                scan_layers=scan_layers,
                remat=remat,
                remat_policy=remat_policy,
                norm="affine" if deploy else "ln",
                dtype=dtype,
                name=name,
            )
        if tname not in FASTVIT_DIMS:
            raise NotImplementedError(
                f"timm fastvit variant '{tname}' has no TPU-native stage "
                f"table; supported: {sorted(FASTVIT_DIMS)} (MobileCLIP MCi)"
            )
        depths, dims, mlp_ratio = FASTVIT_DIMS[tname]
        return FastViT(
            image_size=vision_cfg.image_size or 256,
            depths=depths,
            dims=dims,
            mlp_ratio=mlp_ratio,
            output_dim=None if vision_cfg.timm_proj == "none" else embed_dim,
            act=act,
            attn_impl=attn_impl,
            scan_layers=scan_layers,
            remat=remat,
            remat_policy=remat_policy,
            norm="affine" if deploy else "ln",
            stem="3conv" if deploy else "2conv",
            dtype=dtype,
            name=name,
        )
    m = _re.match(
        r"vit_(tiny|small|base|large|huge|so400m)_patch(\d+)((?:_[a-z0-9]+)*?)_(\d+)$",
        tname,
    )
    if not m:
        raise NotImplementedError(
            f"timm model '{tname}' has no TPU-native mapping; supported: the "
            "vit_{tiny,small,base,large,huge,so400m}_patch{P}[_clip|_siglip]_{RES} "
            "family, convnext_{tiny,small,base,large,xlarge}, and "
            "eva_giant_patch14_{224,336} "
            "(reference timm_model.py:29-153). Use a native ViT/RN config for "
            "other architectures."
        )
    size, patch, variant, res = m.group(1), int(m.group(2)), m.group(3), int(m.group(4))
    width, layers, heads = _TIMM_VIT_DIMS[size]
    is_siglip = "_siglip" in variant
    if vision_cfg.timm_proj not in ("linear", "") and not (
        is_siglip and vision_cfg.timm_proj == "none"
    ):
        raise NotImplementedError(
            f"timm_proj='{vision_cfg.timm_proj}' not supported on the native "
            "tower (linear only; reference timm_model.py:81-95)"
        )
    if vision_cfg.timm_proj_bias:
        raise NotImplementedError("timm_proj_bias not supported (linear no-bias proj)")
    if is_siglip:
        # SigLIP ViTs (big_vision): no CLS token, no pre-LN, MAP attention
        # pooling, identity head (embed_dim == width). Reference webli tags
        # wrap these through TimmModel with pool='map', proj='none'.
        pool = "map" if vision_cfg.timm_pool in ("map", "") else vision_cfg.timm_pool
        if vision_cfg.timm_proj in ("none", "") and embed_dim != width:
            raise ValueError(
                f"SigLIP tower '{tname}' with timm_proj=none needs "
                f"embed_dim == width ({width}), got {embed_dim}"
            )
        if act is gelu_exact:
            # timm siglip model defs bake act_layer='gelu_tanh' (big_vision
            # nn.gelu default); only an explicit quick-gelu/act_kwargs
            # override should deviate.
            act = gelu_tanh
        return VisionTransformer(
            image_size=vision_cfg.image_size or res,
            patch_size=patch,
            width=width,
            layers=layers,
            heads=heads,
            mlp_ratio=_TIMM_VIT_MLP_RATIO.get(size, 4.0),
            output_dim=None if vision_cfg.timm_proj in ("none", "") else embed_dim,
            patch_bias=True,
            use_cls_token=False,
            no_ln_pre=True,
            pool_type=pool,
            drop_path=vision_cfg.timm_drop_path or 0.0,
            act=act,
            ln_eps=1e-6,  # timm ViT default norm_layer eps (big_vision)
            attn_impl=attn_impl,
            scan_layers=scan_layers,
            remat=remat,
            remat_policy=remat_policy,
            dtype=dtype,
            name=name,
        )
    return VisionTransformer(
        image_size=vision_cfg.image_size or res,
        patch_size=patch,
        width=width,
        layers=layers,
        heads=heads,
        output_dim=embed_dim,
        patch_bias=True,
        no_ln_pre="_clip" not in variant,  # timm CLIP variants carry norm_pre
        pool_type="avg" if vision_cfg.timm_pool == "avg" else "tok",
        drop_path=vision_cfg.timm_drop_path or 0.0,
        act=act,
        # timm _clip variants pin norm_layer=nn.LayerNorm (torch 1e-5, the
        # eps CLIP weights were trained with); every other timm ViT uses
        # the vision_transformer.py default partial(LayerNorm, eps=1e-6).
        ln_eps=1e-5 if "_clip" in variant else 1e-6,
        attn_impl=attn_impl,
        scan_layers=scan_layers,
        remat=remat,
        remat_policy=remat_policy,
        dtype=dtype,
        name=name,
    )


def build_vision_tower(
    embed_dim: int,
    vision_cfg: Union[CLIPVisionCfg, dict],
    quick_gelu_act: bool = False,
    dtype: Dtype = jnp.float32,
    scan_layers: bool = True,
    remat: bool = False,
    remat_policy: str = "dots",
    attn_impl: str = "xla",
    name: str = "visual",
) -> nn.Module:
    """Select + build the vision tower (reference model.py:105-171)."""
    vision_cfg = _filter_cfg(CLIPVisionCfg, vision_cfg)
    act, ln_eps = _resolve_act_norm(
        quick_gelu_act, vision_cfg.act_kwargs, vision_cfg.norm_kwargs, "vision"
    )

    if vision_cfg.timm_model_name:
        return _build_timm_vit_tower(embed_dim, vision_cfg, dtype, scan_layers,
                                     remat, remat_policy, attn_impl, name,
                                     act=act)
    if isinstance(vision_cfg.layers, (tuple, list)):
        heads = vision_cfg.width * 32 // vision_cfg.head_width
        return ModifiedResNet(
            layers=tuple(vision_cfg.layers),
            output_dim=embed_dim,
            heads=heads,
            image_size=vision_cfg.image_size,
            width=vision_cfg.width,
            dtype=dtype,
            name=name,
        )
    heads = vision_cfg.width // vision_cfg.head_width
    return VisionTransformer(
        image_size=vision_cfg.image_size,
        patch_size=vision_cfg.patch_size,
        width=vision_cfg.width,
        layers=vision_cfg.layers,
        heads=heads,
        mlp_ratio=vision_cfg.mlp_ratio,
        ls_init_value=vision_cfg.ls_init_value,
        output_dim=embed_dim,
        patch_dropout=vision_cfg.patch_dropout,
        attentional_pool=vision_cfg.attentional_pool,
        attn_pooler_queries=vision_cfg.attn_pooler_queries,
        attn_pooler_heads=vision_cfg.attn_pooler_heads,
        no_ln_pre=vision_cfg.no_ln_pre,
        pos_embed_type=vision_cfg.pos_embed_type,
        pool_type=vision_cfg.pool_type,
        final_ln_after_pool=vision_cfg.final_ln_after_pool,
        act=act,
        ln_eps=ln_eps,
        output_tokens=vision_cfg.output_tokens,
        attn_impl=attn_impl,
        scan_layers=scan_layers,
        remat=remat,
        remat_policy=remat_policy,
        dtype=dtype,
        name=name,
    )


def build_text_tower(
    embed_dim: int,
    text_cfg: Union[CLIPTextCfg, dict],
    quick_gelu_act: bool = False,
    dtype: Dtype = jnp.float32,
    scan_layers: bool = True,
    remat: bool = False,
    remat_policy: str = "dots",
    attn_impl: str = "xla",
    name: str = "text",
) -> nn.Module:
    """Select + build the text tower (reference model.py:174-219)."""
    text_cfg = _filter_cfg(CLIPTextCfg, text_cfg)
    if text_cfg.hf_model_name:
        from .hf_text import HFTextEncoder

        return HFTextEncoder(
            model_name=text_cfg.hf_model_name,
            output_dim=embed_dim,
            proj_type=text_cfg.hf_proj_type,
            pooler_type=text_cfg.hf_pooler_type,
            pretrained=text_cfg.hf_model_pretrained,
            config=text_cfg.hf_model_config,
            pad_id=text_cfg.pad_id,
            output_tokens=text_cfg.output_tokens,
            dtype=dtype,
            name=name,
        )
    act, ln_eps = _resolve_act_norm(
        quick_gelu_act, text_cfg.act_kwargs, text_cfg.norm_kwargs, "text"
    )
    return TextTransformer(
        context_length=text_cfg.context_length,
        vocab_size=text_cfg.vocab_size,
        width=text_cfg.width,
        heads=text_cfg.heads,
        layers=text_cfg.layers,
        mlp_ratio=text_cfg.mlp_ratio,
        ls_init_value=text_cfg.ls_init_value,
        output_dim=embed_dim,
        embed_cls=text_cfg.embed_cls,
        no_causal_mask=text_cfg.no_causal_mask,
        pad_id=0 if text_cfg.pad_id is None else text_cfg.pad_id,
        pool_type=text_cfg.pool_type,
        proj_bias=text_cfg.proj_bias,
        dropout=text_cfg.dropout,
        act=act,
        ln_eps=ln_eps,
        output_tokens=text_cfg.output_tokens,
        attn_impl=attn_impl,
        scan_layers=scan_layers,
        remat=remat,
        remat_policy=remat_policy,
        dtype=dtype,
        name=name,
    )


class CLIP(nn.Module):
    """Dual-tower CLIP producing L2-normalized embeddings + logit scale.

    One module covers both the reference `CLIP` (inlined text tower,
    model.py:222-332) and `CustomTextCLIP` (separate `.text` module,
    :370-460): in JAX the tower is always a submodule and checkpoint
    importers handle either torch layout.
    """

    embed_dim: int = 512
    vision_cfg: Any = dataclasses.field(default_factory=CLIPVisionCfg)
    text_cfg: Any = dataclasses.field(default_factory=CLIPTextCfg)
    quick_gelu: bool = False
    act_impl: str = "erf"  # 'erf' (torch parity) | 'tanh' (--gelu-approx)
    init_logit_scale: float = math.log(1 / 0.07)
    init_logit_bias: Optional[float] = None
    logit_scale_trainable: bool = True  # MR-CLIP `logitscaletrainable` (model.py:254-258)
    nonscalar_logit_scale: bool = False
    scan_layers: bool = True
    remat: bool = False
    remat_policy: str = "dots"
    attn_impl: str = "xla"
    dtype: Dtype = jnp.float32

    def setup(self):
        act = True if self.quick_gelu else self.act_impl
        self.visual = build_vision_tower(
            self.embed_dim, self.vision_cfg, act, self.dtype,
            self.scan_layers, self.remat, self.remat_policy, self.attn_impl,
            name="visual",
        )
        self.text = build_text_tower(
            self.embed_dim, self.text_cfg, act, self.dtype,
            self.scan_layers, self.remat, self.remat_policy, self.attn_impl,
            name="text",
        )
        shape = (1,) if self.nonscalar_logit_scale else ()
        if self.logit_scale_trainable:
            self.logit_scale = self.param(
                "logit_scale",
                lambda key: jnp.full(shape, self.init_logit_scale, jnp.float32),
            )
        else:
            # Frozen temperature: stored as a non-trainable constant variable.
            # The reference hard-codes ln(10) here regardless of init_logit_scale
            # (model.py:254-258: `torch.ones(lshape) * np.log(10)`), so a frozen
            # run trains at scale 10, not 1/0.07.
            self.logit_scale = self.variable(
                "constants", "logit_scale",
                lambda: jnp.full(shape, math.log(10.0), jnp.float32),
            ).value
        if self.init_logit_bias is not None:
            self.logit_bias = self.param(
                "logit_bias", lambda key: jnp.full(shape, self.init_logit_bias, jnp.float32)
            )
        else:
            self.logit_bias = None

    def encode_image(self, images, normalize: bool = False, deterministic: bool = True):
        feats = self.visual(images, deterministic=deterministic)
        if isinstance(feats, tuple):
            feats = feats[0]
        if normalize:
            feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        return feats

    def encode_text(self, tokens, normalize: bool = False, deterministic: bool = True):
        feats = self.text(tokens, deterministic=deterministic)
        if isinstance(feats, tuple):
            feats = feats[0]
        if normalize:
            feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        return feats

    def get_logits(self, images, tokens, deterministic: bool = True):
        """(logits_per_image, logits_per_text) at the current temperature."""
        img = self.encode_image(images, normalize=True, deterministic=deterministic)
        txt = self.encode_text(tokens, normalize=True, deterministic=deterministic)
        scale = jnp.exp(self.logit_scale)
        logits_per_image = scale * img @ txt.T
        if self.logit_bias is not None:
            logits_per_image = logits_per_image + self.logit_bias
        return logits_per_image, logits_per_image.T

    def __call__(
        self,
        images: Optional[jax.Array] = None,
        tokens: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
    ) -> dict:
        out = {}
        if images is not None:
            out["image_features"] = self.encode_image(
                images, normalize=True, deterministic=deterministic
            )
        if tokens is not None:
            out["text_features"] = self.encode_text(
                tokens, normalize=True, deterministic=deterministic
            )
        out["logit_scale"] = jnp.exp(self.logit_scale)
        if self.logit_bias is not None:
            out["logit_bias"] = self.logit_bias
        return out


# Keep the reference's public name importable; same module either way.
CustomTextCLIP = CLIP


class SimCLRProjectionHead(nn.Module):
    """2-layer MLP projection head (reference model.py:334-344)."""

    hidden_dim: int = 2048
    output_dim: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(self.output_dim, dtype=self.dtype, name="fc2")(x)


class TabularEncoder(nn.Module):
    """MLP encoder for tabular acquisition metadata (reference model.py:346-368).

    The reference version crashes on an undefined `args`; rebuilt with the
    input dimension as an explicit field.
    """

    input_dim: int
    hidden_dim: int = 256
    output_dim: int = 512
    layers: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.layers):
            x = nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"fc{i}")(x)
            x = nn.relu(x)
        return nn.Dense(self.output_dim, dtype=self.dtype, name="head")(x)


class CLIPTabular(nn.Module):
    """Image <-> tabular-metadata contrastive model.

    The reference dispatches `--tabular` to a `CLIP_Tabular` class that is
    broken in the snapshot (factory.py:346-348, model.py:346-368 references
    undefined `args`); rebuilt working: the text tower is replaced by a
    `TabularEncoder` over the numeric/categorical acquisition features
    (SCARF-style corruption happens in the dataset). The tabular embedding
    fills the `text_features` slot so every contrastive loss works unchanged.
    """

    embed_dim: int = 512
    vision_cfg: Any = dataclasses.field(default_factory=CLIPVisionCfg)
    tabular_input_dim: int = 8
    tabular_hidden_dim: int = 256
    tabular_layers: int = 2
    quick_gelu: bool = False
    init_logit_scale: float = math.log(1 / 0.07)
    scan_layers: bool = True
    remat: bool = False
    remat_policy: str = "dots"
    attn_impl: str = "xla"
    dtype: Dtype = jnp.float32

    uses_tabular: bool = True  # train-step dispatch flag

    def setup(self):
        self.visual = build_vision_tower(
            self.embed_dim, self.vision_cfg, self.quick_gelu, self.dtype,
            self.scan_layers, self.remat, self.remat_policy, self.attn_impl,
            name="visual",
        )
        self.tabular = TabularEncoder(
            input_dim=self.tabular_input_dim,
            hidden_dim=self.tabular_hidden_dim,
            output_dim=self.embed_dim,
            layers=self.tabular_layers,
            dtype=self.dtype,
            name="tabular",
        )
        self.logit_scale = self.param(
            "logit_scale", lambda key: jnp.asarray(self.init_logit_scale, jnp.float32)
        )

    def __call__(self, images=None, tabular=None, *, deterministic: bool = True) -> dict:
        out = {}
        if images is not None:
            feats = self.visual(images, deterministic=deterministic)
            if isinstance(feats, tuple):
                feats = feats[0]
            out["image_features"] = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        if tabular is not None:
            t = self.tabular(tabular.astype(self.dtype))
            out["text_features"] = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
        out["logit_scale"] = jnp.exp(self.logit_scale)
        return out
