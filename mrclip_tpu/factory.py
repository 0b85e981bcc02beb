"""Model/loss/tokenizer factory + JSON config registry.

Capability parity with reference `src/open_clip/factory.py`:
- config registry scanning `model_configs/*.json` (:32-75): `list_models`,
  `get_model_config`, `add_model_config`,
- `get_tokenizer` (:94-138),
- `create_model` (:216-429) with force flags (quick_gelu, patch_dropout,
  image_size), precision handling, pretrained loading (torch checkpoints via
  the importer),
- `create_loss` (:432-503) — full dispatch matrix INCLUDING the three loss
  paths that are broken (NameError) in the reference snapshot
  (`--visiononly`, `--distance`, `--lam`; SURVEY.md §2.2),
- `create_model_and_transforms` (:506-564) / `create_model_from_pretrained`
  (:567-617).

JAX deltas: `create_model` returns `(module, variables)` — params are an
explicit pytree, not module state. Precision 'bf16'/'pure_bf16' sets the
compute dtype (params stay fp32; there is no GradScaler on TPU).
"""

from __future__ import annotations

import json
import logging
import os
import re
from copy import deepcopy
from functools import partial
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .losses import (
    clip_loss,
    coca_loss,
    distill_clip_loss,
    multipositive_clip_loss,
    multipositive_clip_loss_vision_only,
    multipositive_clip_loss_with_distance,
    multipositive_clip_loss_with_vision,
    siglip_loss,
)
from .models import CLIP
from .tokenizer import DEFAULT_CONTEXT_LENGTH, HFTokenizer, SimpleTokenizer
from .transforms import AugmentationCfg, PreprocessCfg, image_transform_v2, merge_preprocess_dict

__all__ = [
    "list_models",
    "get_model_config",
    "add_model_config",
    "get_tokenizer",
    "create_model",
    "create_model_and_transforms",
    "create_model_from_pretrained",
    "create_loss",
]

_MODEL_CONFIG_PATHS = [Path(__file__).parent / "model_configs/"]
_MODEL_CONFIGS: Dict[str, dict] = {}


def _natural_key(s: str):
    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s.lower())]


def _rescan_model_configs():
    global _MODEL_CONFIGS
    config_files = []
    for config_path in _MODEL_CONFIG_PATHS:
        if config_path.is_dir():
            config_files.extend(config_path.glob("*.json"))
        elif config_path.is_file() and config_path.suffix == ".json":
            config_files.append(config_path)
    for cf in config_files:
        with open(cf) as f:
            cfg = json.load(f)
        if all(k in cfg for k in ("embed_dim", "vision_cfg", "text_cfg")):
            _MODEL_CONFIGS[cf.stem] = cfg
    _MODEL_CONFIGS = dict(
        sorted(_MODEL_CONFIGS.items(), key=lambda x: _natural_key(x[0]))
    )


_rescan_model_configs()


def list_models():
    """Enumerate registered model architectures (reference factory.py:60-63)."""
    return list(_MODEL_CONFIGS.keys())


def get_model_config(model_name: str) -> Optional[dict]:
    if model_name in _MODEL_CONFIGS:
        return deepcopy(_MODEL_CONFIGS[model_name])
    return None


def add_model_config(path) -> None:
    """Register model configs from a file or directory (reference :66-75)."""
    if not isinstance(path, Path):
        path = Path(path)
    _MODEL_CONFIG_PATHS.append(path)
    _rescan_model_configs()


def get_tokenizer(
    model_name: str = "",
    context_length: Optional[int] = None,
    cache_dir: Optional[str] = None,
    **kwargs,
):
    """Model-name -> tokenizer (reference factory.py:94-138)."""
    config = get_model_config(model_name) or {}
    text_config = config.get("text_cfg", {})
    if "tokenizer_kwargs" in text_config:
        tokenizer_kwargs = dict(text_config["tokenizer_kwargs"], **kwargs)
    else:
        tokenizer_kwargs = kwargs
    if context_length is None:
        context_length = text_config.get("context_length", DEFAULT_CONTEXT_LENGTH)

    if "hf_tokenizer_name" in text_config:
        return HFTokenizer(
            text_config["hf_tokenizer_name"],
            context_length=context_length,
            cache_dir=cache_dir,
            **tokenizer_kwargs,
        )
    return SimpleTokenizer(context_length=context_length, **tokenizer_kwargs)


def _cast_dtype(precision: str):
    if precision in ("bf16", "pure_bf16", "amp_bf16", "amp_bfloat16"):
        return jnp.bfloat16
    if precision in ("fp16", "pure_fp16", "amp", "amp_fp16"):
        # TPUs have native bf16; fp16 requests map to bf16 (no GradScaler
        # needed — reference precision.py/GradScaler machinery is subsumed).
        return jnp.bfloat16
    return jnp.float32


def create_model(
    model_name: str,
    pretrained: Optional[str] = None,
    precision: str = "fp32",
    *,
    force_quick_gelu: bool = False,
    force_patch_dropout: Optional[float] = None,
    force_image_size: Optional[Union[int, Tuple[int, int]]] = None,
    force_context_length: Optional[int] = None,
    text_dropout: float = 0.0,
    logit_scale_trainable: bool = True,
    scan_layers: Optional[bool] = None,
    grad_checkpointing: bool = False,
    remat_policy: str = "dots",
    attn_impl: str = "xla",
    gelu_approx: bool = False,
    swiglu_fused: bool = False,
    init_params: bool = True,
    rng_seed: int = 0,
    **model_kwargs,
) -> Tuple[CLIP, Optional[dict]]:
    """Build a CLIP module (+ initialized or pretrained variables).

    Mirrors reference `create_model` (factory.py:216-429); returns the Flax
    module and its variables dict (None when `init_params=False` and no
    pretrained weights were requested).
    """
    model_name = model_name.replace("/", "-")
    cfg = get_model_config(model_name)
    if cfg is None:
        raise RuntimeError(f"Model config for {model_name} not found; available: {list_models()}")

    if force_quick_gelu:
        cfg["quick_gelu"] = True
    if force_patch_dropout is not None:
        cfg["vision_cfg"]["patch_dropout"] = force_patch_dropout
    if force_image_size is not None:
        cfg["vision_cfg"]["image_size"] = force_image_size
    if force_context_length is not None:
        cfg["text_cfg"]["context_length"] = force_context_length
    if text_dropout:
        # --textdropout: dropout injected into the text tower's blocks
        # (reference main.py:47-59 add_dropout).
        cfg["text_cfg"]["dropout"] = text_dropout
    if swiglu_fused:
        # SwiGLU towers (EVA02): gate||value as ONE [D, 2H] param — halves
        # the fwd x-reads and merges the bwd dx matmuls. Checkpoints in the
        # split layout are fused on load below.
        cfg["vision_cfg"]["mlp_fused_gate"] = True

    # RN50-style configs encode layers as a list; drop null patch_size.
    if cfg["vision_cfg"].get("patch_size") is None:
        cfg["vision_cfg"].pop("patch_size", None)
    cfg.update(model_kwargs)

    if (
        pretrained
        and os.path.isfile(pretrained)
        and str(cfg["vision_cfg"].get("timm_model_name", "")).startswith(
            ("fastvit_", "vit_base_mci")
        )
    ):
        # Apple-layout MobileCLIP checkpoints are conv+BN deploy weights:
        # build the tower in deploy-import mode (folded-BN affine norms,
        # MobileOne stem/head structure) so the converted params are exact.
        from .checkpoint import peek_is_mobileclip

        if peek_is_mobileclip(pretrained):
            cfg["vision_cfg"]["timm_deploy_import"] = True

    if scan_layers is None:
        # Unrolled layers measure ~35% faster than lax.scan on v5e for
        # ViT-B (and +18% for ViT-L-14: 228 vs 193 pairs/s, r3 sweep) —
        # XLA fuses across block boundaries. Scan pays off in compile time
        # for very deep stacks (ViT-H 32L, bigG 48L). Auto: unroll up to
        # 24 layers.
        v_layers = cfg["vision_cfg"].get("layers", 12)
        if cfg["vision_cfg"].get("timm_model_name"):
            # timm-named towers carry no "layers" key; resolve the real
            # depth so 40-layer EVA01-g / 64-layer EVA02-E stay scanned.
            from .models.clip import timm_vision_depth

            v_layers = timm_vision_depth(cfg["vision_cfg"]["timm_model_name"])
        n_layers = max(
            v_layers if isinstance(v_layers, int) else 0,
            cfg["text_cfg"].get("layers", 12),
        )
        scan_layers = n_layers > 24

    dtype = _cast_dtype(precision)
    is_coca = "multimodal_cfg" in cfg or "coca" in model_name.lower()
    if is_coca:
        # CoCa selection (reference factory.py:338-344).
        from .models import CoCa

        model = CoCa(
            embed_dim=cfg["embed_dim"],
            multimodal_cfg=cfg["multimodal_cfg"],
            text_cfg=cfg["text_cfg"],
            vision_cfg=cfg["vision_cfg"],
            quick_gelu=cfg.get("quick_gelu", False),
            act_impl="tanh" if gelu_approx else "erf",
            init_logit_scale=cfg.get("init_logit_scale", np.log(1 / 0.07)),
            init_logit_bias=cfg.get("init_logit_bias"),
            scan_layers=scan_layers,
            remat=grad_checkpointing,
            remat_policy=remat_policy,
            attn_impl=attn_impl,
            dtype=dtype,
        )
    else:
        model = CLIP(
            embed_dim=cfg["embed_dim"],
            vision_cfg=cfg["vision_cfg"],
            text_cfg=cfg["text_cfg"],
            quick_gelu=cfg.get("quick_gelu", False),
            act_impl="tanh" if gelu_approx else "erf",
            init_logit_scale=cfg.get("init_logit_scale", np.log(1 / 0.07)),
            init_logit_bias=cfg.get("init_logit_bias"),
            logit_scale_trainable=logit_scale_trainable,
            scan_layers=scan_layers,
            remat=grad_checkpointing,
            remat_policy=remat_policy,
            attn_impl=attn_impl,
            dtype=dtype,
        )

    variables = None
    if init_params or pretrained:
        image_size = cfg["vision_cfg"]["image_size"]
        if isinstance(image_size, int):
            image_size = (image_size, image_size)
        context_length = cfg["text_cfg"].get("context_length", DEFAULT_CONTEXT_LENGTH)
        sample_img = jnp.zeros((1,) + tuple(image_size) + (3,), jnp.float32)
        sample_txt = jnp.zeros((1, context_length), jnp.int32)
        variables = model.init(jax.random.key(rng_seed), sample_img, sample_txt)
        variables = dict(variables)  # unfreeze top level
        if precision.startswith("pure_"):
            # pure bf16: weights themselves stored low-precision (reference
            # convert_weights_to_lp, model.py:463-493). logit_scale stays fp32.
            target = jnp.bfloat16

            def cast(path, leaf):
                name = jax.tree_util.keystr(path)
                if "logit" in name:
                    return leaf
                return leaf.astype(target)

            variables["params"] = jax.tree_util.tree_map_with_path(
                cast, variables["params"]
            )

    if variables is not None and not pretrained and cfg["text_cfg"].get(
        "hf_model_name"
    ) and cfg["text_cfg"].get("hf_model_pretrained", True):
        # Skipped when a full `pretrained` checkpoint is given: that overlay
        # replaces params/text/hf anyway — downloading the HF weights first
        # would be pure waste.
        # HF text tower pretrained weights: overlay onto params/text/hf
        # (reference hf_model.py:117 loads inside the tower constructor; here
        # params are an explicit pytree so the overlay happens post-init).
        from flax.core import unfreeze

        from .models.hf_text import load_hf_pretrained_params

        try:
            hf_params = load_hf_pretrained_params(cfg["text_cfg"]["hf_model_name"])
            variables["params"] = unfreeze(variables["params"])
            tpl = variables["params"]["text"]["hf"]
            # Hub weights may carry subtrees the tower doesn't mount (e.g.
            # the transformer pooler when pooler_type != cls_pooler) — drop
            # them before the shape comparison.
            hf_params = {k: v for k, v in hf_params.items() if k in tpl}
            tpl_shapes = jax.tree.map(jnp.shape, tpl)
            new_shapes = jax.tree.map(jnp.shape, hf_params)
            if tpl_shapes != new_shapes:
                raise ValueError(
                    f"pretrained HF params do not match the built tower: "
                    f"{cfg['text_cfg']['hf_model_name']}"
                )
            variables["params"]["text"]["hf"] = hf_params
        except Exception as e:  # hub unreachable (zero-egress) or no Flax port
            logging.warning(
                f"Could not load pretrained HF text weights "
                f"({cfg['text_cfg']['hf_model_name']}): {e!r}; "
                "the text tower keeps its random initialization."
            )

    if pretrained:
        from .checkpoint import load_torch_checkpoint

        if not os.path.exists(pretrained):
            # registry tag ('openai', 'laion2b_...') -> download
            # (reference factory.py:377-415).
            from .pretrained import download_pretrained, get_pretrained_cfg

            pcfg = get_pretrained_cfg(model_name, pretrained)
            if not pcfg:
                raise RuntimeError(
                    f"Pretrained weights ({pretrained}) not found for model {model_name}."
                )
            if pcfg.get("quick_gelu") and not cfg.get("quick_gelu", False):
                logging.warning(
                    f"{pretrained} weights were trained with QuickGELU; pass "
                    "force_quick_gelu=True for correct activations."
                )
            pretrained = download_pretrained(pcfg)

        if os.path.isdir(pretrained):
            # An orbax run directory (save_checkpoint layout): restore the
            # saved train state and take its params subtree.
            from .checkpoint import load_checkpoint as load_orbax

            restored = load_orbax(pretrained)
            loaded = restored.get("params", restored)
            if isinstance(restored, dict) and restored.get("batch_stats"):
                loaded = dict(loaded)
                loaded["batch_stats"] = restored["batch_stats"]
        else:
            patch = cfg["vision_cfg"].get("patch_size")
            grid = None
            if patch is not None:
                image_size = cfg["vision_cfg"]["image_size"]
                if isinstance(image_size, int):
                    image_size = (image_size, image_size)
                grid = (image_size[0] // patch, image_size[1] // patch)
            loaded = load_torch_checkpoint(
                pretrained,
                scan_layers=scan_layers,
                image_grid=grid,
                context_length=cfg["text_cfg"].get("context_length"),
                # HF text towers (roberta/biomed): the checkpoint's
                # text.transformer.* torch keys convert against this config
                hf_text_cfg=cfg["text_cfg"]
                if cfg["text_cfg"].get("hf_model_name")
                else None,
            )

        if swiglu_fused:
            # split-layout checkpoint (fc1_g/fc1_x) -> the fused fc1 tree
            from .models.layers import fuse_swiglu_params

            loaded = fuse_swiglu_params(loaded)

        # Overlay loaded params onto the init template (keeps missing keys),
        # reporting both directions of mismatch loudly: a tower left at
        # random init or checkpoint weights with nowhere to go must never
        # pass silently as "loaded pretrained weights".
        kept_random, unconsumed = [], []

        def overlay(template, new, path=""):
            if isinstance(template, dict):
                if not isinstance(new, dict):
                    kept_random.append(path or "<root>")
                    return template
                for k in new:
                    if k not in template:
                        unconsumed.append(f"{path}/{k}")
                return {
                    k: overlay(template[k], new[k], f"{path}/{k}")
                    if k in new
                    else (kept_random.append(f"{path}/{k}") or template[k])
                    for k in template
                }
            t_shape = getattr(template, "shape", None)
            if t_shape is not None and tuple(getattr(new, "shape", ())) != tuple(t_shape):
                kept_random.append(f"{path} (shape {getattr(new, 'shape', '?')} != {t_shape})")
                return template
            # Keep the template's dtype: checkpoints load as fp32 numpy, and
            # returning them verbatim would silently undo the pure_bf16
            # param cast (2x param+opt memory — ViT-H/EVA01-g only fit the
            # chip in pure_bf16).
            t_dtype = getattr(template, "dtype", None)
            if t_dtype is not None and getattr(new, "dtype", None) != t_dtype:
                return jnp.asarray(new, t_dtype)
            return new

        # BN towers (RN50 family): the importer returns running stats under
        # a reserved "batch_stats" key — overlay the flax collection, not
        # the params tree.
        loaded_stats = loaded.pop("batch_stats", None) if isinstance(loaded, dict) else None
        variables["params"] = overlay(variables["params"], loaded)
        if loaded_stats is not None:
            if "batch_stats" in variables:
                variables["batch_stats"] = overlay(
                    variables["batch_stats"], loaded_stats, "/batch_stats"
                )
            else:
                unconsumed.append("/batch_stats (model has no BatchNorm)")
        for what, paths in (("randomly initialized (missing from checkpoint)",
                             kept_random),
                            ("in checkpoint but unused by this model",
                             unconsumed)):
            if paths:
                shown = ", ".join(paths[:8]) + ("..." if len(paths) > 8 else "")
                logging.warning(
                    f"Pretrained overlay: {len(paths)} param subtree(s) "
                    f"{what}: {shown}"
                )
        logging.info(f"Loaded pretrained weights from {pretrained}")

    return model, variables


def create_model_and_transforms(
    model_name: str,
    pretrained: Optional[str] = None,
    precision: str = "fp32",
    *,
    image_mean: Optional[Tuple[float, ...]] = None,
    image_std: Optional[Tuple[float, ...]] = None,
    image_interpolation: Optional[str] = None,
    image_resize_mode: Optional[str] = None,
    aug_cfg: Optional[Union[Dict[str, Any], AugmentationCfg]] = None,
    **kwargs,
):
    """Reference `create_model_and_transforms` (factory.py:506-564):
    (model, variables, train_transform, eval_transform)."""
    model, variables = create_model(model_name, pretrained, precision, **kwargs)

    cfg = get_model_config(model_name) or {}
    # Registry tag preprocessing first (SigLIP/webli = mean/std 0.5 + squash,
    # CLIPA = imagenet stats + bilinear squash — reference create_model
    # threads pretrained_cfg into the model's preprocess_cfg, factory.py
    # set_model_preprocess_cfg), then explicit kwargs override.
    from .pretrained import get_pretrained_cfg

    tag_pp = get_pretrained_cfg(model_name, pretrained) if pretrained else {}
    pp_base = merge_preprocess_dict(PreprocessCfg(), tag_pp)
    pp_overlay = {
        "mean": image_mean,
        "std": image_std,
        "interpolation": image_interpolation,
        "resize_mode": image_resize_mode,
        "size": kwargs.get("force_image_size") or cfg.get("vision_cfg", {}).get("image_size"),
    }
    pp_cfg = PreprocessCfg(**merge_preprocess_dict(pp_base, pp_overlay))
    train_t = image_transform_v2(pp_cfg, is_train=True, aug_cfg=aug_cfg)
    eval_t = image_transform_v2(pp_cfg, is_train=False)
    return model, variables, train_t, eval_t


def create_model_from_pretrained(
    model_name: str,
    pretrained: str,
    precision: str = "fp32",
    **kwargs,
):
    """Reference `create_model_from_pretrained` (factory.py:567-617)."""
    model, variables, _, eval_t = create_model_and_transforms(
        model_name, pretrained=pretrained, precision=precision, **kwargs
    )
    return model, variables, eval_t


def create_loss(args) -> Callable[..., dict]:
    """Flag-based loss dispatch (reference factory.py:432-503).

    `args` is any object/namespace with the reference CLI flags. Returns a
    loss callable `fn(**features, axis_name=None) -> dict` with the chosen
    hyperparameters bound. The `visiononly`/`distance`/`lam` paths — which
    NameError in the reference snapshot — are implemented here.
    """
    get = lambda name, default=None: getattr(args, name, default)

    if get("distill"):
        return partial(distill_clip_loss, gather_with_grad=get("gather_with_grad", True))
    if "coca" in (get("model", "") or "").lower():
        if get("chunked_loss"):
            # streams the vocab projection + captioning CE per sequence
            # chunk — the [B, T, 49408] logits never materialize
            from .ops.fused_loss import coca_loss_chunked

            return partial(
                coca_loss_chunked,
                caption_loss_weight=get("coca_caption_loss_weight", 2.0),
                clip_loss_weight=get("coca_contrastive_loss_weight", 1.0),
                chunk_size=get("caption_chunk_size", 16),
                gather_with_grad=get("gather_with_grad", True),
            )
        return partial(
            coca_loss,
            caption_loss_weight=get("coca_caption_loss_weight", 2.0),
            clip_loss_weight=get("coca_contrastive_loss_weight", 1.0),
            gather_with_grad=get("gather_with_grad", True),
        )
    if get("siglip"):
        return partial(siglip_loss, impl=get("loss_dist_impl", "bidir"))
    if get("multipositiveloss"):
        if get("visiononly"):
            return partial(
                multipositive_clip_loss_vision_only,
                gather_with_grad=get("gather_with_grad", True),
            )
        if get("distance"):
            return partial(
                multipositive_clip_loss_with_distance,
                delta=get("delta", 0.5),
                gather_with_grad=get("gather_with_grad", True),
            )
        if get("pallas_loss"):
            # fused Pallas kernel: logit tiles never leave VMEM
            from .ops.pallas_loss import pallas_multipositive_clip_loss

            return partial(
                pallas_multipositive_clip_loss,
                delta=get("delta", 0.5),
                gather_with_grad=get("gather_with_grad", True),
            )
        if get("chunked_loss"):
            # streaming negatives: never materializes the N x N logit matrix
            # (ops/fused_loss.py; the 32k-global-batch memory path)
            from .ops.fused_loss import chunked_multipositive_clip_loss

            return partial(
                chunked_multipositive_clip_loss,
                delta=get("delta", 0.5),
                chunk_size=get("loss_chunk_size", 1024),
                gather_with_grad=get("gather_with_grad", True),
            )
        return partial(
            multipositive_clip_loss,
            delta=get("delta", 0.5),
            gather_with_grad=get("gather_with_grad", True),
        )
    if get("lam") is not None and get("lam"):
        return partial(
            multipositive_clip_loss_with_vision,
            lam=get("lam"),
            gather_with_grad=get("gather_with_grad", True),
        )
    return partial(clip_loss, gather_with_grad=get("gather_with_grad", True))
