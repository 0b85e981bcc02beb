"""External-checkpoint converters (big_vision / SigLIP npz, MobileCLIP).

Capability parity with reference `src/open_clip/convert.py`:
- `load_big_vision_weights` (:13-150): official Google big_vision npz
  (SigLIP) -> model params. big_vision is itself a Flax codebase, so the
  mapping here is flax-to-flax (the reference has to transpose everything
  into torch layout; we don't).
- `convert_mobile_clip_state_dict` (:152-191): MobileCLIP checkpoints target
  timm towers (torch-specific); detected and rejected with guidance.
- `timm_vit_to_vision_params`: TPU-native replacement for the reference's
  TimmModel adapter (`timm_model.py:29-153`) — remaps timm ViT checkpoints
  onto the native VisionTransformer instead of wrapping timm at runtime.
- `convert_state_dict` dispatch (:193-200).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

__all__ = ["big_vision_npz_to_params", "timm_vit_to_vision_params", "convert_state_dict"]


def _fuse_qkv(w: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    """big_vision q/k/v [D, H, hd] + out [H, hd, D] -> fused in_proj/out_proj."""
    d = w[f"{prefix}query/kernel"].shape[0]

    def flat_in(name):
        k = np.asarray(w[f"{prefix}{name}/kernel"]).reshape(d, -1)
        b = np.asarray(w[f"{prefix}{name}/bias"]).reshape(-1)
        return k, b

    qk, qb = flat_in("query")
    kk, kb = flat_in("key")
    vk, vb = flat_in("value")
    out_k = np.asarray(w[f"{prefix}out/kernel"]).reshape(-1, d)
    out_b = np.asarray(w[f"{prefix}out/bias"]).reshape(-1)
    return {
        "in_proj": {
            "kernel": np.concatenate([qk, kk, vk], axis=1),
            "bias": np.concatenate([qb, kb, vb]),
        },
        "out_proj": {"kernel": out_k, "bias": out_b},
    }


def _convert_encoder_blocks(w: Mapping, prefix: str, n_layers: int, scan_layers: bool) -> dict:
    """`{prefix}Transformer/encoderblock_{i}/...` -> our block tree."""
    blocks = []
    for i in range(n_layers):
        bp = f"{prefix}Transformer/encoderblock_{i}/"
        blk = {
            "ln_1": {
                "scale": np.asarray(w[f"{bp}LayerNorm_0/scale"]),
                "bias": np.asarray(w[f"{bp}LayerNorm_0/bias"]),
            },
            "attn": _fuse_qkv(w, f"{bp}MultiHeadDotProductAttention_0/"),
            "ln_2": {
                "scale": np.asarray(w[f"{bp}LayerNorm_1/scale"]),
                "bias": np.asarray(w[f"{bp}LayerNorm_1/bias"]),
            },
            "mlp": {
                "c_fc": {
                    "kernel": np.asarray(w[f"{bp}MlpBlock_0/Dense_0/kernel"]),
                    "bias": np.asarray(w[f"{bp}MlpBlock_0/Dense_0/bias"]),
                },
                "c_proj": {
                    "kernel": np.asarray(w[f"{bp}MlpBlock_0/Dense_1/kernel"]),
                    "bias": np.asarray(w[f"{bp}MlpBlock_0/Dense_1/bias"]),
                },
            },
        }
        blocks.append(blk)
    if scan_layers:
        import jax

        stacked = jax.tree.map(lambda *xs: np.stack(xs, axis=0), *blocks)
        return {"blocks": {"block": stacked}}
    return {f"blocks_{i}": b for i, b in enumerate(blocks)}


def _count_layers(w: Mapping, prefix: str) -> int:
    n = 0
    while f"{prefix}Transformer/encoderblock_{n}/LayerNorm_0/scale" in w:
        n += 1
    return n


def big_vision_npz_to_params(w: Mapping, *, scan_layers: bool = True, **_ignored) -> dict:
    """SigLIP-style big_vision npz -> Flax params for our CLIP.

    Image tower under `img/`, text tower under `txt/`, temperature `t` and
    bias `b` at the root (SigLIP convention).
    """
    params: dict = {}

    if "params/img/embedding/kernel" in w:
        w = {k[len("params/"):]: v for k, v in w.items()}

    if "img/embedding/kernel" in w:
        n_layers = _count_layers(w, "img/")
        vis = {
            "conv1": {"kernel": np.asarray(w["img/embedding/kernel"])},
            "positional_embedding": np.asarray(w["img/pos_embedding"]).reshape(
                -1, w["img/pos_embedding"].shape[-1]
            ),
            "ln_post": {
                "scale": np.asarray(w["img/Transformer/encoder_norm/scale"]),
                "bias": np.asarray(w["img/Transformer/encoder_norm/bias"]),
            },
            "transformer": _convert_encoder_blocks(w, "img/", n_layers, scan_layers),
        }
        if "img/cls" in w:
            vis["class_embedding"] = np.asarray(w["img/cls"]).reshape(-1)
        if "img/head/kernel" in w:
            vis["proj"] = np.asarray(w["img/head/kernel"])
        if "img/MAPHead_0/probe" in w:
            # big_vision MAP pooling head -> models.layers.MAPHead
            # (reference convert.py:100-116 maps the same keys onto timm's
            # AttentionPoolLatent).
            mp = "img/MAPHead_0/"
            mha = mp + "MultiHeadDotProductAttention_0/"
            c = np.asarray(w[mp + "probe"]).shape[-1]
            qk = np.asarray(w[mha + "query/kernel"]).reshape(c, -1)
            kk = np.asarray(w[mha + "key/kernel"]).reshape(c, -1)
            vk = np.asarray(w[mha + "value/kernel"]).reshape(c, -1)
            vis["attn_pool"] = {
                "latent": np.asarray(w[mp + "probe"]).reshape(1, 1, c),
                "q": {"kernel": qk, "bias": np.asarray(w[mha + "query/bias"]).reshape(-1)},
                "kv": {
                    "kernel": np.concatenate([kk, vk], axis=1),
                    "bias": np.concatenate([
                        np.asarray(w[mha + "key/bias"]).reshape(-1),
                        np.asarray(w[mha + "value/bias"]).reshape(-1),
                    ]),
                },
                "proj": {
                    "kernel": np.asarray(w[mha + "out/kernel"]).reshape(-1, c),
                    "bias": np.asarray(w[mha + "out/bias"]),
                },
                "norm": {
                    "scale": np.asarray(w[mp + "LayerNorm_0/scale"]),
                    "bias": np.asarray(w[mp + "LayerNorm_0/bias"]),
                },
                "mlp": {
                    "c_fc": {
                        "kernel": np.asarray(w[mp + "MlpBlock_0/Dense_0/kernel"]),
                        "bias": np.asarray(w[mp + "MlpBlock_0/Dense_0/bias"]),
                    },
                    "c_proj": {
                        "kernel": np.asarray(w[mp + "MlpBlock_0/Dense_1/kernel"]),
                        "bias": np.asarray(w[mp + "MlpBlock_0/Dense_1/bias"]),
                    },
                },
            }
        params["visual"] = vis

    if "txt/Embed_0/embedding" in w:
        n_layers = _count_layers(w, "txt/")
        txt = {
            "token_embedding": {"embedding": np.asarray(w["txt/Embed_0/embedding"])},
            "positional_embedding": np.asarray(w["txt/pos_embedding"]).reshape(
                -1, w["txt/pos_embedding"].shape[-1]
            ),
            "ln_final": {
                "scale": np.asarray(w["txt/Encoder_0/encoder_norm/scale"])
                if "txt/Encoder_0/encoder_norm/scale" in w
                else np.asarray(w["txt/Transformer/encoder_norm/scale"]),
                "bias": np.asarray(w["txt/Encoder_0/encoder_norm/bias"])
                if "txt/Encoder_0/encoder_norm/bias" in w
                else np.asarray(w["txt/Transformer/encoder_norm/bias"]),
            },
            "transformer": _convert_encoder_blocks(w, "txt/", n_layers, scan_layers),
        }
        if "txt/head/kernel" in w:
            txt["text_projection"] = {
                "kernel": np.asarray(w["txt/head/kernel"]),
                "bias": np.asarray(w["txt/head/bias"]),
            }
        params["text"] = txt

    if "t" in w:
        params["logit_scale"] = np.asarray(w["t"]).reshape(())
    if "b" in w:
        params["logit_bias"] = np.asarray(w["b"]).reshape(())

    import jax.numpy as jnp
    import jax

    return jax.tree.map(jnp.asarray, params)


def timm_vit_to_vision_params(
    sd: Mapping,
    *,
    # default matches checkpoint.import_torch_state_dict so that
    # load_torch_checkpoint returns the same tree layout for every
    # checkpoint flavor when the caller does not pass scan_layers
    scan_layers: bool = True,
    image_grid=None,
    include_head: bool = False,
    **_ignored,
) -> dict:
    """timm ViT state dict -> native `VisionTransformer` params.

    TPU-native replacement for the reference's torch-module TimmModel
    adapter (`src/open_clip/timm_model.py:29-153`): instead of wrapping timm
    at runtime, the checkpoint's weights are remapped onto the native tower
    (`vit_*_patch*` family: cls_token/pos_embed/patch_embed + qkv blocks +
    final norm; `norm_pre` when present, e.g. timm's `*_clip_*` variants).
    Returns the vision-tower subtree (mount at `params['visual']`). The
    classifier `head` is dropped unless `include_head=True` (mapped to the
    contrastive `proj`).
    """
    import jax
    import jax.numpy as jnp

    from .ops.pos_embed import resize_image_pos_embed

    sd = {k: np.asarray(v) for k, v in sd.items()}
    vis: dict = {
        "conv1": {
            "kernel": sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0),
            "bias": sd["patch_embed.proj.bias"],
        },
    }
    if "cls_token" in sd:
        vis["class_embedding"] = sd["cls_token"].reshape(-1)
    # else: SigLIP-style trunk (no CLS token; MAP pooling below)
    pos = sd["pos_embed"].reshape(sd["pos_embed"].shape[-2], -1)
    if image_grid is not None:
        pos = resize_image_pos_embed(
            pos, image_grid, num_prefix_tokens=1 if "cls_token" in sd else 0
        )
    vis["positional_embedding"] = pos
    if "norm_pre.weight" in sd:  # timm CLIP-style ViTs carry a pre-norm
        vis["ln_pre"] = {"scale": sd["norm_pre.weight"], "bias": sd["norm_pre.bias"]}
    vis["ln_post"] = {"scale": sd["norm.weight"], "bias": sd["norm.bias"]}
    if "attn_pool.latent" in sd:
        # timm AttentionPoolLatent ('map' pool; SigLIP) -> models.layers.MAPHead
        vis["attn_pool"] = {
            "latent": sd["attn_pool.latent"],
            "q": {"kernel": sd["attn_pool.q.weight"].T, "bias": sd["attn_pool.q.bias"]},
            "kv": {"kernel": sd["attn_pool.kv.weight"].T, "bias": sd["attn_pool.kv.bias"]},
            "proj": {"kernel": sd["attn_pool.proj.weight"].T, "bias": sd["attn_pool.proj.bias"]},
            "norm": {"scale": sd["attn_pool.norm.weight"], "bias": sd["attn_pool.norm.bias"]},
            "mlp": {
                "c_fc": {"kernel": sd["attn_pool.mlp.fc1.weight"].T, "bias": sd["attn_pool.mlp.fc1.bias"]},
                "c_proj": {"kernel": sd["attn_pool.mlp.fc2.weight"].T, "bias": sd["attn_pool.mlp.fc2.bias"]},
            },
        }
    if include_head and "head.weight" in sd:
        vis["proj"] = sd["head.weight"].T

    import re as _re

    pat = _re.compile(r"blocks\.(\d+)\.(.+)")
    per_layer: Dict[int, Dict[str, np.ndarray]] = {}
    for key, val in sd.items():
        m = pat.match(key)
        if m:
            per_layer.setdefault(int(m.group(1)), {})[m.group(2)] = val
    if not per_layer:
        raise ValueError("not a timm ViT state dict: no blocks.N.* keys")

    def block_params(layer):
        # Original EVA02 (QuanSun EVA-CLIP) naming -> timm naming; timm's
        # own checkpoint_filter_fn does the same remap on load.
        for old, new in (
            ("mlp.w1", "mlp.fc1_g"), ("mlp.w2", "mlp.fc1_x"),
            ("mlp.w3", "mlp.fc2"), ("mlp.ffn_ln", "mlp.norm"),
            ("attn.inner_attn_ln", "attn.norm"),
        ):
            for suffix in (".weight", ".bias"):
                if old + suffix in layer:
                    layer[new + suffix] = layer.pop(old + suffix)
        if "mlp.w12.weight" in layer:
            raise NotImplementedError(
                "fused SwiGLU gate projection (mlp.w12) has no mapping; "
                "split into w1/w2 first"
            )
        if "attn.q_norm.weight" in layer:
            raise NotImplementedError(
                "per-head q/k norm (attn.q_norm/k_norm) has no TPU-native "
                "mapping on the fused-QKV tower"
            )
        if "mlp.fc1_g.weight" in layer:
            # EVA02 SwiGLU block (timm eva.py EvaBlock, qkv_fused=False):
            # separate q/k/v projections (k bias-free), inner attention LN,
            # gated MLP with sub-LN -> models.layers.SwiGLU param names.
            qkv_w = np.concatenate(
                [layer["attn.q_proj.weight"], layer["attn.k_proj.weight"],
                 layer["attn.v_proj.weight"]], axis=0,
            )
            qkv_b = np.concatenate(
                [layer["attn.q_proj.bias"],
                 np.zeros_like(layer["attn.q_proj.bias"]),
                 layer["attn.v_proj.bias"]],
            )
            attn = {
                "in_proj": {"kernel": qkv_w.T, "bias": qkv_b},
                "out_proj": {
                    "kernel": layer["attn.proj.weight"].T,
                    "bias": layer["attn.proj.bias"],
                },
            }
            if "attn.norm.weight" in layer:
                attn["norm"] = {
                    "scale": layer["attn.norm.weight"],
                    "bias": layer["attn.norm.bias"],
                }
            mlp = {
                "fc1_g": {"kernel": layer["mlp.fc1_g.weight"].T,
                          "bias": layer["mlp.fc1_g.bias"]},
                "fc1_x": {"kernel": layer["mlp.fc1_x.weight"].T,
                          "bias": layer["mlp.fc1_x.bias"]},
                "fc2": {"kernel": layer["mlp.fc2.weight"].T,
                        "bias": layer["mlp.fc2.bias"]},
            }
            if "mlp.norm.weight" in layer:
                mlp["norm"] = {"scale": layer["mlp.norm.weight"],
                               "bias": layer["mlp.norm.bias"]}
            return {
                "ln_1": {"scale": layer["norm1.weight"], "bias": layer["norm1.bias"]},
                "attn": attn,
                "ln_2": {"scale": layer["norm2.weight"], "bias": layer["norm2.bias"]},
                "mlp": mlp,
            }
        if "attn.q_proj.weight" in layer:
            # split q/k/v but plain MLP (no known timm family; map anyway)
            layer = dict(layer)
            layer["attn.qkv.weight"] = np.concatenate(
                [layer["attn.q_proj.weight"], layer["attn.k_proj.weight"],
                 layer["attn.v_proj.weight"]], axis=0,
            )
            layer["attn.q_bias"] = layer["attn.q_proj.bias"]
            layer["attn.v_bias"] = layer["attn.v_proj.bias"]
        if "attn.qkv.bias" in layer:
            qkv_bias = layer["attn.qkv.bias"]
        elif "attn.q_bias" in layer:
            # EVA/BEiT quirk: separate q/v biases, k bias fixed at zero
            # (timm eva.py EvaAttention with qkv_fused=True).
            qkv_bias = np.concatenate([
                layer["attn.q_bias"],
                np.zeros_like(layer["attn.q_bias"]),
                layer["attn.v_bias"],
            ])
        else:
            qkv_bias = np.zeros(layer["attn.qkv.weight"].shape[0],
                                layer["attn.qkv.weight"].dtype)
        return {
            "ln_1": {"scale": layer["norm1.weight"], "bias": layer["norm1.bias"]},
            "attn": {
                "in_proj": {
                    "kernel": layer["attn.qkv.weight"].T,
                    "bias": qkv_bias,
                },
                "out_proj": {
                    "kernel": layer["attn.proj.weight"].T,
                    "bias": layer["attn.proj.bias"],
                },
            },
            "ln_2": {"scale": layer["norm2.weight"], "bias": layer["norm2.bias"]},
            "mlp": {
                "c_fc": {"kernel": layer["mlp.fc1.weight"].T, "bias": layer["mlp.fc1.bias"]},
                "c_proj": {"kernel": layer["mlp.fc2.weight"].T, "bias": layer["mlp.fc2.bias"]},
            },
        }

    blocks = [block_params(per_layer[i]) for i in range(max(per_layer) + 1)]
    if scan_layers:
        vis["transformer"] = {
            "blocks": {"block": jax.tree.map(lambda *xs: np.stack(xs, axis=0), *blocks)}
        }
    else:
        vis["transformer"] = {f"blocks_{i}": blk for i, blk in enumerate(blocks)}
    return jax.tree.map(jnp.asarray, vis)


def timm_convnext_to_vision_params(sd: Mapping, **_ignored) -> dict:
    """timm ConvNeXt state dict -> native `ConvNeXt` params.

    timm layout: `stem.{0,1}` (conv, LN), `stages.{s}.blocks.{b}.{conv_dw,
    norm, mlp.fc1, mlp.fc2, gamma}`, `stages.{s}.downsample.{0,1}` (LN,
    conv) for s>=1, and the final norm as `head.norm` (timm NormMlpHead) or
    bare `norm` / `norm_pre` depending on vintage. Conv kernels transpose
    OIHW -> HWIO (depthwise [D,1,7,7] -> [7,7,1,D]).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    out: dict = {}

    def conv(key_w, key_b=None):
        p = {"kernel": sd[key_w].transpose(2, 3, 1, 0)}
        if key_b and key_b in sd:
            p["bias"] = sd[key_b]
        return p

    def ln(prefix):
        return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    if "stages.0.blocks.0.gamma" not in sd:
        # ConvNeXt-V2 replaces LayerScale gamma with GRN — different math,
        # not a rename; reject with guidance like the other families.
        raise NotImplementedError(
            "checkpoint is not a ConvNeXt-V1 layout (no LayerScale gamma — "
            "likely ConvNeXt-V2/GRN, which has no TPU-native mapping); "
            "supported: timm convnext_{tiny,small,base,large,xlarge}"
        )
    out["stem_conv"] = conv("stem.0.weight", "stem.0.bias")
    out["stem_norm"] = ln("stem.1")

    stages = sorted({
        int(k.split(".")[1]) for k in sd if k.startswith("stages.")
    })
    for s in stages:
        if f"stages.{s}.downsample.0.weight" in sd:
            out[f"downsample_{s}_norm"] = ln(f"stages.{s}.downsample.0")
            out[f"downsample_{s}_conv"] = conv(
                f"stages.{s}.downsample.1.weight", f"stages.{s}.downsample.1.bias"
            )
        blocks = sorted({
            int(k.split(".")[3])
            for k in sd
            if k.startswith(f"stages.{s}.blocks.")
        })
        for b in blocks:
            p = f"stages.{s}.blocks.{b}."
            out[f"stages_{s}_blocks_{b}"] = {
                "conv_dw": conv(p + "conv_dw.weight", p + "conv_dw.bias"),
                "norm": ln(p + "norm"),
                "mlp_fc1": {
                    "kernel": sd[p + "mlp.fc1.weight"].T,
                    "bias": sd[p + "mlp.fc1.bias"],
                },
                "mlp_fc2": {
                    "kernel": sd[p + "mlp.fc2.weight"].T,
                    "bias": sd[p + "mlp.fc2.bias"],
                },
                "gamma": sd[p + "gamma"],
            }

    if "head.norm.weight" in sd:
        out["head_norm"] = ln("head.norm")
    elif "norm_pre.weight" in sd or "norm.weight" in sd:
        # head_norm_first vintage: LN over the feature map BEFORE pooling —
        # mean-then-LN != LN-then-mean, so a silent remap would corrupt the
        # numerics (the native tower norms after pooling).
        raise NotImplementedError(
            "timm ConvNeXt checkpoint uses head_norm_first (pre-pool norm); "
            "the native tower implements the default pool-then-norm head "
            "(timm NormMlpClassifierHead), which is what the laion "
            "convnext_base_w checkpoints use"
        )

    import jax
    import jax.numpy as jnp

    return jax.tree.map(jnp.asarray, out)


def convert_state_dict(sd: Mapping, **kwargs) -> dict:
    """Dispatch by checkpoint flavor (reference convert.py:193-200)."""
    keys = list(sd.keys())
    if any(k.startswith(("img/", "params/img/")) for k in keys):
        return big_vision_npz_to_params(sd, **kwargs)
    if any("image_encoder.model" in k or "mobileclip" in k.lower() for k in keys):
        # Checked per-variant (VERDICT r2 item 7; reference convert.py:193-200):
        # none of the MobileCLIP image towers is a plain ViT, so the native
        # patchify tower cannot host them.
        if "image_encoder.model.patch_embed.0.rbr_conv.0.conv.weight" in keys:
            raise NotImplementedError(
                "MobileCLIP-S1/S2 checkpoints ship TRAIN-TIME FastViT "
                "weights (parallel rbr_conv reparam branches + BN running "
                "stats; reference convert.py:155-157 folds them via timm's "
                "checkpoint_filter_fn). The native tower "
                "(models/fastvit.py FastViT, config MobileCLIP-S1/S2) is "
                "the fused deploy form with LN — loading these weights "
                "needs the branch-fusion remap validated against a timm "
                "oracle, which this environment cannot run. The model "
                "itself builds and trains natively."
            )
        if "image_encoder.model.patch_emb.0.block.conv.weight" in keys:
            raise NotImplementedError(
                "MobileCLIP-B checkpoints carry a corenet conv+BN hybrid "
                "stem (reference convert.py:158-159 maps it via timm "
                "vision_transformer_hybrid). The native tower "
                "(models/fastvit.py HybridViT, config MobileCLIP-B) uses "
                "an LN conv stem — loading needs the BN-folding stem remap "
                "validated against a timm oracle. The model itself builds "
                "and trains natively; the transformer blocks and text "
                "tower would map 1:1."
            )
        raise NotImplementedError(
            "Unrecognized MobileCLIP checkpoint layout (reference "
            "convert.py:193-200 handles S1/S2 and B only)."
        )
    if "patch_embed.proj.weight" in keys:  # bare timm ViT (vision-only)
        kwargs.pop("context_length", None)
        return {"visual": timm_vit_to_vision_params(sd, **kwargs)}
    if "stem.0.weight" in keys:  # bare timm ConvNeXt (vision-only)
        return {"visual": timm_convnext_to_vision_params(sd)}
    if (
        "visual.trunk.patch_embed.proj.weight" in keys
        or "visual.trunk.stem.0.weight" in keys
    ):
        # open_clip TimmModel vision tower (e.g. BiomedCLIP: timm ViT trunk
        # + HF text). Vision remaps through the timm converter; the rest of
        # the checkpoint (text tower, logit_scale) goes through the
        # standard importer.
        from .checkpoint import import_torch_state_dict

        trunk = {
            k[len("visual.trunk."):]: v
            for k, v in sd.items()
            if k.startswith("visual.trunk.")
        }
        vis_kwargs = {k: v for k, v in kwargs.items() if k != "context_length"}
        vis_kwargs.pop("hf_text_cfg", None)
        rest = {k: v for k, v in sd.items() if not k.startswith("visual.")}
        params = import_torch_state_dict(dict(rest), **kwargs)
        if "stem.0.weight" in trunk:
            params["visual"] = timm_convnext_to_vision_params(trunk)
        else:
            params["visual"] = timm_vit_to_vision_params(trunk, **vis_kwargs)
        # timm head.weight/bias (classifier) has no CLIP equivalent; the
        # contrastive projection, if present, rides visual.head.proj.
        # Reject head variants the native tower cannot express rather than
        # silently dropping weights (reference timm_model.py:92-107).
        if "visual.head.proj.bias" in sd:
            raise NotImplementedError(
                "timm-trunk checkpoint uses proj_bias=True; the native "
                "VisionTransformer projection is bias-free"
            )
        if any(k.startswith("visual.head.mlp.") for k in sd):
            if "stem.0.weight" in trunk:
                # ConvNeXt mlp head (convnext_large_d: fc1 w/ bias -> GELU
                # -> bias-free fc2; reference timm_model.py:106-107).
                params["visual"]["mlp_fc1"] = {
                    "kernel": np.asarray(sd["visual.head.mlp.fc1.weight"]).T,
                    "bias": np.asarray(sd["visual.head.mlp.fc1.bias"]),
                }
                params["visual"]["mlp_fc2"] = {
                    "kernel": np.asarray(sd["visual.head.mlp.fc2.weight"]).T,
                }
                if "visual.head.mlp.fc2.bias" in sd:
                    raise NotImplementedError(
                        "convnext mlp head with fc2 bias (proj_bias=True) "
                        "is not supported (released heads are bias-free)"
                    )
                import jax
                import jax.numpy as jnp

                params["visual"] = jax.tree.map(jnp.asarray, params["visual"])
            else:
                raise NotImplementedError(
                    "timm-trunk ViT checkpoint uses an MLP head (proj='mlp', "
                    "reference timm_model.py:106-107); only the linear head "
                    "maps onto the native ViT projection"
                )
        if "visual.head.proj.weight" in sd:
            import jax.numpy as jnp

            params["visual"]["proj"] = jnp.asarray(
                np.asarray(sd["visual.head.proj.weight"]).T
            )
        return params
    if any(k.startswith("visual.trunk.") for k in keys):
        # TimmModel trunk that is neither a plain ViT nor a ConvNeXt —
        # ViTamin hybrids (reference pretrained.py:554-599) land here. The
        # native tower (models/vitamin.py, configs ViTamin-*) builds and
        # trains; loading released weights needs the timm vitamin key remap
        # validated against an oracle this environment cannot run.
        raise NotImplementedError(
            "open_clip TimmModel checkpoint with an unrecognized trunk "
            "layout (ViTamin and other conv-hybrid trunks). The native "
            "ViTamin tower exists (models/vitamin.py); checkpoint "
            "conversion is gated pending a timm oracle for the trunk "
            "state-dict layout."
        )
    from .checkpoint import import_torch_state_dict

    return import_torch_state_dict(dict(sd), **kwargs)
