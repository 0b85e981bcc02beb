"""External-checkpoint converters (big_vision / SigLIP npz, MobileCLIP).

Capability parity with reference `src/open_clip/convert.py`:
- `load_big_vision_weights` (:13-150): official Google big_vision npz
  (SigLIP) -> model params. big_vision is itself a Flax codebase, so the
  mapping here is flax-to-flax (the reference has to transpose everything
  into torch layout; we don't).
- `convert_mobile_clip_state_dict` (:152-191): Apple MobileCLIP checkpoints
  -> native deploy-form towers. The reference defers branch fusion to timm's
  `checkpoint_filter_fn` at torch runtime; here the reparam math (conv+BN
  fold, MobileOne branch sum, RepMixer/RepCPE identity split, layer-scale
  folding) is done directly, torch-oracle-tested in
  `tests/test_mobileclip_import.py`.
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


# ---------------------------------------------------------------------------
# MobileCLIP (Apple ml-mobileclip / corenet) checkpoints
# ---------------------------------------------------------------------------
#
# Reference `convert.py:152-191` consumes these via timm's
# `checkpoint_filter_fn` (branch fusion + renames) at torch runtime; here the
# fusion math is done directly (conv+BN fold, MobileOne branch sum, RepMixer
# reparam) into the native deploy-form towers (`models/fastvit.py` with
# norm='affine': every BN position hosts the folded inference-mode affine,
# so converted weights are numerically exact at inference).
#
# Source schemas: the text tower and the stem detection keys are documented
# in the reference itself (convert.py:161-199); the S1/S2 trunk block naming
# (network.*, token_mixer/convffn, rbr_* branches) follows the Apple fastvit
# layout as recalled — a zero-egress environment, so every structural
# expectation is VALIDATED at load and any mismatch raises naming the keys
# seen (rejection reserved for genuinely unrecognized sublayouts).

_BN_FIELDS = ("weight", "bias", "running_mean", "running_var")


def _bn_stats(sd: Mapping, p: str, eps: float = 1e-5):
    """(gamma/sigma, beta - mu*gamma/sigma): inference BN as per-channel affine."""
    g, b, mu, var = (np.asarray(sd[f"{p}.{f}"], np.float64) for f in _BN_FIELDS)
    s = g / np.sqrt(var + eps)
    return s, b - mu * s


def _fuse_conv_bn(sd: Mapping, conv_key: str, bn_prefix: str):
    """Fold inference-mode BN into the preceding conv (torch OIHW layout)."""
    w = np.asarray(sd[conv_key], np.float64)
    s, b = _bn_stats(sd, bn_prefix)
    return w * s[:, None, None, None], b


def _center_pad(w: np.ndarray, k: int) -> np.ndarray:
    """Pad a [O, I, kw, kw] kernel to k x k, centered (1x1 scale branches)."""
    kw = w.shape[-1]
    p0 = (k - kw) // 2
    p1 = k - kw - p0
    return np.pad(w, ((0, 0), (0, 0), (p0, p1), (p0, p1)))


def _identity_kernel(out_ch: int, in_per_group: int, k: int) -> np.ndarray:
    """[O, I/g, k, k] kernel acting as identity (BN skip branch host)."""
    w = np.zeros((out_ch, in_per_group, k, k))
    c = k // 2
    for o in range(out_ch):
        w[o, o % in_per_group, c, c] = 1.0
    return w


def _fuse_mobileone(sd: Mapping, p: str, k: int):
    """MobileOneBlock -> single fused (w [O, I/g, k, k], b [O]), torch layout.

    Branches: rbr_conv.{j} (k x k conv+BN, possibly several), rbr_scale
    (1x1 conv+BN, padded to center), rbr_skip (bare BN identity). Already-
    reparameterized checkpoints carry reparam_conv directly."""
    if f"{p}.reparam_conv.weight" in sd:
        return (
            np.asarray(sd[f"{p}.reparam_conv.weight"], np.float64),
            np.asarray(sd[f"{p}.reparam_conv.bias"], np.float64),
        )
    w = b = None
    j = 0
    while f"{p}.rbr_conv.{j}.conv.weight" in sd:
        wj, bj = _fuse_conv_bn(sd, f"{p}.rbr_conv.{j}.conv.weight", f"{p}.rbr_conv.{j}.bn")
        w = wj if w is None else w + wj
        b = bj if b is None else b + bj
        j += 1
    if f"{p}.rbr_scale.conv.weight" in sd:
        ws, bs = _fuse_conv_bn(sd, f"{p}.rbr_scale.conv.weight", f"{p}.rbr_scale.bn")
        ws = _center_pad(ws, k)
        w = ws if w is None else w + ws
        b = bs if b is None else b + bs
    if f"{p}.rbr_skip.weight" in sd:
        s, bias = _bn_stats(sd, f"{p}.rbr_skip")
        # BN-only blocks (RepMixer norm branches) are depthwise: in/group=1
        out_ch, in_pg = len(s), (w.shape[1] if w is not None else 1)
        wid = _identity_kernel(out_ch, in_pg, k) * s[:, None, None, None]
        w = wid if w is None else w + wid
        b = bias if b is None else b + bias
    if w is None:
        raise NotImplementedError(
            f"MobileOne block '{p}' has no recognized branch "
            f"(keys seen: {sorted(q for q in sd if q.startswith(p + '.'))[:8]})"
        )
    return w, b


def _fuse_large_kernel(sd: Mapping, p: str):
    """ReparamLargeKernelConv (dw 7x7 + dw small branch, conv+BN each)."""
    if f"{p}.lkb_reparam.weight" in sd:
        return (
            np.asarray(sd[f"{p}.lkb_reparam.weight"], np.float64),
            np.asarray(sd[f"{p}.lkb_reparam.bias"], np.float64),
        )
    w, b = _fuse_conv_bn(sd, f"{p}.lkb_origin.conv.weight", f"{p}.lkb_origin.bn")
    if f"{p}.small_conv.conv.weight" in sd:
        ws, bs = _fuse_conv_bn(sd, f"{p}.small_conv.conv.weight", f"{p}.small_conv.bn")
        w = w + _center_pad(ws, w.shape[-1])
        b = b + bs
    return w, b


def _tconv(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO conv kernel."""
    return np.transpose(np.asarray(w, np.float32), (2, 3, 1, 0))


def _dense_1x1(w: np.ndarray, b=None) -> dict:
    """torch 1x1 conv [O, I, 1, 1] (or linear [O, I]) -> flax Dense."""
    w = np.asarray(w, np.float64)
    if w.ndim == 4:
        if w.shape[2:] != (1, 1):
            raise NotImplementedError(
                f"expected 1x1 conv, got kernel {w.shape}"
            )
        w = w[:, :, 0, 0]
    out = {"kernel": w.T.astype(np.float32)}
    if b is not None:
        out["bias"] = np.asarray(b, np.float32)
    return out


def _affine(scale, bias) -> dict:
    return {"scale": np.asarray(scale, np.float32),
            "bias": np.asarray(bias, np.float32)}


def _mc_text_to_openclip(sd: Mapping) -> dict:
    """Apple/corenet text tower -> open_clip torch key layout (the mapping
    the reference documents verbatim at convert.py:161-184); consumed by
    `checkpoint.import_torch_state_dict`."""
    out = {}
    pre = "text_encoder."
    for k, v in sd.items():
        if not k.startswith(pre):
            continue
        k = k[len(pre):]
        k = k.replace("projection_layer", "text_projection")
        k = k.replace("embedding_layer", "token_embedding")
        if k.startswith("positional_embedding.pos_embed.pos_embed"):
            k = "positional_embedding"
            v = np.asarray(v).squeeze()
        k = k.replace("final_layer_norm", "ln_final")
        k = k.replace("pre_norm_mha.0", "ln_1")
        k = k.replace("pre_norm_mha.1", "attn")
        k = k.replace("pre_norm_ffn.0", "ln_2")
        k = k.replace("pre_norm_ffn.1", "mlp.c_fc")
        k = k.replace("pre_norm_ffn.4", "mlp.c_proj")
        k = k.replace("qkv_proj.weight", "in_proj_weight")
        k = k.replace("qkv_proj.bias", "in_proj_bias")
        if k.startswith("transformer."):
            k = "transformer.resblocks." + k[len("transformer."):]
        out["text." + k] = np.asarray(v)
    if "text.text_projection.weight" in out:
        # the native custom-text tower projects with a bare [D, E] matrix
        w = out.pop("text.text_projection.weight")
        bias = out.pop("text.text_projection.bias", None)
        if bias is not None and np.abs(bias).max() > 0:
            raise NotImplementedError(
                "MobileCLIP text projection carries a non-zero bias; the "
                "native text tower projects bias-free"
            )
        out["text.text_projection"] = np.asarray(w).T
    return out


def _mc_corenet_block(sd: Mapping, p: str) -> dict:
    """corenet TransformerEncoder block -> native ResidualAttentionBlock
    tree (same naming family as the text side)."""
    def lin(name):
        return {
            "kernel": np.asarray(sd[f"{p}.{name}.weight"]).T,
            "bias": np.asarray(sd[f"{p}.{name}.bias"]),
        }

    def lnp(name):
        return {"scale": np.asarray(sd[f"{p}.{name}.weight"]),
                "bias": np.asarray(sd[f"{p}.{name}.bias"])}

    return {
        "ln_1": lnp("pre_norm_mha.0"),
        "attn": {
            "in_proj": lin("pre_norm_mha.1.qkv_proj"),
            "out_proj": lin("pre_norm_mha.1.out_proj"),
        },
        "ln_2": lnp("pre_norm_ffn.0"),
        "mlp": {"c_fc": lin("pre_norm_ffn.1"), "c_proj": lin("pre_norm_ffn.4")},
    }


def _mc_vision_b(sd: Mapping, pre: str = "image_encoder.model.") -> dict:
    """MobileCLIP-B image tower (corenet conv-stem hybrid ViT) ->
    `models/fastvit.py::HybridViT(norm='affine')` params."""
    vis: dict = {}
    i = 0
    while f"{pre}patch_emb.{i}.block.conv.weight" in sd:
        w = np.asarray(sd[f"{pre}patch_emb.{i}.block.conv.weight"])
        vis[f"patch_emb_conv{i}"] = {
            "kernel": _tconv(w),
            "bias": np.asarray(
                sd.get(f"{pre}patch_emb.{i}.block.conv.bias", np.zeros(w.shape[0]))
            ),
        }
        vis[f"patch_emb_norm{i}"] = _affine(
            *_bn_stats(sd, f"{pre}patch_emb.{i}.block.norm")
        )
        i += 1
    if i == 0:
        raise NotImplementedError(
            f"MobileCLIP-B stem keys '{pre}patch_emb.*.block.conv.weight' "
            "not found"
        )

    blocks = {}
    j = 0
    while f"{pre}transformer.{j}.pre_norm_mha.0.weight" in sd:
        blocks[f"blocks_{j}"] = _mc_corenet_block(sd, f"{pre}transformer.{j}")
        j += 1
    if j == 0:
        raise NotImplementedError(
            f"MobileCLIP-B transformer keys '{pre}transformer.N.*' not found "
            f"(keys seen: {sorted(q for q in sd if q.startswith(pre))[:8]})"
        )
    vis["transformer"] = blocks

    if f"{pre}cls_token" in sd:
        vis["cls_token"] = np.asarray(sd[f"{pre}cls_token"]).reshape(1, 1, -1)
    pos_cands = [k for k in sd if k.startswith(pre) and "pos_embed" in k]
    if pos_cands:
        vis["pos_embed"] = np.asarray(sd[sorted(pos_cands)[0]]).squeeze()
    for cand in ("post_transformer_norm", "norm", "ln_post"):
        if f"{pre}{cand}.weight" in sd:
            vis["norm_final"] = {
                "scale": np.asarray(sd[f"{pre}{cand}.weight"]),
                "bias": np.asarray(sd[f"{pre}{cand}.bias"]),
            }
            break
    for cand in ("classifier.proj", "classifier", "head", "proj"):
        wk = f"{pre}{cand}.weight"
        if wk in sd and np.asarray(sd[wk]).ndim == 2:
            vis["proj"] = np.asarray(sd[wk]).T
            bk = f"{pre}{cand}.bias"
            vis["proj_bias"] = (
                np.asarray(sd[bk]) if bk in sd
                else np.zeros(vis["proj"].shape[1], np.float32)
            )
            break
    else:
        if f"{pre}proj" in sd:  # bare Parameter variant
            vis["proj"] = np.asarray(sd[f"{pre}proj"])
            vis["proj_bias"] = np.zeros(vis["proj"].shape[1], np.float32)
    return vis


def _scale_dense_out(d: dict, gamma: np.ndarray) -> dict:
    """Fold a per-output-channel layer scale into a Dense (exact)."""
    return {"kernel": d["kernel"] * gamma[None, :], "bias": d["bias"] * gamma}


def _mc_convffn(sd: Mapping, p: str, gamma=None) -> dict:
    """Apple ConvFFN (dw7x7 conv+BN -> fc1 -> act -> fc2) -> _ConvFFN tree.
    `gamma`: optional layer scale folded into fc2."""
    dw = np.asarray(sd[f"{p}.conv.conv.weight"])
    ffn = {
        "conv_dw": {
            "kernel": _tconv(dw),
            "bias": np.asarray(
                sd.get(f"{p}.conv.conv.bias", np.zeros(dw.shape[0]))
            ),
        },
        "norm": _affine(*_bn_stats(sd, f"{p}.conv.bn")),
        "fc1": _dense_1x1(sd[f"{p}.fc1.weight"], sd[f"{p}.fc1.bias"]),
        "fc2": _dense_1x1(sd[f"{p}.fc2.weight"], sd[f"{p}.fc2.bias"]),
    }
    if gamma is not None:
        ffn["fc2"] = _scale_dense_out(ffn["fc2"], gamma)
    return ffn


def _mc_repmixer_block(sd: Mapping, p: str) -> dict:
    """Apple RepMixerBlock -> native RepMixerBlock(norm='affine') tree.

    Token mix: train form is x + ls * (mixer(x) - norm(x)) (both MobileOne
    dw3x3); deploy form is a single reparam_conv with the identity folded
    in. The native host computes x + dw(x)*scale."""
    tm = f"{p}.token_mixer"
    if f"{tm}.reparam_conv.weight" in sd:
        w = np.asarray(sd[f"{tm}.reparam_conv.weight"], np.float64)
        b = np.asarray(sd[f"{tm}.reparam_conv.bias"], np.float64)
        # reparam kernel includes the +x identity; the host adds x itself
        w = w - _identity_kernel(w.shape[0], w.shape[1], w.shape[-1])
        scale = np.ones(w.shape[0])
    else:
        wm, bm = _fuse_mobileone(sd, f"{tm}.mixer", 3)
        wn, bn_ = _fuse_mobileone(sd, f"{tm}.norm", 3)
        w, b = wm - wn, bm - bn_
        ls_keys = [f"{tm}.layer_scale.gamma", f"{tm}.layer_scale",
                   f"{p}.layer_scale.gamma", f"{p}.layer_scale"]
        scale = None
        for lk in ls_keys:
            if lk in sd:
                scale = np.asarray(sd[lk]).reshape(-1)
                break
        if scale is None:
            scale = np.ones(w.shape[0])
    gamma = None
    for lk in (f"{p}.convffn.layer_scale.gamma", f"{p}.convffn.layer_scale",
               f"{p}.layer_scale_2.gamma", f"{p}.layer_scale_2"):
        if lk in sd:
            gamma = np.asarray(sd[lk]).reshape(-1)
            break
    ffn_prefix = (
        f"{p}.convffn" if f"{p}.convffn.conv.conv.weight" in sd else f"{p}.mlp"
    )
    return {
        "mixer_dw": {"kernel": _tconv(w), "bias": np.asarray(b, np.float32)},
        "mixer_scale": np.asarray(scale, np.float32),
        "ffn": _mc_convffn(sd, ffn_prefix, gamma),
    }


def _mc_attn_block(sd: Mapping, p: str) -> dict:
    """Apple FastViT attention block (BN norm + MHSA + ConvFFN, per-branch
    layer scales) -> native _AttnBlock tree (scales fold into out_proj/fc2)."""
    if f"{p}.norm.weight" not in sd:
        raise NotImplementedError(
            f"attention block '{p}': expected BN norm at '{p}.norm.*' "
            f"(keys seen: {sorted(q for q in sd if q.startswith(p + '.'))[:8]})"
        )
    attn = {
        "in_proj": _dense_1x1(
            sd[f"{p}.token_mixer.qkv.weight"], sd.get(f"{p}.token_mixer.qkv.bias")
        ),
        "out_proj": _dense_1x1(
            sd[f"{p}.token_mixer.proj.weight"], sd.get(f"{p}.token_mixer.proj.bias")
        ),
    }
    if "bias" not in attn["in_proj"]:
        attn["in_proj"]["bias"] = np.zeros(attn["in_proj"]["kernel"].shape[1], np.float32)
    if "bias" not in attn["out_proj"]:
        attn["out_proj"]["bias"] = np.zeros(attn["out_proj"]["kernel"].shape[1], np.float32)
    g1 = g2 = None
    for lk in (f"{p}.layer_scale_1.gamma", f"{p}.layer_scale_1"):
        if lk in sd:
            g1 = np.asarray(sd[lk]).reshape(-1)
    for lk in (f"{p}.layer_scale_2.gamma", f"{p}.layer_scale_2"):
        if lk in sd:
            g2 = np.asarray(sd[lk]).reshape(-1)
    if g1 is not None:
        attn["out_proj"] = _scale_dense_out(attn["out_proj"], g1)
    return {
        "norm": _affine(*_bn_stats(sd, f"{p}.norm")),
        "attn": attn,
        "ffn": _mc_convffn(sd, f"{p}.convffn", g2),
    }


def _mc_vision_fastvit(sd: Mapping, pre: str = "image_encoder.model.") -> dict:
    """MobileCLIP-S1/S2 MCi (FastViT) trunk -> FastViT(norm='affine',
    stem='3conv') params, with every reparam branch fused."""
    import re as _re

    vis: dict = {}
    # stem: 3 MobileOne blocks (conv3x3/s2, dw3x3/s2, pw1x1)
    for i in range(3):
        p = f"{pre}patch_embed.{i}"
        if not any(k.startswith(p + ".") for k in sd):
            raise NotImplementedError(
                f"FastViT stem block '{p}' not found (expected the 3-block "
                "MobileOne stem the Apple checkpoints carry)"
            )
        ref_w = sd.get(f"{p}.rbr_conv.0.conv.weight",
                       sd.get(f"{p}.reparam_conv.weight"))
        w, b = _fuse_mobileone(sd, p, np.asarray(ref_w).shape[-1])
        vis[f"stem_conv{i + 1}"] = {
            "kernel": _tconv(w), "bias": np.asarray(b, np.float32)
        }

    # trunk: classify network.{k} entries structurally
    tops = sorted({
        int(m.group(1))
        for q in sd
        if (m := _re.match(_re.escape(pre) + r"network\.(\d+)\.", q))
    })
    if not tops:
        raise NotImplementedError(
            f"FastViT trunk keys '{pre}network.*' not found "
            f"(keys seen: {sorted(q for q in sd if q.startswith(pre))[:8]})"
        )
    stages: list = []
    down_i = 0
    for t in tops:
        np_ = f"{pre}network.{t}"
        sub = [q[len(np_) + 1:] for q in sd if q.startswith(np_ + ".")]
        if any(s.split(".")[0] == "proj" for s in sub):
            # PatchEmbed downsample: proj.0 ReparamLargeKernelConv (dw) +
            # proj.1 MobileOneBlock (pw 1x1)
            down_i += 1
            wd, bd = _fuse_large_kernel(sd, f"{np_}.proj.0")
            wp, bp = _fuse_mobileone(sd, f"{np_}.proj.1", 1)
            vis[f"downsample{down_i}"] = {
                "conv_dw": {"kernel": _tconv(wd), "bias": np.asarray(bd, np.float32)},
                "norm": _affine(np.ones(wd.shape[0]), np.zeros(wd.shape[0])),
                "conv_pw": _dense_1x1(wp, bp),
            }
        elif any(_re.match(r"\d+\.", s) for s in sub):
            idxs = sorted({int(s.split(".")[0]) for s in sub if s.split(".")[0].isdigit()})
            stages.append((np_, idxs))
        else:
            # RepCPE (conditional position encoding) before the attn stage
            if f"{np_}.reparam_conv.weight" in sd:
                w = np.asarray(sd[f"{np_}.reparam_conv.weight"], np.float64)
                b = np.asarray(sd[f"{np_}.reparam_conv.bias"], np.float64)
                w = w - _identity_kernel(w.shape[0], w.shape[1], w.shape[-1])
            elif f"{np_}.pe.weight" in sd:
                w = np.asarray(sd[f"{np_}.pe.weight"], np.float64)
                b = np.asarray(sd[f"{np_}.pe.bias"], np.float64)
            else:
                raise NotImplementedError(
                    f"unrecognized trunk entry '{np_}' "
                    f"(sub-keys: {sorted(sub)[:8]})"
                )
            vis["pos_emb_dw"] = {
                "kernel": _tconv(w), "bias": np.asarray(b, np.float32)
            }

    if len(stages) != 4:
        raise NotImplementedError(
            f"expected 4 FastViT stages, found {len(stages)} "
            f"(trunk entries: {tops})"
        )
    for s, (sp, idxs) in enumerate(stages[:3]):
        for i in idxs:
            vis[f"stage{s}_block{i}"] = _mc_repmixer_block(sd, f"{sp}.{i}")
    ap, aidxs = stages[3]
    for i in aidxs:
        bp = f"{ap}.{i}"
        if f"{bp}.token_mixer.qkv.weight" in sd:
            vis[f"stage3_block{i}"] = _mc_attn_block(sd, bp)
        else:
            raise NotImplementedError(
                f"stage-3 block '{bp}' is not an attention block "
                f"(keys: {sorted(q for q in sd if q.startswith(bp + '.'))[:8]})"
            )

    # head: conv_exp (MobileOneBlock 3x3 grouped expand) -> GAP -> linear
    if any(k.startswith(f"{pre}conv_exp.") for k in sd):
        w, b = _fuse_mobileone(sd, f"{pre}conv_exp", 3)
        vis["head_conv"] = {"kernel": _tconv(w), "bias": np.asarray(b, np.float32)}
    for cand in ("head.fc", "head", "classifier.proj", "classifier"):
        wk = f"{pre}{cand}.weight"
        if wk in sd and np.asarray(sd[wk]).ndim == 2:
            vis["proj"] = np.asarray(sd[wk]).T
            bk = f"{pre}{cand}.bias"
            vis["proj_bias"] = (
                np.asarray(sd[bk]) if bk in sd
                else np.zeros(vis["proj"].shape[1], np.float32)
            )
            break
    if "head_conv" in vis:
        d = vis["head_conv"]["kernel"].shape[-1]
        vis["head_norm"] = _affine(np.ones(d), np.zeros(d))
    return vis


def is_mobileclip_state_dict(sd: Mapping) -> bool:
    keys = sd.keys()
    return (
        "image_encoder.model.patch_embed.0.rbr_conv.0.conv.weight" in keys
        or "image_encoder.model.patch_emb.0.block.conv.weight" in keys
    )


def convert_mobile_clip_state_dict(sd: Mapping, **kwargs) -> dict:
    """Apple MobileCLIP checkpoint -> native Flax params (reference
    `convert.py:152-191`): branch-fused deploy-form vision tower
    (`timm_deploy_import` mode) + 1:1 text tower + logit_scale."""
    from .checkpoint import import_torch_state_dict

    text_sd = _mc_text_to_openclip(sd)
    if "logit_scale" in sd:
        text_sd["logit_scale"] = np.asarray(sd["logit_scale"])
    params = import_torch_state_dict(
        text_sd,
        scan_layers=False,
        context_length=kwargs.get("context_length"),
    )
    if "image_encoder.model.patch_emb.0.block.conv.weight" in sd:
        params["visual"] = _mc_vision_b(sd)
    else:
        params["visual"] = _mc_vision_fastvit(sd)
    import jax
    import jax.numpy as jnp

    return jax.tree.map(jnp.asarray, params)


def convert_state_dict(sd: Mapping, **kwargs) -> dict:
    """Dispatch by checkpoint flavor (reference convert.py:193-200)."""
    keys = list(sd.keys())
    if any(k.startswith(("img/", "params/img/")) for k in keys):
        return big_vision_npz_to_params(sd, **kwargs)
    if any("image_encoder.model" in k for k in keys):
        if is_mobileclip_state_dict(sd):
            return convert_mobile_clip_state_dict(sd, **kwargs)
        raise NotImplementedError(
            "Unrecognized MobileCLIP checkpoint layout (reference "
            "convert.py:193-200 handles S1/S2 and B only). Build the model "
            "natively and train/fine-tune, or extend "
            "convert_mobile_clip_state_dict for this sublayout."
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
