"""HuggingFace-hub publishing for trained models.

Capability parity with reference `src/open_clip/push_to_hf_hub.py:35-208`
(save model + open_clip_config.json + tokenizer, push to hub, model-card
generation :209+). Weights are exported in the open_clip torch layout
(safetensors) so reference users can load them directly — the inverse of
`checkpoint.import_torch_state_dict`.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Optional

import numpy as np

__all__ = ["export_torch_state_dict", "save_for_hf", "push_to_hf_hub", "generate_readme"]


def export_torch_state_dict(
    params: dict,
    batch_stats: Optional[dict] = None,
    vision_layout: str = "auto",
) -> dict:
    """Flax params -> open_clip-style flat torch state dict (numpy values).

    Scan-stacked vs unrolled block layout is auto-detected from the tree
    ('block' subtree with a leading layer axis vs 'blocks_N' keys).

    `batch_stats` supplies BN running stats for BatchNorm towers (RN50
    family); without it the exported running stats fall back to the fresh
    mean=0/var=1 a torch BatchNorm initializes with.

    `vision_layout`: 'auto' detects ResNet (attnpool) and EVA02 SwiGLU
    (fc1_g) trees; pass 'timm_eva02_postnorm' explicitly for EVA02-E
    exports — its param tree is indistinguishable from a plain ViT's, but
    the reference loads it from the `visual.trunk.*` timm layout.
    """
    from .models.layers import split_swiglu_params

    # fused-gate SwiGLU trees (create_model(swiglu_fused=True): one fc1
    # [D, 2H] param) export in the torch/timm SPLIT layout — normalize first.
    params = split_swiglu_params(params)
    sd = {}

    def put(key, val):
        # ascontiguousarray matters: safetensors' numpy writer silently
        # serializes the RAW buffer of a non-contiguous view (all the .T
        # kernels here), producing transposed garbage on disk.
        sd[key] = np.ascontiguousarray(np.asarray(val))

    def export_blocks(tree, prefix):
        blocks = tree["transformer"].get("blocks")
        if blocks is not None and "block" in blocks:
            stacked = blocks["block"]
            n = next(iter_leaves(stacked)).shape[0]
            layers = [index_tree(stacked, i) for i in range(n)]
        else:
            keys = sorted(
                (k for k in tree["transformer"] if k.startswith("blocks_")),
                key=lambda k: int(k.split("_")[-1]),
            )
            layers = [tree["transformer"][k] for k in keys]
        for i, blk in enumerate(layers):
            bp = f"{prefix}transformer.resblocks.{i}."
            put(bp + "ln_1.weight", blk["ln_1"]["scale"])
            put(bp + "ln_1.bias", blk["ln_1"]["bias"])
            put(bp + "ln_2.weight", blk["ln_2"]["scale"])
            put(bp + "ln_2.bias", blk["ln_2"]["bias"])
            put(bp + "attn.in_proj_weight", np.asarray(blk["attn"]["in_proj"]["kernel"]).T)
            put(bp + "attn.in_proj_bias", blk["attn"]["in_proj"]["bias"])
            put(bp + "attn.out_proj.weight", np.asarray(blk["attn"]["out_proj"]["kernel"]).T)
            put(bp + "attn.out_proj.bias", blk["attn"]["out_proj"]["bias"])
            put(bp + "mlp.c_fc.weight", np.asarray(blk["mlp"]["c_fc"]["kernel"]).T)
            put(bp + "mlp.c_fc.bias", blk["mlp"]["c_fc"]["bias"])
            put(bp + "mlp.c_proj.weight", np.asarray(blk["mlp"]["c_proj"]["kernel"]).T)
            put(bp + "mlp.c_proj.bias", blk["mlp"]["c_proj"]["bias"])
            put_layerscale(bp, blk)

    def iter_leaves(tree):
        import jax

        return iter(jax.tree.leaves(tree))

    def index_tree(tree, i):
        import jax

        return jax.tree.map(lambda x: x[i], tree)

    def put_split_attn(prefix, attn):
        """Separate q/k/v Dense params -> torch MHA storage (fused
        in_proj when embed dims match, else q/k/v_proj_weight — the exact
        inverse of checkpoint._split_qkv_attn)."""
        qk = np.asarray(attn["q_proj"]["kernel"]).T
        kk = np.asarray(attn["k_proj"]["kernel"]).T
        vk = np.asarray(attn["v_proj"]["kernel"]).T
        if qk.shape[1] == kk.shape[1] == vk.shape[1]:
            put(prefix + "in_proj_weight", np.concatenate([qk, kk, vk], axis=0))
        else:
            put(prefix + "q_proj_weight", qk)
            put(prefix + "k_proj_weight", kk)
            put(prefix + "v_proj_weight", vk)
        put(prefix + "in_proj_bias", np.concatenate([
            np.asarray(attn["q_proj"]["bias"]),
            np.asarray(attn["k_proj"]["bias"]),
            np.asarray(attn["v_proj"]["bias"]),
        ]))
        put(prefix + "out_proj.weight", np.asarray(attn["out_proj"]["kernel"]).T)
        put(prefix + "out_proj.bias", attn["out_proj"]["bias"])

    def put_ln(key, ln):
        put(key + ".weight", ln["scale"])
        put(key + ".bias", ln["bias"])

    def put_mlp(prefix, mlp):
        put(prefix + "c_fc.weight", np.asarray(mlp["c_fc"]["kernel"]).T)
        put(prefix + "c_fc.bias", mlp["c_fc"]["bias"])
        put(prefix + "c_proj.weight", np.asarray(mlp["c_proj"]["kernel"]).T)
        put(prefix + "c_proj.bias", mlp["c_proj"]["bias"])

    def put_layerscale(prefix, blk):
        for ls in ("ls_1", "ls_2"):
            if ls in blk:
                put(prefix + f"{ls}.gamma", blk[ls]["gamma"])

    def export_resnet_visual(vis):
        """Native ModifiedResNet params (+ batch_stats) -> torch `visual.*`
        layout (inverse of checkpoint._convert_resnet_visual)."""
        stats = (batch_stats or {}).get("visual", {})

        def put_conv(key, p):
            put(key + ".weight", np.asarray(p["kernel"]).transpose(3, 2, 0, 1))

        def put_bn(key, p, s):
            put(key + ".weight", p["scale"])
            put(key + ".bias", p["bias"])
            put(key + ".running_mean",
                np.asarray((s or {}).get("mean", np.zeros_like(np.asarray(p["scale"])))))
            put(key + ".running_var",
                np.asarray((s or {}).get("var", np.ones_like(np.asarray(p["scale"])))))

        for i in (1, 2, 3):
            put_conv(f"visual.conv{i}", vis[f"conv{i}"])
            put_bn(f"visual.bn{i}", vis[f"bn{i}"], stats.get(f"bn{i}"))
        blocks = sorted(
            (k for k in vis if k.startswith("layer")),
            key=lambda k: tuple(int(x) for x in k[len("layer"):].split("_")),
        )
        for name in blocks:
            stage, i = name[len("layer"):].split("_")
            src = f"visual.layer{stage}.{i}"
            blk, bst = vis[name], stats.get(name, {})
            for j in (1, 2, 3):
                put_conv(f"{src}.conv{j}", blk[f"conv{j}"])
                put_bn(f"{src}.bn{j}", blk[f"bn{j}"], bst.get(f"bn{j}"))
            if "downsample_conv" in blk:
                put_conv(f"{src}.downsample.0", blk["downsample_conv"])
                put_bn(f"{src}.downsample.1", blk["downsample_bn"], bst.get("downsample_bn"))
        pool = vis["attnpool"]
        put("visual.attnpool.positional_embedding", pool["positional_embedding"])
        for proj in ("q_proj", "k_proj", "v_proj", "c_proj"):
            put(f"visual.attnpool.{proj}.weight", np.asarray(pool[proj]["kernel"]).T)
            put(f"visual.attnpool.{proj}.bias", pool[proj]["bias"])

    def _vision_blocks(vis):
        blocks = vis["transformer"].get("blocks")
        if blocks is not None and "block" in blocks:
            stacked = blocks["block"]
            n = next(iter_leaves(stacked)).shape[0]
            return [index_tree(stacked, i) for i in range(n)]
        keys = sorted(
            (k for k in vis["transformer"] if k.startswith("blocks_")),
            key=lambda k: int(k.split("_")[-1]),
        )
        return [vis["transformer"][k] for k in keys]

    def export_eva02_trunk(vis, post_norm):
        """Native EVA02 tower -> `visual.trunk.*` timm eva.py layout — the
        exact inverse of convert.timm_vit_to_vision_params' eva02 paths
        (reference loads these via TimmModel, pretrained.py:454-474)."""
        tp = "visual.trunk."
        put(tp + "cls_token", np.asarray(vis["class_embedding"]).reshape(1, 1, -1))
        put(tp + "pos_embed", np.asarray(vis["positional_embedding"])[None])
        put(tp + "patch_embed.proj.weight",
            np.asarray(vis["conv1"]["kernel"]).transpose(3, 2, 0, 1))
        put(tp + "patch_embed.proj.bias", vis["conv1"]["bias"])
        for i, blk in enumerate(_vision_blocks(vis)):
            bp = f"{tp}blocks.{i}."
            put_ln(bp + "norm1", blk["ln_1"])
            put_ln(bp + "norm2", blk["ln_2"])
            qkv_w = np.asarray(blk["attn"]["in_proj"]["kernel"]).T  # [3D, D]
            qkv_b = np.asarray(blk["attn"]["in_proj"]["bias"])
            qw, kw, vw = np.split(qkv_w, 3, axis=0)
            qb, _, vb = np.split(qkv_b, 3)  # k bias is zero by construction
            if post_norm:
                # EvaBlockPostNorm: fused qkv with split q/v bias params
                put(bp + "attn.qkv.weight", qkv_w)
                put(bp + "attn.q_bias", qb)
                put(bp + "attn.v_bias", vb)
                put(bp + "mlp.fc1.weight", np.asarray(blk["mlp"]["c_fc"]["kernel"]).T)
                put(bp + "mlp.fc1.bias", blk["mlp"]["c_fc"]["bias"])
                put(bp + "mlp.fc2.weight", np.asarray(blk["mlp"]["c_proj"]["kernel"]).T)
                put(bp + "mlp.fc2.bias", blk["mlp"]["c_proj"]["bias"])
            else:
                put(bp + "attn.q_proj.weight", qw)
                put(bp + "attn.q_proj.bias", qb)
                put(bp + "attn.k_proj.weight", kw)
                put(bp + "attn.v_proj.weight", vw)
                put(bp + "attn.v_proj.bias", vb)
                if "norm" in blk["attn"]:
                    put_ln(bp + "attn.norm", blk["attn"]["norm"])
                for src, dst in (("fc1_g", "fc1_g"), ("fc1_x", "fc1_x"), ("fc2", "fc2")):
                    put(bp + f"mlp.{dst}.weight", np.asarray(blk["mlp"][src]["kernel"]).T)
                    put(bp + f"mlp.{dst}.bias", blk["mlp"][src]["bias"])
                if "norm" in blk["mlp"]:
                    put_ln(bp + "mlp.norm", blk["mlp"]["norm"])
            put(bp + "attn.proj.weight", np.asarray(blk["attn"]["out_proj"]["kernel"]).T)
            put(bp + "attn.proj.bias", blk["attn"]["out_proj"]["bias"])
        put_ln(tp + "norm", vis["ln_post"])
        if "proj" in vis:
            put("visual.head.proj.weight", np.asarray(vis["proj"]).T)

    def _is_eva02_swiglu(vis):
        if "transformer" not in vis:
            return False
        blocks = _vision_blocks(vis)
        return bool(blocks) and "fc1_g" in blocks[0].get("mlp", {})

    if "visual" in params and "attnpool" in params["visual"]:
        export_resnet_visual(params["visual"])
    elif "visual" in params and (
        vision_layout in ("timm_eva02", "timm_eva02_postnorm")
        or (vision_layout == "auto" and _is_eva02_swiglu(params["visual"]))
    ):
        export_eva02_trunk(
            params["visual"], post_norm=vision_layout == "timm_eva02_postnorm"
        )
    elif "visual" in params and "conv1" not in params["visual"]:
        raise NotImplementedError(
            "hub export for this vision tower layout (ConvNeXt / SigLIP "
            "MAP-pool timm trunks) is not implemented — only native "
            "CLIP-ViT, ModifiedResNet, and EVA02 trunk layouts export; "
            "use orbax checkpoints for these towers"
        )
    elif "visual" in params:
        vis = params["visual"]
        if "class_embedding" not in vis or "latent" in vis.get("attn_pool", {}):
            # SigLIP trunks (no CLS token, MAP pooling) have conv1 but no
            # generic-layout export; guard before any put() so the user
            # gets this message instead of a bare KeyError.
            raise NotImplementedError(
                "hub export of SigLIP MAP-pool / no-CLS timm trunks is not "
                "implemented; use orbax checkpoints"
            )
        put("visual.conv1.weight", np.asarray(vis["conv1"]["kernel"]).transpose(3, 2, 0, 1))
        put("visual.class_embedding", vis["class_embedding"])
        put("visual.positional_embedding", vis["positional_embedding"])
        if "ln_pre" in vis:
            put("visual.ln_pre.weight", vis["ln_pre"]["scale"])
            put("visual.ln_pre.bias", vis["ln_pre"]["bias"])
        if "ln_post" in vis:
            put("visual.ln_post.weight", vis["ln_post"]["scale"])
            put("visual.ln_post.bias", vis["ln_post"]["bias"])
        if "proj" in vis:
            put("visual.proj", vis["proj"])
        if "attn_pool" in vis:
            pool = vis["attn_pool"]  # MAP-pool ('latent') rejected above
            put("visual.attn_pool.query", pool["query"])
            put_ln("visual.attn_pool.ln_q", pool["ln_q"])
            put_ln("visual.attn_pool.ln_k", pool["ln_k"])
            put_split_attn("visual.attn_pool.attn.", pool["attn"])
        export_blocks(vis, "visual.")

    if "text" in params:
        txt = params["text"]
        if "hf" in txt:
            raise NotImplementedError(
                "hub export of HF text towers is not implemented (their "
                "torch layout is model-specific); use orbax checkpoints"
            )
        # CoCa checkpoints use the CustomTextCLIP layout (text.* prefix, the
        # layout reference open_clip saves and loads for CoCa — its
        # convert_to_custom_text remap does not cover cls_emb at the root);
        # plain CLIP exports keep the inlined layout.
        pre = "text." if "text_decoder" in params else ""
        put(pre + "token_embedding.weight", txt["token_embedding"]["embedding"])
        put(pre + "positional_embedding", txt["positional_embedding"])
        put(pre + "ln_final.weight", txt["ln_final"]["scale"])
        put(pre + "ln_final.bias", txt["ln_final"]["bias"])
        if "text_projection" in txt:
            tp = txt["text_projection"]
            if isinstance(tp, dict):
                put(pre + "text_projection.weight", np.asarray(tp["kernel"]).T)
                put(pre + "text_projection.bias", tp["bias"])
            else:
                put(pre + "text_projection", tp)
        if "cls_emb" in txt:
            put(pre + "cls_emb", txt["cls_emb"])
        export_blocks(txt, pre)

    if "text_decoder" in params:
        # CoCa multimodal decoder (inverse of the checkpoint.py importer)
        dec = params["text_decoder"]
        self_keys = sorted(
            (k for k in dec if k.startswith("resblocks_")),
            key=lambda k: int(k.split("_")[-1]),
        )
        for k in self_keys:
            i = int(k.split("_")[-1])
            blk = dec[k]
            bp = f"text_decoder.resblocks.{i}."
            put_ln(bp + "ln_1", blk["ln_1"])
            put_ln(bp + "ln_2", blk["ln_2"])
            put(bp + "attn.in_proj_weight", np.asarray(blk["attn"]["in_proj"]["kernel"]).T)
            put(bp + "attn.in_proj_bias", blk["attn"]["in_proj"]["bias"])
            put(bp + "attn.out_proj.weight", np.asarray(blk["attn"]["out_proj"]["kernel"]).T)
            put(bp + "attn.out_proj.bias", blk["attn"]["out_proj"]["bias"])
            put_mlp(bp + "mlp.", blk["mlp"])
            put_layerscale(bp, blk)
        cross_keys = sorted(
            (k for k in dec if k.startswith("cross_attn_")),
            key=lambda k: int(k.split("_")[-1]),
        )
        for k in cross_keys:
            i = int(k.split("_")[-1])
            blk = dec[k]
            bp = f"text_decoder.cross_attn.{i}."
            put_ln(bp + "ln_1", blk["ln_1"])
            put_ln(bp + "ln_1_kv", blk["ln_1_kv"])
            put_ln(bp + "ln_2", blk["ln_2"])
            put_split_attn(bp + "attn.", blk["attn"])
            put_mlp(bp + "mlp.", blk["mlp"])
            put_layerscale(bp, blk)
        put_ln("text_decoder.ln_final", dec["ln_final"])
        put("text_decoder.text_projection", dec["text_projection"])

    if "logit_scale" in params:
        put("logit_scale", np.asarray(params["logit_scale"]).reshape(()))
    if "logit_bias" in params:
        put("logit_bias", np.asarray(params["logit_bias"]).reshape(()))
    return sd


def _vision_layout_from_config(model_config: dict) -> str:
    """Resolve export_torch_state_dict's vision_layout from a model config.

    'auto' tree sniffing cannot distinguish EVA02-E / EVA01-g (plain-MLP
    blocks) from a native ViT, but their reference-loadable torch layout is
    the fused-qkv `visual.trunk.*` one — the timm name in the config is the
    authoritative signal.
    """
    tname = (model_config.get("vision_cfg") or {}).get("timm_model_name") or ""
    if tname.startswith("eva_giant") or tname.startswith("eva02_enormous"):
        return "timm_eva02_postnorm"
    if tname.startswith("eva02_"):
        return "timm_eva02"
    return "auto"


def save_for_hf(
    params: dict,
    model_config: dict,
    save_directory: str,
    tokenizer=None,
    preprocess_cfg: Optional[dict] = None,
    batch_stats: Optional[dict] = None,
    vision_layout: Optional[str] = None,
):
    """Write weights + open_clip_config.json (+ tokenizer) to a directory
    (reference push_to_hf_hub.py:60-105)."""
    os.makedirs(save_directory, exist_ok=True)
    if vision_layout is None:
        vision_layout = _vision_layout_from_config(model_config)
    sd = export_torch_state_dict(
        params,
        batch_stats=batch_stats,
        vision_layout=vision_layout,
    )
    try:
        from safetensors.numpy import save_file

        save_file(sd, os.path.join(save_directory, "open_clip_model.safetensors"))
    except ImportError:
        np.savez(os.path.join(save_directory, "open_clip_model.npz"), **sd)

    config = {"model_cfg": model_config}
    if preprocess_cfg:
        config["preprocess_cfg"] = preprocess_cfg
    with open(os.path.join(save_directory, "open_clip_config.json"), "w") as f:
        json.dump(config, f, indent=2)

    if tokenizer is not None and hasattr(tokenizer, "save_pretrained"):
        tokenizer.save_pretrained(save_directory)


def generate_readme(model_card: dict, model_name: str) -> str:
    """Model card markdown (reference push_to_hf_hub.py:209+)."""
    tags = model_card.get("tags", ["clip", "mri"])
    lines = [
        "---",
        "tags:",
        *[f"- {t}" for t in tags],
        "library_name: mrclip_tpu",
        "---",
        f"# Model card for {model_name}",
        "",
        model_card.get("description", "MRI image-text contrastive model trained with mrclip_tpu."),
    ]
    if "details" in model_card:
        lines += ["", "## Model Details"]
        for k, v in model_card["details"].items():
            lines.append(f"- **{k}:** {v}")
    return "\n".join(lines) + "\n"


def push_to_hf_hub(
    params: dict,
    model_config: dict,
    repo_id: str,
    tokenizer=None,
    preprocess_cfg: Optional[dict] = None,
    commit_message: str = "Add model",
    private: bool = False,
    model_card: Optional[dict] = None,
    batch_stats: Optional[dict] = None,
    vision_layout: Optional[str] = None,
):
    """Create/update a hub repo with the exported model
    (reference push_to_hf_hub.py:108-208)."""
    try:
        from huggingface_hub import HfApi, upload_folder
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("huggingface_hub is required to push to the hub") from e

    api = HfApi()
    api.create_repo(repo_id, private=private, exist_ok=True)
    with tempfile.TemporaryDirectory() as tmp:
        # batch_stats matters for BN towers (RN50): without it the export
        # falls back to fresh mean=0/var=1 running stats.
        save_for_hf(params, model_config, tmp, tokenizer, preprocess_cfg,
                    batch_stats=batch_stats, vision_layout=vision_layout)
        with open(os.path.join(tmp, "README.md"), "w") as f:
            f.write(generate_readme(model_card or {}, repo_id.split("/")[-1]))
        return upload_folder(repo_id=repo_id, folder_path=tmp, commit_message=commit_message)
