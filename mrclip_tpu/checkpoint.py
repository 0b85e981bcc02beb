"""Checkpointing: Orbax-native save/load + PyTorch-weight importer.

Capability parity with the reference checkpoint stack:
- `load_checkpoint` / `load_state_dict` (reference factory.py:141-213):
  `module.` prefix strip, logit_scale reshape, pos-embed resize on mismatch.
- OpenAI/open_clip torch `state_dict` -> Flax params conversion for
  bit-accuracy checks against the PyTorch reference (BASELINE.md north star).
- Orbax async checkpointing of {params, opt_state, step} replaces the torch
  `epoch_N.pt` scheme (reference main.py:522-555).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ops.pos_embed import resize_image_pos_embed, resize_text_pos_embed

__all__ = [
    "import_torch_state_dict",
    "load_torch_checkpoint",
    "save_checkpoint",
    "load_checkpoint",
    "latest_step",
]


# ---------------------------------------------------------------------------
# Torch state-dict -> Flax params
# ---------------------------------------------------------------------------

def _strip_module_prefix(sd: Dict[str, Any]) -> Dict[str, Any]:
    if next(iter(sd), "").startswith("module."):
        return {k[len("module."):]: v for k, v in sd.items()}
    return sd


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


def _set(tree: dict, path, value) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def _group_layers(
    sd: Dict[str, np.ndarray], pattern: str
) -> Dict[int, Dict[str, np.ndarray]]:
    pat = re.compile(pattern)
    per_layer: Dict[int, Dict[str, np.ndarray]] = {}
    for key, val in sd.items():
        m = pat.match(key)
        if m:
            per_layer.setdefault(int(m.group(1)), {})[m.group(2)] = val
    return per_layer


def _mlp_params(layer: Dict[str, np.ndarray]) -> dict:
    return {
        "c_fc": {"kernel": layer["mlp.c_fc.weight"].T, "bias": layer["mlp.c_fc.bias"]},
        "c_proj": {"kernel": layer["mlp.c_proj.weight"].T, "bias": layer["mlp.c_proj.bias"]},
    }


def _split_qkv_attn(layer: Dict[str, np.ndarray], pfx: str = "attn.") -> dict:
    """torch MHA -> separate q/k/v Dense params (our cross-attention layout).

    Handles both torch storage modes: fused `in_proj_weight` (equal embed
    dims) and separate `{q,k,v}_proj_weight` (kdim != embed_dim, e.g. the
    CoCa AttentionalPooler with context_dim=width, d_model=output_dim).
    """
    if pfx + "in_proj_weight" in layer:
        qw, kw, vw = np.split(layer[pfx + "in_proj_weight"], 3, axis=0)
    else:
        qw = layer[pfx + "q_proj_weight"]
        kw = layer[pfx + "k_proj_weight"]
        vw = layer[pfx + "v_proj_weight"]
    qb, kb, vb = np.split(layer[pfx + "in_proj_bias"], 3)
    return {
        "q_proj": {"kernel": qw.T, "bias": qb},
        "k_proj": {"kernel": kw.T, "bias": kb},
        "v_proj": {"kernel": vw.T, "bias": vb},
        "out_proj": {
            "kernel": layer[pfx + "out_proj.weight"].T,
            "bias": layer[pfx + "out_proj.bias"],
        },
    }


def _self_block_params(layer: Dict[str, np.ndarray]) -> dict:
    p: dict = {}
    p["ln_1"] = {"scale": layer["ln_1.weight"], "bias": layer["ln_1.bias"]}
    p["ln_2"] = {"scale": layer["ln_2.weight"], "bias": layer["ln_2.bias"]}
    attn: dict = {}
    if "attn.in_proj_weight" in layer:
        attn["in_proj"] = {
            "kernel": layer["attn.in_proj_weight"].T,
            "bias": layer["attn.in_proj_bias"],
        }
    attn["out_proj"] = {
        "kernel": layer["attn.out_proj.weight"].T,
        "bias": layer["attn.out_proj.bias"],
    }
    p["attn"] = attn
    p["mlp"] = _mlp_params(layer)
    _add_layerscale(p, layer)
    return p


def _add_layerscale(p: dict, layer: Dict[str, np.ndarray]) -> None:
    for ls in ("ls_1", "ls_2"):
        if f"{ls}.gamma" in layer:
            p[ls] = {"gamma": layer[f"{ls}.gamma"]}


def _cross_block_params(layer: Dict[str, np.ndarray]) -> dict:
    """Reference cross-attention block (transformer.py:227-262): ln_1 on the
    queries, ln_1_kv on keys/values, cross MHA with separate projections."""
    p = {
        "ln_1": {"scale": layer["ln_1.weight"], "bias": layer["ln_1.bias"]},
        "ln_1_kv": {"scale": layer["ln_1_kv.weight"], "bias": layer["ln_1_kv.bias"]},
        "ln_2": {"scale": layer["ln_2.weight"], "bias": layer["ln_2.bias"]},
        "attn": _split_qkv_attn(layer),
        "mlp": _mlp_params(layer),
    }
    _add_layerscale(p, layer)
    return p


def _attn_pool_params(sd: Dict[str, np.ndarray], prefix: str) -> Optional[dict]:
    """`{prefix}.{query,ln_q,ln_k,attn.*}` -> AttentionalPooler params."""
    sub = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    if not sub:
        return None
    return {
        "query": sub["query"],
        "ln_q": {"scale": sub["ln_q.weight"], "bias": sub["ln_q.bias"]},
        "ln_k": {"scale": sub["ln_k.weight"], "bias": sub["ln_k.bias"]},
        "attn": _split_qkv_attn(sub),
    }


def _convert_tower_blocks(
    sd: Dict[str, np.ndarray], prefix: str, out: dict, tower_path: tuple, scan_layers: bool
) -> None:
    """Convert `{prefix}transformer.resblocks.{i}.*` into our block layout."""
    per_layer = _group_layers(
        sd, re.escape(prefix) + r"transformer\.resblocks\.(\d+)\.(.+)"
    )
    if not per_layer:
        return
    n_layers = max(per_layer) + 1

    blocks = [_self_block_params(per_layer[i]) for i in range(n_layers)]
    if scan_layers:
        stacked = jax.tree.map(lambda *xs: np.stack(xs, axis=0), *blocks)
        _set(out, tower_path + ("transformer", "blocks", "block"), stacked)
    else:
        for i, blk in enumerate(blocks):
            _set(out, tower_path + ("transformer", f"blocks_{i}"), blk)


def _convert_hf_text_tower(
    sd: Dict[str, np.ndarray], text_cfg: dict
) -> Optional[dict]:
    """open_clip `HFTextEncoder` checkpoint keys -> our HFTextEncoder params.

    Reference hf_model.py:96-169 saves `text.transformer.<hf torch keys>`
    plus `text.proj.weight` (linear) or `text.proj.{0,2}.weight` (mlp).
    The HF subtree converts through transformers'
    `convert_pytorch_state_dict_to_flax` against a Flax model built from
    the SAME config the tower will run (inline `hf_model_config` for
    offline loads, hub config otherwise), so roberta/biomed checkpoints
    load without network access to the original torch weights.
    """
    prefix = "text.transformer."
    hf_keys = {k for k in sd if k.startswith(prefix)}
    if not hf_keys or any(k.startswith("text.transformer.resblocks.") for k in sd):
        return None  # native CustomTextCLIP layout, not an HF tower
    import torch
    from transformers import FlaxAutoModel
    from transformers.modeling_flax_pytorch_utils import (
        convert_pytorch_state_dict_to_flax,
    )

    from .models.hf_text import resolve_hf_config

    hf_config = resolve_hf_config(
        text_cfg.get("hf_model_name"), text_cfg.get("hf_model_config")
    )
    if hf_config.model_type == "m2m_100":
        # nllb towers store the torch M2M100Encoder's own keys
        # (embed_tokens/layers.N/layer_norm); transformers has no Flax
        # M2M100, so remap onto the native encoder port directly.
        from .models.m2m100 import m2m100_torch_encoder_to_flax

        enc_sd = {k[len(prefix):]: np.asarray(sd[k]) for k in hf_keys}
        out = {"hf": dict(m2m100_torch_encoder_to_flax(enc_sd))}
        _attach_hf_proj_head(out, sd)
        return out
    # The converter only reads `base_model_prefix` and a shape-bearing
    # `params` tree; eval_shape gives that without materializing a full
    # random init (xlm-roberta would otherwise allocate ~1GB per load).
    if hf_config.model_type in ("t5", "mt5"):
        from transformers import FlaxT5EncoderModel

        fm = FlaxT5EncoderModel(hf_config, _do_init=False)
    else:
        fm = FlaxAutoModel.from_config(hf_config, _do_init=False)
    shapes = jax.eval_shape(
        lambda: fm.init_weights(jax.random.PRNGKey(0), (1, 8))
    )

    class _Shim:
        base_model_prefix = fm.base_model_prefix
        params = shapes

    pt_sd = {
        k[len(prefix):]: torch.from_numpy(np.array(sd[k])) for k in hf_keys
    }
    if hf_config.model_type in ("t5", "mt5"):
        # Reference t5 towers store the seq2seq model's *encoder half*
        # (a T5Stack: `embed_tokens.weight`, `block.*`, `final_layer_norm.*`,
        # hf_model.py:117-126); the encoder-only Flax layout nests those
        # under `encoder/` with the tied embedding at `shared`.
        def _t5_key(k: str) -> str:
            if k.startswith("encoder.") or k.startswith("shared."):
                return k
            if k.startswith("embed_tokens."):
                return "shared." + k[len("embed_tokens."):]
            return "encoder." + k

        pt_sd = {_t5_key(k): v for k, v in pt_sd.items()}
    hf_params = convert_pytorch_state_dict_to_flax(pt_sd, _Shim())
    out: dict = {"hf": dict(hf_params)}
    _attach_hf_proj_head(out, sd)
    return out


def _attach_hf_proj_head(out: dict, sd: Dict[str, np.ndarray]) -> None:
    """`text.proj.*` keys -> linear/mlp proj params (hf_model.py:146-152)."""
    if "text.proj.weight" in sd:
        out["proj"] = {"kernel": sd["text.proj.weight"].T}
    if "text.proj.0.weight" in sd:  # mlp proj
        out["proj_fc1"] = {"kernel": sd["text.proj.0.weight"].T}
        out["proj_fc2"] = {"kernel": sd["text.proj.2.weight"].T}


def _convert_resnet_visual(sd: Dict[str, np.ndarray]):
    """OpenAI/open_clip ModifiedResNet checkpoint (`visual.*` keys,
    reference modified_resnet.py:95-181) -> native `ModifiedResNet` params
    plus BN running stats ({mean, var} per BatchNorm, the flax
    `batch_stats` collection).

    Torch layout: 3-conv stem (`conv{1..3}`/`bn{1..3}`), bottleneck stages
    `layer{1..4}.{i}` with `conv{1..3}`/`bn{1..3}` and the anti-aliased
    downsample Sequential saved as `downsample.0` (conv) / `downsample.1`
    (bn), and `attnpool.{positional_embedding,q/k/v/c_proj}`.
    """
    params: dict = {}
    stats: dict = {}

    def conv(src):
        return {"kernel": sd[src + ".weight"].transpose(2, 3, 1, 0)}

    def bn(src, p, s, dst):
        p[dst] = {"scale": sd[src + ".weight"], "bias": sd[src + ".bias"]}
        s[dst] = {"mean": sd[src + ".running_mean"], "var": sd[src + ".running_var"]}

    for i in (1, 2, 3):
        params[f"conv{i}"] = conv(f"visual.conv{i}")
        bn(f"visual.bn{i}", params, stats, f"bn{i}")

    blocks = sorted({
        (int(m.group(1)), int(m.group(2)))
        for k in sd
        for m in [re.match(r"visual\.layer(\d+)\.(\d+)\.", k)]
        if m
    })
    for stage, i in blocks:
        src = f"visual.layer{stage}.{i}"
        bp: dict = {}
        bs: dict = {}
        for j in (1, 2, 3):
            bp[f"conv{j}"] = conv(f"{src}.conv{j}")
            bn(f"{src}.bn{j}", bp, bs, f"bn{j}")
        if f"{src}.downsample.0.weight" in sd:
            bp["downsample_conv"] = conv(f"{src}.downsample.0")
            bn(f"{src}.downsample.1", bp, bs, "downsample_bn")
        params[f"layer{stage}_{i}"] = bp
        stats[f"layer{stage}_{i}"] = bs

    pool: dict = {"positional_embedding": sd["visual.attnpool.positional_embedding"]}
    for proj in ("q_proj", "k_proj", "v_proj", "c_proj"):
        pool[proj] = {
            "kernel": sd[f"visual.attnpool.{proj}.weight"].T,
            "bias": sd[f"visual.attnpool.{proj}.bias"],
        }
    params["attnpool"] = pool
    return params, stats


def import_torch_state_dict(
    state_dict: Dict[str, Any],
    *,
    scan_layers: bool = True,
    image_grid: Optional[tuple] = None,
    context_length: Optional[int] = None,
    hf_text_cfg: Optional[dict] = None,
) -> dict:
    """Convert an open_clip/OpenAI CLIP torch state dict to Flax params.

    Handles both the inlined-text `CLIP` layout (`transformer.*` at root,
    reference model.py:222-332) and the `CustomTextCLIP` layout (`text.*`
    prefix), plus HF text towers when `hf_text_cfg` is given; resizes
    pos-embeds when `image_grid`/`context_length` differ from the
    checkpoint (reference factory.py:169-213).
    """
    sd = {k: _to_np(v) for k, v in _strip_module_prefix(state_dict).items()}

    hf_text = _convert_hf_text_tower(sd, hf_text_cfg) if hf_text_cfg else None
    if hf_text is not None:
        # Consume the HF text keys before the CustomTextCLIP strip below
        # would mangle them into the native-tower namespace.
        sd = {k: v for k, v in sd.items() if not k.startswith("text.")}

    # Normalize CustomTextCLIP keys to the inlined layout first
    # (reference model.py:497-512 does the inverse remap).
    if any(k.startswith("text.") for k in sd):
        remapped = {}
        for k, v in sd.items():
            if k.startswith("text."):
                remapped[k[len("text."):]] = v
            else:
                remapped[k] = v
        sd = remapped

    params: dict = {}

    # --- temperature ---
    if "logit_scale" in sd:
        params["logit_scale"] = sd["logit_scale"].reshape(())
    if "logit_bias" in sd:
        params["logit_bias"] = sd["logit_bias"].reshape(())

    # --- vision tower (ModifiedResNet layout; must win over the ViT branch
    # since both carry visual.conv1.weight) ---
    if "visual.layer1.0.conv1.weight" in sd:
        vis, vis_stats = _convert_resnet_visual(sd)
        params["visual"] = vis
        # BN running stats ride a reserved top-level key; factory.create_model
        # pops it and overlays the flax `batch_stats` collection.
        params["batch_stats"] = {"visual": vis_stats}
    # --- vision tower (ViT layout) ---
    elif "visual.conv1.weight" in sd:
        vis: dict = {}
        vis["conv1"] = {"kernel": sd["visual.conv1.weight"].transpose(2, 3, 1, 0)}
        vis["class_embedding"] = sd["visual.class_embedding"]
        vpos = sd["visual.positional_embedding"]
        if image_grid is not None:
            vpos = resize_image_pos_embed(vpos, image_grid)
        vis["positional_embedding"] = vpos
        if "visual.ln_pre.weight" in sd:
            vis["ln_pre"] = {"scale": sd["visual.ln_pre.weight"], "bias": sd["visual.ln_pre.bias"]}
        if "visual.ln_post.weight" in sd:
            vis["ln_post"] = {"scale": sd["visual.ln_post.weight"], "bias": sd["visual.ln_post.bias"]}
        if "visual.proj" in sd:
            vis["proj"] = sd["visual.proj"]
        attn_pool = _attn_pool_params(sd, "visual.attn_pool.")
        if attn_pool is not None:
            # CoCa attentional pooling (reference transformer.py:521-529)
            vis["attn_pool"] = attn_pool
        params["visual"] = vis
        _convert_tower_blocks(sd, "visual.", params, ("visual",), scan_layers)

    # --- text tower ---
    if "token_embedding.weight" in sd:
        txt: dict = {}
        txt["token_embedding"] = {"embedding": sd["token_embedding.weight"]}
        tpos = sd["positional_embedding"]
        if context_length is not None:
            # embed_cls towers (CoCa) carry one extra CLS position
            # (reference transformer.py:715-719).
            target = context_length + (1 if "cls_emb" in sd else 0)
            tpos = resize_text_pos_embed(tpos, target)
        txt["positional_embedding"] = tpos
        txt["ln_final"] = {"scale": sd["ln_final.weight"], "bias": sd["ln_final.bias"]}
        if "text_projection" in sd:
            if sd["text_projection"].ndim == 2:
                txt["text_projection"] = sd["text_projection"]
            else:  # proj_bias Linear variant stored as weight/bias
                pass
        if "text_projection.weight" in sd:
            txt["text_projection"] = {
                "kernel": sd["text_projection.weight"].T,
                "bias": sd.get("text_projection.bias", np.zeros(sd["text_projection.weight"].shape[0])),
            }
        if "cls_emb" in sd:
            txt["cls_emb"] = sd["cls_emb"]
        params["text"] = txt
        _convert_tower_blocks(sd, "", params, ("text",), scan_layers)

    if hf_text is not None:
        params["text"] = jax.tree.map(jnp.asarray, hf_text)

    # --- CoCa multimodal decoder (reference transformer.py:830-926) ---
    if any(k.startswith("text_decoder.") for k in sd):
        dec: dict = {}
        self_layers = _group_layers(sd, r"text_decoder\.resblocks\.(\d+)\.(.+)")
        for i, layer in self_layers.items():
            dec[f"resblocks_{i}"] = _self_block_params(layer)
        cross_layers = _group_layers(sd, r"text_decoder\.cross_attn\.(\d+)\.(.+)")
        for i, layer in cross_layers.items():
            dec[f"cross_attn_{i}"] = _cross_block_params(layer)
        dec["ln_final"] = {
            "scale": sd["text_decoder.ln_final.weight"],
            "bias": sd["text_decoder.ln_final.bias"],
        }
        dec["text_projection"] = sd["text_decoder.text_projection"]
        params["text_decoder"] = dec

    return jax.tree.map(jnp.asarray, params)


_sd_cache: dict = {}  # single-entry raw state-dict cache (peek + load share)


def _read_state_dict(path: str) -> dict:
    """Read the raw torch/safetensors state dict at `path` (1-entry cache:
    the factory peeks the layout before building the model, then the loader
    reads the same file — don't deserialize twice)."""
    key = (path, os.path.getmtime(path))
    if _sd_cache.get("key") == key:
        return _sd_cache["sd"]
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
    else:
        import torch

        try:
            ckpt = torch.load(path, map_location="cpu", weights_only=False)
        except RuntimeError:
            # OpenAI checkpoints are TorchScript archives (reference
            # openai.py:40-55): pull the state dict out of the jit module.
            ckpt = torch.jit.load(path, map_location="cpu").state_dict()
        sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt.state_dict()
    _sd_cache.clear()
    _sd_cache.update(key=key, sd=sd)
    return sd


def peek_is_mobileclip(path: str) -> bool:
    """True when `path` holds an Apple-layout MobileCLIP state dict (the
    factory switches the vision tower to deploy-import mode before build)."""
    if path.endswith(".npz"):
        return False
    from .convert import is_mobileclip_state_dict

    try:
        return is_mobileclip_state_dict(_read_state_dict(path))
    except Exception:  # unreadable/other format: let the real loader report
        return False


def load_torch_checkpoint(path: str, **kwargs) -> dict:
    """Load a `.pt`/`.bin`/`.safetensors`/`.npz` checkpoint into Flax params.

    Handles plain state dicts, `{'state_dict': ...}` training checkpoints,
    OpenAI TorchScript archives (reference openai.py:24-90), and big_vision
    npz files (dispatched to `convert.convert_state_dict`).
    """
    if path.endswith(".npz"):
        from .convert import big_vision_npz_to_params

        return big_vision_npz_to_params(np.load(path), **kwargs)
    sd = _read_state_dict(path)
    from .convert import convert_state_dict

    # dispatches open_clip/OpenAI layouts to import_torch_state_dict and
    # bare timm ViT checkpoints to timm_vit_to_vision_params
    return convert_state_dict({k: _to_np(v) for k, v in _strip_module_prefix(dict(sd)).items()}, **kwargs)


# ---------------------------------------------------------------------------
# Orbax-native train-state checkpointing
# ---------------------------------------------------------------------------

def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(ckpt_dir: str, step: int, state: Any, *, keep: Optional[int] = None) -> None:
    """Save {params, opt_state, step} pytree at `ckpt_dir/<step>` (async-safe)."""
    ocp = _ocp()
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    with ocp.CheckpointManager(
        ckpt_dir, options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True)
    ) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()


def latest_step(ckpt_dir: str) -> Optional[int]:
    ocp = _ocp()
    ckpt_dir = os.path.abspath(ckpt_dir)
    if not os.path.isdir(ckpt_dir):
        return None
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        return mgr.latest_step()


def load_checkpoint(ckpt_dir: str, step: Optional[int] = None, template: Any = None) -> Any:
    """Restore a saved train state; `template` supplies the pytree structure."""
    ocp = _ocp()
    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        step = step if step is not None else mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
        if template is not None:
            restored = mgr.restore(step, args=ocp.args.StandardRestore(template))

            # Re-place every leaf on its template sharding: orbax restores
            # scalars single-device, which breaks jitted steps expecting
            # mesh-consistent state.
            def replace(t, r):
                if hasattr(t, "sharding"):
                    return jax.device_put(r, t.sharding)
                return r

            return jax.tree.map(replace, template, restored)
        return mgr.restore(step)


def config_from_torch_state_dict(state_dict: Dict[str, Any]) -> dict:
    """Infer the model config from a checkpoint's tensor shapes.

    Reference `build_model_from_openai_state_dict` (model.py:515-571)
    reconstructs the architecture from shape introspection so OpenAI/open_clip
    checkpoints load without a JSON config. Returns a factory-style config
    dict {embed_dim, vision_cfg, text_cfg} (quick_gelu left to the caller —
    it is not recoverable from shapes).
    """
    sd = _strip_module_prefix({k: v for k, v in state_dict.items()})

    def shape(key):
        return tuple(sd[key].shape)

    if "visual.layer1.0.conv1.weight" in sd:
        # ModifiedResNet (reference model.py:524-534): stage depths counted
        # from block indices, width = stage-1 planes, image size recovered
        # from the attnpool grid (reduction is always 32x).
        counts = []
        for b in (1, 2, 3, 4):
            counts.append(len({
                k.split(".")[2] for k in sd if k.startswith(f"visual.layer{b}.")
            }))
        vision_width = shape("visual.layer1.0.conv1.weight")[0]
        grid = int(round((shape("visual.attnpool.positional_embedding")[0] - 1) ** 0.5))
        return {
            "embed_dim": int(shape("text_projection")[1]),
            "vision_cfg": {
                "image_size": int(grid * 32),
                "layers": [int(c) for c in counts],
                "width": int(vision_width),
                # heads = width*32/64 in the reference builder (model.py:529)
                "head_width": 64,
            },
            "text_cfg": {
                "context_length": int(shape("positional_embedding")[0]),
                "vocab_size": int(shape("token_embedding.weight")[0]),
                "width": int(shape("ln_final.weight")[0]),
                "heads": int(shape("ln_final.weight")[0]) // 64,
                "layers": len({
                    k.split(".")[2] for k in sd if k.startswith("transformer.resblocks.")
                }),
            },
        }

    if "visual.conv1.weight" not in sd:
        raise NotImplementedError("shape inference covers ViT and ModifiedResNet checkpoints")

    conv = shape("visual.conv1.weight")  # torch OIHW: [width, 3, p, p]
    vision_width, _, patch, _ = conv
    vision_layers = len(
        {k.split(".")[3] for k in sd if k.startswith("visual.transformer.resblocks.")}
    )
    n_pos = shape("visual.positional_embedding")[0]
    grid = int(round((n_pos - 1) ** 0.5))
    image_size = grid * patch
    embed_dim = shape("visual.proj")[1] if "visual.proj" in sd else vision_width

    text_width = shape("ln_final.weight")[0]
    context_length = shape("positional_embedding")[0]
    vocab_size = shape("token_embedding.weight")[0]
    text_layers = len(
        {k.split(".")[2] for k in sd if k.startswith("transformer.resblocks.")}
    )
    text_heads = text_width // 64

    return {
        "embed_dim": int(embed_dim),
        "vision_cfg": {
            "image_size": int(image_size),
            "layers": int(vision_layers),
            "width": int(vision_width),
            "patch_size": int(patch),
        },
        "text_cfg": {
            "context_length": int(context_length),
            "vocab_size": int(vocab_size),
            "width": int(text_width),
            "heads": int(text_heads),
            "layers": int(text_layers),
        },
    }
