"""Parameter freezing / tower locking as optax update masks.

Capability parity with the reference's `requires_grad=False` machinery:
- `lock_image_tower` (reference model.py:264, transformer.py:541-572): freeze
  the visual tower, optionally unlocking the last N groups (stem | blocks |
  last-block+ln_post | proj).
- `lock_text_tower` (model.py:403): freeze text, unlocking last N layers.
- `--freeze`/`--freezelast` (train.py:85-91): freeze the text transformer
  except its last K blocks.

JAX delta: instead of flags on tensors, a mask pytree (1.0 trainable / 0.0
frozen) multiplies the final optimizer updates — frozen params receive
exactly zero update (including weight decay). Scan-stacked block params get
per-layer masks broadcast over the leading layer axis.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["build_trainable_mask", "apply_update_mask", "chain_with_mask"]


def _ones_like_mask(params):
    return jax.tree.map(lambda p: np.float32(1.0), params)


def _layer_mask(leaf, n_layers: int, unlocked_last: int):
    """Per-layer float mask over the stacked [L, ...] leading axis."""
    m = np.zeros((n_layers,), np.float32)
    if unlocked_last > 0:
        m[-unlocked_last:] = 1.0
    shape = (n_layers,) + (1,) * (np.ndim(leaf) - 1)
    return m.reshape(shape)


def _tower_layers(tower_params) -> int:
    blocks = tower_params.get("transformer", {}).get("blocks", {})
    if "block" in blocks:  # scan-stacked
        leaf = jax.tree.leaves(blocks["block"])[0]
        return leaf.shape[0]
    return sum(1 for k in tower_params.get("transformer", {}) if k.startswith("blocks_"))


def _freeze_tower(mask: dict, params: dict, tower: str, unlocked_groups: int) -> None:
    """Freeze `tower` params, unlocking the trailing `unlocked_groups` of the
    reference's group list: [stem, block_0..block_{L-2}, block_{L-1}+post, proj]."""
    tower_p = params[tower]
    n_layers = _tower_layers(tower_p)
    # group count = 1 stem + (L-1) early blocks + 1 (last block + post-ln) + 1 proj
    n_groups = 1 + max(n_layers - 1, 0) + 1 + 1
    unlocked_groups = max(0, min(unlocked_groups, n_groups))
    first_unlocked = n_groups - unlocked_groups  # group index

    def group_of(key: str) -> int:
        if key in ("conv1", "class_embedding", "positional_embedding", "ln_pre",
                   "token_embedding"):
            return 0
        if key in ("proj", "text_projection"):
            return n_groups - 1
        if key in ("ln_post", "ln_final", "attn_pool"):
            return n_groups - 2
        return -1  # transformer handled separately

    new_mask = {}
    for key, sub in mask[tower].items():
        g = group_of(key)
        if key == "transformer":
            blocks = tower_p["transformer"].get("blocks", {})
            if "block" in blocks:
                unlocked_layers = max(0, unlocked_groups - 2)  # proj + last-block groups
                # last block belongs to group n_groups-2
                if unlocked_groups >= 2:
                    unlocked_layers = unlocked_groups - 2 + 1
                unlocked_layers = min(unlocked_layers, n_layers)
                new_mask[key] = {
                    "blocks": {
                        "block": jax.tree.map(
                            lambda leaf: _layer_mask(leaf, n_layers, unlocked_layers),
                            blocks["block"],
                        )
                    }
                }
            else:
                sub_new = {}
                for bk, bv in mask[tower]["transformer"].items():
                    idx = int(bk.split("_")[-1])
                    group = 1 + idx if idx < n_layers - 1 else n_groups - 2
                    val = 1.0 if group >= first_unlocked else 0.0
                    sub_new[bk] = jax.tree.map(lambda _: np.float32(val), bv)
                new_mask[key] = sub_new
        else:
            val = 1.0 if (g >= 0 and g >= first_unlocked) else 0.0
            new_mask[key] = jax.tree.map(lambda _: np.float32(val), sub)
    mask[tower] = new_mask


def _find_layer_stack(tree: dict, prefix: tuple = ()) -> Optional[tuple]:
    """Path to the dict of numbered encoder layers ('0', '1', ...) inside a
    HF params tree (bert: encoder/layer; distilbert: transformer/layer; ...)."""
    for k, v in tree.items():
        if isinstance(v, dict):
            if v and all(isinstance(key, str) and key.isdigit() for key in v):
                return prefix + (k,)
            found = _find_layer_stack(v, prefix + (k,))
            if found is not None:
                return found
    return None


def _freeze_hf_tower(
    mask: dict, params: dict, tower: str, unlocked_layers: int, freeze_layer_norm: bool = True
) -> None:
    """HF text tower locking (reference hf_model.py:171-193): freeze the HF
    transformer (embeddings + pooler + all but the last `unlocked_layers`
    encoder layers); LayerNorm params follow `freeze_layer_norm`. The proj
    head (outside `hf/`) stays trainable, as in the reference."""
    hf_p = params[tower]["hf"]

    def freeze_subtree(sub, path=()):
        out = {}
        for k, v in sub.items():
            if isinstance(v, dict):
                out[k] = freeze_subtree(v, path + (k,))
            else:
                is_ln = any("layernorm" in p.lower() or "layer_norm" in p.lower()
                            for p in path + (k,))
                out[k] = np.float32(1.0 if (is_ln and not freeze_layer_norm) else 0.0)
        return out

    frozen = freeze_subtree(hf_p)
    if unlocked_layers > 0:
        stack_path = _find_layer_stack(hf_p)
        if stack_path is not None:
            node_p, node_m = hf_p, frozen
            for k in stack_path:
                node_p, node_m = node_p[k], node_m[k]
            layer_ids = sorted(node_p, key=int)
            for lid in layer_ids[-unlocked_layers:]:
                node_m[lid] = jax.tree.map(lambda _: np.float32(1.0), node_p[lid])
    mask[tower] = dict(mask[tower])
    mask[tower]["hf"] = frozen


def build_trainable_mask(params: dict, args) -> Optional[dict]:
    """Mask pytree from the CLI lock/freeze flags; None if nothing frozen."""
    lock_image = getattr(args, "lock_image", False)
    lock_text = getattr(args, "lock_text", False)
    freeze = getattr(args, "freeze", False)
    if not (lock_image or lock_text or freeze):
        return None

    mask = jax.tree.map(lambda p: np.float32(1.0), params)
    if lock_image and "visual" in params:
        _freeze_tower(mask, params, "visual", getattr(args, "lock_image_unlocked_groups", 0))
    if lock_text and "text" in params:
        if "hf" in params["text"]:
            _freeze_hf_tower(
                mask, params, "text",
                getattr(args, "lock_text_unlocked_layers", 0),
                getattr(args, "lock_text_freeze_layer_norm", True),
            )
        else:
            _freeze_tower(mask, params, "text", getattr(args, "lock_text_unlocked_layers", 0))
    if freeze and "text" in params and "hf" in params["text"]:
        # --freeze on a HF tower: same semantics via the HF mask, unlocking
        # the last K encoder layers.
        keep_last = getattr(args, "freezelast", False)
        k = int(keep_last) if isinstance(keep_last, int) and not isinstance(keep_last, bool) else (
            2 if keep_last else 0
        )
        _freeze_hf_tower(mask, params, "text", k, True)
    elif freeze and "text" in params:
        # --freeze/--freezelast: text transformer frozen except last K blocks
        # (reference train.py:85-91).
        keep_last = getattr(args, "freezelast", False)
        k = int(keep_last) if isinstance(keep_last, int) and not isinstance(keep_last, bool) else (
            2 if keep_last else 0
        )
        tower_p = params["text"]
        n_layers = _tower_layers(tower_p)
        blocks = tower_p["transformer"].get("blocks", {})
        if "block" in blocks:
            mask["text"]["transformer"]["blocks"]["block"] = jax.tree.map(
                lambda leaf: _layer_mask(leaf, n_layers, min(k, n_layers)), blocks["block"]
            )
        else:
            for bk in mask["text"]["transformer"]:
                idx = int(bk.split("_")[-1])
                val = 1.0 if idx >= n_layers - k else 0.0
                mask["text"]["transformer"][bk] = jax.tree.map(
                    lambda _: np.float32(val), mask["text"]["transformer"][bk]
                )
    return mask


def apply_update_mask(mask: Any) -> optax.GradientTransformation:
    """Multiply final updates by the mask (0 -> fully frozen, incl. decay)."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        return jax.tree.map(lambda u, m: u * jnp.asarray(m, u.dtype), updates, mask), state

    return optax.GradientTransformation(init, update)


def chain_with_mask(tx: optax.GradientTransformation, mask: Optional[Any]):
    if mask is None:
        return tx
    return optax.chain(tx, apply_update_mask(mask))
