"""Fine-tune a CLIP with a HuggingFace text tower, partially locked.

The BiomedCLIP workflow (reference main_biomedclip.py + hf_model.py lock):
a BERT-family text tower whose weights live in the Flax params tree —
trainable, checkpointable — with all but the last N encoder layers frozen.

Runs OFFLINE on CPU with a tiny inline BERT config (the real PubMedBERT
weights overlay automatically when the HF hub is reachable — see
`factory.create_model` / model config `ViT-B-16-biomed`).

Run: python examples/finetune_hf_text_tower.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

# Force CPU before any backend initializes: probing jax.default_backend()
# first would cache the accelerator backend and make this a no-op (CLAUDE.md
# gotcha — this example must never queue on the exclusive TPU chip).
jax.config.update("jax_platforms", "cpu")

from functools import partial

import numpy as np
import jax.numpy as jnp

from mrclip_tpu.losses import clip_loss
from mrclip_tpu.models.clip import CLIP
from mrclip_tpu.parallel import (
    build_train_step, create_optimizer, create_train_state, make_loss_apply,
)
from mrclip_tpu.parallel.freeze import build_trainable_mask, chain_with_mask

# 1. CLIP with a HF (BERT) text tower, built from an inline config —
#    zero hub access. For BiomedCLIP proper: create_model("ViT-B-16-biomed").
model = CLIP(
    embed_dim=32,
    vision_cfg={"image_size": 32, "layers": 2, "width": 32, "head_width": 16, "patch_size": 16},
    text_cfg={
        "context_length": 16,
        "hf_model_name": "example/tiny-bert",
        "hf_model_config": {
            "model_type": "bert", "vocab_size": 256, "hidden_size": 32,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "intermediate_size": 64, "max_position_embeddings": 64,
        },
        "hf_proj_type": "mlp", "hf_pooler_type": "cls_pooler",
    },
    scan_layers=False,
)
rng = np.random.RandomState(0)
imgs = jnp.asarray(rng.rand(8, 32, 32, 3), jnp.float32)
toks = jnp.asarray(rng.randint(1, 256, (8, 16)), jnp.int32)
variables = dict(model.init(jax.random.key(0), imgs, toks))
print("HF weights are real params:", "hf" in variables["params"]["text"])

# 2. lock: freeze embeddings + all but the LAST encoder layer
#    (reference hf_model.py:171-193 -> optax update masks here)
class Args:
    lock_image = False
    lock_text = True
    lock_text_unlocked_layers = 1
    lock_text_freeze_layer_norm = True
    freeze = False

mask = build_trainable_mask(variables["params"], Args())
tx = chain_with_mask(create_optimizer(lr=3e-3, wd=0.0), mask)
state = create_train_state(variables, tx)
step = build_train_step(model, make_loss_apply(partial(clip_loss)), tx, donate=False)

# 3. a few steps: loss decreases, frozen layer stays bit-identical
frozen0 = jax.tree.map(np.asarray, state.params["text"]["hf"]["encoder"]["layer"]["0"])
batch = {"images": imgs, "tokens": toks}
for i in range(5):
    state, metrics = step(state, batch, jax.random.fold_in(jax.random.key(1), i))
    print(f"step {i}: loss={float(metrics['loss']):.4f}")

moved = jax.tree.map(
    lambda a, b: float(np.abs(a - np.asarray(b)).max()),
    frozen0, state.params["text"]["hf"]["encoder"]["layer"]["0"],
)
print("frozen layer max delta:", max(jax.tree.leaves(moved)), "(must be 0.0)")
assert max(jax.tree.leaves(moved)) == 0.0
print("OK")
