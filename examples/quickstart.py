"""Quickstart: build, train a few steps, evaluate, export — pure library API.

Run on CPU: python examples/quickstart.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

# Force CPU before any backend initializes: probing jax.default_backend()
# first would cache (and possibly block on) the accelerator backend and
# make the cpu override a no-op. Set MRCLIP_EXAMPLE_TPU=1 to run on TPU.
if not os.environ.get("MRCLIP_EXAMPLE_TPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

import mrclip_tpu as oc
from mrclip_tpu.parallel import (
    build_train_step, create_optimizer, create_train_state, make_loss_apply,
)
from mrclip_tpu.train.scheduler import cosine_lr

# 1. model + tokenizer (open_clip-style factory)
model, variables = oc.create_model("ViT-B-32-mini")
tokenizer = oc.get_tokenizer("ViT-B-32-mini")

# 2. a toy batch: captions mention the label, images carry it as a bright
# quadrant (a spatial pattern — LayerNorm would erase plain brightness)
rng = np.random.RandomState(0)
labels = rng.randint(0, 4, 32)
images = rng.rand(32, 64, 64, 3).astype("float32") * 0.2
for idx, l in enumerate(labels):
    qr, qc = divmod(int(l), 2)
    images[idx, qr * 32 : (qr + 1) * 32, qc * 32 : (qc + 1) * 32] += 0.8
tokens = tokenizer([f"an mri of protocol {l}" for l in labels])

batch = {
    "images": jnp.asarray(images),
    "tokens": jnp.asarray(tokens),
    "labels": jnp.asarray(labels),
}


# 3. multipositive loss + train step
class Args:
    multipositiveloss = True
    delta = 0.5
    distance = visiononly = siglip = distill = False
    lam = None
    model = "ViT-B-32-mini"
    gather_with_grad = True


loss_fn = oc.create_loss(Args())
# 5e-4: 2e-3 overshoots this 2-layer model into the uniform-logits collapse
# (loss pins at ln(32)); at 5e-4 the loss reaches the multipositive optimum
# ln(|positives|) ~ 2.08 and R@1 hits 1.0.
tx = create_optimizer(lr=cosine_lr(5e-4, 10, 150), wd=0.01)
state = create_train_state(variables, tx)
step = build_train_step(model, make_loss_apply(loss_fn), tx, donate=False)

for i in range(150):
    state, metrics = step(state, batch, jax.random.fold_in(jax.random.key(0), i))
    if i % 50 == 0:
        print(f"step {i:3d}  loss {float(metrics['loss']):.4f}")
print(f"final loss {float(metrics['loss']):.4f}")

# 4. retrieval metrics
out = model.apply({"params": state.params}, batch["images"], batch["tokens"])
from mrclip_tpu.train.metrics import get_clip_metrics

m = get_clip_metrics(
    np.asarray(out["image_features"]), np.asarray(out["text_features"]),
    float(out["logit_scale"]), labels,
)
print("i2t R@1:", m["image_to_text_general_R@1"])

# 5. export for serving
from mrclip_tpu.serving import export_model, save_exported

save_exported(export_model(model, {"params": state.params}, batch_size=None), "/tmp/quickstart.mrclip")
print("exported to /tmp/quickstart.mrclip — serve with:")
print("  python -m mrclip_tpu.serve --model /tmp/quickstart.mrclip --port 8080")
