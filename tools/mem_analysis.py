"""Static HBM budget for a bench-equivalent train step.

The axon TPU client reports RESOURCE_EXHAUSTED with no allocation detail, so
OOMs through the tunnel are opaque. This compiles the SAME train-step program
bench.py builds — model, precision, loss impl, optimizer, donation — on the
local CPU backend and prints XLA's buffer-assignment statistics
(`compiled.memory_analysis()`): argument/output/temp/constant bytes. CPU and
TPU buffer assignments differ in fusion detail but the dominant arrays
(activations, optimizer state, loss intermediates) are identical sizes, so
the scaling term between two batch sizes pinpoints what blows the 15.75 GiB
budget.

Usage:
  python tools/mem_analysis.py --model coca_ViT-B-32 --batch-size 96 \
      --loss-impl chunked [--caption-chunk 12] [--remat] [--steps 1]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="coca_ViT-B-32")
    p.add_argument("--batch-size", type=int, default=96)
    p.add_argument("--loss-impl", default="dense", choices=["dense", "chunked", "pallas"])
    p.add_argument("--caption-chunk", type=int, default=None)
    p.add_argument("--precision", default="bf16")
    p.add_argument("--attn-impl", default="bf16")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--opt", default="adamw")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from mrclip_tpu.factory import create_loss, create_model, get_model_config
    from mrclip_tpu.parallel import (
        build_train_step,
        create_optimizer,
        create_train_state,
        make_loss_apply,
    )

    model, variables = create_model(
        args.model,
        precision=args.precision,
        grad_checkpointing=args.remat,
        attn_impl=args.attn_impl,
        gelu_approx=True,
        scan_layers=None,
    )
    cfg = get_model_config(args.model) or {}
    img = cfg.get("vision_cfg", {}).get("image_size", 224)
    if not isinstance(img, int):
        img = img[0]
    ctx = cfg.get("text_cfg", {}).get("context_length", 98)
    vocab = cfg.get("text_cfg", {}).get("vocab_size", 49408)
    b = args.batch_size

    class LossArgs:
        multipositiveloss = "coca" not in args.model.lower()
        siglip = False
        delta = 0.5
        distance = visiononly = distill = False
        lam = None
        model = args.model
        gather_with_grad = True
        chunked_loss = args.loss_impl == "chunked"
        pallas_loss = args.loss_impl == "pallas"
        loss_chunk_size = 1024
        caption_chunk_size = args.caption_chunk or max(4, (16 * 96) // b)

    tx = create_optimizer(lr=1e-4, wd=0.2, opt=args.opt, moments_dtype="bfloat16")
    state = create_train_state(variables, tx)
    step = build_train_step(
        model, make_loss_apply(create_loss(LossArgs())), tx, donate=True
    )

    batch = {
        "images": jnp.zeros((b, img, img, 3), jnp.uint8),
        "tokens": jnp.zeros((b, ctx), jnp.int32),
        "labels": jnp.zeros((b,), jnp.int32),
    }
    rng = jax.random.key(0)

    print(f"lowering {args.model} b{b} loss={args.loss_impl} "
          f"caption_chunk={LossArgs.caption_chunk_size} ...", file=sys.stderr)
    lowered = jax.jit(step, donate_argnums=(0,)).lower(state, batch, rng)
    print("compiling (CPU buffer assignment)...", file=sys.stderr)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    if ma is None:
        print("no memory_analysis available on this backend", file=sys.stderr)
        return 1
    gib = 1024**3
    fields = [
        ("arguments", "argument_size_in_bytes"),
        ("outputs", "output_size_in_bytes"),
        ("temps", "temp_size_in_bytes"),
        ("generated code", "generated_code_size_in_bytes"),
        ("aliases", "alias_size_in_bytes"),
    ]
    total = 0
    for label, attr in fields:
        v = getattr(ma, attr, None)
        if v is None:
            continue
        if label in ("arguments", "temps", "generated code"):
            total += v
        print(f"{label:>16}: {v / gib:8.3f} GiB")
    print(f"{'args+temps+code':>16}: {total / gib:8.3f} GiB "
          "(donated args alias outputs; TPU budget 15.75 GiB incl. ~1.3 GiB reserved)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
