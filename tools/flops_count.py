"""Exact per-step FLOPs of the bench train step via XLA cost analysis.

The axon TPU client returns no cost analysis, so this lowers the identical
program on the CPU backend (lowering only — no compile/execute; HLO FLOP
counts are backend-independent) and prints FLOPs/step + GFLOPs/pair. Combine
with the measured pairs/sec from bench.py for a trace-backed MFU:

    MFU = pairs_per_sec * gflops_per_pair / peak_tflops

Usage: python tools/flops_count.py [--batch-size 80] [--remat] [--no-scan]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=80)
    parser.add_argument("--model", type=str, default="ViT-B-16")
    parser.add_argument("--remat", action="store_true")
    parser.add_argument("--remat-policy", type=str, default="dots")
    parser.add_argument("--no-scan", action="store_true", default=True)
    parser.add_argument("--scan", dest="no_scan", action="store_false")
    parser.add_argument("--attn-impl", type=str, default="xla",
                        help="flash lowers a pallas call whose flops XLA "
                        "can't see; use xla for counting (same math)")
    parser.add_argument("--precision", type=str, default="bf16")
    parser.add_argument("--gelu-approx", action="store_true")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from mrclip_tpu.factory import create_loss, create_model
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
        remat_policy=args.remat_policy,
        scan_layers=not args.no_scan,
        attn_impl=args.attn_impl,
        gelu_approx=args.gelu_approx,
    )

    class LossArgs:
        multipositiveloss = True
        delta = 0.5
        distance = visiononly = siglip = distill = False
        lam = None
        model = args.model
        gather_with_grad = True
        chunked_loss = pallas_loss = False

    batch = args.batch_size
    # Shapes follow the model config (coca ctx 76, SigLIP squash sizes,
    # convnext 256px, ...) exactly as bench.py's TPU path does.
    from mrclip_tpu.factory import get_model_config

    mcfg = get_model_config(args.model) or {}
    img = mcfg.get("vision_cfg", {}).get("image_size", 224)
    if not isinstance(img, int):
        img = img[0]
    ctx = mcfg.get("text_cfg", {}).get("context_length", 98)
    vocab = mcfg.get("text_cfg", {}).get("vocab_size", 49408)
    tx = create_optimizer(lr=1e-4, wd=0.2)
    state = create_train_state(variables, tx)
    step = build_train_step(model, make_loss_apply(create_loss(LossArgs())), tx, donate=False)
    rng = np.random.RandomState(0)
    batch_data = {
        "images": jnp.asarray(rng.randint(0, 256, (batch, img, img, 3)), jnp.uint8),
        "tokens": jnp.asarray(rng.randint(1, vocab, (batch, ctx)), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 32, (batch,)), jnp.int32),
    }
    from mrclip_tpu.ops.image_ops import normalize_images

    fstep = jax.jit(
        lambda s, b, k: step.raw(s, dict(b, images=normalize_images(b["images"])), k)
    )
    lowered = fstep.lower(state, batch_data, jax.random.key(0))
    cost = lowered.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops = float(cost["flops"])
    print(json.dumps({
        "model": args.model,
        "batch": batch,
        "remat": args.remat,
        "flops_per_step": flops,
        "gflops_per_pair": round(flops / batch / 1e9, 3),
        "bytes_accessed": cost.get("bytes accessed"),
    }))


if __name__ == "__main__":
    main()
