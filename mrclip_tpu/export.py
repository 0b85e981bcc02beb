"""Export CLI: model + checkpoint -> serveable StableHLO artifact.

TPU-native replacement for the reference's TorchScript deployment flags
(reference main.py:293-294 `--torchscript`, model.py:574-587
`trace_model`): instead of tracing a torch module, the jitted encoders are
serialized as portable StableHLO (`serving.export_model`) that
`mrclip_tpu.serve` can run without any model code.

Usage:
  python -m mrclip_tpu.export --model ViT-B-16 \
      [--checkpoint /path/to/ckpt_or_torch.pt] [--pretrained TAG] \
      [--batch-size N | symbolic] [--int8] --output model.mrclip
"""

from __future__ import annotations

import argparse


def main(argv=None) -> str:
    # Honor the caller's JAX_PLATFORMS (same re-assert as bench.py/train
    # main): TPU plugins register themselves ahead of the env var, so
    # JAX_PLATFORMS=cpu would otherwise silently grab the TPU. The plugin's
    # own sitecustomize *injects* JAX_PLATFORMS=<plugin> into every process,
    # so that value is not a caller request — re-asserting it would clobber
    # an in-process jax.config cpu setting (e.g. the test conftest) and
    # block on an unreachable TPU backend.
    import os

    import jax

    _envp = os.environ.get("JAX_PLATFORMS")
    if _envp and _envp.lower() != "axon":
        jax.config.update("jax_platforms", _envp)

    from .utils import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser("mrclip_tpu export")
    p.add_argument("--model", required=True, help="model config name, e.g. ViT-B-16")
    p.add_argument(
        "--checkpoint", default=None,
        help="checkpoint to bake in: orbax dir or torch .pt/.bin/.safetensors",
    )
    p.add_argument(
        "--pretrained", default=None,
        help="pretrained tag (mrclip_tpu.pretrained registry) or path/URL",
    )
    p.add_argument(
        "--batch-size", type=int, default=None,
        help="fixed serve batch (default: symbolic, any batch size)",
    )
    p.add_argument(
        "--int8", action="store_true",
        help="W8A8 quantized encoders (int8 MXU matmuls, ~4x smaller artifact)",
    )
    p.add_argument("--precision", default="fp32", help="compute dtype baked into the artifact")
    p.add_argument(
        "--gelu-approx", action="store_true",
        help="tanh-approximate GELU in the artifact (serving throughput mode)",
    )
    p.add_argument(
        "--attn-impl", default="xla",
        choices=["xla", "manual", "bf16", "fused", "fusedp"],
        help="attention kernel baked into the artifact. bf16 (scores in the "
        "compute dtype) is the measured serving mode for small/latency "
        "batches (2895 imgs/s at b8 on v5e); fusedp wins large-batch "
        "throughput (3230 vs 2672 at b256, +21%) — its tile padding loses "
        "below ~b32. fused/fusedp exported on a TPU host embed Pallas "
        "custom calls (artifact then serves only on TPU); exported on CPU "
        "they lower through the interpreter to plain portable HLO",
    )
    p.add_argument("--output", required=True, help="output .mrclip artifact path")
    args = p.parse_args(argv)

    from .factory import create_model, get_model_config
    from .serving import export_model, save_exported

    cfg = get_model_config(args.model) or {}
    hf_tok = cfg.get("text_cfg", {}).get("hf_tokenizer_name")

    model, variables = create_model(
        args.model,
        precision=args.precision,
        pretrained=args.pretrained or args.checkpoint,
        init_params=not (args.pretrained or args.checkpoint),
        gelu_approx=args.gelu_approx,
        attn_impl=args.attn_impl,
        scan_layers=False,  # unrolled layout: serving default, required for --int8
    )
    exported = export_model(
        model, variables, batch_size=args.batch_size, int8=args.int8,
        tokenizer_name=hf_tok,
    )
    save_exported(exported, args.output)
    print(f"exported {args.model} -> {args.output} "
          f"(int8={args.int8}, batch={args.batch_size or 'symbolic'})")
    return args.output


if __name__ == "__main__":
    main()
