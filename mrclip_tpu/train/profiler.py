"""Model FLOPs/params profiler.

Capability parity with reference `src/open_clip_train/profiler.py:82-205`
(per-model GFLOPs + Mparams, CSV output) — TPU-native via XLA's own
`cost_analysis()` on the compiled forward, which reports exactly what the
hardware will execute (fused, layout-assigned), not a symbolic torch count.

CLI: `python -m mrclip_tpu.train.profiler --model ViT-B-16 [--results-file x.csv]`
"""

from __future__ import annotations

import argparse
import json
from typing import Optional

import numpy as np

__all__ = ["profile_model", "main"]


def _tree_size(tree) -> int:
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def profile_model(model_name: str, batch_size: int = 1, force_image_size: Optional[int] = None) -> dict:
    import jax
    import jax.numpy as jnp

    from ..factory import create_model, get_model_config

    # scan_layers=False: XLA cost analysis counts while-loop bodies once,
    # undercounting scanned stacks; unrolled graphs report true totals.
    model, _ = create_model(
        model_name, force_image_size=force_image_size, init_params=False, scan_layers=False
    )
    cfg = get_model_config(model_name)
    image_size = force_image_size or cfg["vision_cfg"]["image_size"]
    if isinstance(image_size, int):
        image_size = (image_size, image_size)
    ctx = cfg["text_cfg"].get("context_length", 98)

    images = jax.ShapeDtypeStruct((batch_size,) + tuple(image_size) + (3,), jnp.float32)
    tokens = jax.ShapeDtypeStruct((batch_size, ctx), jnp.int32)

    # Abstract init: shapes only, no weight materialization (cheap for L-size).
    variables = jax.eval_shape(
        lambda: model.init(
            jax.random.key(0),
            jnp.zeros((1,) + tuple(image_size) + (3,), jnp.float32),
            jnp.zeros((1, ctx), jnp.int32),
        )
    )

    def flops_of(fn, *args) -> Optional[float]:
        try:
            compiled = jax.jit(fn).lower(variables, *args).compile()
            analyses = compiled.cost_analysis()
            analysis = analyses[0] if isinstance(analyses, (list, tuple)) else analyses
            return float(analysis.get("flops", float("nan")))
        except Exception:
            return None

    image_flops = flops_of(lambda v, im: model.apply(v, im, None), images)
    text_flops = flops_of(lambda v, tk: model.apply(v, None, tk), tokens)
    total_flops = flops_of(lambda v, im, tk: model.apply(v, im, tk), images, tokens)

    params = variables["params"]
    res = {
        "model": model_name,
        "image_size": image_size[0],
        "image_width": cfg["vision_cfg"].get("width"),
        "text_width": cfg["text_cfg"].get("width"),
        "embed_dim": cfg.get("embed_dim"),
        "mparams": round(_tree_size(params) / 1e6, 2),
        "image_mparams": round(_tree_size(params.get("visual", {})) / 1e6, 2),
        "text_mparams": round(_tree_size(params.get("text", {})) / 1e6, 2),
    }
    for name, fl in [("image_gflops", image_flops), ("text_gflops", text_flops), ("gflops", total_flops)]:
        res[name] = round(fl / 1e9, 2) if fl is not None else None
    return res


def main(argv=None):
    parser = argparse.ArgumentParser("mrclip_tpu profiler")
    parser.add_argument("--model", type=str, default="ViT-B-16", help="comma-separated model names, or 'all'")
    parser.add_argument("--results-file", type=str, default=None, help="csv output path")
    parser.add_argument("--batch-size", type=int, default=1)
    args = parser.parse_args(argv)

    from ..factory import list_models

    names = list_models() if args.model == "all" else args.model.split(",")
    rows = [profile_model(name.strip(), args.batch_size) for name in names]
    for row in rows:
        print(json.dumps(row))

    if args.results_file:
        import csv

        with open(args.results_file, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            writer.writeheader()
            writer.writerows(rows)


if __name__ == "__main__":
    main()
