"""Int8 weight + dynamic-activation quantized inference.

The reference has no quantized-serving story; this is a TPU-native extension
for deployment (SURVEY.md §6 serving throughput). The v5e MXU runs
int8 x int8 -> int32 matmuls at 2x the bf16 FLOP rate (394 TOPS vs 197
TFLOP/s), and int8 kernels halve weight HBM traffic vs bf16, so
forward-only encode throughput improves even when activations must be
requantized on the fly.

Scheme (standard W8A8 dynamic):
  - weights: per-output-channel symmetric int8 (`scale = max|k| / 127`),
    quantized once offline by `quantize_dense_kernels`.
  - activations: per-row symmetric int8 computed inside the step (two cheap
    VPU passes: an abs-max reduction and a scaled cast), so no calibration
    data is needed.
  - accumulation in int32 on the MXU, then one fused rescale
    `acc * (s_x * s_w)` back to the compute dtype.

Only 2D Dense kernels are quantized (attention in/out projections, MLP,
HF-text dense layers) — where ~95% of the forward FLOPs are. Scan-stacked
`[L, in, out]` kernels are left in bf16 — quantized serving assumes the
unrolled layout, which is already the serving/throughput default
(`create_model` auto-unrolls <=24-layer stacks). The conv-shaped patchify
kernel ([ph, pw, 3, w] — 4D, fails the 2D walk) and the bare projection
leaves (`visual/proj`, `text_projection` — raw matmul params, not Dense
modules the interceptor could swap) stay in the compute dtype, as do
LayerNorms, biases and the attention einsums. nn.Embed tables get int8
rows dequantized at the gather (pure weight compression).

Execution uses a Flax method interceptor (`nn.intercept_methods`): Dense
calls whose module path has a quantized kernel are swapped for the int8
matmul; everything else runs unmodified. The interceptor fires at trace
time only, so there is zero per-step Python cost under jit.

Usage:
    variables_q, qkernels = quantize_dense_kernels(variables)
    fn = make_quantized_apply(model)          # fn(variables_q, qkernels, ...)
    feats = jax.jit(fn)(variables_q, qkernels, images, None)
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "quantize_dense_kernels",
    "make_quantized_apply",
    "int8_matmul",
]

# qkernels: {module_path_tuple: entry}. Dense entries are
# {"q": int8 [in, out], "s": f32 [out]}; Embed entries are {"s": f32 [vocab]}
# (their int8 table replaces the "embedding" leaf in the variables tree).
QKernels = Dict[Tuple[str, ...], Dict[str, jax.Array]]


def _quantize_kernel(kernel: jax.Array) -> Dict[str, jax.Array]:
    """Per-output-channel symmetric int8 quantization of a [in, out] kernel."""
    k = jnp.asarray(kernel, jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(k), axis=0), 1e-8) / 127.0  # [out]
    q = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale}


def _quantize_embedding(table: jax.Array) -> Dict[str, jax.Array]:
    """Per-row symmetric int8 for an [vocab, dim] embedding table."""
    t = jnp.asarray(table, jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(t), axis=1), 1e-8) / 127.0  # [vocab]
    q = jnp.clip(jnp.round(t / scale[:, None]), -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale}


def quantize_dense_kernels(
    variables: dict, *, min_elems: int = 1 << 12
) -> Tuple[dict, QKernels]:
    """Quantize every 2D Dense kernel and Embed table in `variables["params"]`.

    Returns `(variables_without_those_leaves, qkernels)`. The stripped
    tree stays valid for `model.apply` because the interceptor bypasses the
    quantized module bodies entirely (their `self.param(...)` is never
    read). Leaves smaller than `min_elems` stay fp — the rescale overhead
    would dominate.
    """
    qkernels: QKernels = {}

    def walk(tree: dict, path: Tuple[str, ...]) -> dict:
        out = {}
        for name, sub in tree.items():
            if isinstance(sub, dict):
                if (
                    "kernel" in sub
                    and getattr(sub["kernel"], "ndim", 0) == 2
                    and sub["kernel"].size >= min_elems
                ):
                    qkernels[path + (name,)] = _quantize_kernel(sub["kernel"])
                    rest = {k: v for k, v in sub.items() if k != "kernel"}
                    out[name] = walk(rest, path + (name,))
                elif (
                    set(sub) == {"embedding"}
                    and getattr(sub["embedding"], "ndim", 0) == 2
                    and sub["embedding"].size >= min_elems
                ):
                    # nn.Embed table (its params dict holds EXACTLY one
                    # "embedding" leaf — the strict match keeps arbitrary
                    # modules that happen to own an "embedding" param out of
                    # this path, since the interceptor only dequantizes
                    # nn.Embed): int8 rows, dequantized at the gather (pure
                    # weight compression — there is no matmul to win).
                    # Unlike Dense (@nn.compact), Embed declares its param in
                    # setup(), which runs before the intercepted __call__ —
                    # so the int8 table REPLACES the leaf in-place and only
                    # the per-row scales live in the side table.
                    ent = _quantize_embedding(sub["embedding"])
                    qkernels[path + (name,)] = {"s": ent["s"]}
                    out[name] = {"embedding": ent["q"]}
                else:
                    out[name] = walk(sub, path + (name,))
            else:
                out[name] = sub
        return out

    params = variables.get("params", {})
    stripped = dict(variables)
    stripped["params"] = walk(params, ())
    return stripped, qkernels


def int8_matmul(
    x: jax.Array, q: jax.Array, s: jax.Array, out_dtype: Any = jnp.bfloat16
) -> jax.Array:
    """`x @ dequant(q)` with dynamic per-row int8 activation quantization.

    x: [..., in] float; q: int8 [in, out]; s: f32 [out] weight scales.
    The int8 x int8 contraction hits the MXU's double-rate path; the
    surrounding abs-max / cast / rescale are VPU elementwise ops XLA fuses.
    """
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, q,
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * sx * s).astype(out_dtype)


def make_quantized_apply(model):
    """Build `fn(variables, qkernels, images, tokens) -> model_out` where
    Dense layers present in `qkernels` run as int8 MXU matmuls.

    `variables` should be the stripped tree from `quantize_dense_kernels`;
    both it and `qkernels` are ordinary pytree arguments, so the function
    jits without baking weights in as constants.
    """

    def fn(
        variables: dict,
        qkernels: QKernels,
        images: Optional[jax.Array],
        tokens: Optional[jax.Array],
    ):
        def interceptor(next_fun, args, kwargs, context):
            mod = context.module
            if context.method_name != "__call__" or mod.path not in qkernels:
                return next_fun(*args, **kwargs)
            ent = qkernels[mod.path]
            if isinstance(mod, nn.Dense):
                out_dtype = mod.dtype if mod.dtype is not None else jnp.float32
                y = int8_matmul(args[0], ent["q"], ent["s"], out_dtype=out_dtype)
                if mod.use_bias:
                    bias = mod.param(
                        "bias", mod.bias_init, (mod.features,), mod.param_dtype
                    )
                    y = y + jnp.asarray(bias, out_dtype)
                return y
            if isinstance(mod, nn.Embed):
                ids = args[0]
                out_dtype = mod.dtype if mod.dtype is not None else jnp.float32
                rows = jnp.take(mod.embedding, ids, axis=0).astype(jnp.float32)
                return (rows * ent["s"][ids][..., None]).astype(out_dtype)
            if "q" not in ent:
                # An embed-style entry whose owner is not nn.Embed: its leaf
                # was replaced with raw int8 codes — running the module body
                # would silently compute garbage. Fail loudly instead.
                raise RuntimeError(
                    f"quantized embedding at {mod.path} is owned by "
                    f"{type(mod).__name__}, not nn.Embed; exclude it from "
                    "quantize_dense_kernels"
                )
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(interceptor):
            return model.apply(variables, images, tokens)

    return fn
