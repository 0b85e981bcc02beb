"""On-chip Mosaic probe for the head-batched packed-attention formulation.

The first batched attempt used `x.reshape(n, heads, d).transpose(1, 0, 2)`
inside the kernel — Mosaic rejects that (`infer-vector-layout: unsupported
shape cast` on `tpu.reshape (1x197x768) -> (197x12x64)`, q8 log 10:02).
This probe validates the alternative: gather lane-dim head slices into a
VMEM scratch [H, N, D] via per-head stores (no tpu.reshape), then run the
whole attention as H-batched dot_generals. Compiles a TINY kernel through
the tunnel (~1-3 min) before committing an 80-min bench attempt to it.

Run only when the chip is free (takes the exclusive flock first).
"""

import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from mrclip_tpu.utils import acquire_chip_lock  # noqa: E402

acquire_chip_lock()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

B, N, H, D = 4, 197, 12, 64


def kern(q_ref, k_ref, v_ref, o_ref, q3, k3, v3, *, heads, d):
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        q3[h] = q_ref[0, :, sl]
        k3[h] = k_ref[0, :, sl]
        v3[h] = v_ref[0, :, sl]
    q, k, v = q3[:], k3[:], v3[:]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * (1.0 / np.sqrt(d))
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        (p / l).astype(q.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    for h in range(heads):
        o_ref[0, :, h * d : (h + 1) * d] = o[h].astype(q.dtype)


def main():
    spec = pl.BlockSpec((1, N, H * D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        functools.partial(kern, heads=H, d=D),
        grid=(B,),
        in_specs=[spec] * 3,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, N, H * D), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((H, N, D), jnp.bfloat16)] * 3,
    )
    rng = np.random.RandomState(0)
    q, k, v = (
        jnp.asarray(rng.randn(B, N, H * D), jnp.float32).astype(jnp.bfloat16)
        for _ in range(3)
    )
    out = jax.jit(f)(q, k, v)
    ref = jax.nn.dot_product_attention(
        q.reshape(B, N, H, D), k.reshape(B, N, H, D), v.reshape(B, N, H, D)
    ).reshape(B, N, H * D)
    md = float(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)).max())
    print("maxdiff vs jax reference:", md)
    assert md < 2e-2, md
    print("SCRATCH-BATCHED KERNEL OK on", jax.devices())


if __name__ == "__main__":
    main()
