"""Scale-config validation: ViT-L/14 @ 32k global batch lowers with real
shardings (BASELINE.md progression config 4) — trace-level proof that the
sharded step (remat + chunked streaming loss + fsdp/tp mesh) is well-formed
without compiling/executing it.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrclip_tpu.factory import create_loss, create_model
from mrclip_tpu.parallel import (
    build_train_step,
    create_mesh,
    create_optimizer,
    create_train_state,
    make_loss_apply,
)


class Args:
    multipositiveloss = True
    delta = 0.5
    distance = visiononly = siglip = distill = False
    lam = None
    model = "ViT-L-14"
    gather_with_grad = True


@pytest.mark.parametrize("global_batch", [32768])
def test_vitl14_32k_lowers(global_batch):
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = create_mesh(dp=2, fsdp=2, tp=2)

    model, _ = create_model("ViT-L-14", init_params=False, grad_checkpointing=True)

    # Abstract variables: no weights materialize.
    imgs_a = jax.ShapeDtypeStruct((global_batch, 224, 224, 3), jnp.bfloat16)
    toks_a = jax.ShapeDtypeStruct((global_batch, 98), jnp.int32)
    variables_shape = jax.eval_shape(
        lambda: model.init(
            jax.random.key(0),
            jnp.zeros((1, 224, 224, 3), jnp.bfloat16),
            jnp.zeros((1, 98), jnp.int32),
        )
    )

    tx = create_optimizer(lr=1e-4)
    state_shape = jax.eval_shape(
        lambda v: create_train_state(dict(v), tx), variables_shape
    )

    step = build_train_step(model, make_loss_apply(create_loss(Args()), mesh), tx, mesh, donate=False)

    batch_shape = {
        "images": imgs_a,
        "tokens": toks_a,
        "labels": jax.ShapeDtypeStruct((global_batch,), jnp.int32),
    }
    key_shape = jax.eval_shape(lambda: jax.random.key(0))
    lowered = step.lower(state_shape, batch_shape, key_shape)
    hlo = lowered.as_text()
    # Pre-partitioning StableHLO: collectives appear after GSPMD runs at
    # compile time; at this stage the proof is (a) 8-way partitioning is
    # requested, (b) shardings are annotated, (c) the full 32k global batch
    # shapes trace without error.
    assert "num_partitions = 8" in hlo
    assert "sharding" in hlo
    assert str(global_batch) in hlo
