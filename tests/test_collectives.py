"""Post-GSPMD collective audit of the compiled train step.

`test_scale_lowering` checks the pre-partitioning StableHLO; these tests go
one step further and inspect the PARTITIONED module XLA actually executes,
pinning the communication design (SURVEY.md §2.8): the collectives that ride
the mesh must be the designed ones — feature/param all-gathers and gradient
all-reduces — and incidental resharding all-to-alls must stay byte-wise
negligible. A silent sharding-annotation regression (replicating the global
logits, resharding activations every layer) shows up here as an exploding
all-to-all/all-gather byte ratio long before anyone profiles a real pod.
"""

import re

import numpy as np
import pytest

import jax

from mrclip_tpu.factory import create_loss, create_model
from mrclip_tpu.parallel import (
    build_train_step,
    create_mesh,
    create_optimizer,
    create_train_state,
    local_batch_to_global,
    make_loss_apply,
)

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
                "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _shape_bytes(shapes: str) -> int:
    """Total bytes of every `dtype[d0,d1,...]` in an HLO type string
    (handles tuples by summing their elements)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(shapes):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def _collective_bytes(hlo: str) -> dict:
    """Map collective kind -> (count, output bytes) over a compiled module."""
    out = {}
    for line in hlo.splitlines():
        m = re.search(
            r"= (\S+) (all-gather|all-reduce|reduce-scatter|all-to-all|"
            r"collective-permute)[.\w]*\(", line)
        if not m:
            continue
        kind = m.group(2)
        cnt, size = out.get(kind, (0, 0))
        out[kind] = (cnt + 1, size + _shape_bytes(m.group(1)))
    return out


class Args:
    multipositiveloss = True
    delta = 0.5
    distance = visiononly = siglip = distill = False
    lam = None
    model = "ViT-B-32-mini"
    gather_with_grad = True
    chunked_loss = False
    pallas_loss = False


def _compiled_step_hlo(mesh):
    model, variables = create_model("ViT-B-32-mini")
    tx = create_optimizer(lr=1e-3, wd=0.1)
    state = create_train_state(variables, tx, mesh)
    step = build_train_step(
        model, make_loss_apply(create_loss(Args()), mesh), tx, mesh, donate=False
    )
    rng = np.random.RandomState(0)
    n = 16
    batch = local_batch_to_global(mesh, {
        "images": rng.rand(n, 64, 64, 3).astype(np.float32),
        "tokens": rng.randint(1, 49408, (n, 32)).astype(np.int32),
        "labels": rng.randint(0, 4, (n,)).astype(np.int32),
    })
    lowered = jax.jit(step, donate_argnums=()).lower(
        state, batch, jax.random.key(0)
    )
    return lowered.compile().as_text()


@pytest.mark.parametrize("axes", [
    pytest.param(dict(dp=4, fsdp=2, tp=1), marks=pytest.mark.slow),
    dict(dp=2, fsdp=2, tp=2),  # default: the densest mix (dp+fsdp+tp)
])
def test_train_step_collectives_are_the_designed_ones(axes):
    mesh = create_mesh(**axes)
    coll = _collective_bytes(_compiled_step_hlo(mesh))

    # The designed communication exists: all-gathers (global-batch feature
    # gather + fsdp param gathers) and all-reduces (gradient psum).
    assert coll.get("all-gather", (0, 0))[0] > 0, coll
    assert coll.get("all-reduce", (0, 0))[0] > 0, coll

    ag_bytes = coll["all-gather"][1] + coll.get("reduce-scatter", (0, 0))[1]
    a2a_bytes = coll.get("all-to-all", (0, 0))[1]
    # Incidental resharding (all-to-all) must stay negligible next to the
    # designed collectives; a sharding regression that reshards activations
    # per layer (or replicates the global logits) blows this ratio up.
    assert a2a_bytes < 0.05 * ag_bytes, (
        f"all-to-all moved {a2a_bytes}B vs designed {ag_bytes}B: {coll}"
    )
