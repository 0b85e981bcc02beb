"""Real multi-process distributed execution (VERDICT r3 weak point 5).

Every other distributed test is ONE process with 8 virtual devices; this
file launches TWO OS processes (4 virtual CPU devices each, gloo
collectives, local TCP coordinator via `init_distributed`'s env rendezvous
— reference `distributed.py:158-181` world-size/rank plumbing) and checks
that per-host `DistributedSampler` rank slices + `local_batch_to_global`'s
`make_array_from_process_local_data` path reproduce the single-process
8-device train step: same loss, same grad norm, same updated params.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh"
)

N_SAMPLES = 32  # global batch == dataset size (one step)

# One training step of the mini CLIP on a DistributedSampler slice. The
# worker computes ONLY its rank's local half; `local_batch_to_global`
# assembles the global batch across processes.
WORKER = """
import os, sys
sys.path.insert(0, {repo!r})
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from mrclip_tpu.parallel import init_distributed

rank, world = init_distributed()
assert world == 2 and jax.device_count() == 8 and jax.local_device_count() == 4

from tests.test_multiprocess import run_step, local_indices

idx = local_indices(rank, world)
loss, gnorm, psum = run_step(idx)
print(f"RESULT rank={{rank}} loss={{loss!r}} gnorm={{gnorm!r}} psum={{psum!r}}", flush=True)
"""


def local_indices(rank, world):
    """This rank's DistributedSampler slice of the epoch-0 order."""
    from mrclip_tpu.data import DistributedSampler

    sampler = DistributedSampler(N_SAMPLES, rank, world, shuffle=True, seed=0)
    sampler.set_epoch(0)
    return list(sampler)


def global_order(world=2):
    """Device order of the assembled global batch: process p's local slice
    lands on its own devices, so the global array is the concatenation of
    the rank slices in process order."""
    return np.concatenate([local_indices(r, world) for r in range(world)])


def _dataset(indices):
    """Deterministic synthetic samples addressed by global index."""
    images = np.stack([
        np.random.RandomState(1000 + i).rand(64, 64, 3).astype(np.float32)
        for i in indices
    ])
    tokens = np.stack([
        np.random.RandomState(2000 + i).randint(1, 49408, (32,)).astype(np.int32)
        for i in indices
    ])
    labels = np.array([i % 8 for i in indices], dtype=np.int32)
    return {"images": images, "tokens": tokens, "labels": labels}


def run_step(indices):
    """One dp2 x fsdp2 x tp2 multipositive train step over `indices`'
    samples (this process's local shard). Returns (loss, grad_norm,
    param_abs_sum) as python floats."""
    import jax.numpy as jnp

    from mrclip_tpu.factory import create_loss, create_model
    from mrclip_tpu.parallel import (
        build_train_step,
        create_mesh,
        create_optimizer,
        create_train_state,
        local_batch_to_global,
        make_loss_apply,
    )

    class Args:
        multipositiveloss = True
        delta = 0.5
        distance = visiononly = siglip = distill = False
        lam = None
        model = "ViT-B-32-mini"
        gather_with_grad = True
        chunked_loss = False
        pallas_loss = False
        loss_chunk_size = 256

    mesh = create_mesh(dp=2, fsdp=2, tp=2)
    model, variables = create_model("ViT-B-32-mini", precision="fp32", rng_seed=0)
    tx = create_optimizer(lr=1e-3, wd=0.1)
    state = create_train_state(variables, tx, mesh)
    step = build_train_step(
        model, make_loss_apply(create_loss(Args()), mesh), tx, mesh, donate=False
    )
    batch = local_batch_to_global(mesh, _dataset(indices))
    state, metrics = step(state, batch, jax.random.key(7))
    psum = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda p: jnp.abs(p.astype(jnp.float32)).sum(), state.params),
    )
    return float(metrics["loss"]), float(metrics["grad_norm"]), float(psum)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_matches_single_process():
    port = _free_port()
    procs = []
    base_env = {
        k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    for rank in range(2):
        env = dict(
            base_env,
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(rank),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", textwrap.dedent(WORKER.format(repo=REPO))],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                cwd=REPO,
            )
        )
    results = {}
    for rank, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"rank {rank} failed:\n{out}\n{err}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][0]
        kv = dict(f.split("=", 1) for f in line.split()[1:])
        results[int(kv["rank"])] = (
            float(kv["loss"]), float(kv["gnorm"]), float(kv["psum"])
        )

    # Both processes observe the same global step.
    assert results[0] == results[1], results

    # Single-process 8-device reference over the SAME assembled global batch.
    ref_loss, ref_gnorm, ref_psum = run_step(global_order())

    loss, gnorm, psum = results[0]
    assert np.isfinite(loss)
    assert abs(loss - ref_loss) <= 1e-6, (loss, ref_loss)
    assert abs(gnorm - ref_gnorm) <= 1e-5 * max(1.0, ref_gnorm), (gnorm, ref_gnorm)
    assert abs(psum - ref_psum) <= 1e-6 * max(1.0, abs(ref_psum)), (psum, ref_psum)


def test_sampler_slices_partition_dataset():
    """Rank slices are disjoint, exhaustive, and identically shuffled."""
    a, b = local_indices(0, 2), local_indices(1, 2)
    assert len(a) == len(b) == N_SAMPLES // 2
    assert not set(a) & set(b)
    assert set(a) | set(b) == set(range(N_SAMPLES))
