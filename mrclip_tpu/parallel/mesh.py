"""Device mesh + sharding rules.

TPU-native replacement for the reference's process-group machinery
(`src/open_clip_train/distributed.py`): `jax.distributed.initialize()`
replaces torchrun/SLURM rendezvous; a `jax.sharding.Mesh` with axes
`(data, fsdp, model)` replaces DDP. Parameters are sharded by path-based
rules (ZeRO-style over `fsdp`, tensor-parallel over `model`); batches are
sharded over `(data, fsdp)` combined. XLA/GSPMD inserts the ICI collectives
(psum for grads — DDP's all-reduce hooks; all-gather for the contrastive
global batch).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "init_distributed",
    "create_mesh",
    "batch_spec",
    "param_sharding_rules",
    "shard_params",
    "replicate",
    "local_batch_to_global",
]

DATA_AXES = ("data", "fsdp")


def init_distributed() -> Tuple[int, int]:
    """Multi-host init (replaces reference distributed.py:94-198).

    Returns (process_index, process_count). Single-process when no
    coordinator is configured — the TPU runtime handles rendezvous. On TPU
    pods, `jax.distributed.initialize()` auto-detects the topology; for
    explicit rendezvous (torchrun-style), set `JAX_COORDINATOR_ADDRESS`
    plus `JAX_NUM_PROCESSES` / `JAX_PROCESS_ID` (the latter two are needed
    because jax's own env fallback only covers the coordinator address).
    CPU processes get gloo collectives so multi-process runs work off-TPU
    (tests/test_multiprocess.py drives 2 real processes this way).
    """
    import os

    coord = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if coord:
        if jax.config.jax_platforms and "cpu" in jax.config.jax_platforms:
            try:
                jax.config.update("jax_cpu_collectives_implementation", "gloo")
            except Exception:  # noqa: BLE001 - older jaxlib without the knob
                pass
        nproc = os.environ.get("JAX_NUM_PROCESSES")
        pid = os.environ.get("JAX_PROCESS_ID")
        if nproc is not None and pid is not None:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(nproc),
                process_id=int(pid),
            )
        else:
            jax.distributed.initialize()
    return jax.process_index(), jax.process_count()


def create_mesh(
    dp: Optional[int] = None,
    fsdp: int = 1,
    tp: int = 1,
    *,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, fsdp, model) mesh over the available devices.

    `dp=None` absorbs all remaining devices into the data axis. Axis order
    puts `model` innermost so tensor-parallel collectives ride the
    fastest ICI links.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % (fsdp * tp) == 0, f"{n} devices not divisible by fsdp*tp={fsdp * tp}"
        dp = n // (fsdp * tp)
    assert dp * fsdp * tp == n, f"mesh {dp}x{fsdp}x{tp} != {n} devices"
    arr = np.array(devices).reshape(dp, fsdp, tp)
    return Mesh(arr, axis_names=("data", "fsdp", "model"))


def batch_spec() -> P:
    """Batches shard their leading dim over both data-like axes."""
    return P(DATA_AXES)


def _dim_divisible(shape, dim, size) -> bool:
    return 0 <= dim < len(shape) and shape[dim] % size == 0 and shape[dim] >= size


def param_sharding_rules(path: str, shape: Tuple[int, ...], mesh: Mesh) -> P:
    """Path-based sharding for CLIP params.

    Tensor-parallel (`model` axis): attention QKV/MLP expand on their output
    dim, their contractions on the input dim — the Megatron pattern, which
    needs only one psum per block. FSDP: remaining large params shard their
    biggest divisible dim. Scalars/norm params replicate.
    """
    fsdp_size = mesh.shape["fsdp"]
    tp_size = mesh.shape["model"]
    ndim = len(shape)
    spec = [None] * ndim

    def last(off=1):
        return ndim - off

    # Scan layout (path ...['blocks']['block']...) carries a leading layer
    # axis that must stay unsharded. Unrolled layouts use ['blocks_i'] keys,
    # which must NOT match here — their dim 0 is a real feature dim.
    is_stacked = "['blocks']" in path

    # Tensor-parallel patterns. Column-parallel (shard the OUTPUT dim):
    # attention QKV projections + MLP up-projection; row-parallel (shard the
    # INPUT dim): attention output + MLP down-projection. Covers the native
    # naming (in_proj/c_fc/out_proj/c_proj), the HF Flax BERT/RoBERTa scheme
    # (attention/self/{query,key,value}, intermediate/dense out-dim;
    # attention/output/dense + <mlp> output/dense in-dim), and distilbert
    # (q_lin/k_lin/v_lin/ffn lin1 vs out_lin/lin2).
    # EVA02 SwiGLU (models/layers.py): fc1_g/fc1_x expand (column),
    # fc2 contracts (row). The SwiGLU sub-LN ('norm', 1-D) replicates like
    # every other norm param.
    _TP_COL = ("in_proj", "c_fc", "q_proj", "k_proj", "v_proj",
               "['query']", "['key']", "['value']", "['intermediate']",
               "q_lin", "k_lin", "v_lin", "['lin1']",
               "fc1_g", "fc1_x", "['fc1']")
    _TP_ROW = ("out_proj", "c_proj", "['output']['dense']",
               "out_lin", "['lin2']", "['fc2']")

    if ndim >= 2:
        if tp_size > 1:
            if any(p in path for p in _TP_COL) and "kernel" in path and \
                    _dim_divisible(shape, last(), tp_size):
                spec[last()] = "model"
            elif any(p in path for p in _TP_ROW) and "kernel" in path and \
                    _dim_divisible(shape, last(2), tp_size):
                spec[last(2)] = "model"
        if fsdp_size > 1:
            # Shard the largest still-unsharded dim (ZeRO-3 style).
            free_dims = [d for d in range(1 if is_stacked else 0, ndim) if spec[d] is None]
            if free_dims:
                best = max(free_dims, key=lambda d: shape[d])
                if _dim_divisible(shape, best, fsdp_size):
                    spec[best] = "fsdp"
    # 1-D params (biases, norms, small embeddings) stay replicated: the
    # gather cost outweighs the memory saved.
    return P(*spec)


def shard_params(params, mesh: Mesh):
    """Apply `param_sharding_rules` across a param pytree -> NamedShardings."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in flat:
        pstr = jax.tree_util.keystr(path)
        spec = param_sharding_rules(pstr, leaf.shape, mesh)
        out.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, out)


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def local_batch_to_global(mesh: Mesh, batch):
    """Device_put host-local numpy batch shards onto the mesh batch sharding.

    Single-process path: one host holds the full batch and scatters it.
    Multi-host: each process contributes its local shard via
    `jax.make_array_from_process_local_data`.
    """
    sharding = NamedSharding(mesh, batch_spec())
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), batch
    )
