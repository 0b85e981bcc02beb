"""Small shared utilities.

Capability parity with reference `src/open_clip/utils.py`:
- `to_2tuple` (:49-61),
- `freeze_batch_norm_2d` (:9-45): in JAX, BN "freezing" decomposes into
  (a) running stats not updating — pass `train=False` / keep `batch_stats`
  out of the mutable set, and (b) scale/bias not training — an optax update
  mask (see `parallel.freeze`). `batch_norm_param_mask` builds (b).
- the bnb int8-linear replacement (:65-89) is CUDA-only; TPU quantization
  lives in `ops/` (Pallas int8 kernels) instead.
"""

from __future__ import annotations

import os
from itertools import repeat
from typing import Any

import jax
import numpy as np

__all__ = [
    "to_2tuple",
    "to_ntuple",
    "batch_norm_param_mask",
    "enable_compilation_cache",
]


def enable_compilation_cache(default_dir: str | None = None) -> None:
    """Point JAX's persistent compilation cache at a local directory.

    TPU compiles through the tunnel take minutes; with the cache on, a rerun
    of an identical program (bench retries after a tunnel flap, the driver's
    round-end `bench.py` after the queue already measured the same config)
    deserializes the executable instead of recompiling. Entries are keyed by
    HLO + backend/compiler version, so CPU test entries and TPU entries
    coexist, and a backend without executable serialization just logs a
    notice and skips — never an error.

    Opt out (or redirect) with `MRCLIP_JAX_CACHE` (empty string disables).
    """
    path = os.environ.get("MRCLIP_JAX_CACHE")
    if path is None:
        path = default_dir or os.path.join(
            os.path.expanduser("~"), ".cache", "mrclip_jax"
        )
    if not path:
        return
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # Tiny test-model compiles churn the dir for no win; only persist
        # compiles that actually cost something.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # noqa: BLE001 - older jax without these knobs
        pass


def to_ntuple(n: int):
    def parse(x):
        if isinstance(x, (list, tuple)):
            return tuple(x)
        return tuple(repeat(x, n))

    return parse


to_2tuple = to_ntuple(2)


def batch_norm_param_mask(params: Any) -> Any:
    """Mask pytree: 0.0 on BatchNorm scale/bias, 1.0 elsewhere.

    Chain via `parallel.freeze.apply_update_mask` to freeze BN affine params
    (the reference's `freeze_batch_norm_2d`, utils.py:9-45).
    """

    def decide(path, leaf):
        name = jax.tree_util.keystr(path).lower()
        return np.float32(0.0 if ("bn" in name or "batchnorm" in name) else 1.0)

    return jax.tree_util.tree_map_with_path(decide, params)
