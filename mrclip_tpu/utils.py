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

from itertools import repeat
from typing import Any

import jax
import numpy as np

__all__ = ["to_2tuple", "to_ntuple", "batch_norm_param_mask"]


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
