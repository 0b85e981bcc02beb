"""MR-CLIP-TPU: a TPU-native (JAX/Flax/XLA/Pallas) rebuild of MR-CLIP.

Public API mirrors the reference `src/open_clip/__init__.py` capability
surface: model factory, tokenizers, losses, transforms — re-designed for
JAX/TPU (functional modules, pjit sharding, Pallas kernels).
"""

__version__ = "0.1.0"

from .constants import (
    DEFAULT_CONTEXT_LENGTH,
    IMAGENET_MEAN,
    IMAGENET_STD,
    INCEPTION_MEAN,
    INCEPTION_STD,
    OPENAI_DATASET_MEAN,
    OPENAI_DATASET_STD,
)
from .tokenizer import HFTokenizer, SimpleTokenizer, decode, tokenize
