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

from .factory import (
    add_model_config,
    create_loss,
    create_model,
    create_model_and_transforms,
    create_model_from_pretrained,
    get_model_config,
    get_tokenizer,
    list_models,
)
from .losses import (
    clip_loss,
    coca_loss,
    distill_clip_loss,
    multi_positive_cross_entropy_loss,
    multipositive_clip_loss,
    multipositive_clip_loss_vision_only,
    multipositive_clip_loss_with_distance,
    multipositive_clip_loss_with_vision,
    siglip_loss,
)
from .models import (
    CLIP,
    CLIPTextCfg,
    CLIPVisionCfg,
    CoCa,
    CustomTextCLIP,
    ModifiedResNet,
    TextTransformer,
    VisionTransformer,
)
from .pretrained import (
    download_pretrained,
    get_pretrained_cfg,
    get_pretrained_url,
    list_pretrained,
    list_pretrained_models_by_tag,
    list_pretrained_tags_by_model,
)
from .serving import export_model, load_exported, save_exported
from .transforms import AugmentationCfg, PreprocessCfg, image_transform, image_transform_v2
from .utils import to_2tuple
