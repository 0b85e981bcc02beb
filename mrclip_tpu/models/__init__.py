from .clip import (
    CLIP,
    CLIPTextCfg,
    CLIPVisionCfg,
    CustomTextCLIP,
    SimCLRProjectionHead,
    TabularEncoder,
    build_text_tower,
    build_vision_tower,
)
from .layers import (
    MLP,
    AttentionalPooler,
    LayerNorm,
    LayerScale,
    MultiHeadAttention,
    PatchDropout,
    QuickGELU,
    quick_gelu,
)
from .resnet import AttentionPool2d, Bottleneck, ModifiedResNet
from .text import TextTransformer
from .transformer import ResidualAttentionBlock, Transformer, text_global_pool
from .vision import VisionTransformer
from .coca import CoCa, MultimodalCfg, MultimodalTransformer, generate
from .clip import CLIPTabular
