"""Pretrained-weight registry + download machinery.

Capability parity with reference `src/open_clip/pretrained.py` (792 LoC):
- tag -> {url | hf_hub} registry per architecture with preprocessing
  overrides (:40-90, the `_PRETRAINED` table),
- `list_pretrained`, `get_pretrained_cfg`, `get_pretrained_url` lookups
  (:611-657),
- `download_pretrained_from_url` with sha256 verification (:659-703),
- `download_pretrained_from_hf` preferring safetensors (:726-760),
- `download_pretrained` dispatch (:763+).

The registry covers the architectures this framework ships configs for; the
checkpoint files are torch/safetensors and convert through
`checkpoint.load_torch_checkpoint` on load.
"""

from __future__ import annotations

import hashlib
import os
import urllib.request
import warnings
from typing import Dict, Optional

from .constants import (
    HF_SAFE_WEIGHTS_NAME,
    HF_WEIGHTS_NAME,
    IMAGENET_MEAN,
    IMAGENET_STD,
    OPENAI_DATASET_MEAN,
    OPENAI_DATASET_STD,
)

__all__ = [
    "list_pretrained",
    "list_pretrained_models_by_tag",
    "list_pretrained_tags_by_model",
    "get_pretrained_cfg",
    "get_pretrained_url",
    "download_pretrained",
    "download_pretrained_from_url",
    "download_pretrained_from_hf",
    "is_pretrained_cfg",
]


def _pcfg(url: str = "", hf_hub: str = "", sha256: str = "", **kwargs) -> dict:
    cfg = dict(url=url, hf_hub=hf_hub, sha256=sha256)
    cfg.update(kwargs)
    return cfg


def _apcfg(**kwargs) -> dict:  # OpenAI/LAION default preprocessing
    return _pcfg(mean=OPENAI_DATASET_MEAN, std=OPENAI_DATASET_STD, **kwargs)


def _slpcfg(**kwargs) -> dict:  # SigLIP/webli preprocessing (reference :34-38)
    return _pcfg(
        mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
        interpolation="bicubic", resize_mode="squash", **kwargs
    )


def _clipacfg(**kwargs) -> dict:  # CLIPA preprocessing (reference _apcfg :66-77)
    return _pcfg(
        mean=IMAGENET_MEAN, std=IMAGENET_STD,
        interpolation="bilinear", resize_mode="squash", **kwargs
    )


def _mccfg(**kwargs) -> dict:  # MobileCLIP preprocessing (reference :79-90)
    return _pcfg(
        mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0),
        interpolation="bilinear", resize_mode="shortest", **kwargs
    )


_OPENAI_BASE = "https://openaipublic.azureedge.net/clip/models"

_GH = "https://github.com/mlfoundations/open_clip/releases/download/v0.2-weights"

# Tags for every architecture this framework ships a config for (reference
# pretrained.py:93-608, incl. the EVA/CLIPA/ViTamin/MobileCLIP timm-module
# families, all rebuilt natively; ViTamin/MobileCLIP checkpoint CONVERSION
# remains gated in convert.py pending an oracle — see PARITY.md).
_PRETRAINED: Dict[str, Dict[str, dict]] = {
    "RN50": {
        "openai": _apcfg(
            url=f"{_OPENAI_BASE}/afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762/RN50.pt",
            quick_gelu=True,
        ),
        "yfcc15m": _apcfg(hf_hub="timm/resnet50_clip.yfcc15m/", quick_gelu=True),
        "cc12m": _apcfg(hf_hub="timm/resnet50_clip.cc12m/", quick_gelu=True),
    },
    "RN101": {
        "openai": _apcfg(
            url=f"{_OPENAI_BASE}/8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599/RN101.pt",
            quick_gelu=True,
        ),
        "yfcc15m": _apcfg(
            url=f"{_GH}/rn101-quickgelu-yfcc15m-3e04b30e.pt",
            hf_hub="timm/resnet101_clip.yfcc15m/",
            quick_gelu=True,
        ),
    },
    "RN50x4": {
        "openai": _apcfg(
            url=f"{_OPENAI_BASE}/7e526bd135e493cef0776de27d5f42653e6b4c8bf9e0f653bb11773263205fdd/RN50x4.pt",
            hf_hub="timm/resnet50x4_clip.openai/",
            quick_gelu=True,
        ),
    },
    "RN50x16": {
        "openai": _apcfg(
            url=f"{_OPENAI_BASE}/52378b407f34354e150460fe41077663dd5b39c54cd0bfd2b27167a4a06ec9aa/RN50x16.pt",
            hf_hub="timm/resnet50x16_clip.openai/",
            quick_gelu=True,
        ),
    },
    "RN50x64": {
        "openai": _apcfg(
            url=f"{_OPENAI_BASE}/be1cfb55d75a9666199fb2206c106743da0f6468c9d327f3e0d0a543a9919d9c/RN50x64.pt",
            hf_hub="timm/resnet50x64_clip.openai/",
            quick_gelu=True,
        ),
    },
    "ViT-B-32": {
        "openai": _apcfg(
            url=f"{_OPENAI_BASE}/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt",
            quick_gelu=True,
        ),
        "laion400m_e31": _apcfg(
            url=f"{_GH}/vit_b_32-quickgelu-laion400m_e31-d867053b.pt",
            hf_hub="timm/vit_base_patch32_clip_224.laion400m_e31/",
            quick_gelu=True,
        ),
        "laion400m_e32": _apcfg(
            url=f"{_GH}/vit_b_32-quickgelu-laion400m_e32-46683a32.pt",
            hf_hub="timm/vit_base_patch32_clip_224.laion400m_e32/",
            quick_gelu=True,
        ),
        "laion2b_e16": _apcfg(
            url=f"{_GH}/vit_b_32-laion2b_e16-af8dbd0c.pth",
            hf_hub="timm/vit_base_patch32_clip_224.laion2b_e16/",
        ),
        "laion2b_s34b_b79k": _apcfg(hf_hub="laion/CLIP-ViT-B-32-laion2B-s34B-b79K/"),
        "datacomp_xl_s13b_b90k": _apcfg(hf_hub="laion/CLIP-ViT-B-32-DataComp.XL-s13B-b90K/"),
        "datacomp_m_s128m_b4k": _apcfg(hf_hub="laion/CLIP-ViT-B-32-DataComp.M-s128M-b4K/"),
        "datacomp_s_s13m_b4k": _apcfg(hf_hub="laion/CLIP-ViT-B-32-DataComp.S-s13M-b4K/"),
        "commonpool_m_clip_s128m_b4k": _apcfg(hf_hub="laion/CLIP-ViT-B-32-CommonPool.M.clip-s128M-b4K/"),
        "commonpool_m_laion_s128m_b4k": _apcfg(hf_hub="laion/CLIP-ViT-B-32-CommonPool.M.laion-s128M-b4K/"),
        "commonpool_m_image_s128m_b4k": _apcfg(hf_hub="laion/CLIP-ViT-B-32-CommonPool.M.image-s128M-b4K/"),
        "commonpool_m_text_s128m_b4k": _apcfg(hf_hub="laion/CLIP-ViT-B-32-CommonPool.M.text-s128M-b4K/"),
        "commonpool_m_basic_s128m_b4k": _apcfg(hf_hub="laion/CLIP-ViT-B-32-CommonPool.M.basic-s128M-b4K/"),
        "commonpool_m_s128m_b4k": _apcfg(hf_hub="laion/CLIP-ViT-B-32-CommonPool.M-s128M-b4K/"),
        "commonpool_s_clip_s13m_b4k": _apcfg(hf_hub="laion/CLIP-ViT-B-32-CommonPool.S.clip-s13M-b4K/"),
        "commonpool_s_laion_s13m_b4k": _apcfg(hf_hub="laion/CLIP-ViT-B-32-CommonPool.S.laion-s13M-b4K/"),
        "commonpool_s_image_s13m_b4k": _apcfg(hf_hub="laion/CLIP-ViT-B-32-CommonPool.S.image-s13M-b4K/"),
        "commonpool_s_text_s13m_b4k": _apcfg(hf_hub="laion/CLIP-ViT-B-32-CommonPool.S.text-s13M-b4K/"),
        "commonpool_s_basic_s13m_b4k": _apcfg(hf_hub="laion/CLIP-ViT-B-32-CommonPool.S.basic-s13M-b4K/"),
        "commonpool_s_s13m_b4k": _apcfg(hf_hub="laion/CLIP-ViT-B-32-CommonPool.S-s13M-b4K/"),
    },
    "ViT-B-32-256": {
        "datacomp_s34b_b86k": _apcfg(
            hf_hub="laion/CLIP-ViT-B-32-256x256-DataComp-s34B-b86K/"
        ),
    },
    "ViT-B-16-plus-240": {
        "laion400m_e31": _apcfg(
            url=f"{_GH}/vit_b_16_plus_240-laion400m_e31-8fb26589.pt",
            hf_hub="timm/vit_base_patch16_plus_clip_240.laion400m_e31/",
        ),
        "laion400m_e32": _apcfg(
            url=f"{_GH}/vit_b_16_plus_240-laion400m_e32-699c4b84.pt",
            hf_hub="timm/vit_base_patch16_plus_clip_240.laion400m_e32/",
        ),
    },
    "ViT-B-16": {
        "openai": _apcfg(
            url=f"{_OPENAI_BASE}/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt",
            quick_gelu=True,
        ),
        "laion400m_e31": _apcfg(
            url=f"{_GH}/vit_b_16-laion400m_e31-00efa78f.pt",
            hf_hub="timm/vit_base_patch16_clip_224.laion400m_e31/",
        ),
        "laion400m_e32": _apcfg(
            url=f"{_GH}/vit_b_16-laion400m_e32-55e67d44.pt",
            hf_hub="timm/vit_base_patch16_clip_224.laion400m_e32/",
        ),
        "laion2b_s34b_b88k": _apcfg(hf_hub="laion/CLIP-ViT-B-16-laion2B-s34B-b88K/"),
        "datacomp_xl_s13b_b90k": _apcfg(hf_hub="laion/CLIP-ViT-B-16-DataComp.XL-s13B-b90K/"),
        "datacomp_l_s1b_b8k": _apcfg(hf_hub="laion/CLIP-ViT-B-16-DataComp.L-s1B-b8K/"),
        "commonpool_l_clip_s1b_b8k": _apcfg(hf_hub="laion/CLIP-ViT-B-16-CommonPool.L.clip-s1B-b8K/"),
        "commonpool_l_laion_s1b_b8k": _apcfg(hf_hub="laion/CLIP-ViT-B-16-CommonPool.L.laion-s1B-b8K/"),
        "commonpool_l_image_s1b_b8k": _apcfg(hf_hub="laion/CLIP-ViT-B-16-CommonPool.L.image-s1B-b8K/"),
        "commonpool_l_text_s1b_b8k": _apcfg(hf_hub="laion/CLIP-ViT-B-16-CommonPool.L.text-s1B-b8K/"),
        "commonpool_l_basic_s1b_b8k": _apcfg(hf_hub="laion/CLIP-ViT-B-16-CommonPool.L.basic-s1B-b8K/"),
        "commonpool_l_s1b_b8k": _apcfg(hf_hub="laion/CLIP-ViT-B-16-CommonPool.L-s1B-b8K/"),
        "dfn2b": _apcfg(hf_hub="apple/DFN2B-CLIP-ViT-B-16/", quick_gelu=True),
        "metaclip_400m": _apcfg(
            url="https://dl.fbaipublicfiles.com/MMPT/metaclip/b16_400m.pt", quick_gelu=True,
        ),
    },
    "ViT-L-14": {
        "openai": _apcfg(
            url=f"{_OPENAI_BASE}/b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836/ViT-L-14.pt",
            quick_gelu=True,
        ),
        "laion400m_e31": _apcfg(
            url=f"{_GH}/vit_l_14-laion400m_e31-69988bb6.pt",
            hf_hub="timm/vit_large_patch14_clip_224.laion400m_e31/",
        ),
        "laion400m_e32": _apcfg(
            url=f"{_GH}/vit_l_14-laion400m_e32-3d133497.pt",
            hf_hub="timm/vit_large_patch14_clip_224.laion400m_e32/",
        ),
        "laion2b_s32b_b82k": _pcfg(
            hf_hub="laion/CLIP-ViT-L-14-laion2B-s32B-b82K/",
            mean=IMAGENET_MEAN, std=IMAGENET_STD,
        ),
        "datacomp_xl_s13b_b90k": _apcfg(hf_hub="laion/CLIP-ViT-L-14-DataComp.XL-s13B-b90K/"),
        "commonpool_xl_clip_s13b_b90k": _apcfg(hf_hub="laion/CLIP-ViT-L-14-CommonPool.XL.clip-s13B-b90K/"),
        "commonpool_xl_laion_s13b_b90k": _apcfg(hf_hub="laion/CLIP-ViT-L-14-CommonPool.XL.laion-s13B-b90K/"),
        "commonpool_xl_s13b_b90k": _apcfg(hf_hub="laion/CLIP-ViT-L-14-CommonPool.XL-s13B-b90K/"),
        "metaclip_400m": _apcfg(
            url="https://dl.fbaipublicfiles.com/MMPT/metaclip/l14_400m.pt", quick_gelu=True,
        ),
        "metaclip_fullcc": _apcfg(
            url="https://dl.fbaipublicfiles.com/MMPT/metaclip/l14_fullcc2.5b.pt", quick_gelu=True,
        ),
        "dfn2b": _apcfg(hf_hub="apple/DFN2B-CLIP-ViT-L-14/", quick_gelu=True),
    },
    "ViT-L-14-336": {
        "openai": _apcfg(
            url=f"{_OPENAI_BASE}/3035c92b350959924f9f00213499208652fc7ea050643e8b385c2dac08641f02/ViT-L-14-336px.pt",
            quick_gelu=True,
        ),
    },
    "ViT-H-14": {
        "laion2b_s32b_b79k": _apcfg(hf_hub="laion/CLIP-ViT-H-14-laion2B-s32B-b79K/"),
        "metaclip_fullcc": _apcfg(
            url="https://dl.fbaipublicfiles.com/MMPT/metaclip/h14_fullcc2.5b.pt", quick_gelu=True,
        ),
        "metaclip_altogether": _apcfg(
            url="https://dl.fbaipublicfiles.com/MMPT/metaclip/h14_v1.2_altogether.pt",
        ),
        "dfn5b": _apcfg(hf_hub="apple/DFN5B-CLIP-ViT-H-14/", quick_gelu=True),
    },
    "ViT-H-14-378": {
        "dfn5b": _apcfg(
            hf_hub="apple/DFN5B-CLIP-ViT-H-14-378/",
            quick_gelu=True,
            interpolation="bicubic",
            resize_mode="squash",
        ),
    },
    "convnext_base": {
        "laion400m_s13b_b51k": _apcfg(
            hf_hub="laion/CLIP-convnext_base-laion400M-s13B-b51K/"
        ),
    },
    "convnext_base_w": {
        # native NHWC ConvNeXt tower; visual.trunk.* remap
        "laion2b_s13b_b82k": _apcfg(
            hf_hub="laion/CLIP-convnext_base_w-laion2B-s13B-b82K/"
        ),
        "laion2b_s13b_b82k_augreg": _apcfg(
            hf_hub="laion/CLIP-convnext_base_w-laion2B-s13B-b82K-augreg/"
        ),
    },
    "convnext_base_w_320": {
        "laion_aesthetic_s13b_b82k": _apcfg(
            hf_hub="laion/CLIP-convnext_base_w_320-laion_aesthetic-s13B-b82K/"
        ),
        "laion_aesthetic_s13b_b82k_augreg": _apcfg(
            hf_hub="laion/CLIP-convnext_base_w_320-laion_aesthetic-s13B-b82K-augreg/"
        ),
    },
    "convnext_xxlarge": {
        "laion2b_s34b_b82k_augreg": _apcfg(
            hf_hub="laion/CLIP-convnext_xxlarge-laion2B-s34B-b82K-augreg/"
        ),
        "laion2b_s34b_b82k_augreg_rewind": _apcfg(
            hf_hub="laion/CLIP-convnext_xxlarge-laion2B-s34B-b82K-augreg-rewind/"
        ),
        "laion2b_s34b_b82k_augreg_soup": _apcfg(
            hf_hub="laion/CLIP-convnext_xxlarge-laion2B-s34B-b82K-augreg-soup/"
        ),
    },
    "ViT-B-16-biomed": {
        # timm-trunk vision + PubMedBERT text: loads via the
        # visual.trunk.* remap + HF text conversion (convert.py)
        "biomedclip": _apcfg(
            hf_hub="microsoft/BiomedCLIP-PubMedBERT_256-vit_base_patch16_224/"
        ),
    },
    "roberta-ViT-B-32": {
        "laion2b_s12b_b32k": _apcfg(
            hf_hub="laion/CLIP-ViT-B-32-roberta-base-laion2B-s12B-b32k/"
        ),
    },
    "xlm-roberta-base-ViT-B-32": {
        "laion5b_s13b_b90k": _apcfg(
            hf_hub="laion/CLIP-ViT-B-32-xlm-roberta-base-laion5B-s13B-b90k/"
        ),
    },
    "xlm-roberta-large-ViT-H-14": {
        "frozen_laion5b_s13b_b90k": _apcfg(
            hf_hub="laion/CLIP-ViT-H-14-frozen-xlm-roberta-large-laion5B-s13B-b90k/"
        ),
    },
    "ViT-g-14": {
        "laion2b_s12b_b42k": _apcfg(hf_hub="laion/CLIP-ViT-g-14-laion2B-s12B-b42K/"),
        "laion2b_s34b_b88k": _apcfg(hf_hub="laion/CLIP-ViT-g-14-laion2B-s34B-b88K/"),
    },
    "ViT-bigG-14": {
        "laion2b_s39b_b160k": _apcfg(hf_hub="laion/CLIP-ViT-bigG-14-laion2B-39B-b160k/"),
        "metaclip_fullcc": _apcfg(
            url="https://dl.fbaipublicfiles.com/MMPT/metaclip/G14_fullcc2.5b.pt",
            quick_gelu=True,
        ),
    },
    # webli SigLIP tags (reference pretrained.py SigLIP entries). The
    # released checkpoints are timm-trunk layouts (`visual.trunk.*` no-CLS
    # ViT + MAP attention pool + open_clip text tower with proj bias);
    # `convert.timm_vit_to_vision_params` maps them onto the native tower
    # (tested offline against a synthetic released-layout checkpoint in
    # tests/test_siglip_import.py). SigLIP preprocessing: mean/std 0.5,
    # squash resize (reference _slpcfg).
    "ViT-B-16-SigLIP": {"webli": _slpcfg(hf_hub="timm/ViT-B-16-SigLIP/")},
    "ViT-B-16-SigLIP-256": {"webli": _slpcfg(hf_hub="timm/ViT-B-16-SigLIP-256/")},
    "ViT-B-16-SigLIP-i18n-256": {
        "webli": _slpcfg(hf_hub="timm/ViT-B-16-SigLIP-i18n-256/")
    },
    "ViT-B-16-SigLIP-384": {"webli": _slpcfg(hf_hub="timm/ViT-B-16-SigLIP-384/")},
    "ViT-B-16-SigLIP-512": {"webli": _slpcfg(hf_hub="timm/ViT-B-16-SigLIP-512/")},
    "ViT-L-16-SigLIP-256": {"webli": _slpcfg(hf_hub="timm/ViT-L-16-SigLIP-256/")},
    "ViT-L-16-SigLIP-384": {"webli": _slpcfg(hf_hub="timm/ViT-L-16-SigLIP-384/")},
    "ViT-SO400M-14-SigLIP": {"webli": _slpcfg(hf_hub="timm/ViT-SO400M-14-SigLIP/")},
    "ViT-SO400M-14-SigLIP-384": {
        "webli": _slpcfg(hf_hub="timm/ViT-SO400M-14-SigLIP-384/")
    },
    "ViT-SO400M-16-SigLIP-i18n-256": {
        "webli": _slpcfg(hf_hub="timm/ViT-SO400M-16-SigLIP-i18n-256/")
    },
    # 378 = 27*14: the released "384" weights at the nearest patch-divisible
    # size (the reference does the same, pretrained.py SO400M-378 entry).
    "ViT-SO400M-14-SigLIP-378": {
        "webli": _slpcfg(hf_hub="timm/ViT-SO400M-14-SigLIP-384/")
    },
    # nllb-clip (reference pretrained.py nllb entries): NLLB/M2M100 text
    # tower hosted by the native Flax encoder port (models/m2m100.py). The
    # -siglip variants pair the SigLIP vision trunks (base->B/16-384,
    # large->SO400M/14-384) with the same text towers.
    "nllb-clip-base": {"v1": _pcfg(hf_hub="visheratin/nllb-clip-base-oc/")},
    "nllb-clip-large": {"v1": _pcfg(hf_hub="visheratin/nllb-clip-large-oc/")},
    "nllb-clip-base-siglip": {
        "v1": _slpcfg(hf_hub="visheratin/nllb-clip-base-siglip/"),
        "mrl": _slpcfg(hf_hub="visheratin/nllb-siglip-mrl-base/"),
    },
    "nllb-clip-large-siglip": {
        "v1": _slpcfg(hf_hub="visheratin/nllb-clip-large-siglip/"),
        "mrl": _slpcfg(hf_hub="visheratin/nllb-siglip-mrl-large/"),
    },
    # convnext_large_d: ConvNeXt-Large trunk + timm Mlp head + 16-layer text
    "convnext_large_d": {
        "laion2b_s26b_b102k_augreg": _pcfg(
            hf_hub="laion/CLIP-convnext_large_d.laion2B-s26B-b102K-augreg/"
        ),
    },
    "convnext_large_d_320": {
        "laion2b_s29b_b131k_ft": _pcfg(
            hf_hub="laion/CLIP-convnext_large_d_320.laion2B-s29B-b131K-ft/"
        ),
        "laion2b_s29b_b131k_ft_soup": _pcfg(
            hf_hub="laion/CLIP-convnext_large_d_320.laion2B-s29B-b131K-ft-soup/"
        ),
    },
    # CLIPA-v2 (reference pretrained.py:509-527): plain native towers with
    # JAX-era defaults (tanh GELU, LN eps 1e-6), BERT wordpiece text.
    "ViT-L-14-CLIPA": {
        "datacomp1b": _clipacfg(hf_hub="UCSC-VLAA/ViT-L-14-CLIPA-datacomp1B/"),
    },
    "ViT-L-14-CLIPA-336": {
        "datacomp1b": _clipacfg(hf_hub="UCSC-VLAA/ViT-L-14-CLIPA-336-datacomp1B/"),
    },
    "ViT-H-14-CLIPA": {
        "datacomp1b": _clipacfg(hf_hub="UCSC-VLAA/ViT-H-14-CLIPA-datacomp1B/"),
    },
    "ViT-H-14-CLIPA-336": {
        "laion2b": _clipacfg(hf_hub="UCSC-VLAA/ViT-H-14-CLIPA-336-laion2B/"),
        "datacomp1b": _clipacfg(hf_hub="UCSC-VLAA/ViT-H-14-CLIPA-336-datacomp1B/"),
    },
    "ViT-bigG-14-CLIPA": {
        "datacomp1b": _clipacfg(hf_hub="UCSC-VLAA/ViT-bigG-14-CLIPA-datacomp1B/"),
    },
    "ViT-bigG-14-CLIPA-336": {
        "datacomp1b": _clipacfg(hf_hub="UCSC-VLAA/ViT-bigG-14-CLIPA-336-datacomp1B/"),
    },
    # EVA01 giant (reference pretrained.py:446-453): timm eva_giant trunk —
    # a plain pre-LN ViT (the q/v-bias quirk handled in convert).
    "EVA01-g-14": {
        "laion400m_s11b_b41k": _pcfg(
            hf_hub="timm/eva_giant_patch14_clip_224.laion400m_s11b_b41k/"
        ),
    },
    "EVA01-g-14-plus": {
        "merged2b_s11b_b114k": _pcfg(
            hf_hub="timm/eva_giant_patch14_plus_clip_224.merged2b_s11b_b114k/"
        ),
    },
    # EVA02 (reference pretrained.py:454-474): timm eva02 clip trunks —
    # rope + SwiGLU sub-LN ViTs (B/L) and the post-norm enormous (E),
    # natively rebuilt (models/clip.py eva02 branch + convert.py remap).
    "EVA02-B-16": {
        "merged2b_s8b_b131k": _pcfg(
            hf_hub="timm/eva02_base_patch16_clip_224.merged2b_s8b_b131k/"
        ),
    },
    "EVA02-L-14": {
        "merged2b_s4b_b131k": _pcfg(
            hf_hub="timm/eva02_large_patch14_clip_224.merged2b_s4b_b131k/"
        ),
    },
    "EVA02-L-14-336": {
        "merged2b_s6b_b61k": _pcfg(
            hf_hub="timm/eva02_large_patch14_clip_336.merged2b_s6b_b61k/"
        ),
    },
    "EVA02-E-14": {
        "laion2b_s4b_b115k": _pcfg(
            hf_hub="timm/eva02_enormous_patch14_clip_224.laion2b_s4b_b115k/"
        ),
    },
    "EVA02-E-14-plus": {
        "laion2b_s9b_b144k": _pcfg(
            hf_hub="timm/eva02_enormous_patch14_plus_clip_224.laion2b_s9b_b144k/"
        ),
    },
    "coca_ViT-B-32": {
        "laion2b_s13b_b90k": _apcfg(hf_hub="laion/CoCa-ViT-B-32-laion2B-s13B-b90k/"),
        "mscoco_finetuned_laion2b_s13b_b90k": _apcfg(
            hf_hub="laion/mscoco_finetuned_CoCa-ViT-B-32-laion2B-s13B-b90k/"
        ),
    },
    "coca_ViT-L-14": {
        "laion2b_s13b_b90k": _apcfg(hf_hub="laion/CoCa-ViT-L-14-laion2B-s13B-b90k/"),
        "mscoco_finetuned_laion2b_s13b_b90k": _apcfg(
            hf_hub="laion/mscoco_finetuned_CoCa-ViT-L-14-laion2B-s13B-b90k/"
        ),
    },
    # MobileCLIP (reference pretrained.py:545-552, _mccfg :79-90): configs +
    # native deploy-form towers exist (models/fastvit.py); loading a released
    # checkpoint still raises in convert.py until a branch-fusion oracle is
    # available (the error names the porting path). Preprocessing matches the
    # reference _mccfg: identity mean/std, bilinear, shortest-side resize.
    "MobileCLIP-S1": {
        "datacompdr": _mccfg(hf_hub="apple/MobileCLIP-S1-OpenCLIP/"),
    },
    "MobileCLIP-S2": {
        "datacompdr": _mccfg(hf_hub="apple/MobileCLIP-S2-OpenCLIP/"),
    },
    "MobileCLIP-B": {
        "datacompdr": _mccfg(hf_hub="apple/MobileCLIP-B-OpenCLIP/"),
        "datacompdr_lt": _mccfg(hf_hub="apple/MobileCLIP-B-LT-OpenCLIP/"),
    },
    # ViTamin (reference pretrained.py:554-599): configs + native hybrid
    # towers exist (models/vitamin.py); checkpoint conversion gated in
    # convert.py pending an oracle for the timm trunk layout.
    **{
        name: {"datacomp1b": _pcfg(hf_hub=f"jienengchen/{repo}/pytorch_model.bin")}
        for name, repo in [
            ("ViTamin-S", "ViTamin-S"),
            ("ViTamin-S-LTT", "ViTamin-S-LTT"),
            ("ViTamin-B", "ViTamin-B"),
            ("ViTamin-B-LTT", "ViTamin-B-LTT"),
            ("ViTamin-L", "ViTamin-L-224px"),
            ("ViTamin-L-256", "ViTamin-L-256px"),
            ("ViTamin-L-336", "ViTamin-L-336px"),
            ("ViTamin-L-384", "ViTamin-L-384px"),
            ("ViTamin-L2", "ViTamin-L2-224px"),
            ("ViTamin-L2-256", "ViTamin-L2-256px"),
            ("ViTamin-L2-336", "ViTamin-L2-336px"),
            ("ViTamin-L2-384", "ViTamin-L2-384px"),
            ("ViTamin-XL-256", "ViTamin-XL-256px"),
            ("ViTamin-XL-336", "ViTamin-XL-336px"),
            ("ViTamin-XL-384", "ViTamin-XL-384px"),
        ]
    },
}


def list_pretrained(as_str: bool = False):
    """All (model, tag) pairs (reference pretrained.py:611-620)."""
    return [
        f"{m}:{t}" if as_str else (m, t)
        for m in _PRETRAINED
        for t in _PRETRAINED[m]
    ]


def list_pretrained_models_by_tag(tag: str):
    return [m for m in _PRETRAINED if tag.lower() in _PRETRAINED[m]]


def list_pretrained_tags_by_model(model: str):
    return list(_PRETRAINED.get(model, {}).keys())


def is_pretrained_cfg(model: str, tag: str) -> bool:
    return tag.lower() in _PRETRAINED.get(model, {})


def get_pretrained_cfg(model: str, tag: str) -> dict:
    model_cfgs = _PRETRAINED.get(model.replace("/", "-"), {})
    return dict(model_cfgs.get(tag.lower(), {}))


def get_pretrained_url(model: str, tag: str) -> str:
    return get_pretrained_cfg(model, tag).get("url", "")


def _cache_dir(cache_dir: Optional[str]) -> str:
    return cache_dir or os.path.expanduser("~/.cache/mrclip_tpu")


def download_pretrained_from_url(url: str, cache_dir: Optional[str] = None, sha256: str = "") -> str:
    """Fetch + sha256-verify (reference :659-703). The expected hash is the
    leading hex of the checkpoint's digest, matching OpenAI's URL scheme."""
    cache_dir = _cache_dir(cache_dir)
    os.makedirs(cache_dir, exist_ok=True)
    filename = os.path.basename(url)
    if not sha256 and "openaipublic" in url:
        sha256 = url.split("/")[-2]
    target = os.path.join(cache_dir, filename)

    def ok(path) -> bool:
        if not sha256:
            return True
        digest = hashlib.sha256(open(path, "rb").read()).hexdigest()
        return digest.startswith(sha256)

    if os.path.exists(target):
        if ok(target):
            return target
        warnings.warn(f"{target} exists but the checksum does not match; re-downloading.")

    # Download to a temp name and rename on success: an interrupted transfer
    # must not leave a truncated file at `target`, which hash-less entries
    # (no sha256 in the registry) would accept forever after.
    tmp = target + ".part"
    try:
        urllib.request.urlretrieve(url, tmp)
        if not ok(tmp):
            raise RuntimeError(
                "Model has been downloaded but the SHA256 checksum does not match"
            )
        os.replace(tmp, target)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return target


def download_pretrained_from_hf(
    model_id: str,
    filename: Optional[str] = None,
    cache_dir: Optional[str] = None,
) -> str:
    """HF-hub download preferring safetensors (reference :726-760)."""
    try:
        from huggingface_hub import hf_hub_download
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("huggingface_hub is required for hf-hub checkpoints") from e
    if filename is None:
        last_err = None
        for candidate in (HF_SAFE_WEIGHTS_NAME, HF_WEIGHTS_NAME):
            try:
                return hf_hub_download(model_id, candidate, cache_dir=cache_dir)
            except Exception as e:  # missing entry -> try next; keep cause
                last_err = e
        # Chain the real failure: auth/rate-limit/network errors must not
        # masquerade as "no known weight file".
        raise FileNotFoundError(
            f"no known weight file in hf hub repo {model_id} "
            f"(last error: {type(last_err).__name__}: {last_err})"
        ) from last_err
    return hf_hub_download(model_id, filename, cache_dir=cache_dir)


def download_pretrained(
    cfg: dict, cache_dir: Optional[str] = None, prefer_hf_hub: bool = True
) -> str:
    """Dispatch url vs hf_hub (reference :763-792). Returns a local path.

    `hf_hub` entries of the form 'org/repo/' fetch the repo's default weight
    file (safetensors preferred); 'org/repo/file.bin' fetches that file.
    """
    url = cfg.get("url")
    hf_hub = cfg.get("hf_hub")
    if url and hf_hub and prefer_hf_hub:
        url = None  # the hub mirror is the maintained source (reference :779)
    if url:
        return download_pretrained_from_url(url, cache_dir, cfg.get("sha256", ""))
    if hf_hub:
        if hf_hub.endswith("/"):
            return download_pretrained_from_hf(hf_hub.rstrip("/"), cache_dir=cache_dir)
        repo, _, fname = hf_hub.rpartition("/")
        return download_pretrained_from_hf(repo, fname, cache_dir=cache_dir)
    raise ValueError("pretrained cfg has neither url nor hf_hub")
