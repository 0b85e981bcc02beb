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


_OPENAI_BASE = "https://openaipublic.azureedge.net/clip/models"

_PRETRAINED: Dict[str, Dict[str, dict]] = {
    "RN50": {
        "openai": _apcfg(
            url=f"{_OPENAI_BASE}/afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762/RN50.pt",
            quick_gelu=True,
        ),
        "yfcc15m": _apcfg(hf_hub="timm/resnet50_clip.yfcc15m/"),
        "cc12m": _apcfg(hf_hub="timm/resnet50_clip.cc12m/"),
    },
    "ViT-B-32": {
        "openai": _apcfg(
            url=f"{_OPENAI_BASE}/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt",
            quick_gelu=True,
        ),
        "laion400m_e32": _apcfg(hf_hub="timm/vit_base_patch32_clip_224.laion400m_e32/"),
        "laion2b_s34b_b79k": _apcfg(hf_hub="laion/CLIP-ViT-B-32-laion2B-s34B-b79K/"),
    },
    "ViT-B-16": {
        "openai": _apcfg(
            url=f"{_OPENAI_BASE}/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt",
            quick_gelu=True,
        ),
        "laion400m_e32": _apcfg(hf_hub="timm/vit_base_patch16_clip_224.laion400m_e32/"),
        "laion2b_s34b_b88k": _apcfg(hf_hub="laion/CLIP-ViT-B-16-laion2B-s34B-b88K/"),
    },
    "ViT-L-14": {
        "openai": _apcfg(
            url=f"{_OPENAI_BASE}/b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836/ViT-L-14.pt",
            quick_gelu=True,
        ),
        "laion2b_s32b_b82k": _pcfg(
            hf_hub="laion/CLIP-ViT-L-14-laion2B-s32B-b82K/",
            mean=IMAGENET_MEAN, std=IMAGENET_STD,
        ),
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

    urllib.request.urlretrieve(url, target)
    if not ok(target):
        raise RuntimeError("Model has been downloaded but the SHA256 checksum does not match")
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
        for candidate in (HF_SAFE_WEIGHTS_NAME, HF_WEIGHTS_NAME):
            try:
                return hf_hub_download(model_id, candidate, cache_dir=cache_dir)
            except Exception:
                continue
        raise FileNotFoundError(f"no known weight file in hf hub repo {model_id}")
    return hf_hub_download(model_id, filename, cache_dir=cache_dir)


def download_pretrained(cfg: dict, cache_dir: Optional[str] = None) -> str:
    """Dispatch url vs hf_hub (reference :763+). Returns a local path."""
    url = cfg.get("url")
    hf_hub = cfg.get("hf_hub")
    if url:
        return download_pretrained_from_url(url, cache_dir, cfg.get("sha256", ""))
    if hf_hub:
        model_id, _, fname = hf_hub.rstrip("/").partition("/") if "/" not in hf_hub else (hf_hub.rstrip("/"), "", "")
        if hf_hub.endswith("/"):
            return download_pretrained_from_hf(hf_hub.rstrip("/"), cache_dir=cache_dir)
        repo, _, fname = hf_hub.rpartition("/")
        return download_pretrained_from_hf(repo, fname, cache_dir=cache_dir)
    raise ValueError("pretrained cfg has neither url nor hf_hub")
