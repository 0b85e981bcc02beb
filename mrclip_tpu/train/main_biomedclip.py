"""BiomedCLIP fine-tuning entry point.

Capability parity with reference `src/open_clip_train/main_biomedclip.py`
(570 LoC): a `main` clone hard-wired to the BiomedCLIP
PubMedBERT+ViT-B/16 hub model (:229-247) with text-dropout injection
(:70-75). Here it is a thin wrapper over the shared `main` that pins the
model/tokenizer config — the HF text tower loads through
`models.hf_text.HFTextEncoder` (requires an architecture with a Flax port).

Run: `python -m mrclip_tpu.train.main_biomedclip <flags>`. The real
BiomedCLIP weights load with `--pretrained biomedclip` (registry tag;
timm-trunk vision + HF text checkpoint conversion, `convert.py`).
"""

from __future__ import annotations

import sys

from .main import main as _main

BIOMEDCLIP_HUB = "hf-hub:microsoft/BiomedCLIP-PubMedBERT_256-vit_base_patch16_224"


def main(args=None):
    args = list(args if args is not None else sys.argv[1:])
    if "--model" not in args:
        args += ["--model", "ViT-B-16-biomed"]
    return _main(args)


if __name__ == "__main__":
    main()
