"""ImageFolder-style dataset for zero-shot evaluation.

Capability parity with the reference's `get_imagenet` path
(`src/open_clip_train/data.py:147-190`): a directory of class subfolders
(torchvision ImageFolder layout), with the reference's 50-images-per-class
subsampling option for the fast v2-style eval.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np
from PIL import Image

__all__ = ["ImageFolderDataset"]

_IMG_EXTS = (".png", ".jpg", ".jpeg", ".webp", ".bmp")


class ImageFolderDataset:
    def __init__(
        self,
        root: str,
        transform: Optional[Callable] = None,
        max_per_class: Optional[int] = None,
        seed: int = 0,
    ):
        self.root = root
        self.transform = transform
        classes = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples = []
        rng = np.random.RandomState(seed)
        for cls in classes:
            files = sorted(
                f
                for f in os.listdir(os.path.join(root, cls))
                if f.lower().endswith(_IMG_EXTS)
            )
            if max_per_class is not None and len(files) > max_per_class:
                # reference data.py:155-166: random 50-per-class subsample
                keep = rng.permutation(len(files))[:max_per_class]
                files = [files[i] for i in sorted(keep)]
            self.samples.extend(
                (os.path.join(root, cls, f), self.class_to_idx[cls]) for f in files
            )

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx: int) -> dict:
        path, label = self.samples[idx]
        img = Image.open(path)
        if self.transform is not None:
            img = self.transform(img)
        return {"images": img, "labels": np.int32(label)}
