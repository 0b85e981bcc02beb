"""Data pipelines: CSV/synthetic/tar-shard datasets + loader assembly.

`get_data` mirrors reference `src/open_clip_train/data.py:556-598`: builds a
dict of train/val DataInfos with dataset-type dispatch (webdataset / csv /
csv-unique-sampler / synthetic / auto-by-extension).
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

from .image_folder import ImageFolderDataset
from .csv_dataset import (
    CsvDataset,
    CsvTabularDataset,
    DistributedSampler,
    Unique3DSampler,
    UniqueLabelSampler,
    extract_3d_image_id,
    extract_times,
)
from .loader import DataLoader, default_collate
from .shards import ShardedTarDataset, expand_urls, get_dataset_size
from .synthetic import SyntheticDataset

__all__ = [
    "ImageFolderDataset",
    "CsvDataset",
    "CsvTabularDataset",
    "DistributedSampler",
    "UniqueLabelSampler",
    "Unique3DSampler",
    "SyntheticDataset",
    "ShardedTarDataset",
    "DataLoader",
    "DataInfo",
    "get_data",
    "extract_times",
    "extract_3d_image_id",
    "expand_urls",
    "get_dataset_size",
]


def _loader_batch(args, is_train: bool) -> int:
    """Rows per loader batch. Reference accum semantics (train.py:80-160):
    the effective optimizer batch is accum_freq * batch_size (N consecutive
    loader batches). The TPU train step consumes them as ONE fused batch
    (build_train_step reshapes into accum_freq microbatches), so the TRAIN
    loader chunks at accum_freq * batch_size and one loader batch == one
    optimizer step. Samplers keep rounds of batch_size: each contiguous
    microbatch slice equals one sampler round, preserving per-microbatch
    label uniqueness exactly like the reference (whose uniqueness is per
    loader batch). The vision-only step has no accum support (main.py
    rejects the combination), so it never gets inflated chunks."""
    accum = max(getattr(args, "accum_freq", 1), 1) if is_train else 1
    if getattr(args, "visiononly", False) and getattr(args, "multipositiveloss", False):
        accum = 1  # same gate as train.main's vision_only
    return args.batch_size * accum


@dataclass
class DataInfo:
    """Loader + sampler bundle (reference data.py:88-100)."""

    dataloader: DataLoader
    sampler: Any = None
    shared_epoch: Any = None

    def set_epoch(self, epoch: int):
        self.dataloader.set_epoch(epoch)
        if self.sampler is not None and hasattr(self.sampler, "set_epoch"):
            self.sampler.set_epoch(epoch)


def _infer_dataset_type(data_path: str) -> str:
    """Auto dispatch by extension (reference data.py:561-575)."""
    ext = data_path.split(".")[-1]
    if ext in ("csv", "tsv"):
        return "csv"
    if ext in ("tar",) or "{" in data_path:
        return "webdataset"
    raise ValueError(f"Cannot infer dataset type from {data_path}")


def _build_csv(args, path, transform, tokenizer, is_train: bool, epoch: int = 0):
    sep = getattr(args, "csv_separator", ",")
    dataset_type = getattr(args, "dataset_type", "csv")
    with_times = bool(getattr(args, "distance", False))
    if getattr(args, "tabular", False):
        dataset = CsvTabularDataset(
            path,
            transform,
            img_key=getattr(args, "csv_img_key", "filepath"),
            caption_key=getattr(args, "csv_caption_key", "title"),
            sep=sep,
            tokenizer=tokenizer,
            corruption_rate=getattr(args, "corruption_rate", 0.0),
            one_hot=getattr(args, "one_hot_tabular", False),
        )
    else:
        dataset = CsvDataset(
            path,
            transform,
            img_key=getattr(args, "csv_img_key", "filepath"),
            caption_key=getattr(args, "csv_caption_key", "title"),
            sep=sep,
            tokenizer=tokenizer,
            with_times=with_times,
        )

    rank = getattr(args, "rank", 0)
    world_size = getattr(args, "world_size", 1)
    seed = getattr(args, "seed", 0)
    batch_size = args.batch_size
    loader_batch = _loader_batch(args, is_train)  # accum chunking, see helper

    if is_train and dataset_type == "csv-unique-sampler":
        if getattr(args, "unique3d", False):
            sampler = Unique3DSampler(
                dataset.labels, dataset.volume_ids, batch_size, rank, world_size, seed
            )
        else:
            sampler = UniqueLabelSampler(dataset.labels, batch_size, rank, world_size, seed)
    elif is_train:
        sampler = DistributedSampler(len(dataset), rank, world_size, shuffle=True, seed=seed)
    else:
        sampler = DistributedSampler(len(dataset), 0, 1, shuffle=False)

    if getattr(args, "native_loader", False):
        from .native_loader import NativeBatchLoader

        aug = None
        if is_train and getattr(args, "aug_cfg", None):
            from ..transforms import AugmentationCfg, validate_aug_cfg

            raw = args.aug_cfg
            aug = AugmentationCfg(**raw) if isinstance(raw, dict) else raw
            validate_aug_cfg(aug, backend="native")

        size = getattr(args, "image_size", 224)
        # Honor the model's preprocess cfg (the transform objects carry it):
        # SigLIP/CLIPA families squash-resize and CLIPA evals bilinear;
        # mean/std feed the device-side normalize downstream.
        pp = getattr(transform, "cfg", None)
        eval_interp = getattr(pp, "interpolation", None) or "bicubic"
        if eval_interp not in ("bicubic", "bilinear"):
            eval_interp = "bicubic"  # 'random' is a train-time-only choice
        loader = NativeBatchLoader(
            dataset,
            batch_size=loader_batch,
            sampler=sampler,
            canvas_size=(size, size),
            tokenizer=tokenizer,
            with_times=with_times,
            num_threads=getattr(args, "workers", 0),
            drop_last=is_train,
            augment=is_train,  # train: full native warp; eval: per-cfg mode
            aug_cfg=aug,
            eval_resize_mode=getattr(args, "image_resize_mode", None)
            or getattr(pp, "resize_mode", None)
            or "cover",
            eval_interpolation=eval_interp,
            seed=seed,
        )
        loader.preprocess_cfg = pp
        return DataInfo(loader, sampler)

    loader = DataLoader(
        dataset,
        batch_size=loader_batch,
        sampler=sampler,
        num_workers=getattr(args, "workers", 4),
        drop_last=is_train,
    )
    return DataInfo(loader, sampler)


def _build_synthetic(args, transform, tokenizer, is_train: bool):
    image_size = getattr(args, "image_size", 224)
    if isinstance(image_size, int):
        image_size = (image_size, image_size)
    dataset = SyntheticDataset(
        transform=transform,
        image_size=image_size,
        dataset_size=getattr(args, "train_num_samples", 256),
        tokenizer=tokenizer,
        vocab_size=getattr(args, "_model_vocab_size", None),
    )
    sampler = DistributedSampler(
        len(dataset),
        getattr(args, "rank", 0),
        getattr(args, "world_size", 1),
        shuffle=is_train,
        seed=getattr(args, "seed", 0),
    )
    loader = DataLoader(
        dataset,
        batch_size=_loader_batch(args, is_train),  # accum chunking, see helper
        sampler=sampler,
        num_workers=getattr(args, "workers", 4),
        drop_last=is_train,
    )
    return DataInfo(loader, sampler)


def _build_wds(args, path, transform, tokenizer, is_train: bool):
    dataset = ShardedTarDataset(
        path,
        transform=transform,
        tokenizer=tokenizer,
        rank=getattr(args, "rank", 0),
        world_size=getattr(args, "world_size", 1),
        seed=getattr(args, "seed", 0),
        shuffle=is_train,
        resampled=getattr(args, "dataset_resampled", False),
        weights=getattr(args, "train_data_upsampling_factors", None) if is_train else None,
    )
    num_samples, _ = get_dataset_size(path)
    if num_samples is None:
        num_samples = getattr(args, "train_num_samples" if is_train else "val_num_samples", 0) or 0
    loader_batch = _loader_batch(args, is_train)  # accum chunking, see helper
    loader = DataLoader(
        dataset,
        batch_size=loader_batch,
        sampler=None,
        num_workers=1,  # iterable dataset: single in-order worker
        drop_last=is_train,
        length=num_samples // loader_batch if num_samples else None,
    )
    return DataInfo(loader, dataset)


def get_data(args, preprocess_fns, epoch: int = 0, tokenizer: Optional[Callable] = None) -> dict:
    """Assemble train/val DataInfos (reference data.py:556-598)."""
    preprocess_train, preprocess_val = preprocess_fns
    data = {}

    train_path = getattr(args, "train_data", None)
    val_path = getattr(args, "val_data", None)
    dataset_type = getattr(args, "dataset_type", "auto")

    def dispatch(path, transform, is_train):
        dtype = dataset_type
        if dtype == "auto" and path:
            dtype = _infer_dataset_type(path)
        if dtype == "synthetic":
            return _build_synthetic(args, transform, tokenizer, is_train)
        if dtype == "webdataset":
            return _build_wds(args, path, transform, tokenizer, is_train)
        return _build_csv(args, path, transform, tokenizer, is_train, epoch)

    if train_path or dataset_type == "synthetic":
        data["train"] = dispatch(train_path, preprocess_train, True)
    if val_path:
        data["val"] = dispatch(val_path, preprocess_val, False)

    # zero-shot classification sets (reference data.py:147-190, :589-595)
    imagenet_val = getattr(args, "imagenet_val", None)
    if imagenet_val:
        ds = ImageFolderDataset(imagenet_val, preprocess_val)
        data["imagenet-val"] = DataInfo(
            DataLoader(ds, batch_size=args.batch_size, num_workers=getattr(args, "workers", 4), drop_last=False)
        )
    imagenet_v2 = getattr(args, "imagenet_v2", None)
    if imagenet_v2:
        ds = ImageFolderDataset(imagenet_v2, preprocess_val, max_per_class=50)
        data["imagenet-v2"] = DataInfo(
            DataLoader(ds, batch_size=args.batch_size, num_workers=getattr(args, "workers", 4), drop_last=False)
        )
    return data
