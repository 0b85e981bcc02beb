"""Slice filtering + volume-grouped shuffle/split.

Capability parity with reference `preprocessing.py` step 4:
- `filter_slices` (:604-628): keep even slices in [120, 220] (sagittal
  [50, 150]),
- `merge_and_shuffle_split_csv` (:645-701): group rows by 3D `image_id`
  (slices of one volume never straddle splits), deterministic shuffle
  (seed 42), 60/10/30 train/val/test.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Tuple

import numpy as np
import pandas as pd

from .captions import extract_slice_number

__all__ = ["extract_image_id", "filter_slices", "merge_and_shuffle_split"]

_SLICE_SUFFIX_RE = re.compile(r"_slice\d+.*$")


def extract_image_id(path: str) -> str:
    base = os.path.splitext(os.path.basename(str(path)))[0]
    return _SLICE_SUFFIX_RE.sub("", base)


def filter_slices(
    df: pd.DataFrame, col: str = "filepath", min_slice: int = 120, max_slice: int = 220
) -> pd.DataFrame:
    """Even slices within the plane-specific window (reference :604-628)."""

    def keep(row) -> bool:
        n = extract_slice_number(row[col])
        if n is None:
            return False
        if "sagittal" in str(row[col]):
            return 50 <= n <= 150 and n % 2 == 0
        return min_slice <= n <= max_slice and n % 2 == 0

    return df[df.apply(keep, axis=1)]


def merge_and_shuffle_split(
    input_folder_or_frames,
    train_file: str,
    val_file: str,
    test_file: str,
    train_ratio: float = 0.6,
    val_ratio: float = 0.1,
    seed: int = 42,
    apply_slice_filter: bool = True,
) -> Tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Merge labeled CSVs (`labeled_*.csv`) or frames, split by 3D volume."""
    if isinstance(input_folder_or_frames, str):
        files = glob.glob(os.path.join(input_folder_or_frames, "labeled_*.csv"))
        frames = [pd.read_csv(f) for f in files]
    else:
        frames = list(input_folder_or_frames)
    if apply_slice_filter:
        frames = [filter_slices(f) for f in frames]
    merged = pd.concat(frames, ignore_index=True)

    merged["image_id"] = merged["filepath"].apply(extract_image_id)
    keep_cols = [c for c in ("image_id", "filepath", "text", "label") if c in merged.columns]
    merged = merged[keep_cols]

    # volume-grouped shuffle: permute the volume ids deterministically, then
    # emit each volume's slices contiguously (reference :666-687).
    rng = np.random.RandomState(seed)
    unique_ids = merged["image_id"].unique()
    order = rng.permutation(len(unique_ids))
    unique_ids = unique_ids[order]

    train_end = int(len(unique_ids) * train_ratio)
    val_end = train_end + int(len(unique_ids) * val_ratio)
    train_ids = set(unique_ids[:train_end])
    val_ids = set(unique_ids[train_end:val_end])

    def take(ids) -> pd.DataFrame:
        return merged[merged["image_id"].isin(ids)].drop(columns=["image_id"])

    train_df = take(train_ids)
    val_df = take(val_ids)
    test_df = take(set(unique_ids[val_end:]))

    for df, path in ((train_df, train_file), (val_df, val_file), (test_df, test_file)):
        if path:
            df.to_csv(path, index=False)
    return train_df, val_df, test_df
