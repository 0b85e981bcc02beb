"""Tar-shard streaming pipeline (webdataset-equivalent, torch-free).

Capability parity with the reference's webdataset path
(`src/open_clip_train/data.py:203-472`):
- `expand_urls` (:103-122): brace expansion + `::` weighted multi-source,
- size accounting from `sizes.json` / `__len__` (:125-144),
- `detshuffle` (:271-300): epoch-deterministic shard shuffle,
- with-replacement weighted shard resampling (`ResampledShards2` :303-354),
- non-throwing tar iteration (`log_and_continue` :209-212, :215-248),
- node/worker shard splitting (`wds.split_by_node/worker`),
- grouped sample decode (image bytes + txt caption per key) -> transform ->
  tokenize -> batch.
"""

from __future__ import annotations

import io
import json
import logging
import os
import random
import tarfile
from typing import Callable, Iterator, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

__all__ = [
    "expand_urls",
    "get_dataset_size",
    "ShardedTarDataset",
]


def _braceexpand(pattern: str) -> List[str]:
    """Minimal {000..123} / {a,b} brace expansion."""
    import re

    m = re.search(r"\{(\d+)\.\.(\d+)\}", pattern)
    if m:
        lo, hi = m.group(1), m.group(2)
        width = len(lo)
        out = []
        for v in range(int(lo), int(hi) + 1):
            out.extend(_braceexpand(pattern[: m.start()] + str(v).zfill(width) + pattern[m.end():]))
        return out
    m = re.search(r"\{([^{}]*,[^{}]*)\}", pattern)
    if m:
        out = []
        for part in m.group(1).split(","):
            out.extend(_braceexpand(pattern[: m.start()] + part + pattern[m.end():]))
        return out
    return [pattern]


def expand_urls(urls, weights: Optional[str] = None):
    """Reference `expand_urls` (data.py:103-122): `::`-joined sources with
    optional `::`-joined weights; brace-expands each source."""
    if isinstance(urls, str):
        urllist = urls.split("::")
        weight_list = weights.split("::") if weights is not None else [1.0] * len(urllist)
        if len(weight_list) != len(urllist):
            raise ValueError(
                f"got {len(weight_list)} weights for {len(urllist)} url sources"
            )
        all_urls, all_weights = [], []
        for url, w in zip(urllist, weight_list):
            expanded = _braceexpand(url)
            all_urls.extend(expanded)
            all_weights.extend([float(w) / len(expanded)] * len(expanded))
        return all_urls, all_weights
    if weights is not None:
        # a bare assert would vanish under python -O and silently drop the
        # weight mapping — the exact failure this guard exists to prevent
        raise ValueError(
            "weights require a '::'-joined string of urls (got a list; the "
            "weight mapping would be silently dropped)"
        )
    return list(urls), None


def get_dataset_size(shards) -> Tuple[Optional[int], int]:
    """Reference `get_dataset_size` (data.py:125-144): look for sizes.json or
    a `__len__` file next to the shards."""
    shards_list, _ = expand_urls(shards)
    dir_path = os.path.dirname(shards_list[0])
    sizes_path = os.path.join(dir_path, "sizes.json")
    len_path = os.path.join(dir_path, "__len__")
    if os.path.exists(sizes_path):
        with open(sizes_path) as f:
            sizes = json.load(f)
        total = sum(int(sizes[os.path.basename(s)]) for s in shards_list)
    elif os.path.exists(len_path):
        with open(len_path) as f:
            total = int(f.read())
    else:
        total = None
    return total, len(shards_list)


def _iter_tar_samples(path: str, handler=logging.warning) -> Iterator[dict]:
    """Group tar members by key (basename sans extension); never throws on a
    bad shard/sample (reference :209-248)."""
    try:
        with tarfile.open(path) as tf:
            current_key, group = None, {}
            for member in tf:
                if not member.isfile():
                    continue
                fname = member.name
                key, ext = os.path.splitext(os.path.basename(fname))
                if current_key is not None and key != current_key and group:
                    yield {"__key__": current_key, **group}
                    group = {}
                current_key = key
                try:
                    group[ext.lstrip(".").lower()] = tf.extractfile(member).read()
                except Exception as e:  # pragma: no cover
                    handler(f"error reading {fname} from {path}: {e}")
            if group:
                yield {"__key__": current_key, **group}
    except Exception as e:
        handler(f"error opening shard {path}: {e}")


_IMG_EXTS = ("png", "jpg", "jpeg", "webp")


class ShardedTarDataset:
    """Iterable over decoded (image, caption[, label]) samples from tar shards.

    Deterministic per-epoch shard order (seed + epoch, reference detshuffle2
    :284-300) or weighted with-replacement resampling (`resampled=True`);
    shards are split across (rank, worker) before iteration.
    """

    def __init__(
        self,
        urls,
        transform: Optional[Callable] = None,
        tokenizer: Optional[Callable] = None,
        caption_ext: Sequence[str] = ("txt",),
        label_ext: str = "cls",
        rank: int = 0,
        world_size: int = 1,
        seed: int = 0,
        shuffle: bool = True,
        resampled: bool = False,
        num_shards_per_epoch: Optional[int] = None,
        sample_shuffle_buffer: int = 1000,
        weights: Optional[str] = None,
        num_workers: int = 1,
    ):
        self.urls, self.weights = expand_urls(urls, weights)
        self.transform = transform
        self.tokenize = tokenizer
        self.caption_ext = caption_ext
        self.label_ext = label_ext
        self.rank = rank
        self.world_size = world_size
        self.seed = seed
        self.shuffle = shuffle
        self.resampled = resampled
        self.num_shards_per_epoch = num_shards_per_epoch or len(self.urls)
        self.sample_shuffle_buffer = sample_shuffle_buffer
        self.num_workers = max(1, num_workers)
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _epoch_shards(self) -> List[str]:
        rng = random.Random(self.seed + self.epoch)
        if self.resampled:
            if self.weights:
                shards = rng.choices(self.urls, weights=self.weights, k=self.num_shards_per_epoch)
            else:
                shards = rng.choices(self.urls, k=self.num_shards_per_epoch)
        else:
            shards = list(self.urls)
            if self.shuffle:
                rng.shuffle(shards)
        return shards[self.rank :: self.world_size]

    def __iter__(self) -> Iterator[dict]:
        rng = random.Random(self.seed * 1000003 + self.epoch)
        buffer: List[dict] = []

        def decode(raw: dict) -> Optional[dict]:
            img_bytes = next((raw[e] for e in _IMG_EXTS if e in raw), None)
            cap_bytes = next((raw[e] for e in self.caption_ext if e in raw), None)
            if img_bytes is None or cap_bytes is None:
                return None
            try:
                img = Image.open(io.BytesIO(img_bytes))
                img.load()
            except Exception as e:
                logging.warning(f"decode error on {raw.get('__key__')}: {e}")
                return None
            if self.transform is not None:
                img = self.transform(img)
            caption = cap_bytes.decode("utf-8")
            item = {"images": img}
            if self.tokenize is not None:
                item["tokens"] = self.tokenize([caption])[0]
            else:
                item["caption"] = caption
            if self.label_ext in raw:
                item["labels"] = np.int32(int(raw[self.label_ext].decode()))
            return item

        shards = self._epoch_shards()
        if self.num_workers > 1 and len(shards) > 1:
            # Parallel shard streams (wds worker-splitting equivalent):
            # each worker thread reads its shard subset; samples interleave
            # through a bounded queue. Per-worker order stays deterministic.
            import queue as _queue
            import threading

            q: _queue.Queue = _queue.Queue(maxsize=4 * self.num_workers)
            n_workers = min(self.num_workers, len(shards))
            done = object()

            errors: list = []

            def work(worker_shards):
                # try/finally: the sentinel must post even on error, or the
                # consumer's blocking q.get() hangs forever; the error itself
                # re-raises in the consumer.
                try:
                    for shard in worker_shards:
                        for raw in _iter_tar_samples(shard):
                            sample = decode(raw)
                            if sample is not None:
                                q.put(sample)
                except Exception as e:  # noqa: BLE001 - surfaced below
                    errors.append(e)
                finally:
                    q.put(done)

            threads = [
                threading.Thread(target=work, args=(shards[w::n_workers],), daemon=True)
                for w in range(n_workers)
            ]
            for t in threads:
                t.start()
            finished = 0
            while finished < n_workers:
                if errors:
                    # Fail fast: a dead worker means the epoch would silently
                    # train on a fraction of the shards until the end.
                    raise errors[0]
                item = q.get()
                if item is done:
                    finished += 1
                    continue
                if self.shuffle and self.sample_shuffle_buffer > 1:
                    buffer.append(item)
                    if len(buffer) >= self.sample_shuffle_buffer:
                        idx = rng.randrange(len(buffer))
                        buffer[idx], item = item, buffer[idx]
                        yield item
                else:
                    yield item
            if errors:
                raise errors[0]
        else:
            for shard in shards:
                for raw in _iter_tar_samples(shard):
                    sample = decode(raw)
                    if sample is None:
                        continue
                    if self.shuffle and self.sample_shuffle_buffer > 1:
                        buffer.append(sample)
                        if len(buffer) >= self.sample_shuffle_buffer:
                            idx = rng.randrange(len(buffer))
                            buffer[idx], sample = sample, buffer[idx]
                            yield sample
                    else:
                        yield sample
        if self.shuffle:
            rng.shuffle(buffer)
        yield from buffer
