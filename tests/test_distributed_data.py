"""Distributed data semantics: rank-strided unique samplers, weighted
resampled shards (reference data.py:303-354, :599-677)."""

import io
import tarfile

import numpy as np
import pytest
from PIL import Image

from mrclip_tpu.data import ShardedTarDataset, Unique3DSampler, UniqueLabelSampler


def test_unique_sampler_ranks_partition():
    labels = [i % 8 for i in range(64)]
    streams = []
    for rank in range(4):
        s = UniqueLabelSampler(labels, batch_size=8, rank=rank, world_size=4, seed=5)
        streams.append(list(iter(s)))
    flat = [i for st in streams for i in st]
    assert sorted(flat) == list(range(64))  # disjoint cover
    assert all(len(st) == 16 for st in streams)


def test_unique_sampler_epoch_reshuffles_across_ranks():
    labels = [i % 8 for i in range(64)]
    s = UniqueLabelSampler(labels, batch_size=8, rank=1, world_size=4, seed=5)
    a = list(iter(s))
    s.set_epoch(3)
    b = list(iter(s))
    assert a != b


def _make_shards(tmp_path, names_sizes):
    rng = np.random.RandomState(0)
    for name, n in names_sizes:
        with tarfile.open(tmp_path / name, "w") as tf:
            for i in range(n):
                key = f"{name}_{i}"
                buf = io.BytesIO()
                Image.fromarray(rng.randint(0, 255, (16, 16, 3), np.uint8)).save(
                    buf, format="PNG"
                )
                for ext, data in (("png", buf.getvalue()), ("txt", name.encode())):
                    info = tarfile.TarInfo(f"{key}.{ext}")
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))


def test_resampled_weighted_shards(tmp_path):
    _make_shards(tmp_path, [("a.tar", 4), ("b.tar", 4)])
    ds = ShardedTarDataset(
        f"{tmp_path}/a.tar::{tmp_path}/b.tar",
        weights="9::1",
        resampled=True,
        num_shards_per_epoch=40,
        seed=3,
        shuffle=False,
    )
    captions = [s["caption"] for s in ds]
    frac_a = sum(c == "a.tar" for c in captions) / len(captions)
    assert frac_a > 0.7  # 9:1 upsampling dominates


def test_node_splitting(tmp_path):
    _make_shards(tmp_path, [(f"s{i}.tar", 2) for i in range(4)])
    seen = []
    for rank in range(2):
        ds = ShardedTarDataset(
            f"{tmp_path}/s{{0..3}}.tar".replace("{0..3}", "{0..3}"),
            rank=rank,
            world_size=2,
            shuffle=False,
        )
        # brace expansion with single digits
        ds.urls = [str(tmp_path / f"s{i}.tar") for i in range(4)]
        seen.append({s["caption"] for s in ds})
    assert seen[0].isdisjoint(seen[1])
    assert len(seen[0] | seen[1]) == 4
