"""Data pipeline tests: CSV dataset, samplers, loader, tar shards, synthetic.

Sampler semantics follow reference `src/open_clip_train/data.py`:
UniqueLabelSampler (:599-677) batches contain at most one sample per label;
epoch-seeded determinism; rank-strided distribution.
"""

import io
import os
import tarfile

import numpy as np
import pytest
from PIL import Image

from mrclip_tpu.data import (
    CsvDataset,
    DataLoader,
    DistributedSampler,
    ShardedTarDataset,
    SyntheticDataset,
    Unique3DSampler,
    UniqueLabelSampler,
    expand_urls,
    extract_3d_image_id,
    extract_times,
    get_data,
)
from mrclip_tpu.tokenizer import SimpleTokenizer
from mrclip_tpu.transforms import EvalTransform, PreprocessCfg

CAPTION = (
    "A brain MRI, plane axial, Scanner (Manufacturer, Model, Field Strength): "
    "(SIEMENS, Prisma, 3.0T), Acquisition (Description, Sequence, Variant): "
    "(t2_tse_tra, SE, SK), Imaging Parameters (Echo Time, Repetition Time, "
    "Inversion Time, Flip Angle): (0.093, 9.0, nan, 150)"
)


def test_extract_times():
    te, tr = extract_times(CAPTION)
    assert te == pytest.approx(0.093)
    assert tr == pytest.approx(9.0)
    assert extract_times("no parens caption") == (0.0, 0.0)


def test_extract_3d_image_id():
    assert extract_3d_image_id("/x/sub-01_axial_slice120.png") == "sub-01_axial"
    assert extract_3d_image_id("vol_slice003.png") == "vol"


@pytest.fixture(scope="module")
def csv_dir(tmp_path_factory):
    import csv

    d = tmp_path_factory.mktemp("csvdata")
    rng = np.random.RandomState(0)
    with open(d / "data.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["filepath", "title", "label"])
        for vol in range(4):
            for sl in (120, 122):
                name = f"vol{vol}_axial_slice{sl}.png"
                arr = rng.randint(0, 255, (48, 48), dtype=np.uint8)
                Image.fromarray(arr, "L").save(d / name)
                w.writerow([str(d / name), CAPTION, vol % 3])
    return d


def test_csv_dataset(csv_dir):
    tok = SimpleTokenizer()
    t = EvalTransform(PreprocessCfg(size=32))
    ds = CsvDataset(str(csv_dir / "data.csv"), transforms=t, tokenizer=tok, with_times=True)
    assert len(ds) == 8
    item = ds[0]
    assert item["images"].shape == (32, 32, 3)
    assert item["images"].dtype == np.float32
    assert item["tokens"].shape == (98,)
    assert item["echo_time"] == pytest.approx(0.093)
    assert item["labels"] in (0, 1, 2)


def test_unique_label_sampler():
    labels = [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]
    s = UniqueLabelSampler(labels, batch_size=3, seed=1)
    order = list(iter(s))
    assert sorted(order) == list(range(10))
    # every consecutive batch (pre-splitting) has distinct labels
    for i in range(0, len(order) - 2, 3):
        batch_labels = [labels[j] for j in order[i : i + 3]]
        assert len(set(batch_labels)) == len(batch_labels)
    # epoch determinism + reshuffle
    assert list(iter(s)) == order
    s.set_epoch(1)
    assert list(iter(s)) != order


def test_unique3d_sampler():
    labels = [0] * 8
    vols = ["a", "a", "b", "b", "c", "c", "d", "d"]
    s = Unique3DSampler(labels, vols, batch_size=4, seed=0)
    order = list(iter(s))
    for i in range(0, len(order) - 3, 4):
        batch_vols = [vols[j] for j in order[i : i + 4]]
        assert len(set(batch_vols)) == len(batch_vols)


def test_distributed_sampler_partitions():
    parts = []
    for rank in range(4):
        s = DistributedSampler(103, rank=rank, world_size=4, seed=3)
        parts.append(list(iter(s)))
    lens = {len(p) for p in parts}
    assert lens == {25}
    flat = [i for p in parts for i in p]
    assert len(set(flat)) == 100  # disjoint cover (3 dropped)


def test_loader_batches(csv_dir):
    tok = SimpleTokenizer()
    t = EvalTransform(PreprocessCfg(size=32))
    ds = CsvDataset(str(csv_dir / "data.csv"), transforms=t, tokenizer=tok)
    loader = DataLoader(ds, batch_size=4, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2 == len(loader)
    assert batches[0]["images"].shape == (4, 32, 32, 3)
    assert batches[0]["tokens"].shape == (4, 98)
    assert batches[0]["labels"].shape == (4,)


def test_synthetic_end_to_end():
    tok = SimpleTokenizer()
    t = EvalTransform(PreprocessCfg(size=32))
    ds = SyntheticDataset(transform=t, image_size=(48, 48), dataset_size=10, tokenizer=tok)
    loader = DataLoader(ds, batch_size=5, num_workers=1)
    b = next(iter(loader))
    assert b["images"].shape == (5, 32, 32, 3)


def test_expand_urls():
    urls, w = expand_urls("/data/shard-{0000..0003}.tar")
    assert len(urls) == 4 and urls[0].endswith("shard-0000.tar")
    urls, w = expand_urls("/a-{00..01}.tar::/b-{00..02}.tar", weights="1::2")
    assert len(urls) == 5
    np.testing.assert_allclose(w[:2], [0.5, 0.5])
    np.testing.assert_allclose(w[2:], [2 / 3] * 3)


@pytest.fixture(scope="module")
def tar_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("shards")
    rng = np.random.RandomState(0)
    n = 0
    for shard in range(2):
        with tarfile.open(d / f"shard-{shard:04d}.tar", "w") as tf:
            for i in range(6):
                key = f"s{shard}_{i}"
                buf = io.BytesIO()
                Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)).save(
                    buf, format="PNG"
                )
                for ext, data in (("png", buf.getvalue()), ("txt", CAPTION.encode())):
                    info = tarfile.TarInfo(f"{key}.{ext}")
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))
                n += 1
    import json

    (d / "sizes.json").write_text(
        json.dumps({f"shard-{s:04d}.tar": 6 for s in range(2)})
    )
    return d


def test_sharded_tar_dataset(tar_dir):
    tok = SimpleTokenizer()
    t = EvalTransform(PreprocessCfg(size=32))
    ds = ShardedTarDataset(
        str(tar_dir / "shard-{0000..0001}.tar"), transform=t, tokenizer=tok, seed=5
    )
    samples = list(ds)
    assert len(samples) == 12
    assert samples[0]["images"].shape == (32, 32, 3)
    # deterministic per epoch
    keys_a = [s["tokens"].sum() for s in ds]
    keys_b = [s["tokens"].sum() for s in ds]
    assert keys_a == keys_b

    loader = DataLoader(ds, batch_size=4, num_workers=1, length=3)
    batches = list(loader)
    assert len(batches) == 3 == len(loader)


def test_get_data_synthetic():
    class Args:
        dataset_type = "synthetic"
        train_data = None
        val_data = None
        batch_size = 4
        train_num_samples = 16
        workers = 1
        image_size = 32

    tok = SimpleTokenizer(context_length=16)
    t = EvalTransform(PreprocessCfg(size=32))
    data = get_data(Args(), (t, t), tokenizer=tok)
    assert "train" in data
    b = next(iter(data["train"].dataloader))
    assert b["images"].shape == (4, 32, 32, 3)
    assert b["tokens"].shape == (4, 16)


def test_synthetic_vocab_clamp():
    """Mini-vocab configs: synthetic caption ids fold into [0, vocab) so the
    embedding gather never goes out of range (XLA OOB gathers fill NaN);
    pad id 0 stays 0."""
    tok = SimpleTokenizer()
    ds = SyntheticDataset(
        transform=None, image_size=(32, 32), dataset_size=4,
        tokenizer=tok, vocab_size=1000,
    )
    toks = np.asarray(ds[0]["tokens"])
    assert toks.max() < 1000
    assert toks.min() >= 0
    raw = np.asarray(tok([ds.caption])[0])
    # pad positions preserved exactly
    np.testing.assert_array_equal(toks == 0, raw == 0)
    # without vocab_size: untouched
    ds2 = SyntheticDataset(
        transform=None, image_size=(32, 32), dataset_size=4, tokenizer=tok,
    )
    np.testing.assert_array_equal(np.asarray(ds2[0]["tokens"]), raw)
