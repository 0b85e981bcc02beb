"""Webdataset training path end-to-end through the CLI (tar shards ->
ShardedTarDataset -> jitted steps), reference data.py:357-472 capability."""

import io
import json
import os
import tarfile

import numpy as np
import pytest
from PIL import Image

from mrclip_tpu.train.main import main as train_main


def test_wds_cli_train(tmp_path):
    rng = np.random.RandomState(0)
    for shard in range(2):
        with tarfile.open(tmp_path / f"train-{shard:04d}.tar", "w") as tf:
            for i in range(16):
                key = f"s{shard}_{i}"
                buf = io.BytesIO()
                Image.fromarray(rng.randint(0, 255, (64, 64), np.uint8), "L").convert(
                    "RGB"
                ).save(buf, format="PNG")
                cls = str((shard * 16 + i) % 4).encode()
                for ext, data in (
                    ("png", buf.getvalue()),
                    ("txt", f"mri kind {(shard * 16 + i) % 4}".encode()),
                    ("cls", cls),
                ):
                    info = tarfile.TarInfo(f"{key}.{ext}")
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))
    (tmp_path / "sizes.json").write_text(
        json.dumps({f"train-{s:04d}.tar": 16 for s in range(2)})
    )

    state = train_main([
        "--train-data", str(tmp_path / "train-{0000..0001}.tar"),
        "--dataset-type", "webdataset", "--model", "ViT-B-32-mini",
        "--batch-size", "8", "--epochs", "1", "--multipositiveloss",
        "--precision", "fp32", "--workers", "1",
        "--logs", str(tmp_path / "logs"), "--name", "wds",
        "--log-every-n-steps", "10", "--save-frequency", "0",
    ])
    assert int(state.step) == 4  # 32 samples / batch 8
