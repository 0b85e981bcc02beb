"""`--visiononly --multipositiveloss` through the full CLI: the image-only
SimCLR-style path (reference train.py:543-857) trains and evaluates
end-to-end — not just the jitted step (tests/test_loss_variants_train.py)."""

import csv
import json

import numpy as np
import pytest
from PIL import Image

from mrclip_tpu.train.main import main as train_main


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("visonly")
    rng = np.random.RandomState(0)
    for split, n_per in (("train", 8), ("val", 4)):
        with open(d / f"{split}.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["filepath", "title", "label"])
            for lbl in range(2):
                for i in range(n_per):
                    name = f"{split}_l{lbl}_{i}_axial_slice120.png"
                    # label-dependent brightness so the loss has signal
                    arr = (60 + 120 * lbl + rng.randint(0, 20, (48, 48))).astype(
                        np.uint8
                    )
                    Image.fromarray(arr, "L").save(d / name)
                    w.writerow([str(d / name), f"mri kind {lbl}", lbl])
    return d


def test_cli_vision_only_trains_and_evaluates(data_dir, tmp_path):
    res = train_main([
        "--train-data", str(data_dir / "train.csv"),
        "--val-data", str(data_dir / "val.csv"),
        "--dataset-type", "csv",
        "--model", "ViT-B-32-mini", "--batch-size", "8",
        "--epochs", "2", "--precision", "fp32", "--workers", "0",
        "--multipositiveloss", "--visiononly",
        "--lr", "1e-3", "--warmup", "0",
        "--logs", str(tmp_path / "logs"), "--name", "vo",
        "--val-frequency", "1", "--save-frequency", "0",
    ])
    # results.jsonl carries image<->image retrieval metrics per epoch
    results_path = tmp_path / "logs" / "vo" / "checkpoints" / "results.jsonl"
    assert results_path.exists()
    lines = [json.loads(l) for l in open(results_path)]
    assert lines, "no eval results recorded"
    last = lines[-1]
    i2i_keys = [k for k in last if "image_to_image" in k or "i2i" in k]
    assert i2i_keys, f"no image-to-image metrics in {sorted(last)}"
    r1 = [v for k, v in last.items() if k.endswith("R@1")]
    assert r1 and all(0.0 <= v <= 1.0 for v in r1)
