"""One-shot `--test` mode through the CLI: full-dataset retrieval metrics
with 3D volume voting (reference main.py --test -> train.py:859-1222)."""

import csv
import json

import numpy as np
import pytest
from PIL import Image

from mrclip_tpu.train.main import main as train_main


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("testmode")
    rng = np.random.RandomState(0)
    with open(d / "data.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["filepath", "title", "label"])
        for vol in range(4):
            for sl in (120, 122, 124):
                name = f"vol{vol}_axial_slice{sl}.png"
                arr = rng.randint(0, 255, (48, 48), dtype=np.uint8)
                Image.fromarray(arr, "L").save(d / name)
                w.writerow([str(d / name), f"mri kind {vol % 2}", vol % 2])
    return d


def test_cli_test_mode(data_dir, tmp_path):
    args = [
        "--val-data", str(data_dir / "data.csv"), "--dataset-type", "csv",
        "--model", "ViT-B-32-mini", "--batch-size", "4",
        "--precision", "fp32", "--workers", "0",
        "--logs", str(tmp_path / "logs"), "--name", "t",
        "--test",
    ]
    res = train_main(args)
    ranks = list((tmp_path / "logs" / "t").rglob("i2t_ranks.npy"))
    grouped = list((tmp_path / "logs" / "t").rglob("grouped_3d_analysis.json"))
    assert ranks and grouped, (
        f"missing outputs under {tmp_path}/logs/t: ranks={ranks} grouped={grouped}"
    )
    # 12 slices, 2 unique captions: every retrieval metric key present + sane
    assert 0.0 <= res["i2t_R@1"] <= 1.0
    assert res["i2t_mean_rank"] >= 1.0
    assert res["i2t_R@10"] == 1.0  # only 2 unique captions
    grp = json.loads(grouped[0].read_text())
    assert len(grp) == 4  # one entry per 3D volume
    r = np.load(ranks[0])
    assert r.shape == (12,)
    # unique-caption identity block (reference train.py:1085-1158)
    assert 0.0 <= res["i2t_unique_R@1"] <= 1.0
    assert res["i2t_unique_R@10"] == 1.0


def test_cli_test_mode_tracepreds(data_dir, tmp_path):
    """--test --tracepreds dumps anchor images + top predicted captions
    (reference train.py:1167-1221)."""
    args = [
        "--val-data", str(data_dir / "data.csv"), "--dataset-type", "csv",
        "--model", "ViT-B-32-mini", "--batch-size", "4",
        "--precision", "fp32", "--workers", "0",
        "--logs", str(tmp_path / "logs"), "--name", "tp",
        "--test", "--tracepreds",
    ]
    train_main(args)
    traced = list((tmp_path / "logs" / "tp").rglob("test_traced/predictions.json"))
    assert traced, "no test_traced/predictions.json written"
    preds = json.loads(traced[0].read_text())
    assert len(preds) == 12
    first = preds["0"]
    assert {"true_caption", "predicted", "general_rank", "unique_rank"} <= set(first)
    assert len(first["predicted"]) == 2  # only 2 unique captions exist
    anchors = list((tmp_path / "logs" / "tp").rglob("test_traced/anchor_*.png"))
    assert len(anchors) == 12
