"""FLOPs/params profiler (train/profiler.py vs reference profiler.py:128-205):
sane numbers for a known config and CSV output through the CLI."""

import csv

from mrclip_tpu.train.profiler import main as profiler_main
from mrclip_tpu.train.profiler import profile_model


def test_profile_model_vitb32_counts():
    """Full ViT-B-32: ~151 Mparams / ~16.8 GFLOPs (README table; matches the
    reference profiler's envelope for the same architecture)."""
    res = profile_model("ViT-B-32")
    assert 145 < res["mparams"] < 160
    assert 10 < res["gflops"] < 25
    assert res["image_gflops"] > 0 and res["text_gflops"] > 0
    assert res["image_gflops"] + res["text_gflops"] <= res["gflops"] * 1.01


def test_profiler_cli_writes_csv(tmp_path):
    out = str(tmp_path / "profile.csv")
    profiler_main(["--model", "ViT-B-32-mini", "--results-file", out])
    rows = list(csv.DictReader(open(out)))
    assert len(rows) == 1
    assert rows[0]["model"] == "ViT-B-32-mini"
    assert float(rows[0]["gflops"]) > 0
