"""`--resume latest` through the training CLI: a second invocation picks up
the saved epoch and continues (reference main.py:401-420)."""

import pytest
from mrclip_tpu.train.main import main as train_main


def _args(tmp_path, epochs):
    return [
        "--dataset-type", "synthetic", "--train-num-samples", "16",
        "--model", "ViT-B-32-mini", "--batch-size", "8",
        "--epochs", str(epochs), "--multipositiveloss", "--precision", "fp32",
        "--workers", "0", "--logs", str(tmp_path / "logs"), "--name", "r",
        "--save-frequency", "1", "--seed", "0",
    ]


@pytest.mark.slow
def test_resume_latest_continues(tmp_path):
    state1 = train_main(_args(tmp_path, 1))
    assert int(state1.step) == 2  # 16 samples / batch 8

    state2 = train_main(_args(tmp_path, 2) + ["--resume", "latest"])
    # resumed from epoch 1, trained epoch 2 only: 2 more steps
    assert int(state2.step) == 4


def test_resume_latest_noop_when_done(tmp_path):
    train_main(_args(tmp_path, 1))
    state = train_main(_args(tmp_path, 1) + ["--resume", "latest"])
    # start_epoch == epochs: no further training
    assert int(state.step) == 2
