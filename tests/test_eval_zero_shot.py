"""Zero-shot classifier + evaluate/test_metrics/linear-probe end-to-end on
tiny synthetic data (reference zero_shot_classifier.py:21-68, zero_shot.py,
train.py:272-534, :859-1222, :1381-1441)."""

import csv
import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from mrclip_tpu.data import get_data
from mrclip_tpu.factory import create_model
from mrclip_tpu.parallel import create_optimizer, create_train_state
from mrclip_tpu.tokenizer import SimpleTokenizer
from mrclip_tpu.train.loop import evaluate, linear_probe
from mrclip_tpu.train.loop import test_metrics as run_test_metrics
from mrclip_tpu.train.zero_shot import build_zero_shot_classifier, zero_shot_accuracy
from mrclip_tpu.transforms import EvalTransform, PreprocessCfg


class Args:
    batch_size = 4
    workers = 1
    multipositiveloss = True
    delta = 0.5
    unique = True
    metrics = True
    tracepreds = False
    zeroshot_frequency = 0
    image_size = 64
    dataset_type = "csv"
    csv_caption_key = "title"
    distance = False
    tabular = False
    native_loader = False
    train_data = None
    val_data = None
    imagenet_val = None
    imagenet_v2 = None
    checkpoint_path = None
    epochs = 1
    seed = 0


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("eval")
    rng = np.random.RandomState(0)
    rows = []
    for vol in range(4):
        for sl in (120, 122):
            name = f"vol{vol}_axial_slice{sl}.png"
            Image.fromarray(rng.randint(0, 255, (64, 64), np.uint8), "L").save(d / name)
            rows.append((str(d / name), f"an mri of kind {vol % 2}", vol % 2))
    csv_path = d / "val.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["filepath", "title", "label"])
        w.writerows(rows)

    model, variables = create_model("ViT-B-32-mini")
    tx = create_optimizer(lr=1e-3)
    state = create_train_state(variables, tx)
    tok = SimpleTokenizer(context_length=32)
    return d, str(csv_path), model, state, tok


def test_evaluate_retrieval_metrics(setup, tmp_path):
    d, csv_path, model, state, tok = setup
    args = Args()
    args.val_data = csv_path
    args.checkpoint_path = str(tmp_path)
    t = EvalTransform(PreprocessCfg(size=64))
    data = get_data(args, (t, t), tokenizer=tok)
    metrics = evaluate(model, state, data, epoch=0, args=args, tokenizer=tok)
    assert "clip_val_loss" in metrics
    assert "image_to_text_general_R@1" in metrics
    assert "image_to_text_unique_R@1" in metrics  # --unique dual ground truth
    assert 0.0 <= metrics["image_to_text_general_R@5"] <= 1.0
    assert os.path.exists(os.path.join(tmp_path, "results.jsonl"))


def test_test_metrics_3d_voting(setup, tmp_path):
    d, csv_path, model, state, tok = setup
    args = Args()
    args.val_data = csv_path
    args.checkpoint_path = str(tmp_path)
    t = EvalTransform(PreprocessCfg(size=64))
    data = get_data(args, (t, t), tokenizer=tok)
    metrics = run_test_metrics(model, state, data, args, tokenizer=tok)
    assert "i2t_R@1" in metrics and "t2i_R@1" in metrics
    assert "3d_vote_top1_accuracy" in metrics
    assert os.path.exists(os.path.join(tmp_path, "grouped_3d_analysis.json"))
    assert os.path.exists(os.path.join(tmp_path, "i2t_ranks.npy"))


def test_linear_probe(setup):
    d, csv_path, model, state, tok = setup
    args = Args()
    args.train_data = csv_path
    args.val_data = csv_path
    t = EvalTransform(PreprocessCfg(size=64))
    data = get_data(args, (t, t), tokenizer=tok)
    metrics = linear_probe(model, state, data, args)
    assert 0.0 <= metrics["linear_probe_accuracy"] <= 1.0


def test_zero_shot_classifier(setup):
    _, _, model, state, tok = setup
    variables = state.variables()
    encode_text = jax.jit(lambda t: model.apply(variables, None, t)["text_features"])
    classifier = build_zero_shot_classifier(
        encode_text, tok, ["cat", "dog", "bird"], ["a photo of a {}.", "an image of a {}."],
        num_classes_per_batch=2,
    )
    assert classifier.shape == (64, 3)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(classifier), axis=0), 1.0, rtol=1e-5
    )
    logits = np.random.RandomState(0).randn(10, 3)
    t1, t5 = zero_shot_accuracy(logits, logits.argmax(1), topk=(1, 2))
    assert t1 == 1.0


def test_zero_shot_eval_in_evaluate(setup, tmp_path):
    """imagenet-val folder dataset drives the frequency-gated zero-shot."""
    d, csv_path, model, state, tok = setup
    root = tmp_path / "imagenet"
    rng = np.random.RandomState(3)
    for cls in ("tench", "goldfish"):
        os.makedirs(root / cls)
        for i in range(3):
            Image.fromarray(rng.randint(0, 255, (64, 64), np.uint8), "L").save(
                root / cls / f"{i}.png"
            )
    args = Args()
    args.imagenet_val = str(root)
    args.zeroshot_frequency = 1
    args.zeroshot_classnames = ["tench", "goldfish"]
    args.zeroshot_templates = ["a photo of a {}."]
    t = EvalTransform(PreprocessCfg(size=64))
    data = get_data(args, (t, t), tokenizer=tok)
    metrics = evaluate(model, state, data, epoch=1, args=args, tokenizer=tok)
    assert "imagenet-zeroshot-val-top1" in metrics
    assert 0.0 <= metrics["imagenet-zeroshot-val-top1"] <= 1.0
