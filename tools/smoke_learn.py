"""Learnability smoke: full CLI pipeline on synthetic learnable data.

Images carry a label-dependent visual pattern and captions name the label;
after a few epochs of multipositive training, same-label retrieval R@1 must
beat the random baseline. Run: python tools/smoke_learn.py
Extra CLI flags are forwarded to the trainer, so perf configs can be
learnability-checked too, e.g.:
    python tools/smoke_learn.py --precision bf16 --attn-impl bf16
"""
import csv, os, sys, tempfile
import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")


def make_data(d, n_labels=4, per_label=16):
    rng = np.random.RandomState(0)
    rows = []
    for lbl in range(n_labels):
        for i in range(per_label):
            # label signal = overall brightness level: invariant to the
            # train-time flips/affines/blur (a quadrant pattern is NOT -
            # horizontal flips scramble it).
            base = 30 + 55 * lbl
            img = (base + rng.randint(0, 25, (64, 64))).astype(np.uint8)
            name = f"vol{lbl}_{i}_axial_slice120.png"
            Image.fromarray(img, "L").save(os.path.join(d, name))
            rows.append((os.path.join(d, name), f"a scan of acquisition protocol number {lbl}", lbl))
    rng.shuffle(rows)
    split = int(len(rows) * 0.75)
    for fname, data in (("train.csv", rows[:split]), ("val.csv", rows[split:])):
        with open(os.path.join(d, fname), "w", newline="") as f:
            w = csv.writer(f); w.writerow(["filepath", "title", "label"]); w.writerows(data)


def main():
    d = tempfile.mkdtemp()
    make_data(d)
    from mrclip_tpu.train.main import main as train_main
    from mrclip_tpu.data import get_data
    from mrclip_tpu.factory import create_model, get_tokenizer
    from mrclip_tpu.train.loop import evaluate

    state = train_main([
        "--train-data", os.path.join(d, "train.csv"),
        "--val-data", os.path.join(d, "val.csv"),
        "--dataset-type", "csv-unique-sampler",
        "--model", "ViT-B-32-mini",
        "--batch-size", "16", "--epochs", "150",
        "--multipositiveloss", "--precision", "fp32",
        "--lr", "2e-3", "--warmup", "10", "--wd", "0.01", "--lr-scheduler", "const",
        "--workers", "2", "--logs", os.path.join(d, "logs"),
        "--name", "learn", "--log-every-n-steps", "3",
        "--val-frequency", "150", "--save-frequency", "0",
    ] + sys.argv[1:])
    # re-evaluate explicitly for the final number
    import logging
    results_path = os.path.join(d, "logs", "learn", "checkpoints", "results.jsonl")
    import json
    lines = [json.loads(l) for l in open(results_path)]
    final = lines[-1]
    r1 = final["image_to_text_general_R@1"]
    print(f"final i2t general R@1 = {r1:.3f} (random ~ {1/4:.3f} per-label best-rank baseline)")
    # With 4 labels and best-of-same-label ranking, untrained R@1 hovers well
    # below 0.9; trained should saturate.
    assert r1 >= 0.6, f"model failed to learn (R@1={r1})"
    print("LEARNABILITY OK")


if __name__ == "__main__":
    main()
