"""Full MRI pipeline smoke: NIfTI -> preprocessing CLI -> training -> eval.

Exercises the complete reference workflow (SURVEY.md §3.5 + §3.1) on
synthetic data: writes NIfTI volumes + BIDS JSON sidecars whose acquisition
parameters (TE/TR) correlate with a visible intensity signature, runs all
four preprocessing steps via the CLI, trains with the distance-weighted
multipositive loss + unique-label sampler, and checks retrieval learns.

Run: python tools/smoke_mri_pipeline.py
"""

import gzip
import json
import os
import struct
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")


def write_nifti(path, data, pixdim=(1.0, 1.0, 3.0)):
    hdr = bytearray(352)
    struct.pack_into("<i", hdr, 0, 348)
    dims = [data.ndim] + list(data.shape) + [1] * (7 - data.ndim)
    struct.pack_into("<8h", hdr, 40, *dims)
    struct.pack_into("<h", hdr, 70, 16)
    struct.pack_into("<h", hdr, 72, 32)
    struct.pack_into("<8f", hdr, 76, 1.0, *pixdim, 1.0, 1.0, 1.0, 1.0)
    struct.pack_into("<f", hdr, 108, 352.0)
    hdr[344:348] = b"n+1\x00"
    with open(path, "wb") as f:
        f.write(bytes(hdr) + data.astype("<f4").tobytes(order="F"))


def make_raw_dataset(raw_dir, n_protocols=3, vols_per_protocol=4):
    """Volumes whose intensity level encodes the acquisition protocol."""
    rng = np.random.RandomState(0)
    protocols = [
        {"EchoTime": 0.015, "RepetitionTime": 0.6, "SeriesDescription": "t1_mprage",
         "ScanningSequence": "GR", "SequenceVariant": "SP", "FlipAngle": 9},
        {"EchoTime": 0.095, "RepetitionTime": 6.0, "SeriesDescription": "t2_tse",
         "ScanningSequence": "SE", "SequenceVariant": "SK", "FlipAngle": 150},
        {"EchoTime": 0.090, "RepetitionTime": 9.0, "SeriesDescription": "flair",
         "ScanningSequence": "IR", "SequenceVariant": "MP", "FlipAngle": 150},
    ][:n_protocols]
    for p, proto in enumerate(protocols):
        for v in range(vols_per_protocol):
            # axial volume; the label signal is a protocol-specific spatial
            # frequency (per-volume min-max normalization in process_nifti
            # would erase any absolute-intensity signal)
            freq = [1, 4, 10][p]
            y = np.arange(64)[:, None, None]
            pattern = 0.5 + 0.5 * np.sin(2 * np.pi * freq * y / 64)
            vol = pattern + rng.rand(64, 64, 230) * 0.15
            vol[:, :, :100] = 0.0  # empty leading slices
            name = f"ur_sub{p}{v}"
            write_nifti(os.path.join(raw_dir, name + ".nii"), vol)
            sidecar = {
                "MagneticFieldStrength": 3,
                "Manufacturer": "SIEMENS",
                "ManufacturersModelName": "Prisma_fit",
                "MRAcquisitionType": "2D",
                "SliceThickness": 3,
                **proto,
            }
            # caption pairing strips the plane suffix then looks for
            # `{stem}.json` (preprocessing CLI json_for_png)
            with open(os.path.join(raw_dir, f"ur_sub{p}{v}.json"), "w") as f:
                json.dump(sidecar, f)
    return len(protocols) * vols_per_protocol


def main():
    root = tempfile.mkdtemp()
    raw = os.path.join(root, "raw")
    slices = os.path.join(root, "slices")
    os.makedirs(raw)

    n_vols = make_raw_dataset(raw)
    from mrclip_tpu.preprocessing.__main__ import main as preprocess

    preprocess(["slices", "--input", raw, "--output", slices])
    n_pngs = len([f for f in os.listdir(slices) if f.endswith(".png")])
    print(f"volumes: {n_vols}, slice PNGs: {n_pngs}")
    assert n_pngs > 100

    caps_csv = os.path.join(root, "caps.csv")
    preprocess(["captions", "--input", slices, "--rawdata", raw, "--output", caps_csv])
    labeled_dir = os.path.join(root, "labeled")
    preprocess(["label", "--input", caps_csv, "--output", labeled_dir])
    # the label step writes labeled_caps.csv; split expects labeled_*.csv
    split_dir = os.path.join(root, "split")
    os.makedirs(split_dir, exist_ok=True)
    preprocess(["split", "--input", labeled_dir, "--output", split_dir,
                "--train-ratio", "0.7", "--val-ratio", "0.3"])

    import pandas as pd

    train_df = pd.read_csv(os.path.join(split_dir, "train.csv"))
    val_df = pd.read_csv(os.path.join(split_dir, "val.csv"))
    print(f"train rows: {len(train_df)}, val rows: {len(val_df)}, "
          f"labels: {sorted(train_df['label'].unique())}")
    assert train_df["label"].nunique() >= 2
    assert "A brain MRI, plane axial" in train_df["text"].iloc[0]

    # The canonical MRI captions only differ AFTER ~40 tokens (scanner block
    # first, acquisition/TE/TR later) — a short context collapses all text
    # features to the shared prefix. This is precisely why MR-CLIP raised
    # CLIP's 77-token context to 98 (reference tokenizer.py:23).
    from mrclip_tpu.factory import _MODEL_CONFIGS

    _MODEL_CONFIGS["ViT-B-32-mini-mri"] = {
        "embed_dim": 64,
        "vision_cfg": {"image_size": 64, "layers": 2, "width": 64,
                        "head_width": 32, "patch_size": 32},
        "text_cfg": {"context_length": 98, "vocab_size": 49408, "width": 64,
                      "heads": 2, "layers": 2},
    }

    from mrclip_tpu.train.main import main as train_main

    state = train_main([
        "--train-data", os.path.join(split_dir, "train.csv"),
        "--val-data", os.path.join(split_dir, "val.csv"),
        "--dataset-type", "csv-unique-sampler",
        "--csv-caption-key", "text",
        "--model", "ViT-B-32-mini-mri",
        "--batch-size", "16", "--epochs", "20",
        "--multipositiveloss", "--distance", "--delta", "0.5",
        "--precision", "fp32", "--lr", "2e-3", "--lr-scheduler", "const",
        "--warmup", "10", "--wd", "0.01", "--workers", "2",
        "--logs", os.path.join(root, "logs"), "--name", "mri",
        "--log-every-n-steps", "10", "--val-frequency", "20",
        "--save-frequency", "0",
    ])

    results = [
        json.loads(line)
        for line in open(os.path.join(root, "logs", "mri", "checkpoints", "results.jsonl"))
    ]
    r1 = results[-1]["image_to_text_general_R@1"]
    print(f"final i2t general R@1 = {r1:.3f}")
    assert r1 >= 0.8, f"MRI pipeline failed to learn (R@1={r1})"
    print("MRI PIPELINE OK")


if __name__ == "__main__":
    main()
