"""Preprocessing parity tests vs the reference `preprocessing.py` (as oracle).

The reference module imports nibabel/pydicom (absent here); they're stubbed
since the oracle functions under test (simplify_text, generate_text_from_json,
get_bin_label) don't touch them. The NIfTI reader is validated against
synthetic volumes written in raw NIfTI-1 format.
"""

import gzip
import importlib.machinery
import importlib.util
import json
import os
import struct
import sys
import types

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from mrclip_tpu.preprocessing import (
    determine_plane,
    filter_slices,
    generate_text_from_json,
    get_bin_label,
    label_rows,
    load_bin_intervals,
    merge_and_shuffle_split,
    parse_dicom_metadata,
    process_nifti,
    read_nifti,
    simplify_text,
)

SIDENCAR = {
    "MagneticFieldStrength": 3,
    "Manufacturer": "SIEMENS",
    "ManufacturersModelName": "Prisma_fit",
    "SeriesDescription": "t2_tse_tra",
    "MRAcquisitionType": "2D",
    "ScanningSequence": "SE",
    "SequenceVariant": "SK",
    "SliceThickness": 4,
    "EchoTime": 0.093,
    "RepetitionTime": 9.0,
    "FlipAngle": 150,
}


@pytest.fixture(scope="module")
def ref():
    """Load reference preprocessing.py with nibabel/pydicom stubbed."""
    for name in ("nibabel", "pydicom"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
            sys.modules[name] = mod
    # preprocessing.py is a notebook-style script whose tail cells execute the
    # pipeline on import; exec only its imports + function definitions.
    import ast

    src = open("/root/reference/preprocessing.py").read()
    tree = ast.parse(src)
    keep = [
        n
        for n in tree.body
        if isinstance(n, (ast.FunctionDef, ast.Import, ast.ImportFrom, ast.Assign))
    ]
    mod = types.ModuleType("ref_preprocessing")
    exec(compile(ast.Module(body=keep, type_ignores=[]), "ref_preprocessing", "exec"), mod.__dict__)
    return mod


def _write_nifti(path, data: np.ndarray, pixdim=(1.0, 1.0, 1.0), gz=False):
    """Write a minimal NIfTI-1 file."""
    hdr = bytearray(352)
    struct.pack_into("<i", hdr, 0, 348)
    dims = [data.ndim] + list(data.shape) + [1] * (7 - data.ndim)
    struct.pack_into("<8h", hdr, 40, *dims)
    struct.pack_into("<h", hdr, 70, 16)  # float32
    struct.pack_into("<h", hdr, 72, 32)
    struct.pack_into("<8f", hdr, 76, 1.0, *pixdim, 1.0, 1.0, 1.0, 1.0)
    struct.pack_into("<f", hdr, 108, 352.0)
    hdr[344:348] = b"n+1\x00"
    blob = bytes(hdr) + data.astype("<f4").tobytes(order="F")
    if gz:
        with gzip.open(path, "wb") as f:
            f.write(blob)
    else:
        with open(path, "wb") as f:
            f.write(blob)


def test_nifti_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    vol = rng.rand(50, 60, 70).astype(np.float32)
    p = str(tmp_path / "ur_test.nii")
    _write_nifti(p, vol)
    data, hdr = read_nifti(p)
    np.testing.assert_allclose(data, vol, rtol=1e-6)

    pgz = str(tmp_path / "ur_test2.nii.gz")
    _write_nifti(pgz, vol, gz=True)
    data2, _ = read_nifti(pgz)
    np.testing.assert_allclose(data2, vol, rtol=1e-6)


def test_determine_plane(tmp_path):
    vol = np.zeros((50, 60, 70), np.float32)
    for pixdim, want in [
        ((3.0, 1.0, 1.0), "sagittal"),
        ((1.0, 3.0, 1.0), "coronal"),
        ((1.0, 1.0, 3.0), "axial"),
    ]:
        p = str(tmp_path / f"ur_{want}.nii")
        _write_nifti(p, vol, pixdim=pixdim)
        assert determine_plane(p) == want


def test_process_nifti_slices(tmp_path):
    rng = np.random.RandomState(1)
    vol = rng.rand(50, 60, 8).astype(np.float32)
    vol[:, :, 3] = 0.0  # all-zero slice must be skipped... (min-max shifts it)
    p = str(tmp_path / "ur_vol_axial.nii")
    _write_nifti(p, vol, pixdim=(1.0, 1.0, 3.0))
    outdir = str(tmp_path / "slices")
    n = process_nifti(p, outdir)
    files = sorted(os.listdir(outdir))
    assert n == len(files) > 0
    img = np.asarray(Image.open(os.path.join(outdir, files[0])))
    assert img.shape == (50, 60)
    assert img.dtype == np.uint8
    assert "_axial_slice" in files[0]


def test_caption_parity_with_reference(ref, tmp_path):
    jpath = str(tmp_path / "scan.json")
    with open(jpath, "w") as f:
        json.dump(SIDENCAR, f)
    ours_raw = generate_text_from_json(jpath, "axial")
    ref_raw = ref.generate_text_from_json(jpath, "axial")
    assert ours_raw == ref_raw
    assert simplify_text(ours_raw) == ref.simplify_text(ref_raw)
    # canonical 4-part structure
    simple = simplify_text(ours_raw)
    assert simple.startswith("A brain MRI, plane axial, Scanner (Manufacturer, Model, Field Strength):")
    assert "(0.093, 9.0, NONE, 150)" in simple


def test_bin_label_parity_with_reference(ref):
    bins = load_bin_intervals()
    for field, values in [
        ("Echo Time", [0.001, 0.01, 0.0101, 0.093, 0.199, 0.2, 5.0, None]),
        ("Repetition Time", [0.2, 0.5, 0.51, 9.0, 9.99, 10.0, 100.0]),
        ("Inversion Time", [0.1, 2.9, 3.0, 3.5, 50.0]),
    ]:
        for v in values:
            assert get_bin_label(v, bins[field]) == ref.get_bin_label(v, bins[field]), (field, v)


def test_label_rows_flip_angle_filter():
    bins = load_bin_intervals()
    jrows = []
    for fa in (150, 30):
        raw = dict(SIDENCAR, FlipAngle=fa)
        text = simplify_text(
            ", ".join(
                ["a photo of brain MRI, plane axial,"]
                + [f"{k} {v}" for k, v in {
                    "Magnetic Field Strength": raw["MagneticFieldStrength"],
                    "Manufacturer": raw["Manufacturer"],
                    "Manufacturers Model Name": raw["ManufacturersModelName"],
                    "Scanning Sequence": raw["ScanningSequence"],
                    "Sequence Variant": raw["SequenceVariant"],
                    "Echo Time": raw["EchoTime"],
                    "Repetition Time": raw["RepetitionTime"],
                    "Flip Angle": raw["FlipAngle"],
                }.items()]
            )
        )
        jrows.append({"filepath": f"x_fa{fa}_slice120.png", "text": text})
    labeled, label_dict = label_rows(jrows, bins)
    assert len(labeled) == 1  # FA 30 dropped
    assert labeled[0]["label"] == 0
    meta = parse_dicom_metadata(labeled[0]["text"])
    assert meta["Echo Time"] == "0.093"


def test_split_groups_volumes(tmp_path):
    rows = []
    for vol in range(10):
        for sl in range(120, 140, 2):
            rows.append({
                "filepath": f"/d/vol{vol}_axial_slice{sl}.png",
                "text": "t",
                "label": vol % 3,
            })
    df = pd.DataFrame(rows)
    train, val, test = merge_and_shuffle_split(
        [df], None, None, None, train_ratio=0.6, val_ratio=0.2
    )
    assert len(train) + len(val) + len(test) == len(rows)

    def vols(frame):
        return {os.path.basename(p).split("_axial")[0] for p in frame["filepath"]}

    assert vols(train) & vols(val) == set()
    assert vols(train) & vols(test) == set()
    assert len(vols(train)) == 6 and len(vols(val)) == 2


def test_filter_slices():
    df = pd.DataFrame({
        "filepath": [
            "/d/a_axial_slice120.png",   # keep (even, in range)
            "/d/a_axial_slice121.png",   # odd
            "/d/a_axial_slice100.png",   # below range
            "/d/a_sagittal_slice60.png", # keep (sagittal range)
            "/d/a_sagittal_slice160.png" # above sagittal range
        ]
    })
    out = filter_slices(df)
    assert list(out["filepath"]) == ["/d/a_axial_slice120.png", "/d/a_sagittal_slice60.png"]
