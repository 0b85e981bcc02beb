"""get_clip_metrics parity vs the reference implementation (AST-extracted).

The reference function (train.py:465-534) is self-contained (torch + numpy);
we exec just that function and compare every metric on random features with
both general and unique ground truths.
"""

import ast
import types

import numpy as np
import pytest

from mrclip_tpu.train.metrics import get_clip_metrics


@pytest.fixture(scope="module")
def ref_metrics():
    src = open("/root/reference/src/open_clip_train/train.py").read()
    tree = ast.parse(src)
    fn = next(
        n for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "get_clip_metrics"
    )
    mod = types.ModuleType("ref_metrics")
    import torch

    mod.torch = torch
    mod.np = np
    exec(compile(ast.Module(body=[fn], type_ignores=[]), "ref", "exec"), mod.__dict__)
    return mod.get_clip_metrics


def test_metrics_parity(ref_metrics):
    import torch

    rng = np.random.RandomState(5)
    n, d = 40, 16
    img = rng.randn(n, d).astype(np.float32)
    txt = rng.randn(n, d).astype(np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=1, keepdims=True)
    labels = rng.randint(0, 6, n)
    unique = rng.randint(0, 15, n)
    scale = 30.0

    ref = ref_metrics(
        torch.from_numpy(img),
        torch.from_numpy(txt),
        torch.tensor(scale),
        list(labels),
        ground_truth_unique=list(unique),
    )
    ours = get_clip_metrics(img, txt, scale, labels, unique)

    assert set(ref.keys()) == set(ours.keys()), (
        set(ref) - set(ours), set(ours) - set(ref)
    )
    for key in ref:
        np.testing.assert_allclose(ours[key], ref[key], rtol=1e-5, err_msg=key)
