"""Regression tests for the second round-3 review batch.

Each test pins one verified finding:
- pretrained-registry preprocess cfg must reach the transforms
  (SigLIP/CLIPA mean/std + squash — reference factory.py threads
  pretrained_cfg into model.visual.preprocess_cfg);
- the pretrained overlay must keep the pure_bf16 param cast;
- the native loader's producer thread must surface exceptions instead of
  silently truncating the epoch;
- the native augment path must honor aug_cfg.ratio and sample the
  resized-crop box in PIXEL space for non-square sources (absolute
  torchvision aspect semantics, like the host/device backends);
- the host blur must be the 3x3 kernel (reference transform.py:346
  GaussianBlur(kernel_size=3)), not PIL's wide-support gaussian.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mrclip_tpu.factory as factory
from mrclip_tpu.native import augment_matrices, png_size


def test_pretrained_tag_preprocess_reaches_transforms(monkeypatch):
    """create_model_and_transforms('...SigLIP', pretrained='webli') must
    build transforms with the registry's mean/std 0.5 + squash, not the
    OPENAI defaults."""
    monkeypatch.setattr(factory, "create_model", lambda *a, **k: (None, None))
    _, _, train_t, eval_t = factory.create_model_and_transforms(
        "ViT-B-16-SigLIP", pretrained="webli"
    )
    assert tuple(eval_t.cfg.mean) == (0.5, 0.5, 0.5)
    assert tuple(eval_t.cfg.std) == (0.5, 0.5, 0.5)
    assert eval_t.cfg.resize_mode == "squash"
    assert tuple(train_t.cfg.mean) == (0.5, 0.5, 0.5)
    # explicit kwargs still beat the registry
    _, _, _, eval_t2 = factory.create_model_and_transforms(
        "ViT-B-16-SigLIP", pretrained="webli", image_resize_mode="shortest"
    )
    assert eval_t2.cfg.resize_mode == "shortest"
    # no tag -> defaults unchanged
    _, _, _, eval_t3 = factory.create_model_and_transforms("ViT-B-32-mini")
    assert tuple(eval_t3.cfg.mean) != (0.5, 0.5, 0.5)


def test_pretrained_overlay_keeps_pure_bf16(tmp_path):
    """create_model(pretrained=..., precision='pure_bf16') must deliver the
    same dtypes as a fresh pure_bf16 init — checkpoints load as fp32 numpy
    and used to silently undo the cast (2x param memory on chip)."""
    torch = pytest.importorskip("torch")

    from mrclip_tpu.hub import export_torch_state_dict

    _, variables = factory.create_model("ViT-B-32-mini", rng_seed=0)
    sd = {
        k: torch.tensor(np.asarray(v))
        for k, v in export_torch_state_dict(variables["params"]).items()
    }
    path = str(tmp_path / "mini.pt")
    torch.save(sd, path)

    _, fresh = factory.create_model(
        "ViT-B-32-mini", precision="pure_bf16", rng_seed=0
    )
    _, loaded = factory.create_model(
        "ViT-B-32-mini", pretrained=path, precision="pure_bf16", rng_seed=0
    )
    mismatches = jax.tree.leaves(
        jax.tree_util.tree_map_with_path(
            lambda p, a, b: (jax.tree_util.keystr(p), a.dtype, b.dtype)
            if a.dtype != b.dtype
            else None,
            fresh["params"],
            loaded["params"],
            is_leaf=lambda x: hasattr(x, "dtype"),
        )
    )
    mismatches = [m for m in mismatches if m is not None]
    assert not mismatches, f"overlay changed dtypes: {mismatches[:5]}"
    n_bf16 = sum(
        1 for x in jax.tree.leaves(loaded["params"]) if x.dtype == jnp.bfloat16
    )
    assert n_bf16 > 0  # the cast actually happened


def test_native_loader_producer_error_raises(tmp_path):
    """An exception inside the producer thread (e.g. a malformed caption
    during tokenization) must re-raise in the consumer, not end the epoch
    early via the end-of-data sentinel."""
    from PIL import Image

    from mrclip_tpu.data.native_loader import NativeBatchLoader

    paths = []
    for i in range(4):
        p = tmp_path / f"{i}.png"
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(p)
        paths.append(str(p))

    class DS:
        images = paths
        captions = ["ok", "ok", "boom", "ok"]
        labels = [0, 1, 2, 3]

        def __len__(self):
            return 4

    def tokenizer(texts):
        if "boom" in texts[0]:
            raise ValueError("malformed caption")
        return np.zeros((len(texts), 8), np.int32)

    loader = NativeBatchLoader(DS(), batch_size=1, tokenizer=tokenizer,
                               canvas_size=(8, 8), drop_last=False)
    with pytest.raises(ValueError, match="malformed caption"):
        for _ in loader:
            pass


def test_png_size_reads_ihdr(tmp_path):
    from PIL import Image

    p = tmp_path / "img.png"
    Image.fromarray(np.zeros((16, 24, 3), np.uint8)).save(p)  # h=16, w=24
    assert png_size(str(p)) == (24, 16)
    assert png_size(str(tmp_path / "missing.png")) is None
    (tmp_path / "notpng.png").write_bytes(b"JUNK" * 10)
    assert png_size(str(tmp_path / "notpng.png")) is None


def test_native_crop_aspect_is_absolute_for_nonsquare_sources():
    """With the decoded size known, the sampled crop box's PIXEL aspect must
    stay inside torchvision's [3/4, 4/3] even on a 2:1 source. Isolate the
    crop by disabling the affine/flip parts."""
    rng = np.random.RandomState(0)
    kw = dict(degrees=(0.0, 0.0), translate=(0.0, 0.0),
              affine_scale=(1.0, 1.0), hflip_prob=0.0)
    n = 200
    w, h = 512, 256
    m = augment_matrices(rng, n, src_sizes=[(w, h)] * n, **kw)
    px_aspect = (m[:, 0] * w) / (m[:, 4] * h)
    assert px_aspect.min() >= 3.0 / 4.0 - 1e-2
    assert px_aspect.max() <= 4.0 / 3.0 + 1e-2
    # the size-unknown fallback is source-relative (documents the scope of
    # the normalized path: fine for square slices, off by w/h otherwise)
    m2 = augment_matrices(rng, n, **kw)
    px_aspect2 = (m2[:, 0] * w) / (m2[:, 4] * h)
    assert px_aspect2.max() > 4.0 / 3.0 + 0.2


def test_native_ratio_forwarded():
    """aug_cfg.ratio must reach the native matrix sampler (it was silently
    dropped): ratio=(1,1) on a square source forces square crops."""
    rng = np.random.RandomState(1)
    m = augment_matrices(
        rng, 50, ratio=(1.0, 1.0), src_sizes=[(128, 128)] * 50,
        degrees=(0.0, 0.0), translate=(0.0, 0.0), affine_scale=(1.0, 1.0),
        hflip_prob=0.0,
    )
    np.testing.assert_allclose(m[:, 0], m[:, 4], atol=2e-2)  # cw == ch (rounded px)


def test_host_blur_is_3tap():
    """TrainTransform's blur must be torchvision GaussianBlur(kernel_size=3):
    a 3-tap kernel leaves pixels >1 tap away untouched, which PIL's
    radius-based gaussian (support ~3*sigma) does not."""
    from PIL import Image

    from mrclip_tpu.transforms import _gaussian_blur3_pil

    arr = np.zeros((17, 17, 3), np.uint8)
    arr[8, 8] = 255  # impulse
    out = np.asarray(_gaussian_blur3_pil(Image.fromarray(arr), sigma=2.0))
    assert out[8, 8, 0] > 0
    assert out[8, 9, 0] > 0
    assert out[8, 11, 0] == 0, "energy leaked beyond the 3x3 support"
    # torchvision 3-tap weights: center/neighbor ratio = 1/w, w=exp(-1/(2s^2))
    w = np.exp(-0.5 / 4.0)
    expect_center = 255 * (1.0 / (1 + 2 * w)) ** 2
    assert abs(float(out[8, 8, 0]) - expect_center) < 2.0
