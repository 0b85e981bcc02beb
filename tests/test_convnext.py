"""ConvNeXt vision tower (models/convnext.py) + timm checkpoint remap
(convert.timm_convnext_to_vision_params): forward parity against a
hand-written torch oracle of the timm ConvNeXt semantics (dwconv7x7 -> LN
-> 4x MLP -> gamma -> residual; LN+2x2 downsampling; avg pool -> LN ->
linear proj), covering the reference's convnext TimmModel adapters
(timm_model.py:29-153, pretrained.py:373-385)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrclip_tpu.convert import convert_state_dict, timm_convnext_to_vision_params
from mrclip_tpu.models.convnext import ConvNeXt

DEPTHS, DIMS, RES = (1, 2), (8, 16), 16


def _tiny_convnext_sd(seed=0):
    rng = np.random.RandomState(seed)
    r = lambda *s: (rng.randn(*s) * 0.1).astype(np.float32)
    sd = {
        "stem.0.weight": r(DIMS[0], 3, 4, 4),
        "stem.0.bias": r(DIMS[0]),
        "stem.1.weight": 1 + r(DIMS[0]),
        "stem.1.bias": r(DIMS[0]),
        "head.norm.weight": 1 + r(DIMS[-1]),
        "head.norm.bias": r(DIMS[-1]),
    }
    for s, (depth, dim) in enumerate(zip(DEPTHS, DIMS)):
        if s > 0:
            sd[f"stages.{s}.downsample.0.weight"] = 1 + r(DIMS[s - 1])
            sd[f"stages.{s}.downsample.0.bias"] = r(DIMS[s - 1])
            sd[f"stages.{s}.downsample.1.weight"] = r(dim, DIMS[s - 1], 2, 2)
            sd[f"stages.{s}.downsample.1.bias"] = r(dim)
        for b in range(depth):
            p = f"stages.{s}.blocks.{b}."
            sd.update({
                p + "conv_dw.weight": r(dim, 1, 7, 7),
                p + "conv_dw.bias": r(dim),
                p + "norm.weight": 1 + r(dim),
                p + "norm.bias": r(dim),
                p + "mlp.fc1.weight": r(4 * dim, dim),
                p + "mlp.fc1.bias": r(4 * dim),
                p + "mlp.fc2.weight": r(dim, 4 * dim),
                p + "mlp.fc2.bias": r(dim),
                p + "gamma": r(dim) * 0.1,
            })
    return sd


def _torch_convnext_forward(sd, images):
    """timm ConvNeXt semantics in functional torch (NCHW, LN over C,
    eps=1e-6 — the FB/timm ConvNeXt norm_layer default)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    t = lambda k: torch.tensor(sd[k])

    def ln_c(x, prefix):  # LayerNorm over the channel dim of NCHW
        x = x.permute(0, 2, 3, 1)
        x = F.layer_norm(x, (x.shape[-1],), t(prefix + ".weight"), t(prefix + ".bias"), eps=1e-6)
        return x.permute(0, 3, 1, 2)

    x = torch.tensor(images).permute(0, 3, 1, 2)
    x = F.conv2d(x, t("stem.0.weight"), t("stem.0.bias"), stride=4)
    x = ln_c(x, "stem.1")
    for s, (depth, dim) in enumerate(zip(DEPTHS, DIMS)):
        if s > 0:
            x = ln_c(x, f"stages.{s}.downsample.0")
            x = F.conv2d(x, t(f"stages.{s}.downsample.1.weight"),
                         t(f"stages.{s}.downsample.1.bias"), stride=2)
        for b in range(depth):
            p = f"stages.{s}.blocks.{b}."
            h = F.conv2d(x, t(p + "conv_dw.weight"), t(p + "conv_dw.bias"),
                         padding=3, groups=dim)
            h = h.permute(0, 2, 3, 1)
            h = F.layer_norm(h, (dim,), t(p + "norm.weight"), t(p + "norm.bias"), eps=1e-6)
            h = F.gelu(F.linear(h, t(p + "mlp.fc1.weight"), t(p + "mlp.fc1.bias")))
            h = F.linear(h, t(p + "mlp.fc2.weight"), t(p + "mlp.fc2.bias"))
            h = h * t(p + "gamma")
            x = x + h.permute(0, 3, 1, 2)
    x = x.mean(dim=(2, 3))
    x = F.layer_norm(x, (DIMS[-1],), t("head.norm.weight"), t("head.norm.bias"), eps=1e-6)
    return x.numpy()


def test_convnext_import_forward_parity():
    sd = _tiny_convnext_sd()
    rng = np.random.RandomState(1)
    images = rng.rand(2, RES, RES, 3).astype(np.float32)

    import torch

    with torch.no_grad():
        want = _torch_convnext_forward(sd, images)

    tower = ConvNeXt(depths=DEPTHS, dims=DIMS, output_dim=None)
    params = timm_convnext_to_vision_params(sd)
    got = tower.apply({"params": params}, jnp.asarray(images))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_convnext_trunk_checkpoint_dispatch():
    """open_clip convnext checkpoint layout (visual.trunk.* + head proj +
    native text tower) dispatches to a full params tree."""
    sd = {f"visual.trunk.{k}": v for k, v in _tiny_convnext_sd(seed=2).items()}
    rng = np.random.RandomState(3)
    sd["visual.head.proj.weight"] = rng.randn(6, DIMS[-1]).astype(np.float32) * 0.1
    sd["logit_scale"] = np.asarray(2.659, np.float32)
    params = convert_state_dict(sd, scan_layers=False)
    assert params["visual"]["proj"].shape == (DIMS[-1], 6)
    assert "stem_conv" in params["visual"]
    assert "stages_1_blocks_1" in params["visual"]


def test_convnext_base_w_config_builds():
    """The registered convnext_base_w config builds abstractly end to end
    with the expected embedding width."""
    from mrclip_tpu.factory import create_model

    model, _ = create_model("convnext_base_w", init_params=False)
    imgs = jnp.zeros((2, 256, 256, 3), jnp.float32)
    toks = jnp.zeros((2, 98), jnp.int32)
    shapes = jax.eval_shape(lambda: model.init(jax.random.key(0), imgs, toks))
    out = jax.eval_shape(lambda v: model.apply(v, imgs, toks), shapes)
    assert out["image_features"].shape == (2, 640)
    assert out["text_features"].shape == (2, 640)


@pytest.mark.slow
def test_convnext_remat_matches_no_remat():
    """Per-block jax.checkpoint must not change the forward numerics."""
    sd = _tiny_convnext_sd(seed=5)
    params = timm_convnext_to_vision_params(sd)
    rng = np.random.RandomState(6)
    images = jnp.asarray(rng.rand(2, RES, RES, 3), jnp.float32)
    plain = ConvNeXt(depths=DEPTHS, dims=DIMS, output_dim=None)
    rematd = ConvNeXt(depths=DEPTHS, dims=DIMS, output_dim=None, remat=True)
    a = plain.apply({"params": params}, images)
    b = rematd.apply({"params": params}, images)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # gradient flows through the remat wrapper
    def loss(p):
        return jnp.sum(rematd.apply({"params": p}, images) ** 2)

    g = jax.grad(loss)(params)
    assert all(np.isfinite(x).all() for x in jax.tree.leaves(jax.tree.map(np.asarray, g)))
