"""MobileCLIP towers (models/fastvit.py): FastViT/MCi + hybrid ViT.

Covers the reference's MobileCLIP registry tags (pretrained.py:545-552) that
it cannot itself build. Deploy-form architecture, no offline oracle
(PROVENANCE note in the module) — native shape/semantics tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mrclip_tpu.models.fastvit import FASTVIT_DIMS, FastViT, HybridViT

TINY = dict(depths=(1, 1, 2, 1), dims=(8, 16, 32, 64), output_dim=48)


def test_fastvit_tiny_forward():
    model = FastViT(image_size=64, **TINY)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    v = model.init(jax.random.key(0), x)
    out = jax.jit(model.apply)(v, x)
    assert out.shape == (2, 48)
    assert np.isfinite(np.asarray(out)).all()


def test_fastvit_tokens_at_one_thirtysecond():
    model = FastViT(image_size=64, output_tokens=True, **TINY)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    v = model.init(jax.random.key(0), x)
    _, tokens = model.apply(v, x)
    assert tokens.shape[1] == (64 // 32) ** 2


def test_fastvit_remat_matches_no_remat():
    m0 = FastViT(image_size=64, scan_layers=False, **TINY)
    m1 = FastViT(image_size=64, scan_layers=False, remat=True, **TINY)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    v = m0.init(jax.random.key(0), x)
    np.testing.assert_allclose(
        np.asarray(m0.apply(v, x)), np.asarray(m1.apply(v, x)), rtol=0, atol=1e-6
    )


def test_hybrid_vit_tiny_forward_and_grads():
    model = HybridViT(
        image_size=32, width=32, layers=2, heads=2,
        stem_dims=(8, 8, 16, 32), output_dim=16,
    )
    x = jnp.asarray(np.random.RandomState(0).rand(4, 32, 32, 3), jnp.float32)
    y = jnp.asarray([0, 1, 1, 0], jnp.int32)
    v = model.init(jax.random.key(0), x)
    head = jax.random.normal(jax.random.key(1), (16, 2)) * 0.1

    def loss_fn(params):
        z = model.apply({"params": params}, x) @ head
        return optax.softmax_cross_entropy_with_integer_labels(z, y).mean()

    l0, g = jax.jit(jax.value_and_grad(loss_fn))(v["params"])
    assert np.isfinite(float(l0))
    # every param receives a gradient (no dead branches)
    flat = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(t)).all() for t in flat)
    gnorm = sum(float(jnp.sum(t.astype(jnp.float32) ** 2)) for t in flat)
    assert gnorm > 0


def test_registry_configs_build_abstractly():
    from mrclip_tpu.factory import create_model, get_model_config, list_models

    names = sorted(n for n in list_models() if n.startswith("MobileCLIP"))
    assert names == ["MobileCLIP-B", "MobileCLIP-S1", "MobileCLIP-S2"]
    for n in names:
        cfg = get_model_config(n)
        model, _ = create_model(n, init_params=False)
        img = cfg["vision_cfg"]["image_size"]
        imgs = jnp.zeros((2, img, img, 3), jnp.float32)
        toks = jnp.zeros((2, cfg["text_cfg"]["context_length"]), jnp.int32)
        vs = jax.eval_shape(lambda: model.init(jax.random.key(0), imgs, toks))
        out = jax.eval_shape(lambda v: model.apply(v, imgs, toks), vs)
        assert out["image_features"].shape == (2, cfg["embed_dim"])
        assert out["text_features"].shape == (2, cfg["embed_dim"])


def test_unknown_fastvit_variant_rejected():
    from mrclip_tpu.models.clip import CLIPVisionCfg, _build_timm_vit_tower

    cfg = CLIPVisionCfg(timm_model_name="fastvit_t8")
    with pytest.raises(NotImplementedError, match="fastvit"):
        _build_timm_vit_tower(
            512, cfg, jnp.float32, True, False, "dots", "xla", "v"
        )


def test_mobileclip_b_param_count_near_published():
    # Apple's MobileCLIP-B: 86.3M image + 63.4M text ~= 150M total. The
    # native rebuild should land in the same ballpark (LN-for-BN and the
    # fused stem shift it by <5%).
    from mrclip_tpu.factory import create_model

    model, _ = create_model("MobileCLIP-B", init_params=False)
    imgs = jnp.zeros((1, 224, 224, 3), jnp.float32)
    toks = jnp.zeros((1, 77), jnp.int32)
    vs = jax.eval_shape(lambda: model.init(jax.random.key(0), imgs, toks))
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(vs["params"]))
    assert 130e6 < n < 170e6, f"{n/1e6:.1f}M"


@pytest.mark.parametrize("name,lo,hi", [
    # Apple MobileCLIP paper: S1 = MCi1 21.5M image + 63.4M text ~= 85M,
    # S2 = MCi2 35.7M image + 63.4M text ~= 99M (numbers paper-recalled;
    # bounds are deliberately wide — this guards the stage tables against
    # silent drift, not exact parity).
    ("MobileCLIP-S1", 70e6, 100e6),
    ("MobileCLIP-S2", 85e6, 115e6),
])
def test_mobileclip_s_param_counts_near_published(name, lo, hi):
    from mrclip_tpu.factory import create_model, get_model_config

    cfg = get_model_config(name)
    model, _ = create_model(name, init_params=False)
    imgs = jnp.zeros((1, cfg["vision_cfg"]["image_size"],
                      cfg["vision_cfg"]["image_size"], 3), jnp.float32)
    toks = jnp.zeros((1, 77), jnp.int32)
    vs = jax.eval_shape(lambda: model.init(jax.random.key(0), imgs, toks))
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(vs["params"]))
    assert lo < n < hi, f"{name}: {n/1e6:.1f}M params"


def test_mobileclip_deploy_mode_tree_is_overlay_compatible():
    """norm='ln' and norm='affine' towers share every norm param position
    (scale/bias), so checkpoints trained in one mode overlay onto the other
    for the stem/ffn norms; deploy mode adds only its structural extras
    (3-conv stem, attn-stage blocks, proj_bias)."""
    from mrclip_tpu.factory import create_model, get_model_config

    cfg = get_model_config("MobileCLIP-B")
    model_ln, _ = create_model("MobileCLIP-B", init_params=False)
    cfg["vision_cfg"]["timm_deploy_import"] = True
    model_af, _ = create_model(
        "MobileCLIP-B", init_params=False, vision_cfg=cfg["vision_cfg"]
    )
    imgs = jnp.zeros((1, 224, 224, 3), jnp.float32)
    toks = jnp.zeros((1, 77), jnp.int32)

    def paths(m):
        vs = jax.eval_shape(lambda: m.init(jax.random.key(0), imgs, toks))
        return {
            jax.tree_util.keystr(p): tuple(v.shape)
            for p, v in jax.tree_util.tree_flatten_with_path(vs["params"])[0]
        }

    p_ln, p_af = paths(model_ln), paths(model_af)
    extras = set(p_af) - set(p_ln)
    # B's only structural delta is the biased projection
    assert extras == {"['visual']['proj_bias']"}, extras
    for k in p_ln:
        assert p_ln[k] == p_af[k], (k, p_ln[k], p_af[k])
