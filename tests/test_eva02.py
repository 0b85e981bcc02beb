"""EVA02 tower: native build + checkpoint import parity.

TPU-native rebuild of the reference's TimmModel-wrapped `eva02_*_clip_*`
towers (`src/open_clip/timm_model.py:29-153` + pretrained.py:454-474).
timm is not installed here; the oracle is a minimal torch implementation of
timm `eva.py`'s block math, written against its spec:

- EvaAttention (qkv_fused=False): separate q/k/v projections, k bias-free;
  optional LayerNorm over the merged heads before the output projection
  (`scale_attn_inner`, the EVA02 "sub-LN").
- 2D axial rope (`RotaryEmbeddingCat(in_pixels=False)`): per-axis bands
  1/10000^(i/nb), nb = head_dim//4, integer patch coords rescaled by
  `ref_feat_shape`, pair-duplicated, applied as x*cos + rot(x)*sin with
  rot(x) = stack([-x[1::2], x[::2]]); the CLS token passes unrotated.
- SwiGLU MLP: silu(fc1_g(x)) * fc1_x(x) -> LN (`scale_mlp`) -> fc2.
- EvaBlockPostNorm (EVA02-E): fused qkv (separate q/v bias, zero k bias),
  plain GELU MLP, norm1/norm2 applied to the sublayer OUTPUT.
- LayerNorm eps 1e-6 throughout (timm Eva default).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrclip_tpu.convert import timm_vit_to_vision_params
from mrclip_tpu.models.vision import VisionTransformer

D, HEADS, LAYERS, PATCH, RES, OUT = 32, 2, 2, 4, 16, 24
GRID = RES // PATCH
HID = int(D * 4 * 2 / 3)
EPS = 1e-6


def _rope_table_torch(head_dim, gh, gw, ref):
    """timm RotaryEmbeddingCat(in_pixels=False) table, torch ops."""
    import torch

    nb = head_dim // 4
    bands = 1.0 / 10000 ** (torch.arange(nb, dtype=torch.float64) / nb)
    th = torch.arange(gh, dtype=torch.float64)
    tw = torch.arange(gw, dtype=torch.float64)
    if ref is not None:
        th = th / gh * ref[0]
        tw = tw / gw * ref[1]
    grid = torch.stack(torch.meshgrid(th, tw, indexing="ij"), dim=-1).unsqueeze(-1)
    pos = (grid * bands).reshape(gh * gw, -1)  # [HW, 2*nb]
    pos = pos.repeat_interleave(2, -1)  # [HW, head_dim]
    return torch.cat([pos.sin(), pos.cos()], dim=-1).float()


def _apply_rot_torch(x, table):
    """timm apply_rot_embed_cat: x [B,H,P,hd], table [P, 2*hd]."""
    import torch

    sin, cos = table.tensor_split(2, -1)
    rot = torch.stack([-x[..., 1::2], x[..., ::2]], -1).reshape(x.shape)
    return x * cos + rot * sin


def _mini_eva02_sd(seed=0, post_norm=False, hid=HID):
    rng = np.random.RandomState(seed)
    r = lambda *s: (rng.randn(*s) * 0.05).astype(np.float32)
    sd = {
        "cls_token": r(1, 1, D),
        "pos_embed": r(1, GRID * GRID + 1, D),
        "patch_embed.proj.weight": r(D, 3, PATCH, PATCH),
        "patch_embed.proj.bias": r(D),
        "norm.weight": 1 + r(D),
        "norm.bias": r(D),
        "head.weight": r(OUT, D),
    }
    for i in range(LAYERS):
        p = f"blocks.{i}."
        sd.update({
            p + "norm1.weight": 1 + r(D), p + "norm1.bias": r(D),
            p + "attn.proj.weight": r(D, D), p + "attn.proj.bias": r(D),
            p + "norm2.weight": 1 + r(D), p + "norm2.bias": r(D),
        })
        if post_norm:
            # EVA02-E layout: fused qkv w/ split q/v bias, plain GELU MLP
            sd.update({
                p + "attn.qkv.weight": r(3 * D, D),
                p + "attn.q_bias": r(D), p + "attn.v_bias": r(D),
                p + "mlp.fc1.weight": r(4 * D, D), p + "mlp.fc1.bias": r(4 * D),
                p + "mlp.fc2.weight": r(D, 4 * D), p + "mlp.fc2.bias": r(D),
            })
        else:
            sd.update({
                p + "attn.q_proj.weight": r(D, D), p + "attn.q_proj.bias": r(D),
                p + "attn.k_proj.weight": r(D, D),
                p + "attn.v_proj.weight": r(D, D), p + "attn.v_proj.bias": r(D),
                p + "attn.norm.weight": 1 + r(D), p + "attn.norm.bias": r(D),
                p + "mlp.fc1_g.weight": r(hid, D), p + "mlp.fc1_g.bias": r(hid),
                p + "mlp.fc1_x.weight": r(hid, D), p + "mlp.fc1_x.bias": r(hid),
                p + "mlp.norm.weight": 1 + r(hid), p + "mlp.norm.bias": r(hid),
                p + "mlp.fc2.weight": r(D, hid), p + "mlp.fc2.bias": r(D),
            })
    return sd


def _torch_eva02_forward(sd, images, ref, post_norm=False):
    import torch
    import torch.nn.functional as F

    t = lambda k: torch.tensor(sd[k])
    ln = lambda x, p, d=D: F.layer_norm(x, (d,), t(p + ".weight"), t(p + ".bias"), eps=EPS)
    x = torch.tensor(images).permute(0, 3, 1, 2)
    x = F.conv2d(x, t("patch_embed.proj.weight"), t("patch_embed.proj.bias"), stride=PATCH)
    x = x.flatten(2).transpose(1, 2)
    b, n, _ = x.shape
    x = torch.cat([t("cls_token").expand(b, -1, -1), x], dim=1) + t("pos_embed")
    hd = D // HEADS
    rope = None if post_norm else _rope_table_torch(hd, GRID, GRID, ref)

    def attention(h, p):
        if post_norm:
            qkv = F.linear(
                h, t(p + "attn.qkv.weight"),
                torch.cat([t(p + "attn.q_bias"),
                           torch.zeros(D), t(p + "attn.v_bias")]),
            )
            q, k, v = qkv.chunk(3, dim=-1)
        else:
            q = F.linear(h, t(p + "attn.q_proj.weight"), t(p + "attn.q_proj.bias"))
            k = F.linear(h, t(p + "attn.k_proj.weight"))
            v = F.linear(h, t(p + "attn.v_proj.weight"), t(p + "attn.v_proj.bias"))
        shp = (b, n + 1, HEADS, hd)
        q, k, v = (z.view(*shp).transpose(1, 2) for z in (q, k, v))
        if rope is not None:  # CLS passes unrotated (timm eva.py forward)
            q = torch.cat([q[:, :, :1], _apply_rot_torch(q[:, :, 1:], rope)], dim=2)
            k = torch.cat([k[:, :, :1], _apply_rot_torch(k[:, :, 1:], rope)], dim=2)
        a = F.scaled_dot_product_attention(q, k, v)
        a = a.transpose(1, 2).reshape(b, n + 1, D)
        if not post_norm:
            a = ln(a, p + "attn.norm")  # sub-LN before out proj
        return F.linear(a, t(p + "attn.proj.weight"), t(p + "attn.proj.bias"))

    def mlp(h, p):
        if post_norm:
            h = F.gelu(F.linear(h, t(p + "mlp.fc1.weight"), t(p + "mlp.fc1.bias")))
            return F.linear(h, t(p + "mlp.fc2.weight"), t(p + "mlp.fc2.bias"))
        g = F.linear(h, t(p + "mlp.fc1_g.weight"), t(p + "mlp.fc1_g.bias"))
        v = F.linear(h, t(p + "mlp.fc1_x.weight"), t(p + "mlp.fc1_x.bias"))
        h = F.silu(g) * v
        h = ln(h, p + "mlp.norm", HID)
        return F.linear(h, t(p + "mlp.fc2.weight"), t(p + "mlp.fc2.bias"))

    for i in range(LAYERS):
        p = f"blocks.{i}."
        if post_norm:  # EvaBlockPostNorm: norm over sublayer output
            x = x + ln(attention(x, p), p + "norm1")
            x = x + ln(mlp(x, p), p + "norm2")
        else:
            x = x + attention(ln(x, p + "norm1"), p)
            x = x + mlp(ln(x, p + "norm2"), p)
    x = ln(x, "norm")
    return (x[:, 0] @ t("head.weight").T).numpy()


def _native_tower(post_norm, ref, scan_layers, mlp_ratio=None):
    return VisionTransformer(
        image_size=RES, patch_size=PATCH, width=D, layers=LAYERS, heads=HEADS,
        mlp_ratio=mlp_ratio or (4.0 if post_norm else 4 * 2 / 3), output_dim=OUT,
        patch_bias=True, no_ln_pre=True, pool_type="tok",
        use_rope=not post_norm, rope_ref_feat_shape=None if post_norm else ref,
        mlp_type="mlp" if post_norm else "swiglu", mlp_norm=not post_norm,
        attn_inner_norm=not post_norm, post_norm_blocks=post_norm,
        ln_eps=EPS, scan_layers=scan_layers,
    )


@pytest.mark.parametrize("scan_layers", [True, False])
@pytest.mark.parametrize(
    "post_norm,ref",
    [(False, None), (False, (8, 8)), (True, None)],
    ids=["prenorm-rope", "prenorm-rope-refshape", "postnorm-E"],
)
def test_eva02_oracle_parity(post_norm, ref, scan_layers):
    if scan_layers and (post_norm or ref is not None):
        pytest.skip("layout x scan matrix trimmed: scan covered once")
    sd = _mini_eva02_sd(post_norm=post_norm)
    images = np.random.RandomState(7).rand(2, RES, RES, 3).astype(np.float32)
    want = _torch_eva02_forward(sd, images, ref, post_norm=post_norm)

    vt = _native_tower(post_norm, ref, scan_layers)
    vis = timm_vit_to_vision_params(sd, scan_layers=scan_layers, include_head=True)
    got = np.asarray(vt.apply({"params": vis}, jnp.asarray(images)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_eva02_quansun_naming_alias():
    """Original EVA-CLIP naming (mlp.w1/w2/w3, ffn_ln, inner_attn_ln)
    converts identically to the timm naming."""
    sd = _mini_eva02_sd()
    alias = {}
    ren = {
        "mlp.fc1_g": "mlp.w1", "mlp.fc1_x": "mlp.w2", "mlp.fc2": "mlp.w3",
        "mlp.norm": "mlp.ffn_ln", "attn.norm": "attn.inner_attn_ln",
    }
    for k, v in sd.items():
        for new, old in ren.items():
            if "." in k and k.split(".", 2)[-1].startswith(new):
                k = k.replace(new, old)
                break
        alias[k] = v
    a = timm_vit_to_vision_params(sd, scan_layers=False, include_head=True)
    b = timm_vit_to_vision_params(alias, scan_layers=False, include_head=True)
    jax.tree.map(lambda x, y: np.testing.assert_array_equal(x, y), a, b)


@pytest.mark.slow
def test_eva02_configs_build_and_tags():
    from mrclip_tpu.factory import create_model
    from mrclip_tpu.pretrained import get_pretrained_cfg, list_pretrained_tags_by_model

    for name, tags in {
        "EVA02-B-16": ["merged2b_s8b_b131k"],
        "EVA02-L-14": ["merged2b_s4b_b131k"],
        "EVA02-L-14-336": ["merged2b_s6b_b61k"],
        "EVA02-E-14": ["laion2b_s4b_b115k"],
        "EVA02-E-14-plus": ["laion2b_s9b_b144k"],
    }.items():
        assert list_pretrained_tags_by_model(name) == tags, name
        assert get_pretrained_cfg(name, tags[0]).get("hf_hub")

    # smallest real config: init + forward one image
    model, variables = create_model("EVA02-B-16", rng_seed=0)
    img = jnp.zeros((1, 224, 224, 3), jnp.float32)
    toks = jnp.zeros((1, 77), jnp.int32)
    out = model.apply(variables, img, toks)
    assert out["image_features"].shape == (1, 512)
    assert out["text_features"].shape == (1, 512)
    # rope + swiglu params actually present in the tree
    blk0 = variables["params"]["visual"]["transformer"]["blocks_0"]
    assert "fc1_g" in blk0["mlp"] and "norm" in blk0["mlp"]
    assert "norm" in blk0["attn"]


def test_eva02_trunk_layout_conversion():
    """open_clip TimmModel checkpoint layout (visual.trunk.* + the linear
    visual.head.proj) routes through convert_state_dict onto the native
    tower with the head mapped to `proj`."""
    from mrclip_tpu.convert import convert_state_dict

    inner = _mini_eva02_sd()
    head = inner.pop("head.weight")
    sd = {f"visual.trunk.{k}": v for k, v in inner.items()}
    sd["visual.head.proj.weight"] = head
    sd["logit_scale"] = np.asarray(2.659, np.float32)
    params = convert_state_dict(sd, scan_layers=False)
    assert params["visual"]["proj"].shape == (D, OUT)
    blk = params["visual"]["transformer"]["blocks_0"]
    assert sorted(blk["mlp"].keys()) == ["fc1_g", "fc1_x", "fc2", "norm"]
    assert "norm" in blk["attn"]
    # the converted tree forwards through the native tower
    vt = _native_tower(post_norm=False, ref=None, scan_layers=False)
    images = np.random.RandomState(5).rand(1, RES, RES, 3).astype(np.float32)
    inner["head.weight"] = head
    want = _torch_eva02_forward(inner, images, None)
    got = np.asarray(vt.apply({"params": params["visual"]}, jnp.asarray(images)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device CPU mesh")
@pytest.mark.slow
def test_eva02_swiglu_tp_sharded_and_steps():
    """TP rules cover the SwiGLU naming: fc1_g/fc1_x shard column-parallel,
    fc2 row-parallel, and a grad step over dp2 x fsdp2 x tp2 matches the
    single-device gradient."""
    from mrclip_tpu.parallel import create_mesh
    from mrclip_tpu.parallel.mesh import shard_params

    # hidden must divide tp=2 (the real towers' 2048/2730/15360 all do;
    # the default mini's int(32*8/3)=85 does not)
    vt = _native_tower(post_norm=False, ref=None, scan_layers=False, mlp_ratio=2.0)
    sd = _mini_eva02_sd(hid=64)
    vis = timm_vit_to_vision_params(sd, scan_layers=False, include_head=True)
    images = np.random.RandomState(11).rand(8, RES, RES, 3).astype(np.float32)

    def loss_fn(params, imgs):
        out = vt.apply({"params": params}, imgs)
        return jnp.sum(out ** 2)

    want = jax.grad(loss_fn)(vis, jnp.asarray(images))

    mesh = create_mesh(dp=2, fsdp=2, tp=2)
    shardings = shard_params(vis, mesh)
    blk = shardings["transformer"]["blocks_0"]
    assert blk["mlp"]["fc1_g"]["kernel"].spec[-1] == "model"
    assert blk["mlp"]["fc1_x"]["kernel"].spec[-1] == "model"
    assert blk["mlp"]["fc2"]["kernel"].spec[0] == "model"
    params_s = jax.tree.map(
        lambda x, s: jax.device_put(x, s), vis, shardings
    )
    got = jax.jit(jax.grad(loss_fn))(params_s, jnp.asarray(images))
    err = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), want, got
    )
    assert max(jax.tree.leaves(err)) < 1e-4


@pytest.mark.parametrize("post_norm", [False, True], ids=["prenorm", "postnorm-E"])
def test_eva02_hub_export_round_trip(post_norm):
    """import -> hub export reproduces the timm trunk state dict exactly
    (the zero k-bias segment the importer synthesizes is dropped back out)."""
    from mrclip_tpu.hub import export_torch_state_dict

    sd = _mini_eva02_sd(post_norm=post_norm)
    head = sd.pop("head.weight")
    vis = timm_vit_to_vision_params(sd, scan_layers=False)
    vis["proj"] = jnp.asarray(head.T)
    out = export_torch_state_dict(
        {"visual": vis},
        vision_layout="timm_eva02_postnorm" if post_norm else "auto",
    )
    want = {f"visual.trunk.{k}": v for k, v in sd.items()}
    want["visual.head.proj.weight"] = head
    assert sorted(out) == sorted(want), set(out) ^ set(want)
    for k in want:
        np.testing.assert_array_equal(out[k], want[k], err_msg=k)


def test_eva02_rope_patch_dropout_rejected():
    vt = VisionTransformer(
        image_size=RES, patch_size=PATCH, width=D, layers=1, heads=HEADS,
        output_dim=OUT, patch_bias=True, no_ln_pre=True, pool_type="tok",
        use_rope=True, mlp_type="swiglu", patch_dropout=0.5, scan_layers=False,
    )
    with pytest.raises(NotImplementedError, match="patch_dropout"):
        vt.init(jax.random.key(0), jnp.zeros((1, RES, RES, 3)))


def test_rope_compute_dtype_bf16_close_and_prefix_identity():
    """`apply_rope_cat(compute_dtype=bf16)` (attn-impl bf16 throughput mode,
    commit 8560a3a) must stay within bf16 rounding of the fp32 rotation, and
    the identity-prefix (CLS) rows must pass through bit-unchanged."""
    from mrclip_tpu.models.layers import apply_rope_cat
    from mrclip_tpu.ops.pos_embed import rope_cat_2d

    hd = 16
    rope = rope_cat_2d(hd, GRID, GRID)  # [HW, 2*hd]
    x = jax.random.normal(jax.random.key(0), (2, GRID * GRID + 1, HEADS, hd))
    x_bf = x.astype(jnp.bfloat16)

    ref = apply_rope_cat(x, rope, prefix=1)  # fp32 rotation
    got = apply_rope_cat(x_bf, rope, prefix=1, compute_dtype=jnp.bfloat16)
    assert got.dtype == jnp.bfloat16
    # elementwise-relative error blows up where cos/sin terms cancel to ~0;
    # bound the error against the tensor scale instead (bf16 eps = 2^-8)
    err = np.abs(got.astype(np.float32) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).max()
    assert err.max() < 0.02 * scale, (err.max(), scale)
    # CLS row: sin=0 / cos=1 pad rows are exact in bf16 -> bit passthrough
    np.testing.assert_array_equal(np.asarray(got[:, 0]), np.asarray(x_bf[:, 0]))


def test_eva02_attn_bf16_tower_matches_xla():
    """EVA02 tower under attn_impl='bf16' (bf16 scores + bf16 rope rotation)
    must track the xla impl at tower level: embedding cosine > 0.999."""
    import dataclasses

    sd = _mini_eva02_sd()
    images = np.random.RandomState(11).rand(2, RES, RES, 3).astype(np.float32)
    vis = timm_vit_to_vision_params(sd, scan_layers=False, include_head=True)
    outs = {}
    for impl in ("xla", "bf16"):
        vt = dataclasses.replace(
            _native_tower(False, None, False), attn_impl=impl, dtype=jnp.bfloat16
        )
        out = np.asarray(
            vt.apply({"params": vis}, jnp.asarray(images)), dtype=np.float32
        )
        outs[impl] = out / np.linalg.norm(out, axis=-1, keepdims=True)
    cos = (outs["xla"] * outs["bf16"]).sum(-1)
    assert cos.min() > 0.999, cos


@pytest.mark.parametrize("scan_layers", [False, True])
def test_swiglu_fused_gate_matches_split(scan_layers):
    """`mlp_fused_gate=True` (one [D, 2H] gate||value param, bench
    --swiglu-fused) == the split fc1_g/fc1_x layout with the SAME weights:
    `fuse_swiglu_params` concatenates the split tree (incl. scan-stacked
    [L, D, H] kernels) into the fused tree and the forward is identical —
    each output column of x @ (Wg||Wv) is the same dot product. Grads
    stay finite through the fused param."""
    from mrclip_tpu.models.layers import fuse_swiglu_params, split_swiglu_params

    imgs = jnp.asarray(np.random.RandomState(5).rand(2, RES, RES, 3), jnp.float32)
    kw = dict(
        image_size=RES, patch_size=PATCH, width=D, layers=LAYERS, heads=HEADS,
        mlp_ratio=4 * 2 / 3, output_dim=OUT, patch_bias=True, no_ln_pre=True,
        pool_type="tok", use_rope=True, rope_ref_feat_shape=(8, 8),
        mlp_type="swiglu", mlp_norm=True, attn_inner_norm=True, ln_eps=EPS,
        scan_layers=scan_layers,
    )
    vt_split = VisionTransformer(**kw)
    vt_fused = VisionTransformer(mlp_fused_gate=True, **kw)
    params = vt_split.init(jax.random.PRNGKey(0), imgs)["params"]
    fused = fuse_swiglu_params(params)

    out_split = vt_split.apply({"params": params}, imgs)
    out_fused = vt_fused.apply({"params": fused}, imgs)
    assert float(jnp.abs(out_split - out_fused).max()) < 1e-5

    # round-trip: split(fuse(params)) == params exactly
    back = split_swiglu_params(fused)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        assert a.shape == b.shape and bool(jnp.all(a == b))

    g = jax.grad(lambda p: (vt_fused.apply({"params": p}, imgs) ** 2).sum())(fused)
    assert all(bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(g))
