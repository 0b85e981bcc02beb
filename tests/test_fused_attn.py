"""Single-tile fused attention (ops/fused_attn.py): numerics vs XLA.

The kernel keeps the whole padded sequence in VMEM per program — no
[B, H, N, N] score tensor ever reaches HBM (the r3 trace's 42.6%
memory-bound attention share) — with a custom VJP whose residuals are only
(q, k, v, o, lse). These tests pin fwd + grad equality with
`jax.nn.dot_product_attention` across the shapes the towers use (ViT 197,
text 98 causal, CoCa cross 76->255, head-group remainders) and through the
full MultiHeadAttention layer. Runs in Pallas interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrclip_tpu.ops.fused_attn import fused_attention, fused_attention_packed


@pytest.mark.parametrize("fn", [fused_attention, fused_attention_packed])
@pytest.mark.parametrize(
    "b,n,nk,h,causal",
    [
        (2, 197, 197, 4, False),   # ViT-B/16 sequence
        (2, 98, 98, 4, True),      # text tower, causal
        (1, 76, 255, 2, False),    # CoCa decoder cross-attention lengths
        (3, 257, 257, 2, False),   # ViT-L/14 (pads to 384, g=bh fallback)
        (1, 64, 64, 5, True),      # bh=5: indivisible head groups
    ],
)
def test_matches_xla_attention(b, n, nk, h, causal, fn):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, n, h, 64), jnp.float32)
    k = jnp.asarray(rng.randn(b, nk, h, 64), jnp.float32)
    v = jnp.asarray(rng.randn(b, nk, h, 64), jnp.float32)
    ref = jax.nn.dot_product_attention(q, k, v, is_causal=causal)
    out = fn(q, k, v, is_causal=causal, interpret=True)
    assert float(jnp.abs(out - ref).max()) < 1e-4


def test_pick_group_blocks_are_mosaic_legal():
    """Every group size must be a multiple of 8 or bh itself: the 2-D
    [bh, Np_q] lse output's block is (g, Np_q), and Mosaic rejects a 2-D
    block whose second-to-last dim is neither divisible by 8 nor equal to
    the array dim. bh=12 (batch-1 trace of a 12-head tower) used to pick
    g=4 and fail TPU lowering with "block shape (4, 256), array shape
    (12, 256)" (r4 queue10 log)."""
    from mrclip_tpu.ops.fused_attn import _pick_group

    for bh in (1, 5, 6, 12, 24, 88 * 12, 30, 256, 1056):
        for np_q, np_k in ((256, 256), (384, 384), (128, 256)):
            g = _pick_group(bh, np_q, np_k, 2 * 1024 * 1024)
            assert bh % g == 0, (bh, g)
            assert g % 8 == 0 or g == bh, (bh, g)


@pytest.mark.parametrize("n,causal", [(197, False), (98, True)])
@pytest.mark.slow
def test_grads_match_xla_attention(n, causal):
    rng = np.random.RandomState(1)
    q, k, v = (jnp.asarray(rng.randn(2, n, 2, 64), jnp.float32) for _ in range(3))
    w = jnp.asarray(rng.randn(64), jnp.float32)

    def loss(fn, q, k, v):
        return (fn(q, k, v) * w).sum()

    for impl in (fused_attention, fused_attention_packed):
        g_new = jax.grad(
            lambda *a: loss(
                lambda q, k, v: impl(q, k, v, is_causal=causal, interpret=True),
                *a,
            ),
            argnums=(0, 1, 2),
        )(q, k, v)
        _check_grads(g_new, q, k, v, causal, loss)


def _check_grads(g_new, q, k, v, causal, loss):
    g_ref = jax.grad(
        lambda *a: loss(
            lambda q, k, v: jax.nn.dot_product_attention(q, k, v, is_causal=causal),
            *a,
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(g_new, g_ref):
        assert float(jnp.abs(a - b).max()) < 1e-4


def test_bf16_inputs_match_bf16_impl():
    """bf16 compute dtype (the bench config): fused kernel vs the attn-bf16
    XLA path agree to bf16 resolution."""
    rng = np.random.RandomState(2)
    q, k, v = (
        jnp.asarray(rng.randn(2, 197, 4, 64), jnp.float32).astype(jnp.bfloat16)
        for _ in range(3)
    )
    ref = jax.nn.dot_product_attention(q, k, v)  # fp32 internally, bf16 out
    out = fused_attention(q, k, v, interpret=True)
    assert float(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)).max()) < 2e-2


@pytest.mark.slow
def test_scan_stack_and_remat():
    """fusedp inside an nn.scan-stacked tower (deep-model path) matches xla,
    and grads stay finite under jax.checkpoint-over-custom-vjp."""
    from mrclip_tpu.factory import create_model

    imgs = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    toks = np.random.RandomState(1).randint(1, 100, (2, 32), dtype=np.int32)
    feats = {}
    for impl in ("xla", "fusedp"):
        model, variables = create_model("ViT-B-32-mini", attn_impl=impl, scan_layers=True)
        out = model.apply(variables, jnp.asarray(imgs), jnp.asarray(toks))
        feats[impl] = out["image_features"]
    assert float(jnp.abs(feats["xla"] - feats["fusedp"]).max()) < 1e-4

    model, variables = create_model(
        "ViT-B-32-mini", attn_impl="fusedp", scan_layers=True, grad_checkpointing=True
    )

    def loss(p):
        o = model.apply({**variables, "params": p}, jnp.asarray(imgs), jnp.asarray(toks))
        return (o["image_features"] ** 2).sum()

    g = jax.grad(loss)(variables["params"])
    assert all(bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(g))


@pytest.mark.slow
def test_multi_device_mesh_rejects_fused(tmp_path):
    """pallas_call is GSPMD-opaque: the train CLI must fail loudly, not with
    a deep partitioner error, when --attn-impl fused meets a device mesh
    (conftest forces 8 virtual devices)."""
    from mrclip_tpu.train.main import main as train_main

    with pytest.raises(ValueError, match="single-device Pallas"):
        train_main([
            "--dataset-type", "synthetic", "--train-num-samples", "16",
            "--batch-size", "8", "--epochs", "1", "--model", "ViT-B-32-mini",
            "--attn-impl", "fused", "--logs", str(tmp_path), "--name", "guard",
        ])


@pytest.mark.slow
def test_full_model_forward_matches_xla():
    """CLIP forward with attn_impl='fused' == attn_impl='xla'.

    interpret auto-selects on the CPU backend (fused_attention interpret=None).
    """
    from mrclip_tpu.factory import create_model

    imgs = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    toks = np.random.RandomState(1).randint(1, 100, (2, 32), dtype=np.int32)

    feats = {}
    for impl in ("xla", "fused"):
        model, variables = create_model("ViT-B-32-mini", attn_impl=impl)
        out = model.apply(variables, jnp.asarray(imgs), jnp.asarray(toks))
        feats[impl] = out["image_features"], out["text_features"]
    for a, b in zip(feats["xla"], feats["fused"]):
        assert float(jnp.abs(a - b).max()) < 1e-4


def test_fusedp_eva02_tower_matches_xla():
    """fusedp under the EVA02 block recipe (axial 2D rope on q/k, sub-LN
    inside attention, SwiGLU MLP) == xla attention. Under fusedp the rope
    rotation happens INSIDE the kernel (identity-prefix sin||cos table
    operand, q/k rotate in VMEM) while the xla path rotates out-of-kernel
    via apply_rope_cat — this pins the end-to-end composition the EVA02
    bench configs run (`bench.py --model EVA02-B-16 --attn-impl fusedp`)."""
    from mrclip_tpu.models.vision import VisionTransformer

    feats = {}
    imgs = jnp.asarray(np.random.RandomState(3).rand(2, 16, 16, 3), jnp.float32)
    for impl in ("xla", "fusedp"):
        vt = VisionTransformer(
            image_size=16, patch_size=4, width=32, layers=2, heads=2,
            mlp_ratio=4 * 2 / 3, output_dim=24, patch_bias=True,
            no_ln_pre=True, pool_type="tok", use_rope=True,
            rope_ref_feat_shape=(8, 8), mlp_type="swiglu", mlp_norm=True,
            attn_inner_norm=True, ln_eps=1e-6, attn_impl=impl,
        )
        variables = vt.init(jax.random.PRNGKey(0), imgs)
        feats[impl] = vt.apply(variables, imgs)
    assert float(jnp.abs(feats["xla"] - feats["fusedp"]).max()) < 1e-4


@pytest.mark.parametrize("prefix", [0, 1])
def test_rope_in_kernel_matches_out_of_kernel(prefix):
    """`fused_attention_packed(rope=tab)` (rotation in VMEM via the constant
    pair-swap matmul, gradients un-rotated inside the bwd kernel) == rotating
    q/k with `apply_rope_cat` first and calling the plain kernel — fwd AND
    (dq, dk, dv). The rotation is linear with 0/±1 matrix entries, so fp32
    agreement should be near-exact."""
    from mrclip_tpu.models.layers import apply_rope_cat

    b, n, h, d = 2, 19, 3, 8
    rng = np.random.RandomState(11)
    q, k, v = (jnp.asarray(rng.randn(b, n, h, d), jnp.float32) for _ in range(3))
    tab = jnp.asarray(rng.uniform(-1, 1, (n - prefix, 2 * d)), jnp.float32)
    w = jnp.asarray(rng.randn(d), jnp.float32)

    def loss_in(q, k, v):
        o = fused_attention_packed(
            q, k, v, rope=tab, rope_prefix=prefix, interpret=True
        )
        return (o * w).sum()

    def loss_out(q, k, v):
        qr = apply_rope_cat(q, tab, prefix)
        kr = apply_rope_cat(k, tab, prefix)
        return (fused_attention_packed(qr, kr, v, interpret=True) * w).sum()

    got = jax.value_and_grad(loss_in, argnums=(0, 1, 2))(q, k, v)
    want = jax.value_and_grad(loss_out, argnums=(0, 1, 2))(q, k, v)
    assert abs(float(got[0]) - float(want[0])) < 1e-3
    for a, b_ in zip(got[1], want[1]):
        assert float(jnp.abs(a - b_).max()) < 1e-4


@pytest.mark.slow
def test_rope_in_kernel_sharded_matches_unsharded():
    """rope-in-kernel under a dp2 x tp2 mesh == unsharded XLA attention with
    out-of-kernel rotation: the rope-variant custom_partitioning rules add a
    replicated table operand; per-shard lowering must slice batch/heads but
    see the full table."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mrclip_tpu.models.layers import apply_rope_cat
    from mrclip_tpu.parallel import create_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    mesh = create_mesh(dp=2, tp=2, fsdp=1, devices=jax.devices()[:4])

    b, n, h, d = 4, 17, 4, 16
    rng = np.random.RandomState(13)
    q, k, v = (jnp.asarray(rng.randn(b, n, h, d), jnp.float32) for _ in range(3))
    tab = jnp.asarray(rng.uniform(-1, 1, (n - 1, 2 * d)), jnp.float32)
    w = jnp.asarray(rng.randn(d), jnp.float32)

    def loss(q, k, v):
        o = fused_attention_packed(q, k, v, rope=tab, interpret=True)
        return (o * w).sum()

    sh = NamedSharding(mesh, P("data", None, "model", None))
    got = jax.jit(
        jax.value_and_grad(loss, argnums=(0, 1, 2)), in_shardings=(sh, sh, sh)
    )(q, k, v)

    def ref_loss(q, k, v):
        qr = apply_rope_cat(q, tab, 1)
        kr = apply_rope_cat(k, tab, 1)
        return (jax.nn.dot_product_attention(qr, kr, v) * w).sum()

    ref = jax.value_and_grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    assert abs(float(got[0]) - float(ref[0])) < 1e-2 * max(1.0, abs(float(ref[0])))
    for a, b_ in zip(got[1], ref[1]):
        assert float(jnp.abs(a - b_).max()) < 1e-4


@pytest.mark.slow
def test_fusedp_sharded_matches_unsharded():
    """fusedp under a dp2 x tp2 GSPMD mesh == unsharded XLA attention, for
    both the forward value and (dq, dk, dv): the custom_partitioning rules
    run the kernel per shard with the local batch slice and local head slab
    (batch over 'data', heads over 'model'), so no collective should touch
    the math. Grad covers the bwd kernel's own partitioning rule."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mrclip_tpu.parallel import create_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    mesh = create_mesh(dp=2, tp=2, fsdp=1, devices=jax.devices()[:4])

    b, n, h, d = 4, 33, 4, 32
    rng = np.random.RandomState(7)
    q, k, v = (jnp.asarray(rng.randn(b, n, h, d), jnp.float32) for _ in range(3))
    w = jnp.asarray(rng.randn(d), jnp.float32)

    def loss(q, k, v):
        return (fused_attention_packed(q, k, v, interpret=True) * w).sum()

    sh = NamedSharding(mesh, P("data", None, "model", None))
    val_and_grads = jax.jit(
        jax.value_and_grad(loss, argnums=(0, 1, 2)), in_shardings=(sh, sh, sh)
    )(q, k, v)

    def ref_loss(q, k, v):
        return (jax.nn.dot_product_attention(q, k, v) * w).sum()

    ref = jax.value_and_grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    assert abs(float(val_and_grads[0]) - float(ref[0])) < 1e-2 * abs(float(ref[0]))
    for got, want in zip(val_and_grads[1], ref[1]):
        assert float(jnp.abs(got - want).max()) < 1e-4


@pytest.mark.parametrize("rope_prefix", [None, 1])
def test_batched_head_mode_matches_loop(monkeypatch, rope_prefix):
    """MRCLIP_FUSEDP_HEADS=batched (one H-batched dot_general per stage,
    heads relayouted [N, H*D] -> [H, N, D] in VMEM; the r4 default) ==
    MRCLIP_FUSEDP_HEADS=loop (per-head python loop), fwd AND grads, with
    and without rope-in-kernel. The loop bwd kernel traces at ~16% MXU /
    ~30% BW (bound by neither roofline — serialization); batched lets the
    scheduler pipeline the head matmuls (on-chip: 950 vs 896 pairs/s)."""
    b, n, h, d = 2, 21, 4, 8
    rng = np.random.RandomState(17)
    q, k, v = (jnp.asarray(rng.randn(b, n, h, d), jnp.float32) for _ in range(3))
    tab = (jnp.asarray(rng.uniform(-1, 1, (n - 1, 2 * d)), jnp.float32)
           if rope_prefix else None)
    w = jnp.asarray(rng.randn(d), jnp.float32)

    def loss(q, k, v):
        o = fused_attention_packed(
            q, k, v, rope=tab, rope_prefix=rope_prefix or 1, interpret=True
        )
        return (o * w).sum()

    monkeypatch.setenv("MRCLIP_FUSEDP_HEADS", "loop")
    want = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
    monkeypatch.setenv("MRCLIP_FUSEDP_HEADS", "batched")
    got = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert abs(float(got[0]) - float(want[0])) < 1e-3
    for a, b_ in zip(got[1], want[1]):
        assert float(jnp.abs(a - b_).max()) < 1e-4


@pytest.mark.parametrize("head_mode", ["batched", "loop"])
@pytest.mark.parametrize("rope_prefix", [0, 1])
def test_delta_pre_mode_matches_in_kernel(monkeypatch, head_mode, rope_prefix):
    """MRCLIP_FUSEDP_DELTA=pre (delta = rowsum(do*o) precomputed outside the
    bwd kernel, which then drops its o operand — r5) == 'kernel' (r4
    behavior: o is a kernel operand, delta reduced in-VMEM). Exact same
    math, different producer; grads must match to fp tolerance in both
    head modes, with and without rope-in-kernel."""
    b, n, h, d = 2, 21, 4, 8
    rng = np.random.RandomState(23)
    q, k, v = (jnp.asarray(rng.randn(b, n, h, d), jnp.float32) for _ in range(3))
    tab = (jnp.asarray(rng.uniform(-1, 1, (n - 1, 2 * d)), jnp.float32)
           if rope_prefix else None)
    w = jnp.asarray(rng.randn(d), jnp.float32)
    monkeypatch.setenv("MRCLIP_FUSEDP_HEADS", head_mode)

    def loss(q, k, v):
        o = fused_attention_packed(
            q, k, v, rope=tab, rope_prefix=rope_prefix or 1, interpret=True
        )
        return (o * w).sum()

    monkeypatch.setenv("MRCLIP_FUSEDP_DELTA", "kernel")
    want = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
    monkeypatch.setenv("MRCLIP_FUSEDP_DELTA", "pre")
    got = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert abs(float(got[0]) - float(want[0])) < 1e-3
    for a, b_ in zip(got[1], want[1]):
        assert float(jnp.abs(a - b_).max()) < 1e-4
