"""MobileCLIP image towers, TPU-native NHWC: FastViT/MCi (S1/S2) and the
conv-stem hybrid ViT (B).

Covers the reference's MobileCLIP pretrained-registry tags
(`src/open_clip/pretrained.py:545-552`) and the tower families its
`convert.py:152-199` expects (timm `fastvit_mci*` for S1/S2,
`vision_transformer_hybrid` for B). The reference itself cannot build these
(no config JSON ships; timm modules required at runtime).

Architecture follows the MobileCLIP paper (Vasu et al., CVPR 2024) and
FastViT (ICCV 2023), in the REPARAMETERIZED (deploy) form throughout:

  stem     two stride-2 conv3x3+GELU blocks                   (1/4 res)
  stage i  RepMixer blocks (i<3) / self-attention blocks (i=3),
           separated by dw7x7/s2 + pw1x1 patch-embed downsamples
           (final features at 1/32 res)
  head     1x1 conv expand -> GELU -> global average pool -> linear proj

A RepMixer block (deploy form) is
  token mix:  x + per-channel-scaled dw3x3(x)
  ConvFFN:    x + pw( GELU( pw( LN( dw7x7(x) ) ) ) )      (ratio 3)
and the attention stage prepends a dw7x7 conditional position embedding
(RepCPE) and uses pre-LN MHSA over the flattened 1/32 tokens.

TPU rationale for building the deploy form: MobileOne/RepMixer train-time
overparameterization (parallel conv+BN branches, reparameterized away for
inference) is a GPU-era trick to add capacity without inference cost; on
TPU the extra branches are pure HBM traffic, every released checkpoint is
consumed through timm's `checkpoint_filter_fn` which fuses them anyway, and
the fused form is what serving runs. BatchNorm is replaced by LayerNorm
(fp32-stats, shared impl) — no running stats to synchronize across a mesh.

PROVENANCE: zero-egress environment — no timm source/checkpoints. The
stage tables are PARAM-ANCHORED (r5): the native towers reproduce Apple's
published visual parameter counts (MCi1 21.4M vs 21.5M, MCi2 35.7M exact,
B 89.1M vs 86.3M — tests/test_mobileclip.py). Released Apple checkpoints
import via `convert.convert_mobile_clip_state_dict` (r5): reparam branches
fuse into the deploy-import form of these towers (norm='affine' +
stem='3conv' + _AttnBlock; torch-oracle-tested fusion math,
tests/test_mobileclip_import.py). Shapes, training, remat, and mesh
sharding are natively tested (tests/test_mobileclip.py).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import DepthwiseConv, LayerNorm, gelu_exact
from .transformer import Transformer

Dtype = Any

# (stage depths, stage dims, mlp_ratio)
FASTVIT_DIMS = {
    "fastvit_mci0": ((2, 6, 10, 2), (64, 128, 256, 512), 3.0),
    "fastvit_mci1": ((4, 12, 20, 4), (64, 128, 256, 512), 3.0),
    "fastvit_mci2": ((4, 12, 24, 4), (80, 160, 320, 640), 3.0),
}


class ChannelAffine(nn.Module):
    """Per-channel y = x*scale + bias — a folded inference-mode BatchNorm.

    Released MobileCLIP/FastViT weights carry conv+BN pairs; at inference
    BN(x) = x*(gamma/sigma) + (beta - mu*gamma/sigma) is exactly this
    affine. The param tree (scale, bias) matches `LayerNorm`, so converted
    checkpoints overlay onto the same tree positions; only the *behavior*
    switches (no per-sample normalization). Used by the `norm='affine'`
    deploy-import mode of the towers below."""

    epsilon: float = 1e-6  # unused; field kept so call sites can be uniform

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


def _norm(kind: str):
    return {"ln": LayerNorm, "affine": ChannelAffine}[kind]


class _ConvFFN(nn.Module):
    """dw7x7 -> LN -> 1x1 expand -> GELU -> 1x1 project, residual added by
    the caller."""

    dim: int
    mlp_ratio: float = 3.0
    act: Callable[[jax.Array], jax.Array] = gelu_exact
    norm: str = "ln"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = DepthwiseConv(self.dim, 7, dtype=self.dtype, name="conv_dw")(x)
        x = _norm(self.norm)(epsilon=1e-6, name="norm")(x)
        x = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)


class RepMixerBlock(nn.Module):
    """Deploy-form RepMixer: scaled dw3x3 token mix + ConvFFN, both residual."""

    dim: int
    mlp_ratio: float = 3.0
    act: Callable[[jax.Array], jax.Array] = gelu_exact
    norm: str = "ln"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        mix = DepthwiseConv(self.dim, 3, dtype=self.dtype, name="mixer_dw")(x)
        scale = self.param("mixer_scale", nn.initializers.ones,
                           (self.dim,), jnp.float32)
        x = x + mix * scale.astype(x.dtype)
        return x + _ConvFFN(self.dim, self.mlp_ratio, self.act, self.norm,
                            self.dtype, name="ffn")(x)


class _AttnBlock(nn.Module):
    """Deploy-import form of the FastViT attention-stage block: folded-BN
    affine norm -> MHSA -> residual, then ConvFFN -> residual. Per-branch
    layer scales from released checkpoints fold into out_proj / fc2 at
    conversion time (exact: a per-output-channel scale commutes with the
    preceding linear). The from-scratch ('ln') towers use the shared
    `Transformer` stage instead; this block exists so Apple conv+BN
    weights convert structurally 1:1 (their ffn keeps its dw7x7)."""

    dim: int
    heads: int
    mlp_ratio: float = 3.0
    act: Callable[[jax.Array], jax.Array] = gelu_exact
    attn_impl: str = "xla"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        from .layers import MultiHeadAttention

        b, h, w, c = x.shape
        t = ChannelAffine(name="norm")(x).reshape(b, h * w, c)
        t = MultiHeadAttention(
            num_heads=self.heads, attn_impl=self.attn_impl,
            dtype=self.dtype, name="attn",
        )(t)
        x = x + t.reshape(b, h, w, c)
        return x + _ConvFFN(self.dim, self.mlp_ratio, self.act, "affine",
                            self.dtype, name="ffn")(x)


class _PatchDownsample(nn.Module):
    """dw7x7/s2 -> pw1x1 into the next stage width (deploy form)."""

    in_dim: int
    out_dim: int
    norm: str = "ln"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(self.in_dim, (7, 7), strides=(2, 2), padding=3,
                    feature_group_count=self.in_dim, dtype=self.dtype,
                    name="conv_dw")(x)
        x = _norm(self.norm)(epsilon=1e-6, name="norm")(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="conv_pw")(x)


class FastViT(nn.Module):
    """MCi image encoder (MobileCLIP S1/S2): pooled embedding out."""

    image_size: int = 256
    depths: Sequence[int] = (4, 12, 20, 4)
    dims: Sequence[int] = (64, 128, 256, 512)
    mlp_ratio: float = 3.0
    output_dim: Optional[int] = 512
    head_expand: float = 2.0
    act: Callable[[jax.Array], jax.Array] = gelu_exact
    attn_impl: str = "xla"
    output_tokens: bool = False
    scan_layers: bool = True  # applies to the attention stage
    remat: bool = False
    remat_policy: str = "dots"
    # 'ln' (default, from-scratch TPU training) or 'affine' (deploy-import
    # mode: every conv-side norm position becomes a folded-BN per-channel
    # affine so released conv+BN weights convert exactly; see ChannelAffine
    # and convert.convert_mobile_clip_state_dict). The attention stage's
    # Transformer keeps LayerNorm in both modes.
    norm: str = "ln"
    # '2conv' (default) or '3conv' (deploy-import: conv3x3/s2, dw3x3/s2,
    # pw1x1 — the MobileOne stem layout released checkpoints fuse into).
    stem: str = "2conv"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True):
        if self.image_size % 32:
            raise ValueError(f"image_size {self.image_size} not divisible by 32")
        c = self.dims

        # stem to 1/4
        if self.stem == "3conv":
            x = nn.Conv(c[0], (3, 3), strides=(2, 2), padding=1,
                        dtype=self.dtype, name="stem_conv1")(x)
            x = self.act(x)
            x = nn.Conv(c[0], (3, 3), strides=(2, 2), padding=1,
                        feature_group_count=c[0], dtype=self.dtype,
                        name="stem_conv2")(x)
            x = self.act(x)
            x = nn.Conv(c[0], (1, 1), dtype=self.dtype, name="stem_conv3")(x)
            x = self.act(x)
        else:
            x = nn.Conv(c[0], (3, 3), strides=(2, 2), padding=1,
                        dtype=self.dtype, name="stem_conv1")(x)
            x = self.act(x)
            x = nn.Conv(c[0], (3, 3), strides=(2, 2), padding=1,
                        feature_group_count=1, dtype=self.dtype,
                        name="stem_conv2")(x)
            x = self.act(x)

        block = RepMixerBlock
        if self.remat:
            block = nn.remat(block, prevent_cse=False, static_argnums=(2,))
        for s in range(3):
            if s > 0:
                x = _PatchDownsample(c[s - 1], c[s], self.norm,
                                     dtype=self.dtype,
                                     name=f"downsample{s}")(x)
            for i in range(self.depths[s]):
                x = block(c[s], self.mlp_ratio, self.act, self.norm,
                          self.dtype, name=f"stage{s}_block{i}")(x, deterministic)

        # attention stage at 1/32
        x = _PatchDownsample(c[2], c[3], self.norm, dtype=self.dtype,
                             name="downsample3")(x)
        cpe = DepthwiseConv(c[3], 7, dtype=self.dtype, name="pos_emb_dw")(x)
        x = x + cpe  # RepCPE: convolutional (translation-equivariant) positions
        b, h, w, _ = x.shape
        if self.norm == "affine":
            # deploy-import form: BN-affine + MHSA + ConvFFN blocks, the
            # structure released FastViT checkpoints actually carry (their
            # ffn keeps a dw7x7; the shared LN Transformer cannot host it).
            ablock = _AttnBlock
            if self.remat:
                ablock = nn.remat(ablock, prevent_cse=False, static_argnums=(2,))
            for i in range(self.depths[3]):
                x = ablock(c[3], max(1, c[3] // 64), self.mlp_ratio, self.act,
                           self.attn_impl, self.dtype,
                           name=f"stage3_block{i}")(x, deterministic)
        else:
            t = x.reshape(b, h * w, c[3])
            t = Transformer(
                width=c[3],
                layers=self.depths[3],
                heads=max(1, c[3] // 64),
                mlp_ratio=self.mlp_ratio,
                act=self.act,
                attn_impl=self.attn_impl,
                ln_eps=1e-6,
                scan_layers=self.scan_layers,
                remat=self.remat,
                remat_policy=self.remat_policy,
                dtype=self.dtype,
                name="transformer",
            )(t, deterministic=deterministic)
            x = t.reshape(b, h, w, c[3])

        # head: expand -> GELU -> GAP -> proj. From-scratch mode expands via
        # a 1x1 Dense; deploy-import mode ('affine') uses the released
        # checkpoints' 3x3 grouped conv_exp (a fused MobileOneBlock) and a
        # biased projection so weights convert exactly.
        if self.norm == "affine":
            x = nn.Conv(int(c[3] * self.head_expand), (3, 3), padding=1,
                        feature_group_count=c[3], dtype=self.dtype,
                        name="head_conv")(x)
        else:
            x = nn.Dense(int(c[3] * self.head_expand), dtype=self.dtype,
                         name="head_conv")(x)
        x = self.act(x)
        tokens = x.reshape(b, h * w, -1)
        pooled = tokens.mean(axis=1)
        pooled = _norm(self.norm)(epsilon=1e-6, name="head_norm")(pooled)
        if self.output_dim is not None:
            proj = self.param(
                "proj",
                nn.initializers.normal(stddev=pooled.shape[-1] ** -0.5),
                (pooled.shape[-1], self.output_dim),
                jnp.float32,
            )
            pooled = pooled @ proj.astype(pooled.dtype)
            if self.norm == "affine":
                pb = self.param("proj_bias", nn.initializers.zeros,
                                (self.output_dim,), jnp.float32)
                pooled = pooled + pb.astype(pooled.dtype)
        if self.output_tokens:
            return pooled, tokens
        return pooled


class HybridViT(nn.Module):
    """MobileCLIP-B image tower: a 4-layer stride-2 conv stem (1/16 patchify)
    feeding a standard pre-LN ViT with CLS pooling (timm
    vision_transformer_hybrid layout; reference convert.py:197-199)."""

    image_size: int = 224
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_ratio: float = 4.0
    stem_dims: Sequence[int] = (96, 192, 384, 768)
    output_dim: Optional[int] = 512
    act: Callable[[jax.Array], jax.Array] = gelu_exact
    attn_impl: str = "xla"
    output_tokens: bool = False
    scan_layers: bool = True
    remat: bool = False
    remat_policy: str = "dots"
    # 'ln' (default) or 'affine' (deploy-import mode: the conv-stem norms
    # host folded inference-mode BN; the ViT blocks are genuinely LN-based
    # in the released model, so the import is exact for this tower).
    norm: str = "ln"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True):
        if self.image_size % 16:
            raise ValueError(f"image_size {self.image_size} not divisible by 16")
        for i, dim in enumerate(self.stem_dims):
            x = nn.Conv(dim, (3, 3), strides=(2, 2), padding=1,
                        dtype=self.dtype, name=f"patch_emb_conv{i}")(x)
            x = _norm(self.norm)(epsilon=1e-6, name=f"patch_emb_norm{i}")(x)
            if i + 1 < len(self.stem_dims):
                x = self.act(x)
        b, h, w, _ = x.shape
        x = x.reshape(b, h * w, self.stem_dims[-1])
        if self.stem_dims[-1] != self.width:
            x = nn.Dense(self.width, dtype=self.dtype, name="stem_proj")(x)
        cls = self.param("cls_token", nn.initializers.normal(stddev=0.02),
                         (1, 1, self.width), jnp.float32)
        x = jnp.concatenate([jnp.tile(cls.astype(x.dtype), (b, 1, 1)), x], axis=1)
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(stddev=self.width ** -0.5),
            (h * w + 1, self.width),
            jnp.float32,
        )
        x = x + pos.astype(x.dtype)
        x = Transformer(
            width=self.width,
            layers=self.layers,
            heads=self.heads,
            mlp_ratio=self.mlp_ratio,
            act=self.act,
            attn_impl=self.attn_impl,
            ln_eps=1e-6,
            scan_layers=self.scan_layers,
            remat=self.remat,
            remat_policy=self.remat_policy,
            dtype=self.dtype,
            name="transformer",
        )(x, deterministic=deterministic)
        tokens = x[:, 1:]
        pooled = LayerNorm(epsilon=1e-6, name="norm_final")(x[:, 0])
        if self.output_dim is not None:
            proj = self.param(
                "proj",
                nn.initializers.normal(stddev=self.width ** -0.5),
                (self.width, self.output_dim),
                jnp.float32,
            )
            pooled = pooled @ proj.astype(pooled.dtype)
            if self.norm == "affine":
                # released checkpoints project with a biased Linear
                pb = self.param("proj_bias", nn.initializers.zeros,
                                (self.output_dim,), jnp.float32)
                pooled = pooled + pb.astype(pooled.dtype)
        if self.output_tokens:
            return pooled, tokens
        return pooled
