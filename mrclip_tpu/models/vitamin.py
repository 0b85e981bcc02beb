"""ViTamin vision tower (TPU-native NHWC hybrid: conv stem + MBConv stages +
ViT stage).

Covers the reference's ViTamin pretrained-registry tags
(`src/open_clip/pretrained.py:554-599`), which the reference itself cannot
build: it ships no ViTamin config JSON and its TimmModel adapter requires
timm's `vitamin` module at runtime. The architecture here follows the
ViTamin paper (Chen et al., "ViTamin: Designing Scalable Vision Models in
the Vision-Language Era", CVPR 2024): a three-stage hybrid —

  stem   conv3x3/s2 -> LN -> GELU -> conv3x3/s1          (1/2 res)
  stage1 strided downsample + MBConv-LN blocks            (1/4 res)
  stage2 strided downsample + MBConv-LN blocks            (1/8 res)
  stage3 strided downsample -> flatten -> pre-LN ViT      (1/16 res tokens)
         blocks -> global average pool -> LN -> linear projection

where an MBConv-LN block is LN -> 1x1 expand (ratio 2) -> GELU -> 3x3
depthwise -> GELU -> 1x1 project -> residual (no squeeze-excite).

TPU design: NHWC end-to-end; the 1x1 convs are Dense layers on the channel
axis (plain MXU matmuls); the ViT stage reuses the shared `Transformer`
stack, so scan/unroll, remat, and the Pallas attention kernels all apply;
LayerNorm is the shared fp32-stats LayerNorm.

PROVENANCE: this environment has no timm source, paper PDF, or released
checkpoints (zero egress), so the stage-depth/width tables below are
recorded from the paper as remembered and are NOT oracle-validated; weight
conversion therefore stays gated in `convert.py` until a checkpoint oracle
is available (the loud error there names this module as the porting path).
Shapes, training, remat, and mesh sharding are natively tested
(tests/test_vitamin.py).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import LayerNorm, gelu_exact
from .transformer import Transformer

Dtype = Any

# (stage depths (s1, s2, s3-ViT), stage dims (c1, c2, c3), ViT heads)
# Stage-3 (ViT) depths are DERIVED from the paper's published parameter
# counts rather than recalled directly (r5; the r4 recalled depths
# 14/14/31/32 give 24.8/99.1/390/509M — every one contradicts the published
# 22.0/87.5/333.3/436.1M). With standard mlp-ratio-4 ViT blocks
# (12*D^2/block) plus the measured MBConv-stage/stem/proj overhead, depths
# 12/12/26/27 reproduce all four published counts within 1%:
#   S: 12*12*384^2 = 21.2M + ~0.8M   = 22.0M
#   B: 12*12*768^2 = 84.9M + ~2.6M   = 87.5M
#   L: 26*12*1024^2 = 327.2M + ~6.5M = 333.7M
#   XL: 27*12*1152^2 = 430.0M + ~6M  = 436M
VITAMIN_DIMS = {
    "vitamin_small": ((2, 4, 12), (64, 128, 384), 6),
    "vitamin_base": ((2, 4, 12), (128, 256, 768), 12),
    "vitamin_large": ((2, 4, 26), (160, 320, 1024), 16),
    "vitamin_xlarge": ((2, 4, 27), (192, 384, 1152), 16),
}


class MbConvLNBlock(nn.Module):
    """LN -> 1x1 expand -> GELU -> 3x3 depthwise -> GELU -> 1x1 project
    -> residual. The paper's simplified MBConv: LayerNorm instead of BN
    (no running stats to shard), expansion 2, no squeeze-excite."""

    dim: int
    expand_ratio: float = 2.0
    drop_path: float = 0.0
    act: Callable[[jax.Array], jax.Array] = gelu_exact
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        shortcut = x
        hidden = int(self.dim * self.expand_ratio)
        x = LayerNorm(epsilon=1e-6, name="norm")(x)
        x = nn.Dense(hidden, dtype=self.dtype, name="conv1_1x1")(x)
        x = self.act(x)
        x = nn.Conv(
            features=hidden,
            kernel_size=(3, 3),
            padding=1,
            feature_group_count=hidden,
            dtype=self.dtype,
            name="conv2_dw",
        )(x)
        x = self.act(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="conv3_1x1")(x)
        if self.drop_path > 0.0 and not deterministic:
            keep = 1.0 - self.drop_path
            mask = jax.random.bernoulli(
                self.make_rng("dropout"), keep, (x.shape[0], 1, 1, 1)
            )
            x = jnp.where(mask, x / keep, jnp.zeros_like(x))
        return shortcut + x


class _StridedDownsample(nn.Module):
    """LN -> conv3x3/s2 into the next stage's width."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = LayerNorm(epsilon=1e-6, name="norm")(x)
        return nn.Conv(
            features=self.dim,
            kernel_size=(3, 3),
            strides=(2, 2),
            padding=1,
            dtype=self.dtype,
            name="conv",
        )(x)


class ViTamin(nn.Module):
    """ViTamin image encoder producing a pooled embedding (optional tokens)."""

    image_size: int = 224
    depths: Sequence[int] = (2, 4, 31)
    dims: Sequence[int] = (160, 320, 1024)
    heads: int = 16
    mlp_ratio: float = 4.0
    output_dim: Optional[int] = 768
    expand_ratio: float = 2.0
    drop_path: float = 0.0
    act: Callable[[jax.Array], jax.Array] = gelu_exact
    attn_impl: str = "xla"
    output_tokens: bool = False
    scan_layers: bool = True
    remat: bool = False
    remat_policy: str = "dots"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True):
        c1, c2, c3 = self.dims
        d1, d2, d3 = self.depths
        if self.image_size % 16:
            raise ValueError(f"image_size {self.image_size} not divisible by 16")

        # stem: 1/2 resolution at c1
        x = nn.Conv(c1, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
                    name="stem_conv1")(x)
        x = LayerNorm(epsilon=1e-6, name="stem_norm")(x)
        x = self.act(x)
        x = nn.Conv(c1, (3, 3), padding=1, dtype=self.dtype, name="stem_conv2")(x)

        # conv stages: MBConv-LN at 1/4 and 1/8
        mb = MbConvLNBlock
        if self.remat:
            mb = nn.remat(mb, prevent_cse=False, static_argnums=(2,))
        x = _StridedDownsample(c1, dtype=self.dtype, name="downsample1")(x)
        for i in range(d1):
            x = mb(c1, expand_ratio=self.expand_ratio, act=self.act,
                   drop_path=self.drop_path, dtype=self.dtype,
                   name=f"stage1_block{i}")(x, deterministic)
        x = _StridedDownsample(c2, dtype=self.dtype, name="downsample2")(x)
        for i in range(d2):
            x = mb(c2, expand_ratio=self.expand_ratio, act=self.act,
                   drop_path=self.drop_path, dtype=self.dtype,
                   name=f"stage2_block{i}")(x, deterministic)

        # ViT stage on 1/16-resolution tokens
        x = _StridedDownsample(c3, dtype=self.dtype, name="downsample3")(x)
        b, h, w, _ = x.shape
        x = x.reshape(b, h * w, c3)
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(stddev=c3 ** -0.5),
            (h * w, c3),
            jnp.float32,
        )
        x = x + pos.astype(x.dtype)
        x = Transformer(
            width=c3,
            layers=d3,
            heads=self.heads,
            mlp_ratio=self.mlp_ratio,
            act=self.act,
            drop_path=self.drop_path if not self.scan_layers else 0.0,
            attn_impl=self.attn_impl,
            ln_eps=1e-6,
            scan_layers=self.scan_layers,
            remat=self.remat,
            remat_policy=self.remat_policy,
            dtype=self.dtype,
            name="transformer",
        )(x, deterministic=deterministic)

        tokens = x
        pooled = x.mean(axis=1)  # GAP (no CLS token in the hybrid stage)
        pooled = LayerNorm(epsilon=1e-6, name="norm_final")(pooled)
        if self.output_dim is not None:
            proj = self.param(
                "proj",
                nn.initializers.normal(stddev=c3 ** -0.5),
                (c3, self.output_dim),
                jnp.float32,
            )
            pooled = pooled @ proj.astype(pooled.dtype)
        if self.output_tokens:
            return pooled, tokens
        return pooled
