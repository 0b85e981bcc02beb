"""ModifiedResNet vision tower (CLIP RN50 family), TPU-first NHWC.

Capability parity with reference `src/open_clip/modified_resnet.py:10-181`:
3-conv stem, anti-aliased strides (avg-pool before the strided position),
`Bottleneck` blocks with expansion 4, and an `AttentionPool2d` head that
attends a mean-token query over the spatial grid.
"""

from __future__ import annotations

from typing import Any, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

EXPANSION = 4


def _avg_pool(x: jax.Array, stride: int) -> jax.Array:
    if stride <= 1:
        return x
    return nn.avg_pool(x, window_shape=(stride, stride), strides=(stride, stride))


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> (avgpool if strided) -> 1x1 expansion, BN after each conv.

    All convs are stride-1; spatial reduction is an avg-pool placed after
    conv2 (anti-aliased downsampling, reference modified_resnet.py:16-41).
    """

    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name=name)

        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = nn.relu(bn("bn2")(out))
        out = _avg_pool(out, self.stride)
        out = nn.Conv(self.planes * EXPANSION, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = bn("bn3")(out)

        if self.stride > 1 or x.shape[-1] != self.planes * EXPANSION:
            identity = _avg_pool(x, self.stride)
            identity = nn.Conv(
                self.planes * EXPANSION, (1, 1), use_bias=False, dtype=self.dtype, name="downsample_conv"
            )(identity)
            identity = bn("downsample_bn")(identity)

        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    """Mean-token query attention pooling (reference modified_resnet.py:58-92)."""

    embed_dim: int
    num_heads: int
    output_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        seq = x.reshape(b, h * w, c)
        seq = jnp.concatenate([seq.mean(axis=1, keepdims=True), seq], axis=1)  # [B, HW+1, C]
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=self.embed_dim**-0.5),
            (h * w + 1, self.embed_dim),
        )
        seq = seq + pos.astype(seq.dtype)

        head_dim = self.embed_dim // self.num_heads
        q = nn.Dense(self.embed_dim, dtype=self.dtype, name="q_proj")(seq[:, :1])
        k = nn.Dense(self.embed_dim, dtype=self.dtype, name="k_proj")(seq)
        v = nn.Dense(self.embed_dim, dtype=self.dtype, name="v_proj")(seq)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], self.num_heads, head_dim)

        out = jax.nn.dot_product_attention(split(q), split(k), split(v))
        out = out.reshape(b, 1, self.embed_dim)
        out = nn.Dense(self.output_dim, dtype=self.dtype, name="c_proj")(out)
        return out[:, 0]


class ModifiedResNet(nn.Module):
    """CLIP RN50-style tower (reference modified_resnet.py:95-181)."""

    layers: Tuple[int, int, int, int] = (3, 4, 6, 3)
    output_dim: int = 512
    heads: int = 32
    image_size: Union[int, Tuple[int, int]] = 224
    width: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array, *, deterministic: bool = True):
        """`images`: [B, H, W, 3]; `deterministic=False` puts BN in
        batch-stats-updating training mode (the tower-wide train switch)."""
        train = not deterministic
        x = images.astype(self.dtype)

        def bn(name):
            return nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name=name)

        # 3-conv anti-aliased stem (reference :100-112).
        x = nn.Conv(self.width // 2, (3, 3), strides=2, padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(bn("bn1")(x))
        x = nn.Conv(self.width // 2, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2")(x)
        x = nn.relu(bn("bn2")(x))
        x = nn.Conv(self.width, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv3")(x)
        x = nn.relu(bn("bn3")(x))
        x = _avg_pool(x, 2)

        for stage, blocks in enumerate(self.layers):
            planes = self.width * (2**stage)
            stride = 1 if stage == 0 else 2
            for i in range(blocks):
                x = Bottleneck(
                    planes=planes,
                    stride=stride if i == 0 else 1,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{i}",
                )(x, train=train)

        embed_dim = self.width * 32
        size = self.image_size if isinstance(self.image_size, int) else self.image_size[0]
        del size  # spatial dim inferred from x at trace time
        return AttentionPool2d(
            embed_dim=embed_dim,
            num_heads=self.heads,
            output_dim=self.output_dim,
            dtype=self.dtype,
            name="attnpool",
        )(x)
