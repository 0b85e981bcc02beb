"""ConvNeXt vision tower (TPU-native, NHWC end-to-end).

Covers the reference's timm ConvNeXt vision adapters
(`src/open_clip/timm_model.py:29-153` with `timm_model_name=convnext_*`,
pretrained table `src/open_clip/pretrained.py:373-385`): stem 4x4/s4 conv +
LN, four stages of (7x7 depthwise conv -> LN -> 4x pointwise MLP with GELU
-> LayerScale gamma -> residual) blocks with LN+2x2/s2 downsampling between
stages, then global average pool -> LN -> linear projection.

TPU notes: the whole tower stays NHWC (XLA's native conv layout); the
pointwise "convs" are Dense layers on the channel axis so they tile onto
the MXU as plain matmuls; LayerNorm uses the shared fp32-stats LayerNorm.
Param names mirror timm's state-dict layout one-to-one so
`convert.timm_convnext_to_vision_params` is a pure rename+transpose.
"""

from __future__ import annotations

from typing import Callable, Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import LayerNorm, gelu_exact

Dtype = Any

# timm convnext_* stage configurations
CONVNEXT_DIMS = {
    "convnext_tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "convnext_small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "convnext_base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
    "convnext_large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
    "convnext_xlarge": ((3, 3, 27, 3), (256, 512, 1024, 2048)),
    "convnext_xxlarge": ((3, 4, 30, 3), (384, 768, 1536, 3072)),
}


class ConvNeXtBlock(nn.Module):
    """7x7 depthwise -> LN -> fc1(4x) -> GELU -> fc2 -> gamma -> residual.

    `drop_path` is timm stochastic depth: in train mode the whole residual
    branch is dropped per-sample with prob p and scaled 1/(1-p) otherwise
    (reference TimmModel passes `timm_drop_path` into timm create_model).
    """

    dim: int
    ls_init_value: float = 1e-6
    drop_path: float = 0.0
    act: Callable[[jax.Array], jax.Array] = gelu_exact
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        # `deterministic` is positional so nn.remat can pin it static
        # (static_argnums below); a keyword bool would be traced and break
        # the `if not deterministic` python branch.
        shortcut = x
        x = nn.Conv(
            features=self.dim,
            kernel_size=(7, 7),
            padding=3,
            feature_group_count=self.dim,
            dtype=self.dtype,
            name="conv_dw",
        )(x)
        x = LayerNorm(epsilon=1e-6, name="norm")(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype, name="mlp_fc1")(x)
        x = self.act(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(x)
        gamma = self.param(
            "gamma",
            nn.initializers.constant(self.ls_init_value),
            (self.dim,),
            jnp.float32,
        )
        branch = x * gamma.astype(x.dtype)
        if self.drop_path > 0.0 and not deterministic:
            keep = 1.0 - self.drop_path
            mask = jax.random.bernoulli(
                self.make_rng("dropout"), keep, (branch.shape[0], 1, 1, 1)
            )
            branch = jnp.where(mask, branch / keep, jnp.zeros_like(branch))
        return shortcut + branch


class ConvNeXt(nn.Module):
    """ConvNeXt trunk + avg pool + LN + linear projection."""

    depths: Sequence[int] = (3, 3, 27, 3)
    dims: Sequence[int] = (128, 256, 512, 1024)
    output_dim: Optional[int] = 640
    # 'linear': bias-free proj (convnext_base_w checkpoints); 'mlp': timm
    # Mlp(prev, 2*embed, embed, bias=(True, False)) with erf GELU — the
    # open_clip convnext_large_d head (reference timm_model.py:106-107).
    proj_type: str = "linear"
    ls_init_value: float = 1e-6
    # timm stochastic depth: per-block rates linspace(0, drop_path, n_blocks)
    drop_path: float = 0.0
    act: Callable[[jax.Array], jax.Array] = gelu_exact
    remat: bool = False  # per-block jax.checkpoint: b128@256px OOMs without
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        block_cls = (
            nn.remat(ConvNeXtBlock, prevent_cse=False, static_argnums=(2,))
            if self.remat
            else ConvNeXtBlock
        )
        n_blocks = sum(self.depths)
        dp_rates = [
            self.drop_path * i / max(n_blocks - 1, 1) for i in range(n_blocks)
        ]
        block_idx = 0
        x = x.astype(self.dtype)
        x = nn.Conv(
            features=self.dims[0], kernel_size=(4, 4), strides=4,
            dtype=self.dtype, name="stem_conv",
        )(x)
        x = LayerNorm(epsilon=1e-6, name="stem_norm")(x)
        for s, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if s > 0:
                x = LayerNorm(epsilon=1e-6, name=f"downsample_{s}_norm")(x)
                x = nn.Conv(
                    features=dim, kernel_size=(2, 2), strides=2,
                    dtype=self.dtype, name=f"downsample_{s}_conv",
                )(x)
            for b in range(depth):
                x = block_cls(
                    dim=dim, ls_init_value=self.ls_init_value,
                    drop_path=dp_rates[block_idx], act=self.act,
                    dtype=self.dtype, name=f"stages_{s}_blocks_{b}",
                )(x, deterministic)
                block_idx += 1
        x = jnp.mean(x, axis=(1, 2))  # global average pool (timm 'avg')
        x = LayerNorm(epsilon=1e-6, name="head_norm")(x)
        if self.output_dim is not None:
            if self.proj_type == "mlp":
                x = nn.Dense(2 * self.output_dim, dtype=self.dtype, name="mlp_fc1")(x)
                x = gelu_exact(x)  # timm Mlp default act, independent of block act
                x = nn.Dense(
                    self.output_dim, use_bias=False, dtype=self.dtype, name="mlp_fc2"
                )(x)
            else:
                proj = self.param(
                    "proj",
                    nn.initializers.normal(stddev=self.dims[-1] ** -0.5),
                    (self.dims[-1], self.output_dim),
                )
                x = x @ proj.astype(x.dtype)
        return x
