"""Vision tower: ViT image encoder, TPU-first.

Capability parity with reference `src/open_clip/transformer.py:434-656`
(`VisionTransformer`): conv patchify -> +CLS +pos-embed (learnable or 2D
sin-cos) -> patch dropout -> ln_pre -> Transformer -> pool
(tok/avg/none/attentional) -> ln_post -> projection.

Layout is NHWC; patchify is an explicit reshape + one big matmul (a
stride-p conv is exactly a dense layer over flattened patches) so the op
maps directly onto the MXU with no conv lowering.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.pos_embed import rope_cat_2d, sincos_2d
from .layers import AttentionalPooler, LayerNorm, MAPHead, PatchDropout, gelu_exact
from .transformer import Transformer

Dtype = Any


def to_2tuple(x) -> Tuple[int, int]:
    return tuple(x) if isinstance(x, (tuple, list)) else (x, x)


class _PatchEmbed(nn.Module):
    """Patch projection holding a conv-shaped kernel, applied as a matmul.

    Kernel [ph, pw, 3, width] (the NHWC conv layout the importer writes);
    inputs are flattened patches [B, N, ph*pw*3] in matching (ph, pw, c)
    order.
    """

    width: int
    patch: Tuple[int, int]
    use_bias: bool = False  # open_clip ViTs have none; timm ViTs do
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, patches: jax.Array) -> jax.Array:
        ph, pw = self.patch
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (ph, pw, 3, self.width)
        )
        w = kernel.reshape(ph * pw * 3, self.width)
        out = jnp.dot(patches, w.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.width,))
            out = out + bias.astype(self.dtype)
        return out


class VisionTransformer(nn.Module):
    """ViT image encoder producing a pooled embedding (and optional tokens)."""

    image_size: Union[int, Tuple[int, int]] = 224
    patch_size: Union[int, Tuple[int, int]] = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_ratio: float = 4.0
    ls_init_value: Optional[float] = None
    output_dim: Optional[int] = 512
    patch_dropout: float = 0.0
    attentional_pool: bool = False
    attn_pooler_queries: int = 256
    attn_pooler_heads: int = 8
    no_ln_pre: bool = False
    pos_embed_type: str = "learnable"  # 'learnable' | 'sin_cos_2d'
    pool_type: str = "tok"  # 'tok' | 'avg' | 'map' | 'none'
    use_cls_token: bool = True  # SigLIP ViTs carry no CLS token
    final_ln_after_pool: bool = False
    act: Callable[[jax.Array], jax.Array] = gelu_exact
    ln_eps: float = 1e-5  # CLIPA/big_vision-trained configs use 1e-6
    drop_path: float = 0.0  # timm stochastic depth (unrolled stacks only)
    output_tokens: bool = False
    patch_bias: bool = False
    # EVA02 towers (timm eva.py): axial 2D rope on q/k (+ abs pos embed),
    # SwiGLU MLPs with sub-LN, inner attention LN; EVA02-E additionally
    # uses the post-norm residual form.
    use_rope: bool = False
    rope_ref_feat_shape: Optional[Tuple[int, int]] = None
    mlp_type: str = "mlp"  # 'mlp' | 'swiglu'
    mlp_norm: bool = False
    mlp_fused_gate: bool = False  # SwiGLU gate||value as one [D, 2H] param
    attn_inner_norm: bool = False
    attn_zero_k_bias: bool = False
    post_norm_blocks: bool = False
    attn_impl: str = "xla"
    scan_layers: bool = True
    remat: bool = False
    remat_policy: str = "dots"
    dtype: Dtype = jnp.float32

    @property
    def grid_size(self) -> Tuple[int, int]:
        ih, iw = to_2tuple(self.image_size)
        ph, pw = to_2tuple(self.patch_size)
        return ih // ph, iw // pw

    @nn.compact
    def __call__(self, images: jax.Array, *, deterministic: bool = True):
        """`images`: [B, H, W, 3] float (already normalized)."""
        assert self.pool_type in ("tok", "avg", "map", "none")
        assert self.use_cls_token or self.pool_type != "tok", "tok pool needs a CLS token"
        ph, pw = to_2tuple(self.patch_size)
        gh, gw = self.grid_size
        b = images.shape[0]

        # Patchify as reshape + one big matmul: a stride-p conv is exactly a
        # dense layer over flattened patches, and the explicit matmul maps
        # straight onto the MXU with no conv lowering. The param keeps the
        # conv kernel shape/path ([ph, pw, 3, width] at visual/conv1/kernel)
        # for checkpoint compatibility.
        x = images.astype(self.dtype)
        if x.shape[1] != gh * ph or x.shape[2] != gw * pw:
            # Non-divisible image sizes (e.g. SigLIP so400m @384, patch 14):
            # a stride-p VALID conv drops the trailing remainder pixels, so
            # crop to the covered region (big_vision patchify semantics).
            x = x[:, : gh * ph, : gw * pw, :]
        x = x.reshape(b, gh, ph, gw, pw, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, ph * pw * 3)
        x = _PatchEmbed(
            width=self.width, patch=(ph, pw), use_bias=self.patch_bias,
            dtype=self.dtype, name="conv1",
        )(x)

        if self.use_cls_token:
            cls = self.param(
                "class_embedding", nn.initializers.normal(stddev=self.width**-0.5), (self.width,)
            )
            x = jnp.concatenate(
                [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, self.width)), x], axis=1
            )

        n_pos = gh * gw + (1 if self.use_cls_token else 0)
        if self.pos_embed_type == "learnable":
            pos = self.param(
                "positional_embedding",
                nn.initializers.normal(stddev=self.width**-0.5),
                (n_pos, self.width),
            )
        elif self.pos_embed_type == "sin_cos_2d":
            assert gh == gw, "sin_cos_2d requires a square patch grid"
            pos = self.variable(
                "constants",
                "positional_embedding",
                lambda: jnp.asarray(sincos_2d(self.width, gh, gw, cls_token=self.use_cls_token)),
            ).value
        else:
            raise ValueError(f"unknown pos_embed_type {self.pos_embed_type}")
        x = x + pos.astype(self.dtype)

        if self.patch_dropout > 0:
            x = PatchDropout(prob=self.patch_dropout, name="patch_drop")(
                x, deterministic=deterministic
            )

        if not self.no_ln_pre:
            x = LayerNorm(epsilon=self.ln_eps, name="ln_pre")(x)

        rope = None
        if self.use_rope:
            # MultiHeadAttention skips rotation on one prefix token (CLS).
            assert self.use_cls_token, "use_rope expects a CLS token (EVA02 layout)"
            head_dim = self.width // self.heads
            rope = jnp.asarray(
                rope_cat_2d(head_dim, gh, gw, ref_feat_shape=self.rope_ref_feat_shape)
            )
            if self.patch_dropout > 0:
                raise NotImplementedError(
                    "rope indexes patches by grid position; patch_dropout "
                    "reorders them (unsupported combination)"
                )

        x = Transformer(
            width=self.width,
            layers=self.layers,
            heads=self.heads,
            mlp_ratio=self.mlp_ratio,
            ls_init_value=self.ls_init_value,
            act=self.act,
            drop_path=self.drop_path,
            attn_impl=self.attn_impl,
            scan_layers=self.scan_layers,
            remat=self.remat,
            remat_policy=self.remat_policy,
            ln_eps=self.ln_eps,
            mlp_type=self.mlp_type,
            mlp_norm=self.mlp_norm,
            mlp_fused_gate=self.mlp_fused_gate,
            attn_inner_norm=self.attn_inner_norm,
            attn_zero_k_bias=self.attn_zero_k_bias,
            post_norm=self.post_norm_blocks,
            dtype=self.dtype,
            name="transformer",
        )(x, deterministic=deterministic, rope=rope)

        def global_pool(t):
            patches = t[:, 1:] if self.use_cls_token else t
            if self.pool_type == "avg":
                return jnp.mean(patches, axis=1), patches
            if self.pool_type == "tok":
                return t[:, 0], t[:, 1:]
            return t, t

        if self.pool_type == "map":
            # SigLIP/big_vision ordering: blocks -> final norm -> MAP head
            # (timm VisionTransformer with global_pool='map').
            x = LayerNorm(epsilon=self.ln_eps, name="ln_post")(x)
            pooled, tokens = MAPHead(
                width=self.width, num_heads=self.heads,
                mlp_ratio=self.mlp_ratio, act=self.act, ln_eps=self.ln_eps,
                dtype=self.dtype, name="attn_pool",
            )(x), x
        elif self.attentional_pool:
            # Original OpenCLIP CoCa pooling (reference :521-529, :628-645):
            # pool into output_dim-sized queries, ln_post over output_dim,
            # then tok-pool -> (pooled=x[:,0], tokens=x[:,1:]) and a
            # [output_dim, output_dim] proj — matches torch checkpoints.
            x = AttentionalPooler(
                d_model=self.output_dim if self.output_dim is not None else self.width,
                num_heads=self.attn_pooler_heads,
                n_queries=self.attn_pooler_queries,
                dtype=self.dtype,
                name="attn_pool",
            )(x)
            x = LayerNorm(epsilon=self.ln_eps, name="ln_post")(x)
            pooled, tokens = x[:, 0], x[:, 1:]
        elif self.final_ln_after_pool:
            pooled, tokens = global_pool(x)
            pooled = LayerNorm(epsilon=self.ln_eps, name="ln_post")(pooled)
        else:
            x = LayerNorm(epsilon=self.ln_eps, name="ln_post")(x)
            pooled, tokens = global_pool(x)

        if self.output_dim is not None:
            # pool_dim: output_dim after attentional pooling (ref :536-541)
            pool_dim = self.output_dim if self.attentional_pool else self.width
            proj = self.param(
                "proj",
                nn.initializers.normal(stddev=self.width**-0.5),
                (pool_dim, self.output_dim),
            )
            pooled = pooled @ proj.astype(pooled.dtype)

        if self.output_tokens:
            return pooled, tokens
        return pooled
