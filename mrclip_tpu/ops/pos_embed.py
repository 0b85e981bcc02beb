"""Positional-embedding utilities.

Capability parity with reference `src/open_clip/pos_embed.py:20-96` (fixed 2D
sin-cos embedding generation) and `src/open_clip/model.py:590-653`
(bicubic/linear pos-embed resize on checkpoint load). Pure numpy/jax — the
generation happens once at init; interpolation happens at checkpoint import.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "sincos_1d",
    "sincos_2d",
    "rope_cat_2d",
    "resize_image_pos_embed",
    "resize_text_pos_embed",
]


def rope_cat_2d(
    head_dim: int,
    grid_h: int,
    grid_w: int,
    ref_feat_shape: tuple | None = None,
    temperature: float = 10000.0,
) -> np.ndarray:
    """Axial 2D rotary-embedding table in concatenated sin||cos layout.

    The EVA02 rope (timm `RotaryEmbeddingCat(in_pixels=False)`, used by the
    reference's TimmModel-wrapped `eva02_*_clip_*` towers,
    `src/open_clip/timm_model.py:29-153` + pretrained.py:454-474): per image
    axis, `head_dim // 4` frequency bands `1 / T^(i / nb)` over integer
    patch coordinates — rescaled by `coord / grid * ref` when
    `ref_feat_shape` is given so fine-tuned resolutions reuse the
    pretraining frequency range — then each band value duplicated onto the
    channel pair it rotates. Returns [grid_h*grid_w, 2*head_dim] float32:
    first half sin, second half cos; per-position channel layout
    [h-bands x2 ..., w-bands x2 ...].
    """
    assert head_dim % 4 == 0, "2D rope needs head_dim % 4 == 0"
    nb = head_dim // 4
    bands = 1.0 / temperature ** (np.arange(nb, dtype=np.float64) / nb)
    th = np.arange(grid_h, dtype=np.float64)
    tw = np.arange(grid_w, dtype=np.float64)
    if ref_feat_shape is not None:
        th = th / grid_h * ref_feat_shape[0]
        tw = tw / grid_w * ref_feat_shape[1]
    grid = np.stack(np.meshgrid(th, tw, indexing="ij"), axis=-1)  # [H, W, 2]
    pos = grid[..., None] * bands  # [H, W, 2, nb]
    pos = pos.reshape(grid_h * grid_w, 2 * nb)
    pos = np.repeat(pos, 2, axis=-1)  # pair-duplicate -> [HW, head_dim]
    return np.concatenate([np.sin(pos), np.cos(pos)], axis=-1).astype(np.float32)


def sincos_1d(embed_dim: int, positions: np.ndarray) -> np.ndarray:
    """1D sin-cos embedding for arbitrary float positions. [n, embed_dim]."""
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega = 1.0 / 10000 ** (omega / (embed_dim / 2.0))
    out = np.einsum("n,d->nd", positions.reshape(-1).astype(np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def sincos_2d(embed_dim: int, grid_h: int, grid_w: int, cls_token: bool = False) -> np.ndarray:
    """Fixed 2D sin-cos positional embedding (reference pos_embed.py:20-67).

    Returns [grid_h*grid_w (+1), embed_dim] float32, half the channels encode
    the row coordinate and half the column coordinate.
    """
    assert embed_dim % 2 == 0
    gh = np.arange(grid_h, dtype=np.float32)
    gw = np.arange(grid_w, dtype=np.float32)
    grid = np.meshgrid(gw, gh)  # w first, matching the reference convention
    grid = np.stack(grid, axis=0).reshape(2, grid_h, grid_w)

    emb_h = sincos_1d(embed_dim // 2, grid[0])
    emb_w = sincos_1d(embed_dim // 2, grid[1])
    pos = np.concatenate([emb_h, emb_w], axis=1)
    if cls_token:
        pos = np.concatenate([np.zeros((1, embed_dim)), pos], axis=0)
    return pos.astype(np.float32)


def _bicubic_resize_grid(grid: np.ndarray, new_size: tuple) -> np.ndarray:
    """Bicubic 2D resize of [h, w, c] via torch when available, PIL fallback."""
    try:
        import torch
        import torch.nn.functional as F

        t = torch.from_numpy(grid.astype(np.float32)).permute(2, 0, 1)[None]
        t = F.interpolate(t, size=new_size, mode="bicubic", align_corners=False)
        return t[0].permute(1, 2, 0).numpy()
    except ImportError:  # pragma: no cover
        from PIL import Image

        chans = [
            np.asarray(
                Image.fromarray(grid[:, :, c]).resize((new_size[1], new_size[0]), Image.BICUBIC)
            )
            for c in range(grid.shape[-1])
        ]
        return np.stack(chans, axis=-1)


def resize_image_pos_embed(
    pos: np.ndarray,
    new_grid: tuple,
    num_prefix_tokens: int = 1,
) -> np.ndarray:
    """Bicubic-interpolate a learned image pos-embed to a new patch grid.

    Mirrors `resize_pos_embed` (reference model.py:590-621): prefix (CLS)
    tokens pass through, the patch grid is resized bicubically.
    `pos`: [old_n (+prefix), dim] -> [new_h*new_w (+prefix), dim].
    """
    prefix, grid = pos[:num_prefix_tokens], pos[num_prefix_tokens:]
    old_n = grid.shape[0]
    old_size = int(np.sqrt(old_n))
    assert old_size * old_size == old_n, "non-square pos-embed grid"
    if (old_size, old_size) == tuple(new_grid):
        return pos
    grid = grid.reshape(old_size, old_size, -1)
    grid = _bicubic_resize_grid(grid, tuple(new_grid))
    grid = grid.reshape(new_grid[0] * new_grid[1], -1)
    return np.concatenate([prefix, grid], axis=0)


def resize_text_pos_embed(pos: np.ndarray, new_len: int) -> np.ndarray:
    """Linear-interpolate a text pos-embed to a new context length.

    Mirrors `resize_text_pos_embed` (reference model.py:624-653).
    """
    old_len = pos.shape[0]
    if old_len == new_len:
        return pos
    xs_new = np.linspace(0, old_len - 1, new_len)
    xs_old = np.arange(old_len)
    return np.stack(
        [np.interp(xs_new, xs_old, pos[:, c]) for c in range(pos.shape[1])], axis=1
    ).astype(pos.dtype)
