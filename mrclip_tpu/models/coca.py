"""CoCa: contrastive captioner (dual towers + multimodal text decoder).

Capability parity with reference `src/open_clip/coca_model.py:89-479` and the
`MultimodalTransformer` decoder (`transformer.py:830-926`): contrastive
image/text latents plus a cross-attending caption decoder producing vocab
logits with teacher-forcing labels; autoregressive generation with greedy /
top-k / top-p sampling and beam search.

TPU re-design: generation is a fixed-length `lax.scan` over the context
window (no dynamic shapes); beam search keeps a static beam dimension and
masks finished beams.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .clip import (
    CLIPTextCfg,
    CLIPVisionCfg,
    _filter_cfg,
    _select_act,
    build_text_tower,
    build_vision_tower,
)
from .layers import LayerNorm, gelu_exact
from .transformer import ResidualAttentionBlock

Dtype = Any


@dataclass
class MultimodalCfg(CLIPTextCfg):
    """Decoder config (reference coca_model.py:33-38)."""

    mlp_ratio: int = 4
    dim_head: int = 64
    heads: int = 8
    n_queries: int = 256
    attn_pooler_heads: int = 8


class MultimodalTransformer(nn.Module):
    """Causal self-attn + cross-attn decoder over image tokens
    (reference transformer.py:830-926)."""

    width: int = 512
    heads: int = 8
    layers: int = 12
    context_length: int = 98
    mlp_ratio: float = 4.0
    ls_init_value: Optional[float] = None
    output_dim: int = 49408  # vocab
    act: Any = gelu_exact
    scan_layers: bool = False  # interleaved self/cross blocks; unrolled default
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, image_embs: jax.Array, text_embs: jax.Array, return_hidden: bool = False
    ):
        x = text_embs
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                num_heads=self.heads,
                mlp_ratio=self.mlp_ratio,
                ls_init_value=self.ls_init_value,
                act=self.act,
                is_causal=True,
                dtype=self.dtype,
                name=f"resblocks_{i}",
            )(x)
            x = ResidualAttentionBlock(
                num_heads=self.heads,
                mlp_ratio=self.mlp_ratio,
                ls_init_value=self.ls_init_value,
                act=self.act,
                cross_attn=True,
                dtype=self.dtype,
                name=f"cross_attn_{i}",
            )(x, kv=image_embs)
        x = LayerNorm(name="ln_final")(x)
        proj = self.param(
            "text_projection",
            nn.initializers.normal(stddev=self.width**-0.5),
            (self.width, self.output_dim),
        )
        logits = x @ proj.astype(x.dtype)
        if return_hidden:
            # The caller may consume (hidden, proj) instead of logits — e.g.
            # ops.fused_loss.chunked_caption_xent streams the vocab projection
            # + CE per sequence chunk so the [B, T, vocab] tensor (and its
            # fp32 softmax intermediates) never materialize in HBM. Whichever
            # output the loss ignores is removed by XLA dead-code elimination
            # under jit, so emitting all three costs nothing.
            return logits, x, proj
        return logits


class CoCa(nn.Module):
    """Reference CoCa (coca_model.py:89-202)."""

    embed_dim: int = 512
    multimodal_cfg: Any = dataclasses.field(default_factory=MultimodalCfg)
    text_cfg: Any = dataclasses.field(default_factory=lambda: CLIPTextCfg(embed_cls=True, output_tokens=True))
    vision_cfg: Any = dataclasses.field(default_factory=CLIPVisionCfg)
    quick_gelu: bool = False
    init_logit_scale: float = math.log(1 / 0.07)
    init_logit_bias: Optional[float] = None
    pad_id: int = 0
    act_impl: str = "erf"  # 'erf' (torch parity) | 'tanh' (--gelu-approx)
    scan_layers: bool = True
    remat: bool = False
    remat_policy: str = "dots"
    attn_impl: str = "xla"
    dtype: Dtype = jnp.float32

    def setup(self):
        text_cfg = _filter_cfg(CLIPTextCfg, self.text_cfg)
        text_cfg = dataclasses.replace(text_cfg, embed_cls=True, output_tokens=True)
        vision_cfg = _filter_cfg(CLIPVisionCfg, self.vision_cfg)
        mm_cfg = self.multimodal_cfg
        if not isinstance(mm_cfg, MultimodalCfg):
            mm_cfg = _filter_cfg(MultimodalCfg, mm_cfg)
        vision_cfg = dataclasses.replace(
            vision_cfg,
            attentional_pool=True,
            attn_pooler_queries=mm_cfg.n_queries,
            attn_pooler_heads=mm_cfg.attn_pooler_heads,
            output_tokens=True,
        )

        act_sel = True if self.quick_gelu else self.act_impl
        self.text = build_text_tower(
            self.embed_dim, text_cfg, act_sel, self.dtype, self.scan_layers,
            self.remat, self.remat_policy, self.attn_impl, name="text"
        )
        self.visual = build_vision_tower(
            self.embed_dim, vision_cfg, act_sel, self.dtype, self.scan_layers,
            self.remat, self.remat_policy, self.attn_impl, name="visual"
        )
        self.text_decoder = MultimodalTransformer(
            width=mm_cfg.width,
            heads=mm_cfg.heads,
            layers=mm_cfg.layers,
            context_length=mm_cfg.context_length,
            mlp_ratio=mm_cfg.mlp_ratio,
            ls_init_value=mm_cfg.ls_init_value,
            output_dim=text_cfg.vocab_size,
            act=_select_act(True if self.quick_gelu else self.act_impl),
            dtype=self.dtype,
            name="text_decoder",
        )
        self.logit_scale = self.param(
            "logit_scale", lambda key: jnp.asarray(self.init_logit_scale, jnp.float32)
        )
        if self.init_logit_bias is not None:
            self.logit_bias = self.param(
                "logit_bias", lambda key: jnp.asarray(self.init_logit_bias, jnp.float32)
            )
        else:
            self.logit_bias = None
        self.context_length = (
            mm_cfg.context_length if mm_cfg.context_length else text_cfg.context_length
        )

    def _encode_image(self, images, normalize=True, deterministic=True):
        latent, tokens = self.visual(images, deterministic=deterministic)
        if normalize:
            latent = latent / jnp.linalg.norm(latent, axis=-1, keepdims=True)
        return latent, tokens

    def _encode_text(self, text, normalize=True, deterministic=True):
        latent, tokens = self.text(text, deterministic=deterministic)
        if normalize:
            latent = latent / jnp.linalg.norm(latent, axis=-1, keepdims=True)
        return latent, tokens

    def encode_image(self, images, normalize=True, deterministic=True):
        return self._encode_image(images, normalize, deterministic)[0]

    def encode_text(self, text, normalize=True, deterministic=True):
        return self._encode_text(text, normalize, deterministic)[0]

    def __call__(
        self,
        images: Optional[jax.Array] = None,
        text: Optional[jax.Array] = None,
        *,
        image_latent: Optional[jax.Array] = None,
        image_embs: Optional[jax.Array] = None,
        output_labels: bool = True,
        deterministic: bool = True,
    ) -> dict:
        if image_latent is None or image_embs is None:
            image_latent, image_embs = self._encode_image(images, deterministic=deterministic)
        if text is None:
            return {"image_features": image_latent, "image_embs": image_embs}

        text_latent, token_embs = self._encode_text(text, deterministic=deterministic)

        labels = None
        if output_labels:
            # teacher forcing: logits at position t predict token t+1
            labels = text[:, 1:]
            token_embs = token_embs[:, :-1]

        logits, hidden, caption_proj = self.text_decoder(
            image_embs, token_embs, return_hidden=True
        )
        out = {
            "image_features": image_latent,
            "text_features": text_latent,
            "logits": logits,
            # for the chunked captioning CE (dead-code-eliminated when the
            # dense coca_loss consumes "logits" instead)
            "caption_hidden": hidden,
            "caption_proj": caption_proj,
            "logit_scale": jnp.exp(self.logit_scale),
        }
        if labels is not None:
            out["labels"] = labels
        if self.logit_bias is not None:
            out["logit_bias"] = self.logit_bias
        return out


# ---------------------------------------------------------------------------
# Generation (reference coca_model.py:204-479), scan-based fixed length
# ---------------------------------------------------------------------------

def _top_k_filter(logits: jax.Array, k: int) -> jax.Array:
    if k <= 0:
        return logits
    kth = jnp.sort(logits, axis=-1)[..., -k][..., None]
    return jnp.where(logits < kth, -jnp.inf, logits)


def _top_p_filter(logits: jax.Array, p: float) -> jax.Array:
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    cutoff_idx = jnp.sum(cum < p, axis=-1, keepdims=True)
    cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
    return jnp.where(logits < cutoff, -jnp.inf, logits)


def generate(
    model: CoCa,
    variables: dict,
    images: jax.Array,
    *,
    seq_len: int = 77,
    sot_token_id: int = 49406,
    eot_token_id: int = 49407,
    pad_token_id: int = 0,
    temperature: float = 1.0,
    generation_type: str = "top_p",  # 'top_p' | 'top_k' | 'greedy' | 'beam_search'
    top_p: float = 0.1,
    top_k: int = 1,
    num_beams: int = 6,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Autoregressive caption generation, jit-compatible fixed length.

    Mirrors reference `CoCa.generate` (coca_model.py:204-330; beam search
    :331-479). Returns [B, seq_len] token ids, pad-filled after EOT.
    """
    if generation_type not in ("beam_search", "top_k", "top_p", "greedy"):
        # reference coca_model.py:268 raises on unknown generation types;
        # a silent greedy fallback would misreport sampling as done —
        # validate before paying for the image-tower forward
        raise ValueError(
            f"generation_type has to be one of ['beam_search', 'top_p', "
            f"'top_k', 'greedy'], got {generation_type!r}"
        )
    if rng is None:
        rng = jax.random.key(0)
    b = images.shape[0]

    out0 = model.apply(variables, images, None)
    image_latent, image_embs = out0["image_features"], out0["image_embs"]
    if generation_type == "beam_search":
        return _beam_search(
            model, variables, image_latent, image_embs, b, seq_len,
            sot_token_id, eot_token_id, pad_token_id, num_beams,
        )

    def logits_fn(tokens):
        out = model.apply(
            variables,
            None,
            tokens,
            image_latent=image_latent,
            image_embs=image_embs,
            output_labels=False,
        )
        return out["logits"]

    tokens = jnp.full((b, seq_len), pad_token_id, jnp.int32)
    tokens = tokens.at[:, 0].set(sot_token_id)
    finished = jnp.zeros((b,), bool)

    def step(carry, t):
        tokens, finished, rng = carry
        logits = logits_fn(tokens)[:, t - 1] / max(temperature, 1e-6)
        if generation_type == "top_k":
            logits = _top_k_filter(logits, top_k)
            rng, sub = jax.random.split(rng)
            nxt = jax.random.categorical(sub, logits)
        elif generation_type == "top_p":
            logits = _top_p_filter(logits, top_p)
            rng, sub = jax.random.split(rng)
            nxt = jax.random.categorical(sub, logits)
        else:  # greedy
            nxt = jnp.argmax(logits, axis=-1)
        nxt = jnp.where(finished, pad_token_id, nxt).astype(jnp.int32)
        tokens = tokens.at[:, t].set(nxt)
        finished = finished | (nxt == eot_token_id)
        return (tokens, finished, rng), None

    (tokens, _, _), _ = jax.lax.scan(
        step, (tokens, finished, rng), jnp.arange(1, seq_len)
    )
    return tokens


def _beam_search(
    model, variables, image_latent, image_embs, b, seq_len,
    sot, eot, pad, num_beams,
):
    """Static-shape beam search: beams folded into the batch dim."""
    d_latent = image_latent.shape[-1]
    lat = jnp.repeat(image_latent, num_beams, axis=0)
    embs = jnp.repeat(image_embs, num_beams, axis=0)

    tokens = jnp.full((b * num_beams, seq_len), pad, jnp.int32).at[:, 0].set(sot)
    # only beam 0 active at t=0 so the first expansion is unbiased
    scores = jnp.tile(jnp.array([0.0] + [-1e9] * (num_beams - 1)), (b,))
    finished = jnp.zeros((b * num_beams,), bool)

    def logits_fn(tokens):
        out = model.apply(
            variables, None, tokens,
            image_latent=lat, image_embs=embs, output_labels=False,
        )
        return out["logits"]

    vocab = None

    def step(carry, t):
        tokens, scores, finished = carry
        logp = jax.nn.log_softmax(logits_fn(tokens)[:, t - 1], axis=-1)  # [B*K, V]
        v = logp.shape[-1]
        # finished beams only extend with pad at zero cost
        pad_only = jnp.full((v,), -jnp.inf).at[pad].set(0.0)
        logp = jnp.where(finished[:, None], pad_only[None, :], logp)
        total = scores[:, None] + logp  # [B*K, V]
        total = total.reshape(b, num_beams * v)
        top_scores, top_idx = jax.lax.top_k(total, num_beams)  # [B, K]
        beam_idx = top_idx // v + jnp.arange(b)[:, None] * num_beams
        token_idx = (top_idx % v).astype(jnp.int32)

        tokens = tokens[beam_idx.reshape(-1)]
        finished = finished[beam_idx.reshape(-1)]
        new_tok = jnp.where(finished, pad, token_idx.reshape(-1)).astype(jnp.int32)
        tokens = tokens.at[:, t].set(new_tok)
        finished = finished | (new_tok == eot)
        return (tokens, top_scores.reshape(-1), finished), None

    (tokens, scores, _), _ = jax.lax.scan(
        step, (tokens, scores, finished), jnp.arange(1, seq_len)
    )
    best = jnp.argmax(scores.reshape(b, num_beams), axis=-1)
    return tokens.reshape(b, num_beams, seq_len)[jnp.arange(b), best]
