"""Native M2M100/NLLB encoder vs the torch transformers oracle.

The reference's nllb-clip tags use HFTextEncoder over the M2M100 encoder
half (hf_model.py:123-126, hf_configs.py:57-66); transformers has no Flax
M2M100, so models/m2m100.py ports it. Oracle: torch `M2M100Model().encoder`.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

TINY = dict(
    vocab_size=128, d_model=32, encoder_layers=2, decoder_layers=2,
    encoder_attention_heads=2, decoder_attention_heads=2,
    encoder_ffn_dim=64, decoder_ffn_dim=64, max_position_embeddings=64,
    pad_token_id=1, bos_token_id=0, eos_token_id=2, dropout=0.0,
    attention_dropout=0.0, activation_dropout=0.0, scale_embedding=True,
)


def _torch_oracle(ids, mask):
    import torch
    from transformers import M2M100Config, M2M100Model

    torch.manual_seed(0)
    model = M2M100Model(M2M100Config(**TINY)).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    with torch.no_grad():
        out = model.encoder(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    return sd, out


def _inputs(seed=0, b=3, n=12):
    rng = np.random.RandomState(seed)
    ids = rng.randint(3, 128, (b, n)).astype(np.int64)
    # right-pad two samples to exercise mask + position handling
    ids[0, 8:] = 1
    ids[2, 5:] = 1
    mask = (ids != 1).astype(np.int64)
    return ids, mask


def test_m2m100_encoder_matches_torch():
    from transformers import M2M100Config

    from mrclip_tpu.models.m2m100 import M2M100Encoder, m2m100_torch_encoder_to_flax

    ids, mask = _inputs()
    sd, ref = _torch_oracle(ids, mask)

    enc = M2M100Encoder(config=M2M100Config(**TINY))
    params = m2m100_torch_encoder_to_flax(sd)
    (out,) = enc.apply(
        {"params": params}, jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(mask.astype(np.int32)),
    )
    # padded rows diverge (torch computes them, we do too — same bias), but
    # compare everything: the math should match everywhere.
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5)


def test_nllb_checkpoint_import_matches_torch_end_to_end():
    """Reference-layout nllb checkpoint -> imported tower matches the torch
    oracle (encoder -> cls pool -> linear proj).

    The reference tower saves `text.transformer.<M2M100 encoder keys>` plus
    `text.proj.weight` (hf_model.py:123-126,146-152 after
    `self.transformer = self.transformer.encoder`); this drives
    `checkpoint.import_torch_state_dict(hf_text_cfg=...)`'s m2m_100 branch.
    pad_id is left unset, so the mask must fall back to the HF config's
    pad_token_id=1 (reference masks with config.pad_token_id) — with the
    wrong pad id the padded rows would poison cls attention and this
    equality fails.
    """
    import torch
    from mrclip_tpu.checkpoint import import_torch_state_dict
    from mrclip_tpu.models.hf_text import HFTextEncoder

    ids, mask = _inputs()
    sd, hidden = _torch_oracle(ids, mask)  # full M2M100Model state dict

    embed_dim, d = 16, TINY["d_model"]
    proj_w = np.random.RandomState(3).randn(embed_dim, d).astype(np.float32) * 0.1
    ref = hidden[:, 0] @ proj_w.T  # cls_pooler + bias-free linear proj

    ckpt = {
        "text.transformer." + k[len("encoder."):]: torch.from_numpy(v)
        for k, v in sd.items()
        if k.startswith("encoder.")
    }
    ckpt["text.proj.weight"] = torch.from_numpy(proj_w)

    text_cfg = {
        "hf_model_name": "local/test-tiny-nllb",
        "hf_model_config": dict(TINY, model_type="m2m_100"),
    }
    params = import_torch_state_dict(ckpt, hf_text_cfg=text_cfg)["text"]

    tower = HFTextEncoder(
        model_name="local/test-tiny-nllb",
        output_dim=embed_dim,
        proj_type="linear",
        pooler_type="cls_pooler",
        pretrained=False,
        config=dict(TINY, model_type="m2m_100"),
        pad_id=None,  # must resolve to config pad_token_id=1
    )
    out = tower.apply({"params": params}, jnp.asarray(ids.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5)


def test_hf_pad_id_falls_back_to_config():
    """pad_id=None masks with the HF config's pad_token_id (here 1):
    equal to an explicit pad_id=1 tower, different from pad_id=0."""
    from mrclip_tpu.models.hf_text import HFTextEncoder

    ids, _ = _inputs()
    toks = jnp.asarray(ids.astype(np.int32))

    def run(pad_id):
        tower = HFTextEncoder(
            model_name="local/test-tiny-nllb", output_dim=16,
            proj_type="linear", pooler_type="mean_pooler", pretrained=False,
            config=dict(TINY, model_type="m2m_100"), pad_id=pad_id,
        )
        params = tower.init(jax.random.key(0), toks)["params"]
        return np.asarray(tower.apply({"params": params}, toks))

    out_none, out_1, out_0 = run(None), run(1), run(0)
    np.testing.assert_array_equal(out_none, out_1)
    assert np.abs(out_none - out_0).max() > 1e-4


@pytest.mark.slow
def test_m2m100_clip_text_tower_builds_and_trains():
    """CLIP with an m2m_100 text tower: forward + grads flow (reference
    builds nllb-clip via CustomTextCLIP + HFTextEncoder)."""
    from mrclip_tpu.models.clip import CLIP

    text_cfg = {
        "context_length": 12,
        "hf_model_name": "local/test-tiny-nllb",
        "hf_model_config": dict(TINY, model_type="m2m_100"),
        "hf_proj_type": "linear",
        "hf_pooler_type": "cls_pooler",
        "hf_model_pretrained": False,
    }
    vision_mini = {"image_size": 32, "layers": 2, "width": 32,
                   "head_width": 16, "patch_size": 16}
    model = CLIP(embed_dim=16, vision_cfg=vision_mini, text_cfg=text_cfg,
                 scan_layers=False)
    ids, mask = _inputs(1)
    imgs = jnp.asarray(np.random.RandomState(2).rand(3, 32, 32, 3), jnp.float32)
    toks = jnp.asarray(ids.astype(np.int32))
    variables = model.init(jax.random.key(0), imgs, toks)
    assert "layers_0" in variables["params"]["text"]["hf"]

    def loss_fn(params):
        out = model.apply(
            {"params": params, "constants": variables.get("constants", {})},
            imgs, toks,
        )
        return -jnp.sum(out["image_features"] * out["text_features"])

    grads = jax.grad(loss_fn)(variables["params"])
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(
        grads["text"]["hf"]))
    assert np.isfinite(gnorm) and gnorm > 0
