"""HF text tower: trainable params, pretrained-shape overlay, locking.

Reference `src/open_clip/hf_model.py:96-193` (HFTextEncoder + lock). The
tower's HF weights must live in the Flax params tree (trainable,
checkpointable); `lock` semantics freeze embeddings + all but the last N
encoder layers, LayerNorm following `freeze_layer_norm`. Offline: towers
build from an inline `hf_model_config` with zero hub access.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrclip_tpu.factory import create_model, get_model_config
from mrclip_tpu.models.clip import CLIP
from mrclip_tpu.parallel import (
    build_train_step,
    create_optimizer,
    create_train_state,
    make_loss_apply,
)
from mrclip_tpu.parallel.freeze import build_trainable_mask, chain_with_mask
from mrclip_tpu.losses import clip_loss

TINY_BERT = {
    "model_type": "bert",
    "vocab_size": 128,
    "hidden_size": 32,
    "num_hidden_layers": 2,
    "num_attention_heads": 2,
    "intermediate_size": 64,
    "max_position_embeddings": 64,
    "type_vocab_size": 2,
    "pad_token_id": 0,
}

VISION_MINI = {"image_size": 32, "layers": 2, "width": 32, "head_width": 16, "patch_size": 16}
TEXT_HF = {
    "context_length": 16,
    "hf_model_name": "local/test-tiny-bert",
    "hf_model_config": TINY_BERT,
    "hf_proj_type": "mlp",
    "hf_pooler_type": "mean_pooler",
    "hf_model_pretrained": False,
}


def _build(pooler="mean_pooler", proj="mlp"):
    text_cfg = dict(TEXT_HF, hf_pooler_type=pooler, hf_proj_type=proj)
    model = CLIP(embed_dim=16, vision_cfg=VISION_MINI, text_cfg=text_cfg, scan_layers=False)
    imgs = jnp.zeros((2, 32, 32, 3), jnp.float32)
    toks = jnp.asarray(np.random.RandomState(0).randint(1, 128, (2, 16)), jnp.int32)
    variables = model.init(jax.random.key(0), imgs, toks)
    return model, dict(variables), imgs, toks


@pytest.mark.slow
def test_hf_params_in_tree_and_forward():
    model, variables, imgs, toks = _build()
    params = variables["params"]
    assert "hf" in params["text"], "HF weights must be real Flax params"
    # the BERT encoder layer stack is present and trainable-shaped
    assert "encoder" in params["text"]["hf"]
    out = model.apply(variables, imgs, toks)
    assert out["text_features"].shape == (2, 16)
    assert np.isfinite(np.asarray(out["text_features"])).all()


@pytest.mark.parametrize("pooler", ["mean_pooler", "cls_pooler", "max_pooler"])
@pytest.mark.slow
def test_hf_poolers(pooler):
    model, variables, imgs, toks = _build(pooler=pooler)
    out = model.apply(variables, imgs, toks)
    assert np.isfinite(np.asarray(out["text_features"])).all()


@pytest.mark.slow
def test_hf_tower_trains_end_to_end():
    """Fine-tuning moves HF weights and decreases the loss (the round-1
    adapter silently gave them zero gradients)."""
    model, variables, imgs, toks = _build()
    rng = np.random.RandomState(1)
    batch = {
        "images": jnp.asarray(rng.rand(8, 32, 32, 3), jnp.float32),
        "tokens": jnp.asarray(rng.randint(1, 128, (8, 16)), jnp.int32),
    }
    tx = create_optimizer(lr=3e-3, wd=0.0)
    state = create_train_state(variables, tx)
    from functools import partial

    step = build_train_step(model, make_loss_apply(partial(clip_loss)), tx, donate=False)
    p0 = jax.tree.map(np.asarray, state.params["text"]["hf"])
    losses = []
    key = jax.random.key(0)
    for i in range(6):
        state, metrics = step(state, batch, jax.random.fold_in(key, i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    moved = jax.tree.leaves(
        jax.tree.map(lambda a, b: float(np.abs(a - np.asarray(b)).max()), p0,
                     state.params["text"]["hf"])
    )
    assert max(moved) > 0, "HF tower received no updates"


def test_hf_lock_freezes_all_but_last_layer():
    model, variables, imgs, toks = _build()

    class Args:
        lock_image = False
        lock_text = True
        lock_text_unlocked_layers = 1
        lock_text_freeze_layer_norm = True
        freeze = False

    mask = build_trainable_mask(variables["params"], Args())
    hf_mask = mask["text"]["hf"]
    # layer 0 fully frozen, layer 1 fully trainable, embeddings frozen
    assert all(v == 0.0 for v in jax.tree.leaves(hf_mask["encoder"]["layer"]["0"]))
    assert all(v == 1.0 for v in jax.tree.leaves(hf_mask["encoder"]["layer"]["1"]))
    assert all(v == 0.0 for v in jax.tree.leaves(hf_mask["embeddings"]))
    # proj head outside hf stays trainable (reference locks only transformer)
    assert all(v == 1.0 for v in jax.tree.leaves(mask["text"]["proj_fc1"]))

    # end-to-end: frozen leaves unchanged after a step, unlocked leaves move
    rng = np.random.RandomState(2)
    batch = {
        "images": jnp.asarray(rng.rand(4, 32, 32, 3), jnp.float32),
        "tokens": jnp.asarray(rng.randint(1, 128, (4, 16)), jnp.int32),
    }
    tx = chain_with_mask(create_optimizer(lr=1e-2, wd=0.1), mask)
    state = create_train_state(variables, tx)
    from functools import partial

    step = build_train_step(model, make_loss_apply(partial(clip_loss)), tx, donate=False)
    p0 = jax.tree.map(np.asarray, state.params)
    state, _ = step(state, batch, jax.random.key(0))
    frozen_diff = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(a - np.asarray(b)).max()),
        p0["text"]["hf"]["encoder"]["layer"]["0"],
        state.params["text"]["hf"]["encoder"]["layer"]["0"],
    ))
    live_diff = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(a - np.asarray(b)).max()),
        p0["text"]["hf"]["encoder"]["layer"]["1"],
        state.params["text"]["hf"]["encoder"]["layer"]["1"],
    ))
    assert max(frozen_diff) == 0.0, "locked layer moved"
    assert max(live_diff) > 0.0, "unlocked layer did not move"


def test_hf_lock_layer_norm_unfrozen_option():
    model, variables, imgs, toks = _build()

    class Args:
        lock_image = False
        lock_text = True
        lock_text_unlocked_layers = 0
        lock_text_freeze_layer_norm = False
        freeze = False

    mask = build_trainable_mask(variables["params"], Args())
    hf_mask = mask["text"]["hf"]
    leaves_with_path = jax.tree_util.tree_flatten_with_path(hf_mask)[0]
    ln_vals = [v for p, v in leaves_with_path if "layernorm" in jax.tree_util.keystr(p).lower()]
    other_vals = [v for p, v in leaves_with_path if "layernorm" not in jax.tree_util.keystr(p).lower()]
    assert ln_vals and all(v == 1.0 for v in ln_vals)
    assert other_vals and all(v == 0.0 for v in other_vals)


@pytest.mark.slow
def test_hf_t5_tower_oracle_parity():
    """t5/mt5 text towers (reference hf_model.py:117-126 keeps the seq2seq
    model's encoder half) run through FlaxT5EncoderModule; a reference-layout
    checkpoint (`text.transformer.<T5Stack keys>`) imports and reproduces the
    torch encoder -> masked mean pool -> linear proj forward."""
    torch = pytest.importorskip("torch")
    from transformers import T5Config, T5Model

    from mrclip_tpu.checkpoint import import_torch_state_dict
    from mrclip_tpu.parallel.freeze import build_trainable_mask

    tiny_t5 = {
        "model_type": "t5",
        "vocab_size": 96,
        "d_model": 32,
        "d_kv": 8,
        "d_ff": 64,
        "num_layers": 2,
        "num_heads": 4,
        "relative_attention_num_buckets": 8,
        "pad_token_id": 0,
        "decoder_start_token_id": 0,
        "dropout_rate": 0.0,
    }
    text_cfg = dict(
        TEXT_HF,
        hf_model_name="local/test-tiny-t5",
        hf_model_config=tiny_t5,
        hf_proj_type="linear",
        hf_pooler_type="mean_pooler",
        pad_id=0,
        vocab_size=96,
    )
    model = CLIP(embed_dim=16, vision_cfg=VISION_MINI, text_cfg=text_cfg,
                 scan_layers=False)
    rng = np.random.RandomState(0)
    toks = rng.randint(2, 96, (2, 16)).astype(np.int32)
    toks[0, 10:] = 0  # ragged padding exercises mask + relative-bias interplay
    toks = jnp.asarray(toks)
    imgs = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = dict(model.init(jax.random.key(0), imgs, toks))

    torch.manual_seed(0)
    cfg = T5Config(**{k: v for k, v in tiny_t5.items() if k != "model_type"})
    enc = T5Model(cfg).encoder.eval()  # the reference's `transformer` attr
    w = torch.randn(16, 32) * 0.05
    sd = {f"text.transformer.{k}": v.numpy() for k, v in enc.state_dict().items()}
    sd["text.proj.weight"] = w.numpy()

    params = import_torch_state_dict(sd, scan_layers=False, hf_text_cfg=text_cfg)
    variables["params"] = dict(variables["params"], text=params["text"])
    ours = np.asarray(model.apply(variables, None, toks)["text_features"], np.float64)
    ours = ours / np.linalg.norm(ours, axis=-1, keepdims=True)

    t_toks = torch.from_numpy(np.asarray(toks)).long()
    mask = (t_toks != 0)
    with torch.no_grad():
        h = enc(input_ids=t_toks, attention_mask=mask.long()).last_hidden_state
        m = mask.float().unsqueeze(-1)
        pooled = (h * m).sum(1) / m.sum(1).clamp(min=1.0)
        want = torch.nn.functional.normalize(pooled @ w.T, dim=-1).numpy()
    np.testing.assert_allclose(ours, want, atol=2e-5)

    # lock semantics find the t5 layer stack (encoder/block/{0,1})
    class Args:
        lock_image = False
        lock_text = True
        lock_text_unlocked_layers = 1
        lock_text_freeze_layer_norm = True
        freeze = False

    lock = build_trainable_mask(variables["params"], Args())
    hf_mask = lock["text"]["hf"]
    assert all(v == 0.0 for v in jax.tree.leaves(hf_mask["encoder"]["block"]["0"]))
    assert all(v == 1.0 for v in jax.tree.leaves(hf_mask["encoder"]["block"]["1"]))
    assert all(v == 0.0 for v in jax.tree.leaves(hf_mask["shared"]))


@pytest.mark.slow
def test_biomed_config_builds_offline():
    """ViT-B-16-biomed builds abstractly with zero hub access (inline
    hf_model_config); weight download is a separate, gated overlay."""
    cfg = get_model_config("ViT-B-16-biomed")
    assert cfg["text_cfg"]["hf_model_config"]["hidden_size"] == 768
    model, _ = create_model("ViT-B-16-biomed", init_params=False)
    imgs = jnp.zeros((2, 224, 224, 3), jnp.float32)
    toks = jnp.zeros((2, 256), jnp.int32)
    shapes = jax.eval_shape(lambda: model.init(jax.random.key(0), imgs, toks))
    assert "hf" in shapes["params"]["text"]
    out = jax.eval_shape(lambda v: model.apply(v, imgs, toks), shapes)
    assert out["text_features"].shape == (2, 512)


@pytest.mark.slow
def test_hf_torch_checkpoint_import_parity():
    """An open_clip-layout checkpoint with an HF text tower
    (`text.transformer.*` torch keys + `text.proj.{0,2}` mlp, reference
    hf_model.py:96-169) imports into our params tree and reproduces the
    torch forward: bert -> masked mean pool -> GELU mlp proj."""
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel

    from mrclip_tpu.checkpoint import import_torch_state_dict

    model, variables, imgs, toks = _build(pooler="mean_pooler", proj="mlp")

    torch.manual_seed(0)
    tm = BertModel(BertConfig(**TINY_BERT)).eval()
    d, out_dim = 32, 16
    hidden = (d + out_dim) // 2
    w0 = torch.randn(hidden, d) * 0.05
    w2 = torch.randn(out_dim, hidden) * 0.05

    # mean-pooler towers save no transformer pooler (reference
    # hf_model.py:115,128 add_pooling_layer=False)
    sd = {f"text.transformer.{k}": v.numpy() for k, v in tm.state_dict().items()
          if not k.startswith("pooler.")}
    sd["text.proj.0.weight"] = w0.numpy()
    sd["text.proj.2.weight"] = w2.numpy()
    sd["logit_scale"] = np.asarray(2.659, np.float32)

    params = import_torch_state_dict(sd, scan_layers=False, hf_text_cfg=TEXT_HF)
    assert set(params["text"]) == {"hf", "proj_fc1", "proj_fc2"}
    # imported HF subtree must match the built tower's structure exactly
    tpl = jax.tree_util.tree_structure(
        jax.tree.map(lambda x: 0, variables["params"]["text"]["hf"])
    )
    got = jax.tree_util.tree_structure(
        jax.tree.map(lambda x: 0, params["text"]["hf"])
    )
    assert tpl == got

    variables["params"] = dict(variables["params"], text=params["text"],
                               logit_scale=params["logit_scale"])
    ours = model.apply(variables, None, toks)["text_features"]

    # torch oracle of the same computation
    t_toks = torch.from_numpy(np.asarray(toks)).long()
    mask = (t_toks != 0)
    with torch.no_grad():
        h = tm(input_ids=t_toks, attention_mask=mask.long()).last_hidden_state
        m = mask.float().unsqueeze(-1)
        pooled = (h * m).sum(1) / m.sum(1).clamp(min=1.0)
        projected = torch.nn.functional.gelu(pooled @ w0.T) @ w2.T
        want = torch.nn.functional.normalize(projected, dim=-1).numpy()

    a = np.asarray(ours, np.float64)
    a = a / np.linalg.norm(a, axis=-1, keepdims=True)
    np.testing.assert_allclose(a, want, atol=2e-5)


@pytest.mark.slow
def test_hf_roberta_position_offset_parity():
    """Roberta-family towers must use padding-offset position ids
    (pad_idx+1..., transformers create_position_ids_from_input_ids) — plain
    arange silently shifts every position embedding. Oracle: torch
    RobertaModel, which applies the offset internally."""
    torch = pytest.importorskip("torch")
    from transformers import RobertaConfig, RobertaModel

    from mrclip_tpu.checkpoint import import_torch_state_dict

    tiny_roberta = {
        "model_type": "roberta",
        "vocab_size": 96,
        "hidden_size": 32,
        "num_hidden_layers": 2,
        "num_attention_heads": 2,
        "intermediate_size": 64,
        "max_position_embeddings": 40,
        "type_vocab_size": 1,
        "pad_token_id": 1,
    }
    text_cfg = dict(
        TEXT_HF,
        hf_model_name="local/test-tiny-roberta",
        hf_model_config=tiny_roberta,
        hf_proj_type="linear",
        pad_id=1,
        vocab_size=96,
    )
    model = CLIP(embed_dim=16, vision_cfg=VISION_MINI, text_cfg=text_cfg,
                 scan_layers=False)
    rng = np.random.RandomState(0)
    toks = rng.randint(2, 96, (2, 16)).astype(np.int32)
    toks[0, 10:] = 1  # ragged padding exercises the offset/mask interplay
    toks = jnp.asarray(toks)
    imgs = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = dict(model.init(jax.random.key(0), imgs, toks))

    torch.manual_seed(0)
    tm = RobertaModel(
        RobertaConfig(**{k: v for k, v in tiny_roberta.items() if k != "model_type"})
    ).eval()
    w = torch.randn(16, 32) * 0.05
    sd = {f"text.transformer.{k}": v.numpy() for k, v in tm.state_dict().items()
          if not k.startswith("pooler.")}
    sd["text.proj.weight"] = w.numpy()

    params = import_torch_state_dict(sd, scan_layers=False, hf_text_cfg=text_cfg)
    variables["params"] = dict(variables["params"], text=params["text"])
    ours = np.asarray(model.apply(variables, None, toks)["text_features"], np.float64)
    ours = ours / np.linalg.norm(ours, axis=-1, keepdims=True)

    t_toks = torch.from_numpy(np.asarray(toks)).long()
    mask = (t_toks != 1)
    with torch.no_grad():
        h = tm(input_ids=t_toks, attention_mask=mask.long()).last_hidden_state
        m = mask.float().unsqueeze(-1)
        pooled = (h * m).sum(1) / m.sum(1).clamp(min=1.0)
        projected = pooled @ w.T
        want = torch.nn.functional.normalize(projected, dim=-1).numpy()
    np.testing.assert_allclose(ours, want, atol=2e-5)


def test_hf_bert_cls_pooler_oracle_parity():
    """cls_pooler on a BERT-family tower must return the transformer's tanh
    pooler head, not the raw CLS hidden state (reference ClsPooler defaults
    to use_pooler_output=True, hf_model.py:64-81 + add_pooling_layer at
    :115,128): a reference-layout checkpoint incl. pooler + linear proj
    imports and reproduces the torch pooler_output -> proj forward."""
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel

    from mrclip_tpu.checkpoint import import_torch_state_dict

    text_cfg = dict(TEXT_HF, hf_pooler_type="cls_pooler", hf_proj_type="linear")
    model = CLIP(embed_dim=16, vision_cfg=VISION_MINI, text_cfg=text_cfg,
                 scan_layers=False)
    rng = np.random.RandomState(0)
    toks = rng.randint(2, 128, (2, 16)).astype(np.int32)
    toks[1, 9:] = 0  # ragged padding exercises the attention mask
    toks = jnp.asarray(toks)
    imgs = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = dict(model.init(jax.random.key(0), imgs, toks))

    torch.manual_seed(0)
    cfg = BertConfig(**{k: v for k, v in TINY_BERT.items() if k != "model_type"})
    bert = BertModel(cfg, add_pooling_layer=True).eval()
    w = torch.randn(16, 32) * 0.05
    sd = {f"text.transformer.{k}": v.numpy() for k, v in bert.state_dict().items()}
    sd["text.proj.weight"] = w.numpy()

    params = import_torch_state_dict(sd, scan_layers=False, hf_text_cfg=text_cfg)
    variables["params"] = dict(variables["params"], text=params["text"])
    ours = np.asarray(model.apply(variables, None, toks)["text_features"], np.float64)
    ours = ours / np.linalg.norm(ours, axis=-1, keepdims=True)

    t_toks = torch.from_numpy(np.asarray(toks)).long()
    mask = (t_toks != 0)
    with torch.no_grad():
        out = bert(input_ids=t_toks, attention_mask=mask.long())
        assert out.pooler_output is not None
        want = torch.nn.functional.normalize(out.pooler_output @ w.T, dim=-1).numpy()
        raw_cls = torch.nn.functional.normalize(
            out.last_hidden_state[:, 0] @ w.T, dim=-1
        ).numpy()
    np.testing.assert_allclose(ours, want, atol=2e-5)
    # guard against regressing to the raw CLS state
    assert np.abs(ours - raw_cls).max() > 1e-3
