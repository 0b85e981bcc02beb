"""RN-family torch checkpoint import (checkpoint._convert_resnet_visual),
export (hub RN branch), and shape-based config inference.

Oracle: the reference ModifiedResNet semantics (modified_resnet.py:10-181)
written in functional torch — 3-conv anti-aliased stem, bottleneck blocks
(all convs stride 1, avg-pool after conv2, downsample = avgpool+conv+bn),
BN in eval mode using the checkpoint's running stats, and the
AttentionPool2d head via F.multi_head_attention_forward exactly as the
reference calls it (:70-93).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrclip_tpu.checkpoint import (
    config_from_torch_state_dict,
    import_torch_state_dict,
)
from mrclip_tpu.models.resnet import ModifiedResNet

WIDTH, LAYERS, EMBED, IMG = 8, (1, 1, 1, 1), 16, 64
POOL_DIM = WIDTH * 32  # attnpool embed dim
HEADS = POOL_DIM // 16


def _bn_keys(sd, prefix, c, rng):
    r = lambda *s: (rng.randn(*s).astype(np.float32) * 0.1)
    sd[prefix + ".weight"] = 1 + r(c)
    sd[prefix + ".bias"] = r(c)
    sd[prefix + ".running_mean"] = r(c)
    sd[prefix + ".running_var"] = 1 + np.abs(r(c))
    sd[prefix + ".num_batches_tracked"] = np.asarray(7, np.int64)


def _rn_mini_sd(seed=0):
    """Synthetic torch state dict in the OpenAI RN layout (mini shapes)."""
    rng = np.random.RandomState(seed)
    r = lambda *s: (rng.randn(*s).astype(np.float32) * 0.1)
    sd = {}
    sd["visual.conv1.weight"] = r(WIDTH // 2, 3, 3, 3)
    _bn_keys(sd, "visual.bn1", WIDTH // 2, rng)
    sd["visual.conv2.weight"] = r(WIDTH // 2, WIDTH // 2, 3, 3)
    _bn_keys(sd, "visual.bn2", WIDTH // 2, rng)
    sd["visual.conv3.weight"] = r(WIDTH, WIDTH // 2, 3, 3)
    _bn_keys(sd, "visual.bn3", WIDTH, rng)
    inplanes = WIDTH
    for stage, blocks in enumerate(LAYERS):
        planes = WIDTH * (2 ** stage)
        for i in range(blocks):
            p = f"visual.layer{stage + 1}.{i}"
            sd[p + ".conv1.weight"] = r(planes, inplanes, 1, 1)
            _bn_keys(sd, p + ".bn1", planes, rng)
            sd[p + ".conv2.weight"] = r(planes, planes, 3, 3)
            _bn_keys(sd, p + ".bn2", planes, rng)
            sd[p + ".conv3.weight"] = r(planes * 4, planes, 1, 1)
            _bn_keys(sd, p + ".bn3", planes * 4, rng)
            if i == 0:  # stride>1 or channel change -> downsample branch
                sd[p + ".downsample.0.weight"] = r(planes * 4, inplanes, 1, 1)
                _bn_keys(sd, p + ".downsample.1", planes * 4, rng)
            inplanes = planes * 4
    grid = IMG // 32
    sd["visual.attnpool.positional_embedding"] = r(grid * grid + 1, POOL_DIM)
    for proj, out in (("q_proj", POOL_DIM), ("k_proj", POOL_DIM),
                      ("v_proj", POOL_DIM), ("c_proj", EMBED)):
        sd[f"visual.attnpool.{proj}.weight"] = r(out, POOL_DIM)
        sd[f"visual.attnpool.{proj}.bias"] = r(out)
    # minimal text side so config inference has both towers
    sd["token_embedding.weight"] = r(64, 16)
    sd["positional_embedding"] = r(12, 16)
    sd["ln_final.weight"] = 1 + r(16)
    sd["ln_final.bias"] = r(16)
    sd["text_projection"] = r(16, EMBED)
    tb = "transformer.resblocks.0."
    sd[tb + "ln_1.weight"], sd[tb + "ln_1.bias"] = 1 + r(16), r(16)
    sd[tb + "ln_2.weight"], sd[tb + "ln_2.bias"] = 1 + r(16), r(16)
    sd[tb + "attn.in_proj_weight"] = r(48, 16)
    sd[tb + "attn.in_proj_bias"] = r(48)
    sd[tb + "attn.out_proj.weight"], sd[tb + "attn.out_proj.bias"] = r(16, 16), r(16)
    sd[tb + "mlp.c_fc.weight"], sd[tb + "mlp.c_fc.bias"] = r(64, 16), r(64)
    sd[tb + "mlp.c_proj.weight"], sd[tb + "mlp.c_proj.bias"] = r(16, 64), r(16)
    sd["logit_scale"] = np.asarray(2.659, np.float32)
    return sd


def _torch_rn_forward(sd, images):
    """Reference ModifiedResNet in functional torch, BN eval mode."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    t = lambda k: torch.tensor(sd[k])

    def bn(x, p):
        return F.batch_norm(
            x, t(p + ".running_mean"), t(p + ".running_var"),
            t(p + ".weight"), t(p + ".bias"), training=False,
        )

    x = torch.tensor(images).permute(0, 3, 1, 2)
    x = F.relu(bn(F.conv2d(x, t("visual.conv1.weight"), stride=2, padding=1), "visual.bn1"))
    x = F.relu(bn(F.conv2d(x, t("visual.conv2.weight"), padding=1), "visual.bn2"))
    x = F.relu(bn(F.conv2d(x, t("visual.conv3.weight"), padding=1), "visual.bn3"))
    x = F.avg_pool2d(x, 2)

    for stage, blocks in enumerate(LAYERS):
        stride = 1 if stage == 0 else 2
        for i in range(blocks):
            p = f"visual.layer{stage + 1}.{i}"
            s = stride if i == 0 else 1
            out = F.relu(bn(F.conv2d(x, t(p + ".conv1.weight")), p + ".bn1"))
            out = F.relu(bn(F.conv2d(out, t(p + ".conv2.weight"), padding=1), p + ".bn2"))
            if s > 1:
                out = F.avg_pool2d(out, s)
            out = bn(F.conv2d(out, t(p + ".conv3.weight")), p + ".bn3")
            if p + ".downsample.0.weight" in sd:
                idn = F.avg_pool2d(x, s) if s > 1 else x
                idn = bn(F.conv2d(idn, t(p + ".downsample.0.weight")), p + ".downsample.1")
            else:
                idn = x
            x = F.relu(out + idn)

    # AttentionPool2d exactly as the reference calls it (:70-93)
    b, c, h, w = x.shape
    x = x.reshape(b, c, h * w).permute(2, 0, 1)
    x = torch.cat([x.mean(dim=0, keepdim=True), x], dim=0)
    x = x + t("visual.attnpool.positional_embedding")[:, None, :]
    x, _ = F.multi_head_attention_forward(
        query=x, key=x, value=x,
        embed_dim_to_check=x.shape[-1], num_heads=HEADS,
        q_proj_weight=t("visual.attnpool.q_proj.weight"),
        k_proj_weight=t("visual.attnpool.k_proj.weight"),
        v_proj_weight=t("visual.attnpool.v_proj.weight"),
        in_proj_weight=None,
        in_proj_bias=torch.cat([
            t("visual.attnpool.q_proj.bias"),
            t("visual.attnpool.k_proj.bias"),
            t("visual.attnpool.v_proj.bias"),
        ]),
        bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0.0,
        out_proj_weight=t("visual.attnpool.c_proj.weight"),
        out_proj_bias=t("visual.attnpool.c_proj.bias"),
        use_separate_proj_weight=True, training=False, need_weights=False,
    )
    return x[0].numpy()


def test_rn_import_forward_parity():
    sd = _rn_mini_sd()
    rng = np.random.RandomState(1)
    images = rng.rand(2, IMG, IMG, 3).astype(np.float32)

    import torch

    with torch.no_grad():
        want = _torch_rn_forward(sd, images)

    params = import_torch_state_dict(sd)
    stats = params.pop("batch_stats")
    tower = ModifiedResNet(
        layers=LAYERS, output_dim=EMBED, heads=HEADS, image_size=IMG, width=WIDTH
    )
    got = tower.apply(
        {"params": params["visual"], "batch_stats": stats["visual"]},
        jnp.asarray(images),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_rn_export_import_round_trip():
    """hub RN export is the exact inverse of the importer, stats included."""
    from mrclip_tpu.hub import export_torch_state_dict

    sd = _rn_mini_sd(seed=3)
    params = import_torch_state_dict(sd)
    stats = params.pop("batch_stats")
    exported = export_torch_state_dict(params, batch_stats=stats)
    reimported = import_torch_state_dict(exported)
    restats = reimported.pop("batch_stats")
    params.pop("text", None), reimported.pop("text", None)

    flat = jax.tree_util.tree_leaves_with_path
    for (pa, a), (pb, b) in zip(flat((params, stats)), flat((reimported, restats))):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))


def test_rn_config_inference():
    cfg = config_from_torch_state_dict(_rn_mini_sd())
    assert cfg["vision_cfg"]["layers"] == [1, 1, 1, 1]
    assert cfg["vision_cfg"]["width"] == WIDTH
    assert cfg["vision_cfg"]["image_size"] == IMG
    assert cfg["embed_dim"] == EMBED
    assert cfg["text_cfg"]["context_length"] == 12


@pytest.mark.slow
def test_rn_factory_pretrained_load(tmp_path):
    """create_model(pretrained=<RN .pt>) overlays params AND batch_stats."""
    torch = pytest.importorskip("torch")
    from mrclip_tpu.factory import _MODEL_CONFIGS, create_model

    sd = _rn_mini_sd(seed=5)
    path = os.path.join(tmp_path, "rn_mini.pt")
    torch.save({k: torch.tensor(v) for k, v in sd.items()
                if not k.startswith(("transformer.", "token_embedding",
                                     "positional_embedding", "ln_final",
                                     "text_projection"))}, path)

    _MODEL_CONFIGS["RN-mini-import"] = {
        "embed_dim": EMBED,
        "vision_cfg": {"image_size": IMG, "layers": list(LAYERS), "width": WIDTH,
                       "head_width": 16},
        "text_cfg": {"context_length": 12, "vocab_size": 64, "width": 16,
                     "heads": 2, "layers": 1},
    }
    model, variables = create_model("RN-mini-import", pretrained=path)
    got_mean = np.asarray(variables["batch_stats"]["visual"]["bn1"]["mean"])
    np.testing.assert_array_equal(got_mean, sd["visual.bn1.running_mean"])
    got_kernel = np.asarray(variables["params"]["visual"]["conv1"]["kernel"])
    np.testing.assert_array_equal(
        got_kernel, sd["visual.conv1.weight"].transpose(2, 3, 1, 0)
    )
