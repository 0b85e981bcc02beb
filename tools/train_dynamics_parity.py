"""Training-DYNAMICS parity vs the reference PyTorch implementation.

Forward parity (tools/full_scale_parity.py) shows the towers match; this tool
shows the *optimization trajectory* matches: identical init (torch state dict
imported into the jax model), identical batches, K steps of

  reference: CLIP fwd -> MultiPositiveClipLoss (loss.py:671-747)
             -> AdamW w/ wd param-group split (main.py:339-378)
             -> clip_grad_norm (train.py:200-202) -> cosine_lr w/ warmup
             (scheduler.py:46-57) -> logit_scale clamp ln(100) (train.py:209-210)

  rebuild:   build_train_step(multipositive_clip_loss dense, optax adamw w/
             _wd_mask, clip_by_global_norm, train.scheduler.cosine_lr, clamp)

and asserts per-step losses and final weights agree (fp32, single device).

Run: python tools/train_dynamics_parity.py  (~1 min CPU)
The pytest wrapper is tests/test_train_dynamics.py.
"""
import importlib.machinery
import math
import sys
import types

import numpy as np

EMBED = 64
IMG = 64
CTX = 32
VOCAB = 49408


def stub(name, **attrs):
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def install_stubs():
    import torch.nn as nn

    if "ftfy" in sys.modules:
        return
    stub("ftfy", fix_text=lambda x: x)
    tv = stub("torchvision")
    ops = stub("torchvision.ops")
    ops.misc = stub("torchvision.ops.misc", FrozenBatchNorm2d=nn.BatchNorm2d)
    tv.ops = ops
    tf = stub("torchvision.transforms", InterpolationMode=types.SimpleNamespace(
        BICUBIC="bicubic", BILINEAR="bilinear", NEAREST="nearest"))

    def _g(n):
        if n.startswith("__"):
            raise AttributeError(n)
        return object

    tf.__getattr__ = _g
    tf.functional = stub("torchvision.transforms.functional")
    tv.transforms = tf
    stub("timm")


def make_batches(steps, batch, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(steps):
        out.append({
            "images": rng.randn(batch, IMG, IMG, 3).astype(np.float32) * 0.5,
            "tokens": np.concatenate(
                [np.full((batch, 1), 49406), rng.randint(1, 49000, (batch, CTX - 2)),
                 np.full((batch, 1), 49407)], axis=1).astype(np.int64),
            # few classes so every batch has real multi-positive structure
            "labels": rng.randint(0, 3, (batch,)).astype(np.int64),
        })
    return out


def run_torch(batches, lr, wd, warmup, steps, delta, grad_clip, seed=0):
    """Reference loop: returns (init state dict, per-step losses, final sd)."""
    install_stubs()
    sys.path.insert(0, "/root/reference/src")
    import torch
    from open_clip.loss import MultiPositiveClipLoss
    from open_clip.model import CLIP, CLIPTextCfg, CLIPVisionCfg
    from open_clip_train.scheduler import cosine_lr as ref_cosine_lr

    torch.manual_seed(seed)
    model = CLIP(
        embed_dim=EMBED,
        vision_cfg=CLIPVisionCfg(layers=2, width=64, head_width=32, patch_size=32,
                                 image_size=IMG),
        text_cfg=CLIPTextCfg(context_length=CTX, vocab_size=VOCAB, width=64,
                             heads=2, layers=2),
        output_dict=True,
    )
    model.train()
    sd0 = {k: v.detach().clone().numpy() for k, v in model.state_dict().items()}

    # AdamW param-group split, exactly main.py:360-376
    exclude = lambda n, p: p.ndim < 2 or "bn" in n or "ln" in n or "bias" in n or "logit_scale" in n
    named = list(model.named_parameters())
    gain_or_bias = [p for n, p in named if exclude(n, p) and p.requires_grad]
    rest = [p for n, p in named if not exclude(n, p) and p.requires_grad]
    opt = torch.optim.AdamW(
        [{"params": gain_or_bias, "weight_decay": 0.0},
         {"params": rest, "weight_decay": wd}],
        lr=lr, betas=(0.9, 0.98), eps=1e-6,
    )
    sched = ref_cosine_lr(opt, lr, warmup, steps)
    loss_fn = MultiPositiveClipLoss()

    losses = []
    for step, b in enumerate(batches):
        sched(step)
        images = torch.from_numpy(b["images"].transpose(0, 3, 1, 2))
        tokens = torch.from_numpy(b["tokens"])
        labels = torch.from_numpy(b["labels"])
        opt.zero_grad()
        model_out = model(images, tokens)
        ldict = loss_fn(**model_out, tokenized_texts=labels, delta=delta,
                        output_dict=True)
        total = sum(ldict.values())
        total.backward()
        if grad_clip is not None:
            torch.nn.utils.clip_grad_norm_(model.parameters(), grad_clip, norm_type=2.0)
        opt.step()
        with torch.no_grad():
            model.logit_scale.clamp_(0, math.log(100))
        losses.append(float(total.detach()))
    sd_final = {k: v.detach().clone().numpy() for k, v in model.state_dict().items()}
    return sd0, losses, sd_final


def run_jax(sd0, batches, lr, wd, warmup, steps, delta, grad_clip):
    """Rebuild loop from the imported torch init; same knobs."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from functools import partial

    sys.path.insert(0, "/root/repo")
    from mrclip_tpu.checkpoint import import_torch_state_dict
    from mrclip_tpu.factory import create_model
    from mrclip_tpu.hub import export_torch_state_dict
    from mrclip_tpu.losses.contrastive import multipositive_clip_loss
    from mrclip_tpu.parallel import (
        build_train_step,
        create_optimizer,
        create_train_state,
        make_loss_apply,
    )
    from mrclip_tpu.train.scheduler import cosine_lr

    model, _ = create_model("ViT-B-32-mini", init_params=False)
    params = import_torch_state_dict(sd0, scan_layers=False)
    tx = create_optimizer(
        lr=cosine_lr(lr, warmup, steps), beta1=0.9, beta2=0.98, eps=1e-6, wd=wd,
        grad_clip_norm=grad_clip,
    )
    state = create_train_state({"params": params}, tx)
    loss_apply = make_loss_apply(partial(multipositive_clip_loss, delta=delta))
    step_fn = build_train_step(model, loss_apply, tx, donate=False)

    losses = []
    for i, b in enumerate(batches):
        batch = {
            "images": jnp.asarray(b["images"]),
            "tokens": jnp.asarray(b["tokens"].astype(np.int32)),
            "labels": jnp.asarray(b["labels"].astype(np.int32)),
        }
        state, metrics = step_fn(state, batch, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    sd_final = export_torch_state_dict(state.params)
    return losses, sd_final


def run_torch_accum(batches, lr, wd, warmup, steps, delta, grad_clip, accum, seed=0):
    """Reference cached-feature accumulation dynamics (train.py:134-183,
    upstream-intended semantics: the fork's own accum call crashes — it
    omits tokenized_texts — so the torch loop here re-implements the scheme
    with the multipositive labels passed, which is what a working fork run
    would do): pass-1 no-grad feature cache for all `accum` microbatches,
    pass-2 re-forward each with live-feature splice, backward each (grads
    SUM), single optimizer step + clamp."""
    install_stubs()
    sys.path.insert(0, "/root/reference/src")
    import torch
    from open_clip.loss import MultiPositiveClipLoss
    from open_clip.model import CLIP, CLIPTextCfg, CLIPVisionCfg
    from open_clip_train.scheduler import cosine_lr as ref_cosine_lr

    torch.manual_seed(seed)
    model = CLIP(
        embed_dim=EMBED,
        vision_cfg=CLIPVisionCfg(layers=2, width=64, head_width=32, patch_size=32,
                                 image_size=IMG),
        text_cfg=CLIPTextCfg(context_length=CTX, vocab_size=VOCAB, width=64,
                             heads=2, layers=2),
        output_dict=True,
    )
    model.train()
    sd0 = {k: v.detach().clone().numpy() for k, v in model.state_dict().items()}

    exclude = lambda n, p: p.ndim < 2 or "bn" in n or "ln" in n or "bias" in n or "logit_scale" in n
    named = list(model.named_parameters())
    opt = torch.optim.AdamW(
        [{"params": [p for n, p in named if exclude(n, p)], "weight_decay": 0.0},
         {"params": [p for n, p in named if not exclude(n, p)], "weight_decay": wd}],
        lr=lr, betas=(0.9, 0.98), eps=1e-6,
    )
    sched = ref_cosine_lr(opt, lr, warmup, steps)
    loss_fn = MultiPositiveClipLoss()

    losses = []
    for step in range(steps):
        sched(step)
        micro = batches[step * accum:(step + 1) * accum]
        imgs = [torch.from_numpy(b["images"].transpose(0, 3, 1, 2)) for b in micro]
        toks = [torch.from_numpy(b["tokens"]) for b in micro]
        labels_all = torch.from_numpy(
            np.concatenate([b["labels"] for b in micro]))
        with torch.no_grad():
            cached = [model(im, tk) for im, tk in zip(imgs, toks)]
        img_cache = [c["image_features"] for c in cached]
        txt_cache = [c["text_features"] for c in cached]
        opt.zero_grad()
        step_losses = []
        for j in range(accum):
            out = model(imgs[j], toks[j])
            img_all = torch.cat(img_cache[:j] + [out["image_features"]] + img_cache[j + 1:])
            txt_all = torch.cat(txt_cache[:j] + [out["text_features"]] + txt_cache[j + 1:])
            total = loss_fn(img_all, txt_all, out["logit_scale"],
                            tokenized_texts=labels_all, delta=delta)
            total.backward()
            step_losses.append(float(total.detach()))
        if grad_clip is not None:
            torch.nn.utils.clip_grad_norm_(model.parameters(), grad_clip, norm_type=2.0)
        opt.step()
        with torch.no_grad():
            model.logit_scale.clamp_(0, math.log(100))
        losses.append(float(np.mean(step_losses)))
    sd_final = {k: v.detach().clone().numpy() for k, v in model.state_dict().items()}
    return sd0, losses, sd_final


def run_jax_accum(sd0, batches, lr, wd, warmup, steps, delta, grad_clip, accum):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from functools import partial

    sys.path.insert(0, "/root/repo")
    from mrclip_tpu.checkpoint import import_torch_state_dict
    from mrclip_tpu.factory import create_model
    from mrclip_tpu.hub import export_torch_state_dict
    from mrclip_tpu.losses.contrastive import multipositive_clip_loss
    from mrclip_tpu.parallel import (
        build_train_step,
        create_optimizer,
        create_train_state,
        make_loss_apply,
    )
    from mrclip_tpu.train.scheduler import cosine_lr

    model, _ = create_model("ViT-B-32-mini", init_params=False)
    params = import_torch_state_dict(sd0, scan_layers=False)
    tx = create_optimizer(
        lr=cosine_lr(lr, warmup, steps), beta1=0.9, beta2=0.98, eps=1e-6, wd=wd,
        grad_clip_norm=grad_clip,
    )
    state = create_train_state({"params": params}, tx)
    loss_apply = make_loss_apply(partial(multipositive_clip_loss, delta=delta))
    step_fn = build_train_step(
        model, loss_apply, tx, accum_freq=accum, cached_features_accum=True,
        donate=False,
    )

    losses = []
    for i in range(steps):
        micro = batches[i * accum:(i + 1) * accum]
        big = {
            "images": jnp.asarray(np.concatenate([b["images"] for b in micro])),
            "tokens": jnp.asarray(np.concatenate([b["tokens"] for b in micro]).astype(np.int32)),
            "labels": jnp.asarray(np.concatenate([b["labels"] for b in micro]).astype(np.int32)),
        }
        state, metrics = step_fn(state, big, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    return losses, export_torch_state_dict(state.params)


def run_parity_accum(steps=4, batch=6, accum=2, lr=5e-4, wd=0.1, warmup=2,
                     delta=0.5, grad_clip=1.0, seed=0):
    batches = make_batches(steps * accum, batch, seed)
    sd0, ref_losses, ref_final = run_torch_accum(
        batches, lr, wd, warmup, steps, delta, grad_clip, accum, seed)
    jax_losses, jax_final = run_jax_accum(
        sd0, batches, lr, wd, warmup, steps, delta, grad_clip, accum)
    w_diffs = {
        k: float(np.abs(np.asarray(jax_final[k]) - v).max())
        for k, v in ref_final.items() if k in jax_final
    }
    return {
        "ref_losses": ref_losses,
        "jax_losses": jax_losses,
        "loss_maxdiff": max(abs(a - b) for a, b in zip(ref_losses, jax_losses)),
        "weight_maxdiff": max(w_diffs.values()),
        "worst_weight": max(w_diffs, key=w_diffs.get),
        "missing_keys": sorted(set(ref_final) - set(jax_final) - {"attn_mask"}),
    }


def run_parity(steps=10, batch=8, lr=5e-4, wd=0.1, warmup=3, delta=0.5,
               grad_clip=1.0, seed=0):
    batches = make_batches(steps, batch, seed)
    sd0, ref_losses, ref_final = run_torch(
        batches, lr, wd, warmup, steps, delta, grad_clip, seed)
    jax_losses, jax_final = run_jax(
        sd0, batches, lr, wd, warmup, steps, delta, grad_clip)

    loss_diffs = [abs(a - b) for a, b in zip(ref_losses, jax_losses)]
    w_diffs = {}
    for k, v in ref_final.items():
        if k not in jax_final:
            continue
        w_diffs[k] = float(np.abs(np.asarray(jax_final[k]) - v).max())
    missing = sorted(set(ref_final) - set(jax_final) - {"attn_mask"})
    return {
        "ref_losses": ref_losses,
        "jax_losses": jax_losses,
        "loss_maxdiff": max(loss_diffs),
        "weight_maxdiff": max(w_diffs.values()),
        "worst_weight": max(w_diffs, key=w_diffs.get),
        "missing_keys": missing,
    }


def main():
    r = run_parity()
    for i, (a, b) in enumerate(zip(r["ref_losses"], r["jax_losses"])):
        print(f"step {i}: torch={a:.6f} jax={b:.6f} diff={abs(a-b):.2e}")
    print(f"loss maxdiff   = {r['loss_maxdiff']:.3e}")
    print(f"weight maxdiff = {r['weight_maxdiff']:.3e} ({r['worst_weight']})")
    if r["missing_keys"]:
        print("missing keys:", r["missing_keys"])
    assert not r["missing_keys"]
    assert r["loss_maxdiff"] < 1e-4, r["loss_maxdiff"]
    assert r["weight_maxdiff"] < 1e-4, r["weight_maxdiff"]
    print("TRAIN DYNAMICS PARITY OK")


if __name__ == "__main__":
    main()
