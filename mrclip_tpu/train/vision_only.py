"""Image-only (SimCLR-style) train/eval loops.

Capability parity with reference `src/open_clip_train/train.py:543-857`
(`train_one_epoch_vision_only`, `evaluate_vision_only`): the model is called
with images only; img<->img logits feed the vision-only multipositive SupCon
(`MultiPositiveClipLossVisionOnly`); retrieval metrics rank images against
images.

TPU re-design: one jitted image-only step; the epoch loop shares the host
machinery of `loop.train_one_epoch`.
"""

from __future__ import annotations

import logging
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..losses import multipositive_clip_loss_vision_only
from ..parallel import local_batch_to_global
from ..parallel.train_step import _clamp_logit_scale
from .loop import AverageMeter, append_results_jsonl
from .metrics import rank_metrics

__all__ = ["build_vision_only_step", "train_one_epoch_vision_only", "evaluate_vision_only"]


def build_vision_only_step(model, tx, mesh=None, donate: bool = False):
    """Jitted image-only SupCon step (loss from loss copy.py:829-892)."""

    def step_fn(state, batch, rng):
        def loss_fn(params):
            variables = {**state.variables(), "params": params}
            out = model.apply(
                variables, batch["images"], None, deterministic=False, rngs={"dropout": rng}
            )
            ldict = multipositive_clip_loss_vision_only(
                out["image_features"], batch["labels"], out["logit_scale"]
            )
            return ldict["loss"], ldict

        (loss, ldict), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = _clamp_logit_scale(params)
        return state.replace(step=state.step + 1, params=params, opt_state=opt_state), ldict

    donate_argnums = (0,) if donate else ()
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=donate_argnums)
    from jax.sharding import NamedSharding

    from ..parallel.mesh import batch_spec

    return jax.jit(
        step_fn,
        donate_argnums=donate_argnums,
        in_shardings=(None, NamedSharding(mesh, batch_spec()), None),
    )


def train_one_epoch_vision_only(step_fn, state, data, epoch: int, args, mesh=None, schedule=None):
    """Reference train.py:543-730, image-only."""
    data["train"].set_epoch(epoch)
    loader = data["train"].dataloader
    losses_m = defaultdict(AverageMeter)
    batch_time_m = AverageMeter()
    rng = jax.random.fold_in(jax.random.key(args.seed), epoch)

    end = time.time()
    for i, batch in enumerate(loader):
        batch = {k: v for k, v in batch.items() if not isinstance(v, list)}
        batch = (
            local_batch_to_global(mesh, batch) if mesh is not None else jax.tree.map(jnp.asarray, batch)
        )
        state, metrics = step_fn(state, batch, jax.random.fold_in(rng, i))
        losses_m["loss"].update(float(metrics["loss"]), args.batch_size)
        batch_time_m.update(time.time() - end)
        end = time.time()
        if i % args.log_every_n_steps == 0:
            logging.info(
                f"VisionOnly Epoch: {epoch} [{i}/{len(loader)}] "
                f"Loss: {losses_m['loss'].val:.5g} Batch (t): {batch_time_m.avg:.3f}"
            )
    return state, {k: m.avg for k, m in losses_m.items()}


def evaluate_vision_only(model, state, data, epoch: int, args) -> dict:
    """Reference train.py:733-857: img<->img same-label retrieval."""
    if "val" not in data:
        return {}
    variables = state.variables()
    encode = jax.jit(lambda v, im: model.apply(v, im, None)["image_features"])

    feats, labels = [], []
    cum_loss, n = 0.0, 0
    for batch in data["val"].dataloader:
        img_f = encode(variables, jnp.asarray(batch["images"]))
        lbl = jnp.asarray(batch["labels"])
        scale = jnp.exp(jnp.asarray(state.params.get("logit_scale", 0.0)))
        ldict = multipositive_clip_loss_vision_only(img_f, lbl, scale)
        cum_loss += float(ldict["loss"]) * img_f.shape[0]
        n += img_f.shape[0]
        feats.append(np.asarray(img_f))
        labels.append(np.asarray(lbl))

    if n == 0:
        return {}
    img = np.concatenate(feats)
    lbl = np.concatenate(labels)
    logits = img @ img.T
    np.fill_diagonal(logits, -np.inf)  # exclude self-retrieval
    metrics = {f"image_to_image_{k}": v for k, v in rank_metrics(logits, lbl).items()}
    metrics["vision_only_val_loss"] = cum_loss / n
    metrics["epoch"] = epoch
    logging.info(
        f"VisionOnly Eval {epoch}: "
        + " ".join(f"{k}={v:.4f}" for k, v in metrics.items() if isinstance(v, float))
    )
    # results.jsonl append, same path as the standard eval (reference
    # train.py:842-845 writes it for the vision-only loop too).
    append_results_jsonl(args, metrics)
    return metrics
