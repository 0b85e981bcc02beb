"""Epoch train/eval loops.

Capability parity with reference `src/open_clip_train/train.py`:
- `train_one_epoch` (:70-269): per-step LR schedule, async device feed,
  samples/s + loss meters, logit-scale clamp (inside the jitted step), master
  logging every `--log-every-n-steps`.
- `evaluate` (:272-462): batch losses (multipositive pos-mask from labels or
  arange CE), feature accumulation (capped 10k unless --metrics), retrieval
  metrics (general + optional unique ground truth), --tracepreds dump,
  results.jsonl append.
- `test_metrics` (:859-1222): full-dataset eval with caption dedup, per-image
  ranks vs all unique texts, 3D volume voting, i2t/t2i rank dumps.
- `get_features` / `linear_probe` (:1236-1263, :1381-1441): sklearn logistic
  regression (C=4.16, lbfgs) on frozen image features.

TPU deltas: the hot loop is one jitted step (forward+loss+grads+update fused
by XLA); the host only feeds batches (double-buffered `device_put`) and reads
metrics with a 1-step lag to keep dispatch async.
"""

from __future__ import annotations

import json
import logging
import math
import os
import time
from collections import defaultdict
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..losses import multipositive_clip_loss, clip_loss
from ..ops.image_ops import eval_preprocess_batch
from ..parallel import local_batch_to_global
from .metrics import get_clip_metrics, volume_voting_metrics


_normalize_fns = {}


def _mean_std(pp):
    """(mean, std) tuples from a PreprocessCfg-carrying loader, or None."""
    if pp is None or getattr(pp, "mean", None) is None:
        return None
    return tuple(pp.mean), tuple(pp.std)


def _get_normalize(mean_std=None):
    fn = _normalize_fns.get(mean_std)
    if fn is None:
        import functools

        from ..ops.image_ops import normalize_images

        kw = {} if mean_std is None else {"mean": mean_std[0], "std": mean_std[1]}
        fn = jax.jit(functools.partial(normalize_images, **kw))
        _normalize_fns[mean_std] = fn
    return fn


def _maybe_preprocess_images(batch: dict, args, pp=None) -> dict:
    """Native-loader batches arrive as raw uint8 canvases; run the
    deterministic device-side eval preprocessing (resize/crop/normalize).
    `pp` is the loader's PreprocessCfg (mean/std of the model family)."""
    imgs = batch.get("images")
    if imgs is not None and imgs.dtype == jnp.uint8:
        size = getattr(args, "image_size", 224)
        if isinstance(size, int):
            size = (size, size)
        kw = {}
        ms = _mean_std(pp)
        if ms is not None:
            kw = {"mean": ms[0], "std": ms[1]}
        batch = dict(
            batch, images=eval_preprocess_batch(imgs, out_size=tuple(size), **kw)
        )
    return batch

__all__ = [
    "AverageMeter",
    "train_one_epoch",
    "evaluate",
    "test_metrics",
    "get_features",
    "linear_probe",
]


def append_results_jsonl(args, metrics: dict) -> None:
    """Append eval metrics to checkpoints/results.jsonl (reference
    train.py:447-449; shared by the standard and vision-only eval paths)."""
    log_dir = getattr(args, "checkpoint_path", None)
    if not log_dir:
        return
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, "results.jsonl"), "a+") as f:
        f.write(json.dumps({
            k: float(v) if isinstance(v, (int, float, np.floating)) else v
            for k, v in metrics.items()
        }))
        f.write("\n")


class AverageMeter:
    """Running average (reference train.py:29-45)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


def _to_device(batch: dict, mesh, args) -> dict:
    batch = {k: v for k, v in batch.items() if not isinstance(v, list)}
    if mesh is not None:
        return local_batch_to_global(mesh, batch)
    return jax.tree.map(jnp.asarray, batch)




def train_one_epoch(
    step_fn,
    state,
    data,
    epoch: int,
    args,
    mesh=None,
    schedule: Optional[Callable] = None,
    writer=None,
    augment_fn: Optional[Callable] = None,
):
    """One epoch of jitted steps. Returns (state, epoch_metrics)."""
    data["train"].set_epoch(epoch)
    loader = data["train"].dataloader
    num_batches = len(loader)
    epoch_samples = num_batches * args.batch_size * args.accum_freq
    sample_digits = math.ceil(math.log(max(epoch_samples, 10), 10))

    losses_m: Dict[str, AverageMeter] = defaultdict(AverageMeter)
    batch_time_m, data_time_m = AverageMeter(), AverageMeter()
    rng = jax.random.fold_in(jax.random.key(args.seed), epoch)

    end = time.time()
    prev_metrics = None
    world_size = getattr(args, "world_size", 1)
    profile_dir = getattr(args, "profile_dir", None)
    # Timeline tracing (the reference has none, SURVEY.md §5): capture a
    # short window of epoch 0 for xprof/tensorboard. The window adapts to
    # short epochs so a started trace is always stopped (a dangling trace
    # runs for the rest of training and never writes its file).
    trace_start = min(10, max(num_batches - 2, 0))
    trace_stop = min(trace_start + 5, num_batches - 1)
    tracing = False
    for i, batch in enumerate(loader):
        if profile_dir and epoch == 0 and trace_start < trace_stop:
            if i == trace_start and not tracing:
                jax.profiler.start_trace(profile_dir)
                tracing = True
            elif i == trace_stop and tracing:
                jax.profiler.stop_trace()
                tracing = False
        step = num_batches * epoch + i
        batch = _to_device(batch, mesh, args)
        if augment_fn is not None:
            batch["images"] = augment_fn(batch["images"], jax.random.fold_in(rng, 2 * i + 1))
        elif batch["images"].dtype == jnp.uint8:
            # natively-augmented uint8 batch: normalize on device with the
            # model family's mean/std (loader carries the PreprocessCfg)
            batch["images"] = _get_normalize(
                _mean_std(getattr(loader, "preprocess_cfg", None))
            )(batch["images"])
        data_time_m.update(time.time() - end)

        state, metrics = step_fn(state, batch, jax.random.fold_in(rng, 2 * i))

        # Read the *previous* step's metrics so dispatch stays async.
        if prev_metrics is not None:
            for k, v in prev_metrics.items():
                losses_m[k].update(float(v), args.batch_size)
        prev_metrics = metrics

        batch_time_m.update(time.time() - end)
        end = time.time()

        if i % args.log_every_n_steps == 0 or i == num_batches - 1:
            # Sync point before reading wall-clock (logit_scale lives in
            # constants, not params, when frozen via --logitscaletrainable).
            jax.block_until_ready(state.params.get("logit_scale", state.step))
            num_samples = (i + 1) * args.batch_size * args.accum_freq
            pct = 100.0 * (i + 1) / num_batches
            samples_per_s = args.accum_freq * args.batch_size * world_size / max(batch_time_m.val, 1e-9)
            samples_per_s_per_dev = samples_per_s / max(jax.device_count(), 1)
            loss_val = losses_m["loss"].val if losses_m else float(metrics["loss"])
            lr = float(schedule(step)) if schedule is not None else args.lr
            logging.info(
                f"Train Epoch: {epoch} [{num_samples:>{sample_digits}}/{epoch_samples} ({pct:.0f}%)] "
                f"Loss: {loss_val:#.5g} "
                f"Data (t): {data_time_m.avg:.3f} Batch (t): {batch_time_m.avg:.3f}, "
                f"{samples_per_s:#g}/s, {samples_per_s_per_dev:#g}/s/dev LR: {lr:5f}"
            )
            if writer is not None:
                log_data = {
                    "loss": loss_val,
                    "data_time": data_time_m.val,
                    "batch_time": batch_time_m.val,
                    "samples_per_second": samples_per_s,
                    "samples_per_second_per_device": samples_per_s_per_dev,
                    "lr": lr,
                }
                for name, val in log_data.items():
                    writer.add_scalar("train/" + name, val, step)
            batch_time_m.reset()
            data_time_m.reset()

    if tracing:  # safety: a started trace must always be finalized
        jax.profiler.stop_trace()
    epoch_metrics = {k: m.avg for k, m in losses_m.items()}
    return state, epoch_metrics


def evaluate(
    model,
    state,
    data,
    epoch: int,
    args,
    eval_step=None,
    writer=None,
    tokenizer=None,
) -> dict:
    """Validation loop (reference train.py:272-462)."""
    metrics: Dict[str, float] = {}

    # ImageNet zero-shot, frequency-gated (reference zero_shot.py:45-86).
    zs_freq = getattr(args, "zeroshot_frequency", 0)
    has_imagenet = "imagenet-val" in data or "imagenet-v2" in data
    if has_imagenet and zs_freq and (
        epoch % zs_freq == 0 or epoch == getattr(args, "epochs", epoch)
    ):
        from .zero_shot import (
            build_zero_shot_classifier,
            load_imagenet_metadata,
            zero_shot_eval,
        )

        assert tokenizer is not None, "zero-shot eval needs a tokenizer"
        variables_zs = state.variables()
        encode_text = jax.jit(
            lambda t: model.apply(variables_zs, None, t)["text_features"]
        )
        encode_image = jax.jit(
            lambda im: model.apply(variables_zs, im, None)["image_features"]
        )
        classnames = getattr(args, "zeroshot_classnames", None)
        templates = getattr(args, "zeroshot_templates", None)
        if classnames is None:
            classnames, templates = load_imagenet_metadata()
        classifier = build_zero_shot_classifier(encode_text, tokenizer, classnames, templates)
        for split in ("imagenet-val", "imagenet-v2"):
            if split in data:
                res = zero_shot_eval(
                    lambda im: encode_image(jnp.asarray(im)), classifier, data[split].dataloader
                )
                prefix = "imagenet-zeroshot-val-" if split == "imagenet-val" else "imagenetv2-zeroshot-val-"
                metrics.update({prefix + k: v for k, v in res.items()})

    if "val" not in data:
        return metrics
    if eval_step is None:
        eval_step = jax.jit(
            lambda variables, batch: model.apply(variables, batch["images"], batch["tokens"])
        )

    loader = data["val"].dataloader
    cap = None if getattr(args, "metrics", False) else 10_000

    all_img, all_txt, all_labels, all_captions = [], [], [], []
    cum_loss, cum_i2t, cum_t2i, num_samples = 0.0, 0.0, 0.0, 0
    variables = state.variables()
    scale = None

    for batch in loader:
        captions = batch.pop("caption", None)
        device_batch = jax.tree.map(jnp.asarray, {k: v for k, v in batch.items() if not isinstance(v, list)})
        device_batch = _maybe_preprocess_images(
            device_batch, args, getattr(loader, "preprocess_cfg", None)
        )
        out = eval_step(variables, device_batch)
        img_f, txt_f = out["image_features"], out["text_features"]
        scale = float(out["logit_scale"])
        b = img_f.shape[0]

        if getattr(args, "multipositiveloss", False) and "labels" in batch:
            ldict = multipositive_clip_loss(
                img_f, txt_f, device_batch["labels"], out["logit_scale"], delta=args.delta
            )
            cum_i2t += float(ldict["image_to_text_loss"]) * b
            cum_t2i += float(ldict["text_to_image_loss"]) * b
        else:
            ldict = clip_loss(img_f, txt_f, out["logit_scale"])
        cum_loss += float(ldict["loss"]) * b
        if "logits" in out and "labels" in out:
            # CoCa generative val loss (reference maybe_compute_generative_loss,
            # train.py:536-540).
            logp = jax.nn.log_softmax(out["logits"].astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(logp, out["labels"][..., None], axis=-1)[..., 0]
            valid = (out["labels"] != 0).astype(jnp.float32)
            gen = float(jnp.sum(nll * valid) / jnp.clip(jnp.sum(valid), min=1.0))
            metrics["val_generative_loss"] = metrics.get("val_generative_loss", 0.0) + gen * b
        num_samples += b

        if cap is None or sum(a.shape[0] for a in all_img) < cap:
            all_img.append(np.asarray(img_f))
            all_txt.append(np.asarray(txt_f))
            if "labels" in batch:
                all_labels.append(np.asarray(batch["labels"]))
            if captions is not None:
                all_captions.extend(captions)

    if num_samples == 0:
        return metrics

    metrics["clip_val_loss"] = cum_loss / num_samples
    if "val_generative_loss" in metrics:
        metrics["val_generative_loss"] /= num_samples
    if cum_i2t:
        metrics["image_to_text_loss"] = cum_i2t / num_samples
        metrics["text_to_image_loss"] = cum_t2i / num_samples

    if all_img and all_labels:
        img = np.concatenate(all_img)
        txt = np.concatenate(all_txt)
        labels = np.concatenate(all_labels)
        gt_unique = None
        if getattr(args, "unique", False):
            # exact-caption identity ground truth (reference train.py:355-360)
            if all_captions:
                uniq = {c: i for i, c in enumerate(dict.fromkeys(all_captions))}
                gt_unique = np.array([uniq[c] for c in all_captions])
            else:
                gt_unique = np.arange(len(labels))
        trace = getattr(args, "tracepreds", False)
        res = get_clip_metrics(img, txt, scale, labels, gt_unique, trace=trace)
        if trace:
            res, vocabulary = res
            out_dir = getattr(args, "checkpoint_path", ".")
            os.makedirs(out_dir, exist_ok=True)
            with open(os.path.join(out_dir, "vocabulary.json"), "w") as f:
                json.dump({k: v for k, v in vocabulary.items()}, f, default=str)
            # anchor + top-retrieved image export (reference train.py:366-417)
            dataset = getattr(loader, "dataset", None)
            paths = getattr(dataset, "images", None)
            if paths is not None:
                import shutil

                traced_dir = os.path.join(out_dir, "traced_images")
                os.makedirs(traced_dir, exist_ok=True)
                vocab = vocabulary.get("image_to_text_general", {})
                for anchor_idx in list(vocab)[:20]:
                    entry = vocab[anchor_idx]
                    try:
                        shutil.copy(
                            paths[entry["anchor"]],
                            os.path.join(traced_dir, f"anchor_{entry['anchor']}.png"),
                        )
                        for rank_pos, j in enumerate(entry["indices"][:3]):
                            shutil.copy(
                                paths[j],
                                os.path.join(
                                    traced_dir,
                                    f"anchor_{entry['anchor']}_top{rank_pos}_idx{j}.png",
                                ),
                            )
                    except (OSError, IndexError) as e:
                        logging.warning(f"tracepreds image export failed: {e}")
                        break
        metrics.update(res)

    metrics["epoch"] = epoch
    metrics["num_samples"] = num_samples
    logging.info(
        f"Eval Epoch: {epoch} "
        + "\t".join([f"{k}: {round(v, 4):.4f}" for k, v in metrics.items() if isinstance(v, float)])
    )

    append_results_jsonl(args, metrics)
    if writer is not None:
        for name, val in metrics.items():
            if isinstance(val, (int, float, np.floating)):
                writer.add_scalar("val/" + name, val, epoch)
    return metrics


def test_metrics(model, state, data, args, tokenizer=None) -> dict:
    """Full-dataset test eval with 3D voting (reference train.py:859-1222).

    Requires the val/test loader's dataset to expose `.captions`, `.labels`
    and `.volume_ids` (CsvDataset does).
    """
    split = "val" if "val" in data else "train"
    loader = data[split].dataloader
    dataset = loader.dataset

    captions = [str(c) for c in dataset.captions]
    labels = np.asarray(dataset.labels)
    volume_ids = list(dataset.volume_ids)

    # 1. dedup captions, encode unique texts (reference :899-929)
    unique_captions = list(dict.fromkeys(captions))
    cap_to_unique = {c: i for i, c in enumerate(unique_captions)}
    assert tokenizer is not None, "test_metrics needs a tokenizer"
    variables = state.variables()
    encode_text = jax.jit(lambda v, t: model.apply(v, None, t)["text_features"])
    txt_chunks = []
    bs = args.batch_size
    for s in range(0, len(unique_captions), bs):
        toks = jnp.asarray(tokenizer(unique_captions[s : s + bs]))
        txt_chunks.append(np.asarray(encode_text(variables, toks)))
    unique_txt = np.concatenate(txt_chunks)  # [U, D]
    # first-occurrence index per caption in one O(N) pass (captions.index(c)
    # per unique caption is O(N*U) and walls at scale)
    first_idx: Dict[str, int] = {}
    for i, c in enumerate(captions):
        first_idx.setdefault(c, i)
    unique_labels = np.array([labels[first_idx[c]] for c in unique_captions])

    # 2. encode images + per-image ranks vs all unique texts (:934-985)
    encode_image = jax.jit(lambda v, im: model.apply(v, im, None)["image_features"])
    img_feats, img_labels = [], []
    for batch in loader:
        device_imgs = _maybe_preprocess_images(
            {"images": jnp.asarray(batch["images"])}, args,
            getattr(loader, "preprocess_cfg", None),
        )["images"]
        img_feats.append(np.asarray(encode_image(variables, device_imgs)))
        img_labels.append(np.asarray(batch["labels"]))
    img = np.concatenate(img_feats)
    img_labels = np.concatenate(img_labels)[: len(img)]

    _ls = state.params.get(
        "logit_scale", (state.constants or {}).get("logit_scale", 0.0)
    )
    scale = float(np.exp(np.asarray(_ls)))
    sims = scale * img @ unique_txt.T  # [N, U]
    order = np.argsort(-sims, axis=1, kind="stable")

    # best same-label rank per image ("general" ground truth)
    same = unique_labels[order] == img_labels[: len(order), None]
    i2t_ranks = np.argmax(same, axis=1)
    i2t_ranks[~same.any(axis=1)] = len(unique_captions)

    metrics = {
        "i2t_mean_rank": float(i2t_ranks.mean() + 1),
        "i2t_median_rank": float(np.floor(np.median(i2t_ranks)) + 1),
    }
    for k in (1, 5, 10):
        metrics[f"i2t_R@{k}"] = float(np.mean(i2t_ranks < k))

    # "unique" ground truth: the image's OWN caption must rank high
    # (reference train.py:1085-1158 exact-caption identity block)
    own_unique = np.array([cap_to_unique[c] for c in captions])[: len(order)]
    i2t_unique_ranks = np.argmax(order == own_unique[:, None], axis=1)
    metrics["i2t_unique_mean_rank"] = float(i2t_unique_ranks.mean() + 1)
    metrics["i2t_unique_median_rank"] = float(np.floor(np.median(i2t_unique_ranks)) + 1)
    for k in (1, 5, 10):
        metrics[f"i2t_unique_R@{k}"] = float(np.mean(i2t_unique_ranks < k))

    # 3. 3D volume voting (:987-1071)
    top10_labels = unique_labels[order[:, :10]]
    slice_votes: Dict[str, list] = defaultdict(list)
    vol_true: Dict[str, list] = defaultdict(list)
    for i in range(len(order)):
        vol = volume_ids[i] if i < len(volume_ids) else f"v{i}"
        slice_votes[vol].append(top10_labels[i].tolist())
        vol_true[vol].append(int(img_labels[i]))
    metrics.update(volume_voting_metrics(slice_votes, vol_true))

    # 4. t2i: per-unique-text best same-label image rank (:1085-1158)
    sims_t = sims.T  # [U, N]
    order_t = np.argsort(-sims_t, axis=1, kind="stable")
    same_t = img_labels[order_t] == unique_labels[:, None]
    t2i_ranks = np.argmax(same_t, axis=1)
    t2i_ranks[~same_t.any(axis=1)] = len(img_labels)
    metrics["t2i_mean_rank"] = float(t2i_ranks.mean() + 1)
    metrics["t2i_median_rank"] = float(np.floor(np.median(t2i_ranks)) + 1)
    for k in (1, 5, 10):
        metrics[f"t2i_R@{k}"] = float(np.mean(t2i_ranks < k))

    out_dir = getattr(args, "checkpoint_path", ".")
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "i2t_ranks.npy"), i2t_ranks)
    np.save(os.path.join(out_dir, "t2i_ranks.npy"), t2i_ranks)

    if getattr(args, "tracepreds", False):
        # --tracepreds in test mode (reference train.py:1167-1221): dump the
        # anchor images plus their top predicted captions for inspection.
        traced_dir = os.path.join(out_dir, "test_traced")
        os.makedirs(traced_dir, exist_ok=True)
        paths = getattr(dataset, "images", None)
        preds = {}
        for i in range(min(20, len(order))):
            entry = {
                "true_caption": captions[i],
                "true_label": int(img_labels[i]),
                "predicted": [
                    {"caption": unique_captions[j], "label": int(unique_labels[j])}
                    for j in order[i, :10]
                ],
                "general_rank": int(i2t_ranks[i]),
                "unique_rank": int(i2t_unique_ranks[i]),
            }
            preds[str(i)] = entry
            if paths is not None:
                import shutil

                try:
                    shutil.copy(str(paths[i]), os.path.join(traced_dir, f"anchor_{i}.png"))
                except OSError as e:
                    logging.warning(f"tracepreds image export failed: {e}")
        with open(os.path.join(traced_dir, "predictions.json"), "w") as f:
            json.dump(preds, f, indent=1)
    grouped = {
        vol: {"true": vol_true[vol][0], "votes": slice_votes[vol]} for vol in slice_votes
    }
    with open(os.path.join(out_dir, "grouped_3d_analysis.json"), "w") as f:
        json.dump(grouped, f)
    logging.info("test_metrics: " + json.dumps({k: round(v, 4) for k, v in metrics.items()}))
    return metrics


def get_features(model, state, loader) -> tuple:
    """Frozen image features + labels (reference train.py:1236-1263)."""
    variables = state.variables()
    encode_image = jax.jit(lambda v, im: model.apply(v, im, None)["image_features"])
    feats, labels = [], []
    for batch in loader:
        imgs = jnp.asarray(batch["images"])
        if imgs.dtype == jnp.uint8:
            from ..ops.image_ops import eval_preprocess_batch

            ms = _mean_std(getattr(loader, "preprocess_cfg", None))
            kw = {} if ms is None else {"mean": ms[0], "std": ms[1]}
            imgs = eval_preprocess_batch(imgs, out_size=imgs.shape[1:3], **kw)
        feats.append(np.asarray(encode_image(variables, imgs)))
        labels.append(np.asarray(batch["labels"]))
    return np.concatenate(feats), np.concatenate(labels)


def linear_probe(model, state, data, args) -> dict:
    """sklearn logistic regression on frozen features
    (reference train.py:1381-1441: C=4.16, lbfgs, multinomial)."""
    from sklearn.linear_model import LogisticRegression

    train_x, train_y = get_features(model, state, data["train"].dataloader)
    clf = LogisticRegression(C=4.16, max_iter=1000, solver="lbfgs")
    clf.fit(train_x, train_y)
    metrics = {"linear_probe_train_accuracy": float(clf.score(train_x, train_y))}
    if "val" in data:
        val_x, val_y = get_features(model, state, data["val"].dataloader)
        metrics["linear_probe_accuracy"] = float(clf.score(val_x, val_y))
    logging.info(f"linear_probe: {metrics}")
    return metrics
