"""Training entry point: `python -m mrclip_tpu.train.main <flags>`.

Capability parity with reference `src/open_clip_train/main.py:88-573` (see
SURVEY.md §3.1): experiment naming, logging, model+transforms construction,
tower locking, optimizer/schedule, resume, data assembly, optional
linear-probe/test-metrics modes, epoch loop with checkpointing + eval, and
the background remote-sync daemon.

TPU re-design: one process drives all local devices through a
(data, fsdp, model) mesh (multi-host via jax.distributed); DDP wrap, device
placement, GradScaler, and torch.compile steps disappear — the jitted train
step subsumes them.
"""

from __future__ import annotations

import logging
import os
import random
import sys
from datetime import datetime
from functools import partial

import jax
import numpy as np

from .. import checkpoint as ckpt
from ..utils import acquire_chip_lock, enable_compilation_cache
from ..factory import create_loss, create_model_and_transforms, get_model_config, get_tokenizer
from ..data import get_data
from ..ops.image_ops import random_augment_batch
from ..transforms import AugmentationCfg, validate_aug_cfg
from ..parallel import (
    build_train_step,
    create_mesh,
    create_optimizer,
    create_train_state,
    init_distributed,
    make_loss_apply,
)
from ..parallel.freeze import build_trainable_mask, chain_with_mask
from .logger import setup_logging
from .loop import evaluate, linear_probe, test_metrics, train_one_epoch
from .params import parse_args
from .scheduler import create_scheduler
from .file_utils import remote_sync, start_sync_process

LATEST_CHECKPOINT_NAME = "epoch_latest"


def random_seed(seed=42, rank=0):
    """Reference main.py:61-64."""
    np.random.seed(seed + rank)
    random.seed(seed + rank)


def get_latest_checkpoint(path: str):
    return ckpt.latest_step(path)


def main(args=None):
    args = parse_args(args)

    # Honor the caller's JAX_PLATFORMS (same re-assert as bench.py): TPU
    # plugins may register themselves via jax.config ahead of the env var,
    # so `JAX_PLATFORMS=cpu python -m ...train.main` would otherwise
    # silently grab the TPU. The plugin's sitecustomize injects
    # JAX_PLATFORMS=axon into every process, so that value is not a caller
    # request — re-asserting it would clobber an in-process cpu config
    # (test conftest) and block on an unreachable TPU backend.
    _envp = os.environ.get("JAX_PLATFORMS")
    if _envp and _envp.lower() != "axon":
        jax.config.update("jax_platforms", _envp)

    # Serialize access to the exclusive single chip (no-op on CPU): two TPU
    # processes queue/corrupt each other's throughput, so every TPU entry
    # point blocks on the same flock before touching the backend.
    acquire_chip_lock()
    enable_compilation_cache()

    rank, world_size = init_distributed()
    args.rank = rank
    args.world_size = world_size
    args.distributed = world_size > 1

    # experiment naming (reference main.py:104-118)
    if args.name is None:
        model_name_safe = args.model.replace("/", "-")
        date_str = datetime.now().strftime("%Y_%m_%d-%H_%M_%S")
        args.name = "-".join([
            date_str,
            f"model_{model_name_safe}",
            f"lr_{args.lr}",
            f"b_{args.batch_size}",
            f"p_{args.precision}",
        ])

    log_base_path = os.path.join(args.logs, args.name)
    args.log_path = None
    if rank == 0 or args.log_local:
        os.makedirs(log_base_path, exist_ok=True)
        args.log_path = os.path.join(log_base_path, "out.log")

    args.log_level = logging.DEBUG if args.debug else logging.INFO
    setup_logging(args.log_path, args.log_level)

    args.checkpoint_path = os.path.join(log_base_path, "checkpoints")
    if rank == 0:
        os.makedirs(args.checkpoint_path, exist_ok=True)

    if args.precision == "fp16":
        logging.warning("fp16 maps to bf16 on TPU (no GradScaler needed).")

    # repro snapshot of the codebase (reference main.py:575-589)
    if args.copy_codebase and rank == 0:
        import shutil

        code_dir = os.path.join(log_base_path, "code")
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        if not os.path.exists(code_dir):
            shutil.copytree(
                os.path.join(repo_root, "mrclip_tpu"),
                os.path.join(code_dir, "mrclip_tpu"),
                ignore=shutil.ignore_patterns("__pycache__", "assets"),
            )
            logging.info(f"Copied codebase to {code_dir}")

    random_seed(args.seed, 0)

    # model + transforms (reference main.py:241-294)
    model, variables, preprocess_train, preprocess_val = create_model_and_transforms(
        args.model,
        pretrained=args.pretrained or None,
        precision=args.precision,
        force_quick_gelu=args.force_quick_gelu,
        force_patch_dropout=args.force_patch_dropout,
        force_image_size=tuple(args.force_image_size) if args.force_image_size else None,
        logit_scale_trainable=not args.logitscaletrainable,
        grad_checkpointing=args.grad_checkpointing,
        remat_policy=args.remat_policy,
        attn_impl=args.attn_impl,
        gelu_approx=args.gelu_approx,
        text_dropout=args.textdropout,
        aug_cfg=args.aug_cfg,
        rng_seed=args.seed,
    )
    cfg_img_size = (get_model_config(args.model) or {}).get("vision_cfg", {}).get("image_size", 224)
    args.image_size = (
        tuple(args.force_image_size) if args.force_image_size else cfg_img_size
    )
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    logging.info(f"Model: {args.model} ({n_params / 1e6:.1f}M params)")
    logging.info(f"Devices: {jax.device_count()} ({jax.local_device_count()} local)")

    if rank == 0:
        params_file = os.path.join(log_base_path, "params.txt")
        with open(params_file, "w") as f:
            for name in sorted(vars(args)):
                f.write(f"{name}: {getattr(args, name)}\n")

    # mesh
    n_dev = jax.device_count()
    mesh = create_mesh(fsdp=args.mesh_fsdp, tp=args.mesh_tp) if n_dev > 1 else None
    if mesh is not None:
        logging.info(f"Mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")
        if args.attn_impl in ("flash", "fused"):
            # These pallas_calls are opaque to GSPMD: the kernel can't be
            # partitioned over the mesh. Fail loudly instead of a deep
            # partitioner error. 'fusedp' IS mesh-capable (its kernels carry
            # custom_partitioning rules — ops/fused_attn.py).
            raise ValueError(
                f"--attn-impl {args.attn_impl} is a single-device Pallas "
                "kernel and cannot run under a multi-device mesh; use "
                "'fusedp' (mesh-capable fused kernel) or 'bf16'/'xla'."
            )

    # Reject invalid flag combinations BEFORE side effects (the remote-sync
    # daemon below outlives a caught ValueError when main() is called
    # programmatically, and the data loaders are expensive to build).
    if args.visiononly and args.multipositiveloss and getattr(args, "accum_freq", 1) > 1:
        raise ValueError(
            "--accum-freq > 1 is not supported with --visiononly: the "
            "vision-only step has no microbatch accumulation (drop the "
            "flag or use the image-text path)"
        )

    # remote sync daemon (reference main.py:187-207)
    remote_sync_process = None
    if args.remote_sync and rank == 0:
        # logged error + hard exit, not a bare assert (reference
        # main.py:188-195; asserts vanish under python -O)
        if not remote_sync(
            log_base_path, os.path.join(args.remote_sync, args.name), args.remote_sync_protocol
        ):
            logging.error("Error: remote sync failed. Exiting.")
            raise SystemExit(1)
        remote_sync_process = start_sync_process(
            args.remote_sync_frequency,
            log_base_path,
            os.path.join(args.remote_sync, args.name),
            args.remote_sync_protocol,
        )
        remote_sync_process.start()

    # data
    tokenizer = get_tokenizer(args.model)
    # Fail loudly on tokenizer/config vocab mismatch: the embedding table's
    # out-of-range gather fills NaN under XLA (jnp.take mode='fill'), which
    # silently poisons the whole step — torch would IndexError instead. The
    # synthetic dataset clamps ids into range (its captions are placeholders)
    # so mini-vocab configs still smoke-test; real data must match.
    model_vocab = (get_model_config(args.model) or {}).get("text_cfg", {}).get(
        "vocab_size"
    )
    tok_vocab = getattr(tokenizer, "vocab_size", None)
    args._model_vocab_size = model_vocab
    if (
        model_vocab
        and tok_vocab
        and tok_vocab > model_vocab
        and args.dataset_type != "synthetic"
    ):
        raise ValueError(
            f"tokenizer emits ids up to {tok_vocab - 1} but model "
            f"'{args.model}' has vocab_size {model_vocab}: out-of-range ids "
            "would gather NaN embeddings. Use a matching tokenizer/config."
        )
    data = get_data(args, (preprocess_train, preprocess_val), epoch=0, tokenizer=tokenizer)
    assert len(data), "At least one train or val dataset must be specified."

    # optimizer + schedule
    # train loaders chunk at accum_freq * batch_size (data/__init__.py), so
    # len(dataloader) already counts OPTIMIZER steps (reference main.py:442
    # divides because its loader yields single microbatches).
    steps_per_epoch = len(data["train"].dataloader) if "train" in data else 0
    total_steps = steps_per_epoch * args.epochs
    schedule = None if args.skip_scheduler else create_scheduler(args, total_steps)
    mask = build_trainable_mask(variables["params"], args)
    tx = create_optimizer(
        lr=schedule if schedule is not None else args.lr,
        beta1=args.beta1,
        beta2=args.beta2,
        eps=args.eps,
        wd=args.wd,
        grad_clip_norm=args.grad_clip_norm,
        opt=args.opt,
        momentum=args.momentum,
        moments_dtype="bfloat16" if args.bf16_moments else None,
    )
    tx = chain_with_mask(tx, mask)
    state = create_train_state(variables, tx, mesh)

    # resume (reference main.py:401-420)
    start_epoch = 0
    if args.resume:
        if args.resume == "latest":
            step = get_latest_checkpoint(args.checkpoint_path)
            if step is not None:
                state = ckpt.load_checkpoint(args.checkpoint_path, step, template=state)
                start_epoch = int(step)
                logging.info(f"=> resuming checkpoint (epoch {start_epoch})")
        else:
            state = ckpt.load_checkpoint(args.resume, template=state)
            logging.info(f"=> loaded checkpoint '{args.resume}'")

    # one-shot modes
    if args.linear:
        return linear_probe(model, state, data, args)
    if args.test:
        return test_metrics(model, state, data, args, tokenizer=tokenizer)

    if "train" not in data:
        evaluate(model, state, data, start_epoch, args, tokenizer=tokenizer)
        return

    # distillation teacher (reference main.py distill model build)
    teacher = None
    if args.distill:
        from ..factory import create_model as _create_model

        t_model, t_variables = _create_model(
            args.distill_model, pretrained=args.distill_pretrained, precision=args.precision
        )
        teacher = (t_model, t_variables)
        logging.info(f"Distilling from {args.distill_model} ({args.distill_pretrained})")

    # loss + step
    loss_fn = create_loss(args)
    step_fn = build_train_step(
        model,
        make_loss_apply(loss_fn, mesh),
        tx,
        mesh,
        accum_freq=args.accum_freq,
        cached_features_accum=args.cached_features_accum,
        teacher=teacher,
        freeze_bn_subtrees=("visual",)
        if (args.lock_image and args.lock_image_freeze_bn_stats)
        else (),
    )

    eval_step = jax.jit(
        lambda variables, batch: model.apply(variables, batch.get("images"), batch.get("tokens"))
    )

    augment_fn = None
    if args.device_augment:
        size = args.image_size  # already folds in --force-image-size
        if isinstance(size, int):
            size = (size, size)
        aug = AugmentationCfg(**args.aug_cfg) if isinstance(args.aug_cfg, dict) else (
            args.aug_cfg or AugmentationCfg()
        )
        validate_aug_cfg(aug, backend="device")
        augment_fn = jax.jit(
            partial(
                random_augment_batch,
                out_size=tuple(size),
                crop_scale=tuple(aug.scale or (0.9, 1.0)),
                ratio=tuple(aug.ratio or (3.0 / 4.0, 4.0 / 3.0)),
                color_jitter=tuple(aug.color_jitter) if aug.color_jitter else None,
                color_jitter_prob=aug.color_jitter_prob or 0.0,
                gray_scale_prob=aug.gray_scale_prob or 0.0,
            )
        )

    writer = None
    if "tensorboard" in (args.report_to or ""):
        try:
            from torch.utils.tensorboard import SummaryWriter

            writer = SummaryWriter(os.path.join(log_base_path, "tensorboard"))
        except ImportError:
            logging.warning("tensorboard not available; skipping")
    if "wandb" in (args.report_to or ""):
        try:
            import wandb

            wandb.init(
                project=args.wandb_project_name,
                name=args.name,
                notes=args.wandb_notes,
                config=vars(args),
            )
            if args.debug:
                logging.info("wandb watch is torch-specific; skipping")
        except ImportError:
            logging.warning("wandb not available; skipping")

    vision_only = args.visiononly and args.multipositiveloss
    if vision_only:
        # image-only SimCLR-style path (reference train.py:543-857);
        # accum_freq > 1 was already rejected before the sync daemon started
        from .vision_only import build_vision_only_step, evaluate_vision_only, train_one_epoch_vision_only

        step_fn = build_vision_only_step(model, tx, mesh)

    for epoch in range(start_epoch, args.epochs):
        logging.info(f"Start epoch {epoch}")
        if vision_only:
            state, train_metrics = train_one_epoch_vision_only(
                step_fn, state, data, epoch, args, mesh, schedule
            )
        else:
            state, train_metrics = train_one_epoch(
                step_fn, state, data, epoch, args, mesh, schedule, writer, augment_fn
            )
        completed_epoch = epoch + 1

        # checkpoint (reference main.py:522-555); orbax manager handles
        # atomicity (the tmp+rename dance) and retention.
        if rank == 0 and (
            completed_epoch == args.epochs
            or args.save_most_recent
            or (args.save_frequency > 0 and completed_epoch % args.save_frequency == 0)
        ):
            keep = 1 if args.delete_previous_checkpoint else None
            ckpt.save_checkpoint(args.checkpoint_path, completed_epoch, state, keep=keep)
            logging.info(f"Saved checkpoint at epoch {completed_epoch}")

        if "val" in data and (
            (args.val_frequency and completed_epoch % args.val_frequency == 0)
            or completed_epoch == args.epochs
        ):
            if vision_only:
                evaluate_vision_only(model, state, data, completed_epoch, args)
            else:
                evaluate(
                    model, state, data, completed_epoch, args,
                    eval_step=eval_step, writer=writer, tokenizer=tokenizer,
                )

    if remote_sync_process is not None:
        remote_sync_process.terminate()
        logging.info("Final remote sync.")
        remote_sync(log_base_path, os.path.join(args.remote_sync, args.name), args.remote_sync_protocol)

    return state


if __name__ == "__main__":
    main(sys.argv[1:])
