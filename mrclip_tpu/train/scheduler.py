"""Per-step LR schedules.

Capability parity with reference `src/open_clip_train/scheduler.py:4-57`:
`const_lr`, `const_lr_cooldown` (polynomial), `cosine_lr`, all with the
`base_lr * (step + 1) / warmup` linear warmup. Implemented as pure
step -> lr functions usable both as optax schedules (jit-traced) and for
logging on the host.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

__all__ = ["const_lr", "const_lr_cooldown", "cosine_lr", "create_scheduler"]


def _warmup_lr(base_lr: float, warmup_length: int, step):
    return base_lr * (step + 1) / max(warmup_length, 1)


def const_lr(base_lr: float, warmup_length: int, steps: int) -> Callable:
    def schedule(step):
        return jnp.where(
            step < warmup_length, _warmup_lr(base_lr, warmup_length, step), base_lr
        )

    return schedule


def const_lr_cooldown(
    base_lr: float,
    warmup_length: int,
    steps: int,
    cooldown_steps: int,
    cooldown_power: float = 1.0,
    cooldown_end_lr: float = 0.0,
) -> Callable:
    """Constant LR with a polynomial cooldown tail (reference :25-42)."""
    start_cooldown_step = steps - cooldown_steps

    def schedule(step):
        e = step - start_cooldown_step
        es = steps - start_cooldown_step
        decay = (1 - (e / es)) ** cooldown_power
        cooled = decay * (base_lr - cooldown_end_lr) + cooldown_end_lr
        main = jnp.where(step < start_cooldown_step, base_lr, cooled)
        return jnp.where(step < warmup_length, _warmup_lr(base_lr, warmup_length, step), main)

    return schedule


def cosine_lr(base_lr: float, warmup_length: int, steps: int) -> Callable:
    def schedule(step):
        e = step - warmup_length
        es = max(steps - warmup_length, 1)
        cos = 0.5 * (1 + jnp.cos(jnp.pi * e / es)) * base_lr
        return jnp.where(step < warmup_length, _warmup_lr(base_lr, warmup_length, step), cos)

    return schedule


def create_scheduler(args, total_steps: int) -> Callable:
    """CLI dispatch (reference main.py:441-457)."""
    sched = getattr(args, "lr_scheduler", "cosine")
    base_lr = args.lr
    warmup = getattr(args, "warmup", 0)
    if sched == "cosine":
        return cosine_lr(base_lr, warmup, total_steps)
    if sched == "const":
        return const_lr(base_lr, warmup, total_steps)
    if sched == "const-cooldown":
        epochs_cooldown = getattr(args, "epochs_cooldown", None)
        assert epochs_cooldown is not None, "const-cooldown requires epochs_cooldown"
        # epochs -> STEPS (reference main.py:450: steps_per_epoch * epochs_cooldown)
        steps_per_epoch = total_steps // max(getattr(args, "epochs", 1), 1)
        cooldown_steps = steps_per_epoch * epochs_cooldown
        return const_lr_cooldown(
            base_lr,
            warmup,
            total_steps,
            cooldown_steps,
            getattr(args, "lr_cooldown_power", 1.0),
            getattr(args, "lr_cooldown_end", 0.0),
        )
    raise ValueError(f"Unknown scheduler {sched}")
