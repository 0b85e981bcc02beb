"""Train state, optimizer, and jitted/sharded train step.

TPU-native re-design of the reference hot loop (`src/open_clip_train/
train.py:70-269` + optimizer build `main.py:339-378`):

- AdamW with the reference's weight-decay split (no decay for 1-D params,
  biases, logit_scale; main.py:344-350) via an optax mask.
- One jitted train step over the (data, fsdp, model) mesh: forward (bf16
  compute), global-batch contrastive loss (XLA inserts the ICI all-gathers;
  logits constrained row-sharded = the reference's `local_loss` memory
  layout), grad, update, logit-scale clamp to ln(100) (train.py:209-210).
  DDP's gradient all-reduce is implicit in GSPMD's psum.
- Gradient accumulation: (a) plain microbatch `lax.scan` grad averaging and
  (b) the reference's cached-feature scheme (train.py:134-183) — a no-grad
  pass caches all microbatch features, then each microbatch re-forwards with
  grads against the full accumulated negative set.
- `donate` on the state keeps params/opt buffers in place in HBM.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import batch_spec, replicate, shard_params

__all__ = [
    "TrainState",
    "create_optimizer",
    "create_train_state",
    "build_train_step",
    "build_eval_step",
    "LOGIT_SCALE_MAX",
]

LOGIT_SCALE_MAX = float(np.log(100.0))


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    batch_stats: Any = None  # RN50 towers carry BN running stats
    constants: Any = None  # non-trainable variables (frozen logit_scale, sincos pos)

    def variables(self) -> dict:
        out = {"params": self.params}
        if self.batch_stats is not None:
            out["batch_stats"] = self.batch_stats
        if self.constants is not None:
            out["constants"] = self.constants
        return out


def _wd_mask(params) -> Any:
    """True where weight decay applies (reference main.py:344-350: exclude
    ndim < 2, anything bn-like, biases, logit_scale/bias)."""

    def decide(path, leaf):
        name = jax.tree_util.keystr(path).lower()
        if leaf.ndim < 2:
            return False
        if "bn" in name or "batchnorm" in name or "logit" in name:
            return False
        return True

    return jax.tree_util.tree_map_with_path(decide, params)


def create_optimizer(
    *,
    lr: Callable | float,
    beta1: float = 0.9,
    beta2: float = 0.98,
    eps: float = 1e-6,
    wd: float = 0.2,
    grad_clip_norm: Optional[float] = None,
    opt: str = "adamw",
    momentum: Optional[float] = None,
    moments_dtype: Optional[str] = None,
) -> optax.GradientTransformation:
    """Optimizer build matching reference defaults (params.py:5-11) with the
    weight-decay mask; optional global-norm clipping (train.py:188-198).

    `--opt`: adamw (reference default) | sgd | lion | adafactor (the
    reference's non-adamw path delegates to timm; optax covers the same
    space natively).

    `moments_dtype='bfloat16'` stores the Adam/Lion first moment in bf16
    (half the optimizer-state HBM for mu; buys batch headroom on small chips).
    """
    mu_dtype = jnp.dtype(moments_dtype) if moments_dtype else None
    if opt == "adamw":
        tx = optax.adamw(
            learning_rate=lr, b1=beta1, b2=beta2, eps=eps, weight_decay=wd, mask=_wd_mask,
            mu_dtype=mu_dtype,
        )
    elif opt == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(wd, mask=_wd_mask),
            optax.sgd(learning_rate=lr, momentum=momentum or 0.9, nesterov=True),
        )
    elif opt == "lion":
        tx = optax.lion(
            learning_rate=lr, b1=beta1, b2=beta2, weight_decay=wd, mask=_wd_mask,
            mu_dtype=mu_dtype,
        )
    elif opt == "adafactor":
        # same gain/bias/logit_scale wd exclusions as the other opts (the
        # reference's timm delegation applies the same no-decay grouping)
        tx = optax.adafactor(
            learning_rate=lr, weight_decay_rate=wd, weight_decay_mask=_wd_mask
        )
    else:
        raise ValueError(f"unknown optimizer {opt}")
    if grad_clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)
    return tx


def create_train_state(
    variables: dict, tx: optax.GradientTransformation, mesh: Optional[Mesh] = None
) -> TrainState:
    """Build (and optionally shard onto the mesh) the full train state."""
    params = variables["params"]
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        # On a mesh the moments are re-initialized SHARDED below — skip the
        # eager unsharded init there (a throwaway full fp32 Adam state is a
        # transient ~2x optimizer memory spike on exactly the large models
        # the mesh path exists for).
        opt_state=tx.init(params) if mesh is None else None,
        batch_stats=variables.get("batch_stats"),
        constants=variables.get("constants"),
    )
    if mesh is not None:
        p_shard = shard_params(params, mesh)
        rep = replicate(mesh)
        params = jax.tree.map(jax.device_put, params, p_shard)
        # Adam moments mirror the param tree: jit sharding propagation gives
        # them the params' shardings (ZeRO-style, no replicated copies).
        opt_state = jax.jit(tx.init)(params)
        mesh_devices = set(np.asarray(mesh.devices).flat)

        def ensure_on_mesh(x):
            # Freshly-created scalars (step counts) can land on one device;
            # everything must span the mesh for the jitted step.
            if hasattr(x, "sharding") and set(x.sharding.device_set) != mesh_devices:
                return jax.device_put(x, rep)
            return x

        opt_state = jax.tree.map(ensure_on_mesh, opt_state)
        state = TrainState(
            step=jax.device_put(state.step, rep),
            params=params,
            opt_state=opt_state,
            batch_stats=jax.tree.map(lambda x: jax.device_put(x, rep), state.batch_stats)
            if state.batch_stats is not None
            else None,
            constants=jax.tree.map(lambda x: jax.device_put(x, rep), state.constants)
            if state.constants is not None
            else None,
        )
    return state


def _clamp_logit_scale(params):
    """In-place-equivalent clamp to ln(100) (reference train.py:209-210)."""
    if "logit_scale" in params:
        params = dict(params)
        params["logit_scale"] = jnp.clip(params["logit_scale"], 0, LOGIT_SCALE_MAX)
    return params


def _forward(model, variables, batch, rng, train: bool):
    mutable = ["batch_stats"] if (train and variables.get("batch_stats")) else False
    kwargs = dict(deterministic=not train)
    if rng is not None and train:
        kwargs["rngs"] = {"dropout": rng}
    second = (
        batch.get("tabular")
        if getattr(model, "uses_tabular", False)
        else batch.get("tokens")
    )
    out = model.apply(variables, batch["images"], second, mutable=mutable, **kwargs)
    if mutable:
        return out  # (out_dict, new_mutables)
    return out, {}


# Explicit per-loss argument specs: loss function -> ordered positional args,
# each resolved from the batch or the model output by `_resolve_loss_arg`.
# Keyed by "<module>.<qualname>" so no loss module is imported eagerly.
# New losses must register here (or via `register_loss_adapter`) — unknown
# losses fail loudly instead of being marshaled by signature heuristics.
_MP_SPEC = ("image_features", "text_features", "labels", "logit_scale")
_LOSS_ARG_SPECS: dict = {
    "mrclip_tpu.losses.contrastive.clip_loss": (
        "image_features", "text_features", "logit_scale"),
    "mrclip_tpu.losses.contrastive.multipositive_clip_loss": _MP_SPEC,
    "mrclip_tpu.ops.fused_loss.chunked_multipositive_clip_loss": _MP_SPEC,
    "mrclip_tpu.ops.pallas_loss.pallas_multipositive_clip_loss": _MP_SPEC,
    "mrclip_tpu.losses.contrastive.multipositive_clip_loss_with_vision": _MP_SPEC,
    "mrclip_tpu.losses.contrastive.multipositive_clip_loss_with_distance": (
        "image_features", "text_features", "labels",
        "echo_time", "repetition_time", "logit_scale"),
    "mrclip_tpu.losses.contrastive.multipositive_clip_loss_vision_only": (
        "image_features", "labels", "logit_scale"),
    "mrclip_tpu.losses.contrastive.siglip_loss": (
        "image_features", "text_features", "logit_scale", "logit_bias"),
    "mrclip_tpu.losses.contrastive.coca_loss": (
        "image_features", "text_features", "caption_logits", "caption_labels",
        "logit_scale"),
    "mrclip_tpu.ops.fused_loss.coca_loss_chunked": (
        "image_features", "text_features", "caption_hidden", "caption_proj",
        "caption_labels", "logit_scale"),
    "mrclip_tpu.losses.contrastive.distill_clip_loss": (
        "image_features", "text_features", "logit_scale",
        "dist_image_features", "dist_text_features", "dist_logit_scale"),
}

# Fields sourced from the data batch; everything else comes from model_out.
_BATCH_FIELDS = frozenset({"labels", "echo_time", "repetition_time"})
# model_out key aliases (CoCa emits decoder logits/labels under these names).
_MODEL_OUT_ALIASES = {"caption_logits": "logits", "caption_labels": "labels"}


def _loss_key(fn: Callable) -> str:
    return f"{fn.__module__}.{fn.__qualname__}"


def register_loss_adapter(fn: Callable, arg_spec: tuple) -> None:
    """Register the positional-argument spec for a custom loss so it can be
    driven by `make_loss_apply`. Each entry is a batch field (labels,
    echo_time, repetition_time) or a model-output field."""
    _LOSS_ARG_SPECS[_loss_key(fn)] = tuple(arg_spec)


def _resolve_loss_arg(name: str, model_out: dict, batch: dict):
    if name in _BATCH_FIELDS:
        if name not in batch:
            raise ValueError(
                f"loss requires batch['{name}'] but the data pipeline did not "
                f"provide it (batch keys: {sorted(batch)})"
            )
        return batch[name]
    if name == "logit_bias":
        return model_out.get("logit_bias", jnp.float32(0.0))
    key = _MODEL_OUT_ALIASES.get(name, name)
    if key not in model_out:
        raise ValueError(
            f"loss requires model output '{key}' but the model produced "
            f"{sorted(model_out)}"
        )
    return model_out[key]


def make_loss_apply(loss_fn: Callable[..., dict], mesh: Optional[Mesh] = None) -> Callable:
    """Adapt a factory loss to `(model_out, batch) -> dict` via the explicit
    adapter registry; in mesh mode, installs the row-sharded logits constraint
    when the loss supports it."""
    import inspect

    fn = loss_fn
    while isinstance(fn, partial):
        fn = fn.func
    spec = _LOSS_ARG_SPECS.get(_loss_key(fn))
    if spec is None:
        raise ValueError(
            f"No loss adapter registered for {_loss_key(fn)}. Register its "
            "positional-argument spec with "
            "mrclip_tpu.parallel.register_loss_adapter(fn, arg_spec); "
            f"known losses: {sorted(_LOSS_ARG_SPECS)}"
        )

    constrain = None
    if mesh is not None and "constrain" in inspect.signature(fn).parameters:
        sharding = NamedSharding(mesh, P(batch_spec()[0], None))
        constrain = lambda x: jax.lax.with_sharding_constraint(x, sharding)

    def loss_apply(model_out: dict, batch: dict) -> dict:
        args = [_resolve_loss_arg(name, model_out, batch) for name in spec]
        kwargs = {"constrain": constrain} if constrain is not None else {}
        return loss_fn(*args, **kwargs)

    return loss_apply


def build_train_step(
    model,
    loss_apply: Callable[[dict, dict], dict],
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    *,
    accum_freq: int = 1,
    cached_features_accum: bool = False,
    donate: bool = True,
    teacher: Optional[tuple] = None,
    freeze_bn_subtrees: tuple = (),
):
    """Compile the train step.

    batch: {'images': [N,H,W,3], 'tokens': [N,L], optional 'labels', TE/TR}.
    With `accum_freq > 1` the leading dim must be `accum_freq * microbatch`.
    Returns `step_fn(state, batch, rng) -> (state, metrics)`.
    """

    def compute_grads(params, state, batch, rng, batch_stats=None):
        def loss_fn(params):
            variables = {**state.variables(), "params": params}
            if batch_stats is not None:
                # accumulation threads BN running stats through microbatches
                variables["batch_stats"] = batch_stats
            out, new_mut = _forward(model, variables, batch, rng, train=True)
            if teacher is not None:
                # Distillation (reference DistillClipLoss + main.py dist_model
                # forward): teacher runs frozen, no grads.
                t_model, t_variables = teacher
                t_out, _ = _forward(t_model, t_variables, batch, None, train=False)
                out = dict(
                    out,
                    dist_image_features=jax.lax.stop_gradient(t_out["image_features"]),
                    dist_text_features=jax.lax.stop_gradient(t_out["text_features"]),
                    dist_logit_scale=jax.lax.stop_gradient(t_out["logit_scale"]),
                )
            ldict = loss_apply(out, batch)
            return ldict["loss"], (ldict, new_mut)

        (loss, (ldict, new_mut)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return grads, ldict, new_mut

    def apply_updates(state, grads, ldict, new_mut):
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = _clamp_logit_scale(params)
        metrics = dict(ldict)
        metrics["grad_norm"] = optax.global_norm(grads)
        batch_stats = new_mut.get("batch_stats", state.batch_stats)
        if batch_stats is not None and freeze_bn_subtrees and state.batch_stats is not None:
            # --lock-image-freeze-bn-stats (reference transformer.py:541 /
            # utils.freeze_batch_norm_2d): locked towers keep their running
            # statistics frozen too.
            batch_stats = dict(batch_stats)
            for tower in freeze_bn_subtrees:
                if tower in state.batch_stats:
                    batch_stats[tower] = state.batch_stats[tower]
        return (
            state.replace(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                batch_stats=batch_stats,
            ),
            metrics,
        )

    if accum_freq == 1:

        def step_fn(state, batch, rng):
            grads, ldict, new_mut = compute_grads(state.params, state, batch, rng)
            return apply_updates(state, grads, ldict, new_mut)

    elif not cached_features_accum:
        # Plain microbatch accumulation: microbatch grads are AVERAGED.
        # Each microbatch loss here normalizes over its own `m` rows, so the
        # mean of the N microbatch grads has the scale of one effective-batch
        # mean-loss gradient. (The cached branch below sums UNscaled like the
        # reference loop, train.py:161-183 — but each of its passes
        # normalizes over the full accum_freq*m spliced rows and only flows
        # through its own chunk, so that unscaled sum already IS one
        # full-batch-mean gradient. Summing here instead would make the step
        # accum_freq× larger than both the cached mode and a single big
        # batch under the same LR.)
        def step_fn(state, batch, rng):
            def micro(i, batch):
                return jax.tree.map(
                    lambda x: x.reshape((accum_freq, -1) + x.shape[1:])[i], batch
                )

            rngs = jax.random.split(rng, accum_freq)

            def body(carry, i):
                grad_sum, loss_sum, stats = carry
                grads, ldict, new_mut = compute_grads(
                    state.params, state, micro(i, batch), rngs[i], batch_stats=stats
                )
                if stats is not None:
                    stats = new_mut.get("batch_stats", stats)
                return (
                    jax.tree.map(jnp.add, grad_sum, grads),
                    loss_sum + ldict["loss"],
                    stats,
                ), None

            zero = jax.tree.map(jnp.zeros_like, state.params)
            (grad_sum, loss_sum, stats), _ = jax.lax.scan(
                body, (zero, jnp.float32(0.0), state.batch_stats), jnp.arange(accum_freq)
            )
            new_mut = {"batch_stats": stats} if stats is not None else {}
            inv = jnp.float32(1.0 / accum_freq)
            grad_mean = jax.tree.map(lambda g: g * inv, grad_sum)
            return apply_updates(state, grad_mean, {"loss": loss_sum / accum_freq}, new_mut)

    else:
        # Reference cached-feature scheme (train.py:134-183): pass 1 caches
        # features for all microbatches without grads; pass 2 re-forwards each
        # microbatch, splicing its live features into the cached global set so
        # every microbatch sees the full accumulated negatives.
        def step_fn(state, batch, rng):
            def micro(i):
                return jax.tree.map(
                    lambda x: x.reshape((accum_freq, -1) + x.shape[1:])[i], batch
                )

            rngs = jax.random.split(rng, accum_freq)
            variables = state.variables()

            def fwd_vars(stats):
                return dict(variables, batch_stats=stats) if stats is not None else variables

            # BN running stats update on EVERY train-mode forward in the
            # reference (both the no-grad cache pass and the grad pass), so
            # thread them sequentially through both scans.
            def cache_scan(stats, i):
                out, mut = _forward(model, fwd_vars(stats), micro(i), rngs[i], train=True)
                if stats is not None:
                    stats = mut.get("batch_stats", stats)
                return stats, (out["image_features"], out["text_features"])

            stats, (img_cache, txt_cache) = jax.lax.scan(
                cache_scan, state.batch_stats, jnp.arange(accum_freq)
            )
            img_cache = jax.lax.stop_gradient(img_cache)  # [A, m, D]
            txt_cache = jax.lax.stop_gradient(txt_cache)

            def grads_one(i, stats):
                def loss_fn(params):
                    vs = {**fwd_vars(stats), "params": params}
                    out, mut = _forward(model, vs, micro(i), rngs[i], train=True)
                    img = img_cache.at[i].set(out["image_features"])
                    txt = txt_cache.at[i].set(out["text_features"])
                    spliced = dict(
                        out,
                        image_features=img.reshape(-1, img.shape[-1]),
                        text_features=txt.reshape(-1, txt.shape[-1]),
                    )
                    full_batch = batch  # loss uses full labels for pos_mask
                    ldict = loss_apply(spliced, full_batch)
                    return ldict["loss"], (ldict, mut)

                (loss, (_, mut)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params
                )
                if stats is not None:
                    stats = mut.get("batch_stats", stats)
                return grads, loss, stats

            def body(carry, i):
                grad_sum, loss_sum, stats = carry
                grads, loss, stats = grads_one(i, stats)
                return (jax.tree.map(jnp.add, grad_sum, grads), loss_sum + loss, stats), None

            zero = jax.tree.map(jnp.zeros_like, state.params)
            (grad_sum, loss_sum, stats), _ = jax.lax.scan(
                body, (zero, jnp.float32(0.0), stats), jnp.arange(accum_freq)
            )
            # Reference semantics: per-microbatch backwards ACCUMULATE (sum)
            # into .grad with no 1/accum_freq scaling before optimizer.step()
            # (train.py:161-183) — matching dynamics requires the sum, not
            # the mean (r3 dynamics-parity finding).
            new_mut = {"batch_stats": stats} if stats is not None else {}
            return apply_updates(state, grad_sum, {"loss": loss_sum / accum_freq}, new_mut)

    donate_argnums = (0,) if donate else ()
    if mesh is None:
        jitted = jax.jit(step_fn, donate_argnums=donate_argnums)
    else:
        batch_sharding = NamedSharding(mesh, batch_spec())
        jitted = jax.jit(
            step_fn,
            donate_argnums=donate_argnums,
            in_shardings=(None, batch_sharding, None),
        )
    jitted.raw = step_fn  # un-jitted body, scannable for fused multi-step runs
    return jitted


def build_eval_step(model, mesh: Optional[Mesh] = None):
    """Jitted inference step: (variables, batch) -> features dict."""

    def eval_fn(variables, batch):
        out, _ = _forward(model, variables, batch, None, train=False)
        return out

    if mesh is None:
        return jax.jit(eval_fn)
    batch_sharding = NamedSharding(mesh, batch_spec())
    return jax.jit(eval_fn, in_shardings=(None, batch_sharding))
