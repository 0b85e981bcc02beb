"""Throughput benchmark: image-text pairs/sec/chip, ViT-B/16 global-batch
InfoNCE training step (the BASELINE.json north-star metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: open_clip ViT-B/16 on a single A100 (AMP, torch DDP) sustains
roughly 700 image-text pairs/sec/GPU (LAION training logs; the reference
repo itself publishes no numbers — BASELINE.md). vs_baseline = value / 700.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

A100_OPENCLIP_VITB16_PAIRS_PER_SEC = 700.0

# Peak dense bf16 TFLOP/s per chip, by device_kind substring.
_PEAK_TFLOPS = [
    ("v5 lite", 197.0),  # v5e ("lite" in device_kind)
    ("v5e", 197.0),
    ("v5p", 459.0),
    ("v6", 918.0),
    ("v4", 275.0),
    ("v3", 123.0),
    ("v2", 45.0),
]


def _report_mfu(lowerable, lower_args, dt, steps, batch, flops_div,
                gflops_per_pair=None):
    """Print XLA-cost-analysis-backed FLOPs + MFU to stderr (stdout keeps the
    one-JSON-line driver contract)."""
    import sys

    import jax

    try:
        lowered = lowerable.lower(*lower_args)
        cost = lowered.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        total_flops = float(cost["flops"]) * flops_div
    except Exception as e:  # noqa: BLE001 - diagnostics only
        if gflops_per_pair is None:
            print(f"[mfu] cost_analysis unavailable: {e!r} "
                  "(pass --gflops-per-pair from tools/flops_count.py)",
                  file=sys.stderr)
            return
        total_flops = gflops_per_pair * 1e9 * batch * steps
    kind = jax.devices()[0].device_kind
    peak = next((p for s, p in _PEAK_TFLOPS if s in kind.lower()), None)
    achieved = total_flops / dt / 1e12
    line = {
        "device_kind": kind,
        "flops_per_step": total_flops / steps,
        "gflops_per_pair": total_flops / steps / batch / 1e9,
        "achieved_tflops_per_sec": round(achieved, 2),
        "peak_tflops_per_sec": peak,
        "mfu": round(achieved / peak, 4) if peak else None,
    }
    print(f"[mfu] {json.dumps(line)}", file=sys.stderr)


def _maybe_rerun_with_retries():
    """Re-exec the bench in a child process and retry on failure.

    The TPU tunnel flaps (backend-init / remote_compile UNAVAILABLE); a
    single flap would otherwise lose the whole measurement for a driver
    that invokes bench.py exactly once. The parent never imports jax, so
    each attempt gets a fresh backend. Returns an exit code, or None when
    running as the inner child (or on an explicitly-CPU invocation, where
    retries only slow tests down).
    """
    import os
    import subprocess
    import sys

    if os.environ.get("MRCLIP_BENCH_INNER") == "1":
        return None
    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        return None
    attempts = max(1, int(os.environ.get("MRCLIP_BENCH_ATTEMPTS", "3")))
    if attempts == 1:
        return None
    # Serialize on the exclusive chip BEFORE spawning the first attempt:
    # holding the flock in the parent covers every retry child (they inherit
    # MRCLIP_CHIP_LOCKED and skip re-locking), so a concurrent queue script
    # can never interleave between attempts. Importing jax here does not
    # initialize a backend; children still get fresh ones.
    from mrclip_tpu.utils import acquire_chip_lock

    _t0 = time.perf_counter()
    acquire_chip_lock()
    lock_wait = time.perf_counter() - _t0
    env = dict(
        os.environ, MRCLIP_BENCH_INNER="1",
        MRCLIP_LOCK_WAIT_S=f"{lock_wait:.3f}",
    )
    # Per-attempt wall cap: a dead tunnel makes axon backend init BLOCK
    # (it does not fast-fail), which would hang the caller forever without
    # this. 4800s covers the slowest legit point (unrolled ViT-B tunnel
    # compile 8-15 min + 50 steps).
    cap = float(os.environ.get("MRCLIP_BENCH_ATTEMPT_TIMEOUT", "4800"))
    rc = 1
    for i in range(attempts):
        try:
            rc = subprocess.run(
                [sys.executable] + sys.argv, env=env, timeout=cap
            ).returncode
        except subprocess.TimeoutExpired:
            print(
                f"[bench] attempt {i + 1}/{attempts} exceeded {cap:.0f}s "
                "(hung tunnel?); killed",
                file=sys.stderr,
            )
            rc = 124
        if rc == 0:
            return 0
        if i + 1 < attempts:
            sleep_s = float(os.environ.get("MRCLIP_BENCH_RETRY_SLEEP", "120"))
            print(
                f"[bench] attempt {i + 1}/{attempts} failed (rc={rc}); "
                f"sleeping {sleep_s:.0f}s then retrying (tunnel flap?)",
                file=sys.stderr,
            )
            import time as _time

            _time.sleep(sleep_s)
    return rc


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true", help="tiny model, few steps (CI)")
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--steps", type=int, default=50)
    parser.add_argument("--model", type=str, default=None)
    parser.add_argument("--remat", action="store_true", help="per-block grad checkpointing")
    parser.add_argument(
        "--fused", action=argparse.BooleanOptionalAction, default=True,
        help="fuse timed steps into one lax.scan dispatch (default; "
        "--no-fused times a per-step python loop instead)",
    )
    parser.add_argument("--no-scan", action="store_true", help="unroll transformer layers instead of lax.scan")
    parser.add_argument("--precision", type=str, default=None, help="override precision (bf16|pure_bf16|fp32)")
    parser.add_argument("--loss-impl", type=str, default="dense", choices=["dense", "chunked", "pallas"])
    parser.add_argument(
        "--loss", type=str, default="multipositive",
        choices=["multipositive", "clip", "siglip"],
        help="objective for the train point: multipositive (MR-CLIP default), "
        "plain InfoNCE, or SigLIP pairwise sigmoid",
    )
    parser.add_argument("--remat-policy", type=str, default="dots", choices=["full", "dots", "mlp_only"])
    parser.add_argument(
        "--attn-impl", type=str, default=None,
        choices=["xla", "manual", "bf16", "flash", "fused", "fusedp"],
        help="attention kernel. Default: fusedp (packed-layout Pallas "
        "kernel, scores VMEM-resident; batched head mode measures 957 vs "
        "863 pairs/s at b88) for the headline ViT-B-16 train point and "
        "EVA02-B-16, bf16 (score/prob tensors stored in the compute dtype) "
        "everywhere else — fusedp pads the sequence to the kernel tile, "
        "which loses at e.g. ViT-L-14's 257 tokens (216.8 vs 228.2 "
        "measured). xla = fp32 scores (strict-parity numerics), flash = "
        "loop-based Pallas flash kernel (long-seq configs), fused = "
        "grouped-layout Pallas kernel (736.97 at b88 — the transpose/pad "
        "copies it needs lose to fusedp's natural layout)",
    )
    parser.add_argument(
        "--swiglu-fused", action="store_true",
        help="SwiGLU towers (EVA02): hold gate||value as ONE [D, 2H] param "
        "— halves the fwd x-reads and merges the bwd dx matmuls "
        "(models.layers.SwiGLU.fused_gate; throughput experiment)",
    )
    parser.add_argument(
        "--gelu-approx", action=argparse.BooleanOptionalAction, default=True,
        help="tanh-approximate GELU (default on: keeps the erf off the VPU "
        "inside the MLP matmul fusions; measured 863 vs 791 pairs/s at b88; "
        "--no-gelu-approx for strict erf parity numerics)",
    )
    parser.add_argument(
        "--bf16-moments", action=argparse.BooleanOptionalAction, default=True,
        help="store Adam mu in bf16 (default on: halves mu memory, "
        "measured-neutral-to-positive throughput)",
    )
    parser.add_argument(
        "--fp32-images", action="store_true",
        help="feed pre-normalized fp32 images (legacy); default feeds uint8 "
        "canvases and normalizes on-device, matching the --native-loader "
        "production path (1 byte/px H2D instead of 4)",
    )
    parser.add_argument("--mfu", action="store_true", help="print XLA cost-analysis FLOPs + MFU to stderr")
    parser.add_argument(
        "--gflops-per-pair", type=float, default=None,
        help="known GFLOPs/pair for the MFU report (from tools/flops_count.py; "
        "the axon TPU client returns no cost analysis)",
    )
    parser.add_argument("--trace", type=str, default=None, help="capture a jax.profiler trace into this dir")
    parser.add_argument(
        "--opt", type=str, default="adamw",
        choices=["adamw", "sgd", "lion", "adafactor"],
        help="optimizer (adafactor's factored second moment fits ~1B-param "
             "models on one 16G chip where Adam state cannot)",
    )
    parser.add_argument(
        "--infer", action="store_true",
        help="measure forward-only encode_image throughput instead of the train step",
    )
    parser.add_argument(
        "--int8", action="store_true",
        help="with --infer: W8A8 int8 quantized encode (ops/quant.py; "
        "int8 MXU matmuls at 2x bf16 FLOP rate)",
    )
    parser.add_argument(
        "--windows", type=int, default=None,
        help="timed measurement windows of --steps each (default 3 on TPU, "
        "1 on CPU/--quick). Each window is timed individually (value "
        "includes one dispatch+fetch round-trip through the tunnel), then "
        "all windows run back-to-back with a single final fetch — the "
        "chained number amortizes the fixed tunnel RTT over windows*steps "
        "and is the reported steady-state `value`; the per-window spread "
        "and the RTT estimate are emitted alongside for diagnosability "
        "(r4's official 871 vs the defended 950 at a 4.6s single window "
        "is exactly one ~0.4s RTT of unamortized fixed overhead)",
    )
    args = parser.parse_args()

    import os

    import jax

    # Honor an explicit platform request: some TPU-plugin environments
    # register themselves ahead of the JAX_PLATFORMS env var, so a caller's
    # `JAX_PLATFORMS=cpu python bench.py` would silently run on the TPU.
    # The plugin's sitecustomize injects JAX_PLATFORMS=axon into every
    # process; that value is not a caller request (see export.py).
    _envp = os.environ.get("JAX_PLATFORMS")
    if _envp and _envp.lower() != "axon":
        jax.config.update("jax_platforms", _envp)

    from mrclip_tpu.utils import acquire_chip_lock, enable_compilation_cache

    # No-op on CPU and when the retry-wrapper parent already holds it.
    _t_lock = time.perf_counter()
    acquire_chip_lock()
    # The retry-wrapper parent takes the real (possibly contended) lock and
    # forwards its wait; the child's own acquire is then a no-op.
    lock_wait_s = max(
        time.perf_counter() - _t_lock,
        float(os.environ.get("MRCLIP_LOCK_WAIT_S", "0") or 0),
    )
    cache_dir = enable_compilation_cache()

    import jax.numpy as jnp

    from mrclip_tpu.factory import create_loss, create_model
    from mrclip_tpu.parallel import (
        build_train_step,
        create_optimizer,
        create_train_state,
        make_loss_apply,
    )

    on_tpu = jax.default_backend() == "tpu"
    if args.quick or not on_tpu:
        model_name = args.model or "ViT-B-32-mini"
        batch = args.batch_size or 16
        img_size, ctx = 64, 32
        if args.model is not None:
            # An explicit model must use its config's shapes even in quick
            # mode: CoCa pos-embeds are sized ctx(+CLS), ConvNeXt stages
            # assume the config resolution, etc.
            from mrclip_tpu.factory import get_model_config

            qcfg = get_model_config(model_name) or {}
            img_size = qcfg.get("vision_cfg", {}).get("image_size", img_size)
            if not isinstance(img_size, int):
                img_size = img_size[0]
            ctx = qcfg.get("text_cfg", {}).get("context_length", ctx)
            mcfg = qcfg
        steps = min(args.steps, 5)
    else:
        model_name = args.model or "ViT-B-16"
        # b88 measured reproducibly best (791 vs 787 at b80) under the
        # attn-bf16 + bf16-mu defaults; the b80-96 peak is flat.
        batch = args.batch_size or 88
        # shapes follow the model config (convnext_base_w is 256px, biomed
        # ctx 256, ...); ViT-B-16 default stays 224/98
        from mrclip_tpu.factory import get_model_config

        mcfg = get_model_config(model_name) or {}
        img_size = mcfg.get("vision_cfg", {}).get("image_size", 224)
        if not isinstance(img_size, int):
            img_size = img_size[0]
        ctx = mcfg.get("text_cfg", {}).get("context_length", 98)
        steps = args.steps
    # SigLIP/i18n configs use 32k/250k sentencepiece vocabs (coca-mini 1000);
    # random ids must stay in range (JAX clamps OOB gathers silently).
    vocab = 49408
    if args.model is not None or not (args.quick or not on_tpu):
        vocab = mcfg.get("text_cfg", {}).get("vocab_size", 49408)

    attn_impl = args.attn_impl
    if attn_impl is None:
        # fusedp measured 891.97/893.58 pairs/s at b88/b84 (vs 863.5 bf16)
        # on the headline ViT-B-16 train point and is learnability-validated
        # (smoke_learn fusedp R@1=1.0); EVA02-B-16 (same 197-token packed
        # layout) measured 749.6 vs 608.2 at b64 (+23%, r4_bench.log). Its
        # tile padding loses on other shapes (ViT-L-14 257 tokens: 216.8 vs
        # 228.2) and at small serving batches (b8 infer: 2396 vs 2895), so
        # other models and the serving path keep the bf16 default.
        headline = on_tpu and not args.quick and args.model is None and not args.infer
        fusedp_wins = headline or (
            on_tpu
            and not args.infer
            # r5: fusedp also wins at ViT-B-32's 50-token packed layout
            # (2242.2 vs 2058 at b256, +9%, tools/r5_bench.log R5Q10)
            and args.model in ("ViT-B-16", "EVA02-B-16", "ViT-B-32")
        )
        attn_impl = "fusedp" if fusedp_wins else "bf16"
    model, variables = create_model(
        model_name,
        precision=args.precision or ("bf16" if on_tpu else "fp32"),
        grad_checkpointing=args.remat,
        remat_policy=args.remat_policy,
        attn_impl=attn_impl,
        gelu_approx=args.gelu_approx,
        swiglu_fused=args.swiglu_fused,
        # --int8 quantizes only 2D (unrolled) kernels; force the unrolled
        # layout so deep models don't silently measure an unquantized stack.
        scan_layers=False if (args.no_scan or args.int8) else None,
    )

    if args.infer:
        # Serving throughput: forward-only encode_image. The scan carry
        # perturbs each iteration's input so XLA can't hoist the encode out
        # of the loop as loop-invariant (it will, and report ~17x, if every
        # iteration is identical).
        batch = args.batch_size or (256 if on_tpu else 16)
        rng = np.random.RandomState(0)
        imgs = jnp.asarray(rng.rand(batch, img_size, img_size, 3), jnp.float32)

        if args.int8:
            from mrclip_tpu.ops.quant import make_quantized_apply, quantize_dense_kernels

            variables, qkernels = quantize_dense_kernels(variables)
            qapply = make_quantized_apply(model)
            apply_img = lambda v, q, x: qapply(v, q, x, None)["image_features"]
        else:
            qkernels = {}
            apply_img = lambda v, q, x: model.apply(v, x, method=model.encode_image)

        @jax.jit
        def encode_n(variables, qkernels, imgs):
            def body(c, _):
                f = apply_img(variables, qkernels, imgs + c)
                return (f[0, 0] * 1e-6).astype(jnp.float32), f[:1].sum()
            return jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=steps)[1]

        float(encode_n(variables, qkernels, imgs)[-1])  # compile + warmup
        t0 = time.perf_counter()
        float(encode_n(variables, qkernels, imgs)[-1])
        dt = time.perf_counter() - t0
        value = batch * steps / dt / (jax.device_count() if on_tpu else 1)
        tag = ", int8 W8A8" if args.int8 else ""
        # ~1400 imgs/sec: single-A100 fp16 open_clip ViT-B/16 encode estimate
        # (ViT-B-16 only; a cross-model ratio would be meaningless).
        print(json.dumps({
            "metric": f"images/sec/chip ({model_name} encode_image, forward only{tag})",
            "value": round(value, 2),
            "unit": "imgs/sec/chip",
            "vs_baseline": (
                round(value / 1400.0, 3) if model_name == "ViT-B-16" else None
            ),
        }))
        return

    class LossArgs:
        multipositiveloss = args.loss == "multipositive"
        siglip = args.loss == "siglip"
        delta = 0.5
        distance = visiononly = distill = False
        lam = None
        model = model_name
        gather_with_grad = True
        chunked_loss = args.loss_impl == "chunked"
        pallas_loss = args.loss_impl == "pallas"
        loss_chunk_size = 1024
        # Keep the streamed captioning-CE chunk's [B, chunk, vocab] fp32
        # logits at a constant byte budget as batch grows (16 was measured
        # at b96; b128 with 16 OOMed the 15.75G chip).
        caption_chunk_size = max(4, (16 * 96) // batch)

    tx = create_optimizer(
        lr=1e-4, wd=0.2, opt=args.opt,
        moments_dtype="bfloat16" if args.bf16_moments else None
    )
    state = create_train_state(variables, tx)
    step = build_train_step(model, make_loss_apply(create_loss(LossArgs())), tx, donate=True)

    rng = np.random.RandomState(0)
    if args.fp32_images:
        images = jnp.asarray(rng.rand(batch, img_size, img_size, 3), jnp.float32)
        prep = lambda b: b
    else:
        # Production parity: the native loader ships uint8 canvases over
        # H2D (1 byte/px); ToTensor+Normalize happens on-device as part of
        # the compiled step (ops/image_ops.py:normalize_images).
        from mrclip_tpu.ops.image_ops import normalize_images

        images = jnp.asarray(
            rng.randint(0, 256, (batch, img_size, img_size, 3)), jnp.uint8
        )
        prep = lambda b: dict(b, images=normalize_images(b["images"]))
    batch_data = {
        "images": images,
        "tokens": jnp.asarray(rng.randint(1, vocab, (batch, ctx)), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 32, (batch,)), jnp.int32),
    }
    key = jax.random.key(0)

    import contextlib
    import sys

    @contextlib.contextmanager
    def best_effort_trace(log_dir):
        # Profiling through the tunnel may be unsupported; never let it kill
        # the measurement.
        started = False
        try:
            jax.profiler.start_trace(log_dir, create_perfetto_trace=True)
            started = True
        except Exception as e:  # noqa: BLE001
            print(f"[trace] start failed: {e!r}", file=sys.stderr)
        try:
            yield
        finally:
            if started:
                try:
                    jax.profiler.stop_trace()
                except Exception as e:  # noqa: BLE001
                    print(f"[trace] stop failed: {e!r}", file=sys.stderr)

    trace_ctx = best_effort_trace(args.trace) if args.trace else contextlib.nullcontext()

    windows = args.windows or (3 if (on_tpu and not args.quick) else 1)
    win_vals = []  # per-window pairs/s, each incl. one dispatch+fetch RTT
    warmup_s = None

    if args.fused:
        # Fuse the timed steps into one lax.scan dispatch: per-call dispatch
        # latency is paid once; the device still executes `steps` sequential
        # full train steps. Useful when driving a remote chip with high RTT.
        @jax.jit
        def run_n(state, keys):
            def body(s, k):
                s, m = step.raw(s, prep(batch_data), k)
                return s, m["loss"]

            return jax.lax.scan(body, state, keys)

        keys = jax.random.split(key, steps)
        _t_w = time.perf_counter()
        state2, losses = run_n(state, keys)  # compile + warmup
        float(losses[-1])
        warmup_s = time.perf_counter() - _t_w
        # Individually-timed windows: run-to-run spread at this instant.
        s = state
        for _ in range(windows):
            t0 = time.perf_counter()
            s, losses = run_n(s, keys)
            float(losses[-1])
            win_vals.append(batch * steps / (time.perf_counter() - t0))
        # Chained steady-state measurement: `windows` dispatches back to
        # back, ONE final value fetch. Dispatch overlaps execution, so the
        # fixed tunnel round-trip is amortized over windows*steps — this is
        # the number a long training run sustains and the reported value.
        with trace_ctx:
            t0 = time.perf_counter()
            s = state
            for _ in range(windows):
                s, losses = run_n(s, keys)
            final_loss = float(losses[-1])
            dt = time.perf_counter() - t0
        # Cost-analyze ONE step: XLA counts a lax.scan body once, not
        # x trip-count, so lowering run_n would under-report by `steps`.
        lowerable = jax.jit(lambda s, b, k: step.raw(s, prep(b), k))
        lower_args = (state, batch_data, key)
        total_steps = steps * windows
    else:
        windows = 1  # per-step dispatch path times one window
        fstep = jax.jit(lambda s, b, k: step.raw(s, prep(b), k), donate_argnums=(0,))
        # warmup / compile (value fetch forces real execution)
        _t_w = time.perf_counter()
        state, metrics = fstep(state, batch_data, key)
        float(metrics["loss"])
        warmup_s = time.perf_counter() - _t_w
        with trace_ctx:
            t0 = time.perf_counter()
            for i in range(steps):
                state, metrics = fstep(state, batch_data, jax.random.fold_in(key, i))
            final_loss = float(metrics["loss"])  # syncs the whole chain
            dt = time.perf_counter() - t0
        lowerable, lower_args = fstep, (state, batch_data, key)
        total_steps = steps
    flops_div = float(total_steps)  # cost analysis covers one step
    assert np.isfinite(final_loss)

    if args.mfu:
        _report_mfu(lowerable, lower_args, dt, total_steps, batch, flops_div,
                    gflops_per_pair=args.gflops_per_pair)

    pairs_per_sec = batch * total_steps / dt
    n_chips = jax.device_count() if on_tpu else 1
    value = pairs_per_sec / n_chips
    # create_loss dispatches coca models to coca_loss (contrastive +
    # captioning) ahead of the --loss flag, mirroring the reference factory.
    loss_desc = (
        "CoCa contrastive+captioning"
        if "coca" in model_name.lower()
        else {
            "multipositive": "multipositive InfoNCE",
            "clip": "InfoNCE",
            "siglip": "SigLIP sigmoid",
        }[args.loss]
    )
    result = {
        "metric": f"image-text pairs/sec/chip ({model_name} {loss_desc} train step)",
        "value": round(value, 2),
        "unit": "pairs/sec/chip",
        # The A100 open_clip anchor is a ViT-B/16 number; a cross-model
        # ratio (e.g. ViTamin-L at 0.28) reads as a regression, so only the
        # headline model reports it (r4 verdict item 3).
        "vs_baseline": (
            round(value / A100_OPENCLIP_VITB16_PAIRS_PER_SEC, 3)
            if model_name == "ViT-B-16" else None
        ),
    }
    # Exact CPU-lowered FLOPs bases (tools/flops_count.py, at each model's
    # measured operating batch; the loss term makes per-pair FLOPs weakly
    # batch-dependent, <1%) -> report measured MFU vs the v5e 197 TFLOP/s
    # bf16 peak. Key: (model, gelu_approx).
    _GFLOPS_BASIS = {
        ("ViT-B-16", True): 128.593,   # b88
        ("ViT-B-16", False): 129.134,  # b88
        ("ViT-B-32", True): 49.340,    # b256
        ("RN50", True): 57.043,        # b128 (relu tower: flag-invariant)
        ("RN50", False): 57.043,
        ("EVA02-B-16", True): 123.681,  # b64
        ("coca_ViT-B-32", True): 99.702,  # b96
        # r5 (tools/r5_flops.log): every benched family carries an exact
        # CPU-lowered basis at its measured operating batch. Big towers are
        # counted WITHOUT remat (MFU = model FLOPs, not executed/HFU).
        ("ViT-L-14", True): 538.873,   # b16
        ("EVA02-L-14", True): 528.089,  # b16
        ("ViT-SO400M-14-SigLIP", True): 823.158,  # b16
        ("convnext_base_w", True): 156.614,  # b64
        ("MobileCLIP-S1", True): 46.964,  # b256
        ("MobileCLIP-S2", True): 66.582,  # b64
        ("MobileCLIP-B", True): 132.425,  # b64
        ("ViTamin-L", True): 489.083,  # b16 (param-anchored r5 stage table)
        ("ViT-H-14", True): 1187.654,  # b16
        ("EVA01-g-14", True): 1647.650,  # b8
    }
    basis = _GFLOPS_BASIS.get((model_name, bool(args.gelu_approx)))
    if on_tpu and basis and not args.infer:
        kind = jax.devices()[0].device_kind.lower()
        peak = next((p for s, p in _PEAK_TFLOPS if s in kind), None)
        if peak is not None:
            result["mfu_pct"] = round(100.0 * value * basis * 1e9 / (peak * 1e12), 1)
    # Environment fingerprint + run-to-run spread, so a deviant scoreboard
    # number is diagnosable after the fact (r4 verdict item 1: the official
    # 871.02 vs the defended 950.4 had no variance data to arbitrate).
    if win_vals:
        result["windows_pairs_per_sec"] = [round(w, 1) for w in win_vals]
        med = float(np.median(win_vals))
        if med > 0:
            result["window_spread_pct"] = round(
                100.0 * (max(win_vals) - min(win_vals)) / med, 2
            )
        # Mean per-window wall time minus the chained per-window share =
        # the fixed dispatch+fetch round-trip each isolated window pays.
        mean_win_dt = float(np.mean([batch * steps / w for w in win_vals]))
        result["fixed_overhead_s_est"] = round(mean_win_dt - dt / windows, 3)
    result["diag"] = {
        "device_kind": jax.devices()[0].device_kind if on_tpu else "cpu",
        "steps": steps,
        "windows": windows,
        "batch": batch,
        "attn_impl": attn_impl,
        "warmup_s": round(warmup_s, 1) if warmup_s is not None else None,
        "lock_wait_s": round(lock_wait_s, 1),
        "compile_cache": cache_dir or "disabled",
        "final_loss": round(final_loss, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    _rc = _maybe_rerun_with_retries()
    if _rc is None:
        main()
    else:
        raise SystemExit(_rc)
