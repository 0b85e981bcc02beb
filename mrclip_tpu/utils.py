"""Small shared utilities.

Capability parity with reference `src/open_clip/utils.py`:
- `to_2tuple` (:49-61),
- `freeze_batch_norm_2d` (:9-45): in JAX, BN "freezing" decomposes into
  (a) running stats not updating — pass `train=False` / keep `batch_stats`
  out of the mutable set, and (b) scale/bias not training — an optax update
  mask (see `parallel.freeze`). `batch_norm_param_mask` builds (b).
- the bnb int8-linear replacement (:65-89) is CUDA-only; TPU quantization
  lives in `ops/` (Pallas int8 kernels) instead.
"""

from __future__ import annotations

import hashlib
import os
import shutil
from itertools import repeat
from typing import Any

import jax
import numpy as np

__all__ = [
    "to_2tuple",
    "to_ntuple",
    "batch_norm_param_mask",
    "enable_compilation_cache",
    "acquire_chip_lock",
]

_SENTINEL_NAME = ".inflight"


def _host_cpu_fingerprint() -> str:
    """Hash of the host CPU's feature flags.

    XLA:CPU cache entries are AOT-compiled native code; the persistent-cache
    key does NOT include the host ISA, so an entry written on a machine with
    e.g. AVX-512/AMX loads on a narrower host and dies with SIGILL/SIGABRT
    at execution (observed: the r3 `.jax_cache/` poisoning — this VM
    migrates between physical hosts across sessions). Namespacing the cache
    dir by this fingerprint makes foreign-ISA entries invisible.
    """
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha256(flags.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return hashlib.sha256(platform.processor().encode()).hexdigest()[:10]


def _cache_subdir(base: str) -> str:
    """Namespace the cache by jaxlib version + backend (+ CPU ISA for cpu).

    TPU executables are deserialized device-side (host-ISA-independent), so
    the tunnel cache survives VM migration; CPU executables are host native
    code and get the ISA fingerprint.
    """
    import jaxlib

    if _effective_platform() == "cpu":
        tag = f"cpu-{jaxlib.__version__}-{_host_cpu_fingerprint()}"
    else:
        tag = f"tpu-{jaxlib.__version__}"
    return os.path.join(base, tag)


def _effective_platform() -> str:
    """First entry of the platform priority list — the backend that will
    actually be used. Under axon the config reads "axon,cpu" (cpu is the
    FALLBACK, not the backend); a substring test would misclassify it."""
    plat = None
    try:
        plat = jax.config.jax_platforms  # set by conftest / CLI overrides
    except AttributeError:
        pass
    plat = plat or os.environ.get("JAX_PLATFORMS") or "axon"
    return plat.lower().split(",")[0].strip()


def enable_compilation_cache(
    default_dir: str | None = None, crash_sentinel: bool = False
) -> str | None:
    """Point JAX's persistent compilation cache at a local directory.

    TPU compiles through the tunnel take minutes; with the cache on, a rerun
    of an identical program (bench retries after a tunnel flap, the driver's
    round-end `bench.py` after the queue already measured the same config)
    deserializes the executable instead of recompiling. Entries are keyed by
    HLO + backend/compiler version — but NOT by host CPU ISA, so the actual
    dir is namespaced per jaxlib-version/backend/ISA (see `_cache_subdir`;
    r3's suite-crashing poisoned cache was a cross-host ISA mismatch).
    Obviously-bad (zero-length) entries are swept on enable; truncated ones
    JAX itself tolerates (warn + recompile — regression-tested).

    `crash_sentinel=True` (the test conftest) arms wipe-on-unclean-exit: a
    sentinel file is written now and removed at clean interpreter exit; if a
    previous run died mid-suite (native crash skips atexit), the sentinel is
    still present and the whole cache subdir is wiped before reuse, so
    reruns self-heal instead of re-crashing on the same poisoned entry.
    Only the cheap CPU test cache uses this — bench children are routinely
    SIGKILLed by tunnel-timeout caps and must not nuke the tunnel cache.

    Opt out (or redirect) with `MRCLIP_JAX_CACHE` (empty string disables).
    Returns the effective cache dir (None when disabled).
    """
    path = os.environ.get("MRCLIP_JAX_CACHE")
    if path is None:
        path = default_dir or os.path.join(
            os.path.expanduser("~"), ".cache", "mrclip_jax"
        )
    if not path:
        return None
    path = _cache_subdir(path)
    if os.path.basename(path).startswith("cpu-") and os.environ.get(
        "MRCLIP_JAX_CACHE_CPU"
    ) != "1":
        # XLA:CPU AOT deserialization is unreliable in jaxlib 0.9: a cached
        # train-step executable written minutes earlier by the SAME host
        # aborts the process on load with no diagnostic (reproduced
        # deterministically; r3's suite-killing SIGABRT). CPU compiles are
        # cheap (~35 s worst case) — persistent caching is only worth that
        # risk for the minutes-long TPU tunnel compiles, whose entries
        # deserialize server-side and are confirmed reliable. Opt back in
        # with MRCLIP_JAX_CACHE_CPU=1 (the hardening regression tests do).
        return None
    sentinel = os.path.join(path, _SENTINEL_NAME)
    try:
        if crash_sentinel and os.path.exists(sentinel):
            # Previous run crashed mid-suite: assume a poisoned entry.
            shutil.rmtree(path, ignore_errors=True)
        os.makedirs(path, exist_ok=True)
        # Sweep zero-length entries (interrupted writes).
        for name in os.listdir(path):
            p = os.path.join(path, name)
            if name != _SENTINEL_NAME and os.path.isfile(p) and os.path.getsize(p) == 0:
                os.unlink(p)
        if crash_sentinel:
            import atexit

            with open(sentinel, "w") as f:
                f.write(str(os.getpid()))
            atexit.register(lambda: os.path.exists(sentinel) and os.unlink(sentinel))
    except OSError:
        return None
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # Tiny test-model compiles churn the dir for no win; only persist
        # compiles that actually cost something.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # noqa: BLE001 - older jax without these knobs
        return None
    return path


_chip_lock_fd = None  # keep the fd alive: flock releases on close/exit


def acquire_chip_lock(timeout: float | None = None) -> bool:
    """Serialize access to the exclusive TPU chip across processes.

    The single chip queues concurrent processes, silently corrupting both
    sides' measurements (r3's official bench recorded 0.475x because a
    background queue co-occupied the chip). Every TPU entry point (bench,
    train CLI, smoke_learn) takes an exclusive `flock` on a well-known
    lockfile before touching the backend and holds it for the process
    lifetime; the kernel releases it on any exit, including SIGKILL.

    Blocks (logging once a minute) until the lock is free, up to `timeout`
    seconds (default env MRCLIP_CHIP_LOCK_TIMEOUT or 7200), then raises —
    failing loudly beats benchmarking a contended chip. No-op (returns
    False) when the lock is already held by this process tree
    (MRCLIP_CHIP_LOCKED=1) or disabled via MRCLIP_CHIP_LOCK="".
    """
    global _chip_lock_fd
    import fcntl
    import sys
    import time

    if os.environ.get("MRCLIP_CHIP_LOCKED") == "1" or _chip_lock_fd is not None:
        return False
    if _effective_platform() == "cpu":  # no chip (tests, explicit-CPU CLI runs)
        return False
    path = os.environ.get("MRCLIP_CHIP_LOCK", "/tmp/mrclip_tpu_chip.lock")
    if not path:
        return False
    if timeout is None:
        timeout = float(os.environ.get("MRCLIP_CHIP_LOCK_TIMEOUT", "7200"))
    fd = os.open(path, os.O_RDWR | os.O_CREAT, 0o666)
    deadline = time.monotonic() + timeout
    warned = 0.0
    while True:
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            break
        except OSError:
            now = time.monotonic()
            if now >= deadline:
                os.close(fd)
                raise TimeoutError(
                    f"TPU chip lock {path} still held after {timeout:.0f}s; "
                    "another TPU process is running — refusing to contend "
                    "for the exclusive chip"
                )
            if now >= warned:
                try:
                    holder = os.read(fd, 256).decode(errors="replace").strip()
                except OSError:
                    holder = "?"
                print(
                    f"[chip-lock] waiting for {path} (holder: {holder})",
                    file=sys.stderr,
                )
                warned = now + 60.0
            os.lseek(fd, 0, 0)
            time.sleep(2.0)
    os.ftruncate(fd, 0)
    os.lseek(fd, 0, 0)
    os.write(fd, f"pid={os.getpid()} argv={' '.join(sys.argv[:4])}".encode())
    os.environ["MRCLIP_CHIP_LOCKED"] = "1"  # children skip re-locking
    _chip_lock_fd = fd
    return True


def to_ntuple(n: int):
    def parse(x):
        if isinstance(x, (list, tuple)):
            return tuple(x)
        return tuple(repeat(x, n))

    return parse


to_2tuple = to_ntuple(2)


def batch_norm_param_mask(params: Any) -> Any:
    """Mask pytree: 0.0 on BatchNorm scale/bias, 1.0 elsewhere.

    Chain via `parallel.freeze.apply_update_mask` to freeze BN affine params
    (the reference's `freeze_batch_norm_2d`, utils.py:9-45).
    """

    def decide(path, leaf):
        name = jax.tree_util.keystr(path).lower()
        return np.float32(0.0 if ("bn" in name or "batchnorm" in name) else 1.0)

    return jax.tree_util.tree_map_with_path(decide, params)
