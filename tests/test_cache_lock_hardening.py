"""Persistent compile-cache hardening + exclusive-chip lock regressions.

r3 shipped two process-hygiene failures (VERDICT.md r3): a poisoned
`.jax_cache/` entry SIGABRTed the suite with no self-healing, and the
official bench was corrupted by a second TPU process co-occupying the
exclusive chip. These tests pin the fixes in `mrclip_tpu/utils.py`:

- cache dirs are namespaced by jaxlib version + backend (+ host ISA on cpu)
  so foreign-host entries are invisible;
- zero-length (interrupted-write) entries are swept on enable;
- a crash sentinel wipes the cache subdir when a previous run died mid-suite;
- a truncated (corrupt) entry is tolerated: JAX warns and recompiles, the
  process survives;
- `acquire_chip_lock` excludes a second process and releases on SIGKILL
  (kernel-owned flock).
"""

import os
import signal
import subprocess
import sys
import time

import pytest

from mrclip_tpu.utils import _cache_subdir, _SENTINEL_NAME, enable_compilation_cache

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _restore(jax, prev):
    jax.config.update("jax_compilation_cache_dir", prev)


def test_cache_dir_namespaced_by_backend_and_isa(tmp_path):
    import jaxlib

    sub = _cache_subdir(str(tmp_path))
    tag = os.path.basename(sub)
    assert os.path.dirname(sub) == str(tmp_path)
    # Suite runs on cpu: tag carries backend, jaxlib version, and ISA hash
    # (entries are AOT native code; a foreign host's entries must land in a
    # different subdir).
    assert tag.startswith("cpu-")
    assert jaxlib.__version__ in tag
    parts = tag.split("-")
    assert len(parts[-1]) == 10, f"missing ISA fingerprint in {tag!r}"


def test_zero_length_entries_swept(tmp_path, monkeypatch):
    import jax

    monkeypatch.setenv("MRCLIP_JAX_CACHE_CPU", "1")
    monkeypatch.setenv("MRCLIP_JAX_CACHE", str(tmp_path))
    prev = jax.config.jax_compilation_cache_dir
    try:
        sub = _cache_subdir(str(tmp_path))
        os.makedirs(sub)
        open(os.path.join(sub, "interrupted-cache"), "w").close()  # 0 bytes
        with open(os.path.join(sub, "good-cache"), "w") as f:
            f.write("x" * 64)
        assert enable_compilation_cache() == sub
        assert not os.path.exists(os.path.join(sub, "interrupted-cache"))
        assert os.path.exists(os.path.join(sub, "good-cache"))
    finally:
        _restore(jax, prev)


def test_crash_sentinel_wipes_poisoned_cache(tmp_path, monkeypatch):
    import jax

    monkeypatch.setenv("MRCLIP_JAX_CACHE_CPU", "1")
    monkeypatch.setenv("MRCLIP_JAX_CACHE", str(tmp_path))
    prev = jax.config.jax_compilation_cache_dir
    try:
        sub = _cache_subdir(str(tmp_path))
        os.makedirs(sub)
        poisoned = os.path.join(sub, "poisoned-cache")
        with open(poisoned, "w") as f:
            f.write("x" * 64)
        # Simulate a previous run that died mid-suite: its sentinel remains.
        with open(os.path.join(sub, _SENTINEL_NAME), "w") as f:
            f.write("12345")

        assert enable_compilation_cache(crash_sentinel=True) == sub
        assert not os.path.exists(poisoned), "poisoned entry survived the wipe"
        # A fresh sentinel is armed for THIS process (removed at clean exit).
        assert os.path.exists(os.path.join(sub, _SENTINEL_NAME))

        # Without a stale sentinel the cache is NOT wiped on re-enable.
        keeper = os.path.join(sub, "keeper-cache")
        with open(keeper, "w") as f:
            f.write("y" * 64)
        os.unlink(os.path.join(sub, _SENTINEL_NAME))
        assert enable_compilation_cache(crash_sentinel=True) == sub
        assert os.path.exists(keeper)
    finally:
        _restore(jax, prev)


_CACHE_RUN = """
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
from mrclip_tpu.utils import enable_compilation_cache
sub = enable_compilation_cache()
assert sub, "cache refused despite MRCLIP_JAX_CACHE_CPU=1"
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
out = jax.jit(lambda x: (jnp.sin(x) @ x.T).sum())(jnp.ones((128, 128)))
print("OK", float(out), sub)
"""


@pytest.mark.slow
def test_truncated_cache_entry_tolerated(tmp_path):
    """Plant a truncated cache entry; the rerun must recompile, not crash."""
    env = dict(
        os.environ,
        MRCLIP_JAX_CACHE=str(tmp_path),
        MRCLIP_JAX_CACHE_CPU="1",
        JAX_PLATFORMS="cpu",
    )
    r1 = subprocess.run(
        [sys.executable, "-c", _CACHE_RUN], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=300,
    )
    assert r1.returncode == 0, r1.stderr[-2000:]
    sub = r1.stdout.split()[-1]
    entries = [
        os.path.join(sub, n) for n in os.listdir(sub) if n != _SENTINEL_NAME
    ]
    entries = [p for p in entries if os.path.getsize(p) > 0]
    assert entries, "first run persisted no cache entry"
    for p in entries:  # truncate to half: corrupt but non-empty
        size = os.path.getsize(p)
        with open(p, "r+b") as f:
            f.truncate(max(1, size // 2))

    r2 = subprocess.run(
        [sys.executable, "-c", _CACHE_RUN], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=300,
    )
    assert r2.returncode == 0, (
        f"truncated cache entry killed the rerun:\n{r2.stderr[-2000:]}"
    )
    assert r2.stdout.split()[0] == "OK"


_LOCK_HOLD = """
import os, sys, time
from mrclip_tpu.utils import acquire_chip_lock
assert acquire_chip_lock(timeout=5) is True
print("LOCKED", flush=True)
time.sleep(120)
"""

_LOCK_TRY = """
from mrclip_tpu.utils import acquire_chip_lock
try:
    acquire_chip_lock(timeout=2)
    print("ACQUIRED")
except TimeoutError:
    print("HELD")
"""


def test_chip_lock_two_process_exclusion_and_sigkill_release(tmp_path):
    lockfile = str(tmp_path / "chip.lock")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("MRCLIP_CHIP_LOCKED", "JAX_PLATFORMS")
    }
    env["MRCLIP_CHIP_LOCK"] = lockfile
    # acquire_chip_lock never touches a backend (pure flock), so forcing the
    # non-cpu platform string here is safe and exercises the real TPU path.
    env["JAX_PLATFORMS"] = "axon"

    holder = subprocess.Popen(
        [sys.executable, "-c", _LOCK_HOLD], env=env, cwd=REPO,
        stdout=subprocess.PIPE, text=True,
    )
    try:
        line = holder.stdout.readline().strip()
        assert line == "LOCKED", line

        r = subprocess.run(
            [sys.executable, "-c", _LOCK_TRY], env=env, cwd=REPO,
            capture_output=True, text=True, timeout=120,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert r.stdout.strip().endswith("HELD"), r.stdout

        # Children of the holder skip re-locking (no self-deadlock).
        env_child = dict(env, MRCLIP_CHIP_LOCKED="1")
        r = subprocess.run(
            [sys.executable, "-c", _LOCK_TRY], env=env_child, cwd=REPO,
            capture_output=True, text=True, timeout=120,
        )
        assert r.stdout.strip().endswith("ACQUIRED"), r.stdout

        # SIGKILL (no atexit, no cleanup) still releases the kernel flock.
        holder.kill()
        holder.wait(timeout=30)
        r = subprocess.run(
            [sys.executable, "-c", _LOCK_TRY], env=env, cwd=REPO,
            capture_output=True, text=True, timeout=120,
        )
        assert r.stdout.strip().endswith("ACQUIRED"), (
            f"flock not released on SIGKILL: {r.stdout!r}"
        )
    finally:
        if holder.poll() is None:
            holder.kill()
            holder.wait(timeout=30)


def test_chip_lock_noop_on_cpu():
    # The suite runs with jax_platforms=cpu: there is no chip to lock.
    from mrclip_tpu.utils import acquire_chip_lock

    assert acquire_chip_lock() is False
