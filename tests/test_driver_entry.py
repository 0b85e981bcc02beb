"""Driver surfaces: bench.py --quick and __graft_entry__ (entry +
dryrun_multichip) must stay runnable on CPU — the round driver invokes
all three directly."""

import json
import subprocess
import sys

import numpy as np
import pytest

import jax

REPO = __file__.rsplit("/tests/", 1)[0]


@pytest.mark.slow
def test_bench_quick_cli():
    """`python bench.py --quick` prints exactly one valid JSON metric line."""
    out = subprocess.run(
        [sys.executable, "bench.py", "--quick"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu", "HOME": "/root"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert {"metric", "value", "unit", "vs_baseline", "diag"} <= set(rec)
    assert rec["unit"] == "pairs/sec/chip"
    assert rec["value"] > 0 and np.isfinite(rec["value"])


@pytest.mark.slow
def test_bench_quick_infer_cli():
    """`python bench.py --quick --infer` prints one imgs/sec JSON line."""
    out = subprocess.run(
        [sys.executable, "bench.py", "--quick", "--infer"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu", "HOME": "/root"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][0])
    assert rec["unit"] == "imgs/sec/chip"
    assert rec["value"] > 0


def test_bench_retry_wrapper():
    """Without an explicit-CPU env the bench re-execs itself and retries on
    failure (tunnel-flap insurance for the driver's single invocation).
    A bogus flag fails at argparse — before jax is imported — so this
    exercises the wrapper without touching any backend."""
    env = {
        "PATH": "/usr/bin:/bin",
        "HOME": "/root",
        "MRCLIP_BENCH_ATTEMPTS": "2",
        "MRCLIP_BENCH_RETRY_SLEEP": "0",
        # The wrapper parent flocks the exclusive-chip lockfile before
        # spawning attempts; point it at a private file so this test never
        # queues behind (or stalls) a real TPU run on the shared machine.
        "MRCLIP_CHIP_LOCK": "/tmp/mrclip_test_retry_wrapper.lock",
    }
    out = subprocess.run(
        [sys.executable, "bench.py", "--bogus-flag"],
        cwd=REPO, capture_output=True, text=True, timeout=240, env=env,
    )
    assert out.returncode == 2  # argparse exit code propagated
    assert out.stderr.count("unrecognized arguments") == 2  # both attempts ran
    assert "[bench] attempt 1/2 failed" in out.stderr
    # Explicit CPU invocations bypass the wrapper (tests/CI stay fast).
    out = subprocess.run(
        [sys.executable, "bench.py", "--bogus-flag"],
        cwd=REPO, capture_output=True, text=True, timeout=120,
        env={**env, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 2
    assert out.stderr.count("unrecognized arguments") == 1


@pytest.mark.slow
def test_graft_entry_forward():
    import __graft_entry__ as ge

    fn, example_args = ge.entry()
    logits = jax.jit(fn)(*example_args)
    assert logits.shape == (4, 4)
    assert bool(np.all(np.isfinite(np.asarray(logits, np.float32))))


@pytest.mark.slow
def test_dryrun_multichip_subprocess():
    """Run in a subprocess the way the driver does (needs the virtual
    device flag set before jax initializes)."""
    code = (
        "import __graft_entry__ as ge; ge.dryrun_multichip(8)"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
        env={
            "PATH": "/usr/bin:/bin",
            "HOME": "/root",
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        },
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip OK" in out.stdout
    assert "tp=2" in out.stdout and "fsdp=2" in out.stdout
