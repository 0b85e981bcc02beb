"""Remote-sync behavior (train/file_utils.py vs reference file_utils.py:10-61):
fsspec local->local sync copies checkpoint files, skips the in-flight
`epoch_latest`, skips already-identical files, and overwrites size-changed
ones."""

import pytest

fsspec = pytest.importorskip("fsspec")

from mrclip_tpu.train.file_utils import remote_sync


def test_fsspec_sync_copies_and_excludes(tmp_path):
    local = tmp_path / "ckpts"
    remote = tmp_path / "remote"
    local.mkdir()
    remote.mkdir()
    (local / "epoch_3.bin").write_bytes(b"step3" * 100)
    (local / "results.jsonl").write_text('{"epoch": 3}\n')
    (local / "epoch_latest.bin").write_bytes(b"inflight")

    assert remote_sync(str(local), str(remote), "fsspec")
    assert (remote / "epoch_3.bin").read_bytes() == b"step3" * 100
    assert (remote / "results.jsonl").exists()
    assert not (remote / "epoch_latest.bin").exists(), "in-flight ckpt synced"


def test_fsspec_sync_updates_grown_files(tmp_path):
    local = tmp_path / "l"
    remote = tmp_path / "r"
    local.mkdir()
    remote.mkdir()
    (local / "results.jsonl").write_text("line1\n")
    assert remote_sync(str(local), str(remote), "fsspec")
    (local / "results.jsonl").write_text("line1\nline2\n")
    assert remote_sync(str(local), str(remote), "fsspec")
    assert (remote / "results.jsonl").read_text() == "line1\nline2\n"


def test_unknown_protocol_rejected(tmp_path):
    assert remote_sync(str(tmp_path), str(tmp_path), "carrier-pigeon") is False


def test_enable_compilation_cache(tmp_path, monkeypatch):
    """MRCLIP_JAX_CACHE redirects the persistent cache; "" disables setup.

    On the CPU backend (this suite) the cache is refused by default —
    XLA:CPU AOT deserialization can abort the interpreter (r3's suite-wide
    SIGABRT) — and only enabled with MRCLIP_JAX_CACHE_CPU=1, namespaced
    into a jaxlib-version/backend/ISA subdir of the requested path.
    """
    import jax

    from mrclip_tpu.utils import enable_compilation_cache

    prev = jax.config.jax_compilation_cache_dir
    try:
        # Default on CPU: refused (returns None, config untouched).
        monkeypatch.setenv("MRCLIP_JAX_CACHE", str(tmp_path / "c"))
        monkeypatch.delenv("MRCLIP_JAX_CACHE_CPU", raising=False)
        jax.config.update("jax_compilation_cache_dir", prev)
        assert enable_compilation_cache() is None
        assert jax.config.jax_compilation_cache_dir == prev

        # Opt-in: enabled under a namespaced subdir of the requested path.
        monkeypatch.setenv("MRCLIP_JAX_CACHE_CPU", "1")
        got = enable_compilation_cache()
        assert got is not None and got.startswith(str(tmp_path / "c"))
        assert jax.config.jax_compilation_cache_dir == got

        # Empty string disables: must not override a caller's config.
        monkeypatch.setenv("MRCLIP_JAX_CACHE", "")
        jax.config.update("jax_compilation_cache_dir", prev)
        assert enable_compilation_cache() is None
        assert jax.config.jax_compilation_cache_dir == prev

        # default_dir fallback when the env var is unset.
        monkeypatch.delenv("MRCLIP_JAX_CACHE")
        got = enable_compilation_cache(default_dir=str(tmp_path / "d"))
        assert got is not None and got.startswith(str(tmp_path / "d"))
        assert jax.config.jax_compilation_cache_dir == got
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
