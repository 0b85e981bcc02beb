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
    """MRCLIP_JAX_CACHE redirects the persistent cache; "" disables setup."""
    import jax

    from mrclip_tpu.utils import enable_compilation_cache

    prev = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.setenv("MRCLIP_JAX_CACHE", str(tmp_path / "c"))
        enable_compilation_cache()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "c")

        monkeypatch.setenv("MRCLIP_JAX_CACHE", "")
        jax.config.update("jax_compilation_cache_dir", prev)
        enable_compilation_cache()  # no-op: must not override the restore
        assert jax.config.jax_compilation_cache_dir == prev

        monkeypatch.delenv("MRCLIP_JAX_CACHE")
        enable_compilation_cache(default_dir=str(tmp_path / "d"))
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "d")
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
