"""Checkpoint-dir remote sync + resilient file IO.

Capability parity with reference `src/open_clip_train/file_utils.py`:
- `remote_sync` / `start_sync_process` (:10-61): background process syncing
  the checkpoint dir to s3/fsspec every N seconds, excluding the in-flight
  `epoch_latest` checkpoint.
- `pt_load`-style remote-capable load is covered by `checkpoint.py` (orbax
  handles gcs/s3-backed paths via fsspec when installed).
"""

from __future__ import annotations

import logging
import multiprocessing
import subprocess
import time

__all__ = ["remote_sync", "keep_running_remote_sync", "start_sync_process"]


def remote_sync_s3(local_dir: str, remote_dir: str) -> bool:
    result = subprocess.run(
        ["aws", "s3", "sync", local_dir, remote_dir, "--exclude", "*epoch_latest*"],
        capture_output=True,
    )
    if result.returncode != 0:
        logging.error(f"Error: Failed to sync with S3 bucket {result.stderr.decode()}")
        return False
    return True


def remote_sync_fsspec(local_dir: str, remote_dir: str) -> bool:
    try:
        import fsspec
    except ImportError:
        logging.error("fsspec is not installed; cannot remote-sync")
        return False
    a = fsspec.get_mapper(local_dir)
    b = fsspec.get_mapper(remote_dir)
    for k in a:
        if "epoch_latest" in k:
            continue
        if k in b and len(a[k]) == len(b[k]):
            continue
        try:
            b[k] = a[k]
        except Exception as e:
            logging.info(f"Error during remote sync for {k}: {e}")
            return False
    return True


def remote_sync(local_dir: str, remote_dir: str, protocol: str) -> bool:
    logging.info("Starting remote sync.")
    if protocol == "s3":
        return remote_sync_s3(local_dir, remote_dir)
    if protocol == "fsspec":
        return remote_sync_fsspec(local_dir, remote_dir)
    logging.error("Remote protocol not known")
    return False


def keep_running_remote_sync(sync_every: int, local_dir: str, remote_dir: str, protocol: str):
    while True:
        time.sleep(sync_every)
        remote_sync(local_dir, remote_dir, protocol)


def start_sync_process(sync_every: int, local_dir: str, remote_dir: str, protocol: str):
    return multiprocessing.Process(
        target=keep_running_remote_sync,
        args=(sync_every, local_dir, remote_dir, protocol),
        daemon=True,
    )
