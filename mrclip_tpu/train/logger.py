"""Logging setup (reference `src/open_clip_train/logger.py:4-26`)."""

from __future__ import annotations

import logging


def setup_logging(log_file, level, include_host: bool = False):
    if include_host:
        import socket

        hostname = socket.gethostname()
        formatter = logging.Formatter(
            f"%(asctime)s |  {hostname} | %(levelname)s | %(message)s",
            datefmt="%Y-%m-%d,%H:%M:%S",
        )
    else:
        formatter = logging.Formatter(
            "%(asctime)s | %(levelname)s | %(message)s", datefmt="%Y-%m-%d,%H:%M:%S"
        )

    logging.root.setLevel(level)
    for logger in [logging.getLogger(n) for n in logging.root.manager.loggerDict]:
        logger.setLevel(level)
    # orbax/absl emit very chatty INFO during every save; keep them quiet.
    for noisy in ("orbax", "absl", "jax._src"):
        logging.getLogger(noisy).setLevel(max(level, logging.WARNING))

    stream_handler = logging.StreamHandler()
    stream_handler.setFormatter(formatter)
    logging.root.addHandler(stream_handler)

    if log_file:
        file_handler = logging.FileHandler(filename=log_file)
        file_handler.setFormatter(formatter)
        logging.root.addHandler(file_handler)
