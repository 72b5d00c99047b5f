"""Logging setup: stdout + optional file handler with parent-aware dedupe.

Same observable behavior as the reference logger factory (reference:
deepfm/utils/logging.py:8-41).
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path


def get_logger(name: str, log_file: str | None = None) -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger

    logger.setLevel(logging.INFO)
    formatter = logging.Formatter(
        "%(asctime)s [%(name)s] %(levelname)s: %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
    )

    parent_name = name.rsplit(".", 1)[0] if "." in name else None
    parent_configured = bool(
        parent_name and logging.getLogger(parent_name).handlers
    )
    if not parent_configured:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(formatter)
        logger.addHandler(handler)
        # Don't double-print through a configured root logger (absl/jax
        # often install one).
        logger.propagate = False

    if log_file is not None:
        Path(log_file).parent.mkdir(parents=True, exist_ok=True)
        file_handler = logging.FileHandler(log_file)
        file_handler.setFormatter(formatter)
        logger.addHandler(file_handler)

    return logger
