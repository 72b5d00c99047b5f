"""Run logging.

Behavioral contract (kept compatible with the reference logger factory,
reference: deepfm/utils/logging.py:8-41): INFO-level lines like
``2026-01-01 12:00:00 [deepfm_tpu] INFO: message`` on stdout, an
optional per-run file sink, and no duplicate emission when a child
logger (``deepfm_tpu.trainer``) is fetched under an already-configured
ancestor — the child just propagates upward.

One deviation that matters in this runtime: absl/jax usually install a
root handler, so a logger that owns its own stream sink disables
propagation — otherwise every line would print twice.
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

LINE_FORMAT = "%(asctime)s [%(name)s] %(levelname)s: %(message)s"
TIME_FORMAT = "%Y-%m-%d %H:%M:%S"


def _ancestry(name: str):
    """Dotted-name ancestors, nearest first: a.b.c -> a.b, a."""
    parts = name.split(".")
    for i in range(len(parts) - 1, 0, -1):
        yield ".".join(parts[:i])


def _emits_via_ancestor(name: str) -> bool:
    return any(logging.getLogger(a).handlers for a in _ancestry(name))


def _attach(logger: logging.Logger, sink: logging.Handler) -> None:
    sink.setFormatter(logging.Formatter(LINE_FORMAT, datefmt=TIME_FORMAT))
    logger.addHandler(sink)


def get_logger(name: str, log_file: str | None = None) -> logging.Logger:
    """Fetch (and on first use, configure) the named run logger."""
    logger = logging.getLogger(name)
    if logger.handlers:  # already configured by an earlier call
        return logger
    logger.setLevel(logging.INFO)
    if not _emits_via_ancestor(name):
        _attach(logger, logging.StreamHandler(sys.stdout))
        logger.propagate = False
    if log_file is not None:
        Path(log_file).parent.mkdir(parents=True, exist_ok=True)
        _attach(logger, logging.FileHandler(log_file))
    return logger
