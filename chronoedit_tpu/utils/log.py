"""Process-aware logger (reference: loguru rank-aware ``utils/log.py`` —
rank-0 filter with explicit rank prefixes)."""

from __future__ import annotations

import logging
import sys

import jax

_FORMAT = "%(asctime)s [%(levelname)s] %(name)s: %(message)s"


def get_logger(name: str = "chronoedit_tpu", rank0_only: bool = True,
               level: int = logging.INFO, log_file: str | None = None) -> logging.Logger:
    """Logger that (by default) only emits on process 0 of a multi-host run;
    non-rank0 records are prefixed with their process index when enabled."""
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(level)

    try:
        rank = jax.process_index()
    except Exception:
        rank = 0

    class _RankFilter(logging.Filter):
        def filter(self, record):
            if rank != 0:
                if rank0_only:
                    return False
                record.msg = f"[RANK {rank}] {record.msg}"
            return True

    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(logging.Formatter(_FORMAT))
    handler.addFilter(_RankFilter())
    logger.addHandler(handler)
    if log_file:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(fh)
    return logger
