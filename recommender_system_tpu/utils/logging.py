"""Host-0 logging + seed discipline.

The reference's observability is bare ``print`` (SURVEY.md §5.5). This gives
the framework a process-aware logger (on multi-host meshes only process 0
speaks) and one place for run-level seeding (reference scattered literals:
``seed=1024`` ``layer/core.py:55,149``, ``RandomNormal(seed=2020)``).
"""
from __future__ import annotations

import logging
import sys
from typing import Optional

import numpy as np

_logger: Optional[logging.Logger] = None


def is_host_zero() -> bool:
    import jax

    try:
        return jax.process_index() == 0
    except Exception:
        return True


def get_logger(name: str = "recommender_system_tpu") -> logging.Logger:
    """Logger that is silent on non-zero hosts."""
    global _logger
    if _logger is not None:
        return _logger
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s: %(message)s", "%H:%M:%S"))
        logger.addHandler(handler)
    logger.setLevel(logging.INFO if is_host_zero() else logging.ERROR)
    logger.propagate = False
    _logger = logger
    return logger


def seed_everything(seed: int):
    """Numpy global + fresh jax PRNGKey from one seed (run-level discipline)."""
    import jax

    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
