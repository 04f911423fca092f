"""Process-aware logging (reference vit_utils/logging.py:9-132).

Rank 0 (``jax.process_index() == 0``) gets a StreamHandler at INFO plus an
optional FileHandler; other processes only log errors — the JAX-native
equivalent of the reference's torch.distributed rank gating.
"""
from __future__ import annotations

import functools
import logging
from typing import Optional

_initialized = {}


def _process_index() -> int:
    try:
        import jax
        return jax.process_index()
    except Exception:
        return 0


def get_logger(name: str = "easy_vitpose_tpu",
               log_file: Optional[str] = None,
               log_level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if name in _initialized:
        return logger
    rank = _process_index()
    fmt = logging.Formatter(
        "%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if rank == 0 and log_file is not None:
        fh = logging.FileHandler(log_file, "w")
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.setLevel(log_level if rank == 0 else logging.ERROR)
    logger.propagate = False
    _initialized[name] = True
    return logger


def print_log(msg, logger=None, level: int = logging.INFO):
    """print / logger / 'silent' dispatch (reference logging.py:85-111)."""
    if logger is None:
        print(msg)
    elif isinstance(logger, logging.Logger):
        logger.log(level, msg)
    elif logger == "silent":
        pass
    elif isinstance(logger, str):
        get_logger(logger).log(level, msg)
    else:
        raise TypeError(f"invalid logger {logger!r}")


def master_only(fn):
    """Run only on process 0 (reference dist_util.py:130-138)."""
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if _process_index() == 0:
            return fn(*args, **kwargs)
    return wrapper
