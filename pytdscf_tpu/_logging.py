"""Per-job logging (stdlib logging; replaces the reference's loguru sinks)."""

from __future__ import annotations

import logging
import os

_LOGGERS: dict[str, logging.Logger] = {}


def get_logger(jobname: str, verbose: int = 2) -> logging.Logger:
    """Logger writing to ``{jobname}/main.log`` (and stderr at high verbose)."""
    if jobname in _LOGGERS:
        return _LOGGERS[jobname]
    logger = logging.getLogger(f"pytdscf_tpu.{jobname}")
    logger.setLevel(logging.DEBUG if verbose > 2 else logging.INFO)
    logger.propagate = False
    os.makedirs(jobname, exist_ok=True)
    handler = logging.FileHandler(os.path.join(jobname, "main.log"), mode="w")
    handler.setFormatter(
        logging.Formatter("%(asctime)s | %(levelname)s | %(message)s")
    )
    logger.addHandler(handler)
    if verbose > 3:
        logger.addHandler(logging.StreamHandler())
    _LOGGERS[jobname] = logger
    return logger
