"""Logging utilities (rebuild of reference nesvor/utils/logger.py).

Console + optional file handlers at verbosity 0/1/2, global excepthook to
logging.error, fixed-width train table, lazy formatting, and parameter
inventory dump (adapted from nn.Module state to JAX pytrees).
"""

from __future__ import annotations

import logging
import sys
from typing import Any, Callable

import jax
import numpy as np


class LazyLog:
    """Deferred formatting (reference logger.py:9-16)."""

    def __init__(self, fn: Callable[[], Any]) -> None:
        self.fn = fn

    def __str__(self) -> str:
        return str(self.fn())


class TrainLogger:
    """Fixed-width table rows (reference logger.py:19-36)."""

    def __init__(self, *headers: str, width: int = 12) -> None:
        self.width = width
        self.headers = headers
        row = "".join(("%" + str(max(width, len(h) + 1)) + "s") % h for h in headers)
        logging.info(row)

    def log(self, *values) -> None:
        items = []
        for h, v in zip(self.headers, values):
            w = max(self.width, len(h) + 1)
            if isinstance(v, float):
                items.append(("%" + str(w) + ".3e") % v)
            else:
                items.append(("%" + str(w) + "s") % str(v))
        logging.info("".join(items))


def log_params(params) -> str:
    """Parameter-inventory table for a pytree (reference logger.py:39-54)."""
    rows = []
    total = 0
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        n = int(np.prod(leaf.shape)) if hasattr(leaf, "shape") else 1
        total += n
        rows.append(f"  {name:<60s} {str(getattr(leaf, 'shape', ())):<20s} {n:>12d}")
    return (
        "model parameters:\n"
        + f"  {'name':<60s} {'shape':<20s} {'count':>12s}\n"
        + "\n".join(rows)
        + f"\n  total: {total}"
    )


def log_args(args) -> None:
    logging.debug(
        "\n".join(
            ["Namespace:"]
            + [f"  {k} = {v}" for k, v in sorted(vars(args).items())]
        )
    )


def setup_logger(filename=None, verbose: int = 1) -> None:
    """Console+file handlers, verbosity map 0/1/2 -> WARNING/INFO/DEBUG, and
    sys.excepthook -> logging.error (reference logger.py:68-101)."""
    if verbose >= 2:
        level = logging.DEBUG
    elif verbose == 1:
        level = logging.INFO
    else:
        level = logging.WARNING

    log_formatter = logging.Formatter(
        "%(asctime)s [%(levelname)-7.7s]  %(message)s", datefmt="%Y-%m-%d %H:%M:%S"
    )
    root_logger = logging.getLogger()
    root_logger.setLevel(level)
    for h in list(root_logger.handlers):
        root_logger.removeHandler(h)

    console_handler = logging.StreamHandler(sys.stdout)
    console_handler.setFormatter(log_formatter)
    root_logger.addHandler(console_handler)

    if filename:
        file_handler = logging.FileHandler(filename)
        file_handler.setFormatter(log_formatter)
        root_logger.addHandler(file_handler)

    def handle_exception(exc_type, exc_value, exc_traceback):
        if issubclass(exc_type, KeyboardInterrupt):
            sys.__excepthook__(exc_type, exc_value, exc_traceback)
            return
        logging.error("Uncaught exception", exc_info=(exc_type, exc_value, exc_traceback))

    sys.excepthook = handle_exception
