"""Library logging controls — reference dataprofiler/dp_logging.py.

``get_logger()`` returns the package root logger (NullHandler attached
so library users see nothing unless they opt in), ``set_verbosity``
mirrors ``dp.set_verbosity(logging.INFO)``, and operators obtain
children via ``get_child_logger(__name__)``.
"""

from __future__ import annotations

import logging
import threading

_root_lock = threading.Lock()
_initialized = False


def get_logger() -> logging.Logger:
    """The ``dataprofiler_spark`` root logger (handler-initialized once,
    NullHandler by default — the library never configures global
    logging for its host application)."""
    global _initialized
    with _root_lock:
        logger = logging.getLogger("dataprofiler_spark")
        if not _initialized:
            logger.addHandler(logging.NullHandler())
            _initialized = True
        return logger


def set_verbosity(level: int) -> None:
    """``set_verbosity(logging.INFO)`` — reference dp_logging.py:41-52.
    Attaches a stream handler on first use so opted-in verbosity is
    actually visible."""
    logger = get_logger()
    logger.setLevel(level)
    if not any(isinstance(h, logging.StreamHandler)
               for h in logger.handlers):
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s %(message)s"))
        logger.addHandler(h)


def get_child_logger(name: str) -> logging.Logger:
    return get_logger().getChild(
        name.removeprefix("dataprofiler_spark."))
