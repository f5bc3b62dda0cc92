"""Logging (reference: src/gb/impl/Log.cpp:30-71).

The reference wires the quill async logger with pattern
``[%(time)] (%(log_level)) %(message)`` and lets test binaries attach an
error-counting sink so any logged error fails the test
(reference: src/hdGatling/main.cpp:78-100). We reproduce both on top of the
stdlib logging module.
"""

from __future__ import annotations

import logging
import os
import sys

_LOGGER_NAME = "gatling"
_initialized = False


class ErrorCountingHandler(logging.Handler):
    """Counts ERROR+ records; used by the test harness to fail tests that log
    errors (reference: hdGatling/main.cpp:78-100)."""

    def __init__(self) -> None:
        super().__init__(level=logging.ERROR)
        self.error_count = 0
        self.messages: list[str] = []

    def emit(self, record: logging.LogRecord) -> None:
        self.error_count += 1
        self.messages.append(record.getMessage())


def init_logging(extra_handlers: list[logging.Handler] | None = None) -> logging.Logger:
    """Initialise the gatling logger (idempotent)."""
    global _initialized
    logger = logging.getLogger(_LOGGER_NAME)
    if not _initialized:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter("[%(asctime)s.%(msecs)03d] (%(levelname)s) %(message)s", "%H:%M:%S"))
        logger.addHandler(handler)
        # GTL_VERBOSE build option analog (reference: CMakeLists.txt:27, Log.cpp:51-53).
        verbose = os.environ.get("GTL_VERBOSE", "0") not in ("0", "", "false", "OFF")
        logger.setLevel(logging.DEBUG if verbose else logging.INFO)
        logger.propagate = False
        _initialized = True
    for h in extra_handlers or []:
        logger.addHandler(h)
    return logger


def get_logger() -> logging.Logger:
    if not _initialized:
        init_logging()
    return logging.getLogger(_LOGGER_NAME)
