"""Colored console logger.

Capability parity with the reference's ANSI logger
(/root/reference/others/globals_and_utils.py:16-55), redesigned on top of the
stdlib logging module with a single shared handler.
"""
from __future__ import annotations

import logging
import os
import sys

_LEVEL_COLORS = {
    logging.DEBUG: "\x1b[36m",      # cyan
    logging.INFO: "\x1b[32m",       # green
    logging.WARNING: "\x1b[33m",    # yellow
    logging.ERROR: "\x1b[31m",      # red
    logging.CRITICAL: "\x1b[41m",   # red background
}
_RESET = "\x1b[0m"


class _ColorFormatter(logging.Formatter):
    def __init__(self, use_color: bool):
        super().__init__(
            fmt="%(asctime)s %(levelname)s [%(name)s] %(message)s (%(filename)s:%(lineno)d)",
            datefmt="%H:%M:%S",
        )
        self.use_color = use_color

    def format(self, record: logging.LogRecord) -> str:
        msg = super().format(record)
        if self.use_color:
            color = _LEVEL_COLORS.get(record.levelno, "")
            return f"{color}{msg}{_RESET}"
        return msg


_configured = False


def get_logger(name: str) -> logging.Logger:
    """Return a logger with colored output, configured once per process."""
    global _configured
    logger = logging.getLogger(name)
    if not _configured:
        root = logging.getLogger("control_toolkit_tpu")
        handler = logging.StreamHandler(sys.stderr)
        use_color = sys.stderr.isatty() and os.environ.get("NO_COLOR") is None
        handler.setFormatter(_ColorFormatter(use_color))
        root.addHandler(handler)
        level = os.environ.get("CTT_LOG_LEVEL", "INFO").upper()
        root.setLevel(getattr(logging, level, logging.INFO))
        root.propagate = False
        _configured = True
    if not name.startswith("control_toolkit_tpu"):
        logger = logging.getLogger(f"control_toolkit_tpu.{name}")
    return logger
