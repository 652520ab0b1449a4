"""Logging utilities (parity: reference src/utils/logger.py:17-119).

- `setup_logger`: timestamped file + stream logger, gated to host 0 in
  multi-process runs (reference gates on torch.distributed rank; here
  jax.process_index()).
- `RichConsoleManager`: memoized themed rich console for CLI output.
"""

from __future__ import annotations

import logging
import sys
import time
from pathlib import Path
from typing import Optional

try:
    from rich.console import Console
    from rich.logging import RichHandler
    from rich.theme import Theme

    _HAVE_RICH = True
except ImportError:  # pragma: no cover - rich is expected to be present
    _HAVE_RICH = False


def _is_primary_host() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def setup_logger(name: str = "cabinet_tpu", logpth: Optional[str] = None,
                 level: int = logging.INFO) -> logging.Logger:
    """File+stream logger; non-primary hosts log at ERROR only."""
    logger = logging.getLogger(name)
    logger.setLevel(level if _is_primary_host() else logging.ERROR)
    if logger.handlers:
        return logger

    fmt = logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
    stream = logging.StreamHandler(sys.stderr)
    stream.setFormatter(fmt)
    logger.addHandler(stream)

    if logpth is not None and _is_primary_host():
        logdir = Path(logpth)
        logdir.mkdir(parents=True, exist_ok=True)
        logfile = logdir / time.strftime("run-%Y-%m-%d-%H-%M-%S.log")
        fh = logging.FileHandler(logfile)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class RichConsoleManager:
    """Memoized themed console (reference logger.py:30-119)."""

    _console: Optional["Console"] = None

    THEME = {
        "info": "cyan",
        "warning": "yellow",
        "error": "bold red",
        "success": "bold green",
        "metric": "bold magenta",
    }

    @classmethod
    def get_console(cls) -> "Console":
        if not _HAVE_RICH:
            raise RuntimeError("rich is not installed")
        if cls._console is None:
            cls._console = Console(theme=Theme(cls.THEME))
        return cls._console

    @classmethod
    def setup_logging(cls, level: int = logging.INFO) -> logging.Logger:
        logger = logging.getLogger("cabinet_tpu.cli")
        logger.setLevel(level if _is_primary_host() else logging.ERROR)
        if not logger.handlers and _HAVE_RICH:
            handler = RichHandler(console=cls.get_console(), show_path=False)
            logger.addHandler(handler)
        return logger
