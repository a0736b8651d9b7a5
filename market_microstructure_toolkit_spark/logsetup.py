"""Logging bootstrap, parity with the reference's ``setup_log.py:9-46``:
file + console handlers on the ROOT logger (so module loggers propagate),
fresh handlers on every call (re-running a CLI must not duplicate output),
and a named child logger returned for the caller.
"""

from __future__ import annotations

import inspect
import logging
from pathlib import Path


def setup_logging(log_dir: str = "logs", name: str | None = None) -> logging.Logger:
    """Configure root logging (file + console) and return a child logger.

    - Log file at ``<log_dir>/<name>.log`` (``name`` defaults to the
      calling module's filename stem, as in the reference).
    - Root handlers are cleared first so repeat invocations don't stack.
    """
    if name is None:
        frame = inspect.stack()[1]
        name = Path(frame.filename).stem

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    logfile = Path(log_dir) / f"{name}.log"

    fmt = logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")

    root = logging.getLogger()
    root.setLevel(logging.INFO)
    for h in list(root.handlers):
        root.removeHandler(h)

    fh = logging.FileHandler(logfile, mode="w", encoding="utf-8")
    fh.setFormatter(fmt)
    ch = logging.StreamHandler()
    ch.setFormatter(fmt)
    root.addHandler(fh)
    root.addHandler(ch)

    logger = logging.getLogger(name)
    logger.propagate = True
    return logger
