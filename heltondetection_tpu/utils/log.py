"""Logging (rebuild target C22): python logger + TensorBoard scalars —
README.md:14 "支持logger， tensorboard等日志记录方式". TensorBoard writes go through
torch.utils.tensorboard (host-side, optional)."""

from __future__ import annotations

import logging
import os
import sys
from typing import Dict, Optional


def get_logger(name: str = "heltondetection",
               log_file: Optional[str] = None) -> logging.Logger:
    logger = logging.getLogger(name)
    fmt = logging.Formatter(
        "%(asctime)s %(levelname)s %(name)s: %(message)s", "%H:%M:%S")
    if not logger.handlers:
        logger.setLevel(logging.INFO)
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        logger.propagate = False
    if log_file:
        # the logger is a process singleton, but the FILE target belongs to
        # the current run: a second run_train in the same process (sweeps,
        # back-to-back tests) must log into ITS work_dir, not run 1's
        path = os.path.abspath(log_file)
        stale = [h for h in logger.handlers
                 if isinstance(h, logging.FileHandler)
                 and h.baseFilename != path]
        for h in stale:
            logger.removeHandler(h)
            h.close()
        if not any(isinstance(h, logging.FileHandler)
                   and h.baseFilename == path for h in logger.handlers):
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            fh = logging.FileHandler(path)
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    return logger


class TBWriter:
    """Thin TensorBoard scalar writer; silently no-ops if tensorboard is
    unavailable (the capability knob, not a hard dep)."""

    def __init__(self, log_dir: Optional[str]):
        self._w = None
        if log_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._w = SummaryWriter(log_dir)
            except Exception:
                self._w = None

    def scalars(self, step: int, values: Dict[str, float],
                prefix: str = "") -> None:
        if self._w is None:
            return
        for k, v in values.items():
            try:
                self._w.add_scalar(f"{prefix}{k}", float(v), step)
            except (TypeError, ValueError):
                pass

    def close(self):
        if self._w is not None:
            self._w.close()
