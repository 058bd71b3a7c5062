"""Metric logging: console + JSONL file + optional wandb.

Parity target: the reference's three channels (SURVEY.md §5): wandb scalars
keyed by ``global_step``/``epoch`` with ``train/``/``eval/`` sections
(``/root/reference/genrec/trainers/tiger_trainer.py:132-141``), a timestamped
file+console logger (``sasrec_trainer.py:20-36``), and tqdm loss postfix.
wandb is not installed in this environment, so the durable channel is a JSONL
metrics file (one object per log call) with wandb used opportunistically.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Dict, Optional


def setup_logger(name: str, save_dir: Optional[str] = None) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.propagate = False
    if logger.handlers:
        return logger
    fmt = logging.Formatter(
        "%(asctime)s %(levelname)s %(name)s: %(message)s")
    sh = logging.StreamHandler(sys.stderr)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(
            save_dir, time.strftime("train_%Y%m%d_%H%M%S.log")))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class MetricLogger:
    """Scalar metric sink. Main-process gating is the caller's job."""

    def __init__(self, save_dir: Optional[str] = None,
                 wandb_project: Optional[str] = None,
                 wandb_logging: bool = False, config: Optional[dict] = None,
                 enabled: bool = True):
        self.enabled = enabled
        self._jsonl = None
        self._wandb = None
        if not enabled:
            return
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            self._jsonl = open(os.path.join(save_dir, "metrics.jsonl"), "a",
                               buffering=1)
        if wandb_logging and wandb_project:
            try:
                import wandb
                self._wandb = wandb.init(project=wandb_project,
                                         config=config or {})
            except Exception:
                self._wandb = None  # offline environment: JSONL only

    def log(self, metrics: Dict[str, float], step: int,
            section: str = "train") -> None:
        if not self.enabled:
            return
        flat = {f"{section}/{k}" if "/" not in k else k: float(v)
                for k, v in metrics.items()}
        if self._jsonl is not None:
            self._jsonl.write(json.dumps(
                {"step": step, "time": time.time(), **flat}) + "\n")
        if self._wandb is not None:
            self._wandb.log(flat, step=step)

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
        if self._wandb is not None:
            self._wandb.finish()
