"""Logging + metrics.

* ``Logger``: stdout tee into {log_dir}/train.log (reference
  configs/logger.py:5-19, installed train.py:72).
* ``MetricsWriter``: per-epoch scalar metrics. Always writes JSONL
  ({dir}/metrics.jsonl); additionally writes TensorBoard event files when a
  TB writer is importable (replaces reference tf.summary scalars,
  train.py:280-296).
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Dict, Optional


class Logger:
    """Tee stdout into a train.log file (reference configs/logger.py:5-19)."""

    def __init__(self, log_dir: str, filename: str = "train.log"):
        os.makedirs(log_dir, exist_ok=True)
        self.terminal = sys.stdout
        self.log = open(os.path.join(log_dir, filename), "a")

    def write(self, message: str) -> None:
        self.terminal.write(message)
        self.log.write(message)
        self.log.flush()

    def flush(self) -> None:
        self.terminal.flush()
        self.log.flush()

    def install(self) -> "Logger":
        sys.stdout = self
        return self


def _try_tensorboard(log_dir: str):
    try:  # torch ships a TB writer; TF is absent by design
        from torch.utils.tensorboard import SummaryWriter  # type: ignore
        return SummaryWriter(log_dir)
    except Exception:
        return None


class MetricsWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self.jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self.tb = _try_tensorboard(log_dir) if use_tensorboard else None

    def scalars(self, step: int, values: Dict[str, float],
                prefix: str = "") -> None:
        rec = {"step": int(step), "time": time.time()}
        for k, v in values.items():
            name = f"{prefix}{k}" if prefix else k
            rec[name] = float(v)
            if self.tb is not None:
                self.tb.add_scalar(name, float(v), int(step))
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            self.tb.flush()

    def close(self) -> None:
        self.jsonl.close()
        if self.tb is not None:
            self.tb.close()


class StepTimer:
    """Wall-clock step/epoch timing (reference train.py:190-198, :274-278)."""

    def __init__(self):
        self.start = time.time()

    def lap(self) -> float:
        now = time.time()
        dur = now - self.start
        self.start = now
        return dur
