"""Metric logging: CSV/JSONL always, Weights & Biases when available.

Replaces the reference's forked WandbLogger + CSV logger
(/root/reference/loggers/wandb_logger.py, validation.py:53) with a small
multiplexer; W&B is optional (zero-egress environments run CSV-only).
"""

from __future__ import annotations

import csv
import json
import os
import sys
import time
from typing import Dict, Optional


class MetricLogger:
    def __init__(
        self,
        log_dir: str,
        use_wandb: bool = False,
        project: str = "sast_tpu",
        group: Optional[str] = None,
        config: Optional[dict] = None,
    ):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._t0 = time.time()
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=project, group=group, config=config or {}
                )
            except Exception as e:  # zero-egress or wandb missing
                print(f"wandb unavailable ({e}); logging to CSV only", file=sys.stderr)

    def log(self, metrics: Dict[str, float], step: int) -> None:
        row = {"step": int(step), "time": round(time.time() - self._t0, 2)}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                row[k] = v
        self._jsonl.write(json.dumps(row) + "\n")
        self._jsonl.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self) -> None:
        self._jsonl.close()
        if self._wandb is not None:
            self._wandb.finish()


class SmoothedValue:
    """Running average over all steps (reference Module.smooth_loss,
    modules/detection.py:373-383)."""

    def __init__(self):
        self.count = 0
        self.value = 0.0

    def update(self, v: float) -> float:
        self.value = (self.value * self.count + float(v)) / (self.count + 1)
        self.count += 1
        return self.value
