"""Optimizer + LR schedule (optax).

Equivalent of the reference recipe
(/root/reference/modules/detection.py:409-441, train.py:156-157):
AdamW, OneCycle with linear anneal (2-phase: linear warmup over
``pct_start * total_steps`` from peak/div_factor, then linear decay to
peak/final_div_factor), gradient clipping **by value** 1.0.

The reference scales lr by sqrt(total_batch / 8) (README Training section);
``scale_lr_for_global_batch`` reproduces that rule for multi-chip meshes.
"""

from __future__ import annotations

import math
from typing import Optional

import optax

from sast_tpu.config import TrainingConfig


def onecycle_linear_schedule(
    peak_lr: float,
    total_steps: int,
    pct_start: float,
    div_factor: float,
    final_div_factor: float,
) -> optax.Schedule:
    init_lr = peak_lr / div_factor
    final_lr = peak_lr / final_div_factor
    warmup = max(int(total_steps * pct_start), 1)
    return optax.join_schedules(
        [
            optax.linear_schedule(init_lr, peak_lr, warmup),
            optax.linear_schedule(peak_lr, final_lr, total_steps - warmup),
        ],
        [warmup],
    )


def scale_lr_for_global_batch(base_lr: float, global_batch: int, base_batch: int = 8) -> float:
    """lr = base * sqrt(global_batch / base_batch) (reference README rule)."""
    return base_lr * math.sqrt(global_batch / base_batch)


def build_schedule(
    cfg: TrainingConfig, learning_rate: Optional[float] = None
) -> optax.Schedule:
    """The step -> lr function used by the optimizer; also evaluated
    host-side by the trainer to log ``train/lr`` (the reference's
    LearningRateMonitor, /root/reference/train.py:126-136)."""
    lr = learning_rate if learning_rate is not None else cfg.learning_rate
    if cfg.lr_scheduler.use:
        return onecycle_linear_schedule(
            peak_lr=lr,
            total_steps=cfg.lr_scheduler.total_steps,
            pct_start=cfg.lr_scheduler.pct_start,
            div_factor=cfg.lr_scheduler.div_factor,
            final_div_factor=cfg.lr_scheduler.final_div_factor,
        )
    return optax.constant_schedule(lr)


def build_optimizer(
    cfg: TrainingConfig, learning_rate: Optional[float] = None
) -> optax.GradientTransformation:
    schedule = build_schedule(cfg, learning_rate)
    tx = optax.chain(
        optax.clip(cfg.gradient_clip_val),  # clip by value (train.py:157)
        optax.adamw(schedule, weight_decay=cfg.weight_decay),
    )
    return tx
