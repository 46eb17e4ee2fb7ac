"""Name-based module registry.

Equivalent of the reference fetch API (/root/reference/modules/utils/fetch.py:
9-29): resolve model/data modules from config names, so user code can stay
name-driven like the reference CLI surface.
"""

from __future__ import annotations

from typing import Tuple

from sast_tpu.config import ExperimentConfig


def fetch_model_module(cfg: ExperimentConfig, workdir: str = "/tmp/sast_run", **kw):
    """'rnndet' -> Trainer (the task module equivalent)."""
    name = cfg.model.name
    if name == "rnndet":
        from sast_tpu.training.loop import Trainer

        return Trainer(cfg, workdir=workdir, **kw)
    raise NotImplementedError(f"unknown model module {name!r}")


def fetch_data_module(cfg: ExperimentConfig, rank: int = 0, world_size: int = 1):
    """'gen1' | 'gen4' -> DataModule."""
    name = cfg.dataset.name
    if name in ("gen1", "gen4"):
        from sast_tpu.data.module import DataModule

        return DataModule(cfg, rank=rank, world_size=world_size)
    raise NotImplementedError(f"unknown dataset {name!r}")


def build_detector(cfg: ExperimentConfig, use_pallas: bool = False):
    """Bare detector module for library users."""
    from sast_tpu.models.detector import YoloXDetector

    return YoloXDetector(cfg.model, use_pallas=use_pallas)
