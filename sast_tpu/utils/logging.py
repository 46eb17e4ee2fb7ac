"""Metric logging: JSONL always, Weights & Biases when available.

Replaces the reference's forked WandbLogger + CSV logger
(/root/reference/loggers/wandb_logger.py, validation.py:53) with a small
multiplexer; W&B is optional (zero-egress environments run JSONL-only).
Covers the reference logger's artifact upload/prune (wandb_logger.py:238-376),
artifact-based checkpoint resume (:77-87), and image/video media logging
(:156-198).
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Dict, List, Optional


class MetricLogger:
    def __init__(
        self,
        log_dir: str,
        use_wandb: bool = False,
        project: str = "sast_tpu",
        group: Optional[str] = None,
        config: Optional[dict] = None,
        run_id: Optional[str] = None,
    ):
        """``run_id`` resumes an existing W&B run under the same id — the
        reference's ``wandb.wandb_runpath`` workflow (loggers/utils.py:14-19:
        the runpath's last component becomes the id, resume='allow')."""
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._t0 = time.time()
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=project, group=group, config=config or {},
                    id=run_id, resume="allow" if run_id else None,
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

    def log_checkpoint(
        self,
        ckpt_dir: str,
        step: int,
        aliases: Optional[list] = None,
        keep_top_k: int = 1,
    ) -> None:
        """Upload a checkpoint directory as a W&B artifact with alias/pruning
        (reference wandb_logger.py:238-376 _scan_and_log_checkpoints /
        _rm_but_top_k). No-op without an active W&B run."""
        if self._wandb is None:
            return
        try:
            import wandb

            name = f"checkpoint-{self._wandb.id}"
            artifact = wandb.Artifact(name=name, type="model")
            artifact.add_dir(ckpt_dir)
            self._wandb.log_artifact(
                artifact, aliases=(aliases or []) + [f"step-{step}", "last"]
            )
            # prune older non-aliased versions beyond keep_top_k
            api = wandb.Api()
            versions = api.artifact_versions(
                "model", f"{self._wandb.entity}/{self._wandb.project}/{name}"
            )
            kept = 0
            for v in versions:
                if any(a in ("best", "last") for a in v.aliases):
                    continue
                kept += 1
                if kept > keep_top_k:
                    v.delete()
        except Exception as e:
            print(f"wandb artifact upload failed: {e}", file=sys.stderr)

    def download_checkpoint(self, artifact_name: str) -> Optional[str]:
        """Artifact-based checkpoint resume (reference wandb_logger.py:77-87):
        fetch the named model artifact and return the local directory holding
        the checkpoint files. Returns None when W&B is unavailable."""
        if self._wandb is None:
            print(
                f"wandb inactive; cannot fetch artifact {artifact_name}",
                file=sys.stderr,
            )
            return None
        try:
            artifact = self._wandb.use_artifact(artifact_name)
            return artifact.download()
        except Exception as e:
            print(f"wandb artifact download failed: {e}", file=sys.stderr)
            return None

    def log_images(
        self,
        key: str,
        images: List,
        step: Optional[int] = None,
        captions: Optional[List[str]] = None,
    ) -> None:
        """Media logging (reference wandb_logger.py:156-168): numpy arrays /
        file paths become wandb.Image entries. No-op without a W&B run
        (panels are always also written to disk by the caller)."""
        if self._wandb is None:
            return
        try:
            import wandb

            caps = captions or [None] * len(images)
            assert len(caps) == len(images)
            self._wandb.log(
                {key: [wandb.Image(im, caption=c) for im, c in zip(images, caps)]},
                step=step,
            )
        except Exception as e:
            print(f"wandb image logging failed: {e}", file=sys.stderr)

    def log_video(
        self,
        key: str,
        video,
        step: Optional[int] = None,
        fps: int = 4,
    ) -> None:
        """(T, C, H, W) array or file path (reference wandb_logger.py:170-198)."""
        if self._wandb is None:
            return
        try:
            import wandb

            self._wandb.log({key: wandb.Video(video, fps=fps)}, step=step)
        except Exception as e:
            print(f"wandb video logging failed: {e}", file=sys.stderr)

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
