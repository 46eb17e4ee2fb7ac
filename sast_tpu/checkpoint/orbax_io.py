"""Orbax checkpointing: best-on-val/AP + last, with resume.

TPU-native equivalent of the reference checkpoint policy
(/root/reference/callbacks/custom.py:8-31 — ModelCheckpoint monitoring
'val/AP', top-1 plus 'last') and the resume paths of train.py:110-121
(full training state) / validation.py:61 (weights only).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Keeps the best-AP checkpoint and the most recent one."""

    def __init__(self, directory: str, max_last: int = 1):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=1 + max_last,
                best_fn=lambda metrics: metrics.get("val_AP", -1.0),
                best_mode="max",
                keep_checkpoints_without_metrics=True,
            ),
        )

    def save(
        self,
        step: int,
        state: Any,
        lstm_shapes: Optional[Dict] = None,
        metrics: Optional[Dict[str, float]] = None,
    ) -> None:
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        if getattr(state, "ema_params", None) is not None:
            payload["ema_params"] = state.ema_params
        # metrics=None (not {}) for metric-less saves: orbax only honors
        # keep_checkpoints_without_metrics for None — an empty dict ranks the
        # checkpoint with best_fn's default and the GC may evict the LATEST
        # save in favor of an older best, losing final/periodic checkpoints.
        self._mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(payload),
            ),
            metrics=dict(metrics) if metrics else None,
        )
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_val_ap(self) -> float:
        """Highest recorded val_AP across retained checkpoints (-1.0 when
        none carry metrics) — lets a resumed trainer recover its historical
        best instead of re-claiming 'best' on the first post-resume val."""
        best = -1.0
        for step in self._mgr.all_steps():
            m = self._mgr.metrics(step)
            if m:
                best = max(best, float(m.get("val_AP", -1.0)))
        return best

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def restore(self, state: Any, step: Optional[int] = None) -> Any:
        """Restore a full TrainState (optimizer included)."""
        step = step if step is not None else self._mgr.latest_step()
        assert step is not None, "no checkpoint to restore"
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        if getattr(state, "ema_params", None) is not None:
            template["ema_params"] = state.ema_params
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(state=ocp.args.StandardRestore(template)),
        )["state"]
        state = state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )
        if "ema_params" in restored:
            state = state.replace(ema_params=restored["ema_params"])
        return state

    def restore_weights(self, state: Any, step: Optional[int] = None) -> Any:
        """Weights-only restore (reference resume_only_weights)."""
        step = step if step is not None else self._mgr.best_step() or self._mgr.latest_step()
        assert step is not None, "no checkpoint to restore"
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        if getattr(state, "ema_params", None) is not None:
            template["ema_params"] = state.ema_params
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(state=ocp.args.StandardRestore(template)),
        )["state"]
        state = state.replace(
            params=restored["params"], batch_stats=restored["batch_stats"]
        )
        if "ema_params" in restored:
            state = state.replace(ema_params=restored["ema_params"])
        return state

    def restore_raw(self, step: Optional[int] = None) -> Dict[str, Any]:
        """Template-free weights restore (params/batch_stats/ema_params) as
        host numpy arrays (shapes/dtypes from checkpoint metadata; the
        shardings recorded at save time are ignored, so a checkpoint written
        on TPU loads anywhere; opt_state is not read). For tools that need
        weights without building a model/optimizer first (e.g.
        scripts/export_model.py); prefers the best-AP checkpoint like
        ``restore_weights``."""
        import numpy as np

        step = step if step is not None else self._mgr.best_step() or self._mgr.latest_step()
        assert step is not None, "no checkpoint to restore"
        path = os.path.join(self.directory, str(step), "state")
        # Build a host-numpy template from the checkpoint's own metadata so
        # the restore is device-free (the manager-level restore would try to
        # re-create the shardings recorded at save time). Weights only:
        # partial_restore skips the opt_state payload (~2x params of Adam
        # moments no weights-consumer needs).
        ckptr = ocp.PyTreeCheckpointer()
        meta = ckptr.metadata(path).item_metadata.tree
        wanted = {
            k: v for k, v in meta.items()
            if k in ("params", "batch_stats", "ema_params")
        }
        template = jax.tree.map(lambda m: np.zeros(m.shape, m.dtype), wanted)
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), template
        )
        return ckptr.restore(
            path,
            args=ocp.args.PyTreeRestore(
                item=template, restore_args=restore_args, partial_restore=True
            ),
        )

    def close(self) -> None:
        self._mgr.close()
