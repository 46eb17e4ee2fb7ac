"""Training loop driver: fit / validate, checkpointing, logging, telemetry.

Orchestration equivalent of the reference Lightning Module + Trainer wiring
(/root/reference/modules/detection.py + train.py): streaming/mixed batches,
per-lane recurrent state carried across steps, periodic Prophesee evaluation,
best-AP checkpointing, smoothed sparsity telemetry on the progress line.

Everything device-side is two jitted functions (train_step/eval_step);
the loop is plain Python over the host prefetcher.

Run a synthetic smoke train: ``python -m sast_tpu.training.loop --smoke``.
"""

from __future__ import annotations

import os
import sys
import time
from typing import Callable, Dict, Iterable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from sast_tpu.config import ExperimentConfig
from sast_tpu.data.batch import split_device_batch
from sast_tpu.eval.prophesee import PropheseeEvaluator, detections_to_prophesee
from sast_tpu.models.backbone import zero_states
from sast_tpu.training.steps import (
    create_train_state,
    make_eval_step,
    make_train_step,
)
from sast_tpu.utils.logging import MetricLogger, SmoothedValue


def _model_dtype(cfg: ExperimentConfig):
    return jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32


class Trainer:
    def __init__(
        self,
        cfg: ExperimentConfig,
        workdir: str,
        use_wandb: bool = False,
        wandb_run_id=None,
        log_every: int = 50,
        val_every: Optional[int] = 10_000,
        ckpt_every: Optional[int] = None,
        use_pallas_eval: bool = False,
        use_pallas_train: bool = False,
        learning_rate: Optional[float] = None,
        mesh=None,
    ):
        """``learning_rate`` overrides the config peak lr (the multi-chip
        sqrt(global_batch/8) scaling computed in train.py); ``mesh`` is an
        optional 1-D data-parallel ``jax.sharding.Mesh`` — when given, the
        model/optimizer state is replicated and every batch is device_put
        with its batch axis sharded over the mesh, the GSPMD equivalent of
        the reference's production DDP wiring (train.py:91-98)."""
        from sast_tpu.utils.malloc import retain_freed_memory

        retain_freed_memory()  # opt-in host alloc tuning; see utils/malloc.py
        self.cfg = cfg
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)
        self.logger = MetricLogger(
            workdir, use_wandb=use_wandb, run_id=wandb_run_id
        )
        self.log_every = log_every
        self.val_every = val_every
        self.ckpt_every = ckpt_every

        seed = cfg.training.seed if cfg.training.seed is not None else 0
        # use_pallas_train runs the sparse kernel under jax.grad through its
        # custom VJP (backward over the same kept-first work list).
        self.state, self.model = create_train_state(
            cfg, jax.random.PRNGKey(seed), learning_rate=learning_rate,
            use_pallas=use_pallas_train,
        )
        self.mesh = mesh
        if mesh is not None:
            from sast_tpu.parallel.mesh import batch_sharding, replicated

            self._sh_b0 = batch_sharding(mesh, 0)
            self._sh_b1 = batch_sharding(mesh, 1)  # ev_repr is (T, B, ...)
            self.state = jax.device_put(self.state, replicated(mesh))
        self.train_step = jax.jit(
            make_train_step(self.model, cfg), donate_argnums=(0, 2)
        )
        # Evaluation may use the Pallas window-skipping kernel (same params).
        eval_model = self.model
        if use_pallas_eval:
            from sast_tpu.models.detector import YoloXDetector

            eval_model = YoloXDetector(cfg.model, use_pallas=True)
        self.eval_step = jax.jit(make_eval_step(eval_model, cfg), donate_argnums=(2,))
        self._ckpt = None
        self.p_smooth = SmoothedValue()
        # Host-side copy of the optimizer's lr schedule for train/lr logging
        # (reference LearningRateMonitor, train.py:126-136).
        from sast_tpu.training.optimizer import build_schedule

        self._lr_schedule = build_schedule(cfg.training, learning_rate)
        self.best_val_ap = -1.0

    def _put_batch(self, device_batch: dict) -> dict:
        """Move a host batch to device(s). With a mesh, ev_repr (T, B, ...)
        shards on axis 1 and every other leaf on axis 0 — XLA inserts the
        gradient psum over the mesh during partitioning.

        Multi-host: each process holds only ITS rank's lanes (DataModule
        shards by rank/world), so the local array is this process's shard of
        the global batch — ``make_array_from_process_local_data`` assembles
        the global sharded array from it (global batch = world * local B).
        A plain ``device_put`` with the global sharding would instead treat
        the local batch as the global one and drop data. Single-process, the
        two are equivalent; the multi-host path shares this code."""
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in device_batch.items()}
        multi = jax.process_count() > 1
        def put(v, sh):
            # Single-process: device_put is identical (local == global) and
            # donation-safe; make_array_from_process_local_data arrays abort
            # under buffer donation on some backends.
            if multi:
                return jax.make_array_from_process_local_data(sh, np.asarray(v))
            return jax.device_put(np.asarray(v), sh)
        return {
            k: put(v, self._sh_b1 if k == "ev_repr" else self._sh_b0)
            for k, v in device_batch.items()
        }

    def _zero_states(self, B):
        """Fresh per-lane LSTM states for a GLOBAL batch of ``B`` lanes; with
        a mesh they are assembled host-side (np.zeros, no device round trip —
        a D2H fetch here would trigger the dispatch degradation documented in
        docs/DESIGN.md §6) and sharded over the batch axis.

        ``B`` is the global batch (callers read it off the already-assembled
        device batch), so on multi-process runs each host builds only ITS
        ``B // process_count`` lanes of zeros and passes the global shape
        explicitly — passing global-shaped zeros without ``global_shape``
        would make ``make_array_from_process_local_data`` infer a
        ``process_count``× larger global batch than the data batch."""
        cfg = self.cfg
        if self.mesh is None:
            return zero_states(cfg.model.backbone, B, dtype=_model_dtype(cfg))
        structs = jax.eval_shape(
            lambda: zero_states(cfg.model.backbone, B, dtype=_model_dtype(cfg))
        )
        nproc = jax.process_count()
        def put(st):
            if nproc > 1:
                assert st.shape[0] % nproc == 0, (st.shape, nproc)
                local = np.zeros((st.shape[0] // nproc,) + st.shape[1:], st.dtype)
                return jax.make_array_from_process_local_data(
                    self._sh_b0, local, st.shape
                )
            return jax.device_put(np.zeros(st.shape, st.dtype), self._sh_b0)
        return jax.tree.map(put, structs)

    # -- checkpointing -----------------------------------------------------
    @property
    def ckpt(self):
        if self._ckpt is None:
            from sast_tpu.checkpoint.orbax_io import CheckpointManager

            self._ckpt = CheckpointManager(os.path.join(self.workdir, "ckpts"))
        return self._ckpt

    def maybe_resume(self, resume: bool, weights_only: bool = False) -> None:
        if not resume:
            return
        if self.ckpt.latest_step() is None:
            print("no checkpoint found; starting fresh", file=sys.stderr)
            return
        if weights_only:
            # Weights-only = a fresh run starting from old weights (fine-tune);
            # its own best must not compete with the source run's history.
            self.state = self.ckpt.restore_weights(self.state)
        else:
            # Full resume continues the SAME run: recover the historical best
            # so it cannot re-alias 'best' onto a worse post-resume checkpoint.
            self.state = self.ckpt.restore(self.state)
            self.best_val_ap = max(self.best_val_ap, self.ckpt.best_val_ap())
        print(f"resumed from step {int(self.state.step)}", file=sys.stderr)

    def resume_from_artifact(self, artifact_name: str, weights_only: bool = False) -> bool:
        """Artifact-based checkpoint resume (reference wandb_logger.py:77-87 +
        train.py artifact wiring): download the W&B model artifact and restore
        from it. Returns True on success."""
        local_dir = self.logger.download_checkpoint(artifact_name)
        if local_dir is None:
            return False
        from sast_tpu.checkpoint.orbax_io import CheckpointManager

        mgr = CheckpointManager(local_dir)
        if mgr.latest_step() is None:
            print(f"artifact {artifact_name} holds no checkpoint", file=sys.stderr)
            return False
        self.state = (
            mgr.restore_weights(self.state) if weights_only else mgr.restore(self.state)
        )
        if not weights_only:  # same-run continuation; see maybe_resume
            self.best_val_ap = max(self.best_val_ap, mgr.best_val_ap())
        print(
            f"resumed from artifact {artifact_name} @ step {int(self.state.step)}",
            file=sys.stderr,
        )
        return True

    # -- validation ---------------------------------------------------------
    def validate(
        self,
        eval_batches: Iterable[dict],
        max_batches: Optional[int] = None,
        save_viz: int = 0,
    ) -> Dict[str, float]:
        """Streaming evaluation; optionally saves up to ``save_viz`` rendered
        prediction-vs-label panels (the reference W&B viz callback,
        callbacks/detection.py:32-100) under workdir/viz/."""
        cfg = self.cfg
        evaluator = PropheseeEvaluator(
            cfg.dataset.name, cfg.dataset.downsample_by_factor_2
        )
        n_viz_saved = 0
        viz_panels = []
        # Prefer EMA weights for evaluation when maintained.
        eval_params = (
            self.state.ema_params
            if getattr(self.state, "ema_params", None) is not None
            else self.state.params
        )
        variables = {"params": eval_params, "batch_stats": self.state.batch_stats}
        lstm = None
        n = 0
        for batch in eval_batches:
            device_batch, host = split_device_batch(batch)
            device_batch = self._put_batch(device_batch)
            if lstm is None:
                lstm = self._zero_states(device_batch["ev_repr"].shape[1])
            lstm, dets = self.eval_step(variables, device_batch, lstm)
            dets_np = jax.device_get(dets)

            labels_flat = [fl for lane in host["_labels"] for fl in lane]
            frame_valid = batch["frame_valid"].reshape(-1)
            sel, times, gts = [], [], []
            for f, fl in enumerate(labels_flat):
                if not frame_valid[f] or fl is None or len(fl) == 0:
                    continue
                t = np.unique(fl.t)
                assert t.size == 1, "labels of one frame share a timestamp"
                sel.append(f)
                times.append(int(t[0]))
                gts.append(fl.to_structured())
            if sel:
                sub = {k: v[np.asarray(sel)] for k, v in dets_np.items()}
                preds = detections_to_prophesee(sub, times)
                evaluator.add_labels(gts)
                evaluator.add_predictions(preds)

                if n_viz_saved < save_viz:
                    from sast_tpu.utils.viz import render_detection_frame, save_png

                    f = sel[0]
                    B = batch["ev_repr"].shape[1]
                    lane, slot = f // batch["frame_tidx"].shape[1], f % batch["frame_tidx"].shape[1]
                    tidx = int(batch["frame_tidx"][lane, slot])
                    ev = np.asarray(batch["ev_repr"][tidx, lane])
                    ch = cfg.model.backbone.input_channels
                    ev = ev.reshape(ev.shape[0], ev.shape[1] // ch, ch)
                    gt = gts[0]
                    pd = preds[0]
                    panel = render_detection_frame(
                        ev,
                        gt_boxes=np.stack([gt["x"], gt["y"], gt["w"], gt["h"]], -1),
                        gt_classes=gt["class_id"],
                        pred_boxes=np.stack([pd["x"], pd["y"], pd["w"], pd["h"]], -1)
                        if len(pd)
                        else None,
                        pred_classes=pd["class_id"] if len(pd) else None,
                    )
                    viz_dir = os.path.join(self.workdir, "viz")
                    os.makedirs(viz_dir, exist_ok=True)
                    save_png(
                        os.path.join(viz_dir, f"val_{n:04d}.png"), panel
                    )
                    viz_panels.append(panel)
                    n_viz_saved += 1
            n += 1
            if max_batches is not None and n >= max_batches:
                break

        # A truncated consumer (max_batches) must release the prefetcher's
        # producer thread and its buffered batches/h5 handles.
        if hasattr(eval_batches, "close"):
            eval_batches.close()

        if viz_panels:
            # Media logging through the logger (reference W&B viz callback,
            # callbacks/detection.py:32-100 via wandb_logger.log_images).
            self.logger.log_images(
                "val/predictions", viz_panels, step=int(self.state.step)
            )
            if len(viz_panels) > 1 and all(
                p.shape == viz_panels[0].shape for p in viz_panels
            ):
                # Prediction clip as video (reference wandb_logger.py:170-198
                # log_video); wandb.Video wants (T, C, H, W).
                clip = np.stack(viz_panels).transpose(0, 3, 1, 2)
                self.logger.log_video(
                    "val/prediction_clip", clip, step=int(self.state.step)
                )
        if jax.process_count() > 1:
            # Merge all ranks' buffers so every process computes (and logs /
            # checkpoints on) the GLOBAL metric — the reference's manual
            # dist.reduce metric sync (modules/detection.py:334-344), done
            # exactly over the union of clips instead of averaging rank APs.
            evaluator.gather_across_processes()
        if not evaluator.has_data():
            return {}
        h, w = cfg.model.backbone.in_res_hw
        metrics = evaluator.evaluate_buffer(h, w) or {}
        return {f"val/{k}": v for k, v in metrics.items()}

    # -- fit ------------------------------------------------------------------
    def fit(
        self,
        train_batches: Iterable[dict],
        eval_loader_fn: Optional[Callable[[], Iterable[dict]]] = None,
        max_steps: Optional[int] = None,
        eval_max_batches: Optional[int] = None,
        profile_steps: Optional[tuple] = None,
    ) -> Dict[str, float]:
        """``profile_steps=(first, last)`` captures a ``jax.profiler`` trace
        of those training steps (inclusive) into ``<workdir>/trace`` — the
        TPU-native replacement for the reference's CudaTimer wrapping
        (utils/timers.py:12-95); view with TensorBoard/xprof."""
        cfg = self.cfg
        max_steps = max_steps or cfg.training.max_steps
        prof_first, prof_last = profile_steps or (None, None)
        profiling = False
        lstm = None
        last_metrics: Dict[str, float] = {}
        t_last = time.time()
        step = int(self.state.step)
        last_ckpt_step = step
        # Gradient-flow history for the periodic figure (reference
        # callbacks/gradflow.py): per-component grad norms at log points.
        gf_steps: list = []
        gf_series: Dict[str, list] = {}

        for batch in train_batches:
            if step >= max_steps:
                break
            device_batch, _ = split_device_batch(batch)
            device_batch = self._put_batch(device_batch)
            if lstm is None:
                lstm = self._zero_states(device_batch["ev_repr"].shape[1])
            # >= so a resumed run whose restored step already sits inside
            # the window still captures its remainder; prof_last keeps a
            # finished window from restarting.
            if (
                prof_first is not None
                and not profiling
                and prof_first <= step + 1 <= prof_last
            ):
                jax.profiler.start_trace(os.path.join(self.workdir, "trace"))
                profiling = True
            self.state, lstm, metrics = self.train_step(self.state, device_batch, lstm)
            step += 1
            if profiling and step >= prof_last:
                # Block so the traced window contains completed device work,
                # not just async dispatches.
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()
                profiling = False

            if step % self.log_every == 0 or step == 1:
                metrics = {k: float(v) for k, v in metrics.items()}
                sn = self.p_smooth.update(metrics.pop("P"))
                dt = (time.time() - t_last) / min(self.log_every, step)
                t_last = time.time()
                log = {f"train/{k}": v for k, v in metrics.items()}
                log.update({
                    "train/SN": sn,
                    "train/step_time_s": dt,
                    # optax's scale_by_schedule evaluates at the PRE-increment
                    # count: the update that produced this step used
                    # schedule(step - 1), so log that, not schedule(step).
                    "train/lr": float(self._lr_schedule(step - 1)),
                })
                self.logger.log(log, step)
                gf_steps.append(step)
                for k, v in metrics.items():
                    if k.startswith("grad_norm"):
                        gf_series.setdefault(k.replace("grad_norm/", "").replace(
                            "grad_norm", "total"), []).append(v)
                print(
                    f"step {step}  loss {metrics['loss']:.3f}  "
                    f"SN {sn:.0f}  {dt * 1000:.0f} ms/step",
                    file=sys.stderr,
                )
                last_metrics = log

            run_val = (
                eval_loader_fn is not None
                and self.val_every is not None
                and step % self.val_every == 0
            )
            if run_val:
                if gf_steps:
                    from sast_tpu.utils.viz import render_gradflow, save_png

                    gf_img = render_gradflow(gf_steps, gf_series)
                    gf_dir = os.path.join(self.workdir, "viz")
                    os.makedirs(gf_dir, exist_ok=True)
                    save_png(os.path.join(gf_dir, "gradflow.png"), gf_img)
                    self.logger.log_images("train/gradflow", [gf_img], step)
                val_metrics = self.validate(
                    eval_loader_fn(), max_batches=eval_max_batches
                )
                if val_metrics:
                    self.logger.log(val_metrics, step)
                    print(
                        "  ".join(f"{k}={v:.4f}" for k, v in val_metrics.items()),
                        file=sys.stderr,
                    )
                    last_metrics.update(val_metrics)
                val_ap = val_metrics.get("val/AP", -1.0)
                is_best = val_ap > self.best_val_ap
                if is_best:
                    self.best_val_ap = val_ap
                self.ckpt.save(step, self.state, metrics={"val_AP": val_ap})
                # Alias the artifact 'best' when val/AP improved (reference
                # ModelCheckpoint on val/AP + wandb_logger aliases,
                # callbacks/custom.py:8-31, wandb_logger.py:238-324).
                self.logger.log_checkpoint(
                    os.path.join(self.workdir, "ckpts"), step,
                    aliases=["best"] if is_best else None,
                )
                last_ckpt_step = step
            elif self.ckpt_every is not None and step % self.ckpt_every == 0:
                self.ckpt.save(step, self.state, metrics={})
                last_ckpt_step = step

        if profiling:  # loop ended inside the requested window
            jax.profiler.stop_trace()

        # Breaking at max_steps leaves the (infinite) train prefetcher's
        # producer blocked mid-put; release it and its buffers.
        if hasattr(train_batches, "close"):
            train_batches.close()

        # Persist the final state even when max_steps is not aligned with
        # val_every/ckpt_every (a run must never end without its last state).
        if step > 0 and last_ckpt_step != step:
            self.ckpt.save(step, self.state, metrics={})
            self.logger.log_checkpoint(os.path.join(self.workdir, "ckpts"), step)

        return last_metrics


def _smoke() -> None:
    """Synthetic-data smoke train on the current default device."""
    from sast_tpu.config import get_test_config
    from sast_tpu.data.synthetic import synthetic_train_batch
    from sast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = get_test_config()
    trainer = Trainer(
        cfg, workdir="/tmp/sast_smoke", log_every=2, val_every=None
    )

    def batches():
        rng = np.random.RandomState(0)
        i = 0
        while True:
            b = synthetic_train_batch(cfg, rng)
            b["is_first"] = np.full((b["ev_repr"].shape[1],), i == 0)
            yield b
            i += 1

    metrics = trainer.fit(batches(), max_steps=6)
    loss = metrics.get("train/loss")
    assert loss is not None and np.isfinite(loss), metrics
    print(f"smoke ok: {metrics}", file=sys.stderr)


if __name__ == "__main__":
    if "--smoke" in sys.argv:
        _smoke()
    else:
        print("use train.py for real training, or --smoke", file=sys.stderr)
