"""Jitted train / eval / streaming-inference step builders.

TPU-native reformulation of the reference Lightning task module
(/root/reference/modules/detection.py:113-295):

- the per-timestep Python loop over the clip becomes ``jax.lax.scan`` with the
  LSTM states as the carry (rematerialized per step for BPTT memory);
- "select features at labeled timesteps then batch them"
  (modules/utils/detection.py:24-46) becomes a static per-lane gather:
  the host provides ``frame_tidx (B, L)`` + ``frame_valid (B, L)`` — L is a
  fixed budget — so the gather is lane-local and DP-sharding-friendly;
- truncated BPTT: the returned LSTM states are the scan outputs; gradients
  stop at the step boundary exactly like the reference's
  ``save_states_and_detach`` (modules/detection.py:170);
- state reset per lane via the ``is_first_sample`` mask
  (modules/utils/detection.py:115-130).

Batch layout (see data/batch.py):
  ev_repr      (T, B, H, W*C) uint8, W and C merged so the sequence sits in
               HBM unpadded; the per-step split/cast/pad happens on device
               behind an optimization barrier (neither the fp32 copy nor a
               lane-padded relayout of the whole sequence ever materializes)
  frame_tidx   (B, L) int32    time index of each selected labeled frame
  frame_valid  (B, L) bool
  gt_boxes     (B, L, G, 4) float32 cxcywh (input pixels)
  gt_classes   (B, L, G) int32
  gt_valid     (B, L, G) bool
  is_first     (B,) bool
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from sast_tpu.config import ExperimentConfig
from sast_tpu.models.backbone import zero_states
from sast_tpu.models.detector import YoloXDetector
from sast_tpu.models.head import inference_outputs
from sast_tpu.models.losses import yolox_loss
from sast_tpu.ops.nms import postprocess
from sast_tpu.training.optimizer import build_optimizer
from sast_tpu.utils.padding import InputPadder, padding_token_mask


class TrainState(train_state.TrainState):
    batch_stats: Any = None
    ema_params: Any = None


def create_train_state(
    cfg: ExperimentConfig,
    rng: jax.Array,
    learning_rate: Optional[float] = None,
    use_pallas: bool = False,
) -> Tuple[TrainState, YoloXDetector]:
    """use_pallas builds the model on the sparse window-skipping kernel —
    valid for training since the kernel carries a custom VJP (the guard in
    MaskedSparseAttention falls back to the XLA path if stochastic
    regularizers are configured, which the kernel does not implement)."""
    model = YoloXDetector(cfg.model, use_pallas=use_pallas)
    bb = cfg.model.backbone
    dummy_x = jnp.zeros((1, *bb.in_res_hw, bb.input_channels), jnp.float32)
    dummy_states = zero_states(bb, 1)
    # With masking enabled, init must trace the mask-token path so the
    # parameter exists (flax compact modules create params lazily).
    dummy_mask = (
        jnp.zeros((1, bb.in_res_hw[0] // 4, bb.in_res_hw[1] // 4), bool)
        if bb.enable_masking
        else None
    )
    variables = jax.jit(model.init)(rng, dummy_x, dummy_states, dummy_mask)
    tx = build_optimizer(cfg.training, learning_rate)
    # EMA must be a distinct buffer copy: sharing params' buffers makes
    # donation fail ("attempt to donate the same buffer twice").
    ema = (
        jax.tree.map(jnp.copy, variables["params"])
        if cfg.training.ema_decay > 0
        else None
    )
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=tx,
        batch_stats=variables.get("batch_stats", {}),
        ema_params=ema,
    )
    return state, model


def _reset_states(lstm_states, is_first: jnp.ndarray):
    """Zero the state lanes flagged as sequence starts."""

    def mask(s):
        keep = (~is_first).astype(s.dtype)
        return s * keep.reshape((-1,) + (1,) * (s.ndim - 1))

    return jax.tree.map(mask, lstm_states)


def _backbone_scan(
    model: YoloXDetector,
    params,
    ev_repr: jnp.ndarray,
    lstm_states,
    in_stages: Tuple[int, ...],
    deterministic: bool,
    padder: Optional[InputPadder] = None,
    num_channels: Optional[int] = None,
    dropout_rng: Optional[jax.Array] = None,
    token_mask: Optional[jnp.ndarray] = None,
    remat_policy: str = "dots",
):
    """Scan the recurrent backbone over time; returns stacked FPN-input feats.

    ev_repr: (T, B, H, W*C) uint8 when padder is given (W, C merged; see the
    module docstring), else (T, B, H, W, C) float. The per-step split + pad
    happen INSIDE the scan, in uint8, so only one padded timestep ever
    materializes and at 1 byte/element; the backbone stem does the (exact)
    cast to its compute dtype.
    The scan step is rematerialized per timestep; the default policy is
    ``full`` (save only the scan carry): the round-4 hardware sweep
    (scripts/profile_train.py) measured it FASTEST on both production
    recipes (gen1-base 234.6 vs 273.0 ms, gen4-base 368.1 vs 416.0 ms vs
    ``dots``) at 2-4x less temp HBM — the step is HBM-bound, so
    recomputing the forward beats storing it. (The round-2 claim that
    full remat was "20x slower" was a pre-cliff dispatch artifact,
    docs/DESIGN.md §6.) ``dots`` (save matmul/conv outputs) remains as an
    option; ``none`` OOMs the production recipes on one v5e.

    When ``dropout_rng`` is given (and deterministic=False), a fresh dropout
    key is split off the scan carry each timestep, so drop_path /
    drop_cell_update / drop_mlp sample new masks per step — matching the
    reference, where every torch dropout call draws fresh randomness
    (SAST.py:186-193, rnn.py cell-update dropout).
    """
    thread_rng = dropout_rng is not None
    if remat_policy not in ("dots", "none", "full"):
        raise ValueError(
            f"remat_policy must be one of 'dots' | 'none' | 'full', "
            f"got {remat_policy!r}"
        )

    def _remat(f):
        if remat_policy == "none":
            return f  # save everything; fastest when HBM allows
        if remat_policy == "full":
            return jax.checkpoint(f)  # save nothing; minimum memory
        return jax.checkpoint(
            f, policy=jax.checkpoint_policies.dots_saveable
        )

    @_remat
    def step(carry, x_t):
        if thread_rng:
            states, key = carry
            key, sub = jax.random.split(key)
            rngs = {"dropout": sub}
        else:
            states, rngs = carry, None
        if padder is not None:
            # The barrier stops XLA from hoisting the split/cast out of the
            # loop into full-sequence padded/fp32 buffers (OOMs gen4 recipe).
            (x_t,) = jax.lax.optimization_barrier((x_t,))
            Bq, Hq, WC = x_t.shape
            x_t = x_t.reshape(Bq, Hq, WC // num_channels, num_channels)
            # Pad in the native uint8: the backbone stem casts to its compute
            # dtype on entry (backbone.py ConvDownsample), and uint8 -> bf16 /
            # fp32 is exact for histogram counts <= 255, so this is bit-
            # identical while the padded timestep materializes at 1/4 the
            # bytes (gen4 recipe: 59 MB vs 236 MB per scan step).
            x_t = padder.pad_tensor_ev_repr(x_t)
        feats, new_states, p = model.apply(
            {"params": params},
            x_t,
            states,
            token_mask,
            method=YoloXDetector.forward_backbone,
            deterministic=deterministic,
            rngs=rngs,
        )
        out = tuple(feats[s] for s in in_stages)
        new_carry = (new_states, key) if thread_rng else new_states
        return new_carry, (out, p)

    carry0 = (lstm_states, dropout_rng) if thread_rng else lstm_states
    final_carry, (feats_seq, p_seq) = jax.lax.scan(step, carry0, ev_repr)
    final_states = final_carry[0] if thread_rng else final_carry
    return final_states, feats_seq, p_seq


def make_train_step(
    model: YoloXDetector, cfg: ExperimentConfig
) -> Callable:
    """Returns train_step(state, batch, lstm_states) -> (state, lstm_states, metrics)."""
    in_stages = tuple(cfg.model.fpn.in_stages)
    num_classes = cfg.model.head.num_classes
    topk = cfg.model.head.simota_topk
    padder = InputPadder(cfg.model.backbone.in_res_hw)
    token_mask = (
        padding_token_mask(cfg.dataset.resolution_hw, cfg.model.backbone.in_res_hw)
        if cfg.model.backbone.enable_masking
        else None
    )
    # Stochastic regularization is active iff any rate is nonzero (reference
    # defaults all to 0). The per-step dropout key is derived from the seed
    # and the optimizer step, so resume reproduces the same noise stream.
    att = cfg.model.backbone.attention
    stochastic = (
        att.drop_path > 0.0
        or att.drop_mlp > 0.0
        or cfg.model.backbone.lstm.drop_cell_update > 0.0
    )
    seed = cfg.training.seed if cfg.training.seed is not None else 0

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], lstm_states):
        lstm_states = _reset_states(lstm_states, batch["is_first"])
        T, B = batch["ev_repr"].shape[:2]
        L = batch["frame_tidx"].shape[1]
        ev_repr = batch["ev_repr"]  # (T, B, H, W*C) uint8
        dropout_rng = (
            jax.random.fold_in(jax.random.PRNGKey(seed), state.step)
            if stochastic
            else None
        )

        def loss_fn(params):
            final_states, feats_seq, p_seq = _backbone_scan(
                model, params, ev_repr, lstm_states, in_stages,
                deterministic=not stochastic, padder=padder,
                num_channels=cfg.model.backbone.input_channels,
                dropout_rng=dropout_rng, token_mask=token_mask,
                remat_policy=cfg.training.remat_policy,
            )
            # Lane-local gather of labeled frames: (T, B, ...) -> (B, L, ...).
            lane = jnp.arange(B)[:, None]
            sel = {
                s: f[batch["frame_tidx"], lane].reshape(B * L, *f.shape[2:])
                for s, f in zip(in_stages, feats_seq)
            }
            outputs, new_model_state = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                sel,
                train=True,
                method=YoloXDetector.forward_detect,
                mutable=["batch_stats"],
            )
            losses = yolox_loss(
                preds=outputs["preds"],
                grids=outputs["grids"],
                strides=outputs["strides"],
                gt_boxes=batch["gt_boxes"].reshape(B * L, -1, 4),
                gt_classes=batch["gt_classes"].reshape(B * L, -1),
                gt_valid=batch["gt_valid"].reshape(B * L, -1),
                frame_valid=batch["frame_valid"].reshape(B * L),
                num_classes=num_classes,
                topk=topk,
            )
            aux = {
                "losses": losses,
                "new_states": final_states,
                "batch_stats": new_model_state["batch_stats"],
                # Mean selected tokens per step (reference progress-bar 'N',
                # modules/detection.py:196-200).
                "P": jnp.sum(p_seq) / T,
            }
            return losses["loss"], aux

        grads, aux = jax.grad(loss_fn, has_aux=True)(state.params)
        # Gradient-flow telemetry (reference callbacks/gradflow.py): global
        # grad norm plus per-component norms.
        grad_norms = {
            f"grad_norm/{k}": optax.global_norm(v) for k, v in grads.items()
        }
        grad_norms["grad_norm"] = optax.global_norm(grads)
        new_state = state.apply_gradients(
            grads=grads, batch_stats=aux["batch_stats"]
        )
        if state.ema_params is not None:
            d = cfg.training.ema_decay
            new_ema = jax.tree.map(
                lambda e, p: e * d + p * (1.0 - d),
                state.ema_params,
                new_state.params,
            )
            new_state = new_state.replace(ema_params=new_ema)
        new_lstm_states = jax.lax.stop_gradient(aux["new_states"])
        metrics = dict(aux["losses"])
        metrics["P"] = aux["P"]
        metrics.update(grad_norms)
        return new_state, new_lstm_states, metrics

    return train_step


def make_eval_step(model: YoloXDetector, cfg: ExperimentConfig) -> Callable:
    """Returns eval_step(variables, batch, lstm_states) ->
    (lstm_states, detections)

    Runs the backbone over the clip, detects at the labeled frames, applies
    on-device NMS. Detections come back with static budgets + validity masks;
    the host converts them to Prophesee format (eval/prophesee.py).
    """
    in_stages = tuple(cfg.model.fpn.in_stages)
    pp = cfg.model.postprocess
    num_classes = cfg.model.head.num_classes
    padder = InputPadder(cfg.model.backbone.in_res_hw)
    token_mask = (
        padding_token_mask(cfg.dataset.resolution_hw, cfg.model.backbone.in_res_hw)
        if cfg.model.backbone.enable_masking
        else None
    )

    def eval_step(variables, batch: Dict[str, jnp.ndarray], lstm_states):
        lstm_states = _reset_states(lstm_states, batch["is_first"])
        T, B = batch["ev_repr"].shape[:2]
        L = batch["frame_tidx"].shape[1]
        params = variables["params"]
        ev_repr = batch["ev_repr"]  # (T, B, H, W*C) uint8

        final_states, feats_seq, _ = _backbone_scan(
            model, params, ev_repr, lstm_states, in_stages,
            deterministic=True, padder=padder,
            num_channels=cfg.model.backbone.input_channels,
            token_mask=token_mask,
        )
        lane = jnp.arange(B)[:, None]
        sel = {
            s: f[batch["frame_tidx"], lane].reshape(B * L, *f.shape[2:])
            for s, f in zip(in_stages, feats_seq)
        }
        outputs = model.apply(
            variables, sel, train=False, method=YoloXDetector.forward_detect
        )
        dets = postprocess(
            inference_outputs(outputs["preds"]),
            num_classes=num_classes,
            conf_threshold=pp.confidence_threshold,
            nms_threshold=pp.nms_threshold,
            pre_nms_topk=pp.pre_nms_topk,
            max_detections=pp.max_detections,
        )
        # Invalidate padding frames on-device.
        fv = batch["frame_valid"].reshape(B * L)
        dets["valid"] = dets["valid"] & fv[:, None]
        return final_states, dets

    return eval_step


def make_inference_step(model: YoloXDetector, cfg: ExperimentConfig) -> Callable:
    """Single-frame streaming inference: (variables, x, states) ->
    (detections, new_states, selected_token_telemetry). The deployable unit
    (SURVEY.md section 3.3); states are donatable for zero-copy carry.
    ``x`` may be at the dataset's native resolution — it is zero-padded to
    the model resolution here (like the train/eval steps and serving)."""
    pp = cfg.model.postprocess
    num_classes = cfg.model.head.num_classes
    padder = InputPadder(cfg.model.backbone.in_res_hw)
    # Same padded-region mask token substitution as train/eval — without it
    # the deployed path would see raw zero-pad embeddings the model never
    # trained on (train-inference skew at the bottom/right borders).
    token_mask = (
        padding_token_mask(cfg.dataset.resolution_hw, cfg.model.backbone.in_res_hw)
        if cfg.model.backbone.enable_masking
        else None
    )

    def infer_step(variables, x: jnp.ndarray, lstm_states):
        x = padder.pad_tensor_ev_repr(x)  # no-op when already pre-padded
        feats, new_states, p = model.apply(
            {"params": variables["params"]},
            x,
            lstm_states,
            token_mask,
            method=YoloXDetector.forward_backbone,
        )
        outputs = model.apply(
            variables,
            feats,
            train=False,
            method=YoloXDetector.forward_detect,
        )
        dets = postprocess(
            inference_outputs(outputs["preds"]),
            num_classes=num_classes,
            conf_threshold=pp.confidence_threshold,
            nms_threshold=pp.nms_threshold,
            pre_nms_topk=pp.pre_nms_topk,
            max_detections=pp.max_detections,
        )
        return dets, new_states, p

    return infer_step
