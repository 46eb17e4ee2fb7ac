"""Streaming detection runtime: raw events in, detections out.

The deployable unit of SURVEY.md section 3.3 — repeat per frame:
{event tensorization -> recurrent backbone with carried LSTM state -> PAFPN
-> head -> NMS} — as ONE jitted device program:

- events arrive as padded int32 arrays with a static per-frame budget
  (``max_events``); the stacked-histogram tensorization is the fused
  on-device scatter-add (data/representations.stacked_histogram_jax), so the
  host ships ~16 bytes/event instead of a dense frame;
- the recurrent state lives on device between frames (donated, zero-copy);
- detections come back as a fixed-budget slate with a validity mask — the
  only per-frame device->host transfer.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sast_tpu.config import ExperimentConfig
from sast_tpu.data.representations import stacked_histogram_jax
from sast_tpu.models.backbone import zero_states
from sast_tpu.models.detector import YoloXDetector
from sast_tpu.models.head import inference_outputs
from sast_tpu.ops.nms import postprocess
from sast_tpu.utils.padding import InputPadder, padding_token_mask


def pack_events(
    x: np.ndarray,
    y: np.ndarray,
    p: np.ndarray,
    t: np.ndarray,
    max_events: int,
) -> Tuple[np.ndarray, int]:
    """Pack one frame's raw event arrays into the static (E, 4) int32 layout.

    Shared by the live detector and the exported-artifact runtime so both
    ship identical bytes to the device.
    """
    n = int(x.size)
    assert n <= max_events, f"{n} events exceed budget {max_events}"
    packed = np.zeros((max_events, 4), np.int32)
    packed[:n, 0] = x[:n]
    packed[:n, 1] = y[:n]
    packed[:n, 2] = p[:n]
    packed[:n, 3] = t[:n]
    return packed, n


class StreamingDetector:
    """Single-stream online detector with on-device tensorization.

    Usage:
        det = StreamingDetector(cfg, variables, max_events=200_000)
        for frame_events in stream:               # dicts of x/y/p/t arrays
            out = det.process_events(**frame_events)
            # out: boxes (K,4) xyxy, scores (K,), classes (K,), valid (K,)
    """

    def __init__(
        self,
        cfg: ExperimentConfig,
        variables: Dict,
        max_events: int = 200_000,
        bins: int = 10,
        count_cutoff: int = 10,
        # XLA masked path by default: clean (fetch-free) measurement shows
        # the batched dense formulation beats the window-skipping kernel at
        # every density on v5e (scripts/bench_sparse_layer.py; the round-1
        # "kernel wins below 40%" was a degraded-dispatch artifact, see
        # docs/DESIGN.md section 6). The kernel stays available for regimes
        # with much larger windows.
        use_pallas: bool = False,
    ):
        self.cfg = cfg
        self.max_events = max_events
        bb = cfg.model.backbone
        assert bb.input_channels == 2 * bins, (bb.input_channels, bins)
        self.native_hw = cfg.dataset.resolution_hw
        self.variables = variables
        self.model = YoloXDetector(cfg.model, use_pallas=use_pallas)
        dtype = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32
        self.states = zero_states(bb, 1, dtype=dtype)

        padder = InputPadder(bb.in_res_hw)
        token_mask = (
            padding_token_mask(self.native_hw, bb.in_res_hw)
            if bb.enable_masking
            else None
        )
        pp = cfg.model.postprocess
        num_classes = cfg.model.head.num_classes
        h, w = self.native_hw
        model = self.model

        def step(variables, states, packed, n_events):
            # packed: (E, 4) int32 columns [x, y, p, t] — one upload per frame
            x, y, p, t = (packed[:, i] for i in range(4))
            rep = stacked_histogram_jax(
                x, y, p, t, n_events,
                bins=bins, height=h, width=w, count_cutoff=count_cutoff,
            )  # (H, W, 2*bins) uint8
            ev = padder.pad_tensor_ev_repr(rep[None].astype(jnp.float32))
            feats, new_states, p_tel = model.apply(
                {"params": variables["params"]},
                ev,
                states,
                token_mask,
                method=YoloXDetector.forward_backbone,
            )
            outputs = model.apply(
                variables, feats, train=False, method=YoloXDetector.forward_detect
            )
            dets = postprocess(
                inference_outputs(outputs["preds"]),
                num_classes=num_classes,
                conf_threshold=pp.confidence_threshold,
                nms_threshold=pp.nms_threshold,
                pre_nms_topk=pp.pre_nms_topk,
                max_detections=pp.max_detections,
            )
            return dets, new_states, p_tel

        # Unjitted step kept for AOT export (sast_tpu/export.py binds the
        # weights as baked constants and re-jits with state donation).
        self._step_fn = step
        self._step = jax.jit(step, donate_argnums=(1,))

    def reset(self) -> None:
        bb = self.cfg.model.backbone
        dtype = (
            jnp.bfloat16
            if self.cfg.model.compute_dtype == "bfloat16"
            else jnp.float32
        )
        self.states = zero_states(bb, 1, dtype=dtype)

    def process_events(
        self,
        x: np.ndarray,
        y: np.ndarray,
        p: np.ndarray,
        t: np.ndarray,
    ) -> Dict[str, np.ndarray]:
        """One frame window of raw (sorted-by-time) events -> detections."""
        packed, n = pack_events(x, y, p, t, self.max_events)
        dets, self.states, p_tel = self._step(
            self.variables,
            self.states,
            jnp.asarray(packed),
            jnp.asarray(n, jnp.int32),
        )
        out = jax.device_get(dets)
        return {k: v[0] for k, v in out.items()} | {
            "selected_tokens": np.asarray(p_tel)
        }
