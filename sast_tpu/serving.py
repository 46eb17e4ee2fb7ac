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


# Re-exported for backward compatibility; the implementation lives in the
# dependency-light sast_tpu/packing.py (shared with the artifact runtime).
from sast_tpu.packing import pack_event_batch, pack_events  # noqa: F401,E402


class StreamingDetector:
    """Online detector with on-device tensorization; 1..S parallel streams.

    Single stream:
        det = StreamingDetector(cfg, variables, max_events=200_000)
        for frame_events in stream:               # dicts of x/y/p/t arrays
            out = det.process_events(**frame_events)
            # out: boxes (K,4) xyxy, scores (K,), classes (K,), valid (K,)

    Batched serving (``num_streams=S``): independent streams share one
    device program — lanes amortize dispatch overhead and fill the MXU; a
    per-lane ``reset`` mask zeroes recurrent state at stream boundaries
    INSIDE the program (no host-side state surgery, and it survives AOT
    export):
        outs = det.process_batch(frames, reset=[True, False, ...])
    """

    def __init__(
        self,
        cfg: ExperimentConfig,
        variables: Dict,
        max_events: int = 200_000,
        bins: int = 10,
        count_cutoff: int = 10,
        num_streams: int = 1,
        # Shard the stream lanes over a device mesh (pod serving): lanes,
        # carried state, and the packed event upload are partitioned on the
        # lane axis; weights are replicated; nothing crosses lanes, so XLA
        # inserts no collectives in the hot path.
        mesh=None,
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
        self.num_streams = num_streams
        self.mesh = mesh
        if mesh is not None:
            n_dev = int(np.prod(list(mesh.shape.values())))
            assert num_streams % n_dev == 0, (
                f"num_streams={num_streams} must tile the {n_dev}-device mesh"
            )
        bb = cfg.model.backbone
        assert bb.input_channels == 2 * bins, (bb.input_channels, bins)
        self.native_hw = cfg.dataset.resolution_hw
        self.variables = variables
        self.model = YoloXDetector(cfg.model, use_pallas=use_pallas)
        dtype = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32
        self.states = zero_states(bb, num_streams, dtype=dtype)

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

        def tensorize(packed, n_events):
            # packed: (E, 4) int32 columns [x, y, p, t]
            x, y, p, t = (packed[:, i] for i in range(4))
            return stacked_histogram_jax(
                x, y, p, t, n_events,
                bins=bins, height=h, width=w, count_cutoff=count_cutoff,
            )  # (H, W, 2*bins) uint8

        def step(variables, states, packed, n_events, reset):
            # packed: (S, E, 4) int32; n_events, reset: (S,) — one upload
            # per batch of frames. Lanes flagged in `reset` start a new
            # stream: their carried state is zeroed before the backbone.
            states = jax.tree.map(
                lambda s: jnp.where(
                    reset.reshape((reset.shape[0],) + (1,) * (s.ndim - 1)),
                    jnp.zeros((), s.dtype),
                    s,
                ),
                states,
            )
            rep = jax.vmap(tensorize)(packed, n_events)  # (S, H, W, C)
            # Pad in uint8 (4x less HBM traffic than an fp32 pad; the
            # backbone's entry cast is exact for count_cutoff <= 255
            # histograms — same design as the train step, steps.py).
            ev = padder.pad_tensor_ev_repr(rep)
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
        if mesh is not None:
            from sast_tpu.parallel.mesh import batch_sharding, replicated

            lane = batch_sharding(mesh, 0)
            self._step = jax.jit(
                step,
                donate_argnums=(1,),
                # single-sharding pytree prefixes broadcast to all leaves:
                # (variables replicated, states/packed/n/reset lane-sharded)
                in_shardings=(replicated(mesh), lane, lane, lane, lane),
            )
            # One-time placement: without this every process_batch dispatch
            # re-replicates the full weight tree from its original device.
            self.variables = jax.device_put(self.variables, replicated(mesh))
            self.states = jax.device_put(self.states, lane)
            self._lane_sharding = lane
        else:
            self._step = jax.jit(step, donate_argnums=(1,))
            self._lane_sharding = None

    def reset(self) -> None:
        """Zero the carried state of every lane (host-side; per-lane resets
        go through ``process_batch``'s ``reset`` mask)."""
        bb = self.cfg.model.backbone
        dtype = (
            jnp.bfloat16
            if self.cfg.model.compute_dtype == "bfloat16"
            else jnp.float32
        )
        self.states = zero_states(bb, self.num_streams, dtype=dtype)
        if self._lane_sharding is not None:
            self.states = jax.device_put(self.states, self._lane_sharding)

    def process_batch(
        self,
        frames: List[Dict[str, np.ndarray]],
        reset: Optional[np.ndarray] = None,
    ) -> Dict[str, np.ndarray]:
        """One frame window per lane -> batched detections.

        ``frames``: ``num_streams`` dicts of x/y/p/t arrays. ``reset``:
        optional (S,) bool — lanes starting a new stream this frame.
        Returns arrays with a leading lane axis, plus the per-stage
        ``selected_tokens`` telemetry (batch-aggregate).
        """
        S = self.num_streams
        packed, n = pack_event_batch(frames, S, self.max_events)
        reset = (
            np.zeros((S,), bool) if reset is None else np.asarray(reset, bool)
        )
        dets, self.states, p_tel = self._step(
            self.variables,
            self.states,
            jnp.asarray(packed),
            jnp.asarray(n),
            jnp.asarray(reset),
        )
        out = jax.device_get(dets)
        return dict(out) | {"selected_tokens": np.asarray(p_tel)}

    def process_events(
        self,
        x: np.ndarray,
        y: np.ndarray,
        p: np.ndarray,
        t: np.ndarray,
    ) -> Dict[str, np.ndarray]:
        """One frame window of raw (sorted-by-time) events -> detections
        (single-stream convenience over ``process_batch``)."""
        assert self.num_streams == 1, "use process_batch with num_streams > 1"
        out = self.process_batch([dict(x=x, y=y, p=p, t=t)])
        tel = out.pop("selected_tokens")
        return {k: v[0] for k, v in out.items()} | {"selected_tokens": tel}
