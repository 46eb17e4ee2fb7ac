"""AOT deployment artifacts for the streaming detector (``jax.export``).

The reference ships PyTorch eager checkpoints only — deploying it means
carrying the whole model codebase. The TPU-native deployment unit is the
serialized StableHLO of the jitted streaming step (serving.py: tensorize ->
recurrent backbone -> head -> NMS as one device program):

- **weights are baked** into the artifact as compile-time constants (they
  ARE constants at deploy time; measured: baking weights does not change
  step time, unlike baking the input — README benchmarking note);
- the carried LSTM state and the packed event buffer stay **runtime
  arguments**, with the state donated so the recurrence is zero-copy;
- the artifact is **self-describing**: input shapes/dtypes/pytree and the
  output tree are part of the ``jax.export`` serialization, so loading it
  needs no model config and no model code — only jax and the event-packing
  helper. ``ExportedStreamingDetector`` reconstructs the zero state and the
  event budget directly from the deserialized signature.

Portability notes:

- an artifact runs on the platform(s) recorded at export. Pass
  ``platforms=("cpu", "tpu")`` to build one artifact servable on both; the
  fused Pallas stem is then replaced by its numerically identical XLA
  formulation (the kernel's trace-time gate checks the default backend), so
  multi-platform artifacts are exact but leave the stem-kernel speedup on
  the table. Single-platform TPU exports taken on a TPU host keep the
  kernel (serialized as a ``tpu_custom_call``, which has no cross-version
  stability guarantee — hence opt-in via ``allow_tpu_kernels``).
- forward/backward compatibility follows jax's export guarantees
  (calling-convention version is embedded in the artifact).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

# Deliberately NO model imports at module level: loading this module on a
# serving host must need only jax + numpy (sast_tpu.serving pulls the full
# flax model stack and is imported lazily by the export function alone).
from sast_tpu.packing import pack_event_batch

_ARTIFACT_NAME = "streaming_step.jaxexport"


def export_streaming_detector(
    det: "sast_tpu.serving.StreamingDetector",  # noqa: F821
    path: Optional[str] = None,
    platforms: Optional[Sequence[str]] = None,
    allow_tpu_kernels: bool = False,
) -> bytes:
    """Serialize ``det``'s streaming step into a deployable artifact.

    Returns the serialized bytes; when ``path`` is given also writes them to
    ``<path>/streaming_step.jaxexport`` (creating the directory).

    ``platforms``: lowering platforms recorded in the artifact (default: the
    current backend). ``allow_tpu_kernels``: permit serializing the Pallas
    stem kernel's ``tpu_custom_call`` (stable only across matching runtime
    versions; leave False for long-lived artifacts).
    """
    from jax import export as jexport

    variables = det.variables
    step_fn = det._step_fn

    # Bind the weights as a closure constant; the carried state (arg 0) is
    # donated exactly as in the live detector's jitted step.
    def deploy_step(states, packed, n_events, reset):
        return step_fn(variables, states, packed, n_events, reset)

    jitted = jax.jit(deploy_step, donate_argnums=(0,))

    S = det.num_streams
    state_specs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), det.states
    )
    packed_spec = jax.ShapeDtypeStruct((S, det.max_events, 4), jnp.int32)
    n_spec = jax.ShapeDtypeStruct((S,), jnp.int32)
    reset_spec = jax.ShapeDtypeStruct((S,), jnp.bool_)

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    if allow_tpu_kernels:
        kwargs["disabled_checks"] = [
            jexport.DisabledSafetyCheck.custom_call("tpu_custom_call"),
        ]
    exported = jexport.export(jitted, **kwargs)(
        state_specs, packed_spec, n_spec, reset_spec
    )
    blob = exported.serialize()

    if path is not None:
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, _ARTIFACT_NAME), "wb") as f:
            f.write(blob)
    return blob


class ExportedStreamingDetector:
    """Run an exported streaming-detector artifact.

    Mirrors ``StreamingDetector``'s online API (``process_events`` /
    ``reset``) without needing the model code or config — everything is
    reconstructed from the artifact's embedded signature.
    """

    def __init__(self, blob_or_path: Union[bytes, str]):
        from jax import export as jexport

        if isinstance(blob_or_path, (bytes, bytearray)):
            blob = bytes(blob_or_path)
        else:
            p = blob_or_path
            if os.path.isdir(p):
                p = os.path.join(p, _ARTIFACT_NAME)
            with open(p, "rb") as f:
                blob = f.read()
        self._exported = jexport.deserialize(blob)
        self._fn = jax.jit(self._exported.call)

        # Rebuild the input pytree from the embedded signature:
        # in_tree is the treedef of ((states, packed, n_events, reset), {}).
        leaves = [
            np.zeros(a.shape, a.dtype) for a in self._exported.in_avals
        ]
        (args, _kwargs) = jax.tree_util.tree_unflatten(
            self._exported.in_tree, leaves
        )
        states_zero, packed_zero, _, _ = args
        self._states_zero = states_zero
        self.num_streams = int(packed_zero.shape[0])
        self.max_events = int(packed_zero.shape[1])
        self.states = jax.tree.map(jnp.asarray, states_zero)

    def reset(self) -> None:
        """Zero the carried recurrent state of every lane (per-lane resets
        go through ``process_batch``'s ``reset`` mask)."""
        self.states = jax.tree.map(jnp.asarray, self._states_zero)

    def process_batch(
        self,
        frames,
        reset: "np.ndarray | None" = None,
    ) -> Dict[str, np.ndarray]:
        """One frame window per lane -> batched detections (same contract
        as ``StreamingDetector.process_batch`` — both call
        ``packing.pack_event_batch``, so the byte layout cannot diverge)."""
        S = self.num_streams
        packed, n = pack_event_batch(frames, S, self.max_events)
        reset = (
            np.zeros((S,), bool) if reset is None else np.asarray(reset, bool)
        )
        dets, self.states, p_tel = self._fn(
            self.states, jnp.asarray(packed), jnp.asarray(n), jnp.asarray(reset)
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
        """One frame window of raw (sorted-by-time) events -> detections."""
        assert self.num_streams == 1, "use process_batch with num_streams > 1"
        out = self.process_batch([dict(x=x, y=y, p=p, t=t)])
        tel = out.pop("selected_tokens")
        return {k: v[0] for k, v in out.items()} | {"selected_tokens": tel}
