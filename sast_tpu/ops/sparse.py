"""Scene-adaptive scoring & selection — static-shape TPU formulation.

The reference selection (/root/reference/models/layers/SAST/SAST.py:84-96,
258-281) produces *dynamic-length* index lists via ``nonzero``/``topk`` and
physically gathers the selected windows/tokens. Under XLA that would force a
recompile per sparsity pattern, so we reformulate selection as **boolean
masks** over a static layout:

- ``window_keep (B, N)``  — windows whose softmax-normalized L1 score is
  >= (1/N) / (1 + bounce)
- ``token_keep  (B, N, hw)`` — tokens (within kept windows) whose softmax
  score is >= (1/hw) / (1 + bounce)

The masked attention consuming these masks (models/sast.py) is mathematically
identical to the reference's gather/pad/scatter pipeline: per kept window,
attention runs among its selected tokens only (the reference's per-window
top-K padding is purely a batching device — padded slots are key-masked with
-1e4 and their outputs discarded, SAST.py:222-226, 250-254).
"""

from __future__ import annotations

import logging
from typing import Tuple

import jax
import jax.numpy as jnp

_kernel_skip_warned = False


def _warn_kernel_skipped_multidevice() -> None:
    """One-time signal that the density Pallas kernel is disabled because the
    host exposes >1 device (GSPMD cannot partition the custom call). On a
    multi-chip host running a single-chip model, restrict visible devices
    (e.g. jax.config.update('jax_default_device', ...) or TPU_VISIBLE_CHIPS)
    to re-enable it — ADVICE r3: previously this fallback was silent."""
    global _kernel_skip_warned
    if not _kernel_skip_warned:
        _kernel_skip_warned = True
        logging.getLogger(__name__).info(
            "non_zero_ratio: Pallas density kernel disabled on a %d-device "
            "host (single-device only); using the ~4.9x-slower XLA path. "
            "Restrict visible devices to re-enable.",
            jax.device_count(),
        )


def non_zero_ratio(
    x: jnp.ndarray, num_stages: int = 4, use_pallas: bool = True
) -> jnp.ndarray:
    """Per-stage channel-wise event-density ratio.

    Equivalent of the reference ``non_zero_ratio``
    (/root/reference/models/detection/recurrent_backbone/sast_rnn.py:45-60):
    max-pool the input by 4, then by 2 per subsequent stage, and report the
    fraction of non-zero cells per channel at each scale.

    On single-device TPU with uint8 input at pool-divisible extents this
    dispatches to a Pallas kernel (ops/pallas/density.py) — every XLA
    formulation of this op is ~40x off the bandwidth roof at the shipped
    geometries (scripts/ablate_ratio.py); ``use_pallas=False`` forces the
    XLA path. Multi-device meshes always take XLA (GSPMD cannot partition
    the custom call), as do signed inputs (value-max semantics differ).

    Args:
      x: (B, H, W, C) event representation (NHWC; any numeric dtype).

    Returns:
      (B, num_stages, C) float32 ratios in [0, 1]; no gradient flows.
    """
    if use_pallas and jax.default_backend() == "tpu":
        if jax.device_count() == 1:
            from sast_tpu.ops.pallas.density import (
                density_ratio_tpu,
                ratio_kernel_supported,
            )

            if ratio_kernel_supported(x.shape, num_stages, x.dtype):
                return density_ratio_tpu(x)
        else:
            _warn_kernel_skipped_multidevice()
    # Max-pool in the input's native dtype (uint8 for stacked histograms):
    # casting the full-res input to fp32 first costs 4x the HBM traffic of
    # this whole op. Non-overlapping power-of-two pooling is a reshape-max,
    # which XLA lowers better than reduce_window here. Semantics match the
    # reference maxpool exactly (including signed inputs, where a window of
    # {-1, 0} pools to 0 and counts as zero).
    x = jax.lax.stop_gradient(x)
    ratios = []
    pooled = x
    for stage in range(num_stages):
        k = 4 if stage == 0 else 2
        B, H, W, C = pooled.shape
        # Floor odd extents like the reference's VALID-padding maxpool does
        # (identity slice when H, W divide k — the shipped configs round the
        # model resolution to multiples of 32, so this costs nothing there).
        # Shapes are static under jit, so this check is a trace-time error,
        # never a silent 0/0 -> NaN density.
        assert H >= k and W >= k, (
            f"input {x.shape} too small for the stage-{stage} pool factor {k} "
            f"(needs H, W >= {4 * 2 ** (num_stages - 1)} overall)"
        )
        pooled = pooled[:, : H // k * k, : W // k * k]
        pooled = pooled.reshape(B, H // k, k, W // k, k, C).max(axis=(2, 4))
        nz = jnp.sum((pooled != 0).astype(jnp.float32), axis=(1, 2))  # (B, C)
        # Reference normalization: count / (C * Hp * Wp)
        # (sast_rnn.py:57-60 divides by x_down.numel()/B = C*Hp*Wp, an extra
        # 1/C vs plain per-channel occupancy). Kept bit-compatible so
        # migrated checkpoints' PositiveLinear(to_controls) sees the exact
        # reference scale (ADVICE r3: this used to deviate by C=20x).
        ratios.append(nz / (pooled.shape[1] * pooled.shape[2] * C))
    return jnp.stack(ratios, axis=1)


def select_windows_and_tokens(
    scores: jnp.ndarray,
    bounce: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Window + token co-selection from amplified scores.

    Mirrors ``window_selection`` / ``token_selection``
    (/root/reference/models/layers/SAST/SAST.py:84-96) as masks.

    Args:
      scores: (B, N, hw, C) non-negative amplified scores.
      bounce: BOUNCE slack constant.

    Returns:
      window_keep: (B, N) bool.
      token_keep:  (B, N, hw) bool — includes the window mask (a token is kept
        only if its window is kept).
    """
    B, N, hw, C = scores.shape
    # Selection always runs in fp32: with near-uniform scores the softmax sits
    # *exactly* at the 1/N threshold (the dense-fallback regime keeps every
    # window), and bf16 exp/reciprocal approximations can flip the comparison.
    scores = scores.astype(jnp.float32)
    # Window selection: L1 over (token, channel) / hw, softmax over windows.
    win_l1 = jnp.sum(jnp.abs(scores), axis=(2, 3)) / hw  # (B, N)
    win_soft = jax.nn.softmax(win_l1, axis=-1)
    window_keep = win_soft >= (1.0 / N) / (1.0 + bounce)

    # Token selection: L1 over channel, softmax over tokens within the window.
    # The reference computes softmax only over kept windows, but softmax is
    # per-window (axis=-1 over hw), so computing it everywhere is identical.
    tok_l1 = jnp.sum(jnp.abs(scores), axis=3)  # (B, N, hw)
    tok_soft = jax.nn.softmax(tok_l1, axis=-1)
    token_keep = (tok_soft >= (1.0 / hw) / (1.0 + bounce)) & window_keep[..., None]
    return window_keep, token_keep
