"""Input padding to the model resolution.

Equivalent of the reference InputPadderFromShape
(/root/reference/utils/padding.py:7-62): bottom/right zero padding of the
event representation to the model (H, W), plus the stride-4 token-mask
variant. NHWC layout.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


class InputPadder:
    def __init__(self, desired_hw: Tuple[int, int]):
        assert desired_hw[0] % 4 == 0 and desired_hw[1] % 4 == 0
        self.desired_hw = tuple(desired_hw)

    def pad_tensor_ev_repr(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (..., H, W, C) NHWC -> zero-pad bottom/right to desired (H, W)."""
        ht, wt = self.desired_hw
        h, w = x.shape[-3], x.shape[-2]
        assert ht >= h and wt >= w, (x.shape, self.desired_hw)
        pad = [(0, 0)] * (x.ndim - 3) + [(0, ht - h), (0, wt - w), (0, 0)]
        return jnp.pad(x, pad)

    def pad_token_mask(self, mask: jnp.ndarray) -> jnp.ndarray:
        """mask: (..., H/4, W/4) bool -> pad with True (padded area is masked)."""
        ht, wt = self.desired_hw[0] // 4, self.desired_hw[1] // 4
        h, w = mask.shape[-2], mask.shape[-1]
        assert ht >= h and wt >= w
        pad = [(0, 0)] * (mask.ndim - 2) + [(0, ht - h), (0, wt - w)]
        return jnp.pad(mask, pad, constant_values=True)


def padding_token_mask(
    data_hw: Tuple[int, int], desired_hw: Tuple[int, int]
) -> "jnp.ndarray | None":
    """Stride-4 token mask for the static bottom/right input padding.

    True marks tokens that lie entirely inside the zero-padded region; the
    backbone's stage-0 mask-token path replaces their embeddings with the
    learned mask token (reference consumer: sast_rnn.py:265-268 via
    modules/detection.py:124-148 — the reference data pipeline never produces
    this mask; here the producer is the known static padding geometry).

    Returns None when there is no padding (mask would be all-False).
    Shape: (1, H/4, W/4), broadcastable over the batch.
    """
    (h, w), (ht, wt) = data_hw, desired_hw
    assert ht >= h and wt >= w
    if (h, w) == (ht, wt):
        return None
    # Tokens partially covering real data stay unmasked.
    h4_real = -(-h // 4)
    w4_real = -(-w // 4)
    mask = jnp.ones((1, ht // 4, wt // 4), bool)
    mask = mask.at[:, :h4_real, :w4_real].set(False)
    return mask
