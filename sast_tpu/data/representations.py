"""Event-stream tensorizations (host numpy + on-device JAX variants).

Rebuilds the reference representations
(/root/reference/data/utils/representations.py:37-218):

- ``StackedHistogram``: (2 polarities x bins) event-count histogram over a
  time window, clamped to ``count_cutoff``, uint8, flattened to
  (2 * bins, H, W) channels -> transposed here to NHWC (H, W, 2 * bins).
- ``MixedDensityEventStack``: int8 polarity stack with power-of-two bin
  spacing and reverse channel cumsum.

The numpy paths run in the host input pipeline (the reference tensorizes at
preprocess time with torch ``put_``); ``stacked_histogram_jax`` is a fused
on-device scatter-add for online/streaming tensorization on TPU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class StackedHistogram:
    """Counting histogram: channels = 2 (polarity) * bins (time)."""

    def __init__(
        self,
        bins: int,
        height: int,
        width: int,
        count_cutoff: Optional[int] = None,
    ):
        assert bins >= 1 and height >= 1 and width >= 1
        self.bins = bins
        self.height = height
        self.width = width
        self.count_cutoff = 255 if count_cutoff is None else min(count_cutoff, 255)
        assert self.count_cutoff >= 1
        self.channels = 2

    @staticmethod
    def get_numpy_dtype() -> np.dtype:
        return np.dtype("uint8")

    def get_shape(self) -> Tuple[int, int, int]:
        """(C, H, W) channel-first shape, matching the on-disk layout."""
        return 2 * self.bins, self.height, self.width

    def construct(
        self, x: np.ndarray, y: np.ndarray, pol: np.ndarray, time: np.ndarray
    ) -> np.ndarray:
        """Build (2*bins, H, W) uint8 histogram from sorted event arrays."""
        bn, ht, wd = self.bins, self.height, self.width
        rep = np.zeros((self.channels * bn * ht * wd,), np.int32)
        if x.size == 0:
            return rep.reshape(-1, ht, wd).astype(np.uint8)
        assert x.size == y.size == pol.size == time.size
        pol = pol.astype(np.int64)
        assert pol.min() >= 0 and pol.max() <= 1

        from sast_tpu import native

        if native.available():
            return native.stacked_histogram(
                x, y, pol, time, bn, ht, wd, self.count_cutoff
            )

        t0, t1 = int(time[0]), int(time[-1])
        assert t1 >= t0
        t_norm = (time.astype(np.float64) - t0) / max(t1 - t0, 1)
        t_idx = np.clip(np.floor(t_norm * bn), None, bn - 1).astype(np.int64)

        indices = (
            x.astype(np.int64)
            + wd * y.astype(np.int64)
            + ht * wd * t_idx
            + bn * ht * wd * pol
        )
        np.add.at(rep, indices, 1)
        rep = np.clip(rep, 0, self.count_cutoff).astype(np.uint8)
        return rep.reshape(-1, ht, wd)


class MixedDensityEventStack:
    """Signed polarity stack with logarithmic (power-of-two) time bins."""

    def __init__(
        self, bins: int, height: int, width: int, count_cutoff: Optional[int] = None
    ):
        assert bins >= 1 and height >= 1 and width >= 1
        self.bins = bins
        self.height = height
        self.width = width
        if count_cutoff is not None:
            assert 0 <= count_cutoff <= 127
        self.count_cutoff = count_cutoff

    @staticmethod
    def get_numpy_dtype() -> np.dtype:
        return np.dtype("int8")

    def get_shape(self) -> Tuple[int, int, int]:
        return self.bins, self.height, self.width

    def construct(
        self, x: np.ndarray, y: np.ndarray, pol: np.ndarray, time: np.ndarray
    ) -> np.ndarray:
        bn, ht, wd = self.bins, self.height, self.width
        rep = np.zeros((bn * ht * wd,), np.int32)
        if x.size == 0:
            return rep.reshape(bn, ht, wd).astype(np.int8)
        assert pol.min() >= 0 and pol.max() <= 1
        pol_signed = pol.astype(np.int64) * 2 - 1

        t0, t1 = int(time[0]), int(time[-1])
        assert t1 >= t0
        t_norm = (time.astype(np.float64) - t0) / max(t1 - t0, 1)
        t_norm = np.clip(t_norm, 1e-6, 1 - 1e-6)
        # bin = N - log_{1/2}(t_norm); recent time -> high bin index.
        bin_float = bn - np.log(t_norm) / np.log(0.5)
        t_idx = np.floor(np.clip(bin_float, 0, None)).astype(np.int64)

        from sast_tpu import native

        if native.available():
            return native.mixed_density_stack(
                x, y, pol.astype(np.int64), time, bn, ht, wd,
                self.count_cutoff or 0,
            )

        indices = x.astype(np.int64) + wd * y.astype(np.int64) + ht * wd * t_idx
        np.add.at(rep, indices, pol_signed)
        rep = rep.reshape(bn, ht, wd)
        # Reverse cumulative sum across channels: channel i accumulates bins <= i.
        rep = np.cumsum(rep, axis=0)
        if self.count_cutoff is not None:
            rep = np.clip(rep, -self.count_cutoff, self.count_cutoff)
        rep = np.clip(rep, -128, 127)  # saturate instead of int8 wraparound
        return rep.astype(np.int8)


def stacked_histogram_jax(
    x, y, pol, time, n_events, bins: int, height: int, width: int,
    count_cutoff: int = 255,
):
    """Fused on-device stacked histogram with a static event budget.

    Args:
      x, y, pol, time: (E,) int32 arrays, padded to static length E.
      n_events: scalar int32 — number of valid leading events.

    Returns (H, W, 2*bins) uint8 NHWC representation.
    """
    import jax.numpy as jnp

    E = x.shape[0]
    valid = jnp.arange(E) < n_events

    t0 = time[0]
    # Last valid timestamp.
    last_idx = jnp.maximum(n_events - 1, 0)
    t1 = time[last_idx]
    denom = jnp.maximum(t1 - t0, 1).astype(jnp.float32)
    t_norm = (time - t0).astype(jnp.float32) / denom
    t_idx = jnp.clip(jnp.floor(t_norm * bins), 0, bins - 1).astype(jnp.int32)

    flat_idx = x + width * y + height * width * t_idx + bins * height * width * pol
    flat_idx = jnp.where(valid, flat_idx, 2 * bins * height * width)  # drop slot
    rep = jnp.zeros((2 * bins * height * width,), jnp.int32)
    rep = rep.at[flat_idx].add(1, mode="drop")
    rep = jnp.clip(rep, 0, count_cutoff).astype(jnp.uint8)
    # (2*bins, H, W) -> NHWC
    return rep.reshape(2 * bins, height, width).transpose(1, 2, 0)
