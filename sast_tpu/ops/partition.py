"""Window / grid partitioning for block-local and dilated attention.

TPU-native NHWC reshape/transpose equivalents of the reference partition ops
(/root/reference/models/layers/SAST/ops.py:189-220). Both partitions map
``(B, H, W, C) -> (B, N, hw, C)`` where ``N`` is the number of windows and
``hw = p0 * p1`` tokens per window — keeping the batch dimension explicit (the
reference folds it into the leading dim) so shardings over batch stay trivial.

- ``window``: contiguous p0 x p1 tiles (local attention).
- ``grid``: strided sampling — token (i, j) of window (u, v) is pixel
  (i * (H//p0) + u, j * (W//p1) + v) — i.e. dilated/global attention
  (MaxViT-style grid attention).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def window_partition(x: jnp.ndarray, partition_size: Tuple[int, int]) -> jnp.ndarray:
    """(B, H, W, C) -> (B, N, p0*p1, C) with contiguous windows."""
    B, H, W, C = x.shape
    p0, p1 = partition_size
    assert H % p0 == 0, (H, p0)
    assert W % p1 == 0, (W, p1)
    x = x.reshape(B, H // p0, p0, W // p1, p1, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, (H // p0) * (W // p1), p0 * p1, C)


def window_reverse(
    windows: jnp.ndarray, partition_size: Tuple[int, int], img_size: Tuple[int, int]
) -> jnp.ndarray:
    """(B, N, p0*p1, C) -> (B, H, W, C)."""
    H, W = img_size
    p0, p1 = partition_size
    B = windows.shape[0]
    C = windows.shape[-1]
    x = windows.reshape(B, H // p0, W // p1, p0, p1, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


def grid_partition(x: jnp.ndarray, grid_size: Tuple[int, int]) -> jnp.ndarray:
    """(B, H, W, C) -> (B, N, g0*g1, C) with dilated (strided) windows.

    N = (H//g0) * (W//g1); each window holds one token from every grid cell.
    """
    B, H, W, C = x.shape
    g0, g1 = grid_size
    assert H % g0 == 0, (H, g0)
    assert W % g1 == 0, (W, g1)
    x = x.reshape(B, g0, H // g0, g1, W // g1, C)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(B, (H // g0) * (W // g1), g0 * g1, C)


def grid_reverse(
    windows: jnp.ndarray, grid_size: Tuple[int, int], img_size: Tuple[int, int]
) -> jnp.ndarray:
    """(B, N, g0*g1, C) -> (B, H, W, C)."""
    H, W = img_size
    g0, g1 = grid_size
    B = windows.shape[0]
    C = windows.shape[-1]
    x = windows.reshape(B, H // g0, W // g1, g0, g1, C)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(B, H, W, C)
