"""Window/grid partition round-trips and layout semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from sast_tpu.ops.partition import (
    grid_partition,
    grid_reverse,
    window_partition,
    window_reverse,
)

B, H, W, C = 2, 8, 12, 3
P = (2, 3)


@jax.jit
def _roundtrips(x):
    w = window_partition(x, P)
    xw = window_reverse(w, P, (H, W))
    g = grid_partition(x, P)
    xg = grid_reverse(g, P, (H, W))
    return w, xw, g, xg


def test_roundtrips_and_layout():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    w, xw, g, xg = _roundtrips(x)

    # Round trips are exact.
    np.testing.assert_array_equal(np.asarray(xw), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(xg), np.asarray(x))

    n_win = (H // P[0]) * (W // P[1])
    assert w.shape == (B, n_win, P[0] * P[1], C)
    assert g.shape == (B, n_win, P[0] * P[1], C)

    xn = np.asarray(x)
    # Window n = (i, j) block holds contiguous pixels.
    wn = np.asarray(w)
    i, j = 1, 2  # window row/col
    n = i * (W // P[1]) + j
    expected = xn[:, i * P[0] : (i + 1) * P[0], j * P[1] : (j + 1) * P[1], :].reshape(
        B, -1, C
    )
    np.testing.assert_array_equal(wn[:, n], expected)

    # Grid window (u, v) token (a, b) = pixel (a * (H//g0) + u, b * (W//g1) + v).
    gn = np.asarray(g)
    nh, nw = H // P[0], W // P[1]
    u, v = 2, 1
    n = u * nw + v
    expected = xn[:, u::nh, v::nw, :].reshape(B, -1, C)
    np.testing.assert_array_equal(gn[:, n], expected)
