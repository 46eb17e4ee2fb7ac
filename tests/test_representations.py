"""Event representation tests (reference: data/utils/representations.py)."""

import numpy as np

from sast_tpu.data.representations import (
    MixedDensityEventStack,
    StackedHistogram,
    stacked_histogram_jax,
)


def _events():
    # (x, y, pol, t) hand-constructed events over a 4x6 sensor, 2 bins
    x = np.array([0, 1, 1, 5, 5, 5], np.int32)
    y = np.array([0, 2, 2, 3, 3, 3], np.int32)
    p = np.array([0, 1, 1, 0, 1, 0], np.int32)
    t = np.array([0, 10, 20, 80, 90, 100], np.int64)
    return x, y, p, t


def test_stacked_histogram_counts():
    hist = StackedHistogram(bins=2, height=4, width=6, count_cutoff=255)
    rep = hist.construct(*_events())
    assert rep.shape == (4, 4, 6)  # (2 pol * 2 bins, H, W)
    assert rep.dtype == np.uint8
    # channel layout: pol-major, bin-minor: [p0b0, p0b1, p1b0, p1b1]
    # t normalized over [0, 100]; bin = floor(t/100*2) clipped to 1
    assert rep[0, 0, 0] == 1          # pol 0, t=0 -> bin 0
    assert rep[2, 2, 1] == 2          # pol 1, t=10,20 -> bin 0, two events
    assert rep[1, 3, 5] == 2          # pol 0, t=80,100 -> bin 1
    assert rep[3, 3, 5] == 1          # pol 1, t=90 -> bin 1
    assert rep.sum() == 6


def test_stacked_histogram_cutoff_and_empty():
    hist = StackedHistogram(bins=1, height=2, width=2, count_cutoff=3)
    x = np.zeros(10, np.int32)
    y = np.zeros(10, np.int32)
    p = np.zeros(10, np.int32)
    t = np.arange(10, dtype=np.int64)
    rep = hist.construct(x, y, p, t)
    assert rep[0, 0, 0] == 3  # clamped
    empty = hist.construct(*(np.array([], np.int32),) * 3, np.array([], np.int64))
    assert empty.sum() == 0 and empty.shape == (2, 2, 2)


def test_jax_histogram_matches_numpy():
    import jax.numpy as jnp

    x, y, p, t = _events()
    hist = StackedHistogram(bins=2, height=4, width=6)
    want = hist.construct(x, y, p, t)  # (C, H, W)

    # pad to a static budget of 8 events
    pad = 8 - len(x)
    xp = np.pad(x, (0, pad))
    yp = np.pad(y, (0, pad))
    pp = np.pad(p, (0, pad))
    tp = np.pad(t, (0, pad))
    got = stacked_histogram_jax(
        jnp.asarray(xp), jnp.asarray(yp), jnp.asarray(pp),
        jnp.asarray(tp.astype(np.int32)), jnp.asarray(len(x)),
        bins=2, height=4, width=6,
    )
    got_chw = np.asarray(got).transpose(2, 0, 1)
    np.testing.assert_array_equal(got_chw, want)


def test_mixed_density_stack():
    stack = MixedDensityEventStack(bins=3, height=4, width=6)
    rep = stack.construct(*_events())
    assert rep.shape == (3, 4, 6)
    assert rep.dtype == np.int8
    # Polarity signs accumulate: pixel (2,1) has two pol=1 events -> +2 in the
    # cumulative (later) channels.
    assert rep[2, 2, 1] == 2
    # Early events land in low bins and appear in every later channel cumsum.
    assert rep[2].sum() == (2 * 1 - 1) * 2 + (2 * 0 - 1) * 2 + (2 * 1 - 1) * 1 + (2 * 0 - 1) * 1
