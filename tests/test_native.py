"""Native C++ ops vs numpy fallbacks."""

import numpy as np
import pytest

from sast_tpu import native
from sast_tpu.data.representations import MixedDensityEventStack, StackedHistogram


def _events(n=5000, hw=(64, 96), seed=0):
    rng = np.random.RandomState(seed)
    t = np.sort(rng.randint(0, 100_000, n)).astype(np.int64)
    x = rng.randint(0, hw[1], n).astype(np.int32)
    y = rng.randint(0, hw[0], n).astype(np.int32)
    p = rng.randint(0, 2, n).astype(np.int32)
    return x, y, p, t


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_stacked_histogram_matches_numpy(monkeypatch):
    x, y, p, t = _events()
    hist = StackedHistogram(bins=5, height=64, width=96, count_cutoff=7)
    got = native.stacked_histogram(x, y, p, t, 5, 64, 96, 7)

    monkeypatch.setattr(native, "available", lambda: False)
    want = hist.construct(x, y, p, t)
    np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_mixed_density_matches_numpy(monkeypatch):
    x, y, p, t = _events(seed=1)
    stack = MixedDensityEventStack(bins=4, height=64, width=96, count_cutoff=10)
    got = native.mixed_density_stack(x, y, p.astype(np.int64), t, 4, 64, 96, 10)

    monkeypatch.setattr(native, "available", lambda: False)
    want = stack.construct(x, y, p, t)
    np.testing.assert_array_equal(got, want)


def test_monotonize_time():
    t = np.array([0, 5, 3, 7, 6, 6, 10], np.int64)
    out = native.monotonize_time(t.copy())
    np.testing.assert_array_equal(out, [0, 5, 5, 7, 7, 7, 10])


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_downsample_matches_numpy():
    rng = np.random.RandomState(0)
    x = rng.randint(0, 255, (3, 8, 12), dtype=np.uint8)
    got = native.downsample2x_nearest_u8(x)

    iy = np.clip(np.floor((np.arange(4) + 0.5) * 2).astype(int), 0, 7)
    ix = np.clip(np.floor((np.arange(6) + 0.5) * 2).astype(int), 0, 11)
    want = x[:, iy][:, :, ix]
    np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_histogram_speed():
    """The native path should beat numpy add.at comfortably."""
    import time

    x, y, p, t = _events(n=200_000, hw=(240, 304))
    hist = StackedHistogram(bins=10, height=240, width=304, count_cutoff=10)

    t0 = time.time()
    native.stacked_histogram(x, y, p, t, 10, 240, 304, 10)
    t_native = time.time() - t0

    import sast_tpu.native as nat

    orig = nat.available
    nat.available = lambda: False
    try:
        t0 = time.time()
        hist.construct(x, y, p, t)
        t_numpy = time.time() - t0
    finally:
        nat.available = orig
    assert t_native < t_numpy, (t_native, t_numpy)


def test_transpose_tchw_to_thwc_matches_numpy():
    from sast_tpu import native

    rng = np.random.RandomState(0)
    x = rng.randint(0, 255, (3, 20, 17, 31)).astype(np.uint8)
    ref = np.ascontiguousarray(np.transpose(x, (0, 2, 3, 1)))
    got = native.transpose_tchw_to_thwc(x)
    assert got.flags.c_contiguous
    np.testing.assert_array_equal(got, ref)
