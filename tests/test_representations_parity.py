"""Golden event-representation parity vs the ACTUAL PyTorch reference.

Every downstream numerical-parity claim assumes the model sees identical
input tensors, so the tensorizers are pinned against the reference
implementations imported from /root/reference/data/utils/representations.py
(torch-only module).

Known, deliberate divergences (documented, not tested for parity):
- StackedHistogram fastmode accumulates in uint8 and WRAPS above 255 events
  per (pol, bin, pixel) cell ("hot pixels" per the reference's own note);
  ours saturates. Tests stay below 255 counts per cell.
- MixedDensityEventStack accumulates + cumsums in int8 (wraps at +-128);
  ours saturates. Tests stay well inside int8 range.
- Reference normalizes time in float32 (torch int/int division), ours in
  float64; an event landing exactly on a bin boundary could flip bins.
  Fixed seeds keep the tests deterministic.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

torch = pytest.importorskip("torch")

if not os.path.isdir("/root/reference"):  # pragma: no cover
    pytest.skip("reference implementation not present", allow_module_level=True)

from ref_harness import add_reference_to_path  # noqa: E402

add_reference_to_path()

import importlib.util  # noqa: E402

# Import the reference module FILE directly: `data.utils.representations`
# would resolve through the reference package tree, whose data/utils/types
# imports more than we need here.
_spec = importlib.util.spec_from_file_location(
    "ref_representations", "/root/reference/data/utils/representations.py"
)
ref_repr = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(ref_repr)

from sast_tpu.data.representations import (  # noqa: E402
    MixedDensityEventStack,
    StackedHistogram,
)

H, W = 24, 32


def _events(seed: int, n: int, t_max: int = 50_000):
    rng = np.random.RandomState(seed)
    x = rng.randint(0, W, n).astype(np.int64)
    y = rng.randint(0, H, n).astype(np.int64)
    pol = rng.randint(0, 2, n).astype(np.int64)
    time = np.sort(rng.randint(0, t_max, n)).astype(np.int64)
    return x, y, pol, time


def _ref_stacked(bins, cutoff, x, y, pol, time, fastmode=True):
    ref = ref_repr.StackedHistogram(
        bins=bins, height=H, width=W, count_cutoff=cutoff, fastmode=fastmode
    )
    out = ref.construct(
        torch.from_numpy(x), torch.from_numpy(y),
        torch.from_numpy(pol), torch.from_numpy(time),
    )
    return out.numpy()


@pytest.mark.parametrize("seed,n", [(0, 4000), (1, 1), (2, 257)])
def test_stacked_histogram_matches_reference(seed, n):
    x, y, pol, time = _events(seed, n)
    ours = StackedHistogram(bins=10, height=H, width=W, count_cutoff=10).construct(
        x, y, pol, time
    )
    ref = _ref_stacked(10, 10, x, y, pol, time)
    assert ours.dtype == ref.dtype == np.uint8
    np.testing.assert_array_equal(ours, ref)


def test_stacked_histogram_empty_and_identical_times_match_reference():
    z = np.zeros((0,), np.int64)
    ours = StackedHistogram(10, H, W, 10).construct(z, z, z, z)
    np.testing.assert_array_equal(ours, _ref_stacked(10, 10, z, z, z, z))

    # all events share one timestamp: t1 == t0 division guard path
    n = 64
    x, y, pol, _ = _events(3, n)
    t = np.full((n,), 12345, np.int64)
    ours = StackedHistogram(10, H, W, 10).construct(x, y, pol, t)
    np.testing.assert_array_equal(ours, _ref_stacked(10, 10, x, y, pol, t))


def test_stacked_histogram_cutoff_saturation_matches_reference():
    # 200 events on ONE pixel/polarity: below the uint8 wrap, above cutoff.
    n = 200
    x = np.zeros((n,), np.int64)
    y = np.zeros((n,), np.int64)
    pol = np.ones((n,), np.int64)
    time = np.zeros((n,), np.int64)
    ours = StackedHistogram(4, H, W, 10).construct(x, y, pol, time)
    ref = _ref_stacked(4, 10, x, y, pol, time)
    np.testing.assert_array_equal(ours, ref)
    assert ours.max() == 10  # saturated at the cutoff, not the raw count


@pytest.mark.parametrize("seed,n,cutoff", [(4, 3000, 8), (5, 500, None)])
def test_mixed_density_stack_matches_reference(seed, n, cutoff):
    x, y, pol, time = _events(seed, n)
    ours = MixedDensityEventStack(
        bins=6, height=H, width=W, count_cutoff=cutoff
    ).construct(x, y, pol, time)
    ref = ref_repr.MixedDensityEventStack(
        bins=6, height=H, width=W, count_cutoff=cutoff
    ).construct(
        torch.from_numpy(x), torch.from_numpy(y),
        torch.from_numpy(pol), torch.from_numpy(time),
    ).numpy()
    assert ours.dtype == ref.dtype == np.int8
    np.testing.assert_array_equal(ours, ref)
