"""Augmentation tests: image/label geometric consistency.

The invariant: after any augmentation, the event mass inside a label box must
track the box (checked via synthetic blobs placed exactly at label boxes).
"""

import numpy as np
import pytest

from sast_tpu.config import AugmentConfig, ZoomAugConfig
from sast_tpu.data.augment import (
    AugmentState,
    SpatialAugmentor,
    resize_nearest,
    rotate_nearest,
)
from sast_tpu.data.labels import FrameLabels


def _clip_with_blob(hw=(64, 96), box=(20, 12, 24, 16), T=3):
    """Events only inside `box` (x, y, w, h); labels match the blob."""
    H, W = hw
    ev = np.zeros((T, H, W, 2), np.float32)
    x, y, w, h = box
    ev[:, y : y + h, x : x + w, :] = 1.0
    fl = FrameLabels(
        np.array([[0, x, y, w, h, 0, 1.0]], np.float32), (H, W)
    )
    labels = [None] * (T - 1) + [fl]
    return ev, labels


def _mass_inside(ev, fl) -> float:
    if fl is None or len(fl) == 0:
        return 0.0
    total = ev[-1].sum()
    if total == 0:
        return 0.0
    x, y = int(fl.x[0]), int(fl.y[0])
    w, h = int(np.ceil(fl.w[0])), int(np.ceil(fl.h[0]))
    return float(ev[-1, y : y + h + 1, x : x + w + 1].sum() / total)


def test_hflip_consistency():
    ev, labels = _clip_with_blob()
    aug = SpatialAugmentor(AugmentConfig(), stream_mode=False)
    state = AugmentState(apply_hflip=True)
    ev2, labels2 = aug.apply(state, ev, labels)
    assert _mass_inside(ev2, labels2[-1]) > 0.95
    # flipped: original box at x=20 (W=96) -> x = 96-1-20-24 = 51
    assert abs(labels2[-1].x[0] - 51) < 1e-5


def test_zoom_out_consistency():
    ev, labels = _clip_with_blob()
    aug = SpatialAugmentor(AugmentConfig(), stream_mode=True)
    state = AugmentState(zoom_out=(10, 6, 1.5))
    ev2, labels2 = aug.apply(state, ev, labels)
    fl = labels2[-1]
    assert fl is not None
    # box shrank by 1.5x
    assert abs(fl.w[0] - 24 / 1.5) < 1.0
    assert _mass_inside(ev2, fl) > 0.9
    # everything outside the pasted window is zero
    assert ev2[:, :6, :, :].sum() == 0


def test_zoom_in_consistency():
    ev, labels = _clip_with_blob()
    aug = SpatialAugmentor(AugmentConfig(), stream_mode=False,
                           rng=np.random.RandomState(0))
    state = AugmentState(zoom_in_factor=1.5)
    ev2, labels2 = aug.apply(state, ev, labels)
    fl = labels2[-1]
    assert fl is not None and len(fl) == 1  # anchored window keeps the label
    assert _mass_inside(ev2, fl) > 0.85
    # box grew ~1.5x (may be clipped at canvas edges)
    assert fl.w[0] > 24


def test_rotation_consistency():
    ev, labels = _clip_with_blob()
    aug = SpatialAugmentor(AugmentConfig(), stream_mode=False)
    state = AugmentState(rotate_angle_deg=5.0)
    ev2, labels2 = aug.apply(state, ev, labels)
    fl = labels2[-1]
    assert fl is not None
    assert _mass_inside(ev2, fl) > 0.9
    assert abs(ev2.sum() - ev.sum()) / ev.sum() < 0.1  # mass roughly conserved


def test_stream_mode_state_reuse():
    cfg = AugmentConfig(
        prob_hflip=1.0,
        zoom=ZoomAugConfig(prob=1.0, zoom_in_weight=0, zoom_out_weight=1),
        zoom_out_only=True,
    )
    aug = SpatialAugmentor(cfg, stream_mode=True, rng=np.random.RandomState(1))
    state = aug.sample_state((64, 96))
    assert state.apply_hflip and state.zoom_out is not None
    assert state.zoom_in_factor is None  # stream mode never zooms in

    ev, labels = _clip_with_blob()
    out1, _ = aug.apply(state, ev, labels)
    out2, _ = aug.apply(state, ev, labels)
    np.testing.assert_array_equal(out1, out2)  # same state -> same transform


def test_resize_nearest_exact():
    x = np.arange(8, dtype=np.float32).reshape(1, 2, 4, 1)
    out = resize_nearest(x, (1, 2))
    # src idx = floor((dst+0.5) * in/out): rows -> 1; cols -> 1, 3
    assert out.shape == (1, 1, 2, 1)
    assert out[0, 0, 0, 0] == x[0, 1, 1, 0]
    assert out[0, 0, 1, 0] == x[0, 1, 3, 0]
