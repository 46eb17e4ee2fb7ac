"""Golden augmentation parity vs the ACTUAL PyTorch reference.

Pins our numpy augmentor (sast_tpu/data/augment.py + label geometry in
sast_tpu/data/labels.py) against the reference implementation imported from
/root/reference (data/utils/augmentor.py static tensor ops +
data/genx_utils/labels.py ObjectLabels geometry), with forced augmentation
states so the comparison is deterministic.

Rotation is excluded: the reference rotates through real torchvision (not
installed in-env); the stub in ref_harness raises if it is ever reached.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

torch = pytest.importorskip("torch")

if not os.path.isdir("/root/reference"):  # pragma: no cover
    pytest.skip("reference implementation not present", allow_module_level=True)

from ref_harness import (  # noqa: E402
    add_reference_to_path,
    install_omegaconf_stub,
    install_torchvision_stub,
)

install_omegaconf_stub()
install_torchvision_stub()
add_reference_to_path()

from data.genx_utils.labels import ObjectLabels  # noqa: E402  (reference)
from data.utils.augmentor import RandomSpatialAugmentorGenX  # noqa: E402
from data.utils.types import DataType  # noqa: E402

from sast_tpu.data.augment import AugmentState, SpatialAugmentor, resize_nearest  # noqa: E402
from sast_tpu.data.labels import FrameLabels  # noqa: E402
from sast_tpu.config import AugmentConfig  # noqa: E402

H, W, C, T = 48, 64, 20, 3


def _rand_ev(seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 6, (T, H, W, C)).astype(np.float32)


def _rows(seed: int, n: int = 5) -> np.ndarray:
    """(n, 7) label rows (t, x, y, w, h, class_id, conf) inside the frame."""
    rng = np.random.RandomState(seed)
    rows = np.zeros((n, 7), np.float32)
    rows[:, 0] = 1000.0
    rows[:, 1] = rng.uniform(0, W - 12, n)   # x
    rows[:, 2] = rng.uniform(0, H - 10, n)   # y
    rows[:, 3] = rng.uniform(4, 12, n)       # w
    rows[:, 4] = rng.uniform(3, 10, n)       # h
    rows[:, 5] = rng.randint(0, 2, n)
    rows[:, 6] = 1.0
    return rows


def _ref_labels(rows: np.ndarray) -> ObjectLabels:
    return ObjectLabels(object_labels=torch.from_numpy(rows.copy()), input_size_hw=(H, W))


def _our_labels(rows: np.ndarray) -> FrameLabels:
    return FrameLabels(rows.copy(), (H, W))


def _assert_label_parity(ours: FrameLabels, ref: ObjectLabels):
    assert len(ours) == len(ref)
    ref_arr = ref.object_labels.numpy()
    np.testing.assert_allclose(ours.x, ref_arr[:, 1], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ours.y, ref_arr[:, 2], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ours.w, ref_arr[:, 3], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ours.h, ref_arr[:, 4], rtol=1e-5, atol=1e-5)


def test_zoom_out_tensor_matches_reference():
    ev = _rand_ev(0)
    x0, y0, factor = 5, 3, 1.37
    ref_frames = [
        RandomSpatialAugmentorGenX._zoom_out_and_rescale_tensor(
            torch.from_numpy(np.ascontiguousarray(ev[t].transpose(2, 0, 1))),
            zoom_coordinates_x0y0=(x0, y0),
            zoom_out_factor=factor,
            datatype=DataType.EV_REPR,
        ).numpy()
        for t in range(T)
    ]
    aug = SpatialAugmentor(AugmentConfig(), stream_mode=True)
    state = AugmentState(zoom_out=(x0, y0, factor))
    ours, _ = aug.apply(state, ev, [None] * T)
    ours_chw = ours.transpose(0, 3, 1, 2)
    np.testing.assert_array_equal(ours_chw, np.stack(ref_frames))


def test_zoom_in_tensor_matches_reference():
    ev = _rand_ev(1)
    x0, y0, factor = 7, 4, 1.8
    zh, zw = int(H / factor), int(W / factor)
    ref_frames = [
        RandomSpatialAugmentorGenX._zoom_in_and_rescale_tensor(
            torch.from_numpy(np.ascontiguousarray(ev[t].transpose(2, 0, 1))),
            zoom_coordinates_x0y0=(x0, y0),
            zoom_in_factor=factor,
            datatype=DataType.EV_REPR,
        ).numpy()
        for t in range(T)
    ]
    crop = np.ascontiguousarray(ev[:, y0 : y0 + zh, x0 : x0 + zw])
    ours = resize_nearest(crop, (H, W))
    np.testing.assert_array_equal(
        ours.transpose(0, 3, 1, 2), np.stack(ref_frames)
    )


def test_zoom_out_labels_match_reference():
    rows = _rows(2)
    x0, y0, factor = 9, 6, 1.5
    ref = _ref_labels(rows)
    ref.zoom_out_and_rescale_(zoom_coordinates_x0y0=(x0, y0), zoom_out_factor=factor)
    ours = _our_labels(rows)
    ours.zoom_out_and_rescale_((x0, y0), factor)
    _assert_label_parity(ours, ref)


def test_zoom_in_labels_match_reference():
    rows = _rows(3, n=8)
    x0, y0, factor = 12, 8, 2.1
    ref = _ref_labels(rows)
    ref.zoom_in_and_rescale_(zoom_coordinates_x0y0=(x0, y0), zoom_in_factor=factor)
    ours = _our_labels(rows)
    ours.zoom_in_and_rescale_((x0, y0), factor)
    # zoom-in crops: boxes outside the window shrink to zero area and are
    # removed on BOTH sides (remove_flat_labels_); counts must agree too.
    _assert_label_parity(ours, ref)
    assert len(ours) <= len(rows)


@pytest.mark.parametrize("angle", [6.0, -4.5])
def test_rotation_labels_match_reference(angle):
    """Label rotation is pure torch in the reference (ObjectLabels.rotate_),
    so it IS testable even though pixel rotation (torchvision) is not."""
    rows = _rows(6, n=6)
    ref = _ref_labels(rows)
    ref.rotate_(angle)
    ours = _our_labels(rows)
    ours.rotate_(angle)
    _assert_label_parity(ours, ref)


def test_hflip_matches_reference():
    ev = _rand_ev(4)
    rows = _rows(5)
    ref = _ref_labels(rows)
    ref.flip_lr_()
    ours_lbl = _our_labels(rows)
    ours_lbl.flip_lr_()
    _assert_label_parity(ours_lbl, ref)

    aug = SpatialAugmentor(AugmentConfig(), stream_mode=True)
    ours, _ = aug.apply(AugmentState(apply_hflip=True), ev, [None] * T)
    np.testing.assert_array_equal(ours, ev[:, :, ::-1])
