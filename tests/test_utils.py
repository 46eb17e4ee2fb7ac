"""Utility tests: viz rendering, PNG writer, timers, padding."""

import os

import jax.numpy as jnp
import numpy as np

from sast_tpu.utils.padding import InputPadder
from sast_tpu.utils.timers import DeviceTimer, Timer, TimerDummy, timer_stats
from sast_tpu.utils.viz import (
    draw_bboxes,
    ev_repr_to_img,
    render_detection_frame,
    save_png,
)


def test_ev_repr_to_img():
    ev = np.zeros((8, 10, 4), np.uint8)  # 2 bins x 2 pol
    ev[2, 3, 2] = 5  # positive polarity
    ev[4, 5, 0] = 5  # negative polarity
    img = ev_repr_to_img(ev)
    assert img.shape == (8, 10, 3)
    assert tuple(img[2, 3]) == (255, 0, 0)
    assert tuple(img[4, 5]) == (0, 0, 255)
    assert tuple(img[0, 0]) == (114, 114, 114)


def test_draw_bboxes_and_panel(tmp_path):
    img = np.full((32, 32, 3), 114, np.uint8)
    draw_bboxes(img, np.array([[4, 4, 10, 8]]), labels=[1])
    assert (img[4, 4:15] != 114).any()

    panel = render_detection_frame(
        np.zeros((16, 20, 4), np.uint8),
        gt_boxes=np.array([[2, 2, 6, 6]]),
        pred_boxes=np.array([[3, 3, 5, 5]]),
        pred_classes=np.array([0]),
        gt_classes=np.array([1]),
    )
    assert panel.shape == (16, 40, 3)

    path = str(tmp_path / "frame.png")
    save_png(path, panel)
    with open(path, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"
    assert os.path.getsize(path) > 100


def test_timers():
    with Timer("unit_test_timer"):
        pass
    with DeviceTimer("unit_test_device", block_on=jnp.ones(4)):
        pass
    with TimerDummy("ignored"):
        pass
    stats = timer_stats()
    assert "unit_test_timer" in stats
    assert stats["unit_test_device"]["count"] == 1


def test_input_padder():
    p = InputPadder((16, 24))
    x = jnp.ones((2, 12, 20, 3))
    out = p.pad_tensor_ev_repr(x)
    assert out.shape == (2, 16, 24, 3)
    assert float(out[:, 12:, :, :].sum()) == 0.0

    mask = jnp.zeros((2, 3, 5), bool)
    pm = p.pad_token_mask(mask)
    assert pm.shape == (2, 4, 6)
    assert bool(pm[:, 3:, :].all())  # padded region masked True


def test_render_gradflow():
    """Gradflow figure (reference callbacks/gradflow.py): valid RGB image
    from per-component grad-norm histories."""
    import numpy as np

    from sast_tpu.utils.viz import render_gradflow

    steps = [50, 100, 150]
    series = {
        "backbone": [10.0, 5.0, 2.0],
        "fpn": [3.0, 2.0, 1.5],
        "head": [1.0, 0.8, 0.5],
        "total": [11.0, 6.0, 3.0],
    }
    img = render_gradflow(steps, series)
    assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] == 3
    assert img.shape[0] > 100 and img.shape[1] > 100
    # non-blank: the plot draws colored curves on white
    assert img.min() < 250


def test_slope_time_validates_and_measures():
    """slope_time rejects degenerate chunk lengths (round-3 review: iters<=10
    used to divide by zero or produce negative FPS) and returns the correct
    per-iteration slope for a synthetic timer."""
    import time as _time

    import pytest

    from sast_tpu.utils.benchmark import slope_time

    with pytest.raises(AssertionError):
        slope_time(lambda L: lambda: None, L1=10, L2=10)
    with pytest.raises(AssertionError):
        slope_time(lambda L: lambda: None, L1=10, L2=5)

    per_iter = 2e-3
    def make_fn(L):
        def run():
            _time.sleep(0.01 + per_iter * L)  # fixed overhead + linear part
            return 0.0
        return run
    dt = slope_time(make_fn, L1=5, L2=25, blocks=2)
    assert abs(dt - per_iter) < per_iter * 0.5  # slope cancels the overhead
