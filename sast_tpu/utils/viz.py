"""Visualization of event representations and detections (numpy, host-side).

Equivalent of the reference viz stack (callbacks/viz_base.py:163-174
ev_repr_to_img; utils/evaluation/prophesee/visualize/vis_utils.py:88-119
draw_bboxes): renders stacked histograms to RGB images and draws labeled
boxes, for the training-loop image logging and offline inspection.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

# distinct colors per class id (RGB)
_CLASS_COLORS = np.array(
    [
        (255, 80, 80),
        (80, 160, 255),
        (120, 255, 120),
        (255, 200, 60),
        (220, 120, 255),
        (90, 230, 230),
    ],
    np.uint8,
)


def ev_repr_to_img(ev_repr: np.ndarray) -> np.ndarray:
    """(H, W, 2*bins) stacked histogram -> (H, W, 3) uint8 RGB.

    Like the reference (viz_base.py:163-174): positive-polarity counts render
    red, negative blue, on a white background where inactive.
    """
    assert ev_repr.ndim == 3
    ch = ev_repr.shape[-1]
    assert ch % 2 == 0
    bins = ch // 2
    # channel layout NHWC from (2 pol * bins) CHW order: first `bins` channels
    # are polarity 0, the rest polarity 1.
    neg = ev_repr[..., :bins].astype(np.int32).sum(-1)
    pos = ev_repr[..., bins:].astype(np.int32).sum(-1)
    img = np.full((*ev_repr.shape[:2], 3), 114, np.uint8)
    img[pos > neg] = (255, 0, 0)
    img[pos < neg] = (0, 0, 255)
    return img


def draw_bboxes(
    img: np.ndarray,
    boxes: np.ndarray,
    labels: Optional[Sequence[int]] = None,
    scores: Optional[Sequence[float]] = None,
    thickness: int = 1,
) -> np.ndarray:
    """Draw (x, y, w, h) boxes onto an RGB image (in place; also returned)."""
    H, W = img.shape[:2]
    boxes = np.asarray(boxes)
    for i, (x, y, w, h) in enumerate(boxes.reshape(-1, 4)):
        cls = int(labels[i]) if labels is not None else 0
        color = _CLASS_COLORS[cls % len(_CLASS_COLORS)]
        x0, y0 = int(max(x, 0)), int(max(y, 0))
        x1, y1 = int(min(x + w, W - 1)), int(min(y + h, H - 1))
        if x1 <= x0 or y1 <= y0:
            continue
        for t in range(thickness):
            xa, ya = min(x0 + t, W - 1), min(y0 + t, H - 1)
            xb, yb = max(x1 - t, 0), max(y1 - t, 0)
            img[ya, xa : xb + 1] = color
            img[yb, xa : xb + 1] = color
            img[ya : yb + 1, xa] = color
            img[ya : yb + 1, xb] = color
    return img


def render_detection_frame(
    ev_repr: np.ndarray,
    gt_boxes: Optional[np.ndarray] = None,
    pred_boxes: Optional[np.ndarray] = None,
    pred_classes: Optional[np.ndarray] = None,
    gt_classes: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Side-by-side (predictions | labels) panel like the reference viz
    callback (callbacks/detection.py:32-100)."""
    left = ev_repr_to_img(ev_repr)
    right = left.copy()
    if pred_boxes is not None and len(pred_boxes):
        draw_bboxes(left, pred_boxes, pred_classes)
    if gt_boxes is not None and len(gt_boxes):
        draw_bboxes(right, gt_boxes, gt_classes)
    return np.concatenate([left, right], axis=1)


def save_png(path: str, img: np.ndarray) -> None:
    """Minimal PNG writer (no imaging deps in this environment)."""
    import struct
    import zlib

    assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] == 3
    h, w = img.shape[:2]
    raw = b"".join(
        b"\x00" + img[i].tobytes() for i in range(h)
    )

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    header = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", header)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)


def render_gradflow(
    steps: "list[int]", series: "dict[str, list[float]]"
) -> np.ndarray:
    """Gradient-flow figure: per-component gradient-norm curves over training
    (the reference's gradflow callback, callbacks/gradflow.py, which plots
    average per-layer gradients each epoch). Returns an HxWx3 uint8 image.

    ``series`` maps component name -> norm history aligned with ``steps``.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 4.5), dpi=100)
    for name, values in sorted(series.items()):
        n = min(len(steps), len(values))
        ax.plot(steps[:n], values[:n], label=name, linewidth=1.2)
    ax.set_yscale("log")
    ax.set_xlabel("step")
    ax.set_ylabel("grad norm")
    ax.set_title("gradient flow")
    ax.legend(fontsize=8, loc="upper right")
    ax.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.canvas.draw()
    img = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return img
