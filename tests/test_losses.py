"""SimOTA + YOLOX loss tests against a loop-based numpy oracle.

The oracle follows the published SimOTA algorithm semantics
(yolo_head.py:452-606) with explicit per-GT loops; the vectorized static-shape
implementation must produce the same assignment on non-degenerate inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sast_tpu.models.head import build_grids
from sast_tpu.models.losses import (
    bboxes_iou_cxcywh,
    iou_loss,
    simota_assign,
    yolox_loss,
)


def _np_iou(gt, pred):
    tl = np.maximum(gt[:, None, :2] - gt[:, None, 2:] / 2, pred[None, :, :2] - pred[None, :, 2:] / 2)
    br = np.minimum(gt[:, None, :2] + gt[:, None, 2:] / 2, pred[None, :, :2] + pred[None, :, 2:] / 2)
    area_g = gt[:, 2] * gt[:, 3]
    area_p = pred[:, 2] * pred[:, 3]
    wh = np.clip(br - tl, 0, None)
    valid = (tl < br).all(-1)
    inter = wh[..., 0] * wh[..., 1] * valid
    return inter / (area_g[:, None] + area_p[None] - inter + 1e-12)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _oracle_simota(bbox, obj, cls, gt, gt_cls, grids, strides, n_cls, topk=10):
    """Loop-based SimOTA: returns (fg_mask, matched_gt, pred_iou)."""
    G, A = len(gt), len(bbox)
    centers = (grids + 0.5) * strides[:, None]
    in_center = np.zeros((G, A), bool)
    for g in range(G):
        d = np.abs(gt[g, :2][None] - centers)
        in_center[g] = (d < (1.5 * strides)[:, None]).all(-1)
    union = in_center.any(0)

    iou = _np_iou(gt, bbox)
    iou_k = iou * union[None]
    dyn_k = np.maximum(np.sort(iou_k, axis=1)[:, -topk:].sum(1).astype(int), 1)

    p = np.sqrt(_sigmoid(cls) * _sigmoid(obj)[:, None])
    p = np.clip(p, 1e-12, 1 - 1e-12)
    onehot = np.eye(n_cls)[gt_cls]
    cls_cost = -(
        onehot[:, None] * np.log(p[None]) + (1 - onehot[:, None]) * np.log(1 - p[None])
    ).sum(-1)
    cost = cls_cost + 3 * -np.log(iou + 1e-8) + 1e6 * ~in_center + 1e6 * ~union[None]

    matching = np.zeros((G, A), bool)
    for g in range(G):
        order = np.argsort(cost[g])
        matching[g, order[: dyn_k[g]]] = True
    multi = matching.sum(0) > 1
    for a in np.where(multi)[0]:
        best = np.argmin(cost[:, a])
        matching[:, a] = False
        matching[best, a] = True
    fg = matching.any(0)
    matched = matching.argmax(0)
    pred_iou = (matching * iou).sum(0)
    return fg, matched, pred_iou


def test_simota_matches_oracle():
    rng = np.random.RandomState(3)
    hw = [(8, 12), (4, 6), (2, 3)]
    grids, strides = build_grids(hw, (8, 16, 32))
    A = grids.shape[0]
    G = 5
    H, W = 64, 96

    gt = np.zeros((G, 4), np.float32)
    gt[:, 2] = rng.uniform(10, 30, G)
    gt[:, 3] = rng.uniform(10, 30, G)
    gt[:, 0] = rng.uniform(15, W - 15, G)
    gt[:, 1] = rng.uniform(15, H - 15, G)
    gt_cls = rng.randint(0, 2, G)

    # predictions near the GTs plus noise
    bbox = np.zeros((A, 4), np.float32)
    bbox[:, :2] = (grids + 0.5) * strides[:, None] + rng.randn(A, 2)
    bbox[:, 2:] = rng.uniform(8, 40, (A, 2))
    obj = rng.randn(A).astype(np.float32)
    cls = rng.randn(A, 2).astype(np.float32)

    got = jax.jit(
        lambda *a: simota_assign(*a, num_classes=2, topk=10)
    )(
        jnp.asarray(bbox),
        jnp.asarray(obj),
        jnp.asarray(cls),
        jnp.asarray(gt),
        jnp.asarray(gt_cls),
        jnp.ones((G,), bool),
        jnp.asarray(grids),
        jnp.asarray(strides),
    )
    fg_ref, matched_ref, iou_ref = _oracle_simota(
        bbox, obj, cls, gt, gt_cls, grids, strides, 2
    )
    np.testing.assert_array_equal(np.asarray(got["fg_mask"]), fg_ref)
    got_matched = np.asarray(got["reg_target"])[fg_ref]
    np.testing.assert_allclose(got_matched, gt[matched_ref[fg_ref]], rtol=1e-6)
    np.testing.assert_allclose(
        np.sort(np.asarray(got["num_fg"]).ravel()), [fg_ref.sum()], rtol=1e-6
    )


def test_invalid_gt_ignored():
    grids, strides = build_grids([(4, 6)], (8,))
    A = grids.shape[0]
    gt = np.array([[16.0, 16.0, 10.0, 10.0], [24.0, 16.0, 10.0, 10.0]], np.float32)
    bbox = np.tile(np.array([[16.0, 16.0, 10.0, 10.0]], np.float32), (A, 1))

    out_valid = jax.jit(lambda v: simota_assign(
        jnp.asarray(bbox), jnp.zeros((A,)), jnp.zeros((A, 2)),
        jnp.asarray(gt), jnp.zeros((2,), jnp.int32), v,
        jnp.asarray(grids), jnp.asarray(strides), num_classes=2,
    ))
    both = out_valid(jnp.array([True, True]))
    none = out_valid(jnp.array([False, False]))
    assert float(both["num_fg"]) > 0
    assert float(none["num_fg"]) == 0
    assert not bool(np.asarray(none["fg_mask"]).any())


def test_yolox_loss_perfect_predictions_low():
    """Loss with near-perfect predictions << loss with garbage predictions."""
    grids, strides = build_grids([(8, 12)], (8,))
    A = grids.shape[0]
    F, G, n_cls = 2, 3, 2
    rng = np.random.RandomState(0)

    gt = np.zeros((F, G, 4), np.float32)
    gt[..., 0] = rng.uniform(20, 70, (F, G))
    gt[..., 1] = rng.uniform(20, 44, (F, G))
    gt[..., 2:] = rng.uniform(12, 24, (F, G, 2))
    gt_cls = rng.randint(0, n_cls, (F, G))
    gt_valid = np.ones((F, G), bool)

    def make_preds(perfect):
        preds = np.zeros((F, A, 5 + n_cls), np.float32)
        preds[..., 4] = -8.0  # low obj everywhere
        preds[..., :2] = (grids + 0.5) * strides[:, None]
        preds[..., 2:4] = 16.0
        if perfect:
            for f in range(F):
                for g in range(G):
                    # anchor nearest to the GT center
                    d = np.abs((grids + 0.5) * strides[:, None] - gt[f, g, :2]).sum(1)
                    a = d.argmin()
                    preds[f, a, :4] = gt[f, g]
                    preds[f, a, 4] = 8.0
                    preds[f, a, 5 + gt_cls[f, g]] = 8.0
        return preds

    loss_fn = jax.jit(
        lambda p: yolox_loss(
            p, jnp.asarray(grids), jnp.asarray(strides),
            jnp.asarray(gt), jnp.asarray(gt_cls), jnp.asarray(gt_valid),
            jnp.ones((F,), bool), num_classes=n_cls,
        )["loss"]
    )
    # SimOTA assigns dynamic_k anchors per GT, so even the "perfect" frame
    # carries loss from its other matched anchors — expect better, not ~zero.
    good = float(loss_fn(jnp.asarray(make_preds(True))))
    bad = float(loss_fn(jnp.asarray(make_preds(False))))
    assert np.isfinite(good) and np.isfinite(bad)
    assert good < bad, (good, bad)


def test_iou_loss_zero_for_exact_match():
    box = jnp.asarray([[10.0, 10.0, 4.0, 4.0]])
    assert float(jax.jit(iou_loss)(box, box)[0]) < 1e-5


def test_frame_valid_masks_everything():
    grids, strides = build_grids([(4, 6)], (8,))
    A = grids.shape[0]
    preds = jnp.asarray(np.random.RandomState(0).randn(1, A, 7), jnp.float32)
    out = jax.jit(
        lambda p: yolox_loss(
            p, jnp.asarray(grids), jnp.asarray(strides),
            jnp.zeros((1, 2, 4)), jnp.zeros((1, 2), jnp.int32),
            jnp.ones((1, 2), bool), jnp.zeros((1,), bool), num_classes=2,
        )
    )(preds)
    assert float(out["loss"]) == 0.0
