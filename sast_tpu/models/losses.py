"""YOLOX losses with a fully vectorized, static-shape SimOTA assignment.

The reference SimOTA (/root/reference/models/detection/yolox/models/
yolo_head.py:291-606) loops per image and per ground-truth box with
dynamic-size gathers. On TPU that would force recompiles and host syncs, so
the assignment is reformulated over a *padded* GT budget (``max_gt``) with
validity masks, vmapped over frames — every shape static:

- geometry constraint == is_in_center with radius 1.5 * stride
  (yolo_head.py:543-572), invalid GTs masked out;
- dynamic-k from the sum of the top-10 IoUs per GT (yolo_head.py:574-579),
  IoUs of anchors outside the union center-filter zeroed to mirror the
  reference's candidate restriction;
- per-GT matching = rank(cost) < dynamic_k via top-k + rank mask
  (yolo_head.py:580-584);
- multi-match resolution by per-anchor argmin cost (yolo_head.py:588-594).

Losses: IoU (1 - iou^2), BCE-with-logits objectness over all anchors,
BCE-with-logits class over foreground, reg_weight = 5 (yolo_head.py:414-434).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def bboxes_iou_cxcywh(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU. a: (G, 4), b: (A, 4), cxcywh. Returns (G, A)."""
    tl = jnp.maximum(
        a[:, None, :2] - a[:, None, 2:] / 2, b[None, :, :2] - b[None, :, 2:] / 2
    )
    br = jnp.minimum(
        a[:, None, :2] + a[:, None, 2:] / 2, b[None, :, :2] + b[None, :, 2:] / 2
    )
    area_a = a[:, 2] * a[:, 3]
    area_b = b[:, 2] * b[:, 3]
    valid = jnp.all(tl < br, axis=-1)
    wh = br - tl
    area_i = wh[..., 0] * wh[..., 1] * valid
    return area_i / (area_a[:, None] + area_b[None, :] - area_i + 1e-12)


def iou_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Elementwise 1 - iou^2 on cxcywh boxes. pred/target: (..., 4)."""
    tl = jnp.maximum(pred[..., :2] - pred[..., 2:] / 2, target[..., :2] - target[..., 2:] / 2)
    br = jnp.minimum(pred[..., :2] + pred[..., 2:] / 2, target[..., :2] + target[..., 2:] / 2)
    area_p = pred[..., 2] * pred[..., 3]
    area_g = target[..., 2] * target[..., 3]
    valid = jnp.all(tl < br, axis=-1)
    wh = br - tl
    area_i = wh[..., 0] * wh[..., 1] * valid
    iou = area_i / (area_p + area_g - area_i + 1e-16)
    return 1.0 - iou ** 2


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable elementwise binary cross-entropy with logits."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _bce_probs(p: jnp.ndarray, t: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    p = jnp.clip(p, eps, 1.0 - eps)
    return -(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))


def simota_assign(
    bbox_preds: jnp.ndarray,   # (A, 4) cxcywh, input pixels
    obj_logits: jnp.ndarray,   # (A,)
    cls_logits: jnp.ndarray,   # (A, n_cls)
    gt_boxes: jnp.ndarray,     # (G, 4) cxcywh
    gt_classes: jnp.ndarray,   # (G,) int32
    gt_valid: jnp.ndarray,     # (G,) bool
    grids: jnp.ndarray,        # (A, 2)
    strides: jnp.ndarray,      # (A,)
    num_classes: int,
    topk: int = 10,
) -> Dict[str, jnp.ndarray]:
    """Single-frame SimOTA. All shapes static. Returns per-anchor targets."""
    A = bbox_preds.shape[0]
    G = gt_boxes.shape[0]

    # --- geometry constraint (center radius 1.5 strides) ---
    centers = (grids + 0.5) * strides[:, None]  # (A, 2)
    center_dist = 1.5 * strides  # (A,)
    delta = jnp.abs(gt_boxes[:, None, :2] - centers[None, :, :])  # (G, A, 2)
    is_in_center = jnp.all(delta < center_dist[None, :, None], axis=-1)
    is_in_center = is_in_center & gt_valid[:, None]
    anchor_in_union = jnp.any(is_in_center, axis=0)  # (A,)

    # --- pairwise IoU and dynamic-k ---
    pair_iou = bboxes_iou_cxcywh(gt_boxes, bbox_preds)  # (G, A)
    pair_iou = pair_iou * gt_valid[:, None]
    iou_for_k = pair_iou * anchor_in_union[None, :]
    topk_ious, _ = jax.lax.top_k(iou_for_k, topk)
    dynamic_k = jnp.maximum(jnp.sum(topk_ious, axis=1).astype(jnp.int32), 1)  # (G,)

    # --- cost matrix ---
    cls_prob = jnp.sqrt(
        jax.nn.sigmoid(cls_logits.astype(jnp.float32))
        * jax.nn.sigmoid(obj_logits.astype(jnp.float32))[:, None]
    )  # (A, n)
    gt_onehot = jax.nn.one_hot(gt_classes, num_classes, dtype=jnp.float32)  # (G, n)
    cls_cost = jnp.sum(
        _bce_probs(cls_prob[None, :, :], gt_onehot[:, None, :]), axis=-1
    )  # (G, A)
    iou_cost = -jnp.log(pair_iou + 1e-8)
    cost = (
        cls_cost
        + 3.0 * iou_cost
        + 1e6 * (~is_in_center)
        + 1e6 * (~anchor_in_union)[None, :]
        + 1e9 * (~gt_valid)[:, None]
    )

    # --- per-GT top-k matching (rank < dynamic_k) ---
    k_cap = min(topk, A)
    _, cand_idx = jax.lax.top_k(-cost, k_cap)  # (G, k_cap) lowest-cost anchors
    rank_ok = (
        jnp.arange(k_cap)[None, :] < jnp.minimum(dynamic_k, k_cap)[:, None]
    ) & gt_valid[:, None]
    cand_onehot = jax.nn.one_hot(cand_idx, A, dtype=jnp.float32)  # (G, k, A)
    matching = jnp.sum(cand_onehot * rank_ok[..., None], axis=1)  # (G, A) in {0,1}

    # --- resolve anchors matched to multiple GTs: keep argmin-cost GT ---
    col_sum = jnp.sum(matching, axis=0)  # (A,)
    best_gt = jnp.argmin(cost, axis=0)  # (A,)
    single = jax.nn.one_hot(best_gt, G, dtype=jnp.float32).T  # (G, A)
    matching = jnp.where(col_sum[None, :] > 1, single, matching)

    fg_mask = jnp.sum(matching, axis=0) > 0  # (A,)
    matched_gt = jnp.argmax(matching, axis=0)  # (A,)
    pred_iou = jnp.sum(matching * pair_iou, axis=0)  # (A,)

    cls_target = (
        jax.nn.one_hot(gt_classes[matched_gt], num_classes, dtype=jnp.float32)
        * pred_iou[:, None]
    )
    cls_target = jnp.where(fg_mask[:, None], cls_target, 0.0)
    reg_target = gt_boxes[matched_gt]

    return {
        "fg_mask": fg_mask,
        "cls_target": cls_target,
        "reg_target": reg_target,
        "num_fg": jnp.sum(fg_mask.astype(jnp.float32)),
        "num_gt": jnp.sum(gt_valid.astype(jnp.float32)),
    }


def yolox_loss(
    preds: jnp.ndarray,        # (F, A, 5 + n_cls): decoded cxcywh + logit obj/cls
    grids: jnp.ndarray,        # (A, 2)
    strides: jnp.ndarray,      # (A,)
    gt_boxes: jnp.ndarray,     # (F, G, 4) cxcywh
    gt_classes: jnp.ndarray,   # (F, G) int32
    gt_valid: jnp.ndarray,     # (F, G) bool
    frame_valid: jnp.ndarray,  # (F,) bool — padding frames contribute nothing
    num_classes: int,
    topk: int = 10,
) -> Dict[str, jnp.ndarray]:
    """Batched YOLOX detection loss over F frames with padded GT/frames."""
    preds = preds.astype(jnp.float32)
    bbox_preds = preds[..., :4]
    obj_logits = preds[..., 4]
    cls_logits = preds[..., 5:]

    gt_valid = gt_valid & frame_valid[:, None]

    assign = jax.vmap(
        lambda bp, ol, cl, gb, gc, gv: simota_assign(
            bp, ol, cl, gb, gc, gv, grids, strides, num_classes, topk
        )
    )(bbox_preds, obj_logits, cls_logits, gt_boxes, gt_classes, gt_valid)
    assign = jax.lax.stop_gradient(assign)

    fg = assign["fg_mask"] & frame_valid[:, None]  # (F, A)
    fg_f = fg.astype(jnp.float32)
    num_fg = jnp.maximum(jnp.sum(assign["num_fg"] * frame_valid), 1.0)
    num_gts = jnp.maximum(jnp.sum(assign["num_gt"]), 1.0)

    loss_iou = jnp.sum(iou_loss(bbox_preds, assign["reg_target"]) * fg_f) / num_fg
    obj_bce = bce_with_logits(obj_logits, fg_f)
    loss_obj = jnp.sum(obj_bce * frame_valid[:, None]) / num_fg
    cls_bce = bce_with_logits(cls_logits, assign["cls_target"])
    loss_cls = jnp.sum(cls_bce * fg_f[..., None]) / num_fg

    reg_weight = 5.0
    loss = reg_weight * loss_iou + loss_obj + loss_cls
    return {
        "loss": loss,
        "iou_loss": reg_weight * loss_iou,
        "conf_loss": loss_obj,
        "cls_loss": loss_cls,
        "num_fg": jnp.sum(assign["num_fg"] * frame_valid) / num_gts,
    }
