"""Evaluation stack tests: numpy COCO AP, box filters, time matching."""

import numpy as np

from sast_tpu.eval.coco import evaluate_coco_ap, iou_xywh
from sast_tpu.eval.prophesee import (
    BBOX_DTYPE,
    PropheseeEvaluator,
    detections_to_prophesee,
    filter_boxes,
    match_times,
)


def _img(boxes, classes, scores=None):
    out = {
        "boxes": np.asarray(boxes, np.float64).reshape(-1, 4),
        "classes": np.asarray(classes, np.int64),
    }
    if scores is not None:
        out["scores"] = np.asarray(scores, np.float64)
    return out


def test_perfect_detection_ap1():
    gt = [_img([[10, 10, 40, 40], [100, 100, 50, 50]], [0, 1])]
    dt = [_img([[10, 10, 40, 40], [100, 100, 50, 50]], [0, 1], [0.9, 0.8])]
    m = evaluate_coco_ap(gt, dt, num_classes=2)
    assert abs(m["AP"] - 1.0) < 1e-6
    assert abs(m["AP_50"] - 1.0) < 1e-6
    assert abs(m["AP_75"] - 1.0) < 1e-6


def test_half_recall():
    # two GTs, one detected perfectly, no other detections
    gt = [_img([[10, 10, 40, 40], [100, 100, 40, 40]], [0, 0])]
    dt = [_img([[10, 10, 40, 40]], [0], [0.9])]
    m = evaluate_coco_ap(gt, dt, num_classes=1)
    # precision 1 up to recall 0.5 -> 101-pt AP ~ 51/101
    assert abs(m["AP"] - 51 / 101) < 1e-6


def test_iou_threshold_sensitivity():
    # detection with IoU ~0.6: counts at AP_50, not at AP_75
    gt = [_img([[0, 0, 100, 100]], [0])]
    dt = [_img([[0, 0, 75, 100]], [0], [0.9])]  # IoU = 0.75
    m = evaluate_coco_ap(gt, dt, num_classes=1)
    assert m["AP_50"] == 1.0
    assert m["AP_75"] == 1.0  # IoU 0.75 >= .75? matching uses min(t, 1-eps)
    dt2 = [_img([[0, 0, 60, 100]], [0], [0.9])]  # IoU = 0.6
    m2 = evaluate_coco_ap(gt, dt2, num_classes=1)
    assert m2["AP_50"] == 1.0
    assert m2["AP_75"] == 0.0


def test_false_positive_lowers_precision():
    gt = [_img([[0, 0, 50, 50]], [0])]
    # high-scored FP first, then the TP
    dt = [_img([[200, 200, 50, 50], [0, 0, 50, 50]], [0, 0], [0.9, 0.8])]
    m = evaluate_coco_ap(gt, dt, num_classes=1)
    # precision at recall 1.0 is 0.5; envelope -> AP = 0.5
    assert abs(m["AP"] - 0.5) < 1e-6


def test_area_splits():
    # one small GT (20x20=400 < 32^2), one large (150x150 > 96^2)
    gt = [_img([[0, 0, 20, 20], [300, 300, 150, 150]], [0, 0])]
    dt = [_img([[0, 0, 20, 20]], [0], [0.9])]  # only the small one found
    m = evaluate_coco_ap(gt, dt, num_classes=1)
    assert m["AP_S"] == 1.0
    assert m["AP_L"] == 0.0
    assert m["AP_M"] == 0.0  # no medium GT -> excluded... (stays 0 default)


def test_class_confusion_is_fp():
    gt = [_img([[0, 0, 50, 50]], [0])]
    dt = [_img([[0, 0, 50, 50]], [1], [0.9])]  # wrong class
    m = evaluate_coco_ap(gt, dt, num_classes=2)
    assert m["AP"] == 0.0


def test_filter_boxes():
    b = np.zeros((4,), BBOX_DTYPE)
    b["t"] = [100, int(6e5), int(6e5), int(6e5)]
    b["w"] = [50, 50, 5, 30]
    b["h"] = [50, 50, 5, 4]
    kept = filter_boxes(b, int(5e5), min_box_diag=30, min_box_side=10)
    # 0: too early; 2: diag/side too small; 3: h < 10
    assert len(kept) == 1 and kept["w"][0] == 50


def test_match_times_window():
    gt = np.zeros((3,), BBOX_DTYPE)
    gt["t"] = [100_000, 100_000, 200_000]
    dt = np.zeros((3,), BBOX_DTYPE)
    dt["t"] = [60_000, 130_000, 260_000]
    g, d = match_times(np.unique(gt["t"]), gt, dt, time_tol=50_000)
    assert len(g) == 2
    assert len(g[0]) == 2 and len(g[1]) == 1
    # ts=100k window [50k,150k] -> dets at 60k, 130k
    assert len(d[0]) == 2
    # ts=200k window [150k,250k] -> no det (260k outside)
    assert len(d[1]) == 0


def test_detections_to_prophesee_and_evaluator():
    F, K = 2, 5
    dets = {
        "boxes": np.zeros((F, K, 4), np.float32),
        "scores": np.zeros((F, K), np.float32),
        "cls_conf": np.zeros((F, K), np.float32),
        "classes": np.full((F, K), -1, np.int32),
        "valid": np.zeros((F, K), bool),
    }
    # frame 0: one valid det matching a GT; frame 1: empty
    dets["boxes"][0, 0] = [10, 10, 60, 60]
    dets["scores"][0, 0] = 0.9
    dets["cls_conf"][0, 0] = 0.95
    dets["classes"][0, 0] = 0
    dets["valid"][0, 0] = True
    preds = detections_to_prophesee(dets, [600_000, 700_000])
    assert len(preds) == 2 and len(preds[0]) == 1 and len(preds[1]) == 0
    assert preds[0]["w"][0] == 50

    gt0 = np.zeros((1,), BBOX_DTYPE)
    gt0["t"] = 600_000
    gt0["x"], gt0["y"], gt0["w"], gt0["h"] = 10, 10, 50, 50
    gt0["class_id"] = 0
    gt1 = np.zeros((1,), BBOX_DTYPE)
    gt1["t"] = 700_000
    gt1["x"], gt1["y"], gt1["w"], gt1["h"] = 30, 30, 60, 60
    gt1["class_id"] = 1

    ev = PropheseeEvaluator("gen1")
    ev.add_labels([gt0, gt1])
    ev.add_predictions(preds)
    assert ev.has_data()
    m = ev.evaluate_buffer(240, 304)
    # class 0: perfect; class 1 (pedestrian): no detection -> AP 0
    assert abs(m["AP"] - 0.5) < 1e-6
    ev.reset_buffer()
    assert not ev.has_data()
