"""Adversarial COCO-protocol fixtures (VERDICT r3 item 5).

Each case is hand-constructed to DISTINGUISH implementations on a corner of
the pycocotools/COCOeval protocol (the reference consumes COCOeval results
verbatim: /root/reference/utils/evaluation/prophesee/metrics/coco_eval.py:
109-134), with the expected value derived by hand from the canonical
cocoeval.py semantics (noted per test). A 0.1-mAP-scale deviation in any of
these rules flips the expected value by far more than the assert tolerance.

Covered rules:
1. score ties break by ORIGINAL ORDER (stable mergesort on -score) — an
   unstable sort flips AP 0.5 <-> 1.0;
2. maxDets=100 truncation happens per (image, category) AFTER score sorting
   — a TP ranked 101st contributes nothing;
3. a det whose only match is an area-IGNORED gt is ignored, not a FP;
4. a det matched to a non-ignored gt NEVER upgrades to a higher-IoU ignored
   gt (the gtIg break rule), while an equal/higher-IoU NON-ignored gt later
   in the list DOES take the match (>= replacement rule);
5. area-range boundaries are INCLUSIVE on both ends (a 32x32 gt counts in
   both 'small' and 'medium');
6. an UNMATCHED det whose own area lies outside the range is ignored (not a
   FP), but a MATCHED det outside the range still counts as a TP.

If pycocotools is importable the same fixtures are additionally
cross-checked against it verbatim (self-skips otherwise — it is absent in
this environment, hence the hand-computed expectations).
"""

import numpy as np
import pytest

from sast_tpu.eval.coco import evaluate_coco_ap


def _img(boxes, classes, scores=None):
    d = {
        "boxes": np.asarray(boxes, np.float64).reshape(-1, 4),
        "classes": np.asarray(classes, np.int64),
    }
    if scores is not None:
        d["scores"] = np.asarray(scores, np.float64)
    return d


def test_score_tie_breaks_by_original_order():
    """Rule 1. One gt; dets [FP, TP] with IDENTICAL scores. Stable sort keeps
    the FP first, so the precision curve is [0, 1/2] -> envelope [1/2, 1/2]
    -> AP exactly 0.5 at every IoU threshold. An unstable sort that floats
    the TP first yields AP 1.0."""
    gt = [_img([[0, 0, 10, 10]], [0])]
    dt = [
        _img(
            [[50, 50, 10, 10], [0, 0, 10, 10]],  # FP first, TP second
            [0, 0],
            [0.7, 0.7],  # exact tie
        )
    ]
    res = evaluate_coco_ap(gt, dt, num_classes=1)
    assert res["AP"] == pytest.approx(0.5, abs=1e-9)
    assert res["AP_50"] == pytest.approx(0.5, abs=1e-9)


def test_max_dets_truncation_order():
    """Rule 2. 100 higher-scored FPs push the only TP to rank 101 -> it is
    truncated by maxDets=100 and AP == 0. With 99 FPs the TP survives at
    rank 100: precision at full recall is 1/100, and the envelope propagates
    0.01 to every recall point -> AP == 0.01 exactly."""
    gt = [_img([[0, 0, 10, 10]], [0])]

    def dets(n_fp):
        boxes = [[1000 + 20 * i, 1000, 10, 10] for i in range(n_fp)]
        boxes.append([0, 0, 10, 10])  # the TP, lowest score
        scores = [0.9] * n_fp + [0.8]
        return [_img(boxes, [0] * (n_fp + 1), scores)]

    res_101 = evaluate_coco_ap(gt, dets(100), num_classes=1)
    assert res_101["AP"] == pytest.approx(0.0, abs=1e-12)

    res_100 = evaluate_coco_ap(gt, dets(99), num_classes=1)
    assert res_100["AP"] == pytest.approx(0.01, abs=1e-9)


# Shared geometry for the ignore-region cases (areas chosen so the ignore
# flags differ per area range):
#   g_ok  = 100x100 (area 10000) -> 'large' only (>96^2=9216)
#   g_ign = 100x54  (area 5400)  -> 'medium' only
#   det d = 100x60  (area 6000)  -> IoU(d, g_ok) = 6000/10000 = 0.6,
#                                   IoU(d, g_ign) = 5400/6000  = 0.9
G_OK = [0, 0, 100, 100]
G_IGN = [0, 0, 100, 54]
DET = [0, 0, 100, 60]


def test_det_matching_only_ignored_gt_is_not_fp():
    """Rules 3+4+6, AP_L. In the 'large' range g_ign is area-ignored.

    Hand-derivation per IoU threshold (npig_large = 1, only g_ok):
      t in {.50,.55,.60}: gts sorted non-ignored first -> d matches g_ok
        (the break rule stops before the higher-IoU ignored gt) -> TP,
        recall 1, precision 1 -> AP(t) = 1.
      t in {.65..+.90}: g_ok fails IoU, d matches the IGNORED g_ign -> d is
        ignored (NOT a FP) -> no dets scored, recall 0 -> AP(t) = 0.
      t = .95: unmatched; d's own area 6000 < 9216 is outside 'large' -> d
        ignored (rule 6) -> AP(t) = 0.
    AP_L = 3/10. If the implementation let d upgrade to the ignored
    g_ign at low t (breaking rule 4), AP_L would be 0; if it counted the
    ignored match as a FP (rule 3), t>=0.65 rows would add FPs but AP_L
    stays 0.3 — rule 3 is pinned separately below via AP_M."""
    gt = [_img([G_OK, G_IGN], [0, 0])]
    dt = [_img([DET], [0], [0.9])]
    res = evaluate_coco_ap(gt, dt, num_classes=1)
    assert res["AP_L"] == pytest.approx(0.3, abs=1e-9)


def test_matched_det_outside_area_range_still_tp():
    """Rule 6 (matched half) + rule 4 break, AP_M. In 'medium' g_ign is the
    real gt and g_ok is ignored. d (area 6000, inside medium) matches g_ign
    at IoU 0.9 for t <= .90 -> TP (9 thresholds at AP 1.0); at t = .95 it is
    unmatched and inside the range -> a real FP -> AP(t)=0.
    AP_M = 9/10."""
    gt = [_img([G_OK, G_IGN], [0, 0])]
    dt = [_img([DET], [0], [0.9])]
    res = evaluate_coco_ap(gt, dt, num_classes=1)
    assert res["AP_M"] == pytest.approx(0.9, abs=1e-9)


def test_equal_or_higher_iou_nonignored_gt_takes_match():
    """Rule 4 (>= replacement among NON-ignored gts), area 'all': nothing is
    ignored, so d visits g_ok (IoU .6) then g_ign (IoU .9) and REPLACES the
    match -> d is a TP against g_ign for t <= .90, with npig = 2.

    Hand-derivation: recall tops out at 1/2 -> precision envelope gives 1.0
    at the 51 recall points 0.00..0.50 and 0 above -> AP(t) = 51/101 for the
    9 thresholds t <= .90; t=.95 unmatched (in-range) FP -> 0.
    AP = 9 * 51 / (101 * 10)."""
    gt = [_img([G_OK, G_IGN], [0, 0])]
    dt = [_img([DET], [0], [0.9])]
    res = evaluate_coco_ap(gt, dt, num_classes=1)
    assert res["AP"] == pytest.approx(9 * 51 / (101 * 10), abs=1e-9)


def test_area_boundary_inclusive_both_ends():
    """Rule 5. A 32x32 gt (area exactly 32^2) is INSIDE both 'small'
    [0, 32^2] and 'medium' [32^2, 96^2] (pycocotools bounds are inclusive).
    With an exact det: AP_S = AP_M = 1.0. Strict-inequality bounds would
    zero one of them (npig=0 -> category skipped -> returns 0.0)."""
    gt = [_img([[0, 0, 32, 32]], [0])]
    dt = [_img([[0, 0, 32, 32]], [0], [0.9])]
    res = evaluate_coco_ap(gt, dt, num_classes=1)
    assert res["AP_S"] == pytest.approx(1.0, abs=1e-9)
    assert res["AP_M"] == pytest.approx(1.0, abs=1e-9)
    assert res["AP_L"] == pytest.approx(0.0, abs=1e-12)  # no large gt


def test_categories_evaluated_independently():
    """Per-category isolation: a flood of category-1 FPs sharing scores with
    category-0 dets must not perturb category-0 AP; overall AP is the mean
    of per-category APs (cat0 = 1.0, cat1 = 0.0)."""
    gt = [_img([[0, 0, 10, 10]], [0])]
    dt = [
        _img(
            [[0, 0, 10, 10]] + [[500 + 20 * i, 500, 10, 10] for i in range(5)],
            [0] + [1] * 5,
            [0.5] * 6,
        )
    ]
    res = evaluate_coco_ap(gt, dt, num_classes=2)
    # cat1 has no gt anywhere -> npig=0 -> skipped entirely (stays -1,
    # excluded from the mean) per pycocotools; AP is cat0's alone.
    assert res["AP"] == pytest.approx(1.0, abs=1e-9)


def test_cross_image_global_ranking():
    """The PR curve is built from a GLOBAL score sort across images: a
    high-scored FP on image 2 degrades precision for image 1's TPs.
    Fixture: img1 has 1 gt + TP det (score .6); img2 has no gt + FP det
    (score .9). Global order: [FP, TP] -> precision at recall 1 is 1/2,
    envelope -> AP = 0.5. Per-image evaluation would report 1.0."""
    gt = [_img([[0, 0, 10, 10]], [0]), _img(np.zeros((0, 4)), [])]
    dt = [
        _img([[0, 0, 10, 10]], [0], [0.6]),
        _img([[300, 300, 10, 10]], [0], [0.9]),
    ]
    res = evaluate_coco_ap(gt, dt, num_classes=1)
    assert res["AP"] == pytest.approx(0.5, abs=1e-9)


def _pycoco_eval(gt_per_image, dt_per_image, num_classes):
    """Run the same fixtures through real pycocotools (if importable)."""
    pycocotools = pytest.importorskip("pycocotools")
    if getattr(pycocotools, "__sast_tpu_stub__", False):
        # test_eval_nms_parity installs a sys.modules stub so the reference
        # coco_eval module imports; it is not the real library.
        pytest.skip("pycocotools is a test stub, not the real library")
    from pycocotools.coco import COCO
    from pycocotools.cocoeval import COCOeval

    images = [{"id": i + 1, "height": 2000, "width": 2000}
              for i in range(len(gt_per_image))]
    cats = [{"id": k + 1, "name": str(k)} for k in range(num_classes)]
    anns, ann_id = [], 1
    for i, g in enumerate(gt_per_image):
        for b, c in zip(g["boxes"], g["classes"]):
            anns.append({
                "id": ann_id, "image_id": i + 1, "category_id": int(c) + 1,
                "bbox": [float(v) for v in b], "area": float(b[2] * b[3]),
                "iscrowd": 0,
            })
            ann_id += 1
    coco = COCO()
    coco.dataset = {"images": images, "annotations": anns, "categories": cats}
    coco.createIndex()
    dets = []
    for i, d in enumerate(dt_per_image):
        for b, c, s in zip(d["boxes"], d["classes"], d["scores"]):
            dets.append({
                "image_id": i + 1, "category_id": int(c) + 1,
                "bbox": [float(v) for v in b], "score": float(s),
            })
    coco_dt = coco.loadRes(dets) if dets else COCO()
    ev = COCOeval(coco, coco_dt, "bbox")
    ev.evaluate(); ev.accumulate(); ev.summarize()
    return dict(zip(
        ["AP", "AP_50", "AP_75", "AP_S", "AP_M", "AP_L"],
        [ev.stats[j] for j in (0, 1, 2, 3, 4, 5)],
    ))


def test_cross_check_against_pycocotools_if_available():
    """Runs every fixture above through real pycocotools and diffs against
    our implementation (self-skips where pycocotools is absent)."""
    pytest.importorskip("pycocotools")
    cases = [
        ([_img([[0, 0, 10, 10]], [0])],
         [_img([[50, 50, 10, 10], [0, 0, 10, 10]], [0, 0], [0.7, 0.7])], 1),
        ([_img([G_OK, G_IGN], [0, 0])], [_img([DET], [0], [0.9])], 1),
        ([_img([[0, 0, 32, 32]], [0])],
         [_img([[0, 0, 32, 32]], [0], [0.9])], 1),
        ([_img([[0, 0, 10, 10]], [0]), _img(np.zeros((0, 4)), [])],
         [_img([[0, 0, 10, 10]], [0], [0.6]),
          _img([[300, 300, 10, 10]], [0], [0.9])], 1),
    ]
    for gt, dt, ncls in cases:
        ours = evaluate_coco_ap(gt, dt, ncls)
        ref = _pycoco_eval(gt, dt, ncls)
        for k in ("AP", "AP_50", "AP_75", "AP_S", "AP_M", "AP_L"):
            if ref[k] == -1.0:  # pycocotools "no gt" marker; we report 0.0
                continue
            assert ours[k] == pytest.approx(ref[k], abs=1e-6), (k, ours, ref)
