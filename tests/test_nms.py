"""Fixed-budget NMS vs a reference greedy implementation."""

import jax
import jax.numpy as jnp
import numpy as np

from sast_tpu.ops.nms import nms_fixed, postprocess


def _greedy_nms(boxes, scores, thr):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i] or scores[i] <= 0:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / (area_i + area - inter + 1e-12)
        suppressed |= iou > thr
    return keep


def test_nms_matches_greedy():
    rng = np.random.RandomState(7)
    K = 40
    centers = rng.uniform(20, 200, (K, 2))
    wh = rng.uniform(10, 60, (K, 2))
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1).astype(np.float32)
    scores = rng.rand(K).astype(np.float32)
    scores[-5:] = 0.0  # invalid candidates

    keep_idx, valid = jax.jit(
        lambda b, s: nms_fixed(b, s, 0.5, 16)
    )(jnp.asarray(boxes), jnp.asarray(scores))
    got = list(np.asarray(keep_idx)[np.asarray(valid)])
    want = _greedy_nms(boxes, scores, 0.5)[:16]
    assert got == want, (got, want)


def test_postprocess_shapes_and_class_separation():
    rng = np.random.RandomState(0)
    B, A, n_cls = 2, 50, 3
    preds = np.zeros((B, A, 5 + n_cls), np.float32)
    preds[..., :2] = rng.uniform(50, 150, (B, A, 2))
    preds[..., 2:4] = rng.uniform(10, 30, (B, A, 2))
    preds[..., 4] = rng.rand(B, A)
    preds[..., 5:] = rng.rand(B, A, n_cls)

    # Two identical overlapping boxes with different classes must BOTH survive
    # class-aware NMS.
    preds[0, 0] = [100, 100, 20, 20, 0.9, 0.99, 0.01, 0.01]
    preds[0, 1] = [100, 100, 20, 20, 0.9, 0.01, 0.99, 0.01]

    out = jax.jit(
        lambda p: postprocess(p, n_cls, conf_threshold=0.1, nms_threshold=0.45,
                              pre_nms_topk=32, max_detections=8)
    )(jnp.asarray(preds))
    assert out["boxes"].shape == (B, 8, 4)
    assert out["valid"].shape == (B, 8)

    kept_classes = np.asarray(out["classes"][0])[np.asarray(out["valid"][0])]
    kept_boxes = np.asarray(out["boxes"][0])[np.asarray(out["valid"][0])]
    # both class-0 and class-1 versions of the identical box survived
    at_100 = [
        int(c) for c, b in zip(kept_classes, kept_boxes)
        if abs(b[0] - 90) < 1 and abs(b[1] - 90) < 1
    ]
    assert 0 in at_100 and 1 in at_100, (kept_classes, kept_boxes)


# ---------------------------------------------------------------------------
# Pallas greedy-keep kernel (ops/pallas/nms_keep.py)


def _clustered_candidates(rng, n, k):
    """Sorted candidate sets with heavy overlap (long suppression chains)."""
    centers = rng.rand(n, 6, 2) * 200
    idx = rng.randint(0, 6, (n, k))
    xy = centers[np.arange(n)[:, None], idx] + rng.randn(n, k, 2) * 8
    wh = 10 + rng.rand(n, k, 2) * 30
    boxes = np.concatenate([xy - wh / 2, xy + wh / 2], axis=-1).astype(np.float32)
    scores = np.sort(rng.rand(n, k).astype(np.float32), axis=-1)[:, ::-1].copy()
    scores[:, -k // 8 :] = 0.0  # invalid tail
    return jnp.asarray(boxes), jnp.asarray(scores)


def test_greedy_keep_kernel_matches_scan(monkeypatch):
    from functools import partial

    import jax.experimental.pallas as pl

    import sast_tpu.ops.pallas.nms_keep as nk
    from sast_tpu.ops.nms import batched_greedy_keep

    monkeypatch.setattr(nk, "_pallas_call", partial(pl.pallas_call, interpret=True))
    rng = np.random.RandomState(0)
    boxes, scores = _clustered_candidates(rng, 4, 200)  # pads 200 -> 256
    ref = batched_greedy_keep(boxes, scores, 0.45, use_pallas=False)
    got = batched_greedy_keep(boxes, scores, 0.45, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_postprocess_pallas_nms_matches_scan(monkeypatch):
    from functools import partial

    import jax.experimental.pallas as pl

    import sast_tpu.ops.pallas.nms_keep as nk

    monkeypatch.setattr(nk, "_pallas_call", partial(pl.pallas_call, interpret=True))
    rng = np.random.RandomState(1)
    B, A, n_cls = 2, 400, 3
    preds = np.zeros((B, A, 5 + n_cls), np.float32)
    preds[..., :2] = rng.rand(B, A, 2) * 200
    preds[..., 2:4] = 10 + rng.rand(B, A, 2) * 40
    preds[..., 4] = rng.rand(B, A)
    preds[..., 5:] = rng.rand(B, A, n_cls)
    kw = dict(num_classes=n_cls, conf_threshold=0.05, nms_threshold=0.45,
              pre_nms_topk=128, max_detections=16)
    ref = jax.jit(lambda p: postprocess(p, use_pallas_nms=False, **kw))(
        jnp.asarray(preds))
    got = jax.jit(lambda p: postprocess(p, use_pallas_nms=True, **kw))(
        jnp.asarray(preds))
    for key in ref:
        np.testing.assert_array_equal(
            np.asarray(got[key]), np.asarray(ref[key]), err_msg=key
        )
