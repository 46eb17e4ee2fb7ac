"""Golden parity for detection postprocessing + eval time-matching vs the
ACTUAL PyTorch reference.

- ``ops/nms.postprocess`` (static-budget, on-device) vs the reference
  ``postprocess`` (models/detection/yolox/utils/boxes.py:32) driven through
  the pure-torch greedy NMS shim in ref_harness (the same greedy algorithm
  torchvision implements).
- ``eval/prophesee.match_times`` vs the reference ``_match_times``
  (utils/evaluation/prophesee/metrics/coco_eval.py:55) — the +-time_tol
  windowing that defines which detections count at each GT timestamp.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

torch = pytest.importorskip("torch")

if not os.path.isdir("/root/reference"):  # pragma: no cover
    pytest.skip("reference implementation not present", allow_module_level=True)

from ref_harness import add_reference_to_path, install_torchvision_stub  # noqa: E402

install_torchvision_stub()
add_reference_to_path()

# pycocotools stub: coco_eval imports it at module level; _match_times (the
# function under test) never touches it.
if "pycocotools" not in sys.modules:
    pc = types.ModuleType("pycocotools")
    pc.__sast_tpu_stub__ = True  # lets other tests tell stub from real
    coco_mod = types.ModuleType("pycocotools.coco")
    coco_mod.COCO = object
    ce_mod = types.ModuleType("pycocotools.cocoeval")
    ce_mod.COCOeval = object
    sys.modules["pycocotools"] = pc
    sys.modules["pycocotools.coco"] = coco_mod
    sys.modules["pycocotools.cocoeval"] = ce_mod

_spec = importlib.util.spec_from_file_location(
    "ref_coco_eval",
    "/root/reference/utils/evaluation/prophesee/metrics/coco_eval.py",
)
ref_coco = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(ref_coco)

from models.detection.yolox.utils.boxes import postprocess as ref_postprocess  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from sast_tpu.eval.prophesee import BBOX_DTYPE, match_times  # noqa: E402
from sast_tpu.ops.nms import postprocess  # noqa: E402


def _bbox_array(rng, n, t_lo, t_hi):
    arr = np.zeros((n,), BBOX_DTYPE)
    arr["t"] = np.sort(rng.randint(t_lo, t_hi, n))
    arr["x"] = rng.uniform(0, 280, n)
    arr["y"] = rng.uniform(0, 200, n)
    arr["w"] = rng.uniform(10, 60, n)
    arr["h"] = rng.uniform(10, 50, n)
    arr["class_id"] = rng.randint(0, 2, n)
    arr["class_confidence"] = rng.uniform(0.1, 1.0, n)
    return arr


def test_match_times_matches_reference():
    rng = np.random.RandomState(0)
    gt = _bbox_array(rng, 120, 0, 2_000_000)
    dt = _bbox_array(rng, 300, 0, 2_000_000)
    all_ts = np.unique(gt["t"])
    ref_gt, ref_dt = ref_coco._match_times(all_ts, gt, dt, time_tol=50_000)
    our_gt, our_dt = match_times(all_ts, gt, dt, time_tol=50_000)
    assert len(our_gt) == len(ref_gt) and len(our_dt) == len(ref_dt)
    for a, b in zip(our_gt, ref_gt):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(our_dt, ref_dt):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("class_agnostic", [False, True])
def test_postprocess_matches_reference(class_agnostic):
    rng = np.random.RandomState(1)
    B, A, ncls = 3, 400, 3
    preds = np.zeros((B, A, 5 + ncls), np.float32)
    preds[..., 0] = rng.uniform(20, 300, (B, A))   # cx
    preds[..., 1] = rng.uniform(20, 220, (B, A))   # cy
    preds[..., 2] = rng.uniform(8, 80, (B, A))     # w
    preds[..., 3] = rng.uniform(8, 60, (B, A))     # h
    preds[..., 4] = rng.uniform(0, 1, (B, A))      # obj
    preds[..., 5:] = rng.uniform(0, 1, (B, A, ncls))

    ref_out = ref_postprocess(
        torch.from_numpy(preds.copy()),  # the reference mutates its input
        num_classes=ncls, conf_thre=0.3, nms_thre=0.45,
        class_agnostic=class_agnostic,
    )

    ours = postprocess(
        jnp.asarray(preds), ncls, 0.3, 0.45, class_agnostic=class_agnostic
    )
    ours = {k: np.asarray(v) for k, v in ours.items()}

    for b in range(B):
        valid = ours["valid"][b].astype(bool)
        our_rows = np.concatenate(
            [
                ours["boxes"][b][valid],
                ours["scores"][b][valid, None],
                ours["classes"][b][valid, None].astype(np.float32),
            ],
            axis=1,
        )
        ref = ref_out[b]
        if ref is None:
            assert our_rows.shape[0] == 0
            continue
        ref = ref.numpy()
        ref_rows = np.concatenate(
            [ref[:, :4], (ref[:, 4] * ref[:, 5])[:, None], ref[:, 6:7]], axis=1
        )
        assert our_rows.shape[0] == ref_rows.shape[0]
        # order-insensitive comparison: sort both by score desc
        our_rows = our_rows[np.argsort(-our_rows[:, 4])]
        ref_rows = ref_rows[np.argsort(-ref_rows[:, 4])]
        np.testing.assert_allclose(our_rows, ref_rows, rtol=1e-4, atol=1e-4)
