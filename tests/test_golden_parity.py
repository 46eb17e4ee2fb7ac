"""Golden numerical parity vs the ACTUAL PyTorch reference (/root/reference).

The strongest correctness evidence available in this environment: the
reference model is instantiated on CPU (random init), its state_dict is
converted through checkpoint/torch_convert.py, and per-stage activations,
selection telemetry, decoded predictions, and SimOTA loss terms must match
to fp32 tolerance over multiple recurrent steps.

See scripts/golden_parity.py for the standalone runner (incl. gen1-base
shapes) and tests/ref_harness.py for the import shim.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def parity_report():
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference implementation not present")
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
    )
    from golden_parity import run_parity

    from sast_tpu.config import get_test_config

    return run_parity(get_test_config(), B=2, T=3, seed=0, verbose=False)


def test_backbone_stage_activations_match(parity_report):
    keys = [k for k in parity_report if k.startswith("backbone/") and "stage" in k]
    assert len(keys) == 12  # 3 steps x 4 stages
    for k in keys:
        assert parity_report[k] <= 1e-4, (k, parity_report[k])


def test_selection_telemetry_matches_exactly(parity_report):
    keys = [k for k in parity_report if k.endswith("/P")]
    assert len(keys) == 3
    for k in keys:
        # token selection is discrete: counts must agree exactly
        assert parity_report[k] == 0.0, (k, parity_report[k])


def test_decoded_predictions_match(parity_report):
    assert parity_report["detect/preds"] <= 1e-4


def test_simota_loss_terms_match(parity_report):
    for k in ("loss/loss", "loss/iou_loss", "loss/conf_loss", "loss/cls_loss"):
        assert parity_report[k] <= 1e-4, (k, parity_report[k])
    # identical assignments -> identical foreground counts
    assert parity_report["loss/num_fg"] <= 1e-6


def test_multi_label_clip_loss_matches(parity_report):
    """only_load_end_labels=False training fidelity: the loss over ALL
    labeled frames of a recurrent clip (batched like the reference task
    module, modules/detection.py:141-173) matches — including our static
    frame_valid padding slot, which must contribute nothing."""
    for k in (
        "multiloss/loss",
        "multiloss/iou_loss",
        "multiloss/conf_loss",
        "multiloss/cls_loss",
    ):
        assert parity_report[k] <= 1e-4, (k, parity_report[k])
    assert parity_report["multiloss/num_fg"] <= 1e-6


@pytest.fixture(scope="module")
def parity_report_small_geometry():
    """Small-preset attention geometry (embed 48, dim_head 24 -> 2 heads)
    at the fast test resolution — regression coverage for the dim_head
    overlay (reference config/experiment/gen1/small.yaml:10), which no
    other parity run exercises (test/base geometries use 1-head stages
    whose head-split reshape cannot catch head-count bugs)."""
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference implementation not present")
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
    )
    import dataclasses

    from golden_parity import run_parity

    from sast_tpu.config import get_test_config

    cfg = get_test_config()
    bb = cfg.model.backbone
    bb = dataclasses.replace(
        bb,
        embed_dim=48,
        attention=dataclasses.replace(bb.attention, dim_head=24),
    )
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, backbone=bb))
    return run_parity(cfg, B=2, T=2, seed=3, verbose=False)


def test_small_geometry_parity(parity_report_small_geometry):
    rep = parity_report_small_geometry
    for k in rep:
        if k.startswith("backbone/") and "stage" in k:
            assert rep[k] <= 1e-4, (k, rep[k])
        if k.endswith("/P"):
            assert rep[k] == 0.0, (k, rep[k])
    assert rep["detect/preds"] <= 1e-4
    assert rep["loss/loss"] <= 1e-4
