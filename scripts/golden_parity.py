"""Golden numerical parity vs the ACTUAL PyTorch reference implementation.

Instantiates the reference YoloXDetector (/root/reference, CPU, random init),
exports its state_dict, converts it with checkpoint/torch_convert.py, and runs
both models on identical inputs:

  1. backbone: per-stage activations + selection telemetry P over T
     recurrent steps (reference: sast_rnn.py:144-163, SAST.py:98-281)
  2. detect (eval): decoded predictions through FPN + head
     (yolo_pafpn.py, yolo_head.py:164-246)
  3. loss (train): SimOTA assignment counts (num_fg) and the loss terms
     (yolo_head.py:291-606)

Usage:
    python scripts/golden_parity.py            # tiny shapes, fast
    python scripts/golden_parity.py --gen1     # gen1-base shapes (slow, CPU)

The pytest wrapper (tests/test_golden_parity.py) runs the tiny configuration
in CI. Real-checkpoint mAP parity remains impossible in this environment (no
datasets / released checkpoints); random-init activation parity through the
converter is the strongest available evidence of equivalence.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Dict, List

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def make_event_input(rng: np.random.RandomState, shape, sparsity: float = 0.9):
    """Sparse event-count tensor (B, H, W, C), uint8-like small ints."""
    mask = rng.rand(*shape) > sparsity
    counts = rng.randint(1, 4, size=shape)
    return (mask * counts).astype(np.float32)


def make_targets(rng: np.random.RandomState, B: int, G: int, hw, num_classes: int):
    """Padded GT: ours (boxes cxcywh, classes, valid) + reference layout
    (B, G, 5) rows of (class, cx, cy, w, h), zero-padded."""
    H, W = hw
    n_per = rng.randint(1, G + 1, size=B)
    boxes = np.zeros((B, G, 4), np.float32)
    classes = np.zeros((B, G), np.int32)
    valid = np.zeros((B, G), bool)
    for b in range(B):
        n = n_per[b]
        cx = rng.uniform(0.2 * W, 0.8 * W, n)
        cy = rng.uniform(0.2 * H, 0.8 * H, n)
        w = rng.uniform(0.05 * W, 0.3 * W, n)
        h = rng.uniform(0.05 * H, 0.3 * H, n)
        boxes[b, :n] = np.stack([cx, cy, w, h], -1)
        classes[b, :n] = rng.randint(0, num_classes, n)
        valid[b, :n] = True
    ref = np.zeros((B, G, 5), np.float32)
    ref[..., 0] = classes
    ref[..., 1:5] = boxes
    ref[~valid] = 0.0
    return boxes, classes, valid, ref


def run_parity(cfg, B: int = 2, T: int = 3, seed: int = 0, sparsity: float = 0.9,
               verbose: bool = True) -> Dict[str, float]:
    """Run all three parity comparisons; returns {metric: max_abs_diff}."""
    import torch

    from ref_harness import build_reference_detector, reference_state_dict

    ref = build_reference_detector(cfg, seed=seed)

    import jax
    import jax.numpy as jnp

    from sast_tpu.checkpoint.torch_convert import convert_state_dict
    from sast_tpu.models.detector import YoloXDetector
    from sast_tpu.models.backbone import zero_states
    from sast_tpu.models.head import inference_outputs
    from sast_tpu.models.losses import yolox_loss

    params, stats = convert_state_dict(reference_state_dict(ref), cfg.model)
    params = jax.tree.map(jnp.asarray, params)
    stats = jax.tree.map(jnp.asarray, stats)
    variables = {"params": params, "batch_stats": stats}

    model = YoloXDetector(cfg.model)
    bb = cfg.model.backbone
    H, W = bb.in_res_hw
    C = bb.input_channels
    rng = np.random.RandomState(seed + 1)

    report: Dict[str, float] = {}

    # ---- 1. backbone: per-stage features + P over T recurrent steps --------
    @jax.jit
    def fwd_backbone(variables, x, states):
        return model.apply(
            {"params": variables["params"]},
            x,
            states,
            method=YoloXDetector.forward_backbone,
        )

    xs = [make_event_input(rng, (B, H, W, C), sparsity) for _ in range(T)]

    th_states = None
    jx_states = zero_states(bb, B)
    last_th_feats = None
    last_jx_feats = None
    with torch.no_grad():
        for t, x in enumerate(xs):
            x_th = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))  # NCHW
            th_feats, th_states, th_P = ref.forward_backbone(x_th, th_states)
            jx_feats, jx_states, jx_P = fwd_backbone(variables, jnp.asarray(x), jx_states)
            for s in range(1, bb.num_stages + 1):
                a = np.transpose(th_feats[s].numpy(), (0, 2, 3, 1))
                b = np.asarray(jx_feats[s], np.float32)
                d = float(np.max(np.abs(a - b)))
                report[f"backbone/t{t}/stage{s}"] = d
            # P telemetry: reference returns a per-stage list
            th_p = np.asarray([float(np.asarray(p).sum()) for p in th_P])
            jx_p = np.asarray(jx_P, np.float32)
            report[f"backbone/t{t}/P"] = float(np.max(np.abs(th_p - jx_p)))
            last_th_feats, last_jx_feats = th_feats, jx_feats

    # ---- 2. detect (eval): decoded predictions -----------------------------
    @jax.jit
    def fwd_detect_eval(variables, feats):
        out = model.apply(
            variables, feats, train=False, method=YoloXDetector.forward_detect
        )
        return inference_outputs(out["preds"])

    with torch.no_grad():
        th_out, _ = ref.forward_detect(last_th_feats)
    in_stages = tuple(cfg.model.fpn.in_stages)
    jx_out = fwd_detect_eval(variables, {s: last_jx_feats[s] for s in in_stages})
    report["detect/preds"] = float(
        np.max(np.abs(th_out.numpy() - np.asarray(jx_out, np.float32)))
    )

    # ---- 3. loss (train): SimOTA + loss terms -------------------------------
    G = min(cfg.model.head.max_gt, 8)
    boxes, classes, valid, ref_targets = make_targets(
        rng, B, G, (H, W), cfg.model.head.num_classes
    )

    ref.train()
    th_feats_t = {k: v.clone() for k, v in last_th_feats.items()}
    th_losses = ref.forward_detect(
        th_feats_t, targets=torch.from_numpy(ref_targets)
    )[1]
    ref.eval()

    def loss_fn(variables, feats):
        out, _ = model.apply(
            variables, feats, train=True,
            method=YoloXDetector.forward_detect, mutable=["batch_stats"],
        )
        return yolox_loss(
            preds=out["preds"],
            grids=out["grids"],
            strides=out["strides"],
            gt_boxes=jnp.asarray(boxes),
            gt_classes=jnp.asarray(classes),
            gt_valid=jnp.asarray(valid),
            frame_valid=jnp.ones((B,), bool),
            num_classes=cfg.model.head.num_classes,
            topk=cfg.model.head.simota_topk,
        )

    jx_losses = jax.jit(loss_fn)(variables, {s: last_jx_feats[s] for s in in_stages})

    pairs = [
        ("loss", "loss"),
        ("iou_loss", "iou_loss"),
        ("conf_loss", "conf_loss"),
        ("cls_loss", "cls_loss"),
        ("num_fg", "num_fg"),
    ]
    for th_k, jx_k in pairs:
        if th_k in th_losses and jx_k in jx_losses:
            a = float(th_losses[th_k])
            b = float(jx_losses[jx_k])
            report[f"loss/{jx_k}"] = abs(a - b)
            if verbose:
                print(f"  loss/{jx_k}: torch={a:.6f} jax={b:.6f}")

    # ---- 4. multi-label random clip loss (only_load_end_labels=False) ------
    # The reference task module supervises EVERY labeled frame of a clip by
    # batching the selected per-frame features and running one forward_detect
    # (modules/detection.py:141-173 + sequence_rnd.py:54 default False).
    # Equivalence check: all T frames of the recurrent rollout are labeled;
    # the reference loss over the B*T concatenated frames must equal ours
    # over the same frames PLUS one zero-padded frame_valid=False slot (the
    # static-budget padding our train step uses, training/steps.py).
    th_clip_feats = {s: [] for s in in_stages}
    jx_clip_feats = {s: [] for s in in_stages}
    th_states2 = None
    jx_states2 = zero_states(bb, B)
    with torch.no_grad():
        for x in xs:
            x_th = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
            th_f, th_states2, _ = ref.forward_backbone(x_th, th_states2)
            jx_f, jx_states2, _ = fwd_backbone(variables, jnp.asarray(x), jx_states2)
            for s in in_stages:
                th_clip_feats[s].append(th_f[s])
                jx_clip_feats[s].append(np.asarray(jx_f[s], np.float32))

    F = B * T  # every (lane, step) frame is labeled
    rng2 = np.random.RandomState(seed + 2)
    m_boxes, m_classes, m_valid, m_ref_targets = make_targets(
        rng2, F, G, (H, W), cfg.model.head.num_classes
    )

    # Frame order: (t, b) flattened — torch.cat over the T per-step feature
    # batches preserves lane order within each step.
    ref.train()
    th_cat = {
        s: torch.cat(th_clip_feats[s], dim=0).clone() for s in in_stages
    }
    th_multi_losses = ref.forward_detect(
        th_cat, targets=torch.from_numpy(m_ref_targets)
    )[1]
    ref.eval()

    # Ours: same frames + one zero-padded invalid slot; frame_valid masks it.
    def multi_loss_fn(variables, feats):
        out, _ = model.apply(
            variables, feats, train=True,
            method=YoloXDetector.forward_detect, mutable=["batch_stats"],
        )
        pad1 = lambda a: jnp.concatenate(
            [a, jnp.zeros((1,) + a.shape[1:], a.dtype)], axis=0
        )
        return yolox_loss(
            preds=pad1(out["preds"]),
            grids=out["grids"],
            strides=out["strides"],
            gt_boxes=pad1(jnp.asarray(m_boxes)),
            gt_classes=pad1(jnp.asarray(m_classes)),
            gt_valid=pad1(jnp.asarray(m_valid)),
            frame_valid=jnp.asarray([True] * F + [False]),
            num_classes=cfg.model.head.num_classes,
            topk=cfg.model.head.simota_topk,
        )

    jx_cat = {
        s: jnp.concatenate([jnp.asarray(f) for f in jx_clip_feats[s]], axis=0)
        for s in in_stages
    }
    jx_multi_losses = jax.jit(multi_loss_fn)(variables, jx_cat)
    for th_k, jx_k in pairs:
        if th_k in th_multi_losses and jx_k in jx_multi_losses:
            a = float(th_multi_losses[th_k])
            b = float(jx_multi_losses[jx_k])
            report[f"multiloss/{jx_k}"] = abs(a - b)
            if verbose:
                print(f"  multiloss/{jx_k}: torch={a:.6f} jax={b:.6f}")

    if verbose:
        width = max(len(k) for k in report)
        for k, v in report.items():
            print(f"{k:<{width}}  max|diff| = {v:.3e}")
    return report


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--gen1", action="store_true", help="gen1-base shapes (slow)")
    ap.add_argument("--gen4", action="store_true",
                    help="gen4-base shapes: 1 Mpx resolution, partition "
                    "split 2 (slower)")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from sast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    if args.gen1 or args.gen4:
        from sast_tpu.config import get_config

        cfg = get_config("gen4" if args.gen4 else "gen1", "base")
        import dataclasses

        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, compute_dtype="float32")
        )
    else:
        from sast_tpu.config import get_test_config

        cfg = get_test_config()

    report = run_parity(cfg, B=args.batch, T=args.steps, seed=args.seed)
    # P (selected-token counts) tolerates a handful of threshold-tie flips:
    # at random init, windows with near-uniform scores sit exactly on the
    # 1/N softmax boundary, and torch-vs-XLA reduction order flips the
    # comparison by 1 ulp. LayerScale (1e-5 at init) suppresses the output
    # difference of a flipped selection to ~1e-6, so activations still match
    # (observed gen1-base: t0 P diff = 4 of ~10k tokens, activations 1e-6).
    bad = {
        k: v
        for k, v in report.items()
        if v > (8.0 if k.endswith("/P") else 1e-3)
    }
    if bad:
        print(f"PARITY FAILURES: {bad}")
        sys.exit(1)
    print("golden parity OK")


if __name__ == "__main__":
    main()
