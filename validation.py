"""Validation/test CLI.

Equivalent of the reference validation.py: loads a checkpoint (weights only),
streams the requested split, and prints the Prophesee COCO metrics.

    python validation.py --dataset gen1 --size base --data /data/gen1 \
        --ckpt runs/gen1_base/ckpts --split test
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", choices=("gen1", "gen4"), default="gen1")
    ap.add_argument("--size", choices=("tiny", "small", "base", "large"), default="base")
    ap.add_argument("--data", required=True)
    ap.add_argument("--ckpt", required=True, help="checkpoint directory (orbax) or torch .ckpt file")
    ap.add_argument("--split", choices=("val", "test"), default="val")
    ap.add_argument("--set", dest="overrides", action="append", metavar="KEY=VALUE")
    ap.add_argument("--max-batches", type=int, default=None)
    # Clean measurement (scripts/bench_sparse_layer.py) shows the batched
    # masked XLA path beats the window-skipping kernel at every density on
    # v5e, so the kernel stays opt-in (docs/DESIGN.md section 6 explains why
    # round-1 measured the opposite under a degraded-dispatch mode).
    ap.add_argument("--sparse-kernel", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="use the Pallas window-skipping kernel (TPU only)")
    ap.add_argument("--device-cache", action="store_true",
                    help="keep the split's event representations resident in "
                    "device HBM (zero per-batch upload; split must fit in "
                    "HBM — sast_tpu/data/device_cache.py)")
    args = ap.parse_args()

    from sast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from train import parse_overrides
    from sast_tpu.config import get_config
    from sast_tpu.data.module import DataModule
    from sast_tpu.training.loop import Trainer

    overrides = parse_overrides(args.overrides)
    overrides.setdefault("dataset.path", args.data)
    # Reference validation CLI uses a lower confidence threshold than
    # train-time postprocessing (config/val.yaml: 0.001 vs 0.01).
    overrides.setdefault("model.postprocess.confidence_threshold", 0.001)
    cfg = get_config(args.dataset, args.size, **overrides)

    trainer = Trainer(cfg, workdir="/tmp/sast_val", val_every=None,
                      use_pallas_eval=args.sparse_kernel)
    if args.ckpt.endswith(".ckpt") or args.ckpt.endswith(".pth"):
        from sast_tpu.checkpoint.torch_convert import load_torch_checkpoint

        params = load_torch_checkpoint(args.ckpt, cfg.model)
        trainer.state = trainer.state.replace(params=params)
    else:
        from sast_tpu.checkpoint.orbax_io import CheckpointManager

        mgr = CheckpointManager(args.ckpt)
        trainer.state = mgr.restore_weights(trainer.state)

    if args.device_cache:
        from sast_tpu.data.device_cache import DeviceCachedEvalStream

        eval_batches = DeviceCachedEvalStream(cfg, args.split)
    else:
        eval_batches = DataModule(cfg).eval_batches(args.split)
    metrics = trainer.validate(eval_batches, max_batches=args.max_batches)
    for k, v in metrics.items():
        print(f"{k:12s} | {v * 100:.4f}%", file=sys.stderr)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
