"""Benchmark CLI: FPS, GFLOPs, sparsity sweep.

Equivalent of the reference benchmark.py (:52-117): synthetic
sparsity-controlled input, FPS = batch / step time, FLOP counting — on TPU
via XLA cost analysis and device-blocking timers.

    python scripts/benchmark.py --dataset gen4 --size base --sweep
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", choices=("gen1", "gen4"), default="gen4")
    ap.add_argument("--size", choices=("tiny", "small", "base", "large"), default="base")
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--sparsity", type=float, default=0.9)
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--sweep", action="store_true", help="sweep input sparsity levels")
    ap.add_argument("--flops", action="store_true", help="also report GFLOPs")
    args = ap.parse_args()

    from sast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from sast_tpu.config import get_config
    from sast_tpu.utils.benchmark import compute_flops, compute_fps, sweep_sparsity_fps

    cfg = get_config(args.dataset, args.size)
    out = {"dataset": args.dataset, "size": args.size}

    if args.sweep:
        sweep = sweep_sparsity_fps(
            cfg, batch_size=args.batch_size, iters=args.iters
        )
        out["sweep"] = {str(k): v for k, v in sweep.items()}
        for s, m in sweep.items():
            print(f"sparsity {s:.2f}: {m['fps']:.0f} fps  {m['step_ms']:.3f} ms/step",
                  file=sys.stderr)
    else:
        m = compute_fps(
            cfg, batch_size=args.batch_size, sparsity=args.sparsity, iters=args.iters
        )
        out.update(m)
        print(f"{m['fps']:.0f} fps  {m['step_ms']:.3f} ms/step", file=sys.stderr)

    if args.flops:
        out.update(compute_flops(cfg, sparsity=args.sparsity))
        print(f"GFLOPs/frame: {out['gflops_total']:.2f}", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
