"""Export a trained checkpoint as a deployable streaming-inference artifact.

Loads weights (orbax checkpoint directory, or a converted reference torch
.ckpt), binds them into the jitted streaming step (raw events -> detections,
sast_tpu/serving.py), and serializes it with jax.export into a
self-describing StableHLO artifact runnable without model code or config
(sast_tpu/export.py).

    python scripts/export_model.py --dataset gen1 --size base \
        --ckpt runs/g1b/ckpts --out artifacts/g1b [--max-events 200000] \
        [--platforms cpu,tpu] [--allow-tpu-kernels]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", choices=("gen1", "gen4"), default="gen1")
    ap.add_argument("--size", choices=("tiny", "small", "base", "large"),
                    default="base")
    ap.add_argument("--ckpt", required=True,
                    help="orbax checkpoint directory or torch .ckpt file")
    ap.add_argument("--out", required=True, help="artifact output directory")
    ap.add_argument("--max-events", type=int, default=200_000,
                    help="static per-frame event budget")
    ap.add_argument("--num-streams", type=int, default=1,
                    help="parallel stream lanes baked into the artifact")
    ap.add_argument("--platforms", default=None,
                    help="comma-separated lowering platforms (e.g. cpu,tpu); "
                    "default: current backend only")
    ap.add_argument("--allow-tpu-kernels", action="store_true",
                    help="serialize Pallas tpu_custom_calls (no cross-version "
                    "stability guarantee)")
    ap.add_argument("--set", dest="overrides", action="append",
                    metavar="KEY=VALUE")
    args = ap.parse_args()

    # Re-assert JAX_PLATFORMS over any sitecustomize platform pin (this
    # environment pins the TPU backend at interpreter startup; backend init
    # is lazy so the config can still be overridden here).
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass

    from sast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from train import parse_overrides
    from sast_tpu.config import get_config
    from sast_tpu.export import export_streaming_detector
    from sast_tpu.serving import StreamingDetector

    overrides = parse_overrides(args.overrides)
    # Deployment uses the validation confidence threshold by default
    # (reference config/val.yaml).
    overrides.setdefault("model.postprocess.confidence_threshold", 0.001)
    cfg = get_config(args.dataset, args.size, **overrides)

    if args.ckpt.endswith(".ckpt") or args.ckpt.endswith(".pth"):
        from sast_tpu.checkpoint.torch_convert import load_torch_checkpoint_full

        params, batch_stats = load_torch_checkpoint_full(args.ckpt, cfg.model)
        variables = {"params": params, "batch_stats": batch_stats}
    else:
        from sast_tpu.checkpoint.orbax_io import CheckpointManager

        mgr = CheckpointManager(args.ckpt)
        payload = mgr.restore_raw()  # template-free: no model build needed
        # Deploy the EMA weights when maintained (same preference as eval).
        params = payload.get("ema_params") or payload["params"]
        variables = {"params": params, "batch_stats": payload["batch_stats"]}

    det = StreamingDetector(
        cfg, variables, max_events=args.max_events,
        num_streams=args.num_streams,
    )
    platforms = args.platforms.split(",") if args.platforms else None
    blob = export_streaming_detector(
        det,
        path=args.out,
        platforms=platforms,
        allow_tpu_kernels=args.allow_tpu_kernels,
    )
    print(
        f"wrote {os.path.join(args.out, 'streaming_step.jaxexport')} "
        f"({len(blob) / 1e6:.1f} MB, max_events={args.max_events}, "
        f"num_streams={args.num_streams}, platforms={platforms or 'current'})"
    )


if __name__ == "__main__":
    main()
