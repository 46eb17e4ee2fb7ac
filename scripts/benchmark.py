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


def per_sample_sweep(cfg, args) -> None:
    """Per-sample transformer-GFLOPs table (reference benchmark.py:97-117).

    For each sample: run the backbone once with the 'telemetry' collection
    mutable, pull the per-attention (M kept windows, Kmax tokens) stats,
    and reconstruct the reference-style gathered-shape transformer GFLOPs
    (sast_tpu.utils.benchmark.transformer_macs_from_telemetry). Samples come
    from a preprocessed dataset (--data) or a synthetic density ladder.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sast_tpu.data.synthetic import sparse_event_input
    from sast_tpu.models.backbone import zero_states
    from sast_tpu.models.detector import YoloXDetector
    from sast_tpu.utils.benchmark import transformer_macs_from_telemetry
    from sast_tpu.utils.padding import InputPadder

    bb = cfg.model.backbone
    model = YoloXDetector(cfg.model)
    x0 = jnp.zeros((1, *bb.in_res_hw, bb.input_channels), jnp.uint8)
    states = zero_states(bb, 1, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0, states)

    @jax.jit
    def fwd(x):
        (feats, new_states, p), tel = model.apply(
            variables, x, states,
            method=YoloXDetector.forward_backbone,
            mutable=["telemetry"],
        )
        return p, tel["telemetry"]

    def samples():
        if args.data is not None:
            from sast_tpu.data.sequence import SequenceReader

            padder = InputPadder(bb.in_res_hw)
            n = 0
            split_dir = args.data / args.split
            for seq_dir in sorted(p for p in split_dir.iterdir() if p.is_dir()):
                reader = SequenceReader(
                    seq_dir, cfg.dataset.ev_repr_name, cfg.dataset.name,
                    cfg.dataset.downsample_by_factor_2,
                )
                for t in range(min(reader.num_ev_repr, 8)):
                    if n >= args.num_samples:
                        return
                    ev = reader.get_ev_repr(t, t + 1)  # (1, H, W, C)
                    yield f"{seq_dir.name}[{t}]", np.asarray(
                        padder.pad_tensor_ev_repr(jnp.asarray(ev))
                    )
                    n += 1
        else:
            rng = np.random.RandomState(0)
            ladder = np.linspace(0.5, 0.999, args.num_samples)
            for i, s in enumerate(ladder):
                yield f"synthetic[s={s:.3f}]", sparse_event_input(
                    rng, (1, *bb.in_res_hw, bb.input_channels), float(s)
                )

    rows = []
    for name, x in samples():
        x = jnp.asarray(x)
        r = float((np.asarray(x) != 0).mean())
        p, tel = fwd(x)
        tel = jax.tree.map(np.asarray, tel)
        macs = transformer_macs_from_telemetry(cfg, tel)
        row = {"sample": name, "r": round(r, 5),
               "p_tokens": [int(v) for v in np.asarray(p)]}
        row.update({k: round(v, 4) for k, v in macs.items()})
        rows.append(row)
        print(f"{name:>28}  r={r:.4f}  "
              f"GFLOPs(transformer)={macs['gflops_transformer']:.3f}",
              file=sys.stderr)

    if args.jsonl:
        with open(args.jsonl, "w") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")
        print(f"wrote {len(rows)} rows to {args.jsonl}", file=sys.stderr)

    g = np.asarray([row["gflops_transformer"] for row in rows])
    summary = {
        "dataset": args.dataset, "size": args.size, "n": len(rows),
        "gflops_transformer_mean": round(float(g.mean()), 3),
        "gflops_transformer_p10": round(float(np.percentile(g, 10)), 3),
        "gflops_transformer_p50": round(float(np.percentile(g, 50)), 3),
        "gflops_transformer_p90": round(float(np.percentile(g, 90)), 3),
        "gflops_transformer_max": round(float(g.max()), 3),
        "source": str(args.data) if args.data else "synthetic",
    }
    print(json.dumps(summary))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", choices=("gen1", "gen4"), default="gen4")
    ap.add_argument("--size", choices=("tiny", "small", "base", "large"), default="base")
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--sparsity", type=float, default=0.9)
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--sweep", action="store_true", help="sweep input sparsity levels")
    ap.add_argument("--flops", action="store_true", help="also report GFLOPs")
    ap.add_argument(
        "--per-sample", action="store_true",
        help="per-sample transformer-GFLOPs sweep (the reference's "
        "sparsity-FLOPs table, benchmark.py:97-117): one row per sample "
        "with its density r and reference-style gathered-shape GFLOPs",
    )
    ap.add_argument("--data", type=Path, default=None,
                    help="preprocessed dataset root for --per-sample "
                    "(default: synthetic density ladder)")
    ap.add_argument("--split", default="test")
    ap.add_argument("--num-samples", type=int, default=64)
    ap.add_argument("--jsonl", type=Path, default=None,
                    help="write per-sample rows to this JSONL file")
    args = ap.parse_args()

    from sast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from sast_tpu.config import get_config
    from sast_tpu.utils.benchmark import compute_flops, compute_fps, sweep_sparsity_fps

    cfg = get_config(args.dataset, args.size)
    out = {"dataset": args.dataset, "size": args.size}

    if args.per_sample:
        per_sample_sweep(cfg, args)
        return

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
