"""Roofline analysis of the gen4 streaming inference step (VERDICT r4).

Compiles the production streaming step, pulls XLA cost analysis (FLOPs and
HBM bytes accessed), and reports where the measured step time sits against
the two hardware floors:

  compute floor = flops / peak_flops          (MXU-bound limit)
  memory  floor = bytes / HBM bandwidth       (HBM-bound limit)

The step is memory-bound at the shipped geometry (~31 GFLOP vs ~GBs of
traffic per step), so the honest efficiency metric is achieved-bytes/s vs
the ~819 GB/s v5e HBM roof, not MFU. Prints both.

Usage:  python scripts/roofline_inference.py [--batch 4] [--measured-ms X]
        (--measured-ms: reuse a bench.py step time instead of re-measuring)
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

# Public spec-sheet numbers (same sources as bench.py).
PEAK_TFLOPS = {"TPU v5 lite": 394.0, "TPU v5e": 394.0, "TPU v4": 275.0}
HBM_GBPS = {"TPU v5 lite": 819.0, "TPU v5e": 819.0, "TPU v4": 1228.0}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--sparsity", type=float, default=0.9)
    ap.add_argument("--measured-ms", type=float, default=None,
                    help="known per-step device ms (skip on-device timing)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sast_tpu.config import get_config
    from sast_tpu.data.synthetic import sparse_event_input
    from sast_tpu.models.backbone import zero_states
    from sast_tpu.models.detector import YoloXDetector
    from sast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = get_config("gen4", "base")
    model = YoloXDetector(cfg.model)
    bb = cfg.model.backbone
    rng = np.random.RandomState(0)
    x = jnp.asarray(
        sparse_event_input(
            rng, (args.batch, *bb.in_res_hw, bb.input_channels), args.sparsity
        )
    )
    states = zero_states(bb, args.batch, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, states)

    @jax.jit
    def step(variables, x, states):
        outputs, new_states, p = model.apply(variables, x, states)
        return outputs["preds"], new_states

    compiled = step.lower(variables, x, states).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per device
        ca = ca[0]
    flops = ca.get("flops", 0.0)
    # 'bytes accessed' totals operand + output traffic assuming HBM residence;
    # per-memory-space keys refine it where available.
    bytes_total = ca.get("bytes accessed", 0.0)
    by_space = {
        k: v for k, v in ca.items() if k.startswith("bytes accessed")
    }

    kind = jax.devices()[0].device_kind
    peak = PEAK_TFLOPS.get(kind, 394.0)
    bw = HBM_GBPS.get(kind, 819.0)

    compute_floor_ms = flops / (peak * 1e12) * 1e3
    memory_floor_ms = bytes_total / (bw * 1e9) * 1e3

    print(f"device: {kind}; peak {peak} TFLOP/s bf16, HBM {bw} GB/s")
    print(f"XLA cost analysis per step (batch {args.batch}):")
    print(f"  flops          : {flops / 1e9:.2f} GFLOP")
    for k in sorted(by_space):
        print(f"  {k:>30s}: {by_space[k] / 1e6:.1f} MB")
    print(f"  compute floor  : {compute_floor_ms:.3f} ms")
    print(f"  memory  floor  : {memory_floor_ms:.3f} ms")

    measured = args.measured_ms
    if measured is None:
        from sast_tpu.utils.benchmark import streaming_chunk, sync_dispatch

        run_small = streaming_chunk(model, 100)
        run_big = streaming_chunk(model, 600)
        small_c = run_small.lower(variables, x, states).compile()
        big_c = run_big.lower(variables, x, states).compile()
        sync_dispatch()
        import time

        def timed(fn, st):
            out = fn(variables, x, st)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            out = fn(variables, x, st)
            jax.block_until_ready(out)
            return time.perf_counter() - t0

        t_small = timed(small_c, states)
        t_big = timed(big_c, states)
        measured = (t_big - t_small) / 500 * 1e3

    ai = flops / max(bytes_total, 1.0)  # arithmetic intensity, FLOP/byte
    ridge = peak * 1e12 / (bw * 1e9)
    print(f"\nmeasured step   : {measured:.3f} ms")
    print(f"arithmetic intensity {ai:.1f} FLOP/B vs ridge {ridge:.0f} FLOP/B "
          f"-> {'memory' if ai < ridge else 'compute'}-bound")
    print(f"vs memory floor : {measured / memory_floor_ms:.2f}x "
          f"({bytes_total / 1e6:.0f} MB at {bw} GB/s)")
    print(f"vs compute floor: {measured / compute_floor_ms:.2f}x "
          f"(MFU {compute_floor_ms / measured * 100:.1f}%)")
    print(f"achieved HBM    : {bytes_total / 1e9 / (measured / 1e3):.0f} GB/s "
          f"({bytes_total / 1e9 / (measured / 1e3) / bw * 100:.0f}% of roof)")


if __name__ == "__main__":
    main()
