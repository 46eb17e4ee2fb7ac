"""Benchmark: streaming per-frame inference FPS on one TPU chip.

Mirrors the reference FPS protocol (/root/reference/benchmark.py:33-64):
synthetic sparsity-controlled input of shape (4, 384, 640, 20) — the gen4
(1 Mpx) model resolution — with the full detector (recurrent backbone with
carried LSTM state + PAFPN + YOLOX head + decode) as the timed step, a
strict superset of the reference's backbone-only measurement.

## Why the protocol is 3-phase (this environment)

The TPU sits behind a network tunnel with a bimodal dispatch runtime
(docs/DESIGN.md §6): before the process's first device-to-host fetch,
dispatch is fire-and-forget and ``jax.block_until_ready`` does NOT wait
(measured: 0.08 ms "block" on 170 ms of queued work), so a host-dispatch
timing loop measures tunnel dispatch rate, not the chip. After one fetch,
dispatch turns synchronous per-execution with ~25 ms overhead (the "cliff";
the switch itself costs ~40 s once). Round-2's 45% README-vs-driver FPS gap
was exactly this: both numbers were tunnel-dispatch rates in different
regimes.

Phases:
1. pre-cliff: the literal reference host-dispatch loop -> ``fps_host_dispatch``
   (continuity with rounds 1-2; a tunnel number, not a chip number);
2. one scalar fetch flips the runtime into synchronous mode (timed);
3. post-cliff DEVICE-RESIDENT measurement (headline ``value``): a
   ``lax.scan`` chains L frames per dispatch with state carried on device;
   timing chunks of L=100 and L=600 and taking the slope
   (T_600 - T_100)/500 cancels the fixed per-dispatch overhead exactly, so
   the number is pure per-frame device time.

Everything that varies at deploy time (weights, input frame, carried
state) is a RUNTIME ARGUMENT of the jitted chunk, never a captured
constant: capturing x as a compile-time constant lets XLA specialize on it
and reads 0.86 ms/frame (16%) fast at the gen4 geometry, even with the
feedback perturbation (measured; capturing only the weights changes
nothing). A real stream has a fresh frame every step, so the argument-x
number is the honest one.

MFU arithmetic is printed explicitly (VERDICT r2): XLA cost-analysis
GFLOP/frame x frames/s / chip bf16 peak.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_FPS_PROXY = 200.0  # 2x assumed A100 per-frame FPS (BASELINE.md)

# Dense bf16 peak TFLOP/s per chip by device kind (public spec sheets).
_PEAK_TFLOPS = {
    "TPU v4": 275.0,
    "TPU v5 lite": 394.0,   # v5e
    "TPU v5e": 394.0,
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,   # v6e / Trillium
    "TPU v6e": 918.0,
}

L_SMALL, L_BIG = 100, 600


def _chip_peak_tflops(device):
    env = os.environ.get("SAST_TPU_PEAK_TFLOPS")
    if env:
        return float(env)
    kind = getattr(device, "device_kind", "")
    for name, peak in _PEAK_TFLOPS.items():
        if kind.startswith(name):
            return peak
    return None


def main() -> None:
    import jax
    import jax.numpy as jnp

    from sast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from sast_tpu.config import get_config
    from sast_tpu.data.synthetic import sparse_event_input
    from sast_tpu.models.backbone import zero_states
    from sast_tpu.models.detector import YoloXDetector

    cfg = get_config("gen4", "base")
    model = YoloXDetector(cfg.model)
    bb = cfg.model.backbone

    B = 4
    sparsity = 0.9
    rng = np.random.RandomState(0)
    x = jnp.asarray(
        sparse_event_input(rng, (B, *bb.in_res_hw, bb.input_channels), sparsity)
    )
    states = zero_states(bb, B, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, states)

    @jax.jit
    def step(variables, x, states):
        outputs, new_states, p = model.apply(variables, x, states)
        return outputs["preds"], new_states

    # The canonical anti-hoisting scan body (shared with compute_fps and the
    # ablation scripts — one implementation, one set of protocol rules).
    from sast_tpu.utils.benchmark import streaming_chunk

    run_small, run_big = streaming_chunk(model, L_SMALL), streaming_chunk(model, L_BIG)

    # Compile everything BEFORE any execution/fetch (AOT: no device work, so
    # phase 1 stays in the pre-cliff regime with an empty queue).
    step_c = step.lower(variables, x, states).compile()
    small_c = run_small.lower(variables, x, states).compile()
    big_c = run_big.lower(variables, x, states).compile()

    # -- phase 1: pre-cliff host-dispatch loop (reference protocol shape) ----
    # Kept short: every pre-cliff dispatch re-ships its arguments through
    # the tunnel, and ALL queued work must drain at the phase-2 fetch
    # (measured: 300+ queued full-model steps made the cliff take 6-12 min).
    # The number is a tunnel dispatch rate either way, recorded only for
    # continuity with the reference's host-side timing loop.
    warmup, iters = 10, 50
    st = states
    for _ in range(warmup):
        preds, st = step_c(variables, x, st)
    jax.block_until_ready(preds)  # no-op pre-cliff; kept for protocol parity
    t0 = time.time()
    for _ in range(iters):
        preds, st = step_c(variables, x, st)
    jax.block_until_ready(preds)
    dt_host = (time.time() - t0) / iters

    # -- phase 2: flip into synchronous dispatch (the D2H cliff, once) -------
    t0 = time.time()
    float(jnp.zeros(()) + 1.0)
    cliff_s = time.time() - t0

    # -- phase 3: device-resident chunks, overhead-cancelling slope ----------
    st, acc = small_c(variables, x, states)
    jax.block_until_ready(acc)  # waits post-cliff
    t_small, t_big = [], []
    for _ in range(4):
        t0 = time.time()
        st, acc = small_c(variables, x, st)
        jax.block_until_ready(acc)
        t_small.append(time.time() - t0)
        t0 = time.time()
        st, acc = big_c(variables, x, st)
        jax.block_until_ready(acc)
        t_big.append(time.time() - t0)
    dt_frame = (min(t_big) - min(t_small)) / (L_BIG - L_SMALL)
    # second-best slope as the stability estimate
    dt_frame_2 = (sorted(t_big)[1] - sorted(t_small)[1]) / (L_BIG - L_SMALL)
    overhead_ms = 1e3 * (min(t_small) - L_SMALL * dt_frame)
    spread_pct = 100.0 * abs(dt_frame_2 - dt_frame) / dt_frame

    fps = B / dt_frame
    fps_host = B / dt_host

    # -- MFU arithmetic ------------------------------------------------------
    from sast_tpu.utils.benchmark import compute_flops

    gflops_frame = compute_flops(cfg, batch_size=1, sparsity=sparsity)[
        "gflops_total"
    ]
    dev = jax.devices()[0]
    peak_tflops = _chip_peak_tflops(dev)
    achieved_tflops = gflops_frame * fps / 1e3
    mfu = achieved_tflops / peak_tflops if peak_tflops else None

    print(
        f"device-resident per-frame {dt_frame * 1e3:.3f} ms (slope of "
        f"L={L_SMALL}/{L_BIG} chunks; 2nd-best {dt_frame_2 * 1e3:.3f} ms, "
        f"per-dispatch overhead {overhead_ms:.1f} ms), host-dispatch "
        f"{dt_host * 1e3:.3f} ms, cliff fetch {cliff_s:.1f} s, batch {B}, "
        f"input {tuple(x.shape)}",
        file=sys.stderr,
    )
    print(
        f"MFU: {gflops_frame:.1f} GFLOP/frame x {fps:.0f} frame/s = "
        f"{achieved_tflops:.1f} TFLOP/s"
        + (
            f" / {peak_tflops:.0f} TFLOP/s peak ({dev.device_kind}) = "
            f"{100 * mfu:.1f}% MFU"
            if mfu is not None
            else f" (peak unknown for device kind {dev.device_kind!r}; set "
            "SAST_TPU_PEAK_TFLOPS)"
        ),
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "gen4_1mpx_streaming_inference_fps_b4",
                "value": round(fps, 1),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps / BASELINE_FPS_PROXY, 3),
                "value_second_best": round(B / dt_frame_2, 1),
                "slope_spread_pct": round(spread_pct, 1),
                "fps_host_dispatch": round(fps_host, 1),
                "per_dispatch_overhead_ms": round(overhead_ms, 1),
                "cliff_fetch_s": round(cliff_s, 1),
                "gflop_per_frame": round(gflops_frame, 2),
                "achieved_tflops": round(achieved_tflops, 1),
                "peak_tflops": peak_tflops,
                "mfu_pct": round(100 * mfu, 1) if mfu is not None else None,
                "device_kind": dev.device_kind,
            }
        )
    )


if __name__ == "__main__":
    main()
