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


def sync_dispatch() -> float:
    """Flip the runtime into synchronous dispatch and measure its overhead.

    On this environment's network-attached TPU, the process starts in a
    fire-and-forget dispatch mode where ``jax.block_until_ready`` does NOT
    wait (measured: 0.08 ms "block" on 170 ms of queued device work) — any
    timing loop in that mode records the tunnel's dispatch rate, not device
    time. One device-to-host fetch permanently switches to synchronous
    per-execution dispatch (the "cliff", ~10-120 s once), after which
    block_until_ready is real but every dispatch carries a fixed ~30 ms
    round-trip overhead.

    Call this BEFORE timing; subtract the returned per-dispatch overhead
    (seconds), or amortize it by chaining work with ``lax.scan``.
    """
    import jax
    import jax.numpy as jnp

    float(jnp.zeros(()) + 1.0)  # the mode-switch fetch
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128))
    jax.block_until_ready(f(x))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def streaming_chunk(model, length: int):
    """jitted ``run(variables, x, states)`` chaining ``length`` full-detector
    frames on device with ``lax.scan``.

    This is THE canonical timed body (bench.py and every ablation script
    must build on it, not re-derive it): the ``x + (acc * 0)`` feedback makes
    each frame's input depend on the previous iteration so XLA cannot hoist
    per-frame input work (stem conv, density pyramid) out of the scan the
    way it can with a loop-invariant x (measured: constant-x underreports by
    ~1.8x at the gen4 geometry). The integer add preserves the uint8 input
    dtype (a float feedback multiply would promote the whole input pipeline
    to fp32, 4x its HBM traffic). The cheap fp32 reduce keeps every
    per-frame head live (no DCE) without materializing ``length`` prediction
    tensors. Weights/input/state stay RUNTIME ARGUMENTS — capturing them as
    compile-time constants lets XLA specialize on values (~16% fast).
    """
    import jax
    import jax.numpy as jnp

    def run(variables, x, states):
        def body(carry, _):
            st, acc = carry
            xt = x + (acc * 0).astype(x.dtype)
            outputs, new_st, _ = model.apply(variables, xt, st)
            acc = acc + outputs["preds"].sum(dtype=jnp.float32)
            return (new_st, acc), None

        (st, acc), _ = jax.lax.scan(
            body, (states, jnp.zeros((), jnp.float32)), None, length=length
        )
        return st, acc

    return jax.jit(run)


def slope_time(make_fn, L1: int = 20, L2: int = 100, blocks: int = 3) -> float:
    """Cliff-aware per-iteration device time, in seconds.

    ``make_fn(L)`` must return a ZERO-ARG callable that executes L chained
    iterations on device (see ``streaming_chunk``). Each chunk runs once
    un-timed (warmup), then ``blocks`` timed repetitions; the slope
    ``(best_L2 - best_L1) / (L2 - L1)`` cancels the fixed per-dispatch
    tunnel overhead exactly. Call ``sync_dispatch()`` FIRST — in the
    pre-cliff fire-and-forget mode ``block_until_ready`` does not wait and
    any timing here would record the tunnel dispatch rate, not the chip.
    """
    import jax

    assert 0 < L1 < L2, f"need 0 < L1 < L2 for a valid slope, got {(L1, L2)}"
    f1, f2 = make_fn(L1), make_fn(L2)
    jax.block_until_ready(f1())
    jax.block_until_ready(f2())
    b1 = b2 = float("inf")
    for _ in range(blocks):
        t0 = time.perf_counter()
        jax.block_until_ready(f1())
        b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(f2())
        b2 = min(b2, time.perf_counter() - t0)
    return (b2 - b1) / (L2 - L1)


def _build_model_and_inputs(cfg, batch_size, sparsity, seed):
    """Shared bench setup: model + sparse input + zero states + init."""
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
    return model, variables, x, states


def compute_fps(
    cfg: ExperimentConfig,
    batch_size: int = 4,
    sparsity: float = 0.9,
    iters: int = 300,
    warmup: int = 50,  # noqa: ARG001 - warmup is one full un-timed chunk (slope_time)
    seed: int = 0,
) -> Dict[str, float]:
    """Streaming per-frame inference FPS with carried recurrent state.

    Cliff-aware device-resident protocol (``sync_dispatch`` + ``slope_time``
    over ``streaming_chunk``s of ``max(10, iters//6)`` and ``iters`` frames);
    the slope cancels the fixed per-dispatch overhead, yielding pure
    per-frame device time. ``warmup`` is subsumed by ``slope_time``'s
    un-timed first execution of each chunk.
    """
    import jax

    model, variables, x, states = _build_model_and_inputs(
        cfg, batch_size, sparsity, seed
    )

    L1 = max(10, iters // 6)
    L2 = max(iters, 2 * L1)

    def make_fn(length):
        compiled = (
            streaming_chunk(model, length).lower(variables, x, states).compile()
        )
        return lambda: compiled(variables, x, states)

    overhead = sync_dispatch()
    dt = slope_time(make_fn, L1, L2)
    return {
        "fps": batch_size / dt,
        "step_ms": dt * 1000.0,
        "latency_per_frame_ms": dt * 1000.0,  # one step = one frame per lane
        "batch_size": batch_size,
        "sparsity": sparsity,
        "dispatch_overhead_ms": overhead * 1000.0,
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

    model, variables, x, states = _build_model_and_inputs(
        cfg, batch_size, sparsity, seed
    )

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


def transformer_macs_from_telemetry(cfg, telemetry) -> Dict[str, float]:
    """Reference-style per-sample transformer GFLOPs from selection telemetry.

    The reference's sparsity-FLOPs sweep (/root/reference/benchmark.py:97-117)
    runs fvcore over the model per sample and reports ``sum - conv``: the
    transformer matmul MACs at the *gathered* shapes — per attention, the M
    kept windows padded to Kmax tokens. Our masked formulation executes
    statically, so the equivalent number is reconstructed analytically from
    the sown (M, Kmax, T_eff) stats (models/sast.py SASTBlock): per
    attention with T = M * Kmax gathered tokens, C channels, I gated-MLP
    inner dim —

        qkv    T * C * 3C
        logits M * Kmax^2 * C      (sum over heads of Kmax^2 * dim_head)
        att*v  M * Kmax^2 * C
        proj   T * C * C
        glu    T * C * 2I ; out  T * I * C

    plus the first block's full-layout scoring matmul N * hw * C^2. MAC
    convention (1 multiply-add = 1 FLOP) to match fvcore. Batch must be 1.

    ``telemetry``: the mutable 'telemetry' collection from model.apply.
    Returns {'gflops_transformer', 'gflops_stage{i}', 't_eff_total'}.
    """
    bb = cfg.model.backbone
    hw = bb.attention.partition_size[0] * bb.attention.partition_size[1]
    out: Dict[str, float] = {}
    total = 0.0
    t_eff_total = 0
    bb_tel = telemetry
    for key in ("backbone",):  # detector nests the backbone collection
        if key in bb_tel:
            bb_tel = bb_tel[key]
    for i, C in enumerate(bb.stage_dims):
        inner = max(32, (C * bb.attention.mlp_ratio * 2 // 3) // 32 * 32)
        stage_tel = bb_tel.get(f"stage{i}", {})
        stage_macs = 0.0
        for j in range(bb.num_blocks[i]):
            blk = stage_tel.get(f"block{j}", {})
            for sel_name in ("sel_win", "sel_grid"):
                if sel_name not in blk:
                    continue
                stats = blk[sel_name][-1]  # (B, 3) int32; B == 1
                m, kmax, t_eff = (int(v) for v in np.asarray(stats)[0])
                t_pad = m * kmax
                stage_macs += (
                    t_pad * C * 3 * C          # qkv
                    + 2 * m * kmax * kmax * C  # logits + att*v
                    + t_pad * C * C            # proj
                    + t_pad * C * 2 * inner    # glu
                    + t_pad * inner * C        # out proj
                )
                t_eff_total += t_eff
            if j == 0 and blk:
                # scoring module on the full window layout
                n_windows = None
                # N = stage tokens / hw; derive from model resolution
                h = bb.in_res_hw[0] // bb.stage_strides[i]
                w = bb.in_res_hw[1] // bb.stage_strides[i]
                n_windows = (h * w) // hw
                stage_macs += n_windows * hw * C * C
        out[f"gflops_stage{i + 1}"] = stage_macs / 1e9
        total += stage_macs
    out["gflops_transformer"] = total / 1e9
    out["t_eff_total"] = float(t_eff_total)
    return out
