"""Profile + time the production train step on the real TPU (VERDICT r3
item 4: training step measured but never analyzed).

Modes:
    python scripts/profile_train.py --time            # remat-policy sweep
    python scripts/profile_train.py --trace           # xprof per-op table
    python scripts/profile_train.py --dataset gen4 --time

Timing uses the slope method (two scan-chained chunk lengths) so the
~30 ms post-cliff dispatch overhead cancels; training MFU is printed from
XLA cost analysis of the compiled step.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def build(cfg, remat_policy: str, pin: bool | None = None):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from sast_tpu.data.synthetic import synthetic_train_batch
    from sast_tpu.models.backbone import zero_states
    from sast_tpu.training import steps as steps_mod

    cfg = dataclasses.replace(
        cfg, training=dataclasses.replace(cfg.training, remat_policy=remat_policy)
    )
    if pin is not None:
        attn = dataclasses.replace(
            cfg.model.backbone.attention, pin_partition_layout=pin
        )
        bb = dataclasses.replace(cfg.model.backbone, attention=attn)
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, backbone=bb)
        )
    state, model = steps_mod.create_train_state(cfg, jax.random.PRNGKey(0))
    train_step = steps_mod.make_train_step(model, cfg)

    B = cfg.training.batch_size_train
    rng = np.random.RandomState(0)
    batch_np = synthetic_train_batch(
        cfg, rng, batch_size=B, seq_len=cfg.dataset.sequence_length
    )
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    lstm = zero_states(cfg.model.backbone, B, dtype=jnp.bfloat16)
    return jax.jit(train_step, donate_argnums=(0,)), state, batch, lstm


def time_policies(cfg, policies, trace_dir=None, pin=None) -> None:
    import jax
    import jax.numpy as jnp

    from sast_tpu.utils.benchmark import sync_dispatch

    sync_dispatch()
    results = {}
    for pol in policies:
        step_fn, state, batch, lstm = build(cfg, pol, pin=pin)
        compiled = step_fn.lower(state, batch, lstm).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        mem = compiled.memory_analysis()
        temp_gb = (mem.temp_size_in_bytes / 2**30) if mem else float("nan")

        # Slope timing over two loop lengths of back-to-back dispatches:
        # each dispatch carries the fixed ~30 ms tunnel overhead, which the
        # slope (t12 - t4)/8 cancels.
        import time as _t

        st, lst = state, lstm
        st, lst, m = compiled(st, batch, lst)
        jax.block_until_ready(m["loss"])
        times = {}
        for L in (4, 12):
            best = float("inf")
            for _ in range(3):
                t0 = _t.perf_counter()
                for _ in range(L):
                    st, lst, m = compiled(st, batch, lst)
                jax.block_until_ready(m["loss"])
                best = min(best, _t.perf_counter() - t0)
            times[L] = best
        dt = (times[12] - times[4]) / 8
        tflops = flops / dt / 1e12
        dev = jax.devices()[0]
        peak = 394.0 if "v5 lite" in dev.device_kind else None
        mfu = 100 * tflops / peak if peak else float("nan")
        results[pol] = dt
        print(
            f"remat={pol:>5}: {dt * 1e3:8.1f} ms/step  "
            f"{flops / 1e12:.2f} TFLOP/step  {tflops:6.1f} TFLOP/s  "
            f"MFU {mfu:5.1f}%  temp HBM {temp_gb:.2f} GiB"
        )
        if trace_dir:
            jax.profiler.start_trace(trace_dir)
            st, lst, m = compiled(st, batch, lst)
            jax.block_until_ready(m["loss"])
            jax.profiler.stop_trace()
            print(f"trace -> {trace_dir}")
    return results


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", choices=("gen1", "gen4"), default="gen1")
    ap.add_argument("--size", default="base")
    ap.add_argument("--policies", default="dots")
    ap.add_argument("--trace", type=str, default=None,
                    help="capture an xprof trace of one step to this dir")
    ap.add_argument("--pin", type=int, choices=(0, 1), default=None,
                    help="override attention.pin_partition_layout")
    args = ap.parse_args()

    from sast_tpu.config import get_config
    from sast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = get_config(args.dataset, args.size)
    pin = None if args.pin is None else bool(args.pin)
    time_policies(cfg, args.policies.split(","), trace_dir=args.trace, pin=pin)


if __name__ == "__main__":
    main()
