"""Ablate partition-layout pinning for the streaming inference step.

The round-4 xprof trace (docs/DESIGN.md section 6d) shows the two largest
remaining relayout copies are the stage-0 window/grid partition transposes
surfacing on the 3C-wide qkv product (2 x 180 us/step, 23.6 MB each at
gen4-base b4). ``AttentionConfig.pin_partition_layout`` places an
``optimization_barrier`` right after each partition so the physical
transpose lands on the C-wide activation (3x fewer bytes) — IF XLA's layout
assignment then picks the attention-preferred layout for the barrier value.
This script measures the full streaming step both ways with the
cliff-aware scan-slope protocol to find out.

Run on the real TPU: python scripts/ablate_layout_pin.py [--dataset gen4]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sast_tpu.utils.benchmark import slope_time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="gen4")
    ap.add_argument("--size", default="base")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--sparsity", type=float, default=0.9)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sast_tpu.config import get_config
    from sast_tpu.data.synthetic import sparse_event_input
    from sast_tpu.models.backbone import zero_states
    from sast_tpu.models.detector import YoloXDetector
    from sast_tpu.utils.benchmark import sync_dispatch
    from sast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    base_cfg = get_config(args.dataset, args.size)
    bb = base_cfg.model.backbone
    B = args.batch
    rng = np.random.RandomState(0)
    x_host = sparse_event_input(
        rng, (B, *bb.in_res_hw, bb.input_channels), args.sparsity
    )

    sync_dispatch()
    results = {}
    for pin in (False, True):
        attn = dataclasses.replace(
            base_cfg.model.backbone.attention, pin_partition_layout=pin
        )
        backbone = dataclasses.replace(base_cfg.model.backbone, attention=attn)
        mdl_cfg = dataclasses.replace(base_cfg.model, backbone=backbone)
        model = YoloXDetector(mdl_cfg)

        x = jnp.asarray(x_host)
        states = zero_states(backbone, B, dtype=jnp.bfloat16)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, states)

        def mk(length, model=model, variables=variables, x=x, states=states):
            def run(variables, x, states):
                def body(carry, _):
                    st, acc = carry
                    # anti-hoisting: feed the running reduce back in at 0 gain
                    xi = x + (acc * 0.0).astype(x.dtype)
                    out, st, _ = model.apply(variables, xi, st)
                    return (st, jnp.sum(out["preds"][..., 0])), None

                (st, acc), _ = jax.lax.scan(
                    body, (states, jnp.zeros(())), None, length=length
                )
                return acc

            fn = jax.jit(run)
            return lambda: fn(variables, x, states)

        dt = slope_time(mk)
        per_frame_ms = dt * 1e3 / B
        fps = B / dt
        results[pin] = dt * 1e3
        print(
            f"pin_partition_layout={pin}: step {dt * 1e3:.3f} ms "
            f"({per_frame_ms:.3f} ms/frame, {fps:.1f} fps)",
            flush=True,
        )

    delta = results[False] - results[True]
    print(
        f"delta: {delta * 1e3:+.0f} us/step "
        f"({100 * delta / results[False]:+.1f}% of the unpinned step)"
    )


if __name__ == "__main__":
    main()
