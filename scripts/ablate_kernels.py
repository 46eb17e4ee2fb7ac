"""Perf ablation of the Pallas kernels: stem conv + fused block on/off.

Times the FULL inference step (backbone + FPN + head + decode) under the
four kernel combinations with the cliff-aware scan-slope protocol
(docs/DESIGN.md section 6), same anti-hoisting feedback as bench.py.
Weights/input/states are runtime arguments like bench.py (captured-constant
inputs let XLA specialize and underreport by ~16%).

Usage: python scripts/ablate_kernels.py [--dataset gen4] [--batch 4]
"""

import argparse
import dataclasses
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


from sast_tpu.utils.benchmark import slope_time  # the one canonical copy


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
    bb0 = base_cfg.model.backbone
    B = args.batch
    rng = np.random.RandomState(0)
    x = jnp.asarray(
        sparse_event_input(rng, (B, *bb0.in_res_hw, bb0.input_channels), args.sparsity)
    )

    overhead = sync_dispatch()
    print(
        f"# {args.dataset}-{args.size} kernel ablation, B={B}, "
        f"sparsity={args.sparsity}, device={jax.devices()[0]}, "
        f"overhead {overhead * 1e3:.1f} ms"
    )

    variables = None
    for stem, fused in [(False, False), (True, False), (False, True), (True, True)]:
        bb = dataclasses.replace(
            bb0,
            stem_pallas=stem,
            attention=dataclasses.replace(bb0.attention, fused_block=fused),
        )
        cfg = dataclasses.replace(
            base_cfg, model=dataclasses.replace(base_cfg.model, backbone=bb)
        )
        model = YoloXDetector(cfg.model)
        states = zero_states(bb, B, dtype=jnp.bfloat16)
        if variables is None:
            # Parameter trees are identical across dispatches by design.
            variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, states)

        def chain(length, model=model, states=states):
            def run(variables, x, states):
                def body(carry, _):
                    st, acc = carry
                    xt = x + (acc * 0).astype(x.dtype)
                    outputs, new_st, _ = model.apply(variables, xt, st)
                    return (
                        new_st,
                        acc + outputs["preds"].sum(dtype=jnp.float32),
                    ), None

                (st, acc), _ = jax.lax.scan(
                    body, (states, jnp.zeros((), jnp.float32)), None, length=length
                )
                return acc

            f = jax.jit(run)
            return lambda v=variables, xx=x, ss=states: f(v, xx, ss)

        dt = slope_time(chain)
        print(
            f"stem_pallas={int(stem)} fused_block={int(fused)}   "
            f"{dt * 1e3:8.3f} ms/step  ({B / dt:7.1f} fps)"
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
