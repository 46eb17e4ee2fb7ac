"""Per-stage backbone cost: time stage prefixes (1..4 stages) and diff.

Builds truncated BackboneConfigs (first k stages) and times RNNDetector
with the cliff-aware scan-slope protocol; consecutive differences give the
per-stage cost. The running reduce is fed back into the input with a
zero-scaled perturbation so no per-frame work is loop-invariant.

Usage: python scripts/ablate_backbone.py [--dataset gen4]
"""

import argparse
import dataclasses
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="gen4")
    ap.add_argument("--size", default="base")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--sparsity", type=float, default=0.9)
    ap.add_argument("--L1", type=int, default=10)
    ap.add_argument("--L2", type=int, default=60)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sast_tpu.config import get_config
    from sast_tpu.data.synthetic import sparse_event_input
    from sast_tpu.models.backbone import SASTBackbone, zero_states
    from sast_tpu.utils.benchmark import sync_dispatch
    from sast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = get_config(args.dataset, args.size)
    bb_full = cfg.model.backbone
    B = args.batch
    rng = np.random.RandomState(0)
    x = jnp.asarray(
        sparse_event_input(
            rng, (B, *bb_full.in_res_hw, bb_full.input_channels), args.sparsity
        )
    )

    overhead = sync_dispatch()
    print(
        f"# {args.dataset}-{args.size} backbone stage-prefix ablation, B={B}, "
        f"device={jax.devices()[0]}, overhead {overhead * 1e3:.1f} ms, "
        f"slope L={args.L1}/{args.L2}"
    )

    prev = 0.0
    for k in range(1, bb_full.num_stages + 1):
        bb = dataclasses.replace(
            bb_full,
            dim_multiplier=bb_full.dim_multiplier[:k],
            num_blocks=bb_full.num_blocks[:k],
        )
        model = SASTBackbone(cfg=bb, dtype=jnp.bfloat16)
        states = zero_states(bb, B, dtype=jnp.bfloat16)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, states)

        def chain(length, model=model, states=states, variables=variables):
            # Operands are runtime arguments (captured constants let XLA
            # specialize and underreport ~16%; see docs/DESIGN.md section 6).
            def run(variables, x, states):
                def body(carry, _):
                    st, acc = carry
                    xt = x + (acc * 0).astype(x.dtype)
                    f, new_st, _ = model.apply(variables, xt, st)
                    acc = acc + sum(
                        v.sum(dtype=jnp.float32) for v in f.values()
                    )
                    return (new_st, acc), None

                (st, acc), _ = jax.lax.scan(
                    body, (states, jnp.zeros((), jnp.float32)), None,
                    length=length,
                )
                return acc

            f = jax.jit(run)
            return lambda: f(variables, x, states)

        from sast_tpu.utils.benchmark import slope_time

        dt = slope_time(chain, args.L1, args.L2)
        print(
            f"stages 1..{k}: {dt * 1e3:8.3f} ms  (stage {k} delta "
            f"{(dt - prev) * 1e3:+7.3f} ms)"
        )
        sys.stdout.flush()
        prev = dt


if __name__ == "__main__":
    main()
