"""Coarse perf ablation of the inference step: backbone vs FPN+head vs decode.

Times each component with the cliff-aware scan-slope protocol (see
docs/DESIGN.md section 6). Loop-invariant hoisting is defeated by feeding
the running reduce back into the input with a zero-scaled perturbation.

Usage: python scripts/ablate_perf.py [--dataset gen4] [--batch 4]
"""

import argparse
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
    cfg = get_config(args.dataset, args.size)
    model = YoloXDetector(cfg.model)
    bb = cfg.model.backbone
    B = args.batch
    rng = np.random.RandomState(0)
    x = jnp.asarray(
        sparse_event_input(rng, (B, *bb.in_res_hw, bb.input_channels), args.sparsity)
    )
    states = zero_states(bb, B, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, states)
    in_stages = tuple(cfg.model.fpn.in_stages)

    # Captured backbone features for the detect-only ablations.
    feats, _, _ = jax.jit(
        lambda v, x, s: model.apply(v, x, s, method=YoloXDetector.forward_backbone)
    )(variables, x, states)
    feats = {k: feats[k] for k in in_stages}

    def chain_full(length):
        # Operands are runtime args (captured constants underreport ~16%).
        def run(variables, x, states):
            def body(carry, _):
                st, acc = carry
                xt = x + (acc * 0).astype(x.dtype)
                outputs, new_st, _ = model.apply(variables, xt, st)
                return (new_st, acc + outputs["preds"].sum(dtype=jnp.float32)), None
            (st, acc), _ = jax.lax.scan(
                body, (states, jnp.zeros((), jnp.float32)), None, length=length
            )
            return acc
        f = jax.jit(run)
        return lambda: f(variables, x, states)

    def chain_backbone(length):
        def run(variables, x, states):
            def body(carry, _):
                st, acc = carry
                xt = x + (acc * 0).astype(x.dtype)
                f, new_st, _ = model.apply(
                    variables, xt, st, method=YoloXDetector.forward_backbone
                )
                acc = acc + sum(
                    f[k].sum(dtype=jnp.float32) for k in in_stages
                )
                return (new_st, acc), None
            (st, acc), _ = jax.lax.scan(
                body, (states, jnp.zeros((), jnp.float32)), None, length=length
            )
            return acc
        fn = jax.jit(run)
        return lambda: fn(variables, x, states)

    def chain_detect(length):
        def run(variables, feats):
            def body(acc, _):
                f = {k: v + (acc * 0).astype(v.dtype) for k, v in feats.items()}
                out = model.apply(
                    variables, f, train=False, method=YoloXDetector.forward_detect
                )
                return acc + out["preds"].sum(dtype=jnp.float32), None
            acc, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.float32), None, length=length
            )
            return acc
        fn = jax.jit(run)
        return lambda: fn(variables, feats)

    overhead = sync_dispatch()
    print(
        f"# {args.dataset}-{args.size} inference ablation, B={B}, "
        f"sparsity={args.sparsity}, device={jax.devices()[0]}, "
        f"overhead {overhead * 1e3:.1f} ms"
    )
    rows = [
        ("full step (backbone+fpn+head+decode)", chain_full),
        ("backbone only", chain_backbone),
        ("fpn+head+decode only", chain_detect),
    ]
    for name, mk in rows:
        dt = slope_time(mk)
        print(f"{name:<40} {dt * 1e3:8.3f} ms")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
