"""Model summary table: parameters (and optional XLA-counted GFLOPs) per preset.

Parameter counts come from ``jax.eval_shape`` over ``model.init`` — no
compile, no device — so the full gen1/gen4 x tiny..large grid prints in
seconds. Pass ``--flops`` to additionally compile each forward and report
XLA cost-analysis GFLOPs at the reference benchmark sparsity (slow on CPU).

    python scripts/model_info.py [--dataset gen1 gen4] [--sizes tiny base] [--flops]
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def count_params(cfg) -> dict:
    import jax
    import jax.numpy as jnp

    from sast_tpu.models.backbone import zero_states
    from sast_tpu.models.detector import YoloXDetector

    model = YoloXDetector(cfg.model)
    bb = cfg.model.backbone
    x = jax.ShapeDtypeStruct((1, *bb.in_res_hw, bb.input_channels), jnp.float32)
    states = jax.eval_shape(lambda: zero_states(bb, 1))
    variables = jax.eval_shape(
        lambda xx, s: model.init(jax.random.PRNGKey(0), xx, s), x, states
    )
    out = {}
    for grp in ("backbone", "fpn", "head"):
        sub = {k: v for k, v in variables["params"].items() if k.startswith(grp)}
        out[grp] = sum(
            int(np.prod(l.shape)) for l in jax.tree.leaves(sub)
        )
    out["total"] = sum(
        int(np.prod(l.shape)) for l in jax.tree.leaves(variables["params"])
    )
    return out


import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--datasets", nargs="+", default=["gen1", "gen4"])
    ap.add_argument("--sizes", nargs="+",
                    default=["tiny", "small", "base", "large"])
    ap.add_argument("--flops", action="store_true",
                    help="also compile and report XLA GFLOPs (slow on CPU)")
    ap.add_argument("--sparsity", type=float, default=0.9)
    args = ap.parse_args()

    if os.environ.get("JAX_PLATFORMS"):
        import jax

        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass

    from sast_tpu.config import get_config

    hdr = f"{'preset':<12} {'res HxW':>9} {'backbone':>10} {'fpn':>10} {'head':>10} {'total':>11}"
    if args.flops:
        hdr += f" {'GFLOP/frame':>12}"
    print(hdr)
    for dsn in args.datasets:
        for size in args.sizes:
            cfg = get_config(dsn, size)
            p = count_params(cfg)
            h, w = cfg.model.backbone.in_res_hw
            row = (
                f"{dsn}-{size:<7} {f'{h}x{w}':>9} "
                f"{p['backbone']:>10,} {p['fpn']:>10,} {p['head']:>10,} "
                f"{p['total']:>11,}"
            )
            if args.flops:
                from sast_tpu.utils.benchmark import compute_flops

                g = compute_flops(cfg, batch_size=1, sparsity=args.sparsity)
                row += f" {g['gflops_total']:>12.1f}"
            print(row, flush=True)


if __name__ == "__main__":
    main()
