"""Layer-level sparse-attention crossover: XLA masked vs Pallas kernel vs
budget-gather, at controlled window density, forward and forward+backward.

Unlike the full-model sweep (bench_train_sparsity.py), density here is set
directly on the masks, so the crossover is measured independently of the
scoring module's selection behavior. Shapes default to the gen4 (1 Mpx)
stage-1 geometry — the regime the window-skipping mechanisms target.

CRITICAL for this environment: nothing is fetched from device during timing
(a single D2H transfer permanently degrades dispatch ~60x through the
remote-TPU tunnel); results print after all cells complete.

Usage: python scripts/bench_sparse_layer.py [--grad] [--iters 50]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=4)
    ap.add_argument("--N", type=int, default=256, help="windows per sample")
    ap.add_argument("--hw", type=int, default=60, help="tokens per window")
    ap.add_argument("--C", type=int, default=128)
    ap.add_argument("--dim-head", type=int, default=32)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--grad", action="store_true", help="time fwd+bwd")
    ap.add_argument("--budget", type=float, default=0.5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sast_tpu.models.sast import MaskedSparseAttention
    from sast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    B, N, HW, C = args.B, args.N, args.hw, args.C
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, N, HW, C) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.randn(B, N, HW, C), jnp.bfloat16)

    mods = {
        "xla": MaskedSparseAttention(dim=C, dim_head=args.dim_head),
        "pallas": MaskedSparseAttention(
            dim=C, dim_head=args.dim_head, use_pallas=True, pallas_threshold=1.0
        ),
        "gather": MaskedSparseAttention(
            dim=C, dim_head=args.dim_head, gather_budget=args.budget
        ),
    }
    variables = mods["xla"].init(
        jax.random.PRNGKey(0), x, jnp.ones((B, N, HW), bool),
        jnp.ones((B, N), bool),
    )

    def make_fn(mod):
        if args.grad:
            def loss(params, xin, tok, win):
                return jnp.sum(
                    mod.apply({"params": params}, xin, tok, win).astype(jnp.float32) * w
                )
            g = jax.grad(loss, argnums=(0, 1))
            return jax.jit(lambda tok, win: g(variables["params"], x, tok, win))
        return jax.jit(
            lambda tok, win: mod.apply(variables, x, tok, win)
        )

    fns = {k: make_fn(m) for k, m in mods.items()}

    rows = []
    for density in (0.05, 0.1, 0.2, 0.4, 0.6, 0.8, 1.0):
        n_keep = max(1, int(round(density * B * N)))
        wk = np.zeros(B * N, bool)
        wk[rng.choice(B * N, n_keep, replace=False)] = True
        win = jnp.asarray(wk.reshape(B, N))
        tok = jnp.asarray(rng.rand(B, N, HW) > 0.25) & win[..., None]
        times = {}
        for name, fn in fns.items():
            out = fn(tok, win)  # compile + warmup
            jax.block_until_ready(out)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    out = fn(tok, win)
                jax.block_until_ready(out)
                best = min(best, (time.perf_counter() - t0) / args.iters)
            times[name] = best * 1e3
        rows.append((density, times))

    mode = "fwd+bwd" if args.grad else "fwd"
    print(
        f"# sparse layer {mode}: B={B} N={N} hw={HW} C={C} "
        f"budget={args.budget}, device={jax.devices()[0]}"
    )
    print(f"{'density':>8} {'xla ms':>9} {'pallas ms':>10} {'gather ms':>10}")
    for density, times in rows:
        print(
            f"{density:>8.2f} {times['xla']:>9.3f} {times['pallas']:>10.3f} "
            f"{times['gather']:>10.3f}"
        )


if __name__ == "__main__":
    main()
