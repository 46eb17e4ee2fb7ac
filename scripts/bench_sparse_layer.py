"""Layer-level sparse-attention crossover: XLA masked vs Pallas kernel vs
budget-gather, at controlled window density, forward and forward+backward.

Unlike the full-model sweep (bench_train_sparsity.py), density here is set
directly on the masks, so the crossover is measured independently of the
scoring module's selection behavior. Shapes default to the gen4 (1 Mpx)
stage-1 geometry — the regime the window-skipping mechanisms target.

Timing protocol: synchronous dispatch is forced first (the round-2 "fetch
clean" protocol measured the tunnel's async dispatch rate, not the chip —
block_until_ready is a no-op before the first D2H fetch on this platform),
then the layer is chained on device with lax.scan at two lengths and the
slope cancels the fixed per-dispatch overhead.

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

    # Timing protocol (round-3 correction): synchronous dispatch is forced
    # first (sync_dispatch) — in the default async mode block_until_ready is
    # a no-op and per-dispatch loops measure the tunnel, not the chip. The
    # layer is then CHAINED on device with lax.scan at two lengths; the
    # slope (T_L2 - T_L1)/(L2 - L1) cancels the fixed ~30 ms sync-dispatch
    # overhead exactly.
    from sast_tpu.utils.benchmark import sync_dispatch

    overhead = sync_dispatch()
    L1, L2 = max(2, args.iters // 5), args.iters

    def make_fn(mod, length):
        if args.grad:
            def loss(params, xin, tok, win):
                # Remat per chained layer (same dots policy as training):
                # without it the scan stores `length` full activations and
                # OOMs HBM; with it memory is O(1 layer) for every path.
                @jax.checkpoint
                def body(c, _):
                    return mod.apply({"params": params}, c, tok, win), None
                y, _ = jax.lax.scan(body, xin, None, length=length)
                return jnp.sum(y.astype(jnp.float32) * w)

            g = jax.grad(loss, argnums=(0, 1))
            return jax.jit(lambda tok, win: g(variables["params"], x, tok, win))

        def run(tok, win):
            def body(c, _):
                return mod.apply(variables, c, tok, win), None
            y, _ = jax.lax.scan(body, x, None, length=length)
            return y

        return jax.jit(run)

    fns = {
        k: (make_fn(m, L1), make_fn(m, L2)) for k, m in mods.items()
    }

    rows = []
    for density in (0.05, 0.1, 0.2, 0.4, 0.6, 0.8, 1.0):
        n_keep = max(1, int(round(density * B * N)))
        wk = np.zeros(B * N, bool)
        wk[rng.choice(B * N, n_keep, replace=False)] = True
        win = jnp.asarray(wk.reshape(B, N))
        tok = jnp.asarray(rng.rand(B, N, HW) > 0.25) & win[..., None]
        times = {}
        from sast_tpu.utils.benchmark import slope_time

        for name, (f1, f2) in fns.items():
            dt = slope_time(
                lambda L, f1=f1, f2=f2: (lambda: (f1 if L == L1 else f2)(tok, win)),
                L1, L2,
            )
            times[name] = dt * 1e3
        rows.append((density, times))

    mode = "fwd+bwd" if args.grad else "fwd"
    print(
        f"# sparse layer {mode}: B={B} N={N} hw={HW} C={C} "
        f"budget={args.budget}, device={jax.devices()[0]}, "
        f"scan-slope L={L1}/{L2}, sync overhead {overhead * 1e3:.1f} ms"
    )
    print(f"{'density':>8} {'xla ms':>9} {'pallas ms':>10} {'gather ms':>10}")
    for density, times in rows:
        print(
            f"{density:>8.2f} {times['xla']:>9.3f} {times['pallas']:>10.3f} "
            f"{times['gather']:>10.3f}"
        )


if __name__ == "__main__":
    main()
