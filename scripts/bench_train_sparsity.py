"""Train-step timing sweep: Pallas sparse kernel (custom VJP) vs XLA path.

Measures a full gen1-base train step (scan BPTT over the clip, SimOTA loss,
AdamW update) on the current device at several input densities, with the
model built on the XLA masked path vs the Pallas window-skipping kernel.
The kernel's forward AND backward FLOPs scale with kept windows (custom VJP
over the same work list), so it should win at low density and lose to the
batched XLA path near-dense — this script locates the crossover for the
README (VERDICT r1 missing #4).

Usage: python scripts/bench_train_sparsity.py [--batch 8] [--seq 21]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="gen1")
    ap.add_argument("--size", default="base")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=None)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument(
        "--paths", default="xla,pallas,gather",
        help="comma-separated subset of {xla,pallas,gather}",
    )
    ap.add_argument(
        "--sparsities", default="1.0,0.99,0.9",
        help="comma-separated input sparsity levels",
    )
    ap.add_argument(
        "--no-kernels", action="store_true",
        help="disable the default Pallas kernels (fused block + stem conv)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sast_tpu.config import get_config
    from sast_tpu.data.synthetic import synthetic_train_batch
    from sast_tpu.models.backbone import zero_states
    from sast_tpu.training.steps import create_train_state, make_train_step
    from sast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import dataclasses

    cfg = get_config(args.dataset, args.size)
    if args.no_kernels:
        bb = cfg.model.backbone
        bb = dataclasses.replace(
            bb,
            stem_pallas=False,
            attention=dataclasses.replace(bb.attention, fused_block=False),
        )
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, backbone=bb)
        )
    if args.seq:
        cfg = dataclasses.replace(
            cfg, dataset=dataclasses.replace(cfg.dataset, sequence_length=args.seq)
        )

    def with_budget(c, budget):
        att = dataclasses.replace(c.model.backbone.attention, gather_budget=budget)
        bb = dataclasses.replace(c.model.backbone, attention=att)
        return dataclasses.replace(c, model=dataclasses.replace(c.model, backbone=bb))

    wanted = [p.strip() for p in args.paths.split(",") if p.strip()]
    steps = {}
    for name, use_pallas, budget in (
        ("xla", False, 0.0),
        ("pallas", True, 0.0),
        ("gather", False, 0.5),
    ):
        if name not in wanted:
            continue
        c = with_budget(cfg, budget)
        state, model = create_train_state(c, jax.random.PRNGKey(0), use_pallas=use_pallas)
        # Donate exactly like the production Trainer: without donation every
        # step allocates a fresh optimizer-state copy and the HBM allocator
        # churn serializes dispatch through the tunnel (hundreds of ms/step
        # artifacts).
        steps[name] = (
            state,
            jax.jit(make_train_step(model, c), donate_argnums=(0, 2)),
        )

    from sast_tpu.utils.benchmark import sync_dispatch

    overhead = sync_dispatch()
    print(
        f"# {args.dataset}-{args.size} train step, B={args.batch} "
        f"T={args.seq or cfg.dataset.sequence_length}, device={jax.devices()[0]}, "
        f"sync-dispatch overhead {overhead * 1e3:.1f} ms (subtracted)"
    )
    names = list(steps)
    print(f"{'sparsity':>9} {'P(mean)':>9} " + " ".join(f"{n + ' ms':>10}" for n in names))
    for sparsity in (float(x) for x in args.sparsities.split(",")):
        batch_np = synthetic_train_batch(
            cfg, np.random.RandomState(0), batch_size=args.batch,
            seq_len=args.seq, sparsity=sparsity,
        )
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        times = {}
        dt = (
            jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32
        )
        # Timing protocol (round-3 correction): the process is first flipped
        # into SYNCHRONOUS dispatch (utils/benchmark.sync_dispatch) so
        # block_until_ready actually waits — in the default async mode it is
        # a no-op and a loop like this measures the tunnel's dispatch rate
        # (round-2's 4.7-6.3 ms "train steps" were exactly that artifact;
        # the implied 2,600 TFLOP/s exceeds the chip's 394 peak). The fixed
        # ~30 ms per-dispatch overhead of sync mode is measured and
        # subtracted; it is <=15% of a real train step.
        for name in steps:
            state0, step = steps[name]
            lstm = zero_states(cfg.model.backbone, args.batch, dtype=dt)
            st = jax.tree.map(jnp.copy, state0)
            st, lstm, m = step(st, batch, lstm)  # compile + warmup
            jax.block_until_ready(m["loss"])
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    st, lstm, m = step(st, batch, lstm)
                jax.block_until_ready(m["loss"])
                best = min(best, (time.perf_counter() - t0) / args.iters)
            times[name] = (best - overhead) * 1e3
            P = float(m["P"])
            del st, lstm, m
        del batch
        # Post-cliff, fetching P is harmless; print incrementally so partial
        # sweeps survive timeouts.
        print(
            f"{sparsity:>9.3f} {P:>9.1f} "
            + " ".join(f"{times[n]:>10.2f}" for n in names)
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
