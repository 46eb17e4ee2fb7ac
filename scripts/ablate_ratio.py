"""non_zero_ratio formulation shootout on TPU.

The density pyramid costs 1.10 ms of the 5.34 ms gen4-base step
(scripts/ablate_stage1.py) for a 19.6 MB uint8 read whose speed of light is
~25 us — a 45x layout pathology (uint8, C=20 minor). This script times
candidate formulations with the cliff-aware scan-slope protocol so the
winner can become the shipped op.

Usage: python scripts/ablate_ratio.py
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--hw", type=int, nargs=2, default=(384, 640))
    ap.add_argument("--channels", type=int, default=20)
    ap.add_argument("--sparsity", type=float, default=0.9)
    ap.add_argument("--L1", type=int, default=20)
    ap.add_argument("--L2", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sast_tpu.data.synthetic import sparse_event_input
    from sast_tpu.ops.sparse import non_zero_ratio
    from sast_tpu.utils.benchmark import slope_time, sync_dispatch
    from sast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    B, (H, W), C = args.batch, args.hw, args.channels
    rng = np.random.RandomState(0)
    x = jnp.asarray(sparse_event_input(rng, (B, H, W, C), args.sparsity))

    def variant_current(x):
        return non_zero_ratio(x, num_stages=4, use_pallas=False)

    def variant_bool_first(x):
        # Nonzero mask once at full res; pyramid = hierarchical OR (max of
        # {0,1}) — arithmetic on int8 masks instead of uint8 values.
        nz = (x != 0).astype(jnp.int8)
        ratios = []
        pooled = nz
        for stage in range(4):
            k = 4 if stage == 0 else 2
            b, h, w, c = pooled.shape
            pooled = pooled.reshape(b, h // k, k, w // k, k, c).max(axis=(2, 4))
            s = jnp.sum(pooled.astype(jnp.float32), axis=(1, 2))
            ratios.append(s / (pooled.shape[1] * pooled.shape[2]))
        return jnp.stack(ratios, axis=1)

    def variant_f32(x):
        # Cast up front: 4x the traffic but native fp32 layout.
        return non_zero_ratio(x.astype(jnp.float32), num_stages=4)

    def variant_bf16(x):
        return non_zero_ratio(x.astype(jnp.bfloat16), num_stages=4)

    def variant_sum_pool(x):
        # Nonzero-of-max == nonzero-of-sum for non-negative inputs (uint8
        # stacked histograms). Sum-pool is a matmul-free reduce XLA often
        # lowers better; re-derive each scale's mask from the scale-4 COUNT
        # pyramid (sums stay exact in int32).
        nz = (x != 0).astype(jnp.int32)
        b, h, w, c = nz.shape
        k = 4
        pooled = nz.reshape(b, h // k, k, w // k, k, c).sum(axis=(2, 4))
        ratios = []
        for stage in range(4):
            if stage > 0:
                b2, h2, w2, c2 = pooled.shape
                pooled = pooled.reshape(
                    b2, h2 // 2, 2, w2 // 2, 2, c2
                ).sum(axis=(2, 4))
            s = jnp.sum((pooled > 0).astype(jnp.float32), axis=(1, 2))
            ratios.append(s / (pooled.shape[1] * pooled.shape[2]))
        return jnp.stack(ratios, axis=1)

    def variant_merged_minor(x):
        # Collapse (W, C) -> W*C minor (12800 = 100 lanes of 128) before the
        # row pool, then un-collapse for the column pool at the 16x smaller
        # scale-4 map.
        b, h, w, c = x.shape
        rows = x.reshape(b, h // 4, 4, w * c).max(axis=2)  # (B, H/4, W*C)
        m = rows.reshape(b, h // 4, w // 4, 4, c).max(axis=3)  # (B, H/4, W/4, C)
        ratios = []
        pooled = m
        for stage in range(4):
            if stage > 0:
                b2, h2, w2, c2 = pooled.shape
                pooled = pooled.reshape(
                    b2, h2 // 2, 2, w2 // 2, 2, c2
                ).max(axis=(2, 4))
            s = jnp.sum((pooled != 0).astype(jnp.float32), axis=(1, 2))
            ratios.append(s / (pooled.shape[1] * pooled.shape[2]))
        return jnp.stack(ratios, axis=1)

    def variant_merged_bool(x):
        b, h, w, c = x.shape
        nz = (x.reshape(b, h, w * c) != 0).astype(jnp.int8)
        rows = nz.reshape(b, h // 4, 4, w * c).max(axis=2)
        m = rows.reshape(b, h // 4, w // 4, 4, c).max(axis=3)
        ratios = []
        pooled = m
        for stage in range(4):
            if stage > 0:
                b2, h2, w2, c2 = pooled.shape
                pooled = pooled.reshape(
                    b2, h2 // 2, 2, w2 // 2, 2, c2
                ).max(axis=(2, 4))
            s = jnp.sum(pooled.astype(jnp.float32), axis=(1, 2))
            ratios.append(s / (pooled.shape[1] * pooled.shape[2]))
        return jnp.stack(ratios, axis=1)

    def variant_pallas(x):
        from sast_tpu.ops.pallas.density import density_ratio_tpu

        return density_ratio_tpu(x)

    variants = [
        ("pallas slab kernel", variant_pallas),
        ("current (uint8 reshape-max)", variant_current),
        ("bool-first int8 pyramid", variant_bool_first),
        ("fp32 cast first", variant_f32),
        ("bf16 cast first", variant_bf16),
        ("sum-pool int32 counts", variant_sum_pool),
        ("merged W*C minor", variant_merged_minor),
        ("merged W*C minor + bool", variant_merged_bool),
    ]

    ref = np.asarray(jax.jit(variant_current)(x))

    overhead = sync_dispatch()
    print(
        f"# non_zero_ratio variants, input {tuple(x.shape)} {x.dtype}, "
        f"device={jax.devices()[0]}, overhead {overhead * 1e3:.1f} ms, "
        f"slope L={args.L1}/{args.L2}"
    )
    for name, fn in variants:
        out = np.asarray(jax.jit(fn)(x))
        ok = np.allclose(out, ref, atol=1e-6)

        def mk(length, fn=fn):
            def run(x):
                def body(acc, _):
                    r = fn(x + (acc * 0).astype(x.dtype))
                    return acc + r.sum(dtype=jnp.float32), None
                acc, _ = jax.lax.scan(
                    body, jnp.zeros((), jnp.float32), None, length=length
                )
                return acc

            f = jax.jit(run)
            return lambda: f(x)

        dt = slope_time(mk, args.L1, args.L2)
        print(f"{name:<32} {dt * 1e3:8.3f} ms   parity={'OK' if ok else 'MISMATCH'}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
