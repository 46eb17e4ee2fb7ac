"""Ablate qkv layout strategies for the masked window attention.

The round-4 xprof trace (scripts/profile_inference.py) shows the biggest
single relayout cost in the gen4 streaming step is the 6-D qkv
reshape-transpose inside MaskedSparseAttention.block_math: XLA materializes
a physical copy of bf16[B, N, hw, 3, heads, dim_head] to put the head axis
major for the batched attention matmuls (~180 us/frame per attention at
stage 1, 2 attentions per block). This script times isolated variants of
the SAME masked attention math at the shipped stage geometries to pick the
copy-free formulation.

Variants:
  v0_current   qkv matmul -> reshape (...,3,h,d) -> slice -> bnqhd einsums
  v1_split3    3 separate (C,C) matmuls -> (...,h,d) -> bnqhd einsums
  v2_minor     qkv matmul -> minor split (...,3h,d) -> contiguous slices
  v3_hminor    v2 slices + heads-minor logits bnqkh (softmax axis=-2)
  v4_perhead   per-head 2-D weight slices, python-unrolled head loop

Run on the real TPU: python scripts/ablate_attention_layout.py
"""

from __future__ import annotations

import sys
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

MASK_VALUE = -1e4


def make_variant(variant: str, num_heads: int, dim_head: int):
    import jax
    import jax.numpy as jnp

    C = num_heads * dim_head
    scale = dim_head ** -0.5

    def attn(z, tk, w_qkv, w_proj):
        """Masked window attention core (no LN/MLP: isolate the qkv path).

        z: (B, N, hw, C) bf16; tk: (B, N, hw) bool.
        """
        B, N, hw, _ = z.shape
        key_mask = tk[:, :, None, None, :]

        if variant == "v0_current":
            qkv = z @ w_qkv
            qkv = qkv.reshape(B, N, hw, 3, num_heads, dim_head)
            q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
            logits = jnp.einsum("bnqhd,bnkhd->bnhqk", q, k) * scale
            logits = jnp.where(key_mask, logits, MASK_VALUE)
            a = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum("bnhqk,bnkhd->bnqhd", a, v).reshape(B, N, hw, C)
        elif variant == "v1_split3":
            wq, wk, wv = jnp.split(w_qkv, 3, axis=1)
            q = (z @ wq).reshape(B, N, hw, num_heads, dim_head)
            k = (z @ wk).reshape(B, N, hw, num_heads, dim_head)
            v = (z @ wv).reshape(B, N, hw, num_heads, dim_head)
            logits = jnp.einsum("bnqhd,bnkhd->bnhqk", q, k) * scale
            logits = jnp.where(key_mask, logits, MASK_VALUE)
            a = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum("bnhqk,bnkhd->bnqhd", a, v).reshape(B, N, hw, C)
        elif variant == "v2_minor":
            qkv = (z @ w_qkv).reshape(B, N, hw, 3 * num_heads, dim_head)
            q = qkv[:, :, :, 0:num_heads]
            k = qkv[:, :, :, num_heads : 2 * num_heads]
            v = qkv[:, :, :, 2 * num_heads :]
            logits = jnp.einsum("bnqhd,bnkhd->bnhqk", q, k) * scale
            logits = jnp.where(key_mask, logits, MASK_VALUE)
            a = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum("bnhqk,bnkhd->bnqhd", a, v).reshape(B, N, hw, C)
        elif variant == "v3_hminor":
            qkv = (z @ w_qkv).reshape(B, N, hw, 3 * num_heads, dim_head)
            q = qkv[:, :, :, 0:num_heads]
            k = qkv[:, :, :, num_heads : 2 * num_heads]
            v = qkv[:, :, :, 2 * num_heads :]
            # heads stay minor end-to-end: logits (B, N, q, k, h)
            logits = jnp.einsum("bnqhd,bnkhd->bnqkh", q, k) * scale
            km = tk[:, :, None, :, None]
            logits = jnp.where(km, logits, MASK_VALUE)
            a = jax.nn.softmax(logits, axis=-2)
            out = jnp.einsum("bnqkh,bnkhd->bnqhd", a, v).reshape(B, N, hw, C)
        elif variant == "v4_perhead":
            qkv = z @ w_qkv  # (B, N, hw, 3C)
            outs = []
            for h in range(num_heads):
                q = qkv[..., h * dim_head : (h + 1) * dim_head]
                k = qkv[..., C + h * dim_head : C + (h + 1) * dim_head]
                v = qkv[..., 2 * C + h * dim_head : 2 * C + (h + 1) * dim_head]
                logits = jnp.einsum("bnqd,bnkd->bnqk", q, k) * scale
                logits = jnp.where(tk[:, :, None, :], logits, MASK_VALUE)
                a = jax.nn.softmax(logits, axis=-1)
                outs.append(jnp.einsum("bnqk,bnkd->bnqd", a, v))
            out = jnp.concatenate(outs, axis=-1)
        else:
            raise ValueError(variant)
        return out @ w_proj

    return attn


VARIANTS = ["v0_current", "v1_split3", "v2_minor", "v3_hminor", "v4_perhead"]

# (name, B, N, hw, heads, dim_head): gen4-base stage geometries
GEOMS = [
    ("gen4 stage1", 4, 256, 60, 2, 32),
    ("gen4 stage2", 4, 64, 60, 4, 32),
    ("gen4 stage3", 4, 16, 60, 8, 32),
]


def main() -> None:
    import jax
    import jax.numpy as jnp

    from sast_tpu.utils.benchmark import slope_time, sync_dispatch
    from sast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.RandomState(0)
    sync_dispatch()

    print(f"{'geometry':>12} " + " ".join(f"{v:>12}" for v in VARIANTS)
          + "   (us/iter, slope)")
    for name, B, N, hw, heads, dim_head in GEOMS:
        C = heads * dim_head
        z = jnp.asarray(rng.randn(B, N, hw, C), jnp.bfloat16)
        tk = jnp.asarray(rng.rand(B, N, hw) > 0.3)
        w_qkv = jnp.asarray(rng.randn(C, 3 * C) * 0.05, jnp.bfloat16)
        w_proj = jnp.asarray(rng.randn(C, C) * 0.05, jnp.bfloat16)

        ref_out = None
        row = []
        for v in VARIANTS:
            fn = make_variant(v, heads, dim_head)

            # numerical equivalence vs v0 first
            out = jax.jit(fn)(z, tk, w_qkv, w_proj)
            if ref_out is None:
                ref_out = out
            else:
                np.testing.assert_allclose(
                    np.asarray(out, np.float32),
                    np.asarray(ref_out, np.float32),
                    rtol=0.05, atol=0.05,
                )

            def chunk(L, fn=fn):
                @jax.jit
                def run(z, tk, w_qkv, w_proj):
                    def body(carry, _):
                        acc = carry
                        zi = z + (acc * 0).astype(z.dtype)
                        o = fn(zi, tk, w_qkv, w_proj)
                        return acc + o.sum(dtype=jnp.float32), None

                    acc, _ = jax.lax.scan(
                        body, jnp.zeros((), jnp.float32), None, length=L
                    )
                    return acc

                run_c = run.lower(z, tk, w_qkv, w_proj).compile()
                return lambda: run_c(z, tk, w_qkv, w_proj)

            dt = slope_time(chunk, L1=50, L2=250)
            row.append(dt * 1e6)
        best = min(row)
        print(f"{name:>12} " + " ".join(
            f"{t:12.1f}" for t in row
        ) + f"   best={VARIANTS[row.index(best)]}")


if __name__ == "__main__":
    main()
