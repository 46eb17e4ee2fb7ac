"""Pallas TPU kernel: the event-density pyramid (non_zero_ratio).

The reference computes per-stage channel-wise density by max-pooling the raw
input at factors 4/8/16/32 and counting non-zeros
(/root/reference/models/detection/recurrent_backbone/sast_rnn.py:45-60).
On a (4, 384, 640, 20) uint8 input that is a 19.6 MB read whose speed of
light is ~25 us, yet every XLA formulation measured costs 0.9-1.75 ms
(scripts/ablate_ratio.py: reshape-max in uint8, bool-first int8, fp32/bf16
casts, sum-pool counts, merged-minor variants) — the 8-bit C=20-minor
layout defeats the compiler's tiling, and the op is ~20% of the whole
gen4-base inference step (scripts/ablate_stage1.py).

This kernel reads each 32-row slab once into VMEM and does the entire
pyramid there. Mosaic rejects minor-dim shape casts and strided slices, so
the pyramid is phrased entirely in layout-legal ops:

* Outside (XLA, one fused pass): channels zero-pad to 32 and (W, C) merge,
  so the (1, 32, W*32) int8 blocks split as (32, W/4, 128) — 4 columns x 32
  channels is exactly one vreg of lanes, the same alignment trick as the
  stem kernel (ops/pallas/stem_conv.py). Zero pad channels never flip a
  non-zero count.
* Grid ``(B, H/32)``: 32 input rows are exactly one scale-32 pool row, so
  each program computes a complete pyramid contribution.
* Inside: row-pool by a LEADING-dim split (8, 4, W/4, 128) + sum; all
  column pooling is 2-D matmuls against iota-built 0/1 pooling matrices,
  unrolled over the <=8 leading row indices — for non-negative inputs
  nonzero-of-max == (sum-pooled count > 0), so the max pyramid becomes a
  linear one with a threshold per scale, and column-group sums are exactly
  what the MXU does for free.
* Per-scale non-zero counts accumulate into a (1, 4, 32) fp32 output block
  across the sequential H-grid; the wrapper divides by each scale's cell
  count. Bit-equal to the repo's XLA formulation for uint8 inputs.

NORMALIZATION (fixed round 4, ADVICE r3): both this kernel and the XLA path
in ops/sparse.py use the REFERENCE normalization ``count / (C * Hp * Wp)``
(sast_rnn.py:57-60 divides by ``x_down.numel()/B``, i.e. an extra 1/C vs
plain per-channel occupancy). Rounds 1-3 normalized by ``Hp * Wp`` only
(20x the reference's r); that deviation is gone, so migrated checkpoints'
``PositiveLinear(to_controls)`` sees the exact reference scale with no
weight adjustment.

Restricted to uint8: for SIGNED representations (int8 mixed-density
stacks) the reference pools VALUES, where max{-1, 0} = 0 counts as zero —
the OR pyramid would differ; those fall back to the XLA op.

The op is non-differentiable by construction (the reference wraps it in
no_grad; ops/sparse.py applies stop_gradient), expressed here as a
custom_jvp with a zero tangent so reverse-mode AD through the backbone
never needs a pallas_call transpose rule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

ROWS = 32   # input rows per program = one scale-32 pool row
LANE = 128
CPAD = 32   # channel pad: 4 columns x 32 channels = one vreg of lanes

# Module-local indirection so tests can force interpret mode by patching
# THIS module (pytest monkeypatch on `_pallas_call`) instead of mutating the
# shared jax.experimental.pallas module (ADVICE r3).
_pallas_call = pl.pallas_call


def ratio_kernel_supported(shape, num_stages: int = 4, dtype=None) -> bool:
    """Static gate: divisible extents, <=CPAD channels, uint8 values.

    ``dtype`` is effectively required: ``None`` (unknown) returns False so a
    call site that forgets to pass it can never route signed int8 inputs to
    the kernel, where nonzero-of-sum semantics diverge from the reference's
    value-max (max{-1, 0} = 0 counts as zero) — ADVICE r3."""
    if len(shape) != 4 or num_stages != 4:
        return False
    B, H, W, C = shape
    return (
        H % ROWS == 0
        and W % ROWS == 0
        and C <= CPAD
        and dtype is not None
        and dtype == jnp.uint8
    )


def _pool_matrix(n_out: int, n_in: int) -> jnp.ndarray:
    """(n_out, n_in) 0/1 bf16: row g sums the g-th group of n_in/n_out."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n_out, n_in), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n_out, n_in), 1)
    return (c // (n_in // n_out) == r).astype(jnp.bfloat16)


def _col_extract_matrix() -> jnp.ndarray:
    """(LANE, CPAD) 0/1 bf16 summing the 4 interleaved 32-channel columns."""
    r = jax.lax.broadcasted_iota(jnp.int32, (LANE, CPAD), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (LANE, CPAD), 1)
    return (r % CPAD == c).astype(jnp.bfloat16)


def _slab_kernel(x_ref, o_ref, *, W: int):
    i = pl.program_id(1)
    x = x_ref[0]  # (ROWS, W/4 * 128) int8 (bitcast uint8; !=0 is identical)
    nz = (x != 0).astype(jnp.bfloat16)
    wg = W // 4
    # Row pool: leading-dim split (legal) + sum; counts <= 4, exact in bf16.
    rows = nz.reshape(ROWS // 4, 4, wg, LANE).sum(axis=1)  # (8, wg, 128)
    # Column pool within each 128-lane group (4 cols x 32 ch) via matmul,
    # unrolled over the 8 leading row indices (2-D matmuls only).
    q = _col_extract_matrix()
    cell = jnp.stack(
        [
            jnp.dot(rows[r], q, preferred_element_type=jnp.float32)
            for r in range(ROWS // 4)
        ]
    )  # (8, wg, 32) scale-4 cell counts
    counts = []
    cur = (cell > 0).astype(jnp.bfloat16)  # (8, wg, 32) scale-4 mask
    counts.append(jnp.sum(cur, axis=(0, 1), dtype=jnp.float32))
    for _ in range(3):
        n_rows, n_grp, _ = cur.shape
        p2 = _pool_matrix(n_grp // 2, n_grp)
        nxt = jnp.stack(
            [
                jnp.dot(
                    p2,
                    cur[r] + cur[r + 1],
                    preferred_element_type=jnp.float32,
                )
                for r in range(0, n_rows, 2)
            ]
        )  # (n_rows/2, n_grp/2, 32) pooled counts
        cur = (nxt > 0).astype(jnp.bfloat16)
        counts.append(jnp.sum(cur, axis=(0, 1), dtype=jnp.float32))
    cnt = jnp.stack(counts)  # (4, 32) fp32

    @pl.when(i == 0)
    def _init():
        o_ref[0] = cnt

    @pl.when(i > 0)
    def _acc():
        o_ref[0] = o_ref[0] + cnt


def _counts_pallas(x: jnp.ndarray) -> jnp.ndarray:
    B, H, W, C = x.shape
    assert ratio_kernel_supported(x.shape, dtype=x.dtype), (x.shape, x.dtype)
    xi = jax.lax.bitcast_convert_type(x, jnp.int8)
    if C < CPAD:
        # Zero channel pad (never flips a non-zero count); XLA fuses the
        # pad and the merge reshape into one pass over the input.
        xi = jnp.pad(xi, ((0, 0), (0, 0), (0, 0), (0, CPAD - C)))
    xi = xi.reshape(B, H, W * CPAD)
    out = _pallas_call(
        functools.partial(_slab_kernel, W=W),
        grid=(B, H // ROWS),
        in_specs=[pl.BlockSpec((1, ROWS, W * CPAD), lambda b, i: (b, i, 0))],
        out_specs=pl.BlockSpec((1, 4, CPAD), lambda b, i: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 4, CPAD), jnp.float32),
    )(xi)
    return out[:, :, :C]


@jax.custom_jvp
def density_ratio_tpu(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) uint8 -> (B, 4, C) float32 per-stage density ratios.

    Reference normalization: count / (C * Hp * Wp) — see ops/sparse.py."""
    B, H, W, C = x.shape
    counts = _counts_pallas(x)
    cells = jnp.asarray(
        [(H // k) * (W // k) * C for k in (4, 8, 16, 32)], jnp.float32
    )
    return counts / cells[None, :, None]


@density_ratio_tpu.defjvp
def _density_jvp(primals, tangents):
    (x,) = primals
    y = density_ratio_tpu(x)
    return y, jnp.zeros_like(y)
