"""Pallas TPU kernel: the overlapping 7x7/stride-4 stem convolution.

The stage-0 downsample (reference ConvDownsampling_Cf2Cl,
/root/reference/models/layers/SAST/ops.py:54-95: kernel 7, stride 4,
replicate padding, no bias) is the single hottest op of the inference step:
XLA's conv lowering takes 1.51 ms on the gen4 shape (B=4, 384x640x20 ->
96x160x64) while the arithmetic needs ~0.15 ms — with 20 input channels the
MXU contraction is 6.4x under-packed and every patch-forming strategy
expressible in XLA (im2col, space-to-depth folds, shifted concats; see
scripts/ablate_stem.py) pays 1 ms+ of HBM relayout traffic.

This kernel fuses patch formation into the matmul so patches never touch
HBM. Measured on v5e (gen4 stem shape): 0.583 ms vs 1.514 ms XLA (2.6x);
at the full-model level it cuts the gen4-base inference step from 6.22 to
5.34 ms (scripts/ablate_kernels.py, argument-passed operands).

* Outside (XLA, fused pads): replicate-pad by one full stride block (edge
  rows/cols beyond the reference's pad=3 carry zero weight and are never
  read) IN THE INPUT DTYPE — for u8 event histograms the pad writes half
  the bytes of a pre-cast bf16 pad — zero-pad channels to a multiple of 32
  so the folded 4-column blocks are exactly lane-width (4*32 = 128 —
  measured 23% faster than the 80-lane unpadded layout), view W as
  4-column blocks ``(B, H', W'/4, 4*Cpad)`` (a contiguous reshape), and
  cast integer inputs to the compute dtype at that pack boundary: XLA
  fuses the convert into the relayout copy the custom call forces anyway,
  one u8-read/bf16-write pass (round 4: 129 us vs 136 us for the bf16-all-
  the-way prologue and 163 us for a raw-u8 relayout — u8 relayouts at
  (8,128)(4,1) tiling cost MORE per byte than bf16, and in-VMEM
  u8->i32->f32->bf16 widening eats the HBM savings; both measured).
* Grid ``(B, H_out/TH)``: each program produces a (TH, W_out, Cout) output
  band. The 7-row receptive fields of a band span 4*TH + 4 input rows = its
  own block plus the first 4 rows of the next block — the halo is expressed
  by passing the SAME array twice, the second time under a narrow 4-row
  BlockSpec mapped to the next band's first row-group (no manual DMA,
  standard pipelining; +12% fetch on a stream far from the BW roof).
* Inside: rows regrouped as (TH+1, 4, W'/4, 128)-row-groups; output row r's
  tap ki reads group r + (1+ki)//4 at fixed within-group row (1+ki)%4 — a
  UNIT-stride slice over groups (Mosaic rejects strided slices). With the
  two 4-col-block shifts this yields 14 lane-aligned operands
  ``(TH*W_out, 128)``, each hitting the MXU against a pre-scattered
  ``(128, Cout)`` weight slice, accumulating in fp32. The 49 taps collapse
  into these 14 matmuls (the 7 within-block column offsets are folded into
  the weight layout; the 15th would-be slot, column offset 0 of the left
  block, lies outside the 7x7 window and carries zeros).

Training: ``stem_conv_7x4`` carries a ``jax.custom_vjp`` whose backward is
simply the VJP of the XLA reference formulation (edge-pad + conv) — exact
gradients, no Pallas backward needed; under the trainer's `dots` remat
policy the cheaper Pallas forward is also what the scan recompute replays,
so the win applies to train and eval alike.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

TH = 8          # output rows per program
FACTOR = 4      # stride
KSIZE = 7       # kernel edge
PAD = KSIZE // 2
LANE = 128


def stem_conv_xla(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Reference XLA formulation: replicate-pad + VALID conv, NHWC/HWIO."""
    xp = jnp.pad(x, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)), mode="edge")
    return lax.conv_general_dilated(
        xp,
        w.astype(x.dtype),
        window_strides=(FACTOR, FACTOR),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def stem_kernel_supported(shape) -> bool:
    """Static shape gate for the Pallas path."""
    B, H, W, Cin = shape
    return H % (FACTOR * TH) == 0 and W % FACTOR == 0 and H >= FACTOR * TH


def _band_kernel(a_ref, h_ref, w_ref, o_ref, *, th: int, c4: int, cout: int):
    # slab: the band's 4*th input rows + 4 halo rows from the next band,
    # viewed as (th+1) groups of 4 rows. Output row r's tap ki reads slab
    # row 4r + (1+ki) = group r + (1+ki)//4, within-group row (1+ki)%4 —
    # so for a fixed tap, the th operand rows are a UNIT-stride slice over
    # row groups at a fixed within-group offset.
    slab = jnp.concatenate([a_ref[0], h_ref[0]], axis=0)
    if slab.dtype != w_ref.dtype:
        # Integer fast path: the u8 event histogram is fetched raw (half the
        # HBM bytes of a pre-cast bf16 copy) and converted in VMEM. Mosaic
        # has no direct u8->bf16 cast, so widen through i32/f32.
        if jnp.issubdtype(slab.dtype, jnp.integer):
            slab = slab.astype(jnp.int32).astype(jnp.float32)
        slab = slab.astype(w_ref.dtype)
    wb_in = slab.shape[1]          # W'/4 column blocks
    wo = wb_in - 2                 # output columns
    slab4 = slab.reshape(th + 1, FACTOR, wb_in, c4)
    acc = jnp.zeros((th * wo, cout), jnp.float32)
    for ki in range(KSIZE):
        s = 1 + ki
        gs, rr = s // FACTOR, s % FACTOR
        rows = lax.slice(
            slab4, (gs, rr, 0, 0), (gs + th, rr + 1, wb_in, c4)
        ).reshape(th, wb_in, c4)
        for wshift in range(2):
            piece = lax.slice(rows, (0, wshift, 0), (th, wshift + wo, c4))
            acc = acc + jnp.dot(
                piece.reshape(th * wo, c4),
                w_ref[ki, wshift],
                preferred_element_type=jnp.float32,
            )
    o_ref[0] = acc.reshape(th, wo, cout).astype(o_ref.dtype)


def _stem_fwd_pallas(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    assert stem_kernel_supported(x.shape), x.shape
    # Compute/output dtype: the weight's for integer inputs (u8 event
    # histograms enter raw; the cast happens in VMEM inside the kernel),
    # otherwise the input's (weights were already promoted by the caller).
    integer_in = jnp.issubdtype(x.dtype, jnp.integer)
    cdt = w.dtype if integer_in else x.dtype
    Ho, Wo = H // FACTOR, W // FACTOR
    nb = Ho // TH
    R = FACTOR * TH
    Hp = (nb + 1) * R  # one spare band so the halo BlockSpec stays in bounds

    # Lane alignment: pad channels to a multiple of 32 so each folded
    # 4-column block is a whole number of 128-lane vregs.
    Cp = (Cin + 31) // 32 * 32

    # Replicate-pad: one full stride block left/top (offsets shift by +4;
    # the extra first row/col beyond the reference pad=3 has zero weight),
    # 4 right, and bottom up to Hp (rows >= H+8 are never read); then the
    # zero channel pad. XLA fuses both pads into one HBM pass.
    xp = jnp.pad(
        x,
        ((0, 0), (FACTOR, Hp - H - FACTOR), (FACTOR, FACTOR), (0, 0)),
        mode="edge",
    )
    if Cp != Cin:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, Cp - Cin)))
    c4 = FACTOR * Cp
    xp4 = xp.reshape(B, Hp, (W + 2 * FACTOR) // FACTOR, c4)
    if integer_in:
        # Cast at the pack boundary: the pads above ran in u8 (half the
        # write bytes), and XLA fuses this convert into the relayout copy
        # the custom call forces anyway (one u8-read/bf16-write pass instead
        # of a u8 relayout + in-VMEM widening, which Mosaic does ~40% slower
        # than a bf16 fetch at this shape — round-4 trace).
        xp4 = xp4.astype(cdt)

    # Weight: (7, 7, Cin, Cout) -> (7, 2, 4*Cp, Cout). Tap kj sits at
    # within-4-block column rj = (1+kj) % 4 of block shift (1+kj) // 4; a
    # leading zero slot realizes the never-read (rj=0, shift=0) position.
    wp = jnp.pad(w, ((0, 0), (1, 0), (0, Cp - Cin), (0, 0))).astype(cdt)
    wk = wp.reshape(KSIZE, 2, c4, Cout)

    wb_in = xp4.shape[2]
    grid = (B, nb)
    out = pl.pallas_call(
        functools.partial(_band_kernel, th=TH, c4=c4, cout=Cout),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, R, wb_in, c4), lambda b, i: (b, i, 0, 0)),
            # Narrow 4-row halo: block index in units of 4-row groups.
            pl.BlockSpec(
                (1, FACTOR, wb_in, c4),
                lambda b, i: (b, (i + 1) * (R // FACTOR), 0, 0),
            ),
            pl.BlockSpec((KSIZE, 2, c4, Cout), lambda b, i: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TH, Wo, Cout), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Ho, Wo, Cout), cdt),
    )(xp4, xp4, wk)
    return out


@jax.custom_vjp
def stem_conv_7x4(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Overlapping 7x7/stride-4 conv, Pallas forward + XLA-VJP backward."""
    return _stem_fwd_pallas(x, w)


def _fwd(x, w):
    return _stem_fwd_pallas(x, w), (x, w)


def _bwd(res, g):
    x, w = res
    if jnp.issubdtype(x.dtype, jnp.integer):
        # u8 fast path: the input has no tangent (float0); only dL/dw flows.
        xf = x.astype(w.dtype)
        _, vjp = jax.vjp(stem_conv_xla, xf, w)
        _, gw = vjp(g.astype(w.dtype))
        import numpy as np

        return np.zeros(x.shape, jax.dtypes.float0), gw.astype(w.dtype)
    _, vjp = jax.vjp(stem_conv_xla, x, w.astype(x.dtype))
    gx, gw = vjp(g.astype(x.dtype))
    return gx, gw.astype(w.dtype)


stem_conv_7x4.defvjp(_fwd, _bwd)
