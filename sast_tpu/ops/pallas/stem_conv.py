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
DENS_CPAD = 32  # density-fused channel pad (4 cols x 32 ch = one vreg)

# Module-local indirection so tests can force interpret mode by patching
# THIS module (pytest monkeypatch on `_pallas_call`) instead of mutating the
# shared jax.experimental.pallas module (ADVICE r3 pattern, ops/pallas/density.py).
_pallas_call = pl.pallas_call


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


def stem_density_fusable(shape, dtype=None) -> bool:
    """Static gate for the fused stem+density variant.

    The density pyramid (ops/pallas/density.py semantics: 4 scales of
    max-pool + non-zero count, reference sast_rnn.py:45-60) can ride the
    stem kernel's input fetch when: the stem geometry holds; H and W divide
    32 (each program's 32 raw rows are one scale-32 pool row; the 4-column
    blocks pool down 3x); channels fit one 32-lane group; and values are
    uint8 (0..255 is exact in bf16, so nonzero-of-converted == nonzero-of-
    raw; signed representations pool VALUES in the reference, where
    max{-1, 0} = 0 counts as zero — those must use the XLA path).
    ``dtype`` is effectively required: None returns False."""
    if not stem_kernel_supported(shape):
        return False
    B, H, W, Cin = shape
    return (
        H % 32 == 0
        and W % 32 == 0
        and Cin <= DENS_CPAD
        and dtype is not None
        and dtype == jnp.uint8
    )


def stem_raw_supported(shape, dtype=None) -> bool:
    """Static gate for the raw-fetch stem variant (``stem_conv_raw_7x4``).

    The raw variant reads the NATIVE ``(B, H, W, C)`` uint8 tensor (viewed as
    ``(B, H, W/4, 4*C)``, a contiguous reshape) with NO prologue passes at
    all: edge replication, the u8->compute-dtype widening, and the density
    pyramid all happen in VMEM. Requirements: uint8 input (exact in bf16,
    and the integer widening chain is only worth it when the fetch halves),
    stem geometry, H and W divisible by 32 (band-local density pyramid +
    three column halvings), and the 4-column fold fitting one 128-lane
    register (4*C <= 128)."""
    if dtype is None or dtype != jnp.uint8:
        return False
    B, H, W, Cin = shape
    return (
        stem_kernel_supported(shape)
        and H % 32 == 0
        and W % 32 == 0
        and FACTOR * Cin <= LANE
    )


def _left_replicate_matrix(c: int, dtype) -> jnp.ndarray:
    """(4c, 4c) 0/1 matrix M with ``(x_block0 @ M)[l'] = x[ch = l' % c]``:
    builds the left replicate-pad block (4 copies of raw column 0) from raw
    block 0's lanes without lane shuffles — Mosaic-friendly as one matmul."""
    c4 = FACTOR * c
    r = jax.lax.broadcasted_iota(jnp.int32, (c4, c4), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (c4, c4), 1)
    return (r == col % c).astype(dtype)


def _raw_extract_matrix(c: int) -> jnp.ndarray:
    """(4c, DENS_CPAD) 0/1 bf16 summing the 4 interleaved c-channel columns
    of a raw folded block into per-channel counts (channels >= c are 0)."""
    c4 = FACTOR * c
    r = jax.lax.broadcasted_iota(jnp.int32, (c4, DENS_CPAD), 0)
    ch = jax.lax.broadcasted_iota(jnp.int32, (c4, DENS_CPAD), 1)
    return ((r % c == ch) & (ch < c)).astype(jnp.bfloat16)


def _density_accumulate_raw(slab4, d_ref, *, th: int, c: int) -> None:
    """Density pyramid over the band's raw rows in the RAW (unpadded) block
    layout: slab groups 1..th are the raw rows, raw 4-col block j is slab
    block j (no pad blocks), so every pool level is a plain 2x halving."""
    from sast_tpu.ops.pallas.density import _pool_matrix

    i = pl.program_id(1)
    _, _, wb, c4 = slab4.shape
    d = lax.slice(slab4, (1, 0, 0, 0), (th + 1, FACTOR, wb, c4))
    nz = (d != 0).astype(jnp.bfloat16)
    rows = nz.sum(axis=1)  # (th, wb, 4c) row-pooled counts <= 4, exact
    q = _raw_extract_matrix(c)
    cell = jnp.stack(
        [
            jnp.dot(rows[r], q, preferred_element_type=jnp.float32)
            for r in range(th)
        ]
    )  # (th, wb, 32) scale-4 cell counts
    cur = (cell > 0).astype(jnp.bfloat16)
    counts = [jnp.sum(cur, axis=(0, 1), dtype=jnp.float32)]
    for _ in range(3):
        n_rows = cur.shape[0]
        p2 = _pool_matrix(cur.shape[1] // 2, cur.shape[1])
        nxt = jnp.stack(
            [
                jnp.dot(
                    p2,
                    cur[r] + cur[r + 1],
                    preferred_element_type=jnp.float32,
                )
                for r in range(0, n_rows, 2)
            ]
        )
        cur = (nxt > 0).astype(jnp.bfloat16)
        counts.append(jnp.sum(cur, axis=(0, 1), dtype=jnp.float32))
    cnt = jnp.stack(counts)  # (4, 32) fp32

    @pl.when(i == 0)
    def _init():
        d_ref[0] = cnt

    @pl.when(i > 0)
    def _acc():
        d_ref[0] = d_ref[0] + cnt


def _raw_band_kernel(m_ref, h_ref, w_ref, o_ref, *dens_ref, th: int, c: int, cout: int):
    """Band kernel over the NATIVE u8 layout: no prologue pads exist, so the
    top edge (band 0), the 4-row upper halo (bands > 0) and the left edge
    replicate block are all constructed in VMEM. Tap indexing is identical
    to _band_kernel once the slab is assembled: slab group 0 is raw row
    group 8i-1 (or replicated row 0), groups 1..th are the band's raw rows.
    """
    i = pl.program_id(1)
    c4 = FACTOR * c
    main = m_ref[0]  # (R, wb, 4c) u8: the band's 32 raw rows
    halo = h_ref[0]  # (4, wb, 4c) u8: raw group 8i-1 (group 0 when i == 0)
    wb = main.shape[1]
    # Band 0's upper halo is the top edge: 4 replicas of raw row 0. (Only
    # rows 1..3 of the group are ever read — the reference pad is 3.)
    top = jnp.where(
        i == 0, jnp.broadcast_to(main[0:1], halo.shape), halo
    )
    slab = jnp.concatenate([top, main], axis=0)  # (R + 4, wb, 4c) u8
    # Widen in VMEM: u8 0..255 is exact in bf16 (Mosaic has no direct
    # u8->bf16 cast; go through i32/f32).
    slab = slab.astype(jnp.int32).astype(jnp.float32).astype(w_ref.dtype)
    slab4 = slab.reshape(th + 1, FACTOR, wb, c4)
    if dens_ref:
        _density_accumulate_raw(slab4, dens_ref[0], th=th, c=c)
    rep = _left_replicate_matrix(c, w_ref.dtype)
    acc = jnp.zeros((th * wb, cout), jnp.float32)
    corr = jnp.zeros((th, cout), jnp.float32)
    for ki in range(KSIZE):
        s = 1 + ki
        gs, rr = s // FACTOR, s % FACTOR
        rows = lax.slice(
            slab4, (gs, rr, 0, 0), (gs + th, rr + 1, wb, c4)
        ).reshape(th, wb, c4)
        # wshift=1: raw blocks [0, wb) — exact, no padding involved.
        acc = acc + jnp.dot(
            rows.reshape(th * wb, c4),
            w_ref[ki, 1],
            preferred_element_type=jnp.float32,
        )
        # wshift=0: raw blocks [-1, wb-1). The true block -1 is the left
        # edge replicate (4 copies of raw column 0); Mosaic cannot insert a
        # unit middle dim to concatenate a computed (th, c4) pad block, so
        # duplicate block 0 into the pad slot (plain slice+concat) and
        # accumulate a per-row CORRECTION for output column 0: the
        # difference between the replicate block and block 0, applied after
        # the loop by a selection-matrix matmul.
        shifted = jnp.concatenate([rows[:, :1], rows[:, : wb - 1]], axis=1)
        acc = acc + jnp.dot(
            shifted.reshape(th * wb, c4),
            w_ref[ki, 0],
            preferred_element_type=jnp.float32,
        )
        blk0 = rows[:, 0, :]  # (th, c4)
        right = jnp.dot(
            blk0, rep, preferred_element_type=jnp.float32
        )  # replicate(col0); integer counts <= 255, exact in bf16
        delta = (right - blk0.astype(jnp.float32)).astype(w_ref.dtype)
        corr = corr + jnp.dot(
            delta, w_ref[ki, 0], preferred_element_type=jnp.float32
        )
    # Scatter corr into output column 0 of each row: acc[t*wb] += corr[t].
    ri = lax.broadcasted_iota(jnp.int32, (th * wb, th), 0)
    ti = lax.broadcasted_iota(jnp.int32, (th * wb, th), 1)
    msel = (ri == ti * wb).astype(jnp.float32)
    acc = acc + jnp.dot(msel, corr, preferred_element_type=jnp.float32)
    o_ref[0] = acc.reshape(th, wb, cout).astype(o_ref.dtype)


def _stem_fwd_raw(x: jnp.ndarray, w: jnp.ndarray, with_density: bool = False):
    """Raw-fetch forward: input is the native (B, H, W, C) uint8 tensor; the
    only XLA op is the contiguous (B, H, W/4, 4C) view. Lane width is 4*C
    (80 for the event histograms) — narrower matmuls than the padded
    128-lane variant, but the entire pad + convert/relayout prologue
    (~250 us/step at the gen4-base geometry, round-4 trace) disappears and
    the kernel fetches half the bytes (u8 vs bf16)."""
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    assert stem_raw_supported(x.shape, x.dtype), (x.shape, x.dtype)
    cdt = w.dtype
    Ho, Wo = H // FACTOR, W // FACTOR
    nb = Ho // TH
    c4 = FACTOR * Cin
    wb = W // FACTOR
    # The custom call's operand wants the natural {3,2,1,0} layout of this
    # view; consuming the framework's NHWC u8 contract therefore costs one
    # u8 relayout copy (~147 us/step at gen4-base b4). Measured round 5: an
    # optimization_barrier pin here does NOT remove it (3.815 vs 3.821
    # ms/step, noise) — the producer layout puts H on the lanes, which no
    # barrier placement can reconcile with the c4-lane kernel.
    xv = x.reshape(B, H, wb, c4)
    # Tap kj sits at within-block column (1+kj) % 4 of block shift
    # (1+kj) // 4; the leading zero slot realizes the never-read position.
    wk = jnp.pad(w, ((0, 0), (1, 0), (0, 0), (0, 0))).astype(cdt).reshape(
        KSIZE, 2, c4, Cout
    )
    grid = (B, nb)
    out_specs = pl.BlockSpec((1, TH, Wo, Cout), lambda b, i: (b, i, 0, 0))
    out_shape = jax.ShapeDtypeStruct((B, Ho, Wo, Cout), cdt)
    if with_density:
        out_specs = [
            out_specs,
            pl.BlockSpec((1, 4, DENS_CPAD), lambda b, i: (b, 0, 0)),
        ]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((B, 4, DENS_CPAD), jnp.float32),
        ]
    return _pallas_call(
        functools.partial(_raw_band_kernel, th=TH, c=Cin, cout=Cout),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, FACTOR * TH, wb, c4), lambda b, i: (b, i, 0, 0)),
            # Upper 4-row halo: raw row group 8i-1 (clamped to 0 for band 0,
            # whose content is replaced by the top-edge replicate in-kernel).
            pl.BlockSpec(
                (1, FACTOR, wb, c4),
                lambda b, i: (b, jnp.maximum(i * TH - 1, 0), 0, 0),
            ),
            pl.BlockSpec((KSIZE, 2, c4, Cout), lambda b, i: (0, 0, 0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
    )(xv, xv, wk)


def _offset_pool_matrix(n_out: int, n_in: int) -> jnp.ndarray:
    """(n_out, n_in) 0/1 bf16: row r sums padded columns 2r+1 and 2r+2 —
    the level-1 column pool over the stem's padded block axis, where raw
    4-col block j sits at padded block j+1 (one full-stride left pad) and
    the two pad blocks (0 and n_in-1) carry no entries."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n_out, n_in), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n_out, n_in), 1)
    return (((c - 1) // 2 == r) & (c >= 1) & (c <= 2 * n_out)).astype(
        jnp.bfloat16
    )


def _density_accumulate(slab4, d_ref, *, th: int) -> None:
    """Accumulate the 4-scale density pyramid of this band's raw rows.

    Same math as ops/pallas/density.py _slab_kernel (nonzero-of-max ==
    sum-pooled-count > 0; column pools as MXU matmuls), re-indexed into the
    stem kernel's padded slab: the band's 32 raw rows are slab row-groups
    1..th (the top pad is one full 4-row group), and raw 4-col block j is
    padded block j+1. slab4 is the post-conversion (th+1, 4, wb_in, 4*Cp)
    compute-dtype view — u8 values 0..255 are exact in bf16, so the
    nonzero test matches the raw input bit-for-bit.
    """
    from sast_tpu.ops.pallas.density import _col_extract_matrix, _pool_matrix

    i = pl.program_id(1)
    _, _, wb_in, c4 = slab4.shape
    assert th == TH and c4 == FACTOR * DENS_CPAD, (th, c4)
    wbr = wb_in - 2  # raw 4-col blocks (pad blocks 0 and wb_in-1 excluded)
    d = lax.slice(slab4, (1, 0, 0, 0), (th + 1, FACTOR, wb_in, c4))
    nz = (d != 0).astype(jnp.bfloat16)
    rows = nz.sum(axis=1)  # (th, wb_in, 128) row-pooled counts <= 4, exact
    q = _col_extract_matrix()  # (128, 32): sum the 4 interleaved columns
    cell = jnp.stack(
        [
            jnp.dot(rows[r], q, preferred_element_type=jnp.float32)
            for r in range(th)
        ]
    )  # (th, wb_in, 32) scale-4 cell counts
    cur = (cell > 0).astype(jnp.bfloat16)
    # Scale-4 count: mask the two pad blocks explicitly (replicate-padded
    # columns hold real values and would otherwise inflate the count).
    cidx = lax.broadcasted_iota(jnp.int32, (wb_in, 1), 0)
    vmask = ((cidx >= 1) & (cidx <= wbr)).astype(jnp.bfloat16)
    counts = [jnp.sum(cur * vmask, axis=(0, 1), dtype=jnp.float32)]
    # Level 1: offset pool matrix folds the padded axis to raw blocks
    # (also dropping the pad blocks); levels 2-3 are plain halvings.
    for lvl in range(3):
        n_rows = cur.shape[0]
        p2 = (
            _offset_pool_matrix(wbr // 2, wb_in)
            if lvl == 0
            else _pool_matrix(cur.shape[1] // 2, cur.shape[1])
        )
        nxt = jnp.stack(
            [
                jnp.dot(
                    p2,
                    cur[r] + cur[r + 1],
                    preferred_element_type=jnp.float32,
                )
                for r in range(0, n_rows, 2)
            ]
        )
        cur = (nxt > 0).astype(jnp.bfloat16)
        counts.append(jnp.sum(cur, axis=(0, 1), dtype=jnp.float32))
    cnt = jnp.stack(counts)  # (4, 32) fp32

    @pl.when(i == 0)
    def _init():
        d_ref[0] = cnt

    @pl.when(i > 0)
    def _acc():
        d_ref[0] = d_ref[0] + cnt


def _band_kernel(a_ref, h_ref, w_ref, o_ref, *dens_ref, th: int, c4: int, cout: int):
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
    if dens_ref:
        # Fused density pyramid: the band's raw rows are already in VMEM.
        _density_accumulate(slab4, dens_ref[0], th=th)
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


def _stem_fwd_pallas(
    x: jnp.ndarray, w: jnp.ndarray, with_density: bool = False
):
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    assert stem_kernel_supported(x.shape), x.shape
    if with_density:
        assert stem_density_fusable(x.shape, x.dtype), (x.shape, x.dtype)
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
    out_specs = pl.BlockSpec((1, TH, Wo, Cout), lambda b, i: (b, i, 0, 0))
    out_shape = jax.ShapeDtypeStruct((B, Ho, Wo, Cout), cdt)
    if with_density:
        # Second output: per-scale non-zero counts, accumulated across the
        # sequential row-band grid dim (same revisiting-block pattern as
        # ops/pallas/density.py).
        out_specs = [
            out_specs,
            pl.BlockSpec((1, 4, DENS_CPAD), lambda b, i: (b, 0, 0)),
        ]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((B, 4, DENS_CPAD), jnp.float32),
        ]
    out = _pallas_call(
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
        out_specs=out_specs,
        out_shape=out_shape,
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


@jax.custom_vjp
def stem_conv_density_7x4(x: jnp.ndarray, w: jnp.ndarray):
    """Fused stem conv + density pyramid: (y, ratio).

    One kernel, one input fetch: the 7x7/4 conv output AND the per-stage
    channel-wise event-density ratio of the reference ``non_zero_ratio``
    (/root/reference/models/detection/recurrent_backbone/sast_rnn.py:45-60),
    with the reference normalization count / (C * Hp * Wp). Replaces the
    separate density kernel's pad/merge relayout + full-resolution re-read
    of the raw input (round-4 trace: ~187 us/step at the gen4-base
    geometry). ``ratio`` is (B, 4, C) float32 and non-differentiable (the
    reference wraps it in no_grad); the conv backward is the exact XLA VJP,
    identical to stem_conv_7x4's.
    """
    y, counts = _stem_fwd_pallas(x, w, with_density=True)
    B, H, W, C = x.shape
    cells = jnp.asarray(
        [(H // k) * (W // k) * C for k in (4, 8, 16, 32)], jnp.float32
    )
    return y, counts[:, :, :C] / cells[None, :, None]


def _fwd_density(x, w):
    return stem_conv_density_7x4(x, w), (x, w)


def _bwd_density(res, g):
    gy, _g_ratio = g  # the ratio output has no tangent (reference no_grad)
    return _bwd(res, gy)


stem_conv_density_7x4.defvjp(_fwd_density, _bwd_density)


@jax.custom_vjp
def stem_conv_raw_7x4(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Raw-fetch 7x7/stride-4 conv: native u8 NHWC input, zero prologue ops
    (edge pad, channel pad, and the u8->bf16 convert/relayout all move into
    the kernel). Backward is the exact XLA VJP, as stem_conv_7x4."""
    return _stem_fwd_raw(x, w)


def _fwd_raw(x, w):
    return _stem_fwd_raw(x, w), (x, w)


stem_conv_raw_7x4.defvjp(_fwd_raw, _bwd)


@jax.custom_vjp
def stem_conv_density_raw_7x4(x: jnp.ndarray, w: jnp.ndarray):
    """Raw-fetch fused stem conv + density pyramid: (y, ratio); the single
    kernel reads the native u8 tensor once and emits both outputs. Same
    ratio semantics as stem_conv_density_7x4."""
    y, counts = _stem_fwd_raw(x, w, with_density=True)
    B, H, W, C = x.shape
    cells = jnp.asarray(
        [(H // k) * (W // k) * C for k in (4, 8, 16, 32)], jnp.float32
    )
    return y, counts[:, :, :C] / cells[None, :, None]


def _fwd_density_raw(x, w):
    return stem_conv_density_raw_7x4(x, w), (x, w)


stem_conv_density_raw_7x4.defvjp(_fwd_density_raw, _bwd_density)
