"""Pallas TPU kernel: sparse window transformer block with window skipping.

The XLA masked path (models/sast.py) computes attention for EVERY window and
discards unselected outputs — correct, but it pays full FLOPs regardless of
scene sparsity. This kernel restores the reference's compute sparsity
(SAST.py:199-255 gathers only kept windows) in a TPU-native way:

- a compacted work list of kept-window ids is built in XLA (argsort of the
  keep mask — static shape) and scalar-prefetched;
- the grid covers ceil(M / WB) programs of WB windows each; slots beyond
  ``n_win`` do no DMA and no writeback, so FLOPs and HBM traffic scale with
  the number of *kept* windows;
- each program overlaps 2*WB inbound DMAs, then runs the fused block —
  LN2 on kept tokens, batched qkv projection over all WB windows, per-window
  masked attention (key mask = -1e4, reference semantics), batched
  proj + LayerScale residual and gated-GELU MLP + LayerScale residual —
  and DMAs results back over the aliased output, leaving skipped windows at
  their pass-through (norm1) values.

Mosaic constraints handled: HBM window slices need lane-aligned channels
(padded to 128 with real-C LayerNorm statistics), no cross-lane reshapes
(only leading-dim collapses are used), f32 keep masks (int8 compares don't
lower), concatenation instead of scatter for head outputs.

Inference-path kernel (no custom VJP yet); training uses the XLA path.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -1e4
LANE = 128
WINDOW_BLOCK = 8  # windows per program


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _block_kernel(
    # scalar prefetch
    ids_ref,
    nwin_ref,
    # operands
    y_hbm,
    keep_hbm,
    ln2s_ref,
    ln2b_ref,
    wqkv_ref,
    bqkv_ref,
    wproj_ref,
    bproj_ref,
    ls1_ref,
    wglu_ref,
    bglu_ref,
    wout_ref,
    bout_ref,
    ls2_ref,
    # output
    out_hbm,
    # scratch
    x_vmem,
    keep_vmem,
    o_vmem,
    sems_x,
    sems_k,
    sems_o,
    *,
    hw: int,
    c_real: int,
    num_heads: int,
    dim_head: int,
    norm_eps: float,
    wb: int,
):
    i = pl.program_id(0)
    n_win = nwin_ref[0]
    base = i * wb

    # ---- overlapped inbound DMAs for all active slots -----------------------
    for j in range(wb):
        @pl.when(base + j < n_win)
        def _(j=j):
            wid = ids_ref[base + j]
            pltpu.make_async_copy(y_hbm.at[wid], x_vmem.at[j], sems_x.at[j]).start()
            pltpu.make_async_copy(
                keep_hbm.at[wid], keep_vmem.at[j], sems_k.at[j]
            ).start()

    for j in range(wb):
        @pl.when(base + j < n_win)
        def _(j=j):
            wid = ids_ref[base + j]
            pltpu.make_async_copy(y_hbm.at[wid], x_vmem.at[j], sems_x.at[j]).wait()
            pltpu.make_async_copy(
                keep_hbm.at[wid], keep_vmem.at[j], sems_k.at[j]
            ).wait()

    @pl.when(base < n_win)
    def _():
        c_pad = x_vmem.shape[-1]
        # (wb*hw, c_pad): leading-dim collapse only (lane layout unchanged).
        y_pad = x_vmem[:].reshape(wb * hw, c_pad).astype(jnp.float32)
        keep = keep_vmem[:].reshape(wb * hw, LANE)[:, :1] > 0.5  # (wb*hw, 1)
        y = y_pad[:, :c_real] if c_pad != c_real else y_pad

        # LN2 over the real channels (fp32).
        mu = jnp.sum(y, axis=-1, keepdims=True) / c_real
        var = jnp.sum((y - mu) ** 2, axis=-1, keepdims=True) / c_real
        z_ln = (y - mu) * jax.lax.rsqrt(var + norm_eps)
        z_ln = z_ln * ln2s_ref[:] + ln2b_ref[:]
        z = jnp.where(keep, z_ln, y)  # (wb*hw, c_real)

        zc = z.astype(wqkv_ref.dtype)
        if c_pad != c_real:
            zc = jnp.concatenate(
                [zc, jnp.zeros((zc.shape[0], c_pad - c_real), zc.dtype)], axis=-1
            )
        qkv = (
            jnp.dot(zc, wqkv_ref[:], preferred_element_type=jnp.float32)
            + bqkv_ref[:]
        )  # (wb*hw, 3*c_real)

        scale = dim_head ** -0.5
        win_outs = []
        for j in range(wb):
            lo_t = j * hw
            k_mask = keep[lo_t : lo_t + hw].reshape(1, hw)
            head_outs = []
            for h in range(num_heads):
                lo = h * dim_head
                q = qkv[lo_t : lo_t + hw, lo : lo + dim_head]
                k = qkv[lo_t : lo_t + hw, c_real + lo : c_real + lo + dim_head]
                v = qkv[lo_t : lo_t + hw, 2 * c_real + lo : 2 * c_real + lo + dim_head]
                logits = (
                    jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
                )
                logits = jnp.where(k_mask, logits, MASK_VALUE)
                attn = jax.nn.softmax(logits, axis=-1)
                head_outs.append(
                    jnp.dot(
                        attn.astype(v.dtype), v,
                        preferred_element_type=jnp.float32,
                    )
                )
            win_outs.append(
                head_outs[0]
                if num_heads == 1
                else jnp.concatenate(head_outs, axis=-1)
            )
        attn_out = (
            win_outs[0] if wb == 1 else jnp.concatenate(win_outs, axis=0)
        )  # (wb*hw, c_real)

        proj = (
            jnp.dot(
                attn_out.astype(wproj_ref.dtype),
                wproj_ref[:],
                preferred_element_type=jnp.float32,
            )
            + bproj_ref[:]
        )
        h1 = z + ls1_ref[:] * proj

        u = (
            jnp.dot(
                h1.astype(wglu_ref.dtype),
                wglu_ref[:],
                preferred_element_type=jnp.float32,
            )
            + bglu_ref[:]
        )  # (wb*hw, 2I)
        inner = u.shape[-1] // 2
        val, gate = u[:, :inner], u[:, inner:]
        m = val * jax.nn.gelu(gate)
        mlp = (
            jnp.dot(
                m.astype(wout_ref.dtype),
                wout_ref[:],
                preferred_element_type=jnp.float32,
            )
            + bout_ref[:]
        )
        h2 = h1 + ls2_ref[:] * mlp

        out = jnp.where(keep, h2, y).astype(o_vmem.dtype)
        if c_pad != c_real:
            out = jnp.concatenate(
                [out, jnp.zeros((out.shape[0], c_pad - c_real), out.dtype)],
                axis=-1,
            )
        o_vmem[:] = out.reshape(wb, hw, c_pad)

    # ---- overlapped writeback for active slots ------------------------------
    for j in range(wb):
        @pl.when(base + j < n_win)
        def _(j=j):
            wid = ids_ref[base + j]
            pltpu.make_async_copy(o_vmem.at[j], out_hbm.at[wid], sems_o.at[j]).start()

    for j in range(wb):
        @pl.when(base + j < n_win)
        def _(j=j):
            wid = ids_ref[base + j]
            pltpu.make_async_copy(o_vmem.at[j], out_hbm.at[wid], sems_o.at[j]).wait()


def sparse_window_block(
    y: jnp.ndarray,
    token_keep: jnp.ndarray,
    win_keep: jnp.ndarray,
    params: Dict[str, jnp.ndarray],
    num_heads: int,
    dim_head: int,
    norm_eps: float = 1e-5,
    window_block: int = WINDOW_BLOCK,
) -> jnp.ndarray:
    """Apply the fused sparse block to kept windows only.

    Args:
      y: (M, hw, C) norm1-ed window tokens (M = B * N flattened). The output
        equals y outside kept windows / unselected tokens.
      token_keep: (M, hw) bool.
      win_keep: (M,) bool.
      params: dict with ln2_scale, ln2_bias, wqkv (C,3C), bqkv, wproj, bproj,
        ls1, wglu (C,2I), bglu, wout (I,C), bout, ls2.

    Returns (M, hw, C) array of y's dtype.
    """
    M, hw, C = y.shape
    wb = max(1, min(window_block, M))
    c_pad = _round_up(C, LANE)
    n_win = jnp.sum(win_keep.astype(jnp.int32))
    # Compacted work list: kept window ids first (stable order), padded to a
    # multiple of wb (pad entries point at window 0 but are never active).
    ids = jnp.argsort(~win_keep, stable=True).astype(jnp.int32)
    n_ids = _round_up(M, wb)
    if n_ids != M:
        ids = jnp.concatenate([ids, jnp.zeros((n_ids - M,), jnp.int32)])

    y_in = y
    if c_pad != C:
        y_in = jnp.pad(y, ((0, 0), (0, 0), (0, c_pad - C)))
    # keep mask broadcast to a lane-aligned fp32 plane (int8 compares do
    # not lower in this Mosaic version)
    keep_f32 = jnp.broadcast_to(
        token_keep.astype(jnp.float32)[..., None], (M, hw, LANE)
    )

    def v2d(x):  # vectors as (1, D) rows for VMEM
        return x.reshape(1, -1).astype(jnp.float32)

    wqkv = params["wqkv"]
    if c_pad != C:
        wqkv = jnp.pad(wqkv, ((0, c_pad - C), (0, 0)))
    weights = [
        v2d(params["ln2_scale"]),
        v2d(params["ln2_bias"]),
        wqkv,
        v2d(params["bqkv"]),
        params["wproj"],
        v2d(params["bproj"]),
        v2d(params["ls1"]),
        params["wglu"],
        v2d(params["bglu"]),
        params["wout"],
        v2d(params["bout"]),
        v2d(params["ls2"]),
    ]

    kernel = functools.partial(
        _block_kernel,
        hw=hw,
        c_real=C,
        num_heads=num_heads,
        dim_head=dim_head,
        norm_eps=norm_eps,
        wb=wb,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # ids, n_win
        grid=(n_ids // wb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # y (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),  # keep (HBM)
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weights),
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((wb, hw, c_pad), y.dtype),
            pltpu.VMEM((wb, hw, LANE), jnp.float32),
            pltpu.VMEM((wb, hw, c_pad), y.dtype),
            pltpu.SemaphoreType.DMA((wb,)),
            pltpu.SemaphoreType.DMA((wb,)),
            pltpu.SemaphoreType.DMA((wb,)),
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(y_in.shape, y.dtype),
        input_output_aliases={2: 0},  # y (first non-prefetch operand) -> out
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ids, jnp.asarray([n_win], jnp.int32), y_in, keep_f32, *weights)
    if c_pad != C:
        out = out[:, :, :C]
    return out
