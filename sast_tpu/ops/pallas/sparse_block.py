"""Pallas TPU kernel: sparse window transformer block with compute skipping.

The XLA masked path (models/sast.py) computes attention for EVERY window and
discards unselected outputs — correct, but it pays full FLOPs regardless of
scene sparsity. This kernel restores the reference's compute sparsity
(SAST.py:199-255 gathers only kept windows) in a TPU-native way.

Key idea: ``argsort(~win_keep)`` is a *permutation* of all window ids with
kept windows first. The grid visits every window exactly once through
scalar-prefetched BlockSpec index maps — so the standard Pallas pipeline
machinery double-buffers the window DMAs automatically — and only programs
with ``i < n_win`` run the fused block (LN2 on kept tokens, qkv, per-head
masked attention with the reference's -1e4 key mask, proj + LayerScale
residual, gated-GELU MLP + LayerScale residual); the rest copy their window
through unchanged (the norm1 pass-through). FLOPs scale with the number of
kept windows; HBM traffic is one read + one write of the window tensor
(same as any elementwise pass), fully overlapped with compute.

Mosaic constraints handled: channels padded to the 128 lane width with
real-C LayerNorm statistics; f32 keep masks (int8 compares don't lower);
concatenation instead of scatter for head outputs.

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


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _block_kernel(
    # scalar prefetch
    ids_ref,
    nwin_ref,
    # operands (pipelined blocks)
    y_ref,       # (1, hw, c_pad) VMEM
    keep_ref,    # (1, hw, LANE) VMEM
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
    # output block
    out_ref,     # (1, hw, c_pad) VMEM
    *,
    c_real: int,
    num_heads: int,
    dim_head: int,
    norm_eps: float,
):
    i = pl.program_id(0)

    @pl.when(i >= nwin_ref[0])
    def _():
        # Unselected window: norm1 pass-through (y is already norm1-ed).
        out_ref[...] = y_ref[...]

    @pl.when(i < nwin_ref[0])
    def _():
        c_pad = y_ref.shape[-1]
        hw = y_ref.shape[1]
        y_pad = y_ref[0].astype(jnp.float32)  # (hw, c_pad)
        keep = keep_ref[0][:, :1] > 0.5  # (hw, 1)
        y = y_pad[:, :c_real] if c_pad != c_real else y_pad

        # LN2 over the real channels (fp32).
        mu = jnp.sum(y, axis=-1, keepdims=True) / c_real
        var = jnp.sum((y - mu) ** 2, axis=-1, keepdims=True) / c_real
        z_ln = (y - mu) * jax.lax.rsqrt(var + norm_eps)
        z_ln = z_ln * ln2s_ref[:] + ln2b_ref[:]
        z = jnp.where(keep, z_ln, y)

        zc = z.astype(wqkv_ref.dtype)
        if c_pad != c_real:
            zc = jnp.concatenate(
                [zc, jnp.zeros((hw, c_pad - c_real), zc.dtype)], axis=-1
            )
        qkv = (
            jnp.dot(zc, wqkv_ref[:], preferred_element_type=jnp.float32)
            + bqkv_ref[:]
        )  # (hw, 3*c_real)

        scale = dim_head ** -0.5
        key_mask = keep.reshape(1, hw)
        head_outs = []
        for h in range(num_heads):
            lo = h * dim_head
            q = qkv[:, lo : lo + dim_head]
            k = qkv[:, c_real + lo : c_real + lo + dim_head]
            v = qkv[:, 2 * c_real + lo : 2 * c_real + lo + dim_head]
            logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
            logits = jnp.where(key_mask, logits, MASK_VALUE)
            attn = jax.nn.softmax(logits, axis=-1)
            head_outs.append(
                jnp.dot(attn.astype(v.dtype), v, preferred_element_type=jnp.float32)
            )
        attn_out = (
            head_outs[0] if num_heads == 1 else jnp.concatenate(head_outs, axis=-1)
        )

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
        )
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

        out = jnp.where(keep, h2, y).astype(out_ref.dtype)
        if c_pad != c_real:
            out = jnp.concatenate(
                [out, jnp.zeros((hw, c_pad - c_real), out.dtype)], axis=-1
            )
        out_ref[...] = out[None]


def sparse_window_block(
    y: jnp.ndarray,
    token_keep: jnp.ndarray,
    win_keep: jnp.ndarray,
    params: Dict[str, jnp.ndarray],
    num_heads: int,
    dim_head: int,
    norm_eps: float = 1e-5,
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
    c_pad = _round_up(C, LANE)
    n_win = jnp.sum(win_keep.astype(jnp.int32))
    # Permutation of all windows, kept first: every window is visited once.
    ids = jnp.argsort(~win_keep, stable=True).astype(jnp.int32)

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
        c_real=C,
        num_heads=num_heads,
        dim_head=dim_head,
        norm_eps=norm_eps,
    )

    def win_map(i, ids, nwin):
        return (ids[i], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # ids, n_win
        grid=(M,),
        in_specs=[
            pl.BlockSpec((1, hw, c_pad), win_map),
            pl.BlockSpec((1, hw, LANE), win_map),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weights),
        out_specs=pl.BlockSpec((1, hw, c_pad), win_map),
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(y_in.shape, y.dtype),
    )(ids, jnp.asarray([n_win], jnp.int32), y_in, keep_f32, *weights)
    if c_pad != C:
        out = out[:, :, :C]
    return out


# ---------------------------------------------------------------------------
# Looped variant: few programs, each scanning a share of the work list.
#
# The pipelined per-window grid above pays a fixed per-program cost that
# dominates at small window sizes on some backends. This variant uses
# NUM_PROGRAMS programs; program p walks work-list slots [p*K, (p+1)*K) with
# manual DMA, double-buffering the inbound window copy against compute.
# Skipped slots (>= n_win) cost nothing; the output aliases the input so
# unselected windows keep their pass-through values.
# ---------------------------------------------------------------------------

NUM_PROGRAMS = 8


def _looped_kernel(
    ids_ref,
    nwin_ref,
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
    out_hbm,
    x_vmem,      # (2, hw, c_pad) double buffer
    keep_vmem,   # (2, hw, LANE)
    o_vmem,      # (hw, c_pad)
    sem_x,
    sem_k,
    sem_o,
    *,
    slots_per_program: int,
    c_real: int,
    num_heads: int,
    dim_head: int,
    norm_eps: float,
):
    p = pl.program_id(0)
    n_win = nwin_ref[0]
    base = p * slots_per_program

    def compute(y_pad, keep):
        hw = y_pad.shape[0]
        c_pad = y_pad.shape[1]
        y = y_pad[:, :c_real] if c_pad != c_real else y_pad
        mu = jnp.sum(y, axis=-1, keepdims=True) / c_real
        var = jnp.sum((y - mu) ** 2, axis=-1, keepdims=True) / c_real
        z_ln = (y - mu) * jax.lax.rsqrt(var + norm_eps)
        z_ln = z_ln * ln2s_ref[:] + ln2b_ref[:]
        z = jnp.where(keep, z_ln, y)
        zc = z.astype(wqkv_ref.dtype)
        if c_pad != c_real:
            zc = jnp.concatenate(
                [zc, jnp.zeros((hw, c_pad - c_real), zc.dtype)], axis=-1
            )
        qkv = (
            jnp.dot(zc, wqkv_ref[:], preferred_element_type=jnp.float32)
            + bqkv_ref[:]
        )
        scale = dim_head ** -0.5
        key_mask = keep.reshape(1, hw)
        outs = []
        for h in range(num_heads):
            lo = h * dim_head
            q = qkv[:, lo : lo + dim_head]
            k = qkv[:, c_real + lo : c_real + lo + dim_head]
            v = qkv[:, 2 * c_real + lo : 2 * c_real + lo + dim_head]
            logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
            logits = jnp.where(key_mask, logits, MASK_VALUE)
            attn = jax.nn.softmax(logits, axis=-1)
            outs.append(
                jnp.dot(attn.astype(v.dtype), v, preferred_element_type=jnp.float32)
            )
        attn_out = outs[0] if num_heads == 1 else jnp.concatenate(outs, axis=-1)
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
                h1.astype(wglu_ref.dtype), wglu_ref[:],
                preferred_element_type=jnp.float32,
            )
            + bglu_ref[:]
        )
        inner = u.shape[-1] // 2
        m = u[:, :inner] * jax.nn.gelu(u[:, inner:])
        mlp = (
            jnp.dot(
                m.astype(wout_ref.dtype), wout_ref[:],
                preferred_element_type=jnp.float32,
            )
            + bout_ref[:]
        )
        h2 = h1 + ls2_ref[:] * mlp
        out = jnp.where(keep, h2, y).astype(o_vmem.dtype)
        if c_pad != c_real:
            out = jnp.concatenate(
                [out, jnp.zeros((hw, c_pad - c_real), out.dtype)], axis=-1
            )
        return out

    def start_in(j, buf):
        wid = ids_ref[base + j]
        pltpu.make_async_copy(y_hbm.at[wid], x_vmem.at[buf], sem_x.at[buf]).start()
        pltpu.make_async_copy(
            keep_hbm.at[wid], keep_vmem.at[buf], sem_k.at[buf]
        ).start()

    def wait_in(j, buf):
        wid = ids_ref[base + j]
        pltpu.make_async_copy(y_hbm.at[wid], x_vmem.at[buf], sem_x.at[buf]).wait()
        pltpu.make_async_copy(
            keep_hbm.at[wid], keep_vmem.at[buf], sem_k.at[buf]
        ).wait()

    @pl.when(base < n_win)
    def _():
        start_in(0, 0)

        def body(j, _):
            slot = base + j
            cur = jax.lax.rem(j, 2)
            nxt = jax.lax.rem(j + 1, 2)

            @pl.when(slot < n_win)
            def _():
                # prefetch the next active slot while computing this one
                @pl.when(slot + 1 < jnp.minimum(n_win, base + slots_per_program))
                def _():
                    start_in(j + 1, nxt)

                wait_in(j, cur)
                out = compute(
                    x_vmem[cur].astype(jnp.float32),
                    keep_vmem[cur][:, :1] > 0.5,
                )
                # previous outbound copy must land before reusing o_vmem
                @pl.when(j > 0)
                def _():
                    pltpu.make_async_copy(
                        o_vmem, out_hbm.at[ids_ref[slot - 1]], sem_o
                    ).wait()

                o_vmem[:] = out
                pltpu.make_async_copy(
                    o_vmem, out_hbm.at[ids_ref[slot]], sem_o
                ).start()

            return 0

        jax.lax.fori_loop(0, slots_per_program, body, 0)

        # drain the last outbound copy
        last = jnp.minimum(n_win, base + slots_per_program) - 1
        pltpu.make_async_copy(o_vmem, out_hbm.at[ids_ref[last]], sem_o).wait()


def sparse_window_block_looped(
    y: jnp.ndarray,
    token_keep: jnp.ndarray,
    win_keep: jnp.ndarray,
    params: Dict[str, jnp.ndarray],
    num_heads: int,
    dim_head: int,
    norm_eps: float = 1e-5,
    num_programs: int = NUM_PROGRAMS,
) -> jnp.ndarray:
    """Looped-program variant of sparse_window_block (same semantics)."""
    M, hw, C = y.shape
    c_pad = _round_up(C, LANE)
    P = max(1, min(num_programs, M))
    K = _round_up(M, P) // P
    n_win = jnp.sum(win_keep.astype(jnp.int32))
    ids = jnp.argsort(~win_keep, stable=True).astype(jnp.int32)
    if P * K != M:
        ids = jnp.concatenate([ids, jnp.zeros((P * K - M,), jnp.int32)])

    y_in = y
    if c_pad != C:
        y_in = jnp.pad(y, ((0, 0), (0, 0), (0, c_pad - C)))
    keep_f32 = jnp.broadcast_to(
        token_keep.astype(jnp.float32)[..., None], (M, hw, LANE)
    )

    def v2d(x):
        return x.reshape(1, -1).astype(jnp.float32)

    wqkv = params["wqkv"]
    if c_pad != C:
        wqkv = jnp.pad(wqkv, ((0, c_pad - C), (0, 0)))
    weights = [
        v2d(params["ln2_scale"]), v2d(params["ln2_bias"]),
        wqkv, v2d(params["bqkv"]),
        params["wproj"], v2d(params["bproj"]),
        v2d(params["ls1"]),
        params["wglu"], v2d(params["bglu"]),
        params["wout"], v2d(params["bout"]),
        v2d(params["ls2"]),
    ]

    kernel = functools.partial(
        _looped_kernel,
        slots_per_program=K,
        c_real=C,
        num_heads=num_heads,
        dim_head=dim_head,
        norm_eps=norm_eps,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(P,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weights),
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, hw, c_pad), y.dtype),
            pltpu.VMEM((2, hw, LANE), jnp.float32),
            pltpu.VMEM((hw, c_pad), y.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(y_in.shape, y.dtype),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ids, jnp.asarray([n_win], jnp.int32), y_in, keep_f32, *weights)
    if c_pad != C:
        out = out[:, :, :C]
    return out
