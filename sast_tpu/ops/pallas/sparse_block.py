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

Training support: ``sparse_window_block`` carries a ``jax.custom_vjp`` whose
backward pass is two more Pallas kernels over the *same* kept-first
permutation work list (``_mlp_bwd_kernel`` then ``_attn_bwd_kernel``), so the
backward FLOPs scale with the number of kept windows exactly like the
forward — the TPU-native analogue of the reference training through its
gathers (SAST.py:199-255). The only extra residual is ``h1`` (the
post-attention activation), saved by the forward in fp32; everything else is
recomputed per window. Weight gradients accumulate in fp32 VMEM across the
sequential TPU grid via constant-index output blocks.
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


def _pad_cols(x, c_pad):
    """Right-pad the last (lane) dim of a 2D array with zeros to c_pad."""
    c = x.shape[-1]
    if c == c_pad:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((x.shape[0], c_pad - c), x.dtype)], axis=-1
    )


def _fwd_window(
    y,           # (hw, C) f32 — norm1-ed window tokens, real channels
    keep,        # (hw, 1) bool
    ln2s, ln2b, wqkv, bqkv, wproj, bproj, ls1, wglu, bglu, wout, bout, ls2,
    *,
    c_real: int,
    num_heads: int,
    dim_head: int,
    norm_eps: float,
):
    """One kept window's fused block in fp32. wqkv is (c_pad, 3C).

    Returns (out, h1) both (hw, C) f32 — h1 is the post-attention residual
    activation, the single saved residual of the custom VJP.
    """
    hw = y.shape[0]
    c_pad = wqkv.shape[0]

    # LN2 over the real channels (fp32).
    mu = jnp.sum(y, axis=-1, keepdims=True) / c_real
    var = jnp.sum((y - mu) ** 2, axis=-1, keepdims=True) / c_real
    z_ln = (y - mu) * jax.lax.rsqrt(var + norm_eps)
    z_ln = z_ln * ln2s + ln2b
    z = jnp.where(keep, z_ln, y)

    zc = _pad_cols(z.astype(wqkv.dtype), c_pad)
    qkv = jnp.dot(zc, wqkv, preferred_element_type=jnp.float32) + bqkv

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
            attn_out.astype(wproj.dtype),
            wproj,
            preferred_element_type=jnp.float32,
        )
        + bproj
    )
    h1 = z + ls1 * proj

    u = (
        jnp.dot(
            h1.astype(wglu.dtype), wglu, preferred_element_type=jnp.float32
        )
        + bglu
    )
    inner = u.shape[-1] // 2
    val, gate = u[:, :inner], u[:, inner:]
    m = val * jax.nn.gelu(gate)
    mlp = (
        jnp.dot(m.astype(wout.dtype), wout, preferred_element_type=jnp.float32)
        + bout
    )
    h2 = h1 + ls2 * mlp

    return jnp.where(keep, h2, y), h1


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
    # output block(s)
    out_ref,     # (1, hw, c_pad) VMEM
    h1_ref=None,  # (1, hw, c_pad) f32 VMEM — present only in the VJP forward
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
        if h1_ref is not None:
            # Value never read in the backward (gh1 passes through), but the
            # buffer must be written on every visited block.
            h1_ref[...] = y_ref[...].astype(jnp.float32)

    @pl.when(i < nwin_ref[0])
    def _():
        c_pad = y_ref.shape[-1]
        y_pad = y_ref[0].astype(jnp.float32)  # (hw, c_pad)
        keep = keep_ref[0][:, :1] > 0.5  # (hw, 1)
        y = y_pad[:, :c_real] if c_pad != c_real else y_pad

        out, h1 = _fwd_window(
            y, keep,
            ln2s_ref[:], ln2b_ref[:], wqkv_ref[:], bqkv_ref[:],
            wproj_ref[:], bproj_ref[:], ls1_ref[:],
            wglu_ref[:], bglu_ref[:], wout_ref[:], bout_ref[:], ls2_ref[:],
            c_real=c_real, num_heads=num_heads, dim_head=dim_head,
            norm_eps=norm_eps,
        )
        out_ref[...] = _pad_cols(out.astype(out_ref.dtype), c_pad)[None]
        if h1_ref is not None:
            h1_ref[...] = _pad_cols(h1, c_pad)[None]


def _v2d(x):  # vectors as (1, D) rows for VMEM
    return x.reshape(1, -1).astype(jnp.float32)


def _prep_inputs(y, token_keep, win_keep, params):
    """Shared staging for all three kernels of the block.

    Returns (n_win, ids, y_in, keep_f32, weights) where ``ids`` is the
    kept-first permutation work list, ``y_in``/``wqkv`` are lane-padded, and
    ``weights`` is the ordered operand list every kernel shares.
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

    wqkv = params["wqkv"]
    if c_pad != C:
        wqkv = jnp.pad(wqkv, ((0, c_pad - C), (0, 0)))
    weights = [
        _v2d(params["ln2_scale"]),
        _v2d(params["ln2_bias"]),
        wqkv,
        _v2d(params["bqkv"]),
        params["wproj"],
        _v2d(params["bproj"]),
        _v2d(params["ls1"]),
        params["wglu"],
        _v2d(params["bglu"]),
        params["wout"],
        _v2d(params["bout"]),
        _v2d(params["ls2"]),
    ]
    return n_win, ids, y_in, keep_f32, weights


def _win_map(i, ids, nwin):
    return (ids[i], 0, 0)


def _acc_map2(i, ids, nwin):  # constant map: accumulator lives in VMEM
    return (0, 0)


def _sparse_window_block_impl(
    y, token_keep, win_keep, params, num_heads, dim_head, norm_eps,
    save_h1: bool = False,
):
    """Primal forward; with save_h1 also returns the h1 residual (f32)."""
    M, hw, C = y.shape
    c_pad = _round_up(C, LANE)
    n_win, ids, y_in, keep_f32, weights = _prep_inputs(
        y, token_keep, win_keep, params
    )

    kernel = functools.partial(
        _block_kernel,
        c_real=C,
        num_heads=num_heads,
        dim_head=dim_head,
        norm_eps=norm_eps,
    )

    out_shape = jax.ShapeDtypeStruct(y_in.shape, y.dtype)
    out_specs = pl.BlockSpec((1, hw, c_pad), _win_map)
    if save_h1:
        out_shape = (out_shape, jax.ShapeDtypeStruct(y_in.shape, jnp.float32))
        out_specs = (out_specs, pl.BlockSpec((1, hw, c_pad), _win_map))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # ids, n_win
        grid=(M,),
        in_specs=[
            pl.BlockSpec((1, hw, c_pad), _win_map),
            pl.BlockSpec((1, hw, LANE), _win_map),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weights),
        out_specs=out_specs,
    )

    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
    )(ids, jnp.asarray([n_win], jnp.int32), y_in, keep_f32, *weights)
    if save_h1:
        out, h1 = res
        if c_pad != C:
            out = out[:, :, :C]
        return out, h1  # h1 stays padded: the bwd kernel consumes it as-is
    out = res
    if c_pad != C:
        out = out[:, :, :C]
    return out


# ---------------------------------------------------------------------------
# Custom VJP — backward over the same work list.
#
# The block splits cleanly at h1 = z + ls1*proj:
#   * MLP branch (needs only h1):   u/gelu-gate recompute → gh1, dWglu, dWout…
#   * attention branch (needs y):   z/qkv/attn recompute → dy, dWqkv, dWproj…
# Running them as two kernels keeps each one's VMEM footprint (weights +
# fp32 grad accumulators) within budget at C=512, and both skip unselected
# windows exactly like the forward. Weight grads accumulate into
# constant-index output blocks, which the sequential TPU grid keeps resident
# in VMEM across programs (zeroed at program 0).
#
# Per-token masking note: the cotangent carried between the kernels is
# overloaded as gh1 + (1-keep)·g. True gh1 rows are zero at unselected
# tokens (their h2 is discarded by the forward's where), so the attention
# kernel recovers both parts exactly with keep/1-keep masks.
# ---------------------------------------------------------------------------


def _dot_nt(a, b):
    """a @ b.T without materializing the transpose (contract last dims)."""
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (b.ndim - 1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot_tn(a, b):
    """a.T @ b without materializing the transpose (contract first dims)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _mlp_bwd_kernel(
    ids_ref, nwin_ref,
    h1_ref,      # (1, hw, c_pad) f32
    keep_ref,    # (1, hw, LANE) f32
    g_ref,       # (1, hw, c_pad) cotangent of out
    wglu_ref, bglu_ref, wout_ref, bout_ref, ls2_ref,
    gh1_ref,     # out: (1, hw, c_pad) f32 — gh1 + (1-keep)*g
    dwglu_ref, dbglu_ref, dwout_ref, dbout_ref, dls2_ref,  # accumulators
    *,
    c_real: int,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dwglu_ref[...] = jnp.zeros(dwglu_ref.shape, dwglu_ref.dtype)
        dbglu_ref[...] = jnp.zeros(dbglu_ref.shape, dbglu_ref.dtype)
        dwout_ref[...] = jnp.zeros(dwout_ref.shape, dwout_ref.dtype)
        dbout_ref[...] = jnp.zeros(dbout_ref.shape, dbout_ref.dtype)
        dls2_ref[...] = jnp.zeros(dls2_ref.shape, dls2_ref.dtype)

    @pl.when(i >= nwin_ref[0])
    def _():
        # Window-level pass-through: out == y, so dy == g rides through gh1.
        gh1_ref[...] = g_ref[...].astype(jnp.float32)

    @pl.when(i < nwin_ref[0])
    def _():
        c_pad = h1_ref.shape[-1]
        hw = h1_ref.shape[1]
        keep = keep_ref[0][:, :1] > 0.5
        h1 = h1_ref[0][:, :c_real] if c_pad != c_real else h1_ref[0]
        g = g_ref[0].astype(jnp.float32)
        g = g[:, :c_real] if c_pad != c_real else g
        g_h2 = jnp.where(keep, g, 0.0)

        # Recompute the MLP forward (mirrors _fwd_window's casts).
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
        act, act_vjp = jax.vjp(jax.nn.gelu, gate)
        m = val * act
        mlp = (
            jnp.dot(
                m.astype(wout_ref.dtype),
                wout_ref[:],
                preferred_element_type=jnp.float32,
            )
            + bout_ref[:]
        )

        # h2 = h1 + ls2*mlp
        dls2_ref[...] += jnp.sum(g_h2 * mlp, axis=0, keepdims=True)
        g_mlp = g_h2 * ls2_ref[:]
        dwout_ref[...] += _dot_tn(m, g_mlp)
        dbout_ref[...] += jnp.sum(g_mlp, axis=0, keepdims=True)
        g_m = _dot_nt(g_mlp, wout_ref[:])
        g_val = g_m * act
        (g_gate,) = act_vjp(g_m * val)
        g_u = jnp.concatenate([g_val, g_gate], axis=-1)
        dwglu_ref[...] += _dot_tn(h1, g_u)
        dbglu_ref[...] += jnp.sum(g_u, axis=0, keepdims=True)

        g_h1 = g_h2 + _dot_nt(g_u, wglu_ref[:])
        # Overload: carry the unselected tokens' pass-through cotangent.
        carried = g_h1 + jnp.where(keep, 0.0, g)
        gh1_ref[...] = _pad_cols(carried, c_pad)[None]


def _attn_bwd_kernel(
    ids_ref, nwin_ref,
    y_ref,       # (1, hw, c_pad)
    keep_ref,    # (1, hw, LANE) f32
    gh1_ref,     # (1, hw, c_pad) f32 — gh1 + (1-keep)*g from the MLP kernel
    ln2s_ref, ln2b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, ls1_ref,
    dy_ref,      # out: (1, hw, c_pad) f32
    dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref,
    dls1_ref, ds2_ref, db2_ref,  # accumulators
    *,
    c_real: int,
    num_heads: int,
    dim_head: int,
    norm_eps: float,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dwqkv_ref[...] = jnp.zeros(dwqkv_ref.shape, dwqkv_ref.dtype)
        dbqkv_ref[...] = jnp.zeros(dbqkv_ref.shape, dbqkv_ref.dtype)
        dwproj_ref[...] = jnp.zeros(dwproj_ref.shape, dwproj_ref.dtype)
        dbproj_ref[...] = jnp.zeros(dbproj_ref.shape, dbproj_ref.dtype)
        dls1_ref[...] = jnp.zeros(dls1_ref.shape, dls1_ref.dtype)
        ds2_ref[...] = jnp.zeros(ds2_ref.shape, ds2_ref.dtype)
        db2_ref[...] = jnp.zeros(db2_ref.shape, db2_ref.dtype)

    @pl.when(i >= nwin_ref[0])
    def _():
        dy_ref[...] = gh1_ref[...]

    @pl.when(i < nwin_ref[0])
    def _():
        c_pad = y_ref.shape[-1]
        hw = y_ref.shape[1]
        keep = keep_ref[0][:, :1] > 0.5
        y_pad = y_ref[0].astype(jnp.float32)
        y = y_pad[:, :c_real] if c_pad != c_real else y_pad
        gh1_in = gh1_ref[0]
        gh1_in = gh1_in[:, :c_real] if c_pad != c_real else gh1_in
        gh1 = jnp.where(keep, gh1_in, 0.0)        # true g wrt h1
        dy_pass = jnp.where(keep, 0.0, gh1_in)    # (1-keep)*g pass-through

        # ---- recompute z / qkv / attention (mirrors _fwd_window) ----------
        mu = jnp.sum(y, axis=-1, keepdims=True) / c_real
        var = jnp.sum((y - mu) ** 2, axis=-1, keepdims=True) / c_real
        r = jax.lax.rsqrt(var + norm_eps)
        xhat = (y - mu) * r
        z_ln = xhat * ln2s_ref[:] + ln2b_ref[:]
        z = jnp.where(keep, z_ln, y)
        zc = _pad_cols(z.astype(wqkv_ref.dtype), c_pad)
        qkv = (
            jnp.dot(zc, wqkv_ref[:], preferred_element_type=jnp.float32)
            + bqkv_ref[:]
        )
        scale = dim_head ** -0.5
        key_mask = keep.reshape(1, hw)
        attns, head_outs = [], []
        for h in range(num_heads):
            lo = h * dim_head
            q = qkv[:, lo : lo + dim_head]
            k = qkv[:, c_real + lo : c_real + lo + dim_head]
            v = qkv[:, 2 * c_real + lo : 2 * c_real + lo + dim_head]
            logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
            logits = jnp.where(key_mask, logits, MASK_VALUE)
            attn = jax.nn.softmax(logits, axis=-1)
            attns.append(attn)
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

        # ---- h1 = z + ls1*proj --------------------------------------------
        dls1_ref[...] += jnp.sum(gh1 * proj, axis=0, keepdims=True)
        g_proj = gh1 * ls1_ref[:]
        dwproj_ref[...] += _dot_tn(attn_out, g_proj)
        dbproj_ref[...] += jnp.sum(g_proj, axis=0, keepdims=True)
        g_ao = _dot_nt(g_proj, wproj_ref[:])

        # ---- attention backward per head ----------------------------------
        gq, gk, gv = [], [], []
        for h in range(num_heads):
            lo = h * dim_head
            q = qkv[:, lo : lo + dim_head]
            k = qkv[:, c_real + lo : c_real + lo + dim_head]
            v = qkv[:, 2 * c_real + lo : 2 * c_real + lo + dim_head]
            attn = attns[h]
            g_ao_h = g_ao[:, lo : lo + dim_head]
            g_attn = _dot_nt(g_ao_h, v)
            s = jnp.sum(g_attn * attn, axis=-1, keepdims=True)
            g_logits = attn * (g_attn - s)
            g_logits = jnp.where(key_mask, g_logits, 0.0)
            gq.append(
                jnp.dot(g_logits, k, preferred_element_type=jnp.float32) * scale
            )
            gk.append(_dot_tn(g_logits, q) * scale)
            gv.append(_dot_tn(attn, g_ao_h))
        g_qkv = jnp.concatenate(gq + gk + gv, axis=-1)  # (hw, 3C)

        dwqkv_ref[...] += _dot_tn(zc, g_qkv)
        dbqkv_ref[...] += jnp.sum(g_qkv, axis=0, keepdims=True)
        g_z_full = _dot_nt(g_qkv, wqkv_ref[:])
        g_z = gh1 + (g_z_full[:, :c_real] if c_pad != c_real else g_z_full)

        # ---- z = where(keep, LN2(y), y) ------------------------------------
        g_zln = jnp.where(keep, g_z, 0.0)
        g_zid = jnp.where(keep, 0.0, g_z)
        ds2_ref[...] += jnp.sum(g_zln * xhat, axis=0, keepdims=True)
        db2_ref[...] += jnp.sum(g_zln, axis=0, keepdims=True)
        g_xhat = g_zln * ln2s_ref[:]
        mean_g = jnp.sum(g_xhat, axis=-1, keepdims=True) / c_real
        mean_gx = jnp.sum(g_xhat * xhat, axis=-1, keepdims=True) / c_real
        g_y_ln = r * (g_xhat - mean_g - xhat * mean_gx)

        dy = dy_pass + g_zid + jnp.where(keep, g_y_ln, 0.0)
        dy_ref[...] = _pad_cols(dy, c_pad)[None]


def _sparse_block_bwd_impl(
    y, token_keep, win_keep, params, h1, g, num_heads, dim_head, norm_eps
):
    """Runs both backward kernels; returns (dy, dparams)."""
    M, hw, C = y.shape
    c_pad = _round_up(C, LANE)
    n_win, ids, y_in, keep_f32, weights = _prep_inputs(
        y, token_keep, win_keep, params
    )
    (ln2s, ln2b, wqkv, bqkv, wproj, bproj, ls1,
     wglu, bglu, wout, bout, ls2) = weights
    nwin_arr = jnp.asarray([n_win], jnp.int32)
    inner2 = params["wglu"].shape[1]  # 2*inner

    g_in = g
    if c_pad != C:
        g_in = jnp.pad(g, ((0, 0), (0, 0), (0, c_pad - C)))

    blk = pl.BlockSpec((1, hw, c_pad), _win_map)
    keep_blk = pl.BlockSpec((1, hw, LANE), _win_map)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    f32 = jnp.float32

    # ---- kernel 1: MLP branch -> gh1 + dWglu/dbglu/dWout/dbout/dls2 -------
    mlp_out_shapes = (
        jax.ShapeDtypeStruct((M, hw, c_pad), f32),            # gh1
        jax.ShapeDtypeStruct(params["wglu"].shape, f32),
        jax.ShapeDtypeStruct((1, inner2), f32),
        jax.ShapeDtypeStruct(params["wout"].shape, f32),
        jax.ShapeDtypeStruct((1, C), f32),
        jax.ShapeDtypeStruct((1, C), f32),
    )
    acc2 = lambda shape: pl.BlockSpec(shape, _acc_map2)
    gh1, dwglu, dbglu, dwout, dbout, dls2 = pl.pallas_call(
        functools.partial(_mlp_bwd_kernel, c_real=C),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(M,),
            in_specs=[blk, keep_blk, blk] + [vmem] * 5,
            out_specs=(
                blk,
                acc2(params["wglu"].shape),
                acc2((1, inner2)),
                acc2(params["wout"].shape),
                acc2((1, C)),
                acc2((1, C)),
            ),
        ),
        out_shape=mlp_out_shapes,
        # fp32 grad accumulators + weights exceed the 16 MB scoped-VMEM
        # default at C=512; v5e has 128 MB physical VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(ids, nwin_arr, h1, keep_f32, g_in, wglu, bglu, wout, bout, ls2)

    # ---- kernel 2: attention branch -> dy + dWqkv/dbqkv/dWproj/... --------
    attn_out_shapes = (
        jax.ShapeDtypeStruct((M, hw, c_pad), f32),            # dy
        jax.ShapeDtypeStruct((c_pad, 3 * C), f32),
        jax.ShapeDtypeStruct((1, 3 * C), f32),
        jax.ShapeDtypeStruct(params["wproj"].shape, f32),
        jax.ShapeDtypeStruct((1, C), f32),
        jax.ShapeDtypeStruct((1, C), f32),
        jax.ShapeDtypeStruct((1, C), f32),
        jax.ShapeDtypeStruct((1, C), f32),
    )
    dy, dwqkv, dbqkv, dwproj, dbproj, dls1, ds2, db2 = pl.pallas_call(
        functools.partial(
            _attn_bwd_kernel,
            c_real=C,
            num_heads=num_heads,
            dim_head=dim_head,
            norm_eps=norm_eps,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(M,),
            in_specs=[blk, keep_blk, blk] + [vmem] * 7,
            out_specs=(
                blk,
                acc2((c_pad, 3 * C)),
                acc2((1, 3 * C)),
                acc2(params["wproj"].shape),
                acc2((1, C)),
                acc2((1, C)),
                acc2((1, C)),
                acc2((1, C)),
            ),
        ),
        out_shape=attn_out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(ids, nwin_arr, y_in, keep_f32, gh1, ln2s, ln2b, wqkv, bqkv,
      wproj, bproj, ls1)

    if c_pad != C:
        dy = dy[:, :, :C]
        dwqkv = dwqkv[:C]

    def cast(gname, gval):
        return gval.astype(params[gname].dtype)

    dparams = {
        "ln2_scale": cast("ln2_scale", ds2.reshape(-1)),
        "ln2_bias": cast("ln2_bias", db2.reshape(-1)),
        "wqkv": cast("wqkv", dwqkv),
        "bqkv": cast("bqkv", dbqkv.reshape(-1)),
        "wproj": cast("wproj", dwproj),
        "bproj": cast("bproj", dbproj.reshape(-1)),
        "ls1": cast("ls1", dls1.reshape(-1)),
        "wglu": cast("wglu", dwglu),
        "bglu": cast("bglu", dbglu.reshape(-1)),
        "wout": cast("wout", dwout),
        "bout": cast("bout", dbout.reshape(-1)),
        "ls2": cast("ls2", dls2.reshape(-1)),
    }
    return dy.astype(y.dtype), dparams


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _sparse_window_block_vjp(
    y, token_keep, win_keep, params, num_heads, dim_head, norm_eps
):
    return _sparse_window_block_impl(
        y, token_keep, win_keep, params, num_heads, dim_head, norm_eps
    )


def _vjp_fwd(y, token_keep, win_keep, params, num_heads, dim_head, norm_eps):
    out, h1 = _sparse_window_block_impl(
        y, token_keep, win_keep, params, num_heads, dim_head, norm_eps,
        save_h1=True,
    )
    return out, (y, token_keep, win_keep, params, h1)


def _vjp_bwd(num_heads, dim_head, norm_eps, residuals, g):
    y, token_keep, win_keep, params, h1 = residuals
    dy, dparams = _sparse_block_bwd_impl(
        y, token_keep, win_keep, params, h1, g, num_heads, dim_head, norm_eps
    )
    return dy, None, None, dparams


_sparse_window_block_vjp.defvjp(_vjp_fwd, _vjp_bwd)


def sparse_window_block(
    y: jnp.ndarray,
    token_keep: jnp.ndarray,
    win_keep: jnp.ndarray,
    params: Dict[str, jnp.ndarray],
    num_heads: int,
    dim_head: int,
    norm_eps: float = 1e-5,
) -> jnp.ndarray:
    """Apply the fused sparse block to kept windows only. Differentiable:
    the custom VJP runs the backward as Pallas kernels over the same
    kept-first work list (see module docstring).

    Args:
      y: (M, hw, C) norm1-ed window tokens (M = B * N flattened). The output
        equals y outside kept windows / unselected tokens.
      token_keep: (M, hw) bool.
      win_keep: (M,) bool.
      params: dict with ln2_scale, ln2_bias, wqkv (C,3C), bqkv, wproj, bproj,
        ls1, wglu (C,2I), bglu, wout (I,C), bout, ls2.

    Returns (M, hw, C) array of y's dtype.
    """
    return _sparse_window_block_vjp(
        y, token_keep, win_keep, params, num_heads, dim_head, norm_eps
    )


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
        c_pad = y_pad.shape[1]
        y = y_pad[:, :c_real] if c_pad != c_real else y_pad
        out, _ = _fwd_window(
            y, keep,
            ln2s_ref[:], ln2b_ref[:], wqkv_ref[:], bqkv_ref[:],
            wproj_ref[:], bproj_ref[:], ls1_ref[:],
            wglu_ref[:], bglu_ref[:], wout_ref[:], bout_ref[:], ls2_ref[:],
            c_real=c_real, num_heads=num_heads, dim_head=dim_head,
            norm_eps=norm_eps,
        )
        return _pad_cols(out.astype(o_vmem.dtype), c_pad)

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
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weights),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
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
