"""Pallas TPU kernel: the dense masked SAST block, tiled over window groups.

This kernel computes the ENTIRE block (LN2-where, qkv, per-head masked
softmax-attention, proj + LayerScale residual, gated MLP + LayerScale
residual, keep-where passthrough) for a tile of G windows per grid program,
entirely in VMEM: HBM traffic collapses to one read of y + one write of the
output. The big matmuls run at (G*hw, C) — MXU-sized — and the per-window
attention einsums batch over the G tile windows.

Measured outcome (v5e, scan-slope protocol, argument-passed operands): the
kernel is 6-11% faster than the XLA masked path at the gen4 stage-1/2
layer geometries (0.552 vs 0.590 ms at M=1024 hw=60 C=64; 0.243 vs 0.273 ms
at M=256 C=128) and ties at stage-3 — but NEUTRAL at the full-model level,
where XLA overlaps the block's HBM traffic with neighboring ops. It is
therefore opt-in (`attention.fused_block`), kept for geometries where the
block dominates (larger C / hw than the shipped recipes) and as the
hardware-parity-tested fused formulation.

Alignment rules (learned from a 58 MB kernel-stack OOM at the gen4 stage-1
geometry): every in-kernel tensor keeps sublane (window length padded to a
multiple of 8) and lane (channels padded to 128) alignment, and channel
padding is pushed into the WEIGHTS (zero rows/cols/vector tails) so the
kernel body contains no channel slicing or concatenation — otherwise every
op boundary manufactures a relayout copy and Mosaic's stack allocator keeps
all of them live (measured ~3.6 MB of stack per window at hw=60).

Unlike ops/pallas/sparse_block.py (the opt-in window-skipping kernel whose
serial per-window programs lose to batched XLA at the shipped geometries),
this kernel keeps the dense masked formulation — compute for every window,
selection by masking — so it is a drop-in replacement for the default path
at any density, with no work list and no scalar prefetch.

Numerics match block_math: LayerNorm statistics in fp32 over the real
channels, matmuls in the compute dtype (bf16 weights as passed) with fp32
accumulation, the reference -1e4 key mask (SAST.py:225).

Training: ``fused_window_block`` carries a ``jax.custom_vjp`` whose
backward is the VJP of the XLA formulation — exact gradients; the forward
win still applies under the trainer's remat policy (the recomputed forward
is the kernel).
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
SUBLANE = 8
# Windows per merged attention dot (see the attention note in _tile_kernel).
ATTN_BATCH = 4


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _v2d(x, n=None):
    x = x.reshape(1, -1).astype(jnp.float32)
    if n is not None and x.shape[-1] != n:
        x = jnp.pad(x, ((0, 0), (0, n - x.shape[-1])))
    return x


def choose_tile(M: int, hw_pad: int, c_pad: int, inner2: int) -> int:
    """Largest divisor of M (<= 16) within the in-kernel VMEM stack budget.

    The dominant live fp32 buffers scale with G*hw_pad: y/z/h1/out (c_pad
    wide), qkv (3 c_pad), u/m (inner2 = 2*inner wide, the widest). Budget
    their sum to ~6 MB, leaving room for weights, the double-buffered DMA
    blocks, and Mosaic's own temporaries within the 16 MB VMEM.
    """
    per_window = hw_pad * (5 * c_pad + 3 * c_pad + 2 * inner2) * 4
    g = 1
    for cand in range(2, 17):
        if M % cand == 0 and cand * per_window <= 6 << 20:
            g = cand
    return g


def _tile_kernel(
    y_ref,       # (G, hw_pad, c_pad) VMEM, input dtype (zero-padded)
    keep_ref,    # (G, hw_pad, SUBLANE) f32 VMEM
    ln2s_ref, ln2b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    ls1_ref, wglu_ref, bglu_ref, wout_ref, bout_ref, ls2_ref,
    out_ref,     # (G, hw_pad, c_pad) VMEM
    *,
    c_real: int,
    num_heads: int,
    dim_head: int,
    norm_eps: float,
):
    g, hw, c_pad = y_ref.shape
    y = y_ref[...].astype(jnp.float32)
    keep = keep_ref[...][:, :, :1] > 0.5  # (G, hw, 1)

    # LN2 on kept tokens. Channel padding is zero, so sums over c_pad equal
    # sums over the real channels; stats divide by c_real. Padded channels
    # of z_ln are zeroed by the (padded) scale/bias.
    mu = jnp.sum(y, axis=-1, keepdims=True) / c_real
    var = jnp.sum((y - mu) ** 2, axis=-1, keepdims=True) / c_real - (
        mu * mu * (c_pad - c_real) / c_real
    )
    # (padded channels contribute (0-mu)^2 = mu^2 each to the y-mu sum;
    # subtract their excess so var matches the real-channel variance.)
    z_ln = (y - mu) * jax.lax.rsqrt(var + norm_eps)
    z_ln = z_ln * ln2s_ref[0] + ln2b_ref[0]
    z = jnp.where(keep, z_ln, y)

    wq = wqkv_ref[...]
    z2 = z.reshape(g * hw, c_pad).astype(wq.dtype)
    qkv = (
        jnp.dot(z2, wq, preferred_element_type=jnp.float32) + bqkv_ref[0]
    ).reshape(g, hw, 3 * c_real)

    # ---- attention -------------------------------------------------------
    # g-batched dot_general is FORBIDDEN here: Mosaic lowers it as a
    # broadcast-multiply-reduce, allocating a (g, hw, hw, dh) fp32 stack
    # buffer per dot (~2 MB/window — measured 60 MB of scoped VMEM at
    # G=16). Instead, merge sub-batches of ``a`` windows into ONE 2D MXU
    # dot over (a*hw, dh) and mask the cross-window logit blocks with the
    # same -1e4 the reference uses for unselected keys: e^(-1e4) underflows
    # to exactly 0 in fp32 softmax, so the result is bit-identical to
    # per-window attention while the dot stays a single well-shaped MXU op
    # (the a x FLOP overshoot is trivial against the round trips saved).
    scale = dim_head ** -0.5
    a = min(g, max(1, ATTN_BATCH))
    while g % a:
        a -= 1
    n = a * hw
    # Same-window mask for one sub-batch: block-diagonal over hw-sized
    # blocks, AND the per-key keep mask (computed per chunk below).
    row_win = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) // hw
    col_win = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) // hw
    same_win = row_win == col_win

    chunk_outs = []
    for j in range(g // a):
        qkv_c = qkv[j * a : (j + 1) * a].reshape(n, 3 * c_real)
        km = keep[j * a : (j + 1) * a].reshape(1, n)
        mask = jnp.logical_and(same_win, km)
        head_outs = []
        for h in range(num_heads):
            lo = h * dim_head
            q = qkv_c[:, lo : lo + dim_head]
            k = qkv_c[:, c_real + lo : c_real + lo + dim_head]
            v = qkv_c[:, 2 * c_real + lo : 2 * c_real + lo + dim_head]
            logits = (
                jax.lax.dot_general(
                    q, k,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )  # (n, n)
            logits = jnp.where(mask, logits, MASK_VALUE)
            attn = jax.nn.softmax(logits, axis=-1)
            head_outs.append(
                jnp.dot(
                    attn.astype(v.dtype), v,
                    preferred_element_type=jnp.float32,
                )
            )
        chunk_outs.append(
            head_outs[0]
            if num_heads == 1
            else jnp.concatenate(head_outs, axis=-1)
        )
    attn_out = (
        chunk_outs[0]
        if len(chunk_outs) == 1
        else jnp.concatenate(chunk_outs, axis=0)
    )  # (g*hw, c_real)

    wp = wproj_ref[...]  # (c_real, c_pad) — columns padded
    proj = (
        jnp.dot(
            attn_out.astype(wp.dtype),
            wp,
            preferred_element_type=jnp.float32,
        )
        + bproj_ref[0]
    ).reshape(g, hw, c_pad)
    h1 = z + ls1_ref[0] * proj  # padded channels stay 0 (ls1/bias padded 0)

    wg = wglu_ref[...]  # (c_pad, 2*inner)
    u = (
        jnp.dot(
            h1.reshape(g * hw, c_pad).astype(wg.dtype),
            wg,
            preferred_element_type=jnp.float32,
        )
        + bglu_ref[0]
    )
    inner = u.shape[-1] // 2
    val, gate = u[:, :inner], u[:, inner:]
    m = val * jax.nn.gelu(gate)
    wo = wout_ref[...]  # (inner, c_pad)
    mlp = (
        jnp.dot(m.astype(wo.dtype), wo, preferred_element_type=jnp.float32)
        + bout_ref[0]
    ).reshape(g, hw, c_pad)
    h2 = h1 + ls2_ref[0] * mlp

    out_ref[...] = jnp.where(keep, h2, y).astype(out_ref.dtype)


def _stage_weights(params: Dict[str, jnp.ndarray], c_pad: int, C: int):
    """Pad every weight so the kernel body needs no channel slicing:
    row-padded where C is the contraction dim, column-padded where C is the
    output dim, zero tails on all C-length vectors."""
    wqkv = params["wqkv"]
    wproj = params["wproj"]
    wglu = params["wglu"]
    wout = params["wout"]
    if c_pad != C:
        wqkv = jnp.pad(wqkv, ((0, c_pad - C), (0, 0)))
        wproj = jnp.pad(wproj, ((0, 0), (0, c_pad - C)))
        wglu = jnp.pad(wglu, ((0, c_pad - C), (0, 0)))
        wout = jnp.pad(wout, ((0, 0), (0, c_pad - C)))
    return [
        _v2d(params["ln2_scale"], c_pad),
        _v2d(params["ln2_bias"], c_pad),
        wqkv,
        _v2d(params["bqkv"]),
        wproj,
        _v2d(params["bproj"], c_pad),
        _v2d(params["ls1"], c_pad),
        wglu,
        _v2d(params["bglu"]),
        wout,
        _v2d(params["bout"], c_pad),
        _v2d(params["ls2"], c_pad),
    ]


def _fused_fwd(y, token_keep, params, num_heads, dim_head, norm_eps):
    M, hw, C = y.shape
    c_pad = _round_up(C, LANE)
    hw_pad = _round_up(hw, SUBLANE)
    inner2 = params["wglu"].shape[-1]
    G = choose_tile(M, hw_pad, c_pad, inner2)

    y_in = y
    if c_pad != C or hw_pad != hw:
        y_in = jnp.pad(y, ((0, 0), (0, hw_pad - hw), (0, c_pad - C)))
    # 8-lane keep plane: Mosaic pads block lanes to 128 in VMEM anyway,
    # but the narrow HBM array costs 1/16th the traffic of a 128-wide one
    # (2 MB vs 33 MB at the gen4 stage-1 geometry).
    keep_f32 = jnp.broadcast_to(
        token_keep.astype(jnp.float32)[..., None], (M, hw, SUBLANE)
    )
    if hw_pad != hw:
        keep_f32 = jnp.pad(keep_f32, ((0, 0), (0, hw_pad - hw), (0, 0)))
    weights = _stage_weights(params, c_pad, C)

    kernel = functools.partial(
        _tile_kernel,
        c_real=C,
        num_heads=num_heads,
        dim_head=dim_head,
        norm_eps=norm_eps,
    )
    out = pl.pallas_call(
        kernel,
        grid=(M // G,),
        in_specs=[
            pl.BlockSpec((G, hw_pad, c_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((G, hw_pad, SUBLANE), lambda i: (i, 0, 0)),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weights),
        out_specs=pl.BlockSpec((G, hw_pad, c_pad), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(y_in.shape, y.dtype),
    )(y_in, keep_f32, *weights)
    if c_pad != C or hw_pad != hw:
        out = out[:, :hw, :C]
    return out


def fused_block_xla(y, token_keep, params, num_heads, dim_head, norm_eps):
    """The identical block math in plain XLA (VJP source + CPU fallback)."""
    M, hw, C = y.shape
    keep = token_keep[..., None]
    y32 = y.astype(jnp.float32)
    mu = jnp.mean(y32, -1, keepdims=True)
    var = jnp.mean((y32 - mu) ** 2, -1, keepdims=True)
    z_ln = (y32 - mu) * jax.lax.rsqrt(var + norm_eps)
    z_ln = z_ln * params["ln2_scale"] + params["ln2_bias"]
    z = jnp.where(keep, z_ln, y32)

    dt = params["wqkv"].dtype
    qkv = z.astype(dt) @ params["wqkv"] + params["bqkv"].astype(jnp.float32)
    qkv = qkv.reshape(M, hw, 3, num_heads, dim_head)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    scale = dim_head ** -0.5
    logits = jnp.einsum("mqhd,mkhd->mhqk", q, k) * scale
    logits = jnp.where(token_keep[:, None, None, :], logits, MASK_VALUE)
    attn = jax.nn.softmax(logits, axis=-1)
    attn_out = jnp.einsum("mhqk,mkhd->mqhd", attn, v).reshape(M, hw, C)
    proj = attn_out.astype(dt) @ params["wproj"] + params["bproj"].astype(
        jnp.float32
    )
    h1 = z + params["ls1"] * proj

    u = h1.astype(dt) @ params["wglu"] + params["bglu"].astype(jnp.float32)
    inner = u.shape[-1] // 2
    m = u[..., :inner] * jax.nn.gelu(u[..., inner:])
    mlp = m.astype(dt) @ params["wout"] + params["bout"].astype(jnp.float32)
    h2 = h1 + params["ls2"] * mlp
    return jnp.where(keep, h2, y32).astype(y.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_window_block(y, token_keep, params, num_heads, dim_head, norm_eps):
    """Dense masked SAST block, Pallas tiled forward + XLA-VJP backward.

    y: (M, hw, C) norm1-ed window tokens; token_keep: (M, hw) bool.
    params: the weight dict of models/sast.py (wqkv/wglu/... pre-cast to the
    compute dtype, vectors fp32). Returns (M, hw, C) in y.dtype.
    """
    return _fused_fwd(y, token_keep, params, num_heads, dim_head, norm_eps)


def _vjp_fwd(y, token_keep, params, num_heads, dim_head, norm_eps):
    out = _fused_fwd(y, token_keep, params, num_heads, dim_head, norm_eps)
    return out, (y, token_keep, params)


def _vjp_bwd(num_heads, dim_head, norm_eps, residuals, g):
    y, token_keep, params = residuals
    _, vjp = jax.vjp(
        lambda yy, pp: fused_block_xla(
            yy, token_keep, pp, num_heads, dim_head, norm_eps
        ),
        y,
        params,
    )
    gy, gparams = vjp(g.astype(y.dtype))
    return gy, None, gparams


fused_window_block.defvjp(_vjp_fwd, _vjp_bwd)
