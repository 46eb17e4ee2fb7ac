"""Opt-in real-TPU regression guard for the Pallas sparse kernels.

Runs both kernel variants (pipelined per-window grid + looped manual-DMA)
and the custom-VJP backward at one real gen1-base stage shape against the
XLA masked path, on actual TPU hardware (VERDICT r1 weak #3 / next #10).

One-command check (wired into .claude/skills/verify):

    SAST_TPU_TESTS=1 python -m pytest tests/test_tpu_pallas.py -q

Off-TPU (the default CPU-forced suite) every test here self-skips.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

tpu_only = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="requires real TPU hardware"
)

# One real shape: gen1-base stage-1 geometry (64 windows of 8x10, C=64).
M, HW, C, DH, HEADS = 64, 80, 64, 32, 2


def _inputs(density=0.3):
    rng = np.random.RandomState(0)
    y = jnp.asarray(rng.randn(M, HW, C), jnp.float32)
    tok = jnp.asarray(rng.rand(M, HW) > (1 - density))
    win = tok.any(-1)
    tok = tok & win[..., None]
    params = {
        "ln2_scale": jnp.asarray(rng.rand(C) + 0.5, jnp.float32),
        "ln2_bias": jnp.asarray(rng.randn(C) * 0.1, jnp.float32),
        "wqkv": jnp.asarray(rng.randn(C, 3 * C) * 0.05, jnp.float32),
        "bqkv": jnp.asarray(rng.randn(3 * C) * 0.05, jnp.float32),
        "wproj": jnp.asarray(rng.randn(C, C) * 0.05, jnp.float32),
        "bproj": jnp.asarray(rng.randn(C) * 0.05, jnp.float32),
        "ls1": jnp.full((C,), 1e-2, jnp.float32),
        "wglu": jnp.asarray(rng.randn(C, 2 * 160) * 0.05, jnp.float32),
        "bglu": jnp.asarray(rng.randn(2 * 160) * 0.05, jnp.float32),
        "wout": jnp.asarray(rng.randn(160, C) * 0.05, jnp.float32),
        "bout": jnp.asarray(rng.randn(C) * 0.05, jnp.float32),
        "ls2": jnp.full((C,), 1e-2, jnp.float32),
    }
    return y, tok, win, params


def _xla_reference(y, tok, win, params):
    """The masked XLA formulation the kernels must reproduce — dense math
    with the same -1e4 key mask + where-passthrough semantics."""
    from sast_tpu.ops.pallas.sparse_block import MASK_VALUE

    keep = tok[..., None]
    mu = jnp.mean(y, -1, keepdims=True)
    var = jnp.mean((y - mu) ** 2, -1, keepdims=True)
    z_ln = (y - mu) * jax.lax.rsqrt(var + 1e-5)
    z_ln = z_ln * params["ln2_scale"] + params["ln2_bias"]
    z = jnp.where(keep, z_ln, y)
    qkv = z @ params["wqkv"] + params["bqkv"]
    q, k, v = jnp.split(qkv, 3, -1)
    q = q.reshape(M, HW, HEADS, DH)
    k = k.reshape(M, HW, HEADS, DH)
    v = v.reshape(M, HW, HEADS, DH)
    logits = jnp.einsum("mqhd,mkhd->mhqk", q, k) * DH ** -0.5
    logits = jnp.where(tok[:, None, None, :], logits, MASK_VALUE)
    attn = jax.nn.softmax(logits, -1)
    ao = jnp.einsum("mhqk,mkhd->mqhd", attn, v).reshape(M, HW, C)
    proj = ao @ params["wproj"] + params["bproj"]
    h1 = z + params["ls1"] * proj
    u = h1 @ params["wglu"] + params["bglu"]
    val, gate = jnp.split(u, 2, -1)
    mlp = (val * jax.nn.gelu(gate)) @ params["wout"] + params["bout"]
    h2 = h1 + params["ls2"] * mlp
    out = jnp.where(keep, h2, y)
    return jnp.where(win[:, None, None], out, y)


@tpu_only
def test_grid_kernel_forward_parity_on_tpu():
    from sast_tpu.ops.pallas.sparse_block import sparse_window_block

    y, tok, win, params = _inputs()
    got = jax.jit(
        lambda *a: sparse_window_block(*a, num_heads=HEADS, dim_head=DH)
    )(y, tok, win, params)
    ref = jax.jit(_xla_reference)(y, tok, win, params)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@tpu_only
def test_looped_kernel_forward_parity_on_tpu():
    from sast_tpu.ops.pallas.sparse_block import sparse_window_block_looped

    y, tok, win, params = _inputs()
    got = jax.jit(
        lambda *a: sparse_window_block_looped(*a, num_heads=HEADS, dim_head=DH)
    )(y, tok, win, params)
    ref = jax.jit(_xla_reference)(y, tok, win, params)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@tpu_only
def test_custom_vjp_grad_parity_on_tpu():
    from sast_tpu.ops.pallas.sparse_block import sparse_window_block

    y, tok, win, params = _inputs()
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(M, HW, C), jnp.float32)

    def loss_k(yin, p):
        return jnp.sum(
            sparse_window_block(yin, tok, win, p, num_heads=HEADS, dim_head=DH) * w
        )

    def loss_r(yin, p):
        return jnp.sum(_xla_reference(yin, tok, win, p) * w)

    gk = jax.jit(jax.grad(loss_k, argnums=(0, 1)))(y, params)
    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1)))(y, params)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gr[0]), atol=5e-5)
    for key in params:
        np.testing.assert_allclose(
            np.asarray(gk[1][key]), np.asarray(gr[1][key]),
            atol=5e-4, rtol=5e-3, err_msg=key,
        )
