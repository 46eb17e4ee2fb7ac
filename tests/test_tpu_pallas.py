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


# ---------------------------------------------------------------------------
# Stem conv kernel (ops/pallas/stem_conv.py)


@tpu_only
@pytest.mark.parametrize(
    "shape,cout",
    [
        ((4, 384, 640, 20), 64),  # gen4 stem geometry
        ((2, 256, 320, 20), 64),  # gen1 stem geometry
        ((1, 64, 96, 3), 32),     # small odd-channel case
    ],
)
def test_stem_conv_forward_parity_on_tpu(shape, cout):
    from sast_tpu.ops.pallas.stem_conv import (
        stem_conv_7x4,
        stem_conv_xla,
        stem_kernel_supported,
    )

    assert stem_kernel_supported(shape)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
    w = jnp.asarray(rng.randn(7, 7, shape[-1], cout) * 0.05, jnp.bfloat16)
    got = jax.jit(stem_conv_7x4)(x, w)
    ref = jax.jit(stem_conv_xla)(x, w)
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(ref, np.float32),
        atol=0.01 * scale,
    )


@tpu_only
def test_stem_conv_grad_parity_on_tpu():
    from sast_tpu.ops.pallas.stem_conv import stem_conv_7x4, stem_conv_xla

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 256, 320, 20), jnp.bfloat16)
    w = jnp.asarray(rng.randn(7, 7, 20, 64) * 0.05, jnp.float32)

    def loss(fn, x, w):
        return (fn(x, w).astype(jnp.float32) ** 2).sum()

    gk = jax.jit(jax.grad(lambda x, w: loss(stem_conv_7x4, x, w), argnums=(0, 1)))(x, w)
    gr = jax.jit(jax.grad(lambda x, w: loss(stem_conv_xla, x, w), argnums=(0, 1)))(x, w)
    for a, b, name in [(gk[0], gr[0], "gx"), (gk[1], gr[1], "gw")]:
        s = float(jnp.max(jnp.abs(b.astype(jnp.float32)))) + 1e-6
        np.testing.assert_allclose(
            np.asarray(a, np.float32) / s,
            np.asarray(b, np.float32) / s,
            atol=2e-2,
            err_msg=name,
        )


@tpu_only
@pytest.mark.parametrize(
    "shape,cout",
    [
        ((4, 384, 640, 20), 64),  # gen4 stem geometry
        ((2, 256, 320, 20), 64),  # gen1 stem geometry
    ],
)
def test_raw_stem_parity_on_tpu(shape, cout):
    """Raw-fetch variants on hardware: conv vs stem_conv_xla, ratio vs the
    XLA non_zero_ratio, on the production u8 geometries."""
    from sast_tpu.ops.pallas.stem_conv import (
        stem_conv_density_raw_7x4,
        stem_conv_raw_7x4,
        stem_conv_xla,
        stem_raw_supported,
    )
    from sast_tpu.ops.sparse import non_zero_ratio

    assert stem_raw_supported(shape, jnp.uint8)
    rng = np.random.RandomState(0)
    x = jnp.asarray(
        rng.poisson(0.3, shape).clip(0, 255).astype(np.uint8)
    )
    w = jnp.asarray(rng.randn(7, 7, shape[-1], cout) * 0.05, jnp.bfloat16)
    ref = jax.jit(lambda x, w: stem_conv_xla(x.astype(w.dtype), w))(x, w)
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    got = jax.jit(stem_conv_raw_7x4)(x, w)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.01 * scale,
    )
    got_d, ratio = jax.jit(stem_conv_density_raw_7x4)(x, w)
    np.testing.assert_allclose(
        np.asarray(got_d, np.float32), np.asarray(ref, np.float32),
        atol=0.01 * scale,
    )
    r_ref = non_zero_ratio(x, use_pallas=False)
    np.testing.assert_allclose(
        np.asarray(ratio), np.asarray(r_ref), atol=1e-6
    )


@tpu_only
def test_greedy_keep_kernel_on_tpu():
    """Pallas NMS keep-mask vs the XLA scan on hardware, heavy overlap."""
    from sast_tpu.ops.nms import batched_greedy_keep

    rng = np.random.RandomState(0)
    n, k = 8, 1000
    centers = rng.rand(n, 6, 2) * 200
    idx = rng.randint(0, 6, (n, k))
    xy = centers[np.arange(n)[:, None], idx] + rng.randn(n, k, 2) * 8
    wh = 10 + rng.rand(n, k, 2) * 30
    boxes = jnp.asarray(
        np.concatenate([xy - wh / 2, xy + wh / 2], axis=-1), jnp.float32
    )
    scores = np.sort(rng.rand(n, k).astype(np.float32), axis=-1)[:, ::-1].copy()
    scores[:, -100:] = 0.0
    scores = jnp.asarray(scores)
    ref = jax.jit(
        lambda b, s: batched_greedy_keep(b, s, 0.45, use_pallas=False)
    )(boxes, scores)
    got = jax.jit(
        lambda b, s: batched_greedy_keep(b, s, 0.45, use_pallas=True)
    )(boxes, scores)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


# ---------------------------------------------------------------------------
# Dense fused block kernel (ops/pallas/fused_block.py)


@tpu_only
@pytest.mark.parametrize(
    "M,hw,C,heads",
    [
        (256, 80, 64, 2),   # gen1-base stage-1 (B=4)
        (16, 80, 256, 8),   # gen1-base stage-3
        (4, 80, 512, 16),   # gen1-base stage-4 (G=1 tile)
        (1024, 60, 64, 2),  # gen4-base stage-1
    ],
)
def test_fused_block_forward_parity_on_tpu(M, hw, C, heads):
    from sast_tpu.ops.pallas.fused_block import fused_block_xla, fused_window_block

    rng = np.random.RandomState(0)
    inner = max(32, int(np.floor(C * 4 * 2 / 3 / 32) * 32))
    y = jnp.asarray(rng.randn(M, hw, C), jnp.float32)
    tok = jnp.asarray(rng.rand(M, hw) > 0.7)
    params = {
        "ln2_scale": jnp.asarray(rng.rand(C) + 0.5, jnp.float32),
        "ln2_bias": jnp.asarray(rng.randn(C) * 0.1, jnp.float32),
        "wqkv": jnp.asarray(rng.randn(C, 3 * C) * 0.05, jnp.float32),
        "bqkv": jnp.asarray(rng.randn(3 * C) * 0.05, jnp.float32),
        "wproj": jnp.asarray(rng.randn(C, C) * 0.05, jnp.float32),
        "bproj": jnp.asarray(rng.randn(C) * 0.05, jnp.float32),
        "ls1": jnp.full((C,), 1e-2, jnp.float32),
        "wglu": jnp.asarray(rng.randn(C, 2 * inner) * 0.05, jnp.float32),
        "bglu": jnp.asarray(rng.randn(2 * inner) * 0.05, jnp.float32),
        "wout": jnp.asarray(rng.randn(inner, C) * 0.05, jnp.float32),
        "bout": jnp.asarray(rng.randn(C) * 0.05, jnp.float32),
        "ls2": jnp.full((C,), 1e-2, jnp.float32),
    }
    got = jax.jit(lambda y, t, p: fused_window_block(y, t, p, heads, 32, 1e-5))(
        y, tok, params
    )
    ref = jax.jit(lambda y, t, p: fused_block_xla(y, t, p, heads, 32, 1e-5))(
        y, tok, params
    )
    # atol 1e-4: fp32 accumulation-order noise (measured max 5.1e-5 on one
    # element of 160k at the C=512 stage-4 geometry).
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


@tpu_only
def test_fused_block_grad_parity_on_tpu():
    from sast_tpu.ops.pallas.fused_block import fused_block_xla, fused_window_block

    M, hw, C, heads = 64, 80, 64, 2
    rng = np.random.RandomState(0)
    inner = 160
    y = jnp.asarray(rng.randn(M, hw, C), jnp.float32)
    tok = jnp.asarray(rng.rand(M, hw) > 0.7)
    params = {
        "ln2_scale": jnp.asarray(rng.rand(C) + 0.5, jnp.float32),
        "ln2_bias": jnp.asarray(rng.randn(C) * 0.1, jnp.float32),
        "wqkv": jnp.asarray(rng.randn(C, 3 * C) * 0.05, jnp.float32),
        "bqkv": jnp.asarray(rng.randn(3 * C) * 0.05, jnp.float32),
        "wproj": jnp.asarray(rng.randn(C, C) * 0.05, jnp.float32),
        "bproj": jnp.asarray(rng.randn(C) * 0.05, jnp.float32),
        "ls1": jnp.full((C,), 1e-2, jnp.float32),
        "wglu": jnp.asarray(rng.randn(C, 2 * inner) * 0.05, jnp.float32),
        "bglu": jnp.asarray(rng.randn(2 * inner) * 0.05, jnp.float32),
        "wout": jnp.asarray(rng.randn(inner, C) * 0.05, jnp.float32),
        "bout": jnp.asarray(rng.randn(C) * 0.05, jnp.float32),
        "ls2": jnp.full((C,), 1e-2, jnp.float32),
    }
    wgt = jnp.asarray(rng.randn(M, hw, C), jnp.float32)

    def lk(y, p):
        return jnp.sum(fused_window_block(y, tok, p, heads, 32, 1e-5) * wgt)

    def lr(y, p):
        return jnp.sum(fused_block_xla(y, tok, p, heads, 32, 1e-5) * wgt)

    gk = jax.jit(jax.grad(lk, argnums=(0, 1)))(y, params)
    gr = jax.jit(jax.grad(lr, argnums=(0, 1)))(y, params)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gr[0]), atol=5e-5)
    for key in params:
        np.testing.assert_allclose(
            np.asarray(gk[1][key]), np.asarray(gr[1][key]),
            atol=5e-4, rtol=5e-3, err_msg=key,
        )


# Density pyramid kernel (ops/pallas/density.py)


@tpu_only
@pytest.mark.parametrize(
    "shape", [(4, 384, 640, 20), (2, 256, 320, 20)]  # gen4 / gen1 geometries
)
def test_density_ratio_parity_on_tpu(shape):
    from sast_tpu.ops.pallas.density import (
        density_ratio_tpu,
        ratio_kernel_supported,
    )
    from sast_tpu.ops.sparse import non_zero_ratio

    assert ratio_kernel_supported(shape, 4, jnp.uint8)
    rng = np.random.RandomState(0)
    x = (rng.rand(*shape) > 0.9) * rng.randint(1, 11, shape)
    x = jnp.asarray(x.astype(np.uint8))
    got = np.asarray(jax.jit(density_ratio_tpu)(x))
    ref = np.asarray(
        jax.jit(lambda x: non_zero_ratio(x, use_pallas=False))(x)
    )
    np.testing.assert_allclose(got, ref, atol=1e-6)


@tpu_only
@pytest.mark.parametrize(
    "shape,cout",
    [
        ((4, 384, 640, 20), 64),  # gen4 stem geometry
        ((2, 256, 320, 20), 64),  # gen1 stem geometry
    ],
)
def test_fused_stem_density_parity_on_tpu(shape, cout):
    """Fused stem+density kernel on real hardware: conv == stem_conv_7x4's
    reference and ratio == the XLA non_zero_ratio, at both shipped
    geometries, from a single u8 input fetch."""
    from sast_tpu.ops.pallas.stem_conv import (
        stem_conv_density_7x4,
        stem_conv_xla,
        stem_density_fusable,
    )
    from sast_tpu.ops.sparse import non_zero_ratio

    assert stem_density_fusable(shape, jnp.uint8)
    rng = np.random.RandomState(0)
    x = jnp.asarray(
        rng.poisson(0.3, shape).clip(0, 255).astype(np.uint8)
    )
    w = jnp.asarray(rng.randn(7, 7, shape[-1], cout) * 0.05, jnp.bfloat16)
    got, ratio = jax.jit(stem_conv_density_7x4)(x, w)
    ref = jax.jit(stem_conv_xla)(x.astype(jnp.bfloat16), w)
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(ref, np.float32),
        atol=0.01 * scale,
    )
    r_ref = jax.jit(lambda x: non_zero_ratio(x, use_pallas=False))(x)
    np.testing.assert_allclose(
        np.asarray(ratio), np.asarray(r_ref), atol=1e-6
    )
