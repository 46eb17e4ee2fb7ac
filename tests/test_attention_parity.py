"""MaskedSparseAttention vs an explicit gather/scatter oracle.

The oracle reproduces the reference MS_WSA semantics (SAST.py:199-255)
literally: per kept window, gather the selected tokens, run attention among
them only, MLP + LayerScale residuals, scatter back; all other positions pass
through norm1. The masked static-shape implementation must match to float
tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sast_tpu.models.sast import MaskedSparseAttention

B, N, HW, C = 2, 4, 6, 8
DIM_HEAD = 4


def _ln(x, scale, bias, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    y = (x - mu) / np.sqrt(var + eps)
    return y * scale + bias


def _gelu(x):
    # tanh approximation (flax default approximate=True)
    return 0.5 * x * (1 + np.tanh(np.sqrt(2 / np.pi) * (x + 0.044715 * x**3)))


def _oracle(x, token_keep, p, enable_cb=False):
    heads = C // DIM_HEAD
    y = _ln(x, p["norm1"]["scale"], p["norm1"]["bias"])
    out = y.copy()
    mlp_glu_k = p["mlp"]["GLU_0"]["Dense_0"]["kernel"]
    mlp_glu_b = p["mlp"]["GLU_0"]["Dense_0"]["bias"]
    mlp_out_k = p["mlp"]["Dense_0"]["kernel"]
    mlp_out_b = p["mlp"]["Dense_0"]["bias"]

    # Pass 1: attention + first residual + MLP output (pre-CB) per window.
    mlp_buf = np.zeros_like(y)
    h_buf = np.zeros_like(y)
    for b in range(B):
        for n in range(N):
            sel = np.where(token_keep[b, n])[0]
            if len(sel) == 0:
                continue
            z = _ln(y[b, n, sel], p["norm2"]["scale"], p["norm2"]["bias"])
            qkv = z @ p["qkv"]["kernel"] + p["qkv"]["bias"]
            qkv = qkv.reshape(len(sel), 3, heads, DIM_HEAD)
            q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]  # (S, heads, dh)
            logits = np.einsum("qhd,khd->hqk", q, k) * DIM_HEAD**-0.5
            e = np.exp(logits - logits.max(-1, keepdims=True))
            attn = e / e.sum(-1, keepdims=True)
            o = np.einsum("hqk,khd->qhd", attn, v).reshape(len(sel), C)
            o = o @ p["proj"]["kernel"] + p["proj"]["bias"]
            h = z + p["ls1"]["gamma"] * o
            u = h @ mlp_glu_k + mlp_glu_b
            val, gate = np.split(u, 2, axis=-1)
            m = (val * _gelu(gate)) @ mlp_out_k + mlp_out_b
            h_buf[b, n, sel] = h
            mlp_buf[b, n, sel] = m

    # Pass 2 (CB): each selected token's MLP output mixes with the mean over
    # ALL token slots of the batch element (unselected = 0).
    for b in range(B):
        for n in range(N):
            sel = np.where(token_keep[b, n])[0]
            if len(sel) == 0:
                continue
            m = mlp_buf[b, n, sel]
            if enable_cb:
                mean = mlp_buf[b].sum(axis=(0, 1)) / (N * HW)
                m = 0.5 * m + 0.5 * mean
            out[b, n, sel] = h_buf[b, n, sel] + p["ls2"]["gamma"] * m
    return out


def _run(enable_cb):
    rng = np.random.RandomState(0)
    x = rng.randn(B, N, HW, C).astype(np.float32)
    keep = rng.rand(B, N, HW) > 0.5
    keep[0, 0] = False  # a fully-dropped window
    keep[0, 1] = True  # a fully-kept window
    keep[1, 2] = False
    keep[1, 2, 3] = True  # single-token window (self-attention only)

    mod = MaskedSparseAttention(
        dim=C, dim_head=DIM_HEAD, enable_cb=enable_cb, dtype=jnp.float32
    )
    variables = mod.init(jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(keep))
    got = np.asarray(
        jax.jit(mod.apply)(variables, jnp.asarray(x), jnp.asarray(keep))
    )
    params = jax.tree.map(np.asarray, variables["params"])
    want = _oracle(x, keep, params, enable_cb=enable_cb)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_masked_attention_matches_gather_oracle():
    _run(enable_cb=False)


def test_masked_attention_with_context_broadcast():
    _run(enable_cb=True)
