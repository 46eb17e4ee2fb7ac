"""SASTBlock internals: where does the 1.46 ms (stage-1 gen4-base) go?

Times sub-computations of the stage-1 SAST block in isolation with the
cliff-aware scan-slope protocol: the scoring+selection pass, one masked
attention layer, its matmul chain alone, the softmax-masked attention
einsums alone, and the partition round-trip transposes.

Usage: python scripts/ablate_block.py
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="gen4")
    ap.add_argument("--size", default="base")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--stage", type=int, default=0)
    ap.add_argument("--L1", type=int, default=20)
    ap.add_argument("--L2", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sast_tpu.config import get_config
    from sast_tpu.models.sast import MaskedSparseAttention, SASTBlock
    from sast_tpu.ops.partition import (
        grid_partition,
        grid_reverse,
        window_partition,
        window_reverse,
    )
    from sast_tpu.ops.sparse import select_windows_and_tokens
    from sast_tpu.ops.posemb import position_embedding_sine
    from sast_tpu.utils.benchmark import sync_dispatch
    from sast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = get_config(args.dataset, args.size)
    bb = cfg.model.backbone
    acfg = bb.attention
    B = args.batch
    s = args.stage
    C = bb.stage_dims[s]
    H = bb.in_res_hw[0] // bb.stage_strides[s]
    W = bb.in_res_hw[1] // bb.stage_strides[s]
    p = tuple(acfg.partition_size)
    N = (H // p[0]) * (W // p[1])
    hw = p[0] * p[1]
    rng = np.random.RandomState(0)

    x = jnp.asarray(rng.randn(B, H, W, C) * 0.1, jnp.bfloat16)
    xw = jnp.asarray(rng.randn(B, N, hw, C) * 0.1, jnp.bfloat16)
    scores = jnp.abs(jnp.asarray(rng.randn(B, N, hw, C), jnp.float32))
    tk = jnp.asarray(rng.rand(B, N, hw) < 0.8)
    wk = jnp.asarray(rng.rand(B, N) < 0.9)
    r1 = jnp.asarray(rng.rand(B, bb.input_channels) * 0.1, jnp.bfloat16)
    pos = jnp.asarray(
        position_embedding_sine(H, W, num_pos_feats=C // 2), jnp.bfloat16
    )

    block = SASTBlock(dim=C, attention=acfg, first_block=True, dtype=jnp.bfloat16)
    v_block = jax.jit(block.init)(jax.random.PRNGKey(0), x, pos, r1)

    attn = MaskedSparseAttention(
        dim=C, dim_head=acfg.dim_head, use_bias=acfg.attention_bias,
        ls_init_value=acfg.ls_init_value, mlp_ratio=acfg.mlp_ratio,
        mlp_act=acfg.mlp_activation, mlp_bias=acfg.mlp_bias,
        norm_eps=acfg.norm_eps, enable_cb=acfg.enable_cb, dtype=jnp.bfloat16,
    )
    v_attn = jax.jit(attn.init)(jax.random.PRNGKey(0), xw, tk, wk)

    num_heads = C // acfg.dim_head
    dh = acfg.dim_head
    qkv_w = jnp.asarray(rng.randn(C, 3 * C) * 0.05, jnp.bfloat16)
    glu_w = jnp.asarray(rng.randn(C, 2 * 160) * 0.05, jnp.bfloat16)
    out_w = jnp.asarray(rng.randn(160, C) * 0.05, jnp.bfloat16)

    def fb(t, acc):  # zero-scaled feedback
        return t * (1 + acc * 1e-30).astype(t.dtype)

    # All operands ride through jit as ONE pytree argument so nothing is a
    # captured constant (XLA specializes on constants and underreports ~16%;
    # docs/DESIGN.md section 6). Each case reads what it needs from `o`.
    OPS = dict(
        x=x, xw=xw, scores=scores, tk=tk, wk=wk, r1=r1, pos=pos,
        v_block=v_block, v_attn=v_attn, qkv_w=qkv_w, glu_w=glu_w, out_w=out_w,
    )

    cases = {}

    def add(name, fn):
        cases[name] = fn

    add("full SASTBlock (2 layers + scoring)", lambda a, o: (
        block.apply(o["v_block"], fb(o["x"], a), o["pos"], o["r1"])[0].sum(dtype=jnp.float32)
    ))
    add("one MaskedSparseAttention layer", lambda a, o: (
        attn.apply(o["v_attn"], fb(o["xw"], a), o["tk"], o["wk"]).sum(dtype=jnp.float32)
    ))
    add("selection (2x softmax thresholds)", lambda a, o: (
        sum(m.sum(dtype=jnp.float32) for m in
            select_windows_and_tokens(fb(o["scores"], a), acfg.bounce))
    ))

    def matmuls_only(a, o):
        qkv_w, glu_w, out_w = o["qkv_w"], o["glu_w"], o["out_w"]
        y = fb(o["xw"], a)
        qkv = (y @ qkv_w).reshape(B, N, hw, 3, num_heads, dh)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        logits = jnp.einsum("bnqhd,bnkhd->bnhqk", q, k)
        attn_p = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bnhqk,bnkhd->bnqhd", attn_p, v).reshape(B, N, hw, C)
        u = o @ glu_w
        val, gate = jnp.split(u, 2, axis=-1)
        m = val * jax.nn.gelu(gate)
        return (m @ out_w).sum(dtype=jnp.float32)

    add("matmul chain (qkv+attn+glu, no norms)", matmuls_only)

    def attn_einsums(a, o):
        y = fb(o["xw"], a).reshape(B, N, hw, num_heads, dh)
        logits = jnp.einsum("bnqhd,bnkhd->bnhqk", y, y)
        attn_p = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bnhqk,bnkhd->bnqhd", attn_p, y).sum(dtype=jnp.float32)

    add("attention einsums + softmax only", attn_einsums)

    def partitions(a, o):
        y = fb(o["x"], a)
        yw = window_partition(y, p)
        y2 = window_reverse(yw, p, (H, W))
        yg = grid_partition(y2, p)
        y3 = grid_reverse(yg, p, (H, W))
        return y3.sum(dtype=jnp.float32)

    add("partition round-trips (4 transposes)", partitions)

    overhead = sync_dispatch()
    print(
        f"# {args.dataset}-{args.size} stage{s + 1} block ablation "
        f"B={B} N={N} hw={hw} C={C}, device={jax.devices()[0]}, "
        f"overhead {overhead * 1e3:.1f} ms"
    )

    def slope(fn):
        def chain(length):
            def run(ops):
                def body(acc, _):
                    return acc + fn(acc, ops), None
                acc, _ = jax.lax.scan(
                    body, jnp.zeros((), jnp.float32), None, length=length
                )
                return acc
            f = jax.jit(run)
            return lambda: f(OPS)
        from sast_tpu.utils.benchmark import slope_time

        return slope_time(chain, args.L1, args.L2)

    for name, fn in cases.items():
        dt = slope(fn)
        print(f"{name:<42} {dt * 1e3:8.3f} ms")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
