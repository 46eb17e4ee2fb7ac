"""Stage-1 component costs: stem conv, density ratio, SAST block, ConvLSTM.

Times each stage-1 component of the gen4-base model in isolation with the
cliff-aware scan-slope protocol (zero-scaled feedback defeats hoisting).
Stage 1 is ~70% of the full inference step (scripts/ablate_backbone.py),
so this decomposition directs optimization.

Usage: python scripts/ablate_stage1.py
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
    ap.add_argument("--sparsity", type=float, default=0.9)
    ap.add_argument("--L1", type=int, default=20)
    ap.add_argument("--L2", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sast_tpu.config import get_config
    from sast_tpu.data.synthetic import sparse_event_input
    from sast_tpu.models.layers import ConvDownsample, DWSConvLSTM2d
    from sast_tpu.models.sast import SASTBlock
    from sast_tpu.ops.sparse import non_zero_ratio
    from sast_tpu.ops.posemb import position_embedding_sine
    from sast_tpu.utils.benchmark import sync_dispatch
    from sast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = get_config(args.dataset, args.size)
    bb = cfg.model.backbone
    B = args.batch
    C1 = bb.stage_dims[0]
    H0, W0 = bb.in_res_hw
    H1, W1 = H0 // bb.stem_patch_size, W0 // bb.stem_patch_size
    rng = np.random.RandomState(0)
    x_raw = jnp.asarray(
        sparse_event_input(rng, (B, H0, W0, bb.input_channels), args.sparsity)
    )
    x1 = jnp.asarray(rng.randn(B, H1, W1, C1) * 0.1, jnp.bfloat16)
    r1 = jnp.asarray(rng.rand(B, bb.input_channels) * 0.1, jnp.bfloat16)
    pos = jnp.asarray(
        position_embedding_sine(H1, W1, num_pos_feats=C1 // 2), jnp.bfloat16
    )

    stem = ConvDownsample(
        dim_out=C1, downsample_factor=bb.stem_patch_size,
        overlap=bb.downsample_overlap, norm_affine=bb.downsample_norm_affine,
        dtype=jnp.bfloat16,
    )
    block = SASTBlock(
        dim=C1, attention=bb.attention, first_block=True, dtype=jnp.bfloat16
    )
    lstm = DWSConvLSTM2d(
        dim=C1, dws_conv=bb.lstm.dws_conv,
        dws_conv_only_hidden=bb.lstm.dws_conv_only_hidden,
        dws_conv_kernel_size=bb.lstm.dws_conv_kernel_size,
        dtype=jnp.bfloat16,
    )
    h0 = jnp.zeros((B, H1, W1, C1), jnp.bfloat16)
    c0 = jnp.zeros((B, H1, W1, C1), jnp.float32)

    v_stem = jax.jit(stem.init)(jax.random.PRNGKey(0), x_raw)
    v_block = jax.jit(block.init)(jax.random.PRNGKey(0), x1, pos, r1)
    v_lstm = jax.jit(lstm.init)(jax.random.PRNGKey(0), x1, (h0, c0))

    def slope(make):
        # make(length) returns (fn, call_args): operands are runtime
        # arguments (captured constants underreport ~16%; DESIGN.md sec 6).
        def build(length):
            fn, call_args = make(length)
            f = jax.jit(fn)
            return lambda: f(*call_args)
        from sast_tpu.utils.benchmark import slope_time

        return slope_time(build, args.L1, args.L2)

    def mk_stem(length):
        def run(v_stem, x_raw):
            def body(acc, _):
                y = stem.apply(v_stem, x_raw + (acc * 0).astype(x_raw.dtype))
                return acc + y.sum(dtype=jnp.float32), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=length)
            return acc
        return run, (v_stem, x_raw)

    def mk_ratio(length):
        def run(x_raw):
            def body(acc, _):
                r = non_zero_ratio(x_raw + (acc * 0).astype(x_raw.dtype), num_stages=4)
                return acc + r.sum(dtype=jnp.float32), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=length)
            return acc
        return run, (x_raw,)

    def mk_block(length):
        def run(v_block, x1, pos, r1):
            def body(acc, _):
                y, p, _m = block.apply(v_block, x1 * (1 + acc * 1e-30).astype(x1.dtype), pos, r1)
                return acc + y.sum(dtype=jnp.float32) + p, None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=length)
            return acc
        return run, (v_block, x1, pos, r1)

    def mk_lstm(length):
        def run(v_lstm, x1, h0, c0):
            def body(carry, _):
                (h, c), acc = carry
                h2, c2 = lstm.apply(v_lstm, x1 * (1 + acc * 1e-30).astype(x1.dtype), (h, c))
                return ((h2, c2), acc + h2.sum(dtype=jnp.float32)), None
            (_, acc), _ = jax.lax.scan(
                body, ((h0, c0), jnp.zeros((), jnp.float32)), None, length=length
            )
            return acc
        return run, (v_lstm, x1, h0, c0)

    overhead = sync_dispatch()
    print(
        f"# {args.dataset}-{args.size} stage-1 components, B={B}, "
        f"stage1 {H1}x{W1}x{C1}, device={jax.devices()[0]}, "
        f"overhead {overhead * 1e3:.1f} ms"
    )
    for name, mk in [
        (f"stem conv {H0}x{W0}x{bb.input_channels} -> {H1}x{W1}x{C1}", mk_stem),
        ("non_zero_ratio pyramid (full-res input)", mk_ratio),
        ("SASTBlock (window+grid attn, scoring)", mk_block),
        ("DWSConvLSTM2d", mk_lstm),
    ]:
        dt = slope(mk)
        print(f"{name:<48} {dt * 1e3:8.3f} ms")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
