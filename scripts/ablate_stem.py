"""Stem-conv strategy shootout: the 7x7/stride-4 overlapping downsample.

scripts/ablate_stage1.py measures the current formulation (edge-pad +
lax conv) at 1.89 ms per step on gen4-base shapes -- ~1% MXU efficiency,
~47% of the whole inference step. The 20 input channels waste 6.4x of the
128-lane vector registers and XLA picks a spatial conv strategy.

Variants (all numerically identical to the current ConvDownsample):
  A. current: edge-pad + conv_general_dilated 7x7 stride 4
  B. im2col: extract 7x7 patches -> one (BHW, 980) @ (980, 64) matmul
  C. space-to-depth: edge-pad by one 4x4 block, fold blocks into channels
     (B, 97, 161, 320), 2x2 VALID conv with a re-scattered kernel ->
     contraction dim 1280 (10 x 128-aligned)

Equivalence is asserted (<1e-2 bf16 tolerance) before timing.
Timing: cliff-aware scan-slope with zero-scaled feedback (docs/DESIGN.md §6).
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--hw", type=int, nargs=2, default=(384, 640))
    ap.add_argument("--cin", type=int, default=20)
    ap.add_argument("--cout", type=int, default=64)
    ap.add_argument("--factor", type=int, default=4)
    ap.add_argument("--L1", type=int, default=20)
    ap.add_argument("--L2", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from sast_tpu.data.synthetic import sparse_event_input
    from sast_tpu.utils.benchmark import slope_time, sync_dispatch
    from sast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    B, (H, W), Cin, Cout, f = args.batch, args.hw, args.cin, args.cout, args.factor
    k = (f - 1) * 2 + 1  # 7
    pad = k // 2  # 3
    rng = np.random.RandomState(0)
    x = jnp.asarray(sparse_event_input(rng, (B, H, W, Cin), 0.9), jnp.bfloat16)
    kern = jnp.asarray(rng.randn(k, k, Cin, Cout) * 0.05, jnp.bfloat16)

    def conv_a(x, kern):
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
        return lax.conv_general_dilated(
            xp, kern, window_strides=(f, f), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def conv_b(x, kern):
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
        patches = lax.conv_general_dilated_patches(
            xp, (k, k), (f, f), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (B, Ho, Wo, Cin*k*k) -- channel-major taps (c, ki, kj)
        Ho, Wo = patches.shape[1], patches.shape[2]
        w = jnp.transpose(kern, (2, 0, 1, 3)).reshape(Cin * k * k, Cout)
        return (patches.reshape(-1, Cin * k * k) @ w).reshape(B, Ho, Wo, Cout)

    # -- space-to-depth --------------------------------------------------------
    # Output (i, j) of variant A reads padded rows [f*i .. f*i+k-1] =
    # original rows [f*i-pad .. f*i+pad]; with f=4, pad=3 that spans exactly
    # blocks (i-1, i). Pad one full block on top/left (edge), fold 4x4 blocks
    # into channels, and a 2x2 VALID conv over 16*Cin channels reproduces it:
    # tap (bi, bj, (ri*f+rj)*Cin + c) = kern[(f*bi+ri) - (f-pad), ...] where
    # taps outside [0, k) are zero (block offset 0 of the -1 block is never
    # read because pad < f).
    def fold(x):
        xp = jnp.pad(x, ((0, 0), (f, 0), (f, 0), (0, 0)), mode="edge")
        Bh = xp.shape[1] // f
        Bw = xp.shape[2] // f
        xb = xp.reshape(B, Bh, f, Bw, f, Cin)
        return jnp.transpose(xb, (0, 1, 3, 2, 4, 5)).reshape(B, Bh, Bw, f * f * Cin)

    def s2d_kernel(kern):
        w = np.zeros((2, 2, f * f * Cin, Cout), np.float32)
        kn = np.asarray(kern, np.float32)
        for bi in range(2):
            for ri in range(f):
                ki = f * bi + ri - (f - pad)  # tap row into the 7x7 kernel
                if not (0 <= ki < k):
                    continue
                for bj in range(2):
                    for rj in range(f):
                        kj = f * bj + rj - (f - pad)
                        if not (0 <= kj < k):
                            continue
                        w[bi, bj, (ri * f + rj) * Cin:(ri * f + rj + 1) * Cin, :] = kn[ki, kj]
        return jnp.asarray(w, jnp.bfloat16)

    w_s2d = s2d_kernel(kern)

    def conv_c(x, _kern):
        xf = fold(x)
        return lax.conv_general_dilated(
            xf, w_s2d, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    # 2x2 conv as explicit 4-shift matmul sum (one fused matmul per tap).
    def conv_d(x, _kern):
        xf = fold(x)
        Bh, Bw = xf.shape[1], xf.shape[2]
        Ho, Wo = Bh - 1, Bw - 1
        w = w_s2d.reshape(4, f * f * Cin, Cout)
        out = 0
        for t, (bi, bj) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
            tile = xf[:, bi:bi + Ho, bj:bj + Wo, :]
            out = out + jnp.einsum("bhwc,co->bhwo", tile, w[t])
        return out

    # E: the realistic full path -- uint8 input, fold in uint8 (4x cheaper
    # transpose than bf16), cast the aligned folded tensor, then 4-matmul.
    x_u8 = jnp.asarray(sparse_event_input(rng, (B, H, W, Cin), 0.9))

    def fold_u8(xu):
        xp = jnp.pad(xu, ((0, 0), (f, 0), (f, 0), (0, 0)), mode="edge")
        Bh = xp.shape[1] // f
        Bw = xp.shape[2] // f
        xb = xp.reshape(B, Bh, f, Bw, f, Cin)
        return jnp.transpose(xb, (0, 1, 3, 2, 4, 5)).reshape(B, Bh, Bw, f * f * Cin)

    def conv_e(xu, _kern):
        xf = fold_u8(xu).astype(jnp.bfloat16)
        Bh, Bw = xf.shape[1], xf.shape[2]
        Ho, Wo = Bh - 1, Bw - 1
        w = w_s2d.reshape(4, f * f * Cin, Cout)
        out = 0
        for t, (bi, bj) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
            tile = xf[:, bi:bi + Ho, bj:bj + Wo, :]
            out = out + jnp.einsum("bhwc,co->bhwo", tile, w[t])
        return out

    def conv_a_u8(xu, kern):
        return conv_a(xu.astype(jnp.bfloat16), kern)

    # F: shifted-concat im2col. Build the (.., 8*8*Cin) patch tensor with two
    # cheap shifted concats of the folded tensor (no gather, no window
    # extraction): pad one full block on every side, fold 4x4 blocks into
    # channels, then concat (H-shift) and concat (W-shift) so position (i, j)
    # holds the 8x8 input block pair covering its 7x7 receptive field; one
    # (BHW, 1280) @ (1280, Cout) matmul finishes. Taps outside the 7x7 window
    # carry zero weight; the extra edge-pad row/col is never read.
    def f_kernel(kern):
        w = np.zeros((2, 2, f * f * Cin, Cout), np.float32)  # (hblk, wblk, ...)
        kn = np.asarray(kern, np.float32)
        for ki in range(k):
            ri, hblk = (1 + ki) % f, (1 + ki) // f
            for kj in range(k):
                rj, wblk = (1 + kj) % f, (1 + kj) // f
                w[hblk, wblk, (ri * f + rj) * Cin:(ri * f + rj + 1) * Cin, :] = kn[ki, kj]
        # channel order after the two concats: wblk-major, then hblk
        return jnp.asarray(
            np.concatenate(
                [np.concatenate([w[0, 0], w[1, 0]], 0),
                 np.concatenate([w[0, 1], w[1, 1]], 0)], 0
            ),
            jnp.bfloat16,
        )

    w_f = f_kernel(kern)  # concrete (kern is a module-level array, not traced)

    def conv_f(x, _kern):
        xp = jnp.pad(x, ((0, 0), (f, f), (f, f), (0, 0)), mode="edge")
        Bh, Bw = xp.shape[1] // f, xp.shape[2] // f
        xb = xp.reshape(B, Bh, f, Bw, f, Cin)
        xf = jnp.transpose(xb, (0, 1, 3, 2, 4, 5)).reshape(B, Bh, Bw, f * f * Cin)
        xh = jnp.concatenate([xf[:, :-1], xf[:, 1:]], axis=-1)
        xw2 = jnp.concatenate([xh[:, :, :-1], xh[:, :, 1:]], axis=-1)
        Ho, Wo = H // f, W // f
        patches = xw2[:, :Ho, :Wo, :]
        return (patches.reshape(-1, 4 * f * f * Cin) @ w_f).reshape(B, Ho, Wo, Cout)

    # G: 49-tap strided-slice accumulation -- no patch tensor at all; each
    # kernel tap is a (BHoWo, Cin) @ (Cin, Cout) matmul on a strided view.
    def conv_g(x, kern):
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
        Ho, Wo = H // f, W // f
        out = 0
        for ki in range(k):
            for kj in range(k):
                tap = lax.slice(
                    xp,
                    (0, ki, kj, 0),
                    (B, ki + (Ho - 1) * f + 1, kj + (Wo - 1) * f + 1, Cin),
                    (1, f, f, 1),
                )
                out = out + jnp.einsum("bhwc,co->bhwo", tap, kern[ki, kj])
        return out

    variants = {"A_current": conv_a, "B_im2col": conv_b, "C_s2d_conv2x2": conv_c,
                "D_s2d_4matmul": conv_d, "F_concat_im2col": conv_f,
                "G_49tap_strided": conv_g}
    variants_u8 = {"A_from_uint8": conv_a_u8, "E_u8fold_4matmul": conv_e}

    ref = np.asarray(jax.jit(conv_a)(x, kern), np.float32)
    scale = np.abs(ref).max()
    for name, fn in variants.items():
        out = np.asarray(jax.jit(fn)(x, kern), np.float32)
        # bf16 outputs of a 980-term contraction differ by accumulation
        # order across strategies; compare relative to the output scale.
        err = np.abs(out - ref).max() / scale
        assert out.shape == ref.shape and err < 2e-2, (name, out.shape, err)
        print(f"{name}: rel|diff| vs A = {err:.4f}")

    overhead = sync_dispatch()
    print(f"# B={B} {H}x{W}x{Cin} -> {H//f}x{W//f}x{Cout}, overhead {overhead*1e3:.1f} ms")

    def slope(fn):
        def chain(length):
            def run():
                def body(acc, _):
                    y = fn(x * (1 + acc * 1e-30).astype(x.dtype), kern)
                    return acc + y.sum(dtype=jnp.float32), None
                acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=length)
                return acc
            return jax.jit(run)
        return slope_time(chain, args.L1, args.L2)

    def slope_u8(fn):
        def chain(length):
            def run():
                def body(acc, _):
                    y = fn(x_u8 + (acc * 0).astype(x_u8.dtype), kern)
                    return acc + y.sum(dtype=jnp.float32), None
                acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=length)
                return acc
            return jax.jit(run)
        return slope_time(chain, args.L1, args.L2)

    gflop = 2 * B * (H // f) * (W // f) * k * k * Cin * Cout / 1e9
    for name, fn in variants.items():
        dt = slope(fn)
        print(f"{name:<18} {dt*1e3:8.3f} ms   ({gflop/dt/1e3:6.1f} TFLOP/s effective)")
        sys.stdout.flush()
    for name, fn in variants_u8.items():
        dt = slope_u8(fn)
        print(f"{name:<18} {dt*1e3:8.3f} ms   ({gflop/dt/1e3:6.1f} TFLOP/s effective)")
        sys.stdout.flush()

    # Pure-traffic floors: what does just touching the data cost?
    reads = {
        "read x bf16 (bad layout)": lambda a: (x * (1 + a * 1e-30).astype(x.dtype)).sum(dtype=jnp.float32),
        "read x uint8 (bad layout)": lambda a: (x_u8 + (a * 0).astype(jnp.uint8)).astype(jnp.float32).sum(),
        "fold uint8 + read": lambda a: fold_u8(x_u8 + (a * 0).astype(jnp.uint8)).astype(jnp.float32).sum(),
        "cast u8->bf16 + write + read": lambda a: ((x_u8 + (a * 0).astype(jnp.uint8)).astype(jnp.bfloat16) * jnp.bfloat16(1.0000305)).sum(dtype=jnp.float32),
    }
    for name, fn in reads.items():
        def chain(length, fn=fn):
            def run():
                def body(acc, _):
                    return acc + fn(acc), None
                acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=length)
                return acc
            return jax.jit(run)
        dt = slope_time(chain, args.L1, args.L2)
        print(f"{name:<28} {dt*1e3:8.3f} ms")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
