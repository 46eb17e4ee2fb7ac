"""MXU calibration: achievable matmul TFLOP/s on this chip via XLA.

Every stem-conv strategy plateaus at ~32 TFLOP/s actual (ablate_stem.py),
so before attributing that to convolution lowering, measure what plain
matmuls of various shapes achieve. Uses the cliff-aware scan-slope
protocol with feedback.

Usage: python scripts/ablate_mxu.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from sast_tpu.utils.benchmark import sync_dispatch
    from sast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.RandomState(0)

    def mk(shape, dtype=jnp.bfloat16):
        return jnp.asarray(rng.randn(*shape) * 0.05, dtype)

    cases = []  # (name, a, b, flops)

    for M, K, N in [
        (8192, 8192, 8192),
        (61440, 1280, 64),
        (61440, 1280, 128),
        (61440, 1280, 256),
        (61440, 980, 64),
        (61440, 64, 192),   # stage-1 qkv
        (61440, 64, 320),   # stage-1 GLU
        (2048 * 60, 32, 60),  # attention-logit shape flattened
    ]:
        a, b = mk((M, K)), mk((K, N))
        cases.append((f"bf16 ({M}x{K})@({K}x{N})", a, b, 2 * M * K * N))
    a, b = mk((8192, 8192), jnp.float32), mk((8192, 8192), jnp.float32)
    cases.append(("fp32 (8192^2)@(8192^2)", a, b, 2 * 8192 ** 3))

    overhead = sync_dispatch()
    print(f"# device={jax.devices()[0]}, overhead {overhead * 1e3:.1f} ms")

    L1, L2 = 20, 100

    for name, a, b, flops in cases:
        # Operands are ARGUMENTS, not closure constants: jit would embed
        # closed-over arrays into the computation proto and the tunnel's
        # remote_compile rejects big request bodies (HTTP 413).
        def chain(length):
            def run(a, b):
                def body(acc, _):
                    y = a * (1 + acc * 1e-30).astype(a.dtype) @ b
                    # Full-output reduce: a [0,0] probe would let XLA
                    # slice-propagate through the dot and compute one row.
                    return acc + y.sum(dtype=jnp.float32), None
                acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=length)
                return acc
            return jax.jit(run)
        from sast_tpu.utils.benchmark import slope_time

        def make_fn(L, a=a, b=b):
            f = chain(L)
            return lambda: f(a, b)

        dt = slope_time(make_fn, L1, L2)
        print(f"{name:<34} {dt * 1e3:9.3f} ms  {flops / dt / 1e12:7.1f} TFLOP/s")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
