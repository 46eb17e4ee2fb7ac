"""A/B the raw-fetch stem kernel on the full gen4 inference step.

The raw variant (ops/pallas/stem_conv.py stem_conv_density_raw_7x4) reads
the NATIVE (B, H, W, C) uint8 tensor: the edge pad (u8, ~123 us/step), the
u8->bf16 convert/relayout pack (~129 us/step, round-4 trace) and the channel
pad all move into the kernel's VMEM, at the cost of 80-lane (4*C) instead of
128-lane matmul operands. This script measures whether the deleted prologue
passes beat the narrower MXU operands end to end.

Timing: the canonical streaming_chunk scan-slope (docs/DESIGN.md §6), same
protocol as bench.py, both variants in one process so the cliff is paid once.
"""

import argparse
import dataclasses
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def measure(model, variables, x, states, L1, L2):
    """Per-step device time via the canonical slope protocol (both chunk
    lengths warmed untimed; every timed call starts from the same initial
    zero states so the sparse selection cannot drift across repetitions)."""
    from sast_tpu.utils.benchmark import slope_time, streaming_chunk

    def make_fn(L):
        compiled = streaming_chunk(model, L).lower(variables, x, states).compile()
        return lambda: compiled(variables, x, states)

    return slope_time(make_fn, L1, L2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="gen4")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--L1", type=int, default=100)
    ap.add_argument("--L2", type=int, default=600)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sast_tpu.config import get_config
    from sast_tpu.data.synthetic import sparse_event_input
    from sast_tpu.models.backbone import zero_states
    from sast_tpu.models.detector import YoloXDetector
    from sast_tpu.ops.pallas.stem_conv import stem_raw_supported
    from sast_tpu.utils.benchmark import sync_dispatch
    from sast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    cfg = get_config(args.dataset, "base")
    bb = cfg.model.backbone
    rng = np.random.RandomState(0)
    x = jnp.asarray(
        sparse_event_input(rng, (args.batch, *bb.in_res_hw, bb.input_channels), 0.9)
    )
    states = zero_states(bb, args.batch, dtype=jnp.bfloat16)

    if not stem_raw_supported(x.shape, x.dtype):
        print(
            "stem_raw_supported rejects this shape/dtype — the raw run "
            "would silently execute the identical default graph; aborting.",
            flush=True,
        )
        return
    if jax.default_backend() != "tpu" or jax.device_count() != 1:
        print("needs a single-TPU backend; aborting.", flush=True)
        return

    sync_dispatch()  # pay the dispatch cliff before any timing

    results = {}
    for raw in (False, True):
        bb2 = dataclasses.replace(bb, stem_raw_fetch=raw)
        model = YoloXDetector(dataclasses.replace(cfg.model, backbone=bb2))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, states)
        dt = measure(model, variables, x, states, args.L1, args.L2)
        results[raw] = dt
        print(
            f"stem_raw_fetch={raw}: {dt * 1e3:.3f} ms/step "
            f"({args.batch / dt:.0f} fps)",
            flush=True,
        )
    speedup = results[False] / results[True]
    print(f"raw-fetch speedup: {speedup:.3f}x")


if __name__ == "__main__":
    main()
