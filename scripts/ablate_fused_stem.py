"""A/B the fused stem+density Pallas kernel on the full gen4 inference step.

The fused variant (ops/pallas/stem_conv.py stem_conv_density_7x4) computes
the 4-scale density pyramid from the stem kernel's own input fetch, deleting
non_zero_ratio's separate full-resolution HBM read (the input tensor is the
largest in the step: B*384*640*20 u8 = 19.7 MB/frame read twice -> once).

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
    """Per-step device time via the canonical slope protocol.

    Built on utils.benchmark.slope_time (same code path as bench.py's
    compute_fps): both chunk lengths are warmed untimed, timing uses
    perf_counter, and every timed call starts from the SAME initial zero
    states so the sparse selection cannot drift across repetitions."""
    from sast_tpu.utils.benchmark import slope_time, streaming_chunk

    def make_fn(L):
        compiled = streaming_chunk(model, L).lower(variables, x, states).compile()
        return lambda: compiled(variables, x, states)

    return slope_time(make_fn, L1, L2)


def main() -> None:
    ap = argparse.ArgumentParser()
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
    from sast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    cfg = get_config("gen4", "base")
    bb = cfg.model.backbone
    rng = np.random.RandomState(0)
    x = jnp.asarray(
        sparse_event_input(rng, (args.batch, *bb.in_res_hw, bb.input_channels), 0.9)
    )
    states = zero_states(bb, args.batch, dtype=jnp.bfloat16)

    from sast_tpu.models.backbone import _fused_stem_density_dispatch
    from sast_tpu.utils.benchmark import sync_dispatch

    # Pay the dispatch cliff before any timing (flips the tunnel into
    # synchronous per-execution mode so block_until_ready is real).
    sync_dispatch()

    results = {}
    for fused in (False, True):
        bb2 = dataclasses.replace(bb, fuse_stem_density=fused)
        if fused and not _fused_stem_density_dispatch(bb2, x):
            # Every gate in the dispatch (stem_pallas, ratio_pallas, TPU
            # backend, single device, fusable shape) must hold, or the
            # "fused" run would silently execute the identical unfused
            # graph and report a noise-driven ~1.0x "speedup".
            print(
                "fuse_stem_density=True would not dispatch the fused kernel "
                "on this backend/shape — A/B would compare identical graphs; "
                "aborting.",
                flush=True,
            )
            return
        model = YoloXDetector(
            dataclasses.replace(cfg.model, backbone=bb2)
        )
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, states)
        dt = measure(model, variables, x, states, args.L1, args.L2)
        results[fused] = dt
        print(
            f"fuse_stem_density={fused}: {dt * 1e3:.3f} ms/step "
            f"({args.batch / dt:.0f} fps)",
            flush=True,
        )
    speedup = results[False] / results[True]
    print(f"fused speedup: {speedup:.3f}x")


if __name__ == "__main__":
    main()
