"""Capture an xprof trace of the gen4 streaming inference chunk and print a
per-op time table (VERDICT r3 item 2: nobody has shown where the 4.57 ms
step goes).

Usage:
    python scripts/profile_inference.py [--out /tmp/sast_trace] [--length 50]

Prints the top-K HLO ops by self time (device), grouped both raw and by
category, so relayout/copy/fusion costs are attributable to model stages.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import os
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def capture(out_dir: str, length: int, batch: int, sparsity: float) -> None:
    import jax
    import jax.numpy as jnp

    from sast_tpu.config import get_config
    from sast_tpu.data.synthetic import sparse_event_input
    from sast_tpu.models.backbone import zero_states
    from sast_tpu.models.detector import YoloXDetector
    from sast_tpu.utils.benchmark import streaming_chunk, sync_dispatch
    from sast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = get_config("gen4", "base")
    model = YoloXDetector(cfg.model)
    bb = cfg.model.backbone
    rng = np.random.RandomState(0)
    x = jnp.asarray(
        sparse_event_input(rng, (batch, *bb.in_res_hw, bb.input_channels), sparsity)
    )
    states = zero_states(bb, batch, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, states)
    run = streaming_chunk(model, length)
    run_c = run.lower(variables, x, states).compile()

    # warmup + flip to synchronous dispatch so the traced run is real work
    st, acc = run_c(variables, x, states)
    jax.block_until_ready(acc)
    sync_dispatch()
    st, acc = run_c(variables, x, st)
    jax.block_until_ready(acc)

    jax.profiler.start_trace(out_dir)
    st, acc = run_c(variables, x, st)
    jax.block_until_ready(acc)
    jax.profiler.stop_trace()
    print(f"trace captured to {out_dir} (chunk of {length} frames, B={batch})")


def _find_xplane(out_dir: str) -> str:
    paths = sorted(
        glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {out_dir}")
    return paths[-1]


def _classify(name: str) -> str:
    """Coarse category from the HLO op name."""
    n = name.lower()
    for key, cat in (
        ("fusion", "fusion"),
        ("convolution", "conv"),
        ("conv", "conv"),
        ("dot", "matmul"),
        ("copy", "copy/relayout"),
        ("transpose", "copy/relayout"),
        ("bitcast", "copy/relayout"),
        ("reshape", "copy/relayout"),
        ("custom-call", "custom-call"),
        ("dynamic-update-slice", "dus"),
        ("dynamic-slice", "ds"),
        ("reduce", "reduce"),
        ("all-reduce", "collective"),
        ("scatter", "scatter"),
        ("gather", "gather"),
        ("select", "elementwise"),
        ("broadcast", "elementwise"),
        ("convert", "elementwise"),
        ("infeed", "infeed/outfeed"),
        ("outfeed", "infeed/outfeed"),
    ):
        if key in n:
            return cat
    return "other"


def report(out_dir: str, length: int, top_k: int = 40) -> None:
    """Parse the xplane proto directly: sum durations of the device plane's
    'XLA Ops' line events, grouped by op (metadata) name."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xplane = _find_xplane(out_dir)
    space = xplane_pb2.XSpace()
    with open(xplane, "rb") as f:
        space.ParseFromString(f.read())
    plane = next(
        (p for p in space.planes if p.name.startswith("/device:TPU")), None
    )
    if plane is None:
        raise RuntimeError(
            f"no TPU device plane in {xplane}; planes: "
            f"{[p.name for p in space.planes]}"
        )
    meta = plane.event_metadata
    dur_by_op = defaultdict(float)
    count_by_op = defaultdict(int)
    module_span_ps = 0
    for line in plane.lines:
        if line.name == "XLA Modules":
            for ev in line.events:
                module_span_ps += ev.duration_ps
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            name = meta[ev.metadata_id].name
            dur_by_op[name] += ev.duration_ps / 1e6  # -> us
            count_by_op[name] += 1
    by_op = sorted(
        ((t, n) for n, t in dur_by_op.items()), reverse=True
    )
    total = sum(t for t, _ in by_op)
    print(
        f"\nXLA Ops busy time: {total / 1e3:.2f} ms total, "
        f"{total / 1e3 / length:.3f} ms/frame over {length} frames"
        + (
            f"; module span {module_span_ps / 1e9:.2f} ms "
            f"({module_span_ps / 1e9 / length:.3f} ms/frame)"
            if module_span_ps
            else ""
        )
    )
    print(f"\ntop {top_k} ops by busy time:")
    print(f"{'us':>12} {'us/frame':>9} {'%':>6} {'count':>6}  op")
    for t, name in by_op[:top_k]:
        print(
            f"{t:12.0f} {t / length:9.1f} {100 * t / total:6.2f} "
            f"{count_by_op[name]:6d}  {name[:100]}"
        )

    by_cat = defaultdict(float)
    for t, name in by_op:
        by_cat[_classify(name)] += t
    print("\nby category:")
    for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{t:12.0f} {t / length:9.1f} {100 * t / total:6.2f}  {cat}")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="/tmp/sast_trace")
    ap.add_argument("--length", type=int, default=50)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--sparsity", type=float, default=0.9)
    ap.add_argument("--report-only", action="store_true")
    ap.add_argument("--top-k", type=int, default=40)
    args = ap.parse_args()
    if not args.report_only:
        capture(args.out, args.length, args.batch, args.sparsity)
    report(args.out, args.length, args.top_k)


if __name__ == "__main__":
    main()
