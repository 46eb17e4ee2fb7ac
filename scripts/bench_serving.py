"""Device-resident throughput of the FULL serving step: raw events in,
detections out.

The deployable unit (`sast_tpu/serving.py` StreamingDetector) is one device
program per frame batch: event tensorization (fused scatter-add histogram)
-> pad -> recurrent backbone with carried LSTM state -> PAFPN -> head ->
decode -> NMS. This script measures that whole program's device time — the
number a pod-serving capacity plan needs — with the same cliff-aware
scan-slope protocol as bench.py (docs/DESIGN.md §6): the per-frame cost is
the slope between two scan-chained chunk lengths, which cancels the ~30 ms
per-dispatch tunnel overhead of this environment exactly.

Synthetic event batches are generated ON DEVICE (uniform x/y/p, sorted t),
so no host->device traffic pollutes the measurement; recurrent state is
threaded through the scan exactly as live streaming threads it.

Usage:
    python scripts/bench_serving.py [--dataset gen1] [--streams 8]
        [--events 10000] [--L1 30] [--L2 150]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="gen1")
    ap.add_argument("--size", default="base")
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--events", type=int, default=10_000,
                    help="events per stream per 50 ms frame")
    ap.add_argument("--clustered", type=int, default=0, metavar="K",
                    help="cluster events around K moving objects per stream "
                         "(0 = uniform). Uniform events light up every "
                         "attention window — the WORST case for a "
                         "scene-adaptive model; clustered is the realistic "
                         "automotive regime.")
    ap.add_argument("--L1", type=int, default=30)
    ap.add_argument("--L2", type=int, default=150)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sast_tpu.config import get_config
    from sast_tpu.models.backbone import zero_states
    from sast_tpu.models.detector import YoloXDetector
    from sast_tpu.serving import StreamingDetector
    from sast_tpu.utils.benchmark import slope_time, sync_dispatch
    from sast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = get_config(args.dataset, args.size)
    bb = cfg.model.backbone
    S, E = args.streams, args.events

    model = YoloXDetector(cfg.model)
    x0 = jnp.zeros((1, *bb.in_res_hw, bb.input_channels), jnp.uint8)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), x0, zero_states(bb, 1, dtype=jnp.bfloat16)
    )
    det = StreamingDetector(cfg, variables, max_events=E, num_streams=S)
    h, w = det.native_hw
    step_fn = det._step_fn

    def make_chunk(L):
        """(L, S, E, 4) int32 synthetic packed events, generated on device."""
        K = args.clustered

        def gen(key):
            kx, ky, kp, kt, kc, ka = jax.random.split(key, 6)
            if K:
                # K blob centers per (frame, stream); events Gaussian around
                # a uniformly assigned center (sigma ~ object scale).
                cx = jax.random.randint(kc, (L, S, K), 0, w, jnp.int32)
                cy = jax.random.randint(ka, (L, S, K), 0, h, jnp.int32)
                idx = jax.random.randint(kp, (L, S, E), 0, K, jnp.int32)
                ox = jax.random.normal(kx, (L, S, E)) * 12.0
                oy = jax.random.normal(ky, (L, S, E)) * 12.0
                x = jnp.clip(
                    jnp.take_along_axis(cx, idx, axis=-1) + ox.astype(jnp.int32),
                    0, w - 1,
                )
                y = jnp.clip(
                    jnp.take_along_axis(cy, idx, axis=-1) + oy.astype(jnp.int32),
                    0, h - 1,
                )
            else:
                x = jax.random.randint(kx, (L, S, E), 0, w, jnp.int32)
                y = jax.random.randint(ky, (L, S, E), 0, h, jnp.int32)
            p = jax.random.randint(kp, (L, S, E), 0, 2, jnp.int32)
            t = jnp.sort(
                jax.random.randint(kt, (L, S, E), 0, 50_000, jnp.int32), axis=-1
            )
            return jnp.stack([x, y, p, t], axis=-1)
        packed = jax.jit(gen)(jax.random.PRNGKey(1))
        n = jnp.full((L, S), E, jnp.int32)
        return packed, n

    reset0 = jnp.zeros((S,), bool)

    def make_fn(L):
        packed, n = make_chunk(L)

        def run(variables, states, packed, n):
            def body(carry, xs):
                st, acc = carry
                pk, nn = xs
                dets, st, _p = step_fn(variables, st, pk, nn, reset0)
                return (st, acc + dets["scores"].sum(dtype=jnp.float32)), None

            (st, acc), _ = jax.lax.scan(
                body, (states, jnp.zeros((), jnp.float32)), (packed, n)
            )
            return acc

        compiled = (
            jax.jit(run).lower(variables, det.states, packed, n).compile()
        )
        return lambda: compiled(variables, det.states, packed, n)

    overhead = sync_dispatch()
    print(
        f"# serving throughput, {args.dataset}-{args.size}, S={S} streams, "
        f"E={E} events/frame, device={jax.devices()[0]}, "
        f"dispatch overhead {overhead * 1e3:.1f} ms"
    )
    dt = slope_time(make_fn, args.L1, args.L2)
    print(
        f"events->detections device step: {dt * 1e3:.3f} ms per {S}-stream "
        f"frame batch = {dt / S * 1e3:.3f} ms/frame, {S / dt:,.0f} frames/s, "
        f"{S * E / dt / 1e6:,.1f} Mevents/s"
    )


if __name__ == "__main__":
    main()
