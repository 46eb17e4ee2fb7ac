"""Host data-pipeline throughput: can one host core feed the chip?

The training loop is host-fed (disk -> h5 decode -> augment -> batch
assembly -> prefetch thread; sast_tpu/data/*), so loader throughput bounds
trained frames/s exactly like the reference's DataLoader workers bound its
DDP recipe (/root/reference/modules/data/genx.py:92 num_workers). This
script measures batches/s of ``DataModule.train_batches`` for each sampling
mode at the gen1-base recipe geometry (B=8, T=21) over a synthetic on-disk
dataset, and compares against the measured device step time (README: 269 ms
per gen1-base train step => the loader must sustain >= 3.7 batches/s to
keep the chip busy).

Usage:
  python scripts/bench_loader.py [--data DIR] [--batches 30] [--batch-size 8]
  (--data defaults to generating a fresh synthetic dataset under /tmp)
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


DEVICE_STEP_S = {  # measured post-cliff device train-step times (README)
    "gen1-base": 0.269,
}


def ensure_dataset(path: Path, seqs: int, frames: int, layout: str = "tchw") -> Path:
    if (path / "train").is_dir():
        # Refuse to silently benchmark a dataset whose on-disk layout does
        # not match the requested --layout (the A/B number would be a lie).
        import h5py

        h5 = next((path / "train").glob("*/event_representations_v2/*/*.h5"))
        with h5py.File(str(h5), "r") as f:
            found = f["data"].attrs.get("layout", "TCHW")
            found = found.decode() if isinstance(found, bytes) else found
        assert found.lower() == layout, (
            f"dataset at {path} is {found}, but --layout {layout} was "
            "requested; point --data elsewhere or delete the directory"
        )
        return path
    print(f"generating synthetic dataset at {path} ...", file=sys.stderr)
    import subprocess

    subprocess.run(
        [
            sys.executable,
            str(Path(__file__).parent / "make_synth_dataset.py"),
            str(path),
            "--seqs", str(seqs),
            "--frames", str(frames),
            "--layout", layout,
        ],
        check=True,
        stdout=subprocess.DEVNULL,
    )
    return path


def time_iterator(it, n_batches: int, warmup: int = 5):
    """(batches/s, p50 ms, p95 ms) over n_batches after warmup."""
    import numpy as np

    for _ in range(warmup):
        next(it)
    ts = []
    t0 = time.perf_counter()
    for _ in range(n_batches):
        t_a = time.perf_counter()
        next(it)
        ts.append(time.perf_counter() - t_a)
    total = time.perf_counter() - t0
    ts_ms = np.asarray(ts) * 1e3
    return n_batches / total, float(np.percentile(ts_ms, 50)), float(
        np.percentile(ts_ms, 95)
    )


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", default="/tmp/sast_loader_bench_data")
    ap.add_argument("--seqs", type=int, default=8)
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--batches", type=int, default=30)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--seq-len", type=int, default=21)
    ap.add_argument("--no-prefetch", action="store_true")
    ap.add_argument("--layout", choices=("tchw", "thwc"), default="tchw",
                    help="on-disk per-frame layout of the generated dataset")
    ap.add_argument("--no-malloc-retain", action="store_true")
    args = ap.parse_args()

    data_dir = args.data
    if args.layout != "tchw" and data_dir == "/tmp/sast_loader_bench_data":
        data_dir += f"_{args.layout}"  # don't mix layouts in one default dir
    root = ensure_dataset(Path(data_dir), args.seqs, args.frames, args.layout)

    from sast_tpu.config import get_config
    from sast_tpu.data.module import DataModule
    from sast_tpu.utils.malloc import retain_freed_memory

    # This process is loader-only (no XLA devices), so the arena-retention
    # tuning is safe here; --no-malloc-retain measures the untuned default.
    if not args.no_malloc_retain:
        retain_freed_memory(force=True)

    cfg = get_config("gen1", "base")
    ds = dataclasses.replace(
        cfg.dataset,
        path=str(root),
        ev_repr_name="stacked_histogram_dt=50_nbins=10",
        sequence_length=args.seq_len,
    )
    tr = dataclasses.replace(
        cfg.training,
        batch_size_train=args.batch_size,
        batch_size_eval=args.batch_size,
    )
    B, T = args.batch_size, args.seq_len
    # The OK/BOTTLENECK verdict only means something at the recipe geometry
    # the 269 ms device step was measured at (B=8, T=21).
    at_recipe_geometry = (B, T) == (8, 21)
    need = 1.0 / DEVICE_STEP_S["gen1-base"] if at_recipe_geometry else None
    prefetch = not args.no_prefetch
    print(
        f"# gen1-base loader: B={B} T={T} over {root} (prefetch={prefetch}); "
        + (
            f"chip needs >= {need:.1f} batches/s"
            if need is not None
            else "non-recipe geometry: rates reported without a verdict"
        ),
        flush=True,
    )

    rows = []
    for mode in ("stream", "random", "mixed"):
        dm = DataModule(
            dataclasses.replace(
                cfg, dataset=dataclasses.replace(ds, train_sampling=mode), training=tr
            )
        )
        it = iter(dm.train_batches(prefetch=prefetch))
        bps, p50, p95 = time_iterator(it, args.batches)
        fps = bps * B * T
        verdict = (
            "" if need is None
            else ("  [OK]" if bps >= need else "  [BOTTLENECK]")
        )
        rows.append((f"train/{mode}", bps, fps, p50, p95, verdict))
        print(
            f"train/{mode:<7} {bps:7.2f} batches/s = {fps:7.0f} frames/s  "
            f"p50 {p50:7.1f} ms  p95 {p95:7.1f} ms{verdict}",
            flush=True,
        )

    dm = DataModule(dataclasses.replace(cfg, dataset=ds, training=tr))
    it = iter(dm.eval_batches("val", prefetch=prefetch))
    # eval loaders are finite; cap to what the split holds
    n_eval = min(args.batches, 10)
    try:
        bps, p50, p95 = time_iterator(it, n_eval, warmup=1)
        print(
            f"eval/stream   {bps:7.2f} batches/s = {bps * B * T:7.0f} frames/s  "
            f"p50 {p50:7.1f} ms  p95 {p95:7.1f} ms",
            flush=True,
        )
    except StopIteration:
        print("eval split too small for the requested batch count", flush=True)


if __name__ == "__main__":
    main()
