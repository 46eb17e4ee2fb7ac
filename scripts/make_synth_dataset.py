"""Generate a learnable synthetic dataset in the preprocessed on-disk layout.

Moving high-contrast event blobs with boxes that track them — unlike the
uncorrelated random data in tests/conftest.py, a detector can actually learn
this, so val/AP rises through the full Prophesee evaluation pipeline. Used
for the long-run on-TPU training evidence (VERDICT r1 next #5); the layout
matches scripts/preprocess_dataset.py output (SequenceReader contract,
sast_tpu/data/sequence.py:6-10).

Two classes, distinguishable by size and polarity signature:
  class 0 ("car"):        large blob, events mostly in the ON bins
  class 1 ("pedestrian"): small tall blob, events mostly in the OFF bins

Usage:
  python scripts/make_synth_dataset.py /tmp/synth_gen1 [--seqs 8] [--frames 256]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

H, W = 240, 304          # gen1 native resolution
BINS = 10                # stacked histogram bins -> 20 channels
DT_US = 50_000           # 50 ms frames (gen1 preset)
LABEL_DTYPE = np.dtype(
    [
        ("t", "<u8"),
        ("x", "<f4"),
        ("y", "<f4"),
        ("w", "<f4"),
        ("h", "<f4"),
        ("class_id", "<u4"),
        ("class_confidence", "<f4"),
    ]
)


def _render_frame(rng, objs, noise_p=0.002):
    """One (2*BINS, H, W) uint8 stacked histogram with blob + noise events."""
    frame = (rng.rand(2 * BINS, H, W) < noise_p).astype(np.uint8)
    for o in objs:
        x0, y0 = int(o["x"]), int(o["y"])
        w, h = int(o["w"]), int(o["h"])
        x1, y1 = min(x0 + w, W), min(y0 + h, H)
        x0, y0 = max(x0, 0), max(y0, 0)
        if x1 <= x0 or y1 <= y0:
            continue
        # Events concentrate on the leading edge + interior texture; class
        # decides polarity balance (bins [0:BINS]=OFF, [BINS:2*BINS]=ON).
        dens_on = 0.35 if o["cls"] == 0 else 0.08
        dens_off = 0.08 if o["cls"] == 0 else 0.35
        blob_on = (rng.rand(BINS, y1 - y0, x1 - x0) < dens_on).astype(np.uint8)
        blob_off = (rng.rand(BINS, y1 - y0, x1 - x0) < dens_off).astype(np.uint8)
        frame[BINS:, y0:y1, x0:x1] += blob_on * rng.randint(1, 4)
        frame[:BINS, y0:y1, x0:x1] += blob_off * rng.randint(1, 4)
    return np.clip(frame, 0, 255)


def make_sequence(seq_dir: Path, repr_name: str, num_frames: int, seed: int,
                  layout: str = "tchw"):
    import h5py

    rng = np.random.RandomState(seed)
    ev_dir = seq_dir / "event_representations_v2" / repr_name
    ev_dir.mkdir(parents=True, exist_ok=True)
    (seq_dir / "labels_v2").mkdir(parents=True, exist_ok=True)

    # 1-3 objects with constant velocity, bouncing off the borders.
    n_obj = rng.randint(1, 4)
    objs = []
    for _ in range(n_obj):
        cls = int(rng.randint(0, 2))
        if cls == 0:
            w, h = rng.uniform(40, 80), rng.uniform(25, 50)
        else:
            w, h = rng.uniform(12, 22), rng.uniform(30, 55)
        objs.append(
            dict(
                cls=cls, w=w, h=h,
                x=rng.uniform(0, W - w), y=rng.uniform(0, H - h),
                vx=rng.uniform(-6, 6), vy=rng.uniform(-4, 4),
            )
        )

    data = np.zeros((num_frames, 2 * BINS, H, W), np.uint8)
    rows, start_idx, labeled = [], [], []
    for t in range(num_frames):
        for o in objs:
            o["x"] += o["vx"]
            o["y"] += o["vy"]
            if o["x"] < 0 or o["x"] + o["w"] > W:
                o["vx"] *= -1
                o["x"] = np.clip(o["x"], 0, W - o["w"])
            if o["y"] < 0 or o["y"] + o["h"] > H:
                o["vy"] *= -1
                o["y"] = np.clip(o["y"], 0, H - o["h"])
        data[t] = _render_frame(rng, objs)
        # Label every 4th frame (like gen1's 20 Hz labels vs 50 ms frames
        # after the usual alignment, sparse labeled frames exercise the
        # labeled-frame gather path).
        if t % 4 == 3:
            labeled.append(t)
            start_idx.append(len(rows))
            ts = t * DT_US
            for o in objs:
                rows.append(
                    (ts, o["x"], o["y"], o["w"], o["h"], o["cls"], 1.0)
                )

    if layout == "thwc":
        data = np.ascontiguousarray(np.transpose(data, (0, 2, 3, 1)))
    with h5py.File(str(ev_dir / "event_representations.h5"), "w") as f:
        dset = f.create_dataset(
            "data", data=data, chunks=(1, *data.shape[1:]), compression="lzf"
        )
        dset.attrs["layout"] = "THWC" if layout == "thwc" else "TCHW"
    np.save(str(ev_dir / "objframe_idx_2_repr_idx.npy"),
            np.asarray(labeled, np.int64))
    np.save(str(ev_dir / "timestamps_us.npy"),
            np.arange(num_frames, dtype=np.int64) * DT_US)
    np.savez(
        str(seq_dir / "labels_v2" / "labels.npz"),
        labels=np.array(rows, dtype=LABEL_DTYPE),
        objframe_idx_2_label_idx=np.asarray(start_idx, np.int64),
    )
    np.save(str(seq_dir / "labels_v2" / "timestamps_us.npy"),
            np.asarray(labeled, np.int64) * DT_US)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--seqs", type=int, default=8)
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument(
        "--repr-name", default="stacked_histogram_dt=50_nbins=10"
    )
    ap.add_argument("--layout", choices=("tchw", "thwc"), default="tchw")
    args = ap.parse_args()

    root = Path(args.out)
    for split, n, base_seed in (
        ("train", args.seqs, 0),
        ("val", max(2, args.seqs // 4), 1000),
        ("test", max(2, args.seqs // 4), 2000),
    ):
        for i in range(n):
            seq = root / split / f"synth_{i:03d}"
            make_sequence(seq, args.repr_name, args.frames, base_seed + i,
                          layout=args.layout)
            print(f"{split}/synth_{i:03d}", flush=True)


if __name__ == "__main__":
    main()
