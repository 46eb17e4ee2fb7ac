"""Offline preprocessing: raw Prophesee events -> preprocessed GenX layout.

Numpy-native rebuild of the reference CLI
(/root/reference/scripts/genx/preprocess_dataset.py): reads raw event .h5
files + .npy bbox files, applies the label-filter chain, aligns label-frame
and event-representation timestamps, tensorizes event windows into stacked
histograms (or mixed-density stacks), and writes the per-sequence layout
consumed by sast_tpu.data.sequence:

    <out>/<split>/<seq>/labels_v2/labels.npz, timestamps_us.npy
    <out>/<split>/<seq>/event_representations_v2/<name>/
        event_representations[_ds2_nearest].h5, objframe_idx_2_repr_idx.npy,
        timestamps_us.npy

Differences from the reference implementation (behavior preserved):
- no torch / numba: time monotonization is np.maximum.accumulate, scatter-add
  is np.add.at (optionally the C++ fast path in sast_tpu/native);
- blosc compression is used when hdf5plugin is importable, otherwise h5py's
  built-in lzf;
- restartable: *_in_progress files + atomic rename, match-if-exists checks.

Usage:
    python scripts/preprocess_dataset.py IN_DIR OUT_DIR -ds gen1 \
        --repr stacked_histogram --nbins 10 --count-cutoff 10 --dt-ms 50 -np 4
"""

from __future__ import annotations

import argparse
import multiprocessing as mp
import os
import shutil
import sys
from pathlib import Path
from typing import List, Optional, Tuple

import h5py
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sast_tpu.data.representations import MixedDensityEventStack, StackedHistogram

try:
    import hdf5plugin

    def _compression_opts():
        return dict(
            hdf5plugin.Blosc(cname="zstd", clevel=1, shuffle=hdf5plugin.Blosc.SHUFFLE)
        )

except ImportError:

    def _compression_opts():
        return dict(compression="lzf")


DATASET_HW = {"gen1": (240, 304), "gen4": (720, 1280)}

# Sequences whose labels all vanish after filtering (reference
# preprocess_dataset.py:58-64).
DIRS_TO_IGNORE = {
    "gen1": (
        "17-04-06_09-57-37_6344500000_6404500000",
        "17-04-13_19-17-27_976500000_1036500000",
        "17-04-06_15-14-36_1159500000_1219500000",
        "17-04-11_15-13-23_122500000_182500000",
    ),
    "gen4": (),
}


class NoLabelsException(Exception):
    pass


# ---------------------------------------------------------------------------
# raw event reading
# ---------------------------------------------------------------------------


class RawEventReader:
    """Raw Prophesee event .h5: events/{x,y,p,t} (+ height/width)."""

    def __init__(self, h5_file: Path, dataset: str):
        self.h5f = h5py.File(str(h5_file), "r")
        ev = self.h5f["events"]
        try:
            self.height = int(ev["height"][()])
            self.width = int(ev["width"][()])
        except KeyError:
            self.height, self.width = DATASET_HW[dataset]
        self._time: Optional[np.ndarray] = None

    def close(self):
        self.h5f.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()

    @property
    def time(self) -> np.ndarray:
        if self._time is None:
            t = np.asarray(self.h5f["events"]["t"], np.int64)
            assert t[0] >= 0
            # monotonize non-decreasing (reference numba loop, :159-168)
            self._time = np.maximum.accumulate(t)
        return self._time

    def get_event_slice(self, lo: int, hi: int):
        ev = self.h5f["events"]
        return dict(
            x=np.asarray(ev["x"][lo:hi], np.int64),
            y=np.asarray(ev["y"][lo:hi], np.int64),
            p=np.clip(np.asarray(ev["p"][lo:hi], np.int64), 0, None),
            t=self.time[lo:hi],
        )


# ---------------------------------------------------------------------------
# label filter chain (reference :191-267)
# ---------------------------------------------------------------------------


def filter_labels(
    labels: np.ndarray,
    dataset: str,
    is_train: bool,
    apply_psee_bbox_filter: bool,
    apply_faulty_bbox_filter: bool,
) -> np.ndarray:
    h_frame, w_frame = DATASET_HW[dataset]

    if dataset == "gen4":
        # keep pedestrian / two-wheeler / car (class_id <= 2)
        labels = labels[labels["class_id"] <= 2]

    # crop to FOV
    x0 = np.clip(labels["x"], 0, w_frame - 1)
    y0 = np.clip(labels["y"], 0, h_frame - 1)
    x1 = np.clip(labels["x"] + labels["w"], 0, w_frame - 1)
    y1 = np.clip(labels["y"] + labels["h"], 0, h_frame - 1)
    labels = labels.copy()
    labels["x"], labels["y"] = x0, y0
    labels["w"], labels["h"] = x1 - x0, y1 - y0
    labels = labels[(labels["w"] > 0) & (labels["h"] > 0)]

    w, h = labels["w"], labels["h"]
    if apply_psee_bbox_filter:
        min_diag = 60 if dataset == "gen4" else 30
        min_side = 20 if dataset == "gen4" else 10
        keep = (w ** 2 + h ** 2 >= min_diag ** 2) & (w >= min_side) & (h >= min_side)
        labels = labels[keep]
    else:
        labels = labels[(w >= 5) & (h >= 5)]

    if is_train and apply_faulty_bbox_filter:
        labels = labels[labels["w"] <= (9 * w_frame) // 10]
    return labels


# ---------------------------------------------------------------------------
# timestamp alignment (reference :288-428)
# ---------------------------------------------------------------------------


def base_label_delta_us(unique_ts_us: np.ndarray, dataset: str) -> int:
    if dataset == "gen1":
        return 250_000  # 4 Hz labels
    diff = np.diff(unique_ts_us)
    median = np.median(diff)
    hz = int(np.rint(1e6 / median))
    assert hz in (30, 60), hz
    return int(6 * median if hz == 60 else 3 * median)


def labels_and_ev_repr_timestamps(
    npy_file: Path,
    dataset: str,
    is_train: bool,
    align_t_ms: int,
    ts_step_ev_repr_ms: int,
    apply_psee_bbox_filter: bool = True,
    apply_faulty_bbox_filter: bool = True,
    tick_mode: str = "reference",
):
    """Frame selection + event-repr tick placement.

    ``tick_mode``:

    - ``'reference'`` (default): byte-compatible with the reference's
      ``count * (ts_step_frame_ms // ts_step_ev_repr_ms)`` repr-count formula
      (reference preprocess_dataset.py:370-383, ts_step_frame_ms hardcoded to
      100). For gen1's 250 ms label gaps this yields 2 ticks/gap (125 ms
      spacing) — datasets preprocessed here are interchangeable with
      reference-preprocessed ones, so reference checkpoints reproduce their
      mAP. For gen4 (~100 ms base delta) both modes coincide.
    - ``'physical'``: opt-in improvement — ticks on the true dt grid
      (``count * round(base_delta / dt)``): gen1 gets 5 ticks/gap at dt=50 ms,
      so every event window really spans dt ms. NOT reference-compatible for
      gen1 (different sequence lengths / window statistics); models trained
      on physical-tick data are not comparable with reference checkpoints.
    """
    labels = np.load(str(npy_file))
    assert len(labels) > 0
    labels = filter_labels(
        labels, dataset, is_train, apply_psee_bbox_filter, apply_faulty_bbox_filter
    )
    if labels.size == 0:
        raise NoLabelsException

    align_t_us = align_t_ms * 1000
    delta_t_us = ts_step_ev_repr_ms * 1000
    ts_step_frame_ms = 100
    assert ts_step_frame_ms % ts_step_ev_repr_ms == 0

    unique_ts = np.unique(np.asarray(labels["t"], np.int64))
    base_delta = base_label_delta_us(unique_ts, dataset)

    first = int(np.searchsorted(unique_ts, align_t_us, side="left"))
    frame_ts = [int(unique_ts[first])]
    reprs_between: List[int] = []
    # Event-repr ticks per base label delta (see docstring for the two modes).
    assert tick_mode in ("reference", "physical"), tick_mode
    if tick_mode == "reference":
        reprs_per_base = ts_step_frame_ms // ts_step_ev_repr_ms
    else:
        reprs_per_base = max(1, round(base_delta / delta_t_us))
    for i in range(first + 1, len(unique_ts)):
        ts = int(unique_ts[i])
        diff = ts - frame_ts[-1]
        count = round(diff / base_delta)
        if abs(diff - count * base_delta) <= 2000:  # <= 2 ms jitter
            assert count > 0
            frame_ts.append(ts)
            reprs_between.append(count * reprs_per_base)
    frame_ts = np.asarray(frame_ts, np.int64)

    lo = np.searchsorted(labels["t"], frame_ts, side="left")
    hi = np.searchsorted(labels["t"], frame_ts, side="right")
    labels_per_frame = [labels[a:b] for a, b in zip(lo, hi)]

    # Event representation end-timestamps: pre-first-frame warmup ticks, then
    # interpolated ticks between consecutive frames.
    ev_ts = list(reversed(range(int(frame_ts[0]), 0, -delta_t_us)))[1:-1]
    for idx, (n_between, t0, t1) in enumerate(
        zip(reprs_between, frame_ts[:-1], frame_ts[1:])
    ):
        edges = np.linspace(t0, t1, n_between + 1).astype(np.int64).tolist()
        if idx != len(reprs_between) - 1:
            edges = edges[:-1]
        ev_ts.extend(edges)
    if len(frame_ts) == 1:
        ev_ts.append(int(frame_ts[0]))
    ev_ts = np.asarray(ev_ts, np.int64)

    frameidx_2_repridx = np.searchsorted(ev_ts, frame_ts, side="left")
    for lab, fts, ridx in zip(labels_per_frame, frame_ts, frameidx_2_repridx):
        assert lab["t"][0] == fts and fts == ev_ts[ridx]
    return labels_per_frame, frame_ts, ev_ts, frameidx_2_repridx


# ---------------------------------------------------------------------------
# writers
# ---------------------------------------------------------------------------


def save_labels(out_dir: Path, labels_per_frame, frame_ts: np.ndarray) -> None:
    start_idx = np.cumsum([0] + [len(l) for l in labels_per_frame[:-1]])
    all_labels = np.concatenate(labels_per_frame)
    outfile = out_dir / "labels.npz"
    if outfile.exists():
        old = np.load(str(outfile))
        assert np.array_equal(old["labels"], all_labels)
        assert np.array_equal(old["objframe_idx_2_label_idx"], start_idx)
    else:
        np.savez(
            str(outfile), labels=all_labels, objframe_idx_2_label_idx=start_idx
        )
    ts_file = out_dir / "timestamps_us.npy"
    if ts_file.exists():
        assert np.array_equal(np.load(str(ts_file)), frame_ts)
    else:
        np.save(str(ts_file), frame_ts)


def _nearest_exact_idx(out_size: int, in_size: int) -> np.ndarray:
    return np.clip(
        np.floor((np.arange(out_size) + 0.5) * in_size / out_size).astype(np.int64),
        0,
        in_size - 1,
    )


def downsample_ev_repr_by2(x: np.ndarray) -> np.ndarray:
    """(C, H, W) nearest-exact 2x downsample with the int8 offset trick
    (reference :463-473)."""
    orig_dtype = x.dtype
    if orig_dtype == np.int8:
        x = (x.astype(np.int16) + 128).astype(np.uint8)
    iy = _nearest_exact_idx(x.shape[1] // 2, x.shape[1])
    ix = _nearest_exact_idx(x.shape[2] // 2, x.shape[2])
    x = x[:, iy][:, :, ix]
    if orig_dtype == np.int8:
        x = (x.astype(np.int16) - 128).astype(np.int8)
    return x


def write_event_representations(
    in_h5: Path,
    ev_out_dir: Path,
    dataset: str,
    representation,
    ev_repr_timestamps_us: np.ndarray,
    delta_ts_ms: Optional[int],
    num_events: Optional[int],
    downsample_by_2: bool,
    layout: str = "tchw",
) -> None:
    """``layout='thwc'`` stores frames in the model's NHWC layout (with a
    ``layout`` HDF5 attribute the reader keys on) so the training loader
    never pays the per-batch TCHW->THWC transpose — the conversion runs
    once here instead. 'tchw' keeps the reference on-disk contract
    (sequence_base.py:88-98 expects channel-first)."""
    suffix = "_ds2_nearest" if downsample_by_2 else ""
    outfile = ev_out_dir / f"event_representations{suffix}.h5"
    if outfile.exists():
        return
    in_progress = outfile.parent / (outfile.stem + "_in_progress" + outfile.suffix)
    if in_progress.exists():
        os.remove(in_progress)

    assert layout in ("tchw", "thwc"), layout
    shape = tuple(representation.get_shape())
    if downsample_by_2:
        shape = (shape[0], shape[1] // 2, shape[2] // 2)
    if layout == "thwc":
        shape = (shape[1], shape[2], shape[0])
    dtype = representation.get_numpy_dtype()

    with RawEventReader(in_h5, dataset) as reader, h5py.File(
        str(in_progress), "w"
    ) as out:
        dset = out.create_dataset(
            "data",
            dtype=dtype,
            shape=(len(ev_repr_timestamps_us), *shape),
            chunks=(1, *shape),
            **_compression_opts(),
        )
        dset.attrs["layout"] = "THWC" if layout == "thwc" else "TCHW"
        ev_ts = reader.time
        end_idx = np.searchsorted(ev_ts, ev_repr_timestamps_us, side="right")
        if num_events is not None:
            start_idx = np.maximum(end_idx - num_events, 0)
        else:
            start_idx = np.searchsorted(
                ev_ts, ev_repr_timestamps_us - delta_ts_ms * 1000, side="left"
            )
        for i, (lo, hi) in enumerate(zip(start_idx, end_idx)):
            win = reader.get_event_slice(int(lo), int(hi))
            rep = representation.construct(win["x"], win["y"], win["p"], win["t"])
            if downsample_by_2:
                rep = downsample_ev_repr_by2(rep)
            if layout == "thwc":
                rep = np.ascontiguousarray(np.transpose(rep, (1, 2, 0)))
            dset[i] = rep
    os.rename(in_progress, outfile)


# ---------------------------------------------------------------------------
# sequence / dataset drivers
# ---------------------------------------------------------------------------


def repr_name(args) -> str:
    num_events = getattr(args, "num_events", None)
    agg = f"ne={num_events}" if num_events else f"dt={args.dt_ms}"
    base = "stacked_histogram" if args.repr == "stacked_histogram" else "mixeddensity_stack"
    return f"{base}_{agg}_nbins={args.nbins}"


def build_representation(args, dataset: str, hw: Tuple[int, int]):
    if args.repr == "stacked_histogram":
        return StackedHistogram(
            bins=args.nbins, height=hw[0], width=hw[1], count_cutoff=args.count_cutoff
        )
    return MixedDensityEventStack(
        bins=args.nbins, height=hw[0], width=hw[1], count_cutoff=args.count_cutoff
    )


def process_sequence(task) -> str:
    (in_npy, in_h5, out_seq_dir, dataset, is_train, args_dict) = task
    args = argparse.Namespace(**args_dict)
    out_labels = out_seq_dir / "labels_v2"
    out_ev = out_seq_dir / "event_representations_v2" / repr_name(args)
    out_labels.mkdir(parents=True, exist_ok=True)
    out_ev.mkdir(parents=True, exist_ok=True)

    try:
        labels_per_frame, frame_ts, ev_ts, f2r = labels_and_ev_repr_timestamps(
            in_npy,
            dataset,
            is_train,
            align_t_ms=100,
            ts_step_ev_repr_ms=args.dt_ms,
            apply_psee_bbox_filter=not args.no_psee_filter,
            apply_faulty_bbox_filter=not args.no_faulty_filter,
            tick_mode=getattr(args, "ticks", "reference"),
        )
    except NoLabelsException:
        shutil.rmtree(out_seq_dir)
        return f"{out_seq_dir.name}: no labels after filtering, removed"

    save_labels(out_labels, labels_per_frame, frame_ts)
    for f in ("objframe_idx_2_repr_idx.npy", "timestamps_us.npy"):
        path = out_ev / f
        data = f2r if f.startswith("objframe") else ev_ts
        if path.exists():
            assert np.array_equal(np.load(str(path)), data)
        else:
            np.save(str(path), data)

    hw = DATASET_HW[dataset]
    representation = build_representation(args, dataset, hw)
    num_events = getattr(args, "num_events", None)
    write_event_representations(
        in_h5, out_ev, dataset, representation, ev_ts,
        delta_ts_ms=None if num_events else args.dt_ms,
        num_events=num_events,
        downsample_by_2=args.downsample_by_2,
        layout=getattr(args, "layout", "tchw"),
    )
    return f"{out_seq_dir.name}: ok ({len(ev_ts)} reprs, {len(frame_ts)} frames)"


def find_sequences(split_dir: Path) -> List[Tuple[Path, Path, str]]:
    """(npy, h5, name) triples. gen1: <seq>_bbox.npy + <seq>_td.dat.h5."""
    out = []
    for npy in sorted(split_dir.glob("*_bbox.npy")):
        stem = npy.name[: -len("_bbox.npy")]
        for suffix in ("_td.dat.h5", "_td.h5", ".h5"):
            h5 = split_dir / f"{stem}{suffix}"
            if h5.exists():
                out.append((npy, h5, stem))
                break
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input_dir", type=Path)
    ap.add_argument("output_dir", type=Path)
    ap.add_argument("-ds", "--dataset", choices=("gen1", "gen4"), required=True)
    ap.add_argument("--repr", choices=("stacked_histogram", "mixeddensity_stack"),
                    default="stacked_histogram")
    ap.add_argument("--nbins", type=int, default=10)
    ap.add_argument("--count-cutoff", type=int, default=10)
    ap.add_argument("--dt-ms", type=int, default=50,
                    help="event-window duration (DURATION aggregation)")
    ap.add_argument("--num-events", type=int, default=None,
                    help="fixed event count per window (COUNT aggregation, "
                         "overrides the duration window)")
    ap.add_argument("--downsample-by-2", action="store_true",
                    help="additionally write the _ds2_nearest variant (gen4)")
    ap.add_argument("--layout", choices=("tchw", "thwc"), default="tchw",
                    help="per-frame on-disk layout: tchw = reference-"
                    "compatible channel-first; thwc = model NHWC layout "
                    "(skips the loader's per-batch transpose)")
    ap.add_argument("--ticks", choices=("reference", "physical"),
                    default="reference",
                    help="event-repr tick placement: reference = byte-"
                    "compatible with the reference's count*(100ms//dt) "
                    "formula (2 ticks per gen1 250ms gap; REQUIRED for "
                    "interchange with reference-preprocessed data / "
                    "checkpoints); physical = true dt grid (5 ticks per "
                    "gen1 gap at dt=50ms). Identical for gen4.")
    ap.add_argument("--no-psee-filter", action="store_true")
    ap.add_argument("--no-faulty-filter", action="store_true")
    ap.add_argument("-np", "--num-processes", type=int, default=1)
    args = ap.parse_args()

    tasks = []
    for split in ("train", "val", "test"):
        split_in = args.input_dir / split
        if not split_in.is_dir():
            continue
        for npy, h5, name in find_sequences(split_in):
            if name in DIRS_TO_IGNORE[args.dataset]:
                print(f"skipping ignored sequence {name}")
                continue
            out_seq = args.output_dir / split / name
            tasks.append(
                (npy, h5, out_seq, args.dataset, split == "train", vars(args))
            )

    print(f"{len(tasks)} sequences to process")
    if args.num_processes > 1:
        ctx = mp.get_context("spawn")
        with ctx.Pool(args.num_processes) as pool:
            for msg in pool.imap_unordered(process_sequence, tasks):
                print(msg)
    else:
        for task in tasks:
            print(process_sequence(task))


if __name__ == "__main__":
    main()
