"""Preprocessing CLI tests: raw events -> on-disk layout -> SequenceReader."""

import sys
from pathlib import Path

import h5py
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from preprocess_dataset import (  # noqa: E402
    base_label_delta_us,
    downsample_ev_repr_by2,
    filter_labels,
    labels_and_ev_repr_timestamps,
    process_sequence,
)

RAW_LABEL_DTYPE = np.dtype(
    [
        ("t", "<u8"),
        ("x", "<f4"),
        ("y", "<f4"),
        ("w", "<f4"),
        ("h", "<f4"),
        ("class_id", "<u4"),
        ("class_confidence", "<f4"),
        ("track_id", "<u4"),
    ]
)


def _make_raw_sequence(dir_: Path, name: str, seed=0):
    """Raw gen1-style sequence: events .h5 + bbox .npy with 4 Hz labels."""
    rng = np.random.RandomState(seed)
    n_events = 40_000
    t = np.sort(rng.randint(0, 2_000_000, n_events)).astype(np.int64)
    # inject slight non-monotonicity to exercise time correction
    t[100] = t[101] + 5
    x = rng.randint(0, 304, n_events).astype(np.uint16)
    y = rng.randint(0, 240, n_events).astype(np.uint16)
    p = rng.randint(0, 2, n_events).astype(np.int8)
    with h5py.File(str(dir_ / f"{name}_td.dat.h5"), "w") as f:
        ev = f.create_group("events")
        ev.create_dataset("t", data=t)
        ev.create_dataset("x", data=x)
        ev.create_dataset("y", data=y)
        ev.create_dataset("p", data=p)
        ev.create_dataset("height", data=240)
        ev.create_dataset("width", data=304)

    rows = []
    for ts in range(250_000, 2_000_000, 250_000):  # 4 Hz labels
        for _ in range(rng.randint(1, 3)):
            rows.append(
                (ts, rng.uniform(0, 200), rng.uniform(0, 150),
                 rng.uniform(25, 60), rng.uniform(25, 60), rng.randint(0, 2),
                 1.0, 0)
            )
    np.save(str(dir_ / f"{name}_bbox.npy"), np.array(rows, RAW_LABEL_DTYPE))


@pytest.fixture()
def raw_root(tmp_path):
    (tmp_path / "train").mkdir()
    _make_raw_sequence(tmp_path / "train", "seq0")
    return tmp_path


def test_filter_labels_chain():
    rows = [
        # fine box
        (300_000, 50, 50, 40, 40, 0, 1.0, 0),
        # too small (diag < 30)
        (300_000, 50, 50, 8, 8, 0, 1.0, 0),
        # out of FOV -> cropped away
        (300_000, 400, 300, 40, 40, 1, 1.0, 0),
        # huge horizontal box (train filter)
        (300_000, 0, 100, 290, 40, 0, 1.0, 0),
    ]
    labels = np.array(rows, RAW_LABEL_DTYPE)
    out = filter_labels(labels, "gen1", is_train=True,
                        apply_psee_bbox_filter=True, apply_faulty_bbox_filter=True)
    assert len(out) == 1 and out["w"][0] == 40


def test_base_delta():
    assert base_label_delta_us(np.array([0, 250_000]), "gen1") == 250_000
    ts_60hz = np.arange(0, 1_000_000, 16_667)
    assert abs(base_label_delta_us(ts_60hz, "gen4") - 100_000) < 3000


def test_timestamp_alignment(raw_root):
    npy = raw_root / "train" / "seq0_bbox.npy"
    # default (reference-compatible) ticks: count*(100//50) = 2 per 250 ms
    # gen1 gap; warmup prefix stays on the 50 ms grid
    labels_pf, frame_ts, ev_ts, f2r = labels_and_ev_repr_timestamps(
        npy, "gen1", is_train=True, align_t_ms=100, ts_step_ev_repr_ms=50
    )
    assert np.all(np.diff(frame_ts) % 250_000 == 0)
    np.testing.assert_array_equal(ev_ts[f2r], frame_ts)
    inter = np.diff(ev_ts[f2r[0]:])
    assert np.all(inter == 125_000), np.unique(inter)

    # physical ticks (opt-in): true 50 ms grid everywhere
    _, frame_ts_p, ev_ts_p, f2r_p = labels_and_ev_repr_timestamps(
        npy, "gen1", is_train=True, align_t_ms=100, ts_step_ev_repr_ms=50,
        tick_mode="physical",
    )
    np.testing.assert_array_equal(frame_ts_p, frame_ts)
    assert np.all(np.diff(ev_ts_p) == 50_000)
    np.testing.assert_array_equal(ev_ts_p[f2r_p], frame_ts_p)


def test_downsample_int8_offset_trick():
    x = (np.arange(2 * 4 * 4, dtype=np.int8) - 16).reshape(2, 4, 4)
    out = downsample_ev_repr_by2(x)
    assert out.shape == (2, 2, 2) and out.dtype == np.int8
    # nearest-exact picks index floor((i+0.5)*2) = 1, 3
    assert out[0, 0, 0] == x[0, 1, 1]


@pytest.mark.parametrize("layout", ["tchw", "thwc"])
def test_process_sequence_end_to_end(raw_root, tmp_path, layout):
    out_seq = tmp_path / "out" / "train" / "seq0"
    args = dict(
        repr="stacked_histogram", nbins=10, count_cutoff=10, dt_ms=50,
        downsample_by_2=False, no_psee_filter=False, no_faulty_filter=False,
        layout=layout,
    )
    msg = process_sequence(
        (raw_root / "train" / "seq0_bbox.npy",
         raw_root / "train" / "seq0_td.dat.h5",
         out_seq, "gen1", True, args)
    )
    assert "ok" in msg

    # readable through the framework's SequenceReader
    from sast_tpu.data.sequence import SequenceReader

    r = SequenceReader(out_seq, "stacked_histogram_dt=50_nbins=10", "gen1")
    assert r.num_ev_repr > 10
    ev = r.get_ev_repr(0, 2)
    assert ev.shape == (2, 240, 304, 20)
    assert ev.sum() > 0  # events landed in the histograms
    # labeled frames resolve
    fl = r.labels_at_repr_idx(int(r.objframe_idx_2_repr_idx[0]))
    assert fl is not None and len(fl) >= 1
    # streams usable for training
    streams = r.streams(seq_len=5, guarantee_labels=True)
    assert len(streams) >= 1

    # idempotent re-run (match-if-exists)
    msg2 = process_sequence(
        (raw_root / "train" / "seq0_bbox.npy",
         raw_root / "train" / "seq0_td.dat.h5",
         out_seq, "gen1", True, args)
    )
    assert "ok" in msg2
