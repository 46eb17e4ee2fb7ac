"""Raw .dat reader round-trip tests."""

import numpy as np

from sast_tpu.data.psee_raw import (
    EVENT_DTYPE,
    PSEELoader,
    load_npy_boxes,
    write_dat,
)


def _events(n=10_000, seed=0):
    rng = np.random.RandomState(seed)
    ev = np.empty(n, EVENT_DTYPE)
    ev["t"] = np.sort(rng.randint(0, 1_000_000, n))
    ev["x"] = rng.randint(0, 304, n)
    ev["y"] = rng.randint(0, 240, n)
    ev["p"] = rng.randint(0, 2, n)
    return ev


def test_dat_round_trip(tmp_path):
    ev = _events()
    path = str(tmp_path / "seq_td.dat")
    write_dat(path, ev, 240, 304)

    loader = PSEELoader(path)
    assert loader.height == 240 and loader.width == 304
    assert loader.event_count() == len(ev)
    assert loader.total_time() == int(ev["t"][-1])

    got = loader.load_n_events(len(ev))
    np.testing.assert_array_equal(got["t"], ev["t"])
    np.testing.assert_array_equal(got["x"], ev["x"])
    np.testing.assert_array_equal(got["y"], ev["y"])
    np.testing.assert_array_equal(got["p"], ev["p"])


def test_dat_load_delta_t(tmp_path):
    ev = _events()
    path = str(tmp_path / "seq_td.dat")
    write_dat(path, ev, 240, 304)
    loader = PSEELoader(path)

    chunks = []
    while not loader.done:
        c = loader.load_delta_t(100_000)
        if c.size:
            chunks.append(c)
    got = np.concatenate(chunks)
    np.testing.assert_array_equal(got["t"], ev["t"])
    # each chunk spans < 100ms
    loader.reset()
    c0 = loader.load_delta_t(100_000)
    assert int(c0["t"][-1]) - int(c0["t"][0]) < 100_000


def test_load_npy_boxes_legacy_names(tmp_path):
    legacy = np.zeros(
        3,
        np.dtype(
            [
                ("ts", "<u8"),
                ("x", "<f4"),
                ("y", "<f4"),
                ("w", "<f4"),
                ("h", "<f4"),
                ("class_id", "<u4"),
                ("confidence", "<f4"),
                ("track_id", "<u4"),
            ]
        ),
    )
    legacy["ts"] = [1, 2, 3]
    legacy["confidence"] = 0.5
    path = str(tmp_path / "boxes.npy")
    np.save(path, legacy)
    out = load_npy_boxes(path)
    np.testing.assert_array_equal(out["t"], [1, 2, 3])
    assert (out["class_confidence"] == 0.5).all()
