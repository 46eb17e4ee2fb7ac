"""Data pipeline tests over a synthetic on-disk dataset in the GenX layout."""

import numpy as np
import pytest

from sast_tpu.config import get_test_config
from sast_tpu.data.batch import assemble_batch, split_device_batch
from sast_tpu.data.module import DataModule
from sast_tpu.data.sequence import ClipIterator, SequenceReader
from sast_tpu.data.streaming import (
    ConcatStreamsSampler,
    ShardedEvalSampler,
    zigzag_assign,
)

H, W, C = 240, 304, 4  # gen1 native resolution, few channels (see conftest)


def _cfg(dataset_root):
    import dataclasses

    cfg = get_test_config()
    ds = dataclasses.replace(
        cfg.dataset,
        path=str(dataset_root),
        ev_repr_name="test_repr",
        sequence_length=5,
    )
    return dataclasses.replace(cfg, dataset=ds)


def test_sequence_reader_and_streams(dataset_root):
    r = SequenceReader(
        dataset_root / "train" / "seq_b1", "test_repr", "gen1", False
    )
    assert r.num_ev_repr == 30
    ev = r.get_ev_repr(0, 3)
    assert ev.shape == (3, H, W, C) and ev.dtype == np.uint8

    # labels at labeled reprs only
    assert r.labels_at_repr_idx(2) is not None
    assert r.labels_at_repr_idx(3) is None

    # guarantee_labels: gap 5->25 (> seq_len 5) splits into two streams
    streams = r.streams(seq_len=5, guarantee_labels=True)
    assert len(streams) == 2
    # every training clip contains at least one label
    for ranges in streams:
        for s, e in ranges:
            assert any(
                r.labels_at_repr_idx(i) is not None for i in range(s, e)
            ), (s, e)

    # eval: single stream starting at max(first_label - L + 1, 0)
    eval_streams = r.streams(seq_len=5, guarantee_labels=False)
    assert len(eval_streams) == 1
    assert eval_streams[0][0][0] == max(2 - 5 + 1, 0)
    assert eval_streams[0][-1][1] == 30


def test_clip_iterator_padding(dataset_root):
    r = SequenceReader(
        dataset_root / "train" / "seq_a0", "test_repr", "gen1", False
    )
    ranges = r.streams(5, guarantee_labels=True)[0]
    clips = list(ClipIterator(r, 5, ranges))
    assert clips[0]["is_first"] and not any(c["is_first"] for c in clips[1:])
    for c in clips:
        assert c["ev_repr"].shape == (5, H, W, C)
        assert len(c["labels"]) == 5
    # tail clip padding mask
    tail = clips[-1]
    n_real = ranges[-1][1] - ranges[-1][0]
    assert tail["is_real_mask"].sum() == n_real


def test_zigzag_assign_balance():
    lanes = zigzag_assign([10, 9, 8, 7, 6, 5, 4, 3], 4)
    loads = [sum([10, 9, 8, 7, 6, 5, 4, 3][i] for i in lane) for lane in lanes]
    assert max(loads) - min(loads) <= 3
    # all items assigned exactly once
    assert sorted(i for lane in lanes for i in lane) == list(range(8))


def test_sharded_eval_sampler_covers_all_clips(dataset_root):
    cfg = _cfg(dataset_root)
    dm = DataModule(cfg)
    readers = dm._readers("val")
    streams = dm._stream_clips(readers, guarantee_labels=False)
    total_clips = sum(len(s) for s in streams)

    # world of 2 processes, batch 2 per process
    seen = 0
    steps = []
    for rank in (0, 1):
        sampler = ShardedEvalSampler(streams, 2, rank=rank, world_size=2)
        n = 0
        for batch in sampler:
            assert len(batch) == 2
            seen += sum(c["is_real_mask"].any() for c in batch)
            n += 1
        steps.append(n)
    assert steps[0] == steps[1]  # every process steps the same count
    assert seen == total_clips  # no clip lost, none duplicated


def test_concat_streams_lane_continuity(dataset_root):
    cfg = _cfg(dataset_root)
    dm = DataModule(cfg)
    streams = dm._stream_clips(dm._readers("train"), guarantee_labels=True)
    sampler = ConcatStreamsSampler(streams, batch_size=2, augmentor=None, seed=1)
    it = iter(sampler)
    batches = [next(it) for _ in range(8)]
    # each lane yields a clip every batch; is_first marks stream boundaries
    for b in batches:
        assert len(b) == 2
    firsts = [c["is_first"] for b in batches for c in b]
    assert any(firsts)


def test_assemble_batch_layout(dataset_root):
    cfg = _cfg(dataset_root)
    dm = DataModule(cfg)
    streams = dm._stream_clips(dm._readers("train"), guarantee_labels=True)
    clips = [next(iter(ClipIterator(s.reader, 5, s.ranges))) for s in streams[:2]]
    batch = assemble_batch(clips, max_labeled_frames=2, max_gt=8)
    dev, host = split_device_batch(batch)
    assert dev["ev_repr"].shape == (5, 2, H, W * C)
    assert dev["ev_repr"].dtype == np.uint8
    assert dev["frame_tidx"].shape == (2, 2)
    assert dev["gt_boxes"].shape == (2, 2, 8, 4)
    assert dev["is_first"].all()
    assert "_labels" in host and "_labels" not in dev
    # every valid frame has at least one valid GT
    fv = dev["frame_valid"]
    gv = dev["gt_valid"]
    assert fv.any()
    assert (gv.any(-1) == fv).all()


def test_train_batches_end_to_end(dataset_root):
    cfg = _cfg(dataset_root)
    dm = DataModule(cfg)
    it = iter(dm.train_batches(prefetch=False))
    for _ in range(3):
        batch = next(it)
        assert batch["ev_repr"].shape[0] == 5
        assert batch["ev_repr"].shape[1] == cfg.training.batch_size_train
        assert batch["frame_valid"].any()


def test_eval_batches_end_to_end(dataset_root):
    cfg = _cfg(dataset_root)
    dm = DataModule(cfg)
    n = 0
    for batch in dm.eval_batches("val", prefetch=False):
        n += 1
        assert batch["ev_repr"].shape[1] == cfg.training.batch_size_eval
    assert n > 0


def test_prefetcher_propagates_producer_exception():
    """A loader crash must fail the training loop loudly, not end the batch
    stream as if the data ran out (silent mid-epoch stop)."""
    import pytest

    from sast_tpu.data.batch import Prefetcher

    def gen():
        yield 1
        yield 2
        raise RuntimeError("loader crashed")

    it = iter(Prefetcher(gen()))
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(RuntimeError, match="loader crashed"):
        next(it)


def test_prefetcher_clean_end():
    from sast_tpu.data.batch import Prefetcher

    assert list(Prefetcher(iter([1, 2, 3]))) == [1, 2, 3]


def test_thwc_disk_layout_reader_equivalence(tmp_path):
    """A dataset stored THWC (preprocess --layout thwc) reads back
    identically to the reference-compatible TCHW layout — the loader just
    skips its per-batch transpose."""
    from tests.conftest import make_sequence

    a = tmp_path / "tchw"
    b = tmp_path / "thwc"
    a.mkdir()
    b.mkdir()
    make_sequence(a, "seq", 12, [3, 7, 11], seed=5, layout="tchw")
    make_sequence(b, "seq", 12, [3, 7, 11], seed=5, layout="thwc")

    ra = SequenceReader(a / "seq", "test_repr", "gen1")
    rb = SequenceReader(b / "seq", "test_repr", "gen1")
    assert ra.ev_repr_shape == rb.ev_repr_shape == (C, H, W)
    np.testing.assert_array_equal(ra.get_ev_repr(0, 12), rb.get_ev_repr(0, 12))
    np.testing.assert_array_equal(ra.get_ev_repr(3, 7), rb.get_ev_repr(3, 7))
    assert rb.get_ev_repr(0, 4).shape == (4, H, W, C)


def test_large_seed_does_not_overflow_lane_rng(dataset_root):
    """User seeds are unbounded; lane-derived RandomState seeds must wrap
    (regression: seed * 104729 exceeded 2**32 - 1 for seeds >= ~41k)."""
    cfg = _cfg(dataset_root)
    import dataclasses

    from sast_tpu.data.module import DataModule

    tr = dataclasses.replace(
        cfg.training, batch_size_train=2, batch_size_eval=2
    )
    ds = dataclasses.replace(cfg.dataset, train_sampling="stream")
    dm = DataModule(dataclasses.replace(cfg, dataset=ds, training=tr))
    it = iter(dm.train_batches(seed=123_456_789, prefetch=False))
    batch = next(it)
    assert batch["ev_repr"].shape[1] == 2


def test_mixed_single_lane_degrades_to_stream(dataset_root):
    """mixed with a 1-lane per-host batch must not build a 0-lane random
    sampler (regression: ThreadPoolExecutor(max_workers=0) ValueError)."""
    cfg = _cfg(dataset_root)
    import dataclasses

    from sast_tpu.data.module import DataModule

    tr = dataclasses.replace(
        cfg.training, batch_size_train=1, batch_size_eval=1
    )
    ds = dataclasses.replace(cfg.dataset, train_sampling="mixed")
    dm = DataModule(dataclasses.replace(cfg, dataset=ds, training=tr))
    batch = next(iter(dm.train_batches(prefetch=False)))
    assert batch["ev_repr"].shape[1] == 1


def test_prefetcher_close_releases_producer():
    """A consumer that stops early must be able to release the producer
    thread (it otherwise blocks forever holding buffered batches)."""
    import time

    from sast_tpu.data.batch import Prefetcher

    def infinite():
        i = 0
        while True:
            yield i
            i += 1

    pf = Prefetcher(infinite())
    it = iter(pf)
    assert next(it) == 0
    pf.close()
    deadline = time.time() + 5.0
    while pf._thread.is_alive() and time.time() < deadline:
        time.sleep(0.05)
    assert not pf._thread.is_alive()
    pf.close()  # idempotent
