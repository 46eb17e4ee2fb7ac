"""In-HBM dataset cache (data/device_cache.py) vs the host streaming path.

The cache must be a drop-in replacement for the production stream sampler:
same lane scheduling, same RNG streams, same clip windows / tail padding /
is_first resets, same label packing, and the same horizontal-flip pixels —
verified bit-exactly against DataModule.train_batches on a tiny on-disk
dataset (flip-only augmentation so both paths draw identical states).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest

from sast_tpu.config import get_test_config
from sast_tpu.data.device_cache import DeviceCachedTrainStream
from sast_tpu.data.module import DataModule


def _cfg(
    dataset_root,
    prob_hflip,
    zoom_prob=0.0,
    seq_len=5,
    batch=3,
    mode="stream",
    weighted=False,
):
    cfg = get_test_config()

    def aug(a):
        return dataclasses.replace(
            a,
            prob_hflip=prob_hflip,
            rotate_prob=0.0,
            zoom=dataclasses.replace(a.zoom, prob=zoom_prob),
        )

    ds = dataclasses.replace(
        cfg.dataset,
        path=str(dataset_root),
        ev_repr_name="test_repr",
        sequence_length=seq_len,
        train_sampling=mode,
        weighted_sampling=weighted,
        data_augmentation_stream=aug(cfg.dataset.data_augmentation_stream),
        data_augmentation_random=aug(cfg.dataset.data_augmentation_random),
    )
    tr = dataclasses.replace(cfg.training, batch_size_train=batch)
    return dataclasses.replace(cfg, dataset=ds, training=tr)


def _compare_streams(cfg, seed, n_batches):
    host_it = iter(DataModule(cfg).train_batches(seed=seed, prefetch=False))
    cache_it = iter(DeviceCachedTrainStream(cfg, seed=seed))
    for i in range(n_batches):
        hb = next(host_it)
        cb = next(cache_it)
        np.testing.assert_array_equal(
            np.asarray(cb["ev_repr"]), hb["ev_repr"], err_msg=f"batch {i}"
        )
        for k in (
            "is_first", "frame_tidx", "frame_valid",
            "gt_boxes", "gt_classes", "gt_valid",
        ):
            np.testing.assert_array_equal(
                np.asarray(cb[k]), hb[k], err_msg=f"batch {i} key {k}"
            )


def test_device_cache_bit_matches_host_no_flip(dataset_root):
    # prob_hflip=0: pure scheduling/windowing/padding parity. 12 batches x
    # 3 lanes over 5 streams covers stream re-permutations and tail clips.
    _compare_streams(_cfg(dataset_root, prob_hflip=0.0), seed=7, n_batches=12)


def test_device_cache_bit_matches_host_with_flip(dataset_root):
    # prob_hflip=1: every stream flips — device pixel flip + host label
    # flip must match the host augmentor exactly.
    _compare_streams(_cfg(dataset_root, prob_hflip=1.0), seed=3, n_batches=8)


def test_device_cache_bit_matches_host_mixed_flip(dataset_root):
    # prob_hflip=0.5: the per-stream flip RNG stream itself must match.
    _compare_streams(_cfg(dataset_root, prob_hflip=0.5), seed=11, n_batches=10)


def test_device_cache_bit_matches_host_random_mode(dataset_root):
    # random-access lanes: index draws, per-item rng seeds, is_first=True
    # and per-item flips must align with RandomAccessSampler.
    _compare_streams(
        _cfg(dataset_root, prob_hflip=0.5, mode="random", batch=4),
        seed=5, n_batches=10,
    )


def test_device_cache_bit_matches_host_random_weighted(dataset_root):
    # the reference weighted-sampling formula changes the draw distribution;
    # the cache reuses the real sampler's weights, so draws must match.
    _compare_streams(
        _cfg(dataset_root, prob_hflip=0.0, mode="random", batch=4,
             weighted=True),
        seed=2, n_batches=10,
    )


def test_device_cache_bit_matches_host_mixed_mode(dataset_root):
    # mixed: 2 stream lanes + 2 random lanes, flip-enabled — the full gen1
    # recipe shape (the 20k longrun runs exactly this path).
    _compare_streams(
        _cfg(dataset_root, prob_hflip=0.5, mode="mixed", batch=4),
        seed=9, n_batches=12,
    )


def test_device_cache_eval_bit_matches_host(dataset_root):
    # eval: zig-zag lane sharding, lane chaining, per-stream is_first
    # resets, fill clips, finite length — vs DataModule.eval_batches.
    from sast_tpu.data.device_cache import DeviceCachedEvalStream

    cfg = _cfg(dataset_root, prob_hflip=0.0, batch=3)
    cfg = dataclasses.replace(
        cfg, training=dataclasses.replace(cfg.training, batch_size_eval=3)
    )
    host = list(DataModule(cfg).eval_batches("val", prefetch=False))
    cached_stream = DeviceCachedEvalStream(cfg, "val")
    cached = list(cached_stream)
    assert len(cached) == len(host) == len(cached_stream)
    for i, (hb, cb) in enumerate(zip(host, cached)):
        np.testing.assert_array_equal(
            np.asarray(cb["ev_repr"]), hb["ev_repr"], err_msg=f"batch {i}"
        )
        for k in (
            "is_first", "frame_tidx", "frame_valid",
            "gt_boxes", "gt_classes", "gt_valid",
        ):
            np.testing.assert_array_equal(
                np.asarray(cb[k]), hb[k], err_msg=f"batch {i} key {k}"
            )
        # the evaluator consumes the host-side label references too
        for lane_h, lane_c in zip(hb["_labels"], cb["_labels"]):
            for fh, fc in zip(lane_h, lane_c):
                assert (fh is None) == (fc is None)
                if fh is not None:
                    np.testing.assert_array_equal(
                        fh.to_structured(), fc.to_structured()
                    )
    # reusing the stream object (fit validates repeatedly) replays it
    again = list(cached_stream)
    assert len(again) == len(cached)
    np.testing.assert_array_equal(
        np.asarray(again[0]["ev_repr"]), np.asarray(cached[0]["ev_repr"])
    )


def test_device_cache_forces_unsupported_augment_off(dataset_root, capsys):
    # zoom configured: the cache must run flip-only and say so, not crash
    # or silently claim zoom coverage.
    cfg = _cfg(dataset_root, prob_hflip=0.5, zoom_prob=0.5)
    stream = DeviceCachedTrainStream(cfg, seed=0)
    assert stream.aug_cfg.zoom.prob == 0.0
    err = capsys.readouterr().err
    assert "host-only" in err
    batch = next(iter(stream))
    assert np.asarray(batch["ev_repr"]).shape[1] == 3  # (T, B, H, W*C)


def test_device_cache_rejects_unknown_sampling(dataset_root):
    cfg = _cfg(dataset_root, prob_hflip=0.0)
    cfg = dataclasses.replace(
        cfg, dataset=dataclasses.replace(cfg.dataset, train_sampling="bogus")
    )
    with pytest.raises(AssertionError):
        DeviceCachedTrainStream(cfg, seed=0)
