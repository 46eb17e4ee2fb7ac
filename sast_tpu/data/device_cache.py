"""In-HBM dataset cache: zero per-step host->device event traffic.

The production loader is host-fed (disk -> h5 decode -> augment -> assemble
-> upload), which is the right architecture for terabyte datasets — but the
per-step upload of the (T, B, H, W*C) uint8 batch (245 MB at the gen1-base
recipe) is pure interconnect traffic. On a host with a thin link to the
device (network-attached TPUs — this environment's tunnel moves ~40 MB/s on
a bad day — or a starved PCIe slot) that upload dominates the 0.23 s train
step 20x over. The reference has no answer to this because CUDA hosts are
assumed local; the TPU-native answer is to keep the *dataset* in HBM when it
fits (synthetic recipes, overfit runs, CI, benchmark loops):

- every sequence's event representations are uploaded ONCE (uint8, all
  sequences concatenated on the frame axis);
- each training step gathers its (T, B) clip windows on device with a
  jitted ``dynamic_slice`` + zero-pad + optional horizontal flip;
- labels (KB-scale) are packed on host with the exact production logic
  (data/batch.py pack_batch_labels).

All three train sampling modes are supported ('stream', 'random', 'mixed')
with identical lane scheduling, RNG streams, clip windows, tail
zero-padding, weighted random sampling, and is_first resets as the host
samplers (ConcatStreamsSampler / RandomAccessSampler / MixedSampler) —
covered by bit-exact parity tests (tests/test_device_cache.py).
Augmentation:
horizontal flip is applied on device (the same ``[:, :, ::-1]`` the host
augmentor applies, data/augment.py:153); zoom/rotate are host-resampling
ops and are NOT supported — the cache forces their probability to zero and
says so once. Scope: single-process (no mesh sharding of the cache; use the
host loader for multi-host runs).
"""

from __future__ import annotations

import dataclasses
import sys
from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import numpy as np

from sast_tpu.config import ExperimentConfig
from sast_tpu.data.augment import SpatialAugmentor
from sast_tpu.data.batch import pack_batch_labels
from sast_tpu.data.labels import FrameLabels
from sast_tpu.data.module import RandomAccessSampler, discover_sequences
from sast_tpu.data.sequence import SequenceReader


def _flip_labels(labels: List[Optional[FrameLabels]]):
    """Label-side horizontal flip with the host augmentor's exact
    postconditions (copy, flip_lr_, drop-empties — data/augment.py:150-157,
    200-201)."""
    labels = [fl.copy() if fl is not None else None for fl in labels]
    for fl in labels:
        if fl is not None:
            fl.flip_lr_()
    return [fl if (fl is not None and len(fl) > 0) else None for fl in labels]


def _flip_only(aug_cfg):
    """Stream augmentation restricted to what the device gather supports."""
    zoom = dataclasses.replace(aug_cfg.zoom, prob=0.0)
    return dataclasses.replace(aug_cfg, rotate_prob=0.0, zoom=zoom)


class _LaneSchedule:
    """Metadata-only mirror of ConcatStreamsSampler._lane_iter
    (data/streaming.py:75-104): same RNG seeds, same stream permutation
    walk, same one-augment-state-per-stream draw — but yields
    (global_start, n_real, is_first, flip, labels) instead of pixel data."""

    def __init__(
        self,
        streams: List[Tuple[int, List[Tuple[int, int]]]],  # (reader_i, ranges)
        readers: List[SequenceReader],
        offsets: np.ndarray,
        seq_len: int,
        lane: int,
        seed: int,
        aug_cfg,
        hw: Tuple[int, int],
    ):
        self.streams = streams
        self.readers = readers
        self.offsets = offsets
        self.seq_len = seq_len
        self.rng = np.random.RandomState((seed * 7919 + lane) % (2**32))
        self.augmentor = SpatialAugmentor(
            aug_cfg, stream_mode=True,
            rng=np.random.RandomState((seed * 104729 + lane + 1) % (2**32)),
        )
        self.hw = hw
        self._gen = self._iter()

    def _iter(self):
        while True:
            order = self.rng.permutation(len(self.streams))
            for si in order:
                ri, ranges = self.streams[si]
                state = self.augmentor.sample_state(self.hw)
                first = True
                for start, end in ranges:
                    labels: List[Optional[FrameLabels]] = [
                        self.readers[ri].labels_at_repr_idx(r)
                        for r in range(start, end)
                    ]
                    labels += [None] * (self.seq_len - (end - start))
                    if state.apply_hflip:
                        labels = _flip_labels(labels)
                    yield (
                        int(self.offsets[ri]) + start,
                        end - start,
                        first,
                        bool(state.apply_hflip),
                        labels,
                    )
                    first = False

    def __next__(self):
        return next(self._gen)


class _RandomSchedule:
    """Metadata-only mirror of RandomAccessSampler.__iter__
    (data/module.py:127-148): same index/weights (reused from the real
    sampler), same per-batch draw order (augment state, index draw,
    per-item rng seed) — yielding gather rows for ALL random lanes of a
    batch at once (the draw order is batch-major, not lane-major)."""

    def __init__(
        self,
        readers: List[SequenceReader],
        offsets: np.ndarray,
        seq_len: int,
        batch_size: int,
        seed: int,
        aug_cfg,
        aug_seed: int,
        hw: Tuple[int, int],
        weighted: bool,
        only_load_end_labels: bool,
    ):
        # The real sampler computes the flat sample index + the reference
        # weighted-sampling formula in __init__ (no pixel reads); reuse it.
        self.sampler = RandomAccessSampler(
            readers, seq_len, batch_size, augmentor=None,
            weighted=weighted, seed=seed,
            only_load_end_labels=only_load_end_labels,
        )
        self.readers = readers
        self.offsets = offsets
        self.seq_len = seq_len
        self.batch_size = batch_size
        self.only_load_end_labels = only_load_end_labels
        self.augmentor = SpatialAugmentor(
            aug_cfg, stream_mode=False, rng=np.random.RandomState(aug_seed)
        )
        self.hw = hw

    def next_rows(self) -> List[tuple]:
        rows = []
        for _ in range(self.batch_size):
            # Exact draw order of RandomAccessSampler.__iter__: augment
            # state first (augmentor rng), then the index draw and the
            # per-item rng seed (sampler rng; the latter feeds only the
            # zoom-in window, unused under flip-only, but the draw itself
            # must happen to keep the streams aligned).
            state = self.augmentor.sample_state(self.hw)
            k = self.sampler._draw()
            self.sampler.rng.randint(2**31)
            ri, oi = self.sampler.index[k]
            r = self.readers[ri]
            end = int(r.objframe_idx_2_repr_idx[oi]) + 1
            start = end - self.seq_len
            if self.only_load_end_labels:
                labels: List[Optional[FrameLabels]] = (
                    [None] * (self.seq_len - 1) + [r.labels_at_repr_idx(end - 1)]
                )
            else:
                labels = [r.labels_at_repr_idx(i) for i in range(start, end)]
            if state.apply_hflip:
                labels = _flip_labels(labels)
            rows.append((
                int(self.offsets[ri]) + start,
                self.seq_len,
                True,  # random-access always resets the state
                bool(state.apply_hflip),
                labels,
            ))
        return rows


class _HbmCache:
    """One split's event representations resident in HBM + the jitted clip
    gather. Shared by the train and eval cached streams."""

    def __init__(self, cfg: ExperimentConfig, split: str):
        import jax

        ds = cfg.dataset
        self.seq_len = ds.sequence_length
        self.readers = [
            SequenceReader(p, ds.ev_repr_name, ds.name, ds.downsample_by_factor_2)
            for p in discover_sequences(Path(ds.path), split)
        ]
        c, h, w = self.readers[0].ev_repr_shape
        self.hw = (h, w)
        self.channels = c
        counts = np.array([r.num_ev_repr for r in self.readers], np.int64)
        self.offsets = np.concatenate(([0], np.cumsum(counts)))[:-1]
        total = int(counts.sum())

        # Host cache (N + seq_len, H, W*C) u8 — the seq_len zero tail keeps
        # every dynamic_slice in bounds (tail clips read past their stream's
        # end; those frames are masked to zero anyway, and unclamped slices
        # would otherwise shift the window).
        nbytes = (total + self.seq_len) * h * w * c
        print(
            f"device cache[{split}]: uploading {len(self.readers)} sequences, "
            f"{total} frames, {nbytes / 2**30:.2f} GiB uint8 to device HBM",
            file=sys.stderr,
        )
        host = np.zeros((total + self.seq_len, h, w * c), np.uint8)
        for r, off in zip(self.readers, self.offsets):
            ev = r.get_ev_repr(0, r.num_ev_repr)  # (n, H, W, C) uint8
            host[off : off + r.num_ev_repr] = ev.reshape(r.num_ev_repr, h, w * c)
            r.close()
        self.cache = jax.device_put(host)
        del host
        self._gather = self._build_gather()

    def _build_gather(self):
        import jax
        import jax.numpy as jnp

        T = self.seq_len
        H, W = self.hw
        C = self.channels

        def gather(cache, starts, n_real, flip):
            def lane(start, nr, fl):
                ev = jax.lax.dynamic_slice(
                    cache, (start, 0, 0), (T, H, W * C)
                )  # (T, H, W*C) u8
                mask = (jnp.arange(T, dtype=jnp.int32) < nr)[:, None, None]
                ev = jnp.where(mask, ev, jnp.uint8(0))
                # Same pixels as the host augmentor's ev[:, :, ::-1]
                # (data/augment.py:153): reverse W, keep C order.
                evf = jnp.flip(ev.reshape(T, H, W, C), axis=2).reshape(
                    T, H, W * C
                )
                return jnp.where(fl, evf, ev)

            ev = jax.vmap(lane)(starts, n_real, flip)  # (B, T, H, W*C)
            return jnp.transpose(ev, (1, 0, 2, 3))  # (T, B, H, W*C)

        return jax.jit(gather)

    def rows_to_batch(self, rows, max_labeled_frames: int, max_gt: int) -> dict:
        """(start, n_real, is_first, flip, labels) rows -> batch dict."""
        starts = np.array([r[0] for r in rows], np.int32)
        n_real = np.array([r[1] for r in rows], np.int32)
        is_first = np.array([r[2] for r in rows], bool)
        flip = np.array([r[3] for r in rows], bool)
        batch = pack_batch_labels(
            [r[4] for r in rows], max_labeled_frames, max_gt
        )
        batch["ev_repr"] = self._gather(self.cache, starts, n_real, flip)
        batch["is_first"] = is_first
        return batch


class DeviceCachedTrainStream:
    """Infinite train batches with ``ev_repr`` gathered from an HBM-resident
    cache (a drop-in replacement for ``DataModule.train_batches`` for the
    'stream', 'random' and 'mixed' sampling modes when the dataset fits in
    HBM)."""

    def __init__(self, cfg: ExperimentConfig, seed: int = 0):
        ds = cfg.dataset
        mode = ds.train_sampling
        assert mode in ("stream", "random", "mixed"), mode
        self.cfg = cfg
        # The host samplers receive seed=(user_seed + rank); the cache is
        # single-process, so rank is always 0 and the seed passes as-is.
        self._seed = seed
        self.batch_size = B = cfg.training.batch_size_train
        self._hbm = _HbmCache(cfg, "train")
        self.seq_len = self._hbm.seq_len
        self.readers = self._hbm.readers
        self.offsets = self._hbm.offsets
        self.hw = self._hbm.hw

        def flip_only(aug, kind):
            if aug.rotate_prob > 0 or aug.zoom.prob > 0:
                print(
                    f"device cache: zoom/rotate {kind} augmentation is "
                    "host-only; running with horizontal flip only",
                    file=sys.stderr,
                )
            return _flip_only(aug)

        self.aug_cfg = flip_only(ds.data_augmentation_stream, "stream")
        self.aug_cfg_random = flip_only(ds.data_augmentation_random, "random")

        # Lane split, exactly DataModule.train_batches (data/module.py:
        # 221-271): stream -> all lanes stream; random -> all lanes random;
        # mixed -> static split by the configured weights (B=1 degrades to
        # pure streaming with the same notice).
        if mode == "stream":
            self.b_stream, self.b_random = B, 0
        elif mode == "random":
            self.b_stream, self.b_random = 0, B
        elif B == 1:
            print(
                "mixed sampling with a per-host batch of 1 lane: using "
                "stream sampling for this host",
                file=sys.stderr,
            )
            self.b_stream, self.b_random = 1, 0
        else:
            total_w = ds.mixed_w_stream + ds.mixed_w_random
            self.b_stream = max(
                1, min(B - 1, round(B * ds.mixed_w_stream / total_w))
            )
            self.b_random = B - self.b_stream

        # Same stream decomposition as DataModule._stream_clips (train:
        # guarantee_labels=True), tagged with the owning reader.
        self.streams: List[Tuple[int, List[Tuple[int, int]]]] = []
        for ri, r in enumerate(self.readers):
            for ranges in r.streams(self.seq_len, True):
                self.streams.append((ri, ranges))
        assert self.streams or self.b_stream == 0, (
            "no labeled streams in the train split"
        )

    def __iter__(self) -> Iterator[dict]:
        ds = self.cfg.dataset
        lanes = [
            _LaneSchedule(
                self.streams, self.readers, self.offsets, self.seq_len,
                lane=b, seed=self._seed, aug_cfg=self.aug_cfg, hw=self.hw,
            )
            for b in range(self.b_stream)
        ]
        random_sched = None
        if self.b_random:
            random_sched = _RandomSchedule(
                self.readers, self.offsets, self.seq_len, self.b_random,
                seed=self._seed, aug_cfg=self.aug_cfg_random,
                aug_seed=self._seed + 202, hw=self.hw,
                weighted=ds.weighted_sampling,
                only_load_end_labels=ds.only_load_end_labels,
            )
        tr = self.cfg.training
        max_gt = self.cfg.model.head.max_gt
        while True:
            # MixedSampler order: stream lanes first, then random lanes
            # (data/module.py:158-162).
            rows = [next(lane) for lane in lanes]
            if random_sched is not None:
                rows += random_sched.next_rows()
            yield self._hbm.rows_to_batch(
                rows, tr.max_labeled_frames_per_lane, max_gt
            )


class DeviceCachedEvalStream:
    """Finite eval batches from the HBM cache — the cached counterpart of
    ``DataModule.eval_batches``: the same zig-zag lane sharding, lane
    chaining, per-stream is_first resets, and fully-padded fill clips as
    ShardedEvalSampler (data/streaming.py:120-176; single-process, so
    rank=0/world=1). Eval applies no augmentation, so the cached batches
    are bit-equal to the host path unconditionally."""

    def __init__(self, cfg: ExperimentConfig, split: str = "val"):
        from sast_tpu.data.streaming import zigzag_assign

        self.cfg = cfg
        self.batch_size = cfg.training.batch_size_eval
        self._hbm = _HbmCache(cfg, split)
        T = self._hbm.seq_len

        # One eval stream per sequence (guarantee_labels=False), zig-zag
        # dealt over the lanes by clip count, exactly like the host sampler.
        self.streams: List[Tuple[int, List[Tuple[int, int]]]] = []
        for ri, r in enumerate(self._hbm.readers):
            for ranges in r.streams(T, False):
                self.streams.append((ri, ranges))
        lanes = zigzag_assign(
            [len(ranges) for _, ranges in self.streams], self.batch_size
        )
        self.lanes = lanes
        self.global_steps = (
            max(sum(len(self.streams[i][1]) for i in lane) for lane in lanes)
            if lanes else 0
        )

    def __len__(self) -> int:
        return self.global_steps

    def _lane_rows(self, stream_ids: List[int]) -> Iterator[tuple]:
        T = self._hbm.seq_len
        for si in stream_ids:
            ri, ranges = self.streams[si]
            r = self._hbm.readers[ri]
            first = True
            for start, end in ranges:
                labels: List[Optional[FrameLabels]] = [
                    r.labels_at_repr_idx(i) for i in range(start, end)
                ]
                labels += [None] * (T - (end - start))
                yield (
                    int(self._hbm.offsets[ri]) + start,
                    end - start,
                    first,
                    False,
                    labels,
                )
                first = False

    def __iter__(self) -> Iterator[dict]:
        T = self._hbm.seq_len
        tr = self.cfg.training
        max_gt = self.cfg.model.head.max_gt
        fill = (0, 0, True, False, [None] * T)  # n_real=0 -> all-zero frames
        lane_iters = [self._lane_rows(ids) for ids in self.lanes]
        for _ in range(self.global_steps):
            rows = [next(it, fill) for it in lane_iters]
            yield self._hbm.rows_to_batch(
                rows, tr.max_labeled_frames_per_lane, max_gt
            )
