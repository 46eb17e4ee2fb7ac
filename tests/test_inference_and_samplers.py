"""Streaming inference step, mixed/weighted samplers, registry."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sast_tpu.config import get_test_config
from sast_tpu.data.module import DataModule, MixedSampler, RandomAccessSampler
from sast_tpu.models.backbone import zero_states
from sast_tpu.training.steps import create_train_state, make_inference_step


def test_inference_step(dataset_root):
    cfg = get_test_config()
    state, model = create_train_state(cfg, jax.random.PRNGKey(0))
    infer = jax.jit(make_inference_step(model, cfg))
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    B = 2
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, *cfg.model.backbone.in_res_hw, 20), jnp.float32)
    states = zero_states(cfg.model.backbone, B)
    dets, new_states, p = infer(variables, x, states)
    assert dets["boxes"].shape == (B, cfg.model.postprocess.max_detections, 4)
    assert dets["valid"].dtype == bool
    assert len(new_states) == 4
    # streaming: states feed back in
    dets2, _, _ = infer(variables, x, new_states)
    assert bool(jnp.isfinite(dets2["scores"]).all())


def _cfg(dataset_root):
    cfg = get_test_config()
    ds = dataclasses.replace(
        cfg.dataset,
        path=str(dataset_root),
        ev_repr_name="test_repr",
        sequence_length=4,
        train_sampling="mixed",
        weighted_sampling=True,
    )
    return dataclasses.replace(cfg, dataset=ds)


def test_mixed_sampler_batch_composition(dataset_root):
    cfg = _cfg(dataset_root)
    dm = DataModule(cfg)
    it = iter(dm.train_batches(prefetch=False))
    for _ in range(3):
        batch = next(it)
        B = batch["ev_repr"].shape[1]
        assert B == cfg.training.batch_size_train
        # random lanes always reset their state
        assert batch["is_first"][B // 2 :].all() or batch["is_first"].any()


def test_weighted_random_sampler(dataset_root):
    cfg = _cfg(dataset_root)
    dm = DataModule(cfg)
    readers = dm._readers("train")
    sampler = RandomAccessSampler(
        readers, seq_len=4, batch_size=2, augmentor=None,
        weighted=True, seed=0,
    )
    assert sampler.probs is not None
    assert abs(sampler.probs.sum() - 1.0) < 1e-9
    batch = next(iter(sampler))
    assert len(batch) == 2
    assert all(c["is_first"] for c in batch)
    # every random-access sample ends at a labeled frame
    for c in batch:
        assert c["labels"][-1] is not None


def test_only_load_end_labels_supervises_all_window_frames(tmp_path):
    """Reference default (only_load_end_labels=False, sequence_rnd.py:54 +
    config/dataset/gen1.yaml) supervises EVERY labeled frame in the random
    window; True keeps only the final one. The train step must see the
    difference in frame_valid counts and in the loss."""
    from tests.conftest import make_sequence

    from sast_tpu.data.batch import assemble_batch
    from sast_tpu.data.sequence import SequenceReader

    # Labels at consecutive reprs 3..6 -> the window ending at repr 6 with
    # seq_len 4 contains 4 labeled frames.
    make_sequence(tmp_path, "seq", 10, [3, 4, 5, 6], seed=0, ch=4)
    reader = SequenceReader(tmp_path / "seq", "test_repr", "gen1", False)

    assert reader.random_access_start_offset(4) == 0
    assert reader.num_random_access_samples(4) == 4

    ev_all, labels_all = reader.random_access_sample(3, 4, only_load_end_labels=False)
    ev_end, labels_end = reader.random_access_sample(3, 4, only_load_end_labels=True)
    np.testing.assert_array_equal(ev_all, ev_end)
    assert sum(fl is not None for fl in labels_all) == 4
    assert sum(fl is not None for fl in labels_end) == 1
    assert labels_end[-1] is not None

    def batch_for(labels):
        clip = {
            "ev_repr": ev_all,
            "labels": labels,
            "is_first": True,
            "is_real_mask": np.ones((4,), bool),
        }
        return assemble_batch([clip], max_labeled_frames=4, max_gt=8)

    b_all = batch_for(labels_all)
    b_end = batch_for(labels_end)
    assert b_all["frame_valid"].sum() == 4
    assert b_end["frame_valid"].sum() == 1

    # Same static shapes in both modes -> one compile; losses must differ
    # because three extra frames enter the detection loss.
    from sast_tpu.config import _apply_overrides

    cfg = _apply_overrides(
        get_test_config(),
        {
            "model.backbone.input_channels": 4,  # synthetic data has 4 ch
            "training.max_labeled_frames_per_lane": 4,
            "training.batch_size_train": 1,
        },
    )
    from sast_tpu.data.batch import split_device_batch
    from sast_tpu.training.steps import make_train_step

    state, model = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, cfg))
    losses = {}
    for name, b in [("all", b_all), ("end", b_end)]:
        dev, _ = split_device_batch(b)
        # Test config model resolution is (64, 96): crop the synthetic
        # (240, 304) events to keep the test fast.
        ev = dev["ev_repr"][:, :, :64, : 96 * 4]
        dev = {**dev, "ev_repr": jnp.asarray(ev)}
        lstm = zero_states(cfg.model.backbone, 1)
        _, _, metrics = step(state, dev, lstm)
        losses[name] = float(metrics["loss"])
    assert np.isfinite(losses["all"]) and np.isfinite(losses["end"])
    assert losses["all"] != losses["end"]


def test_weighted_sampler_matches_reference_formula(tmp_path):
    """Sampler weights must follow dataset_rnd.py:115-149: per-sample
    sum(class2weight[c] * count) over the window's GT boxes, with
    class2weight = 1/global count over all samples' windows."""
    from tests.conftest import make_sequence

    from sast_tpu.data.sequence import SequenceReader

    make_sequence(tmp_path, "s1", 12, [3, 5, 6, 9], seed=7, ch=4)
    make_sequence(tmp_path, "s2", 15, [2, 8, 10, 14], seed=8, ch=4)
    readers = [
        SequenceReader(tmp_path / n, "test_repr", "gen1", False)
        for n in ("s1", "s2")
    ]
    L = 4
    sampler = RandomAccessSampler(
        readers, seq_len=L, batch_size=2, augmentor=None,
        weighted=True, seed=0,
    )

    # Independent reimplementation of the reference loop over the labels the
    # samples actually load (not via window_class_ids).
    per_sample = []
    for r in readers:
        off = r.random_access_start_offset(L)
        assert off == (1 if r is readers[1] else 0)  # s2 objframe 0: repr 2 < 3
        for oi in range(off, len(r.objframe_idx_2_repr_idx)):
            _, labels = r.random_access_sample(oi, L)
            ids = np.concatenate(
                [
                    np.asarray(fl.class_id, np.int64)
                    for fl in labels
                    if fl is not None and len(fl) > 0
                ]
            )
            per_sample.append(ids)
    assert len(per_sample) == len(sampler.index)
    class2count = {}
    for ids in per_sample:
        for c in ids:
            class2count[int(c)] = class2count.get(int(c), 0) + 1
    class2weight = {c: 1.0 / max(n, 1) for c, n in class2count.items()}
    expected = np.array(
        [sum(class2weight[int(c)] for c in ids) for ids in per_sample]
    )
    expected /= expected.sum()
    np.testing.assert_allclose(sampler.probs, expected, rtol=1e-12)


def test_registry(dataset_root):
    from sast_tpu.registry import build_detector, fetch_data_module

    cfg = _cfg(dataset_root)
    dm = fetch_data_module(cfg)
    assert isinstance(dm, DataModule)
    det = build_detector(cfg)
    assert det.config is cfg.model
