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
        weighted=True, num_classes=2, seed=0,
    )
    assert sampler.probs is not None
    assert abs(sampler.probs.sum() - 1.0) < 1e-9
    batch = next(iter(sampler))
    assert len(batch) == 2
    assert all(c["is_first"] for c in batch)
    # every random-access sample ends at a labeled frame
    for c in batch:
        assert c["labels"][-1] is not None


def test_registry(dataset_root):
    from sast_tpu.registry import build_detector, fetch_data_module

    cfg = _cfg(dataset_root)
    dm = fetch_data_module(cfg)
    assert isinstance(dm, DataModule)
    det = build_detector(cfg)
    assert det.config is cfg.model
