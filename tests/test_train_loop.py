"""End-to-end fit + validate over the synthetic on-disk dataset (CPU).

Exercises the whole vertical slice: disk -> streams -> batches -> jitted
train step -> periodic streaming validation -> Prophesee metrics ->
checkpointing -> weights-only restore.
"""

import dataclasses

import numpy as np
import pytest

from sast_tpu.config import get_test_config
from sast_tpu.data.module import DataModule
from sast_tpu.training.loop import Trainer


@pytest.fixture(scope="module")
def tiny_cfg(dataset_root):
    cfg = get_test_config()
    ds = dataclasses.replace(
        cfg.dataset,
        path=str(dataset_root),
        ev_repr_name="test_repr",
        sequence_length=4,
    )
    # 4-channel synthetic reprs -> backbone must accept 4 input channels
    bb = dataclasses.replace(cfg.model.backbone, input_channels=4, in_res_hw=(256, 320))
    attn = dataclasses.replace(bb.attention, partition_size=(4, 5))
    bb = dataclasses.replace(bb, attention=attn)
    model = dataclasses.replace(cfg.model, backbone=bb)
    return dataclasses.replace(cfg, dataset=ds, model=model)


def test_fit_and_validate(tiny_cfg, tmp_path):
    dm = DataModule(tiny_cfg)
    trainer = Trainer(
        tiny_cfg, workdir=str(tmp_path / "run"), log_every=1, val_every=None
    )
    metrics = trainer.fit(
        dm.train_batches(prefetch=False), max_steps=2
    )
    assert np.isfinite(metrics["train/loss"])

    val = trainer.validate(dm.eval_batches("val", prefetch=False), max_batches=4)
    assert "val/AP" in val
    assert 0.0 <= val["val/AP"] <= 1.0

    # checkpoint save + weights-only restore round trip
    trainer.ckpt.save(2, trainer.state, metrics={"val_AP": val["val/AP"]})
    import jax

    params_before = jax.tree.leaves(trainer.state.params)
    restored = trainer.ckpt.restore_weights(trainer.state)
    for a, b in zip(params_before, jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
