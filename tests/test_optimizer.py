"""Optimizer / LR schedule tests (reference recipe semantics)."""

import numpy as np

from sast_tpu.config import TrainingConfig, LRSchedulerConfig
from sast_tpu.training.optimizer import (
    build_optimizer,
    onecycle_linear_schedule,
    scale_lr_for_global_batch,
)


def test_onecycle_shape():
    peak, total = 2e-4, 1000
    sched = onecycle_linear_schedule(peak, total, pct_start=0.1, div_factor=20,
                                     final_div_factor=10000)
    lr0 = float(sched(0))
    lr_peak = float(sched(100))
    lr_end = float(sched(total))
    assert abs(lr0 - peak / 20) / peak < 0.01
    assert abs(lr_peak - peak) / peak < 0.02
    assert abs(lr_end - peak / 10000) / peak < 0.01
    # linear in both phases
    mid_up = float(sched(50))
    assert abs(mid_up - (lr0 + lr_peak) / 2) / peak < 0.02


def test_lr_scaling_rule():
    # lr = 2e-4 * sqrt(total_bs / 8) (reference README)
    assert abs(scale_lr_for_global_batch(2e-4, 8) - 2e-4) < 1e-12
    assert abs(scale_lr_for_global_batch(2e-4, 32) - 4e-4) < 1e-12


def test_clip_by_value():
    import jax.numpy as jnp
    import optax

    cfg = TrainingConfig(
        gradient_clip_val=1.0,
        lr_scheduler=LRSchedulerConfig(use=False),
        learning_rate=1.0,
    )
    tx = build_optimizer(cfg)
    params = {"w": jnp.zeros(3)}
    opt_state = tx.init(params)
    grads = {"w": jnp.asarray([5.0, -7.0, 0.5])}
    updates, _ = tx.update(grads, opt_state, params)
    # after value clipping to [-1, 1], adam normalizes; the sign survives
    u = np.asarray(updates["w"])
    assert u[0] < 0 and u[1] > 0 and u[2] < 0  # descent direction


def test_build_optimizer_lr_override_is_linear():
    """The learning_rate argument must actually drive the update magnitude
    (guards the train.py -> Trainer -> create_train_state lr plumbing)."""
    import jax.numpy as jnp

    cfg = TrainingConfig(lr_scheduler=LRSchedulerConfig(use=False))
    params = {"w": jnp.ones((3,))}
    grads = {"w": jnp.full((3,), 0.5)}

    def first_update(lr):
        tx = build_optimizer(cfg, learning_rate=lr)
        opt_state = tx.init(params)
        updates, _ = tx.update(grads, opt_state, params)
        return np.asarray(updates["w"])

    u1 = first_update(1e-4)
    u2 = first_update(2e-4)
    np.testing.assert_allclose(u2, 2.0 * u1, rtol=1e-6)
    assert np.all(u1 != 0)


def test_trainer_plumbs_scaled_lr(monkeypatch, tmp_path):
    """Trainer.__init__ must forward learning_rate to create_train_state
    (VERDICT r1 bug: scale_lr_for_global_batch output was dropped)."""
    import sast_tpu.training.loop as loop_mod
    from sast_tpu.config import get_test_config

    captured = {}
    orig = loop_mod.create_train_state

    def spy(cfg, rng, learning_rate=None, **kw):
        captured["lr"] = learning_rate
        return orig(cfg, rng, learning_rate=learning_rate, **kw)

    monkeypatch.setattr(loop_mod, "create_train_state", spy)
    cfg = get_test_config()
    scaled = scale_lr_for_global_batch(
        cfg.training.learning_rate, cfg.training.batch_size_train * 4
    )
    loop_mod.Trainer(
        cfg, workdir=str(tmp_path), val_every=None, learning_rate=scaled
    )
    assert captured["lr"] == scaled
