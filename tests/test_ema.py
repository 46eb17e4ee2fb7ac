"""EMA parameter tracking (distinct buffers, lagging average)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sast_tpu.config import get_test_config
from sast_tpu.data.synthetic import synthetic_train_batch
from sast_tpu.models.backbone import zero_states
from sast_tpu.training.steps import create_train_state, make_train_step


def test_ema_with_donation():
    cfg = get_test_config()
    cfg = dataclasses.replace(
        cfg, training=dataclasses.replace(cfg.training, ema_decay=0.9)
    )
    state, model = create_train_state(cfg, jax.random.PRNGKey(0))
    # donation must work even though ema starts equal to params (regression:
    # identity-aliased ema buffers made donation fail)
    step = jax.jit(make_train_step(model, cfg), donate_argnums=(0, 2))
    b = {
        k: jnp.asarray(v)
        for k, v in synthetic_train_batch(cfg, np.random.RandomState(0)).items()
    }
    lstm = zero_states(cfg.model.backbone, b["ev_repr"].shape[1])
    p0 = np.asarray(jax.tree.leaves(state.params)[0]).copy()
    for _ in range(3):
        state, lstm, m = step(state, b, lstm)
    e = np.asarray(jax.tree.leaves(state.ema_params)[0])
    p = np.asarray(jax.tree.leaves(state.params)[0])
    assert np.isfinite(float(m["loss"]))
    assert not np.allclose(e, p)   # ema lags the live params
    assert not np.allclose(e, p0)  # but it does move


def test_ema_checkpoint_round_trip(tmp_path):
    from sast_tpu.checkpoint.orbax_io import CheckpointManager

    cfg = get_test_config()
    cfg = dataclasses.replace(
        cfg, training=dataclasses.replace(cfg.training, ema_decay=0.9)
    )
    state, model = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, cfg))
    b = {
        k: jnp.asarray(v)
        for k, v in synthetic_train_batch(cfg, np.random.RandomState(0)).items()
    }
    lstm = zero_states(cfg.model.backbone, b["ev_repr"].shape[1])
    state, lstm, _ = step(state, b, lstm)

    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(1, state, metrics={})
    fresh, _ = create_train_state(cfg, jax.random.PRNGKey(1))
    restored = mgr.restore(fresh)
    for a, b_ in zip(
        jax.tree.leaves(state.ema_params), jax.tree.leaves(restored.ema_params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
