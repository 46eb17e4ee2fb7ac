"""Data-parallel correctness on the 8-device virtual CPU mesh.

The strongest DP check: one train step on a sharded batch must produce the
same loss and the same parameter update as the identical batch on one device
(GSPMD inserts the gradient psum; BN stats are global means either way).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sast_tpu.config import get_test_config
from sast_tpu.data.synthetic import synthetic_train_batch
from sast_tpu.models.backbone import zero_states
from sast_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from sast_tpu.training.steps import create_train_state, make_train_step


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_step_matches_single_device():
    cfg = get_test_config()
    state, model = create_train_state(cfg, jax.random.PRNGKey(0))
    train_step = jax.jit(make_train_step(model, cfg))

    B = 8  # one lane per device
    batch_np = synthetic_train_batch(
        cfg, np.random.RandomState(0), batch_size=B, seq_len=2
    )
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    lstm = zero_states(cfg.model.backbone, B)

    # single-device reference
    state1, _, m1 = train_step(state, batch, lstm)

    # sharded over the 8-device mesh
    mesh = make_mesh(jax.devices()[:8])
    rep = replicated(mesh)
    sh0, sh1 = batch_sharding(mesh, 0), batch_sharding(mesh, 1)
    batch_sh = {
        k: jax.device_put(v, sh1 if k == "ev_repr" else sh0)
        for k, v in batch.items()
    }
    lstm_sh = jax.device_put(zero_states(cfg.model.backbone, B), sh0)
    state_sh = jax.device_put(state, rep)
    state2, _, m2 = train_step(state_sh, batch_sh, lstm_sh)

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-4
    # parameter updates identical (replicated result == single-device result)
    p1 = jax.tree.leaves(state1.params)
    p2 = jax.tree.leaves(state2.params)
    for a, b in zip(p1, p2):
        # reduction-order differences between the psum and the single-device
        # sum leave a few-ulp fp32 residue
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-5
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_trainer_fit_with_mesh(tmp_path):
    """The PRODUCTION Trainer (loop.py) running data-parallel: fit over the
    8-device mesh must match single-device fit step-for-step."""
    from sast_tpu.training.loop import Trainer

    cfg = get_test_config()
    B = 8

    def batches():
        rng = np.random.RandomState(0)
        i = 0
        while True:
            b = synthetic_train_batch(cfg, rng, batch_size=B, seq_len=2)
            b["is_first"] = np.full((B,), i == 0)
            yield b
            i += 1

    mesh = make_mesh(jax.devices()[:8])
    tr_mesh = Trainer(
        cfg, workdir=str(tmp_path / "m"), log_every=1, val_every=None, mesh=mesh
    )
    m_mesh = tr_mesh.fit(batches(), max_steps=2)

    tr_single = Trainer(
        cfg, workdir=str(tmp_path / "s"), log_every=1, val_every=None
    )
    m_single = tr_single.fit(batches(), max_steps=2)

    assert abs(m_mesh["train/loss"] - m_single["train/loss"]) < 1e-3
    for a, b in zip(
        jax.tree.leaves(tr_mesh.state.params), jax.tree.leaves(tr_single.state.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-5)


def test_maybe_initialize_distributed_pod_detection(monkeypatch):
    """Argless jax.distributed.initialize() fires only for multi-worker TPU
    pod env (code-review r2: the docstring promised self-discovery but the
    function never called it); explicit JAX_* coordinator env takes priority;
    single-worker env is a no-op."""
    import os

    import jax

    from sast_tpu.parallel import mesh as mesh_mod

    calls = []

    def fake_init(**kw):
        calls.append(kw)

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)

    # no env -> no init
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(var, raising=False)
    assert mesh_mod.maybe_initialize_distributed() is False
    assert calls == []

    # single-worker TPU VM -> no init
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0")
    assert mesh_mod.maybe_initialize_distributed() is False
    assert calls == []

    # multi-worker pod -> argless init
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0,host1,host2,host3")
    assert mesh_mod.maybe_initialize_distributed() is True
    assert calls == [{}]

    # explicit coordinator env wins and passes through
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    assert mesh_mod.maybe_initialize_distributed() is True
    assert calls[-1] == {
        "coordinator_address": "10.0.0.1:1234",
        "num_processes": 4,
        "process_id": 2,
    }


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 devices")
def test_mesh_sharded_serving_matches_single_device():
    """Lane-sharded pod serving == the same lanes on one device: nothing
    crosses lanes in the streaming step, so a 2-device mesh must reproduce
    the single-device batched detector."""
    import dataclasses

    from sast_tpu.models.detector import YoloXDetector
    from sast_tpu.serving import StreamingDetector

    cfg = get_test_config()
    ds = dataclasses.replace(cfg.dataset, name="gen1")
    cfg = dataclasses.replace(cfg, dataset=ds)
    bb = dataclasses.replace(
        cfg.model.backbone, in_res_hw=(256, 320),
        attention=dataclasses.replace(cfg.model.backbone.attention,
                                      partition_size=(4, 5)),
    )
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, backbone=bb))

    model = YoloXDetector(cfg.model)
    x0 = jnp.zeros((1, 256, 320, 20), jnp.float32)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), x0, zero_states(cfg.model.backbone, 1)
    )

    mesh = make_mesh(jax.devices()[:2])
    sharded = StreamingDetector(
        cfg, variables, max_events=3000, num_streams=2, mesh=mesh
    )
    local = StreamingDetector(cfg, variables, max_events=3000, num_streams=2)

    rng = np.random.RandomState(7)

    def frame(i):
        n = rng.randint(200, 900)
        return dict(
            x=rng.randint(0, 304, n), y=rng.randint(0, 240, n),
            p=rng.randint(0, 2, n),
            t=np.sort(rng.randint(0, 50_000, n)) + i * 50_000,
        )

    for i in range(2):
        frames = [frame(i), frame(i)]
        reset = np.array([False, i == 1])
        a = sharded.process_batch(frames, reset=reset)
        b = local.process_batch(frames, reset=reset)
        for k in ("boxes", "scores", "classes", "valid"):
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), rtol=0, atol=1e-5,
                err_msg=f"frame {i} {k}",
            )
