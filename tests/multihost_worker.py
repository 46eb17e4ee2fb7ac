"""Worker process for the two-process multi-host harness (test_multihost.py).

Runs as ONE process of a real ``jax.distributed`` CPU job and exercises the
paths that only execute when ``jax.process_count() > 1``:

- ``Trainer._put_batch``: per-process local batches assembled into the
  global sharded array (the round-2 silent data-dropping regression class);
- ``Trainer._zero_states``: per-process LOCAL zeros + explicit global shape
  (the round-2 ADVICE bug: passing global-shaped zeros without
  ``global_shape`` inflates the state batch by ``process_count``);
- one real jitted train step over the multi-process mesh;
- ``allgather_host_objects`` + ``PropheseeEvaluator.gather_across_processes``
  with different-length buffers per rank.

Exit codes: 0 = all assertions passed, 42 = distributed init unavailable
(parent skips), anything else = failure.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    addr, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "--xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=2"
        )

    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    try:
        jax.distributed.initialize(
            coordinator_address=addr, num_processes=nproc, process_id=pid
        )
        # The Gloo collective context initializes lazily at the FIRST
        # collective with a hard 30 s rendezvous deadline; on a loaded 1-core
        # host, startup/compile skew between the two interpreters easily
        # exceeds that. The coordination-service barrier (configurable
        # timeout) realigns the processes right before that first collective
        # so the 30 s window is met comfortably.
        from jax._src import distributed as _dist

        client = _dist.global_state.client
        client.wait_at_barrier("mh_warmup", timeout_in_ms=300_000)
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("multihost_worker_startup")
    except Exception as e:  # environment cannot run multi-process CPU jobs
        print(f"distributed init unavailable: {e}", file=sys.stderr)
        sys.exit(42)

    assert jax.process_count() == nproc, jax.process_count()

    from sast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import numpy as np

    from sast_tpu.config import get_test_config
    from sast_tpu.data.batch import split_device_batch
    from sast_tpu.data.synthetic import synthetic_train_batch
    from sast_tpu.parallel.mesh import make_mesh
    from sast_tpu.training.loop import Trainer

    mesh = make_mesh()  # all GLOBAL devices (2 local x nproc)
    n_global = len(jax.devices())
    assert n_global == 2 * nproc, n_global

    cfg = get_test_config()
    B_local = n_global // nproc  # this process's lanes (DataModule rank shard)
    B_global = n_global

    with tempfile.TemporaryDirectory() as workdir:
        trainer = Trainer(
            cfg, workdir=workdir, log_every=1, val_every=None, mesh=mesh,
            learning_rate=cfg.training.learning_rate,
        )

        rng = np.random.RandomState(100 + pid)  # rank-distinct data
        b = synthetic_train_batch(cfg, rng, batch_size=B_local, seq_len=2)
        b["is_first"] = np.full((B_local,), True)
        dev_b, _ = split_device_batch(b)

        gb = trainer._put_batch(dev_b)
        # Global batch must be world x local — not local (data dropped) and
        # not world^2 x local (shape inflation).
        assert gb["ev_repr"].shape[1] == B_global, gb["ev_repr"].shape
        assert gb["is_first"].shape[0] == B_global, gb["is_first"].shape

        lstm = trainer._zero_states(gb["ev_repr"].shape[1])
        for leaf in jax.tree.leaves(lstm):
            assert leaf.shape[0] == B_global, leaf.shape

        # Compile is pure host work; with the shared compile cache one
        # process may finish minutes before the other. Compile FIRST, then
        # realign at a barrier so the collective executions start in
        # lockstep (Gloo algorithm waits also have short IO deadlines).
        compiled = trainer.train_step.lower(trainer.state, gb, lstm).compile()
        client.wait_at_barrier("mh_compiled", timeout_in_ms=600_000)
        state, lstm2, metrics = compiled(trainer.state, gb, lstm)
        loss = float(metrics["loss"])
        assert np.isfinite(loss), loss
        for leaf in jax.tree.leaves(lstm2):
            assert leaf.shape[0] == B_global, leaf.shape

    # -- evaluator buffer allgather with rank-varying lengths ---------------
    from sast_tpu.eval.prophesee import BBOX_DTYPE, PropheseeEvaluator
    from sast_tpu.parallel.mesh import allgather_host_objects

    client.wait_at_barrier("mh_eval", timeout_in_ms=600_000)
    gathered = allgather_host_objects({"rank": pid, "len": pid + 1})
    assert [g["rank"] for g in gathered] == list(range(nproc)), gathered

    ev = PropheseeEvaluator("gen1")
    lab = np.zeros((pid + 1,), BBOX_DTYPE)  # different length per rank
    lab["t"] = 10**6
    lab["w"] = lab["h"] = 50.0
    ev.add_labels([lab])
    ev.add_predictions([lab.copy()])
    ev.gather_across_processes()
    assert len(ev._buffer["lab"]) == nproc
    total_rows = sum(len(a) for a in ev._buffer["lab"])
    assert total_rows == nproc * (nproc + 1) // 2, total_rows

    print(f"MULTIHOST_OK rank={pid} loss={loss:.4f}", flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        # Gloo rendezvous deadlines are a 1-core-host capacity artifact, not
        # a framework bug — report as 'unavailable' so the parent skips
        # instead of flaking the suite.
        if "Gloo context initialization failed" in str(e):
            print(f"gloo rendezvous timeout (host overloaded): {e}", file=sys.stderr)
            sys.exit(42)
        raise
