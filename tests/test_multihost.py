"""Two-process ``jax.distributed`` CPU harness (VERDICT r2 next-round #8).

Launches two REAL processes through multihost_worker.py so the
``process_count > 1`` branches of ``Trainer._put_batch`` /
``Trainer._zero_states`` and the evaluator buffer allgather execute against
actual cross-process collectives — the round-2 data-dropping regression
class, test-covered.

Heavy for the 1-core CI host (two interpreters compiling the tiny train
step), so the whole harness is one test with a generous timeout.
"""

import os
import socket
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_put_batch_zero_states_and_eval_gather():
    addr = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    workers = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(_REPO, "tests", "multihost_worker.py"),
                addr,
                "2",
                str(pid),
            ],
            cwd=_REPO,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for w in workers:
            out, _ = w.communicate(timeout=1100)
            outs.append(out)
    finally:
        for w in workers:
            if w.poll() is None:
                w.kill()

    if any(w.returncode == 42 for w in workers):
        pytest.skip(f"jax.distributed unavailable on CPU: {outs}")
    for w, out in zip(workers, outs):
        assert w.returncode == 0, f"worker rc={w.returncode}\n{out[-4000:]}"
    assert "MULTIHOST_OK rank=0" in outs[0]
    assert "MULTIHOST_OK rank=1" in outs[1]
