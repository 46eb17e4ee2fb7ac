"""Wall-clock timer registry + TPU profiler helpers.

Equivalent of the reference utils/timers.py:12-95 (CudaTimer/Timer with an
atexit stats dump): ``DeviceTimer`` blocks on device results (the TPU analog
of cuda.synchronize bracketing), ``Timer`` measures host spans, both register
into a global table printed at exit. ``trace`` wraps jax.profiler for
TensorBoard-compatible traces.
"""

from __future__ import annotations

import atexit
import contextlib
import time
from collections import defaultdict
from typing import Dict, List, Optional

_CUMULATIVE: Dict[str, List[float]] = defaultdict(list)
_ENABLED = True


def set_enabled(flag: bool) -> None:
    global _ENABLED
    _ENABLED = flag


class Timer:
    """Host wall-clock span timer: ``with Timer('name'): ...``."""

    def __init__(self, timer_name: str = ""):
        self.name = timer_name
        self._t0 = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if _ENABLED:
            _CUMULATIVE[self.name].append(time.perf_counter() - self._t0)


class DeviceTimer(Timer):
    """Blocks until the given pytree of device values is ready on exit."""

    def __init__(self, timer_name: str = "", block_on=None):
        super().__init__(timer_name)
        self._block_on = block_on

    def __exit__(self, *exc):
        if self._block_on is not None:
            import jax

            jax.block_until_ready(self._block_on)
        super().__exit__(*exc)


class TimerDummy:
    """No-op stand-in (the reference default on the hot path, detector.py:13)."""

    def __init__(self, *a, **k):
        ...

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        ...


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view in TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timer_stats() -> Dict[str, Dict[str, float]]:
    out = {}
    for name, spans in _CUMULATIVE.items():
        if not spans:
            continue
        out[name] = {
            "count": len(spans),
            "total_s": sum(spans),
            "mean_ms": 1000.0 * sum(spans) / len(spans),
            "max_ms": 1000.0 * max(spans),
        }
    return out


@atexit.register
def _print_timing_info() -> None:
    stats = timer_stats()
    if not stats:
        return
    print("== Timing statistics ==")
    for name, s in sorted(stats.items()):
        print(
            f"  {name:32s} n={s['count']:<6d} mean={s['mean_ms']:.2f}ms "
            f"total={s['total_s']:.2f}s"
        )
