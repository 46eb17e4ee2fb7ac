"""glibc allocator tuning for the host data path.

Large numpy buffers (a gen1-base batch is ~245 MB; each loader step churns
~1 GB of intermediates) are malloc'd above the mmap threshold, so glibc
munmaps them on free and every batch re-faults its pages from the kernel.
On this environment's VM, first-touch faults run at ~25-55 MB/s — they, not
the copies, dominated loader time (measured: an 8-lane np.stack was 0.05 s
into recycled pages vs 7-11 s into fresh ones, a 140x cliff).

``retain_freed_memory`` raises M_MMAP_THRESHOLD and M_TRIM_THRESHOLD to 1 GB
so freed buffers stay in the malloc arena and are recycled — pages fault in
once per process instead of once per batch. Peak RSS grows by roughly the
high-water mark of live + recently-freed buffers (a few GB for the shipped
recipes; the hosts have 100+ GB).

**OPT-IN ONLY** (``SAST_TPU_MALLOC_RETAIN=1``): with the tuning active
process-wide, long multi-device XLA:CPU sessions eventually SIGABRT inside
a device-to-host fetch (reproduced: full test suite with the 8-virtual-
device mesh aborts in test_multichip after ~40 tests; same subset passes
with the tuning off; RSS peaked at 4.7 GB with 114 GB free, so not OOM).
Root cause refined in round 3: XLA:CPU CHECK-kills the process when a
collective rendezvous stalls past its 40 s termination timeout, and N
virtual device threads on 1 host core stall easily — the same abort was
reproduced WITHOUT this tuning in the 8-device dryrun. The test/dryrun
harnesses now stretch the rendezvous watchdogs
(``--xla_cpu_collective_timeout_seconds``, see tests/conftest.py), which
removes the abort mechanism; the tuning nevertheless stays opt-in, since
production TPU hosts fault pages orders of magnitude faster than this VM
and don't need it. The loader benchmark enables it explicitly.

No reference analog: torch's DataLoader sidesteps this by keeping worker
processes' tensors alive in shared memory. This is the single-process
equivalent.
"""

from __future__ import annotations

import sys

_done = False

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3


def retain_freed_memory(limit_bytes: int = 1 << 30, force: bool = False) -> bool:
    """Keep freed buffers <= limit_bytes in the malloc arena (glibc only).

    Opt-in: active only with ``SAST_TPU_MALLOC_RETAIN=1`` or ``force=True``
    (see the module docstring for the XLA:CPU abort this avoids by default).
    Idempotent; returns True when the tuning is active. Safe no-op on
    non-glibc platforms.
    """
    global _done
    if _done:
        return True
    import os

    env = os.environ.get("SAST_TPU_MALLOC_RETAIN", "").strip().lower()
    if not force and env in ("", "0", "false", "no", "off"):
        return False
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok = bool(libc.mallopt(_M_MMAP_THRESHOLD, limit_bytes)) and bool(
            libc.mallopt(_M_TRIM_THRESHOLD, limit_bytes)
        )
    except OSError:  # pragma: no cover - non-glibc
        ok = False
    if not ok:  # pragma: no cover
        print("mallopt tuning unavailable; loader may page-fault per batch",
              file=sys.stderr)
    _done = ok
    return ok
