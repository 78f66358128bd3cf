"""Graceful-preemption guard for training loops.

TPU pods get evicted (maintenance events, spot reclaim) with a SIGTERM and
a short grace window. The reference's failure story is "restart from the
last checkpoint flag" (SURVEY.md §5; pinterest/train_shop_the_look.py
--restore_checkpoint), which loses everything since the last cadenced
save. This guard turns the SIGTERM into a COORDINATED clean stop instead:

  - the signal sets a host-local flag (handler does nothing else — safe in
    a signal context);
  - the train loop polls :meth:`PreemptionGuard.should_stop` once per
    device dispatch (chunk of ``steps_per_call`` steps); in multi-process
    runs the flag is agreed via a tiny all-gather so EVERY host stops at
    the SAME step — a requirement for the sharded Orbax save that follows
    (each process writes its shard of one consistent step);
  - the loop checkpoints and returns with ``FitResult.preempted=True``;
    workloads skip final export and exit 0. The relaunched job resumes
    from ``state.step`` (train/loop.py fit docstring).

Use via ``fit(..., preemption=True)`` or an explicitly managed guard::

    with PreemptionGuard() as guard:
        result = fit(..., preemption=guard)
"""

from __future__ import annotations

import logging
import signal
import threading
from typing import Optional, Sequence

import jax
import numpy as np

log = logging.getLogger(__name__)


class PreemptionGuard:
    """Context manager that latches termination signals into a flag.

    Handlers are installed on ``__enter__`` and restored on ``__exit__``.
    Installation requires the main thread (CPython restriction); elsewhere
    the guard degrades to a manually-settable flag with a warning, so
    library code can pass it unconditionally.
    """

    def __init__(self, signals: Sequence[int] = (signal.SIGTERM,)):
        self._signals = tuple(signals)
        self._old = {}
        self._installed = False
        self._flag = threading.Event()

    # -- signal plumbing ---------------------------------------------------
    def _handler(self, signum, frame):  # noqa: ARG002 (signal signature)
        self._flag.set()

    def __enter__(self) -> "PreemptionGuard":
        try:
            for s in self._signals:
                self._old[s] = signal.signal(s, self._handler)
            self._installed = True
        except ValueError:
            # signal.signal outside the main thread
            log.warning(
                "PreemptionGuard: not on the main thread; signal handlers "
                "NOT installed — only request_stop() will trigger a stop")
        return self

    def __exit__(self, *exc) -> None:
        if self._installed:
            for s, h in self._old.items():
                signal.signal(s, h)
            self._installed = False
        return None

    # -- API the loop uses ---------------------------------------------------
    def request_stop(self) -> None:
        """Programmatic preemption (tests, external watchdogs)."""
        self._flag.set()

    @property
    def requested(self) -> bool:
        """This host's local flag (no cross-process agreement)."""
        return self._flag.is_set()

    def should_stop(self) -> bool:
        """True when ANY process has been signalled.

        Multi-process: one scalar all-gather per call, so call it at a
        fixed point in the loop (every process must reach the same call
        sites in the same order, like any collective). Per device
        dispatch this is noise next to a ``steps_per_call`` train chunk.
        """
        local = self._flag.is_set()
        if jax.process_count() == 1:
            return local
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray(local, np.int32))
        return bool(np.asarray(flags).any())


def log_if_preempted(result, logger) -> bool:
    """Workload-tail contract after ``fit``: when the run was preempted,
    warn (checkpoint exists; export is skipped so the grace window isn't
    spent serializing) and return True so the caller returns early."""
    if not result.preempted:
        return False
    import jax

    logger.warning(
        "preempted at step %d: checkpoint saved, export skipped; "
        "relaunch with resume=True",
        int(jax.device_get(result.state.step)))
    return True


def resolve(preemption) -> Optional[PreemptionGuard]:
    """fit()'s argument coercion: False/None → None, True → fresh guard,
    a guard → itself."""
    if preemption is None or preemption is False:
        return None
    if preemption is True:
        return PreemptionGuard()
    return preemption
