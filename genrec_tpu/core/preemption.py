"""Preemption-safe training: checkpoint on SIGTERM instead of dying.

The reference has no failure handling at all (SURVEY.md §5: "failure
detection / elastic recovery: absent" — recovery is manual
``resume_from_checkpoint``). Production TPU slices are routinely
preempted with a SIGTERM grace window; this guard converts that signal
into a cooperative stop so the trainer saves a full train state and
exits cleanly, and the same command resumes from it.

Usage (per trainer loop)::

    guard = PreemptionGuard()          # installs the handler
    for epoch ...:
        for batch ...:
            engine.run_step(batch)
            if guard.should_stop():
                engine.save(ckpt, config=...)
                return ...

The handler only sets a flag — no I/O in signal context. It chains any
previously-installed SIGTERM handler. ``install=False`` gives an inert
guard (e.g. when running under a test harness that owns signals).
"""

from __future__ import annotations

import logging
import signal
import threading

logger = logging.getLogger(__name__)


class PreemptionGuard:
    def __init__(self, install: bool = True,
                 signals=(signal.SIGTERM,)):
        self._stop = threading.Event()
        self._prev = {}
        if not install:
            return
        if threading.current_thread() is not threading.main_thread():
            logger.warning("PreemptionGuard: not on the main thread; "
                           "signal handlers not installed")
            return
        for sig in signals:
            self._prev[sig] = signal.signal(sig, self._on_signal)

    def _on_signal(self, signum, frame):
        self._stop.set()
        prev = self._prev.get(signum)
        if callable(prev) and prev not in (signal.SIG_IGN, signal.SIG_DFL):
            prev(signum, frame)

    def should_stop(self) -> bool:
        return self._stop.is_set()

    def trigger(self) -> None:
        """Programmatic stop (tests, external schedulers)."""
        self._stop.set()
