"""Preemption-safe training: catch SIGTERM/SIGINT, finish the in-flight
step, checkpoint, exit cleanly.

The reference has no preemption story at all: a kill mid-epoch loses up to
10,000 pairs of work (its checkpoints are per-epoch only, reference
main.py:158-192, and its batch-level try/except swallows errors rather than
saving, model/trainer.py:162-164).  On preemptible TPU pools (the normal
way to run large jobs) SIGTERM-with-grace-period is the eviction protocol,
so the trainer must turn the signal into "save ``last.ckpt`` now and return"
— not into a stack trace.

Design: a signal handler only flips a flag; both ``fit`` loops poll it once
per completed step and break at a checkpointable boundary.  Nothing
device-side is interrupted (an XLA step is uninterruptible anyway), so the
saved state is always a consistent post-step snapshot.  A second signal
restores the previous handler's behaviour (a double Ctrl-C still kills).
"""

from __future__ import annotations

import signal
import threading


class GracefulShutdown:
    """Context manager that converts SIGTERM/SIGINT into a ``requested``
    flag.

    Use::

        with GracefulShutdown() as stop:
            for epoch in ...:
                train_epoch(..., stop=stop)   # polls stop.requested per step
                if stop.requested:
                    save_checkpoint(...)
                    break

    Signal handlers can only be installed from the main thread; elsewhere
    (e.g. a serving worker running a background fine-tune) this degrades to
    an inert flag that the owner may still set via :meth:`request`.
    """

    SIGNALS = (signal.SIGTERM, signal.SIGINT)

    def __init__(self, enable: bool = True):
        self._flag = threading.Event()
        self._enable = enable
        self._previous: dict[int, object] = {}
        self._installed = False

    @property
    def requested(self) -> bool:
        return self._flag.is_set()

    def request(self) -> None:
        """Programmatic preemption (also what the signal handler calls)."""
        self._flag.set()

    def _handler(self, signum, frame):
        if self._flag.is_set():
            # Second signal: the user really means it — restore the prior
            # disposition and re-raise so default semantics apply.
            self._restore()
            signal.raise_signal(signum)
            return
        self._flag.set()

    def __enter__(self) -> "GracefulShutdown":
        if self._enable and threading.current_thread() is threading.main_thread():
            for sig in self.SIGNALS:
                self._previous[sig] = signal.getsignal(sig)
                signal.signal(sig, self._handler)
            self._installed = True
        return self

    def _restore(self) -> None:
        if self._installed:
            for sig, prev in self._previous.items():
                signal.signal(sig, prev)
            self._installed = False

    def __exit__(self, *exc) -> None:
        self._restore()
