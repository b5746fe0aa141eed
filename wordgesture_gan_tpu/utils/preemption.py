"""Graceful preemption: SIGTERM/SIGINT → finish the epoch, checkpoint, exit.

TPU pools are routinely preempted (spot/defragmentation/maintenance), and
the reference's only guard is its every-10-epochs checkpoint cadence
(reference train_gan.py:189-196) — a SIGTERM mid-training loses up to 9
epochs. The training loops here wrap their epoch loop in a
``PreemptionGuard``: the first signal requests a clean stop (the current
epoch completes, a checkpoint is written, the process exits 0 so resume
picks up exactly where it left off); a second signal falls through to an
immediate ``KeyboardInterrupt`` for an impatient Ctrl-C.
"""

from __future__ import annotations

import signal


class PreemptionGuard:
    """Context manager: latch SIGTERM/SIGINT into a ``requested`` flag.

    Handler installation is skipped silently off the main thread (Python
    restricts ``signal.signal`` to the main thread; library calls from
    worker threads simply run unguarded)."""

    _SIGNALS = (signal.SIGTERM, signal.SIGINT)

    def __init__(self):
        self.requested = False
        self._prev = {}

    def _handle(self, signum, frame):
        if self.requested:          # second signal: stop NOW
            raise KeyboardInterrupt
        self.requested = True

    def __enter__(self):
        for sig in self._SIGNALS:
            try:
                self._prev[sig] = signal.signal(sig, self._handle)
            except ValueError:      # not the main thread
                break
        return self

    def __exit__(self, *exc):
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)
        return False

    def agreed(self) -> bool:
        """Cluster-wide stop decision.

        A preemption signal may reach only some hosts of a multi-process
        run; if each host acted on its local flag alone, the signalled
        hosts would checkpoint-and-exit while the rest entered the next
        epoch's collectives and hung until the job deadline. This
        all-gathers the local flag across processes (max-reduce), so every
        host exits the loop on the same epoch. Must be called at the same
        point in the epoch loop on every process (it is a collective when
        ``jax.process_count() > 1``); single-process runs short-circuit.
        """
        import jax

        if jax.process_count() <= 1:
            return self.requested
        import numpy as np
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray(int(self.requested), np.int32))
        return bool(np.max(flags) > 0)
