"""Preemption handling for TPU-VM training.

The reference has no preemption story (SURVEY.md §5 — resume is a manual
--ckpt flag). Preemptible TPU VMs receive SIGTERM before shutdown; this
module converts that into a graceful final checkpoint: trainers poll
``should_stop()`` each step and save+exit cleanly. Combined with orbax's
latest-step auto-restore, a preempted run resumes exactly where it stopped.
"""

from __future__ import annotations

import signal
import threading

_stop = threading.Event()
_installed = False


def install() -> None:
    """Install SIGTERM/SIGINT handlers (idempotent, main thread only)."""
    global _installed
    if _installed:
        return

    def _handler(signum, frame):
        _stop.set()

    try:
        signal.signal(signal.SIGTERM, _handler)
        signal.signal(signal.SIGINT, _handler)
        _installed = True
    except ValueError:
        pass  # not on the main thread


def should_stop() -> bool:
    return _stop.is_set()


def reset() -> None:
    _stop.clear()
