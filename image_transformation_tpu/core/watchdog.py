"""Phase-deadline watchdog for silently-hanging device phases.

Round-2 postmortem: the batch-512 bench probe died with 0-byte output —
``timeout 420`` SIGKILLed the process while the FIRST DISPATCH (compile /
alloc / execute over the tunnel) hung, and the existing backend-init
probe in bench.py only guarded ``jax.devices()``. A SIGKILL leaves no
evidence; the driver (and the operator) cannot tell a compile stall from
an allocation wall from a dead tunnel.

:class:`PhaseWatchdog` closes that silent-loss mode for ANY phased
region: the main thread declares named phases with per-phase deadlines;
a daemon thread watches the clock and, if a phase overruns, emits one
honest machine-readable payload naming the stalled phase (plus caller
context such as expected HBM bytes) and ``os._exit``\\ s before any outer
``timeout`` can SIGKILL the evidence away.

The reference has no equivalent (its only perf machinery is
``utils/timing.py``); this is TPU-operations tooling for the tunnel/HBM
failure modes that machinery never had to face.
"""

from __future__ import annotations

import os
import threading
import time
from typing import Callable, Dict, Optional


class PhaseWatchdog:
    """Deadline monitor for a sequence of named phases.

    Usage::

        wd = PhaseWatchdog(emit, context={"batch": 512}, exit_code=3)
        wd.phase("compile", 300)
        compiled = lowered.compile()
        wd.phase("first_execute", 240)
        out = compiled(*args)
        wd.done()

    ``emit(payload)`` runs on the watchdog thread when the CURRENT phase
    exceeds its deadline; the payload carries ``stalled_phase``,
    ``elapsed_s``, ``deadline_s``, completed ``phase_history`` (with
    durations), and the caller's ``context`` verbatim. After ``emit``
    returns, the process hard-exits with ``exit_code`` (``os._exit`` —
    stdio must be flushed by ``emit`` itself; a hung device call can
    never be interrupted from Python, so a clean exit is not available).

    Thread-safe for the single-driver pattern above; ``done()`` disarms
    the watchdog (idempotent). If ``emit`` itself raises, the hard exit
    still happens — a broken reporter must not resurrect the silent hang.
    """

    def __init__(
        self,
        emit: Callable[[dict], None],
        context: Optional[dict] = None,
        exit_code: int = 3,
        _exit: Callable[[int], None] = os._exit,
    ) -> None:
        self._emit = emit
        self._context = dict(context or {})
        self._exit_code = exit_code
        self._exit = _exit
        self._cond = threading.Condition()
        self._phase: Optional[str] = None
        self._deadline: float = float("inf")
        self._started: float = 0.0
        self._done = False
        self._history: list = []
        self._thread = threading.Thread(
            target=self._watch, name="phase-watchdog", daemon=True
        )
        self._thread.start()

    def phase(self, name: str, deadline_s: float) -> None:
        """Enter ``name``; the previous phase (if any) completed on time."""
        now = time.monotonic()
        with self._cond:
            if self._done:
                raise RuntimeError("watchdog already done()")
            self._close_current(now)
            self._phase = name
            self._started = now
            self._deadline = now + float(deadline_s)
            self._cond.notify_all()

    def done(self) -> None:
        """Disarm: all phases completed. Idempotent."""
        with self._cond:
            if not self._done:
                self._close_current(time.monotonic())
                self._done = True
                self._cond.notify_all()

    def history(self) -> list:
        """Completed ``{"phase", "seconds"}`` rows (after done())."""
        with self._cond:
            return list(self._history)

    def update_context(self, **kv) -> None:
        """Merge extra context into the stall payload (e.g. late-computed
        expected-HBM numbers)."""
        with self._cond:
            self._context.update(kv)

    def _close_current(self, now: float) -> None:
        if self._phase is not None:
            self._history.append(
                {"phase": self._phase, "seconds": round(now - self._started, 3)}
            )
            self._phase = None
            self._deadline = float("inf")

    def _watch(self) -> None:
        with self._cond:
            while not self._done:
                now = time.monotonic()
                if self._phase is not None and now >= self._deadline:
                    payload = self._stall_payload(now)
                    break
                wait = (
                    None
                    if self._deadline == float("inf")
                    else max(0.0, self._deadline - now)
                )
                self._cond.wait(timeout=wait)
            else:
                return  # done() — disarm quietly
        # outside the lock: emit may do arbitrary I/O
        try:
            self._emit(payload)
        except BaseException:  # noqa: BLE001
            pass  # a broken reporter must not resurrect the silent hang
        finally:
            self._exit(self._exit_code)

    def _stall_payload(self, now: float) -> Dict:
        return {
            "stalled_phase": self._phase,
            "elapsed_s": round(now - self._started, 1),
            "deadline_s": round(self._deadline - self._started, 1),
            "phase_history": list(self._history),
            **self._context,
        }
