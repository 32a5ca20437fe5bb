"""O4: cooperative pause/resume gate.

The reference's shared ``DeliverPauser`` (lightning/common/pause.go:
40-115) gates the chunk deliver loop (restore.go:1692) and is driven
by the web endpoints ``PUT /pause`` / ``PUT /resume``
(lightning.go:483-516); server mode force-pauses it when a task
errors (lightning.go:163).

Spark analog: the gate sits at the natural quiescence points — before
each table restore and before each engine-batch job. A Spark job in
flight is not preemptible, so pausing takes effect at the next
boundary (the reference's pauser likewise only parks the encode loop
between deliver batches, not mid-write)."""

from __future__ import annotations

import threading


class Pauser:
    def __init__(self) -> None:
        self._running = threading.Event()
        self._running.set()

    def pause(self) -> None:
        self._running.clear()

    def resume(self) -> None:
        self._running.set()

    @property
    def is_paused(self) -> bool:
        return not self._running.is_set()

    def wait(self, timeout: float | None = None) -> bool:
        """Block while paused (Pauser.Wait, pause.go:108-115).
        Returns False if still paused after ``timeout``."""
        return self._running.wait(timeout)
