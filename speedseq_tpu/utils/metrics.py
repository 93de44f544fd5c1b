"""Structured per-stage counters and timers.

The reference's observability is stdout echo of each command
(bin/speedseq:400-435) — no counters.  SURVEY §5 calls structured
metrics out as a required addition for the TPU build: every module
increments named counters here; `snapshot()` returns a plain dict
(tests and the CLI `-v` summary consume it), `report()` renders one
line per stage.

Thread-safe (host fan-out workers increment concurrently); counters are
process-local — multi-host runs report per process, like the
reference's per-pipe stdout.
"""

from __future__ import annotations

import threading
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict


class Metrics:
    def __init__(self):
        self._lock = threading.Lock()
        self._counts: Dict[str, float] = defaultdict(float)
        self._times: Dict[str, float] = defaultdict(float)

    def add(self, name: str, value: float = 1.0) -> None:
        with self._lock:
            self._counts[name] += value

    @contextmanager
    def timer(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self._times[name] += dt

    def snapshot(self) -> Dict[str, float]:
        with self._lock:
            out = dict(self._counts)
            out.update({f"time.{k}": round(v, 4)
                        for k, v in self._times.items()})
            return out

    def reset(self) -> None:
        with self._lock:
            self._counts.clear()
            self._times.clear()

    def report(self, prefix: str = "") -> str:
        snap = self.snapshot()
        lines = []
        for k in sorted(snap):
            v = snap[k]
            lines.append(f"{prefix}{k}: {int(v) if float(v).is_integer() else round(v, 3)}")
        return "\n".join(lines)


# process-global registry (the align/var/sv engines increment this)
metrics = Metrics()
