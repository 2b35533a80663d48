"""Timing and throughput instrumentation.

The TPU equivalent of the reference's CycleTimer + per-stage
startTimer/lapTimer printf instrumentation around every kernel launch
(src/cycleTimer.h:37-177, src/cudaRenderer.cu:2366-2376) — wall-clock
lap timers with ``block_until_ready`` fencing, per-stage accumulation,
and Mrays/s accounting.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class LapTimer:
    """Per-stage lap timer (startTimer/lapTimer equivalent).

    >>> timer = LapTimer(verbose=True)
    >>> timer.start()
    >>> ... run stage ...
    >>> timer.lap("trace")        # prints "[LapTimer] trace : 12.3 ms"
    """

    def __init__(self, verbose: bool = False, sync: bool = True):
        self.verbose = verbose
        #: fence device work before reading the clock (TPU dispatch is
        #: async; without this, laps measure enqueue time)
        self.sync = sync
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def lap(self, name: str, fence=None) -> float:
        if fence is not None and self.sync:
            jax.block_until_ready(fence)
        now = time.perf_counter()
        dt = now - (self._t0 if self._t0 is not None else now)
        self._t0 = now
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1
        if self.verbose:
            print(f"[LapTimer] {name} : {dt * 1e3:.3f} ms")
        return dt

    @contextlib.contextmanager
    def stage(self, name: str, fence_value=None):
        self.start()
        holder = {}
        try:
            yield holder
        finally:
            self.lap(name, holder.get("fence", fence_value))

    def report(self) -> str:
        lines = ["stage                     total_ms    calls   avg_ms"]
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            c = self.counts[name]
            lines.append(
                f"{name:24s} {total * 1e3:9.2f} {c:8d} {total / c * 1e3:8.2f}"
            )
        return "\n".join(lines)

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


class RayThroughput:
    """Mrays/s accounting across frames."""

    def __init__(self):
        self.rays = 0.0
        self.seconds = 0.0

    def add(self, rays: float, seconds: float) -> None:
        self.rays += rays
        self.seconds += seconds

    @property
    def mrays_per_s(self) -> float:
        return self.rays / self.seconds / 1e6 if self.seconds > 0 else 0.0
