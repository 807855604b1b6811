"""Tracing / profiling helpers (SURVEY.md §5.1: the reference has only tqdm
progress bars; the TPU rebuild gets jax.profiler traces + phase timers)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class _Phase:
    """Handle yielded by PhaseTimer.phase: register the value produced
    INSIDE the phase so the timer can device-sync on it at exit (under
    JAX async dispatch, timing without syncing the phase's own output
    measures only the ~ms dispatch cost)."""

    def __init__(self):
        self._sync_value = None

    def sync(self, value):
        self._sync_value = value
        return value


class PhaseTimer:
    """Accumulates wall-clock per named phase; forces device sync on exit.

    Usage::

        with timer.phase("denoise") as ph:
            latents = ph.sync(jitted_fn(...))  # synced at phase exit
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        ph = _Phase()
        t0 = time.perf_counter()
        try:
            yield ph
        finally:
            if ph._sync_value is not None:
                jax.block_until_ready(ph._sync_value)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = [
            f"{name:<30} {self.totals[name]:8.3f}s x{self.counts[name]}"
            for name in sorted(self.totals, key=self.totals.get, reverse=True)
        ]
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """jax.profiler trace context; view with TensorBoard / Perfetto."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
