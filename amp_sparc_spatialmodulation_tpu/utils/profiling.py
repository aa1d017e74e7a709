"""Tracing / profiling utilities.

The reference has no profiling at all (SURVEY §5 — stdout prints only).
Here: lightweight wall-clock phase timers with derived throughput counters
(trials/s, AMP-iterations/s — the BASELINE.json north-star metrics), and an
optional ``jax.profiler`` trace context for XLA-level inspection.
"""
from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, Optional


@dataclass
class PhaseStats:
    calls: int = 0
    seconds: float = 0.0
    items: float = 0.0

    @property
    def items_per_s(self) -> float:
        return self.items / self.seconds if self.seconds else 0.0


@dataclass
class Profiler:
    """Accumulates per-phase wall time and item counts.

    Usage::

        prof = Profiler()
        with prof.phase("decode", items=batch_size):
            out = step(...)
        print(prof.report())
    """

    phases: Dict[str, PhaseStats] = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str, items: float = 0.0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            st = self.phases.setdefault(name, PhaseStats())
            st.calls += 1
            st.seconds += dt
            st.items += items

    def add_items(self, name: str, items: float) -> None:
        self.phases.setdefault(name, PhaseStats()).items += items

    def report(self) -> Dict[str, Dict[str, float]]:
        return {k: {"calls": v.calls, "seconds": round(v.seconds, 4),
                    "items": v.items,
                    "items_per_s": round(v.items_per_s, 2)}
                for k, v in self.phases.items()}

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.report(), f, indent=2)


@contextlib.contextmanager
def xla_trace(log_dir: Optional[str]):
    """``jax.profiler`` trace context; no-op when ``log_dir`` is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
