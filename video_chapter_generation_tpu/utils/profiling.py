"""Profiling helpers: jax.profiler traces + annotated step scopes.

Replaces the reference's ad-hoc time.time() prints
(test_video_segment_point.py:169-212) with real device traces viewable in
TensorBoard/Perfetto plus lightweight wall-clock scopes.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (xplane) into log_dir."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region visible in device traces."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class Stopwatch:
    """Nested wall-clock scopes with a flat report."""

    def __init__(self):
        self.totals: Dict[str, float] = {}

    @contextlib.contextmanager
    def scope(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    def report(self) -> str:
        total = sum(self.totals.values()) or 1.0
        lines = [
            f"{name}: {t:.3f}s ({100 * t / total:.1f}%)"
            for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1])
        ]
        return "\n".join(lines)
