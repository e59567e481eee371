"""Tracing and stage timing.

The reference has no profiling on the VAD path (print-based progress only;
the vestigial flownet trainer carries TimerBlock context timers,
FlowNet2_src/utils/tools.py:41-70). This module provides:

  * StageTimer — hierarchical wall-clock stage timing with a report table
  * trace() — context manager around jax.profiler.trace for device-level
    traces viewable in TensorBoard/Perfetto
  * annotate() — jax.profiler.TraceAnnotation wrapper so pipeline stages
    show up named inside device traces
"""

from __future__ import annotations

import contextlib
import time
from collections import OrderedDict
from typing import Dict, Iterator, List, Optional, Tuple


class StageTimer:
    """Accumulates named wall-clock spans (TimerBlock, structured)."""

    def __init__(self) -> None:
        self.totals: "OrderedDict[str, float]" = OrderedDict()
        self.counts: Dict[str, int] = {}
        self._stack: List[str] = []

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        qual = "/".join(self._stack + [name])
        self._stack.append(name)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._stack.pop()
            self.totals[qual] = self.totals.get(qual, 0.0) + dt
            self.counts[qual] = self.counts.get(qual, 0) + 1

    def report(self) -> str:
        if not self.totals:
            return "(no stages recorded)"
        width = max(len(k) for k in self.totals)
        lines = [f"{'stage':<{width}}  {'total_s':>9}  {'calls':>5}  {'mean_ms':>9}"]
        for k, v in self.totals.items():
            c = self.counts[k]
            lines.append(f"{k:<{width}}  {v:9.3f}  {c:5d}  {v / c * 1e3:9.2f}")
        return "\n".join(lines)

    def as_dict(self) -> Dict[str, Tuple[float, int]]:
        return {k: (v, self.counts[k]) for k, v in self.totals.items()}


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Device-level profiler trace (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a device trace."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
