"""Per-stage tracing / profiling (SURVEY.md §5 aux subsystems).

The reference's only instrumentation is coarse per-view printf timing
(src/PatchMatch.cpp:618-637). This module provides the explicit version:

* ``StageTimer`` — named wall-clock spans with nesting, aggregated by stage
  (count / total / min / max), dumpable as a table or JSON. The pipeline
  wraps every phase (load, solve, prior, checkpoint, sky, fusion) so a run
  ends with a breakdown instead of one opaque number.
* ``device_trace`` — optional XLA device profiling: when ``MPMVS_PROFILE_DIR``
  is set (or a directory is passed), spans also run under
  ``jax.profiler.trace`` producing a TensorBoard/Perfetto trace of the
  compiled programs. Off by default: profiling has runtime overhead.

Timing convention: spans measure host wall-clock including device work only
if the caller synchronizes (the pipeline calls ``block_until_ready`` on
results before closing a span), matching how the reference's CPU timers
bracket ``cudaDeviceSynchronize``-implied stream completion.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, List, Optional


def device_sync(*arrays):
    """Force completion of the computations producing ``arrays``.

    ``block_until_ready`` alone does NOT block on tunneled device platforms
    (axon): measured, a matmul loop "completed" at 2x the chip's peak
    FLOP/s. A one-element device->host fetch creates a data dependency the
    runtime must honor, making wall-clock spans honest everywhere."""
    import numpy as np
    for a in arrays:
        np.asarray(a[(slice(0, 1),) * getattr(a, "ndim", 0)])


class StageStats:
    __slots__ = ("count", "total", "min", "max")

    def __init__(self):
        self.count = 0
        self.total = 0.0
        self.min = float("inf")
        self.max = 0.0

    def add(self, dt: float):
        self.count += 1
        self.total += dt
        self.min = min(self.min, dt)
        self.max = max(self.max, dt)

    def as_dict(self):
        return {"count": self.count, "total_s": round(self.total, 4),
                "min_s": round(self.min, 4), "max_s": round(self.max, 4)}


class StageTimer:
    """Aggregating span timer. Thread-compatible (single-writer)."""

    def __init__(self, profile_dir: Optional[str] = None):
        self.stats: Dict[str, StageStats] = {}
        self._stack: List[str] = []
        self.profile_dir = profile_dir or os.environ.get("MPMVS_PROFILE_DIR")
        self._t_start = time.perf_counter()

    @contextlib.contextmanager
    def span(self, name: str):
        """Time a stage. Nested spans record under 'outer/inner'."""
        qual = "/".join(self._stack + [name])
        self._stack.append(name)
        t0 = time.perf_counter()
        try:
            with self._device_ctx(qual):
                yield
        finally:
            self._stack.pop()
            self.stats.setdefault(qual, StageStats()).add(
                time.perf_counter() - t0)

    def _device_ctx(self, name: str):
        if not self.profile_dir:
            return contextlib.nullcontext()
        import jax
        # one trace per top-level span; nested spans appear as named scopes
        if "/" in name:
            return jax.profiler.TraceAnnotation(name.rsplit("/", 1)[1])
        return jax.profiler.trace(
            os.path.join(self.profile_dir, name.replace("/", "_")))

    # -------- reporting --------

    def summary(self) -> str:
        wall = time.perf_counter() - self._t_start
        lines = [f"{'stage':<40} {'n':>5} {'total':>9} {'mean':>8} {'max':>8}"]
        for name in sorted(self.stats, key=lambda n: -self.stats[n].total):
            s = self.stats[name]
            lines.append(f"{name:<40} {s.count:>5} {s.total:>8.2f}s "
                         f"{s.total / s.count:>7.2f}s {s.max:>7.2f}s")
        lines.append(f"{'(wall)':<40} {'':>5} {wall:>8.2f}s")
        return "\n".join(lines)

    def as_dict(self):
        return {name: s.as_dict() for name, s in self.stats.items()}

    def dump_json(self, path: str):
        parent = os.path.dirname(path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        with open(path, "w") as f:
            json.dump({"wall_s": round(time.perf_counter() - self._t_start, 4),
                       "stages": self.as_dict()}, f, indent=1)


class NullTimer(StageTimer):
    """No-op drop-in when tracing is disabled."""

    def __init__(self):
        super().__init__(profile_dir=None)

    @contextlib.contextmanager
    def span(self, name: str):
        yield
