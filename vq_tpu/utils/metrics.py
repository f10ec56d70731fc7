"""Structured metrics + profiling — the observability subsystem.

The reference has no logging at all (SURVEY.md §5: ``println!`` in eval
binaries only; its serde ``BenchmarkResult`` is never written anywhere).
vq_tpu makes observability first-class:

* :class:`MetricsLogger` — JSONL event stream (file or stdout or callback).
* :func:`trace` — ``jax.profiler.TraceAnnotation`` context for profiler
  timelines around train/encode phases.
* ``vq_tpu.ops.kmeans_stepped.lloyd_stepped`` consumes a logger to emit
  per-Lloyd-iteration records: inertia, cluster occupancy, reseed count,
  centroid movement, step wall-time.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from typing import Any, Callable, Dict, IO, Optional

__all__ = ["MetricsLogger", "trace"]


class MetricsLogger:
    """Append-only JSONL event logger.

    ``sink`` may be a path (appended), a file object, ``"-"`` (stdout), or a
    callable receiving each event dict. Every event gets ``event`` and
    ``t_wall`` fields.
    """

    def __init__(self, sink: "str | IO[str] | Callable[[Dict], None]" = "-"):
        self._own = False
        self._fn: Optional[Callable[[Dict], None]] = None
        if callable(sink):
            self._fn = sink
            self._fh = None
        elif sink == "-":
            self._fh = sys.stdout
        elif isinstance(sink, str):
            self._fh = open(sink, "a")
            self._own = True
        else:
            self._fh = sink
        self._t0 = time.perf_counter()

    def log(self, event: str, **fields: Any) -> None:
        rec = {"event": event, "t_wall": round(time.perf_counter() - self._t0, 6)}
        rec.update(fields)
        if self._fn is not None:
            self._fn(rec)
        else:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()

    def close(self) -> None:
        if self._own and self._fh is not None:
            self._fh.close()
            self._fh = None

    def __enter__(self) -> "MetricsLogger":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


@contextlib.contextmanager
def trace(name: str):
    """Profiler trace annotation (shows up on the TPU profiler timeline)."""
    import jax.profiler

    with jax.profiler.TraceAnnotation(name):
        yield
