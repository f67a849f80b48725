"""Tracing, metrics and structured logging.

The reference's observability is ad-hoc wall-clock deltas that are mostly
discarded (SURVEY.md §5 "Tracing/profiling") plus ROS_INFO spam.  Here:

  * PhaseTimer — per-phase wall times with device sync at the boundaries,
    for coarse breakdowns (bench/ uses it).
  * trace() — context manager around jax.profiler for full XLA traces
    viewable in TensorBoard/Perfetto.
  * MetricsLogger — JSONL metrics stream (one dict per frame), the continuous
    observability channel replacing the reference's 12 ROS publishers.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Optional

import jax
import numpy as np


class PhaseTimer:
    """Accumulates {phase: seconds}; `with timer.phase("fuse"): ...` blocks
    on device completion at exit.

    NOTE: only the EXIT is synchronised — with async dispatch, device work
    still in flight from earlier phases is billed to the current one.  For
    honest per-phase attribution, sync before entering (e.g. block on the
    previous phase's output), or time whole programs instead
    (bench/kernels.py)."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict:
        return {k: {"total_s": round(v, 6),
                    "mean_ms": round(v / self.counts[k] * 1e3, 3),
                    "count": self.counts[k]}
                for k, v in self.totals.items()}


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace when log_dir is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class MetricsLogger:
    """Append-only JSONL metrics stream."""

    def __init__(self, path: Optional[str]):
        self._f = open(path, "a") if path else None

    def log(self, frame_idx: int, metrics: dict, **extra):
        if self._f is None:
            return
        rec = {"frame": int(frame_idx), "t": time.time(), **extra}
        for k, v in metrics.items():
            a = np.asarray(v)
            rec[k] = a.tolist() if a.ndim else a.item()
        self._f.write(json.dumps(rec) + "\n")

    def close(self):
        if self._f:
            self._f.close()
            self._f = None
