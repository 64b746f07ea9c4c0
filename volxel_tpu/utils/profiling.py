"""Tracing / profiling utilities (SURVEY §5 tracing row).

The reference's instrumentation is gl.finish-fenced frame timers
(viewer.ts:1213-1218), ingest wall-clock logs (lib.rs:144-179), and a
device fingerprint. TPU-native equivalents:

  * StageTimer — labelled wall-clock stages with device fencing, printed
    like the reference's staged console logs
  * trace() — context manager around jax.profiler for XLA-level traces
    (open the output in TensorBoard / xprof)
  * frame_stats — summarize fenced per-frame timings
"""

from __future__ import annotations

import contextlib
import logging
import time

import numpy as np

logger = logging.getLogger("volxel_tpu")


class StageTimer:
    """Labelled stage timings with optional device fencing."""

    def __init__(self, log: bool = True):
        self.stages: list[tuple[str, float]] = []
        self._log = log

    @contextlib.contextmanager
    def stage(self, name: str, fence=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if fence is not None:
                fence.block_until_ready()
            dt = time.perf_counter() - t0
            self.stages.append((name, dt))
            if self._log:
                logger.info("%s: %.3fs", name, dt)

    def report(self) -> dict:
        return {name: dt for name, dt in self.stages}


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/volxel_trace"):
    """jax.profiler trace around a code region (view with xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def frame_stats(times_s: list[float]) -> dict:
    """Summary stats of fenced frame times, in milliseconds."""
    ts = np.asarray(times_s) * 1000.0
    return {
        "frames": len(ts),
        "mean_ms": float(ts.mean()),
        "median_ms": float(np.median(ts)),
        "min_ms": float(ts.min()),
        "max_ms": float(ts.max()),
        "p95_ms": float(np.percentile(ts, 95)),
    }
