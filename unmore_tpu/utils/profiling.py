"""Tracing / profiling utilities (SURVEY.md §5: the reference has only
tqdm bars and a d2 IterationTimer; the TPU build wires jax.profiler
traces plus structured per-stage timings into the metrics log)."""

from __future__ import annotations

import contextlib
import json
import os
import time


class StageTimer:
    """Accumulates wall-clock per named stage; dumps to JSON lines.

    Used by the CLIs to record per-phase timings (existence / center /
    boundary / scoring / io) alongside losses.
    """

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict:
        return {
            name: {"total_s": round(self.totals[name], 4),
                   "count": self.counts[name],
                   "mean_s": round(self.totals[name] / max(self.counts[name], 1), 4)}
            for name in self.totals
        }

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)


@contextlib.contextmanager
def profiler_trace(log_dir: str | None):
    """jax.profiler trace scope; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
