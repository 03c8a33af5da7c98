"""Tracing / profiling / structured logging.

The reference's only instrumentation is a wall-clock print and tqdm bars
(SURVEY.md §5). Here: phase timers that emit structured lines (and keep the
reference's canonical "Model edited in N seconds" output), optional
``jax.profiler`` traces, and a CSV telemetry writer for the debias loop.
"""

from __future__ import annotations

import contextlib
import csv
import json
import os
import sys
import time


class PhaseTimer:
    """Accumulates named phase durations; emits one structured line each."""

    def __init__(self, stream=None, enabled: bool = True):
        self.stream = stream or sys.stderr
        self.enabled = enabled
        self.phases: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.phases[name] = self.phases.get(name, 0.0) + dt
            if self.enabled:
                print(json.dumps({"phase": name, "seconds": round(dt, 4)}),
                      file=self.stream)

    def total(self) -> float:
        return sum(self.phases.values())


@contextlib.contextmanager
def profiler_trace(trace_dir: str | None):
    """jax.profiler trace scope (no-op when trace_dir is None).

    View with TensorBoard or xprof against the written directory.
    """
    if not trace_dir:
        yield
        return
    import jax

    os.makedirs(trace_dir, exist_ok=True)
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class DebiasTelemetry:
    """Per-iteration CSV telemetry for the debias loop (the reference only
    showed a tqdm postfix; this persists the trajectory)."""

    def __init__(self, path: str, edit_concepts, debias_concepts):
        self.path = path
        self.edit_concepts = list(edit_concepts)
        self.debias_concepts = list(debias_concepts)
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["iteration", "concept"]
                       + [f"observed_{a}" for a in self.debias_concepts]
                       + [f"ratio_{a}" for a in self.debias_concepts])

    def record(self, iteration: int, observed, ratios) -> None:
        with open(self.path, "a", newline="") as f:
            w = csv.writer(f)
            for ci, concept in enumerate(self.edit_concepts):
                w.writerow([iteration, concept]
                           + [f"{v:.4f}" for v in observed[ci]]
                           + [f"{v:.4f}" for v in ratios[ci]])
