"""
Profiling and step timing as first-class observability.

The reference has no tracing at all (SURVEY.md §5 — tqdm bars and dead
``@timing`` decorators). Here: ``jax.profiler`` trace capture around
training windows (viewable in TensorBoard/Perfetto), a lightweight
``StepTimer`` that reports steps/sec and examples/sec without forcing a
device sync every step, and an ``annotate`` context for named trace spans.
"""

from __future__ import annotations

import contextlib
import json
import os
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """Capture a jax.profiler trace into ``log_dir`` for the duration of
    the context (host + device timelines)."""
    if not enabled:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Throughput meter: call ``tick(n_examples)`` once per step; reads are
    amortized (no per-step device sync).

    Stats: steps/sec, examples/sec, mean/last step wall time.
    """

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.reset()

    def reset(self):
        self._count = 0
        self._examples = 0
        self._t0 = None
        self._last = None

    def tick(self, n_examples: int = 0):
        now = time.perf_counter()
        self._count += 1
        if self._count == self.warmup:
            self._t0 = now
            self._examples = 0
        elif self._count > self.warmup:
            self._examples += n_examples
        self._last = now

    @property
    def steps_per_sec(self) -> float:
        if self._t0 is None or self._last is None or self._last <= self._t0:
            return 0.0
        return (self._count - self.warmup) / (self._last - self._t0)

    @property
    def examples_per_sec(self) -> float:
        if self._t0 is None or self._last is None or self._last <= self._t0:
            return 0.0
        return self._examples / (self._last - self._t0)

    def stats(self) -> dict:
        return {"steps_per_sec": round(self.steps_per_sec, 3),
                "examples_per_sec": round(self.examples_per_sec, 1)}


def save_timing(exp_path: str, name: str, stats: dict):
    """Append step-timing stats to ``timing_logs.json`` in the experiment
    dir (sits beside the reference's training_logs.json contract)."""
    path = os.path.join(exp_path, "timing_logs.json")
    blob = {}
    if os.path.exists(path):
        with open(path) as f:
            blob = json.load(f)
    blob.setdefault(name, []).append(stats)
    with open(path, "w") as f:
        json.dump(blob, f)
