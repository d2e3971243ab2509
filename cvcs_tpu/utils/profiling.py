"""Tracing / step timing — first-class observability (SURVEY §5: the
reference has none beyond tqdm; the TPU build promotes `jax.profiler`
traces and per-step wall timing to framework features)."""

from __future__ import annotations

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str | None):
    """``with trace("/tmp/tb"):`` captures a jax.profiler trace viewable in
    TensorBoard/Perfetto; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span for host-side phases (chunk load, eval, ckpt)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Per-step wall-time accumulator with percentile reporting."""

    def __init__(self):
        self.times: list[float] = []
        self._t0: float | None = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> None:
        if self._t0 is not None:
            self.times.append(time.perf_counter() - self._t0)
            self._t0 = None

    @contextlib.contextmanager
    def step(self):
        self.start()
        try:
            yield
        finally:
            self.stop()

    def summary(self) -> dict:
        if not self.times:
            return {"steps": 0}
        arr = np.asarray(self.times)
        return {
            "steps": int(arr.size),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
            "total_s": float(arr.sum()),
            "steps_per_s": float(arr.size / arr.sum()),
        }
