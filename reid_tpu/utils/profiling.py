"""Profiling: per-stage frame timing + jax.profiler traces.

Role of the reference's yolov5 `Profile()` buckets
(ref track_yolov5.py:176-252, summary :342-344) and its CUDA-synchronized
`time` measurements (README.md:84). `StageTimer` gives the same N-bucket
per-frame ms breakdown; `trace` wraps a block in a jax.profiler trace for
TensorBoard (the TPU-native equivalent of nvprof).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax


class StageTimer:
    """Accumulate wall time per named stage; report per-frame ms."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.frames = 0

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0

    def tick(self):
        self.frames += 1

    def per_frame_ms(self) -> Dict[str, float]:
        n = max(self.frames, 1)
        return {k: 1000.0 * v / n for k, v in sorted(self.totals.items())}

    def summary(self) -> str:
        parts = [f"{k}: {v:.1f}ms" for k, v in self.per_frame_ms().items()]
        return f"per-frame ({self.frames} frames): " + ", ".join(parts)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """jax.profiler trace context -> TensorBoard at `log_dir`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
