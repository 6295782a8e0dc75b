"""Tracing and throughput measurement.

The reference's only observability is time.time() epoch timing and tf.print
(GAN_train.py:412,291-292,343-347 -- SURVEY.md section 5). Here: jax.profiler trace
contexts (perfetto dumps), a step timer with images/sec/chip accounting (the
north-star metric), and a simple scoped timer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (viewable in XProf/Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a profiler trace."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Wall-clock throughput meter (host-side, blocking on device results)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0: Optional[float] = None
        self.steps = 0
        self.images = 0
        self.elapsed = 0.0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, batch_images: int = 0):
        if self._t0 is None:
            return
        self.elapsed += time.perf_counter() - self._t0
        self.steps += 1
        self.images += batch_images
        self._t0 = None

    @property
    def images_per_sec(self) -> float:
        return self.images / self.elapsed if self.elapsed > 0 else float("nan")

    @property
    def sec_per_step(self) -> float:
        return self.elapsed / self.steps if self.steps else float("nan")


def benchmark(fn: Callable, *args, warmup: int = 2, iters: int = 10) -> Dict[str, float]:
    """Time a jitted function: block_until_ready-accurate wall clock."""
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {"sec_per_call": dt, "calls_per_sec": 1.0 / dt if dt > 0 else float("inf")}
