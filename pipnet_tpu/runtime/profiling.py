"""Profiling & throughput telemetry.

The reference has no tracing at all (SURVEY §5.1: ad-hoc time.time deltas,
``main.py:59-64``).  Here profiling is first-class:

* ``trace(logdir)`` context manager wraps ``jax.profiler`` for device traces
  viewable in TensorBoard / Perfetto;
* ``StepTimer`` — steps/sec and images/sec/chip counters with warmup
  exclusion (the BASELINE.json headline metric);
* ``annotate`` — named trace regions.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: ``with trace('/tmp/trace'): run_steps()``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for traces: ``with annotate('train_step'): ...``."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Throughput counters: images/sec/chip with warmup steps excluded."""

    def __init__(self, warmup_steps: int = 2, num_chips: Optional[int] = None):
        self.warmup_steps = warmup_steps
        self.num_chips = num_chips or jax.device_count()
        self.reset()

    def reset(self):
        self._steps = 0
        self._images = 0
        self._t0 = None

    def step(self, batch_images: int):
        self._steps += 1
        if self._steps == self.warmup_steps:
            self._t0 = time.perf_counter()
            self._images = 0
        elif self._steps > self.warmup_steps:
            self._images += batch_images

    def stats(self) -> Dict[str, float]:
        if self._t0 is None or self._steps <= self.warmup_steps:
            return {"steps": self._steps, "images_per_sec": 0.0,
                    "images_per_sec_per_chip": 0.0}
        dt = time.perf_counter() - self._t0
        ips = self._images / max(dt, 1e-9)
        return {"steps": self._steps, "images_per_sec": ips,
                "images_per_sec_per_chip": ips / self.num_chips,
                "steps_per_sec": (self._steps - self.warmup_steps) / max(dt, 1e-9)}


def enable_compilation_cache(path: str = "~/.cache/pipnet_tpu_xla") -> str:
    """Persistent XLA compilation cache: repeat invocations of bench/train
    skip the multi-minute TPU compiles."""
    import os
    path = os.path.expanduser(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
