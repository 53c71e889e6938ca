"""Tracing / profiling hooks.

The reference has no profiling beyond tqdm postfix text (SURVEY.md §5).
We provide per-step wall timing and an optional ``jax.profiler`` trace
(view in TensorBoard / xprof) gated on ``output.profile_dir``.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


class StepTimer:
    """Running images/sec with warmup exclusion (first N steps compile)."""

    def __init__(self, warmup_steps: int = 2):
        self.warmup_steps = warmup_steps
        self.reset()

    def reset(self):
        self._steps = 0
        self._images = 0
        self._t0 = None

    def tick(self, batch_size: int):
        self._steps += 1
        if self._steps == self.warmup_steps + 1:
            self._t0 = time.perf_counter()
            self._images = 0
        if self._t0 is not None:
            self._images += batch_size

    @property
    def images_per_sec(self) -> Optional[float]:
        if self._t0 is None or self._images == 0:
            return None
        dt = time.perf_counter() - self._t0
        return self._images / dt if dt > 0 else None


@contextlib.contextmanager
def maybe_profile(profile_dir: Optional[str]):
    """jax.profiler trace context when a directory is configured."""
    if not profile_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
