"""Profiling & debug utilities.

The reference ships only a dead wall-clock Timer (utils/train_util.py:33-68,
never invoked — SURVEY.md §5).  Here profiling is first-class:

  * ``Timer`` — wall-clock section timer with mean/min reporting;
  * ``trace`` — context manager around ``jax.profiler`` writing a
    TensorBoard-viewable device trace;
  * ``debug_mode`` — enables NaN debugging (jax_debug_nans) and optional
    Pallas interpreter mode, the rebuild's answer to the reference's absent
    sanitizer hooks.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class Timer:
    """Accumulating section timer: ``with timer.section("fk"): ...``."""

    def __init__(self):
        self.acc = defaultdict(list)

    @contextlib.contextmanager
    def section(self, name: str, sync: bool = False):
        t0 = time.perf_counter()
        yield
        if sync:
            # block on any outstanding device work for honest timings
            jax.effects_barrier()
        self.acc[name].append(time.perf_counter() - t0)

    def report(self) -> dict[str, dict[str, float]]:
        out = {}
        for name, xs in self.acc.items():
            out[name] = {
                "mean_ms": 1000.0 * sum(xs) / len(xs),
                "min_ms": 1000.0 * min(xs),
                "count": len(xs),
            }
        return out

    def reset(self):
        self.acc.clear()


@contextlib.contextmanager
def trace(log_dir: str):
    """Device trace around a code block; view with TensorBoard's profile
    plugin: ``with profiling.trace('log/trace'): step()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_mode(nan_checks: bool = True, interpret_pallas: bool = False):
    """Debugging context: NaN tracing and (optionally) interpreter-mode
    Pallas kernels."""
    prev_nan = jax.config.read("jax_debug_nans")
    if nan_checks:
        jax.config.update("jax_debug_nans", True)
    try:
        if interpret_pallas:
            from jax.experimental.pallas import tpu as pltpu

            with pltpu.force_tpu_interpret_mode():
                yield
        else:
            yield
    finally:
        jax.config.update("jax_debug_nans", prev_nan)
