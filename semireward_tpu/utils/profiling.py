"""Profiling / tracing utilities.

The reference's observability is a pair of CUDA-event timers
(core/hooks/timer.py:13-27 -> train/prefetch_time, train/run_time). TPU
equivalents: per-step host timing around block_until_ready (the trainer
already reports steps/s on the log cadence) plus on-demand XLA trace
capture through jax.profiler — readable in TensorBoard/Perfetto.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an XLA trace for the enclosed steps:

        with profiling.trace("/tmp/trace"):
            for _ in range(10):
                state, m = step(state, batch)
            jax.block_until_ready(m)
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """run_time / prefetch_time in the reference's log_dict terms."""

    def __init__(self):
        self._t_fetch = 0.0
        self._t_run = 0.0
        self._mark = time.perf_counter()

    def batch_ready(self):
        now = time.perf_counter()
        self._t_fetch = now - self._mark
        self._mark = now

    def step_done(self, blocking_leaf=None):
        if blocking_leaf is not None:
            jax.block_until_ready(blocking_leaf)
        now = time.perf_counter()
        self._t_run = now - self._mark
        self._mark = now
        return {"train/prefetch_time": self._t_fetch,
                "train/run_time": self._t_run}
