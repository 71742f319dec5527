# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Profiling and debug hooks (the reference has none — SURVEY.md §5).

* :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace of device execution.
* :class:`Throughput` — steps/s meter using the forcing-fetch protocol
  (``block_until_ready`` alone does not reliably fence execution through
  this environment's TPU tunnel; fetching a scalar does).
* :func:`enable_nan_debugging` — turn on ``jax_debug_nans``; SPMD training
  has no data races to sanitize (unlike the reference's by-design Hogwild
  races, ``a3c.py:78-86``), NaNs are the failure mode that matters.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging() -> None:
    jax.config.update("jax_debug_nans", True)


def force(x) -> float:
    """Fetch one scalar from a pytree, forcing all pending execution."""
    leaf = jax.tree.leaves(x)[0]
    return float(leaf.reshape(-1)[0])


class Throughput:
    """Env-steps/s meter.

    >>> meter = Throughput(steps_per_call=B * T)
    >>> for _ in range(n):
    ...     state, _ = rollout(state)
    ...     meter.tick(state)          # forces + accumulates
    >>> meter.rate()
    """

    def __init__(self, steps_per_call: int):
        self.steps_per_call = steps_per_call
        self._calls = 0
        self._t0: Optional[float] = None

    def tick(self, state) -> None:
        force(state)
        now = time.perf_counter()
        if self._t0 is None:
            self._t0 = now  # first tick starts the clock (skips compile)
        else:
            self._calls += 1

    def rate(self) -> float:
        if self._t0 is None or self._calls == 0:
            return 0.0
        return self._calls * self.steps_per_call / (time.perf_counter() - self._t0)
