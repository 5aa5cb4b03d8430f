"""Profiling / tracing hooks.

The reference has no profiling at all (SURVEY.md §5: prints every 20 batches,
commented-out pdb).  Here:

- :func:`trace` wraps a block in a ``jax.profiler`` trace, dumping a
  TensorBoard-loadable profile (XLA op timeline, HBM usage) to a directory;
- :class:`StepTimer` measures steady-state step latency with correct device
  synchronization (block_until_ready before/after), reporting p50/p90/mean —
  the honest way to time jitted steps over an async dispatch queue.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import numpy as np

__all__ = ["trace", "StepTimer"]


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None, enabled: bool = True):
    """``with trace('/tmp/profile'): run_steps()`` -> TB profile dump."""
    if not enabled or log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Collects per-step wall times with device sync.

    >>> timer = StepTimer()
    >>> for batch in batches:                       # doctest: +SKIP
    ...     with timer:
    ...         state, m = step(state, batch)
    ...         jax.block_until_ready(m["loss"])
    >>> timer.summary()                             # doctest: +SKIP
    """

    def __init__(self):
        self.times: list[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        return False

    def summary(self, skip_warmup: int = 1) -> dict:
        # an empty timer (run errored before the first step) returns zeros
        # instead of crashing the metrics path; note that when ONLY warmup
        # samples exist, they are reported as the only signal available —
        # n tells the consumer how many measurements backed the numbers
        ts = np.asarray(self.times[skip_warmup:] or self.times)
        if len(ts) == 0:
            return {"n": 0, "mean_s": 0.0, "p50_s": 0.0, "p90_s": 0.0,
                    "total_s": 0.0}
        return {
            "n": int(len(ts)),
            "mean_s": float(ts.mean()),
            "p50_s": float(np.percentile(ts, 50)),
            "p90_s": float(np.percentile(ts, 90)),
            "total_s": float(ts.sum()),
        }
