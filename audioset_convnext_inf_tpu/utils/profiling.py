"""Profiling and throughput instrumentation.

The reference's only instrumentation is wall-clock prints and a forward-hook
FLOP counter (pytorch_utils.py:179-312). TPU-native equivalents:

- :func:`trace` - context manager around ``jax.profiler`` (TensorBoard
  trace of XLA ops, HBM, ICI)
- :class:`StepTimer` - EMA step time + clips/sec counters
- :func:`count_flops` - analytic FLOP count for a jitted function via XLA's
  cost analysis (replaces the hook-based per-layer counter)
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """``with trace("/tmp/t"):`` captures a TensorBoard profile."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.step_time: Optional[float] = None
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self.step_time = dt if self.step_time is None else (
                self.ema * self.step_time + (1 - self.ema) * dt
            )
        self._last = now
        return self.step_time

    def clips_per_sec(self, batch_size: int) -> Optional[float]:
        return batch_size / self.step_time if self.step_time else None


def count_flops(fn: Callable, *example_args, **kwargs) -> Dict[str, Any]:
    """Analytic cost of a jitted function via XLA cost analysis.

    Returns {'flops', 'bytes_accessed', ...} when the backend reports them.
    """
    import jax

    lowered = jax.jit(fn).lower(*example_args, **kwargs)
    compiled = lowered.compile()
    try:
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return dict(analysis or {})
    except Exception:
        return {}


def count_parameters(params) -> int:
    import jax

    return sum(x.size for x in jax.tree_util.tree_leaves(params) if hasattr(x, "size"))
