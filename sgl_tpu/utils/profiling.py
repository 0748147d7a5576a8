"""Tracing / profiling utilities (SURVEY.md §5).

The reference's observability is ``time.time()`` prints around each stage
(``tasks/node_classification.py:48-51``); here per-stage timing is a
structured object that also feeds the NAS objective, plus hooks into
``jax.profiler`` for real XLA traces.

Device-timing note (measured): the tunneled TPU backend has a fixed ~31 ms
dispatch+readback round-trip and an unreliable ``block_until_ready`` — use
``slope_time`` for kernel timings.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, Optional


@dataclass
class StageTimer:
    """Accumulates wall-clock per named stage; the SGAP analog of a trace."""

    totals: Dict[str, float] = field(default_factory=dict)
    counts: Dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        return " ".join(
            f"{k}={v:.4f}s(n={self.counts[k]})" for k, v in self.totals.items()
        )

    def total(self, *names: str) -> float:
        names = names or tuple(self.totals)
        return sum(self.totals.get(n, 0.0) for n in names)


def sync(out):
    """Force completion of a device computation via a scalar readback."""
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.ravel(leaf)[0])


def slope_time(build_chained: Callable[[int], Callable], k1: int = 6, k2: int = 16, iters: int = 3) -> float:
    """Per-iteration device time via the two-point slope method.

    ``build_chained(k)`` must return a zero-arg callable running the op
    chained ``k`` times inside one jit.  Cancels fixed dispatch latency.
    """
    import numpy as np

    def timed(f):
        sync(f())
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            sync(f())
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    f1, f2 = build_chained(k1), build_chained(k2)
    return (timed(f2) - timed(f1)) / (k2 - k1)


@contextlib.contextmanager
def xla_trace(logdir: Optional[str] = None):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
