"""Tracing / profiling utilities.

The reference has no profiler integration — only ad-hoc per-frame wall
clocks and tqdm bars (SURVEY §5.1).  Here:

- `StageTimer`: named per-stage wall-time accumulation with a
  human-readable report (the structured version of the reference's
  trailing-5-frame ETA bookkeeping, flow_processor.py:1133-1150).
- `device_trace`: context manager around jax.profiler for TensorBoard
  traces of device execution.
- `flow_statistics`: cheap on-device per-frame flow stats (min/max/mean
  magnitude), the metadata the reference embeds in .npz saves
  (cache_manager.py:269-276) computed as one reduction.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp


class StageTimer:
    """Accumulates wall time per named stage."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = ["stage                     total(s)   calls   mean(ms)"]
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            total = self.totals[name]
            count = self.counts[name]
            lines.append(
                f"{name:<24} {total:9.3f} {count:7d} {1000 * total / count:10.2f}"
            )
        return "\n".join(lines)

    def mean(self, name: str) -> float:
        if not self.counts.get(name):
            return 0.0
        return self.totals[name] / self.counts[name]


@contextlib.contextmanager
def device_trace(logdir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace when a logdir is given; no-op otherwise."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@jax.jit
def flow_statistics(flow: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """min/max flow component + mean magnitude (cache_manager.py:269-276)
    as one fused device reduction."""
    mag = jnp.sqrt(flow[..., 0] ** 2 + flow[..., 1] ** 2)
    return {
        "min_flow": jnp.min(flow),
        "max_flow": jnp.max(flow),
        "mean_magnitude": jnp.mean(mag),
    }
