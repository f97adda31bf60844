"""Tracing / profiling helpers (SURVEY.md §5.1).

The reference has only ad-hoc FPS prints [recalled]. Ours:
  * `trace(logdir)` — jax.profiler XPlane trace around a code block,
    viewable in TensorBoard/XProf;
  * `timer` / `Timer` — block_until_ready-bracketed wall timers (the
    only honest way to time async dispatch; NB on the axon remote
    transport even block_until_ready under-reports — fetch a scalar,
    see bench.py);
  * `annotate` — jax.named_scope passthrough so pipeline stages are
    labeled in profiles;
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an XPlane profile of the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


annotate = jax.named_scope


@contextlib.contextmanager
def timer(name: str, results: dict | None = None, *, sync=None):
    """Wall timer; `sync` (a pytree or callable) is block_until_ready'd
    before the clock stops."""
    t0 = time.perf_counter()
    yield
    if sync is not None:
        jax.block_until_ready(sync() if callable(sync) else sync)
    dt = time.perf_counter() - t0
    if results is not None:
        results.setdefault(name, []).append(dt)
    else:
        print(f"[timer] {name}: {dt * 1000:.2f} ms")


class Timer:
    """Accumulating multi-stage timer.

    with t.stage("decode"): ...
    print(t.summary())
    """

    def __init__(self):
        self.times: dict[str, list[float]] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str, *, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync() if callable(sync) else sync)
        self.times[name].append(time.perf_counter() - t0)

    def summary(self) -> dict[str, dict[str, float]]:
        out = {}
        for name, ts in self.times.items():
            total = sum(ts)
            out[name] = {
                "calls": len(ts),
                "total_s": round(total, 4),
                "mean_ms": round(1000 * total / len(ts), 3),
                "max_ms": round(1000 * max(ts), 3),
            }
        return out
