"""FLOP accounting + MFU from XLA's own cost model.

The perf tables in README/benchmarks previously used hand-derived
FLOP counts; this asks the compiled executable instead
(`compiled.cost_analysis()["flops"]`), so the number tracks the graph
that actually runs (S2D stem rewrites, folded normalization, deferred
sigmoid all change the count). Pallas custom calls are opaque to the
cost model and count as 0 flops — for our graphs that is the NMS
suppression loop, a deliberate rounding-down (reported MFU is a floor).

MFU = achieved flops/sec ÷ the chip's peak for the matmul dtype.
Peak table covers the hardware this repo targets/tests on; unknown
device kinds return None rather than a guessed denominator.
"""

from __future__ import annotations

from typing import Any, Callable

import jax

# device_kind (lowercased substring) -> peak FLOP/s by matmul dtype.
# v5e: 394 TOPS int8, 197 TFLOP/s bf16 [public TPU v5e spec].
_PEAKS: tuple[tuple[str, dict[str, float]], ...] = (
    ("v5 lite", {"bfloat16": 197e12, "int8": 394e12, "float32": 197e12 / 4}),
    ("v5e", {"bfloat16": 197e12, "int8": 394e12, "float32": 197e12 / 4}),
    ("v5p", {"bfloat16": 459e12, "int8": 918e12, "float32": 459e12 / 4}),
    ("v4", {"bfloat16": 275e12, "int8": 275e12, "float32": 275e12 / 4}),
    ("v6e", {"bfloat16": 918e12, "int8": 1836e12, "float32": 918e12 / 4}),
)


def compiled_flops(fn: Callable, *args: Any, static_argnames=(),
                   **kwargs: Any) -> float | None:
    """Total FLOPs of one call of `fn(*args, **kwargs)` per the XLA
    cost model, or None when the backend doesn't report one."""
    jitted = jax.jit(fn, static_argnames=static_argnames)
    try:
        compiled = jitted.lower(*args, **kwargs).compile()
        ca = compiled.cost_analysis()
    except Exception:
        return None
    if isinstance(ca, (list, tuple)):  # older jax: one dict per device
        ca = ca[0] if ca else None
    if not isinstance(ca, dict):
        return None
    flops = ca.get("flops")
    return float(flops) if flops and flops > 0 else None


def device_peak_flops(dtype: str = "bfloat16") -> float | None:
    """Peak FLOP/s of jax device 0 for `dtype` matmuls, or None if the
    device kind isn't in the table (never guess a denominator)."""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return None
    for key, peaks in _PEAKS:
        if key in kind:
            return peaks.get(dtype)
    return None


def mfu(flops_per_item: float | None, items_per_sec: float,
        dtype: str = "bfloat16") -> float | None:
    """Model-FLOPs-utilization in [0, 1], or None when either the
    flops or the peak is unknown."""
    peak = device_peak_flops(dtype)
    if not flops_per_item or not peak:
        return None
    return flops_per_item * items_per_sec / peak
