"""utils/profiling: timers, stage accumulation, XPlane trace files."""

import os

import jax.numpy as jnp

from mydetection_tpu.utils.profiling import Timer, annotate, timer, trace


def test_timer_records_and_syncs():
    results = {}
    x = jnp.arange(8.0)
    with timer("mul", results, sync=lambda: y):
        y = x * 2
    assert "mul" in results and len(results["mul"]) == 1
    assert results["mul"][0] >= 0.0


def test_stage_timer_summary():
    t = Timer()
    for _ in range(3):
        with t.stage("a"):
            pass
    with t.stage("b", sync=jnp.arange(4)):
        pass
    s = t.summary()
    assert s["a"]["calls"] == 3
    assert s["b"]["calls"] == 1
    assert s["a"]["total_s"] >= 0 and s["b"]["mean_ms"] >= 0


def test_annotate_traces_through_jit():
    import jax

    @jax.jit
    def f(x):
        with annotate("stage_one"):
            return x + 1

    assert float(f(jnp.float32(1.0))) == 2.0


def test_xplane_trace_writes_files(tmp_path):
    logdir = str(tmp_path / "prof")
    with trace(logdir):
        jnp.arange(16.0).sum().block_until_ready()
    # jax writes plugins/profile/<run>/*.xplane.pb under the logdir
    found = []
    for root, _, files in os.walk(logdir):
        found += [f for f in files if f.endswith(".xplane.pb")]
    assert found, f"no xplane files under {logdir}"
