#!/usr/bin/env python
"""Exported-artifact throughput: does the StableHLO round-trip cost
anything at serving time?

Measures the SAME fused yolov3@416 batch-32 graph two ways with the
scan-amortized fetch-forced protocol from bench.py:
  live      — the traced-fresh pipeline (what `Detector` compiles)
  exported  — the pipeline after export_detector → load_exported
              (serialize to StableHLO, deserialize, re-jit)

Expectation: identical device time — jax.export serializes the traced
module before XLA backend compilation, so both paths hand XLA the same
HLO. This benchmark is the evidence (recorded in export_bench.json),
not the assumption.

Run on TPU: python benchmarks/export_bench.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import tempfile
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))  # repo root, for direct execution

BATCH = 32
SIZE = 416
SCAN = 40
ITERS = 5


def _time_scan(fn_scalar, args, *, iters=ITERS):
    """Depth-2 pipelined, fetch-forced wall timing of a jitted scalar fn."""
    float(fn_scalar(*args))  # compile + warm
    float(fn_scalar(*args))
    t0 = time.perf_counter()
    prev = None
    acc = 0.0
    for _ in range(iters):
        out = fn_scalar(*args)
        if prev is not None:
            acc += float(prev)
        prev = out
    acc += float(prev)
    dt = time.perf_counter() - t0
    assert np.isfinite(acc)
    return BATCH * SCAN * iters / dt


def main() -> None:
    import jax
    import jax.numpy as jnp

    from mydetection_tpu import Detector
    from mydetection_tpu.export import _export_fn, export_detector, load_exported

    det = Detector(model_name="yolov3", input_size=SIZE)
    leaves, treedef = jax.tree_util.tree_flatten(det.params)
    live_fn = _export_fn(det, treedef)

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "yolov3.mydet")
        export_detector(det, path, batch_size=BATCH)
        served = load_exported(path)
    exp_call = served._calls[BATCH]

    imgs = jnp.asarray(np.random.RandomState(0).randint(
        0, 255, (2, BATCH, SIZE, SIZE, 3), np.uint8))
    conf = jnp.float32(0.3)

    def scanned(call):
        @functools.partial(jax.jit, static_argnames=())
        def run(leaves, two, conf):
            def body(acc, i):
                x = jax.lax.dynamic_index_in_dim(two, i % 2, 0,
                                                 keepdims=False)
                out = call(leaves, x, conf)
                return acc + jnp.sum(out["scores"]) + jnp.sum(out["boxes"]), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(SCAN))
            return acc
        return run

    dev_leaves = jax.device_put(leaves)
    live_ips = _time_scan(scanned(live_fn), (dev_leaves, imgs, conf))
    exp_ips = _time_scan(scanned(exp_call), (jax.device_put(served.params),
                                             imgs, conf))

    row = {
        "backend": jax.default_backend(),
        "batch": BATCH, "input_size": SIZE, "scan": SCAN,
        "live_images_per_sec": round(live_ips, 2),
        "exported_images_per_sec": round(exp_ips, 2),
        "exported_over_live": round(exp_ips / live_ips, 4),
    }
    print(json.dumps(row), flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "export_bench.json")
    with open(out, "w") as fh:
        json.dump(row, fh, indent=1)


if __name__ == "__main__":
    main()
