"""Inference block-scan vs unroll for the ResNet-50 trunk on device.

The shipped policy (darknet._use_scan) scans the identical residual
blocks of each stage at INFERENCE on TPU — chosen for cold-compile
time, with the unroll win only ever measured for the TRAIN backward
(87.3 → 70.9 ms/step). An XPlane capture of retinanet@608 batch-32
inference shows ~11 ms/step of `while` category time (stage0 while
4.66 ms, stage2 while 2.85 ms — benchmarks/xplane_top_ops.json), so
the scan may also be taxing the forward: each iteration re-gathers the
block's stacked weights with dynamic slices and carries the activation
through the loop boundary, where straight-line code lets XLA prefetch
weights across block edges.

Variants (full trunk: stem fold + stages 0-3, no FPN/heads so the
delta isn't diluted):
  scan     resnet.apply(..., scan_blocks=True)   (shipped TPU default)
  unroll   resnet.apply(..., scan_blocks=False)

Protocol: scan-amortized, fetch-forced (two alternating
device-resident batches), same as the other experiment harnesses.

MEASURED (v5e, @608 batch 32, trunk only): scan 23.96 ms vs unroll
24.40 ms — a WASH (scan marginally ahead). The XPlane `while`
durations include their body's convs; there is no forward loop
overhead to recover, unlike the train backward. The shipped policy
(scan inference, unroll training) stands for ResNet too.

Run: python benchmarks/resnet_scan_infer_experiments.py [--depth 50]
Appends one JSON line to benchmarks/resnet_scan_infer_experiments.json.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--scan-batches", type=int, default=20)
    ap.add_argument("--input-size", type=int, default=608)
    ap.add_argument("--depth", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mydetection_tpu.models import resnet

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    size = args.input_size

    params = resnet.init(jax.random.PRNGKey(0), depth=args.depth)

    def trunk(x_u8, scan_blocks):
        x, fold = resnet.prepare_input(x_u8, compute_dtype=dtype)
        feats, _ = resnet.apply(params, x, depth=args.depth,
                                compute_dtype=dtype, stem_fold_std=fold,
                                scan_blocks=scan_blocks)
        return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)

    variants = {"scan": functools.partial(trunk, scan_blocks=True),
                "unroll": functools.partial(trunk, scan_blocks=False)}

    rs = np.random.RandomState(0)
    imgs = jnp.asarray(rs.randint(
        0, 255, (2, args.batch, size, size, 3), np.uint8))
    g = args.scan_batches if on_tpu else 1

    def timed(fn):
        @functools.partial(jax.jit, static_argnames=("g",))
        def scan_fn(two, g):
            def body(acc, i):
                x = jax.lax.dynamic_index_in_dim(two, i % 2, 0,
                                                 keepdims=False)
                return acc + fn(x), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(g))
            return acc

        t_c0 = time.perf_counter()
        a = float(scan_fn(imgs, g))
        compile_s = time.perf_counter() - t_c0
        b = float(scan_fn(imgs, g))
        assert np.isfinite(a) and abs(a - b) < 1e-3 * max(1.0, abs(a))
        t0 = time.perf_counter()
        acc, prev = 0.0, None
        for _ in range(args.iters):
            out = scan_fn(imgs, g)
            if prev is not None:
                acc += float(prev)
            prev = out
        acc += float(prev)
        dt = time.perf_counter() - t0
        assert np.isfinite(acc)
        return round(1000.0 * dt / (g * args.iters), 3), round(compile_s, 1)

    record = {"batch": args.batch, "input_size": size, "depth": args.depth,
              "backend": backend, "scan_batches": g,
              "ms_per_batch": {}, "compile_s": {}}
    for name, fn in variants.items():
        ms, cs = timed(fn)
        record["ms_per_batch"][name] = ms
        record["compile_s"][name] = cs
        print(f"{name:>8}: {ms:8.3f} ms/batch (compile {cs}s)", flush=True)
    print(json.dumps(record), flush=True)
    with open(os.path.join(HERE, "resnet_scan_infer_experiments.json"),
              "a") as fh:
        fh.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
