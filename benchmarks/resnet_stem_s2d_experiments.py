"""ResNet stem variants on device: can S2D + standardize-fold beat the
shipped folded stem+maxpool?

The shipped TPU inference stem (`resnet._stem_standardize_folded`) is
one 7x7-s2 conv on the raw uint8-cast batch (normalize+standardize
folded into the weights) + BN + ReLU + 3x3-s2 maxpool: measured
~4.4 ms/batch-32 @608 on v5e, ~6% MFU -- Cin=3 pads the 128-lane MXU
42x and the (304,304,64) intermediate round-trips HBM before the pool.

Candidates (all numerically pinned to the standard path by --check):
  folded      shipped path (baseline)
  s2d_std     elementwise standardize + `resnet._stem_s2d`
              (9x9-s4 phase-folded conv + channel-sliced pool exit)
  s2d_folded  NEW: phase-folded 9x9-s4 conv on the RAW batch with
              /255+standardize folded into the weights + closed-form
              border corrections + BN + ReLU + s2d pool exit -- the
              (304,304,64) intermediate never exists AND no C=3-minor
              elementwise pass runs.

Protocol: scan-amortized (two alternating device-resident batches,
fetch-forced), same as benchmarks/stem_experiments.py.

Run: python benchmarks/resnet_stem_s2d_experiments.py [--check]
Appends one JSON line to benchmarks/resnet_stem_s2d_experiments.json.
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
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--scan-batches", type=int, default=40)
    ap.add_argument("--input-size", type=int, default=608)
    ap.add_argument("--check", action="store_true",
                    help="assert variants match the standard stem path")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mydetection_tpu.models import layers as L, resnet

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    size = args.input_size

    stem = resnet._conv_bn_init(jax.random.PRNGKey(0), 7, 3, 64)

    def v_folded(x_u8):
        y = resnet._stem_standardize_folded(stem, x_u8.astype(dtype),
                                            compute_dtype=dtype)
        return jnp.sum(y.astype(jnp.float32))

    def v_s2d_std(x_u8):
        y = L.standardize_imagenet(L.normalize_input(x_u8, dtype))
        y = resnet._stem_s2d(stem, y, compute_dtype=dtype)
        return jnp.sum(y.astype(jnp.float32))

    def v_s2d_folded(x_u8):
        y = resnet._stem_s2d_standardize_folded(stem, x_u8.astype(dtype),
                                                compute_dtype=dtype)
        return jnp.sum(y.astype(jnp.float32))

    def v_standard(x_u8):
        y = L.standardize_imagenet(L.normalize_input(x_u8, dtype))
        y, _ = resnet._conv_bn(stem, y, stride=2, compute_dtype=dtype)
        y = jnp.maximum(y, 0.0)
        y = L.max_pool(y, 3, 2)
        return jnp.sum(y.astype(jnp.float32))

    variants = {"folded": v_folded, "s2d_std": v_s2d_std,
                "s2d_folded": v_s2d_folded, "standard": v_standard}

    rs = np.random.RandomState(0)
    if args.check:
        # full-activation agreement (not just checksum) on a small batch
        x = jnp.asarray(rs.randint(0, 255, (2, size, size, 3), np.uint8))
        def act(fn_name):
            if fn_name == "folded":
                return resnet._stem_standardize_folded(
                    stem, x.astype(dtype), compute_dtype=dtype)
            if fn_name == "s2d_std":
                y = L.standardize_imagenet(L.normalize_input(x, dtype))
                return resnet._stem_s2d(stem, y, compute_dtype=dtype)
            if fn_name == "s2d_folded":
                return resnet._stem_s2d_standardize_folded(
                    stem, x.astype(dtype), compute_dtype=dtype)
            y = L.standardize_imagenet(L.normalize_input(x, dtype))
            y, _ = resnet._conv_bn(stem, y, stride=2, compute_dtype=dtype)
            y = jnp.maximum(y, 0.0)
            return L.max_pool(y, 3, 2)
        ref = np.asarray(act("standard"), np.float32)
        scale = max(1e-3, float(np.abs(ref).max()))
        for name in ("folded", "s2d_std", "s2d_folded"):
            got = np.asarray(act(name), np.float32)
            err = float(np.abs(got - ref).max()) / scale
            tol = 2e-2 if dtype == jnp.bfloat16 else 1e-5
            status = "OK" if err <= tol else "FAIL"
            print(f"check {name:>10}: rel-max-err {err:.2e} {status}",
                  flush=True)
            assert err <= tol, (name, err)

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

        float(scan_fn(imgs, g))
        float(scan_fn(imgs, g))
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
        return round(1000.0 * dt / (g * args.iters), 3)

    record = {"batch": args.batch, "input_size": size, "backend": backend,
              "scan_batches": g, "ms_per_batch": {}}
    for name, fn in variants.items():
        ms = timed(fn)
        record["ms_per_batch"][name] = ms
        print(f"{name:>12}: {ms:8.3f} ms/batch", flush=True)
    print(json.dumps(record), flush=True)
    with open(os.path.join(HERE, "resnet_stem_s2d_experiments.json"),
              "a") as fh:
        fh.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
