"""Microbenchmark the Darknet S2D stem's ~4-5 ms (batch 32 @416) to
find out WHAT it spends: u8 NHWC3 input read, u8->bf16 convert, the
4x4-s2 conv itself, or the 354 MB S2D activation write.

Context (benchmarks/profile_stages.json, v5e): after the S2D rewrite
the stem prefix still measures ~3-5 ms at ~1.5% MFU while stages 2-4
run at 92-96%; the stem is the last big slice of YOLOv3@416's 18.3 ms
batch. Its FLOPs are worth 0.09 ms at roofline and its unavoidable
traffic (17 MB u8 in + 354 MB bf16 out) ~0.5 ms, so most of the
measured time is layout overhead we may be able to move or remove.

Each variant is timed with the repo's two-batch scan(40) fetch-forced
protocol (see bench.py docstring; ~30 ms axon dispatch floor amortized
to <1 ms). `lax.optimization_barrier` marks where the real pipeline
materializes an activation, so fused-away writes don't flatter a
variant (the `jnp.sum` checksum otherwise fuses into the producer —
see the tpu-bench-protocol-pitfalls memory).

Variants:
  read_floor   fetch one lane of the staged u8 batch (dispatch+index floor)
  normalize    u8 NHWC3 -> bf16/255, fused sum (input read + convert)
  norm_mat     same but materialized through a barrier (adds the
               padded-layout bf16 write, if XLA materializes one)
  stem         normalize + 4x4-s2 S2D stem conv, fused sum
  stem_mat     stem with the (208,208,128) activation materialized
  stem_bf16    stem conv from a PRE-staged bf16 input (no u8 in graph)
  stem_merged  u8 staged as (B,H,W*3) — packed minor dim — reshaped to
               NHWC3 in-graph before the same stem (does input staging
               layout matter?)
  chain        the full _early_s2d chain (stem..stage1.down), barrier
  chain_std    the standard (non-S2D) stem..stage1.down chain, barrier
  stage2ref    stage2 alone from a staged bf16 (52,52,256) input — a
               known ~95%-MFU segment, sanity-checks the protocol

Run (TPU): python benchmarks/stem_experiments.py [--batch 32]
Appends one JSON line to benchmarks/stem_experiments.json.
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
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--scan-batches", type=int, default=40)
    ap.add_argument("--input-size", type=int, default=416)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mydetection_tpu.models import darknet, layers as L
    from mydetection_tpu.registry import get_model

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    size = args.input_size
    batch = args.batch
    g_scan = args.scan_batches if on_tpu else 1

    model = get_model("yolov3", input_size=size, compute_dtype=dtype)
    params = model.init(jax.random.PRNGKey(0))["backbone"]

    rng = np.random.RandomState(0)
    imgs_u8 = jnp.asarray(
        rng.randint(0, 255, (2, batch, size, size, 3), np.uint8))
    # pre-normalized bf16 copy (staged once, outside the timed region)
    imgs_bf16 = (imgs_u8.astype(dtype) / dtype(255.0))
    imgs_merged = imgs_u8.reshape(2, batch, size, size * 3)
    # staged stage2.down-input-shaped tensor (stage1 output: size/4, 128)
    s2_in = jnp.asarray(rng.standard_normal(
        (2, batch, size // 4, size // 4, 128)).astype(np.float32)).astype(dtype)

    def checksum(y):
        return jnp.sum(y.astype(jnp.float32))

    def barrier_sum(y):
        return checksum(jax.lax.optimization_barrier(y))

    def stem_conv(x):
        """The shipped S2D stem: ONE 4x4-s2 conv (3 -> 4*32 phase-major)
        consuming the original NHWC3 layout (darknet._early_s2d)."""
        return darknet._cbl_s2d(
            params["stem"], x, darknet._phase_fold_s1_weight,
            ((1, 2), (1, 2)), stride=2, compute_dtype=dtype)

    variants: dict[str, tuple] = {}

    def add(name, fn, staged):
        variants[name] = (fn, staged)

    add("read_floor", lambda x: checksum(x[0, 0, 0, :3]), imgs_u8)
    add("normalize", lambda x: checksum(L.normalize_input(x, dtype)),
        imgs_u8)
    add("norm_mat", lambda x: barrier_sum(L.normalize_input(x, dtype)),
        imgs_u8)
    add("stem", lambda x: checksum(stem_conv(L.normalize_input(x, dtype))),
        imgs_u8)
    add("stem_mat",
        lambda x: barrier_sum(stem_conv(L.normalize_input(x, dtype))),
        imgs_u8)
    add("stem_bf16", lambda x: barrier_sum(stem_conv(x)), imgs_bf16)
    add("stem_merged",
        lambda x: barrier_sum(stem_conv(
            L.normalize_input(x.reshape(batch, size, size, 3), dtype))),
        imgs_merged)
    add("chain",
        lambda x: barrier_sum(darknet._early_s2d(
            params, L.normalize_input(x, dtype), compute_dtype=dtype)),
        imgs_u8)

    def chain_std(x):
        y = L.normalize_input(x, dtype)
        y, _ = L.conv_bn_leaky(params["stem"], y, train=False,
                               compute_dtype=dtype)
        for si in (0, 1):
            stage = params[f"stage{si}"]
            y, _ = L.conv_bn_leaky(stage["down"], y, stride=2, train=False,
                                   compute_dtype=dtype)
            if si == 0:
                y, _ = darknet._res_stage(stage, y, 1, train=False,
                                          compute_dtype=dtype,
                                          scan_blocks=None)
        return barrier_sum(y)  # through stage1.down, matching `chain`

    add("chain_std", chain_std, imgs_u8)

    def stage2ref(x):
        stage = params["stage2"]
        y, _ = L.conv_bn_leaky(stage["down"], y := x, stride=2, train=False,
                               compute_dtype=dtype)
        y, _ = darknet._res_stage(stage, y, 8, train=False,
                                  compute_dtype=dtype, scan_blocks=None)
        return barrier_sum(y)

    add("stage2ref", stage2ref, s2_in)

    def timed(fn, staged) -> float:
        @functools.partial(jax.jit, static_argnames=("g",))
        def scan_fn(two, g):
            def body(acc, i):
                x = jax.lax.dynamic_index_in_dim(two, i % 2, 0,
                                                 keepdims=False)
                return acc + fn(x), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(g))
            return acc

        float(scan_fn(staged, g_scan))
        float(scan_fn(staged, g_scan))
        t0 = time.perf_counter()
        acc, prev = 0.0, None
        for _ in range(args.iters):
            out = scan_fn(staged, g_scan)
            if prev is not None:
                acc += float(prev)
            prev = out
        acc += float(prev)
        dt = time.perf_counter() - t0
        assert np.isfinite(acc)
        return round(1000.0 * dt / (g_scan * args.iters), 3)

    results = {}
    for name, (fn, staged) in variants.items():
        results[name] = timed(fn, staged)
        print(f"{name:>12}: {results[name]:8.3f} ms/batch-{batch}",
              flush=True)

    row = {"batch": batch, "input_size": size, "backend": backend,
           "scan_batches": g_scan, "ms_per_batch": results}
    out_path = os.path.join(HERE, "stem_experiments.json")
    with open(out_path, "a") as fh:
        fh.write(json.dumps(row) + "\n")
    print(json.dumps(row))


if __name__ == "__main__":
    main()
