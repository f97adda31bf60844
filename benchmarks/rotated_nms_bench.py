"""Rotated-NMS kernel microbenchmark: fixpoint suppress A/B.

Times the batch-32 rotated postprocess (conf gate -> top-k -> K x K
Liang-Barsky IoU -> Pallas suppress -> select) in isolation at the
RAPiD operating point (K = pre_nms = 512), for suppress block sizes
64 and 128 and for the pure-jax oracle path, using the two-batch
scan protocol (bench.py docstring). Run on TPU after kernel changes
to attribute the rotated-NMS slice of profile_rapid.json.

Usage: python benchmarks/rotated_nms_bench.py [--batch 32]
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
    ap.add_argument("--n-dense", type=int, default=16384,
                    help="dense candidates per image pre-top-k")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--scan-batches", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mydetection_tpu.ops.rotated import rotated_postprocess_impl

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    g = args.scan_batches
    if g is None:
        g = 40 if on_tpu else 1

    rng = np.random.RandomState(0)
    n = args.n_dense

    def make(seed):
        r = np.random.RandomState(seed)
        boxes = np.stack([
            r.uniform(0, 1024, (args.batch, n)),
            r.uniform(0, 1024, (args.batch, n)),
            r.uniform(8, 120, (args.batch, n)),
            r.uniform(8, 120, (args.batch, n)),
            r.uniform(-1.5, 1.5, (args.batch, n)),
        ], -1).astype(np.float32)
        # ~5% of candidates above conf 0.3, like a trained model
        scores = (r.uniform(0, 1, (args.batch, n)) ** 8).astype(np.float32)
        return boxes, scores

    b0, s0 = make(0)
    b1, s1 = make(1)
    boxes2 = jnp.asarray(np.stack([b0, b1]))
    scores2 = jnp.asarray(np.stack([s0, s1]))

    variants = [("pallas_b64", True, 64), ("pallas_b128", True, 128)]
    if not on_tpu:
        variants = [("oracle_b64", False, 64)]
    else:
        variants.append(("oracle_b64", False, 64))

    results = {}
    for label, use_pallas, block in variants:
        def post(b, s, use_pallas=use_pallas, block=block):
            out = jax.vmap(lambda bb, ss: rotated_postprocess_impl(
                bb, ss, conf_thres=0.3, iou_thres=0.45, pre_nms=512,
                max_dets=100, block=block, use_pallas=use_pallas,
                approx_topk=on_tpu))(b, s)
            return jnp.sum(out["scores"]) + jnp.sum(out["boxes"])

        @functools.partial(jax.jit, static_argnames=("g",))
        def scan_fn(b2, s2, g, post=post):
            def body(acc, i):
                b = jax.lax.dynamic_index_in_dim(b2, i % 2, 0, keepdims=False)
                s = jax.lax.dynamic_index_in_dim(s2, i % 2, 0, keepdims=False)
                return acc + post(b, s), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(g))
            return acc

        float(scan_fn(boxes2, scores2, g))
        float(scan_fn(boxes2, scores2, g))
        t0 = time.perf_counter()
        acc, prev = 0.0, None
        for _ in range(args.iters):
            out = scan_fn(boxes2, scores2, g)
            if prev is not None:
                acc += float(prev)
            prev = out
        acc += float(prev)
        dt = time.perf_counter() - t0
        assert np.isfinite(acc)
        ms = 1000.0 * dt / (g * args.iters)
        results[label] = round(ms, 3)
        print(f"{label:>12}: {ms:8.3f} ms/batch-{args.batch}", flush=True)

    record = {"batch": args.batch, "n_dense": n, "pre_nms": 512,
              "backend": backend, "ms_per_batch": results}
    print(json.dumps(record), flush=True)
    with open(os.path.join(HERE, "rotated_nms_bench.json"), "a") as fh:
        fh.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
