"""Decompose the 103 ms yolov3-416 train step: loss-forward vs
backward vs SGD/BN-merge.

Context: inference forward (incl. postprocess) is 18.3 ms/batch-32 on
v5e, so a ~3x fwd:fwd+bwd ratio predicts ~50 ms — the measured step
(benchmarks/train_bench.py) is 103 ms. Candidate sinks: the loss's
target assignment (per-GT IoU + ignore masks), the backward of the
STANDARD early chain (training can't use the inference-only S2D
rewrite — BN batch stats), BN-stat updates, or the SGD tree update.

Segments (cumulative, same two-buffer scan + fetch-forced protocol as
bench.py; params/velocity carried through the scan so nothing is
loop-invariant):
  fwd_dense   forward_dense only (no labels) — conv fwd reference
  fwd_loss    model.loss forward (adds target assignment + loss math)
  grad        + value_and_grad backward
  step        + sgd_update + BN tree_merge (= the shipped train step)

Run (TPU): python benchmarks/profile_train.py [--model yolov3]
Appends one JSON line to benchmarks/profile_train.json.
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
    ap.add_argument("--model", default="yolov3")
    ap.add_argument("--input-size", type=int, default=416)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--scan-batches", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mydetection_tpu.models.layers import tree_merge
    from mydetection_tpu.registry import get_model
    from mydetection_tpu.training import sgd_init, sgd_update

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    g_scan = args.scan_batches if on_tpu else 1
    size, batch = args.input_size, args.batch
    model = get_model(args.model, input_size=size,
                      compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    velocity = sgd_init(params)

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(
        0, 255, (2, batch, size, size, 3), np.uint8))
    m = 8
    cx = rng.uniform(0.15, 0.85, (2, batch, m)) * size
    cy = rng.uniform(0.15, 0.85, (2, batch, m)) * size
    w = rng.uniform(0.05, 0.3, (2, batch, m)) * size
    h = rng.uniform(0.05, 0.3, (2, batch, m)) * size
    cols = [cx, cy, w, h]
    if model.config.rotated:
        cols.append(rng.uniform(-1.2, 1.2, (2, batch, m)))
    gt_boxes = jnp.asarray(np.stack(cols, -1), jnp.float32)
    gt_classes = jnp.asarray(
        rng.randint(0, model.config.num_classes, (2, batch, m)), jnp.int32)
    gt_valid = jnp.ones((2, batch, m), bool)

    def seg_fn(upto: str):
        """Returns body(p, v, x, gb, gc, gv) -> (p, v, scalar)."""
        def loss_fn(p, x, gb, gc, gv):
            terms = model.loss(p, x, gb, gc, gv, input_size=size)
            bn = terms.pop("bn_updates", None)
            return terms["total"], bn

        if upto == "fwd_dense":
            def body(p, v, x, gb, gc, gv):
                dense, _ = model.forward_dense(p, x)
                s = sum(jnp.sum(t.astype(jnp.float32)) for t in
                        jax.tree_util.tree_leaves(dense))
                return p, v, s
        elif upto == "fwd_train":
            # train-mode dense forward WITHOUT the loss: isolates what
            # BN batch stats + the standard (non-S2D) early chain cost
            # over the inference graph, so fwd_loss - fwd_train is
            # approximately the pure target-assignment + loss math.
            def body(p, v, x, gb, gc, gv):
                dense, updates = model.forward_dense(p, x, train=True)
                s = sum(jnp.sum(t.astype(jnp.float32)) for t in
                        jax.tree_util.tree_leaves(dense))
                s = s + 0.0 * sum(
                    jnp.sum(t.astype(jnp.float32)) for t in
                    jax.tree_util.tree_leaves(updates))
                return p, v, s
        elif upto == "fwd_loss":
            def body(p, v, x, gb, gc, gv):
                total, _ = loss_fn(p, x, gb, gc, gv)
                return p, v, total
        elif upto == "grad":
            def body(p, v, x, gb, gc, gv):
                (total, _), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(p, x, gb, gc, gv)
                # force the whole gradient tree without updating params
                gsum = sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in
                           jax.tree_util.tree_leaves(grads))
                return p, v, total + 0.0 * gsum
        else:  # step
            def body(p, v, x, gb, gc, gv):
                (total, bn), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(p, x, gb, gc, gv)
                p, v = sgd_update(p, grads, v, lr=1e-4)
                return tree_merge(p, bn), v, total
        return body

    def timed(body) -> float:
        @functools.partial(jax.jit, static_argnames=("g",))
        def scan_fn(p, v, g):
            def sbody(carry, i):
                p, v = carry
                sel = functools.partial(jax.lax.dynamic_index_in_dim,
                                        index=i % 2, axis=0, keepdims=False)
                p, v, s = body(p, v, sel(imgs), sel(gt_boxes),
                               sel(gt_classes), sel(gt_valid))
                return (p, v), s
            (p, v), losses = jax.lax.scan(sbody, (p, v), jnp.arange(g))
            return jnp.sum(losses)

        float(scan_fn(params, velocity, g_scan))
        float(scan_fn(params, velocity, g_scan))
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(args.iters):
            acc += float(scan_fn(params, velocity, g_scan))
        dt = time.perf_counter() - t0
        assert np.isfinite(acc)
        return 1000.0 * dt / (g_scan * args.iters)

    segments = ["fwd_dense", "fwd_train", "fwd_loss", "grad", "step"]
    cum, prev_ms = {}, 0.0
    record = {"model": args.model, "input_size": size, "batch": batch,
              "backend": backend, "split_ms": {}}
    for seg in segments:
        cum[seg] = timed(seg_fn(seg))
        record["split_ms"][seg] = round(cum[seg] - prev_ms, 3)
        print(f"{seg:>10}: {cum[seg]:8.3f} cum  (+{cum[seg] - prev_ms:7.3f})"
              f" ms/step", flush=True)
        prev_ms = cum[seg]
    record["total_ms"] = round(cum["step"], 3)
    print(json.dumps(record), flush=True)
    with open(os.path.join(HERE, "profile_train.json"), "a") as fh:
        fh.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
