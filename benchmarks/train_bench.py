"""Training-step device benchmark: images/sec/chip for the jitted
forward+backward+SGD step (SURVEY.md §2.12 training loop on the TPU
compute path).

Protocol mirrors bench.py (the only honest timing through the axon
tunnel — see its docstring): each jitted dispatch runs `scan_batches`
REAL optimizer steps via lax.scan, carrying (params, velocity) through
the scan so every iteration consumes the previous step's weights
(nothing loop-invariant to hoist), alternating two pre-staged device
batches via a traced index. The summed per-step loss is fetched inside
the timed region, forcing the whole chain. BN batch-stat updates ride
along exactly as in training.make_train_step.

Usage: python benchmarks/train_bench.py [model] [size] [batch]
Writes/updates benchmarks/train_bench.json (keyed on model/size/batch).
Run as an untimed background task on TPU (TPU rules: no timeout-kill).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def bench(model_name: str = "yolov3", input_size: int = 416,
          batch: int = 32, iters: int = 4, scan_batches: int = 10) -> dict:
    import jax
    import jax.numpy as jnp

    from mydetection_tpu.models.layers import tree_merge
    from mydetection_tpu.registry import get_model
    from mydetection_tpu.training import sgd_init, sgd_update

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    if not on_tpu:
        scan_batches = 1
    model = get_model(model_name, input_size=input_size,
                      compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    velocity = sgd_init(params)

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(
        0, 255, (2, batch, input_size, input_size, 3), np.uint8))
    # a plausible GT load: 8 boxes/img scattered over the frame
    m = 8
    cx = rng.uniform(0.15, 0.85, (2, batch, m)) * input_size
    cy = rng.uniform(0.15, 0.85, (2, batch, m)) * input_size
    w = rng.uniform(0.05, 0.3, (2, batch, m)) * input_size
    h = rng.uniform(0.05, 0.3, (2, batch, m)) * input_size
    cols = [cx, cy, w, h]
    if model.config.rotated:
        cols.append(rng.uniform(-1.2, 1.2, (2, batch, m)))
    gt_boxes = jnp.asarray(np.stack(cols, -1), jnp.float32)
    gt_classes = jnp.asarray(
        rng.randint(0, model.config.num_classes, (2, batch, m)), jnp.int32)
    gt_valid = jnp.ones((2, batch, m), bool)

    def one_step(p, v, x, gb, gc, gv):
        def loss_fn(p):
            terms = model.loss(p, x, gb, gc, gv, input_size=input_size)
            bn = terms.pop("bn_updates", None)
            return terms["total"], bn

        (total, bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        p, v = sgd_update(p, grads, v, lr=1e-4)
        return tree_merge(p, bn), v, total

    @functools.partial(jax.jit, static_argnames=("g",),
                       donate_argnums=(0, 1))
    def train_scan(p, v, g):
        def body(carry, i):
            p, v = carry
            x = jax.lax.dynamic_index_in_dim(imgs, i % 2, 0, keepdims=False)
            gb = jax.lax.dynamic_index_in_dim(gt_boxes, i % 2, 0,
                                              keepdims=False)
            gc = jax.lax.dynamic_index_in_dim(gt_classes, i % 2, 0,
                                              keepdims=False)
            gv = jax.lax.dynamic_index_in_dim(gt_valid, i % 2, 0,
                                              keepdims=False)
            p, v, total = one_step(p, v, x, gb, gc, gv)
            return (p, v), total
        (p, v), losses = jax.lax.scan(body, (p, v), jnp.arange(g))
        return p, v, jnp.sum(losses)

    # warm (compile) + one hot run; rebind donated state each call
    params, velocity, s = train_scan(params, velocity, scan_batches)
    assert np.isfinite(float(s)), float(s)
    params, velocity, s = train_scan(params, velocity, scan_batches)
    float(s)

    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(iters):
        params, velocity, s = train_scan(params, velocity, scan_batches)
        acc += float(s)  # fetch-forced every dispatch
    dt = time.perf_counter() - t0
    assert np.isfinite(acc)
    ips = batch * scan_batches * iters / dt
    row = {
        "model": model_name, "input_size": input_size, "batch": batch,
        "backend": backend,
        "train_images_per_sec_per_chip": round(ips, 2),
        "device_ms_per_step": round(1000 * batch / ips, 2),
    }
    print(f"{model_name}-{input_size} train: {ips:.1f} img/s "
          f"({row['device_ms_per_step']} ms/step @ batch {batch})",
          flush=True)
    return row


if __name__ == "__main__":
    name = sys.argv[1] if len(sys.argv) > 1 else "yolov3"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 416
    b = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    row = bench(name, size, b)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "train_bench.json")
    existing = []
    if os.path.exists(out):
        with open(out) as fh:
            data = json.load(fh)
            existing = data if isinstance(data, list) else [data]
    existing = [r for r in existing
                if (r.get("model"), r.get("input_size"), r.get("batch"))
                != (row["model"], row["input_size"], row["batch"])]
    existing.append(row)
    with open(out, "w") as fh:
        json.dump(existing, fh, indent=1)
    print(json.dumps(row), flush=True)
