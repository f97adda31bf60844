"""int8-vs-bf16 device benchmark for the static-scale quant path.

Measures the FULL detect pipeline (uint8 in -> forward -> decode ->
top-k -> NMS) with the float params vs the QuantizedParams produced by
quant.quantize_model, using the same two-batch lax.scan protocol as
bench.py (the only honest timing through the axon tunnel — see
bench.py docstring). Run as an untimed background task on TPU.

Usage: python benchmarks/quant_bench.py [model] [size] [batch]
Writes benchmarks/quant_bench.json.
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
          batch: int = 32, iters: int = 5, scan_batches: int = 40,
          modes: tuple = ("bf16", "int8")) -> dict:
    import jax
    import jax.numpy as jnp

    from mydetection_tpu import quant
    from mydetection_tpu.ops.nms import postprocess_impl
    from mydetection_tpu.ops.rotated import rotated_postprocess_impl
    from mydetection_tpu.registry import get_model

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    if not on_tpu:
        scan_batches = 1
    model = get_model(model_name, input_size=input_size,
                      compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    cfg = model.config
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    calib = [rng.randint(0, 256, (2, input_size, input_size, 3), np.uint8)
             for _ in range(2)]
    qp = quant.quantize_model(cfg, params, calib)

    def post_one(d):
        if cfg.rotated:
            return rotated_postprocess_impl(
                d["boxes"], d["scores"], conf_thres=0.3, iou_thres=0.45,
                pre_nms=cfg.pre_nms, max_dets=cfg.max_dets,
                use_pallas=on_tpu, approx_topk=cfg.approx_topk)
        return postprocess_impl(
            d["boxes"], d.get("scores"), classes=d.get("classes"),
            score_logits=d.get("score_logits"), score_mul=d.get("score_mul"),
            gate_logits=d.get("score_gate"),
            conf_thres=0.3, iou_thres=0.45, pre_nms=cfg.pre_nms,
            max_dets=cfg.max_dets, use_pallas=on_tpu,
            multi_label=cfg.multi_label, approx_topk=cfg.approx_topk)

    def post(dense):
        return jax.vmap(post_one)(dense)

    def detect_float(p, x):
        dense, _ = model.forward_dense(p, x)
        out = post(dense)
        return jnp.sum(out["scores"]) + jnp.sum(out["boxes"])

    def detect_q(p, x):
        out = post(quant.forward_dense_quantized(p, x, cfg))
        return jnp.sum(out["scores"]) + jnp.sum(out["boxes"])

    imgs = jnp.asarray(rng.randint(
        0, 255, (2, batch, input_size, input_size, 3), np.uint8))

    results = {}
    for label, fn, p in (("bf16", detect_float, params),
                         ("int8", detect_q, qp)):
        if label not in modes:
            continue
        @functools.partial(jax.jit, static_argnames=("g",))
        def scan(p, two, g, fn=fn):
            def body(acc, i):
                x = jax.lax.dynamic_index_in_dim(two, i % 2, 0, keepdims=False)
                return acc + fn(p, x), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(g))
            return acc

        float(scan(p, imgs, scan_batches))
        float(scan(p, imgs, scan_batches))
        t0 = time.perf_counter()
        acc, prev = 0.0, None
        for _ in range(iters):
            out = scan(p, imgs, scan_batches)
            if prev is not None:
                acc += float(prev)
            prev = out
        acc += float(prev)
        dt = time.perf_counter() - t0
        assert np.isfinite(acc)
        ips = batch * scan_batches * iters / dt
        results[label] = round(ips, 2)
        print(f"{model_name}-{input_size} {label}: {ips:.1f} img/s", flush=True)

    results.update(model=model_name, input_size=input_size, batch=batch,
                   backend=backend)
    if "bf16" in results and "int8" in results:
        results["speedup"] = round(results["int8"] / results["bf16"], 3)
    return results


if __name__ == "__main__":
    name = sys.argv[1] if len(sys.argv) > 1 else "yolov3"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 416
    b = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    row = bench(name, size, b)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "quant_bench.json")
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
