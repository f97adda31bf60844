"""Component-split profile of the RAPiD@1024 rotated detect graph.

Answers VERDICT r2 weak #2: after the 44× Liang–Barsky rotated-IoU
rewrite, where do the remaining ms/batch-32 go — Darknet-53 convs, the
rotated decode, conf-gate + top-k, or the rotated NMS itself? Each
variant jits a PREFIX of the pipeline with the scan-amortized,
fetch-forced two-batch protocol (see device_bench.py — alternating two
pre-staged device batches; no uint8-perturbation artifact, ~30 ms axon
dispatch floor amortized to <1 ms). Successive differences are honest
per-stage device costs up to XLA fusion shifts at stage boundaries
(treat diffs within ~2 ms as unattributed — see the r3 protocol notes).

Variants (cumulative):
  convs   uint8 → normalize → Darknet-53 → YOLO head raw maps
  decode  + rotated decode (cxcywhθ boxes5 + conf)
  topk    + conf gate + top-k pre_nms pre-select + gather
  full    + blocked rotated NMS + final top-max_dets (== device_bench)

Run:  python benchmarks/profile_rapid.py [--batch 32]
Appends one JSON line to benchmarks/profile_rapid.json.
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

V5E_BF16_TFLOPS = 197.0
# Darknet-53 + YOLO head conv FLOPs (2*MACs) at 416² is ~65.86 G/img
# (darknet's accounting); convs scale with area → 1024²: ×(1024/416)².
RAPID_1024_GFLOPS = 65.86 * (1024.0 / 416.0) ** 2


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--scan-batches", type=int, default=None)
    ap.add_argument("--input-size", type=int, default=1024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mydetection_tpu.models import darknet, layers as L, rapid, yolov3
    from mydetection_tpu.ops.rotated import (
        NEG_INF,
        rotated_postprocess_impl,
    )
    from mydetection_tpu.registry import get_model

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = get_model("rapid", input_size=args.input_size,
                      compute_dtype=dtype)
    cfg = model.config
    params = model.init(jax.random.PRNGKey(0))
    anchors = rapid.ANCHORS
    g = args.scan_batches
    if g is None:
        # rapid@1024 ≈ 130 ms/batch → 20 batches ≈ 2.6 s/dispatch,
        # comfortably under the 60 s transport watchdog, floor <1.5 ms
        g = 20 if on_tpu else 1

    def raw_of(p, x):
        xf = L.normalize_input(x, dtype)
        feats, _ = darknet.apply(p["backbone"], xf, train=False,
                                 compute_dtype=dtype)
        raw, _ = yolov3.apply(p["head"], feats, train=False,
                              compute_dtype=dtype)
        return raw

    def run_convs(p, x):
        return sum(jnp.sum(r.astype(jnp.float32)) for r in raw_of(p, x))

    def dense_of(p, x):
        d = rapid.decode(raw_of(p, x), anchors=anchors)
        return {"boxes": d["boxes5"], "scores": d["conf"]}

    def run_decode(p, x):
        d = dense_of(p, x)
        return jnp.sum(d["scores"]) + jnp.sum(d["boxes"])

    def topk_of(boxes, scores):
        flat = jnp.where(scores >= 0.3, scores, NEG_INF)
        top_scores, top_idx = jax.lax.top_k(flat, cfg.pre_nms)
        return boxes[top_idx], top_scores

    def run_topk(p, x):
        d = dense_of(p, x)
        sel, top = jax.vmap(topk_of)(d["boxes"], d["scores"])
        return jnp.sum(sel) + jnp.sum(jnp.maximum(top, -1.0))

    def run_full(p, x):
        d = dense_of(p, x)
        out = jax.vmap(lambda b, s: rotated_postprocess_impl(
            b, s, conf_thres=0.3, iou_thres=0.45, pre_nms=cfg.pre_nms,
            max_dets=cfg.max_dets, use_pallas=on_tpu,
            approx_topk=cfg.approx_topk))(d["boxes"], d["scores"])
        return jnp.sum(out["scores"]) + jnp.sum(out["boxes"])

    imgs = jnp.asarray(np.random.RandomState(0).randint(
        0, 255, (2, args.batch, args.input_size, args.input_size, 3),
        np.uint8))

    def timed(fn):
        @functools.partial(jax.jit, static_argnames=("g",))
        def scan_fn(p, two, g):
            def body(acc, i):
                x = jax.lax.dynamic_index_in_dim(two, i % 2, 0,
                                                 keepdims=False)
                return acc + fn(p, x), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(g))
            return acc

        float(scan_fn(params, imgs, g))  # compile + warm
        float(scan_fn(params, imgs, g))
        t0 = time.perf_counter()
        acc, prev = 0.0, None
        for _ in range(args.iters):
            out = scan_fn(params, imgs, g)
            if prev is not None:
                acc += float(prev)
            prev = out
        acc += float(prev)
        dt = time.perf_counter() - t0
        assert np.isfinite(acc)
        return dt / (g * args.iters)  # seconds per batch

    rows = {}
    for name, fn in (("convs", run_convs), ("decode", run_decode),
                     ("topk", run_topk), ("full", run_full)):
        rows[name] = round(1000.0 * timed(fn), 3)
        print(f"{name:>8}: {rows[name]:8.3f} ms/batch-{args.batch}",
              flush=True)

    ips = args.batch / (rows["full"] / 1000.0)
    mfu = RAPID_1024_GFLOPS * ips / (V5E_BF16_TFLOPS * 1000.0) \
        if args.input_size == 1024 else None
    record = {
        "model": "rapid",
        "batch": args.batch,
        "input_size": args.input_size,
        "backend": backend,
        "ms_per_batch": rows,
        "split_ms": {
            "convs": rows["convs"],
            "decode": round(rows["decode"] - rows["convs"], 3),
            "topk": round(rows["topk"] - rows["decode"], 3),
            "rotated_nms+select": round(rows["full"] - rows["topk"], 3),
        },
        "images_per_sec": round(ips, 1),
        "mfu_at_full": round(mfu, 4) if mfu is not None else None,
    }
    print(json.dumps(record), flush=True)
    with open(os.path.join(HERE, "profile_rapid.json"), "a") as fh:
        fh.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
