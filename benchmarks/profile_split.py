"""Component-split profile of the fused batch-32 detect graph.

Answers VERDICT r2 #1: where do the 24.4 ms/batch-32 go — convs,
decode, top-k, or NMS? Each variant jits a PREFIX of the pipeline with
the same scan-amortized, fetch-forced protocol as bench.py, so
successive differences are honest per-stage device costs (XLA may fuse
across stage boundaries differently per variant; the split is a tight
estimate, not an exact trace).

Variants (cumulative):
  convs   uint8 → normalize → Darknet-53 → YOLO heads (raw maps)
  decode  + single-label dense decode (boxes/scores/classes)
  topk    + conf gate + top-k pre-select + gathers (pre-NMS)
  full    + class-offset NMS + final top-max_dets  (== bench.py)

Run:  python benchmarks/profile_split.py [--batch 32] [--oracle-nms]
Appends one JSON line to benchmarks/profile_split.json.
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

# YOLOv3-416 conv FLOPs (2*MACs), for MFU: the standard figure is
# 65.86 GFLOPs/image at 416x416 (darknet's own accounting).
YOLOV3_416_GFLOPS = 65.86
V5E_BF16_TFLOPS = 197.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--scan-batches", type=int, default=40)
    ap.add_argument("--input-size", type=int, default=416)
    ap.add_argument("--oracle-nms", action="store_true",
                    help="also time the pure-jax NMS for comparison")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mydetection_tpu.models import darknet, layers as L, yolov3
    from mydetection_tpu.ops.boxes import cxcywh_to_xyxy
    from mydetection_tpu.ops.nms import NEG_INF, postprocess_impl
    from mydetection_tpu.registry import get_model

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = get_model("yolov3", input_size=args.input_size,
                      compute_dtype=dtype)
    cfg = model.config
    params = model.init(jax.random.PRNGKey(0))

    def run_convs(p, x):
        xf = L.normalize_input(x, dtype)
        feats, _ = darknet.apply(p["backbone"], xf, train=False,
                                 compute_dtype=dtype)
        raw, _ = yolov3.apply(p["head"], feats, train=False,
                              compute_dtype=dtype)
        return sum(jnp.sum(r.astype(jnp.float32)) for r in raw)

    def dense_of(p, x):
        xf = L.normalize_input(x, dtype)
        feats, _ = darknet.apply(p["backbone"], xf, train=False,
                                 compute_dtype=dtype)
        raw, _ = yolov3.apply(p["head"], feats, train=False,
                              compute_dtype=dtype)
        d = yolov3.decode_single_label(raw, cfg.num_classes)
        return {"boxes": cxcywh_to_xyxy(d["boxes"]), "scores": d["scores"],
                "classes": d["classes"]}

    def run_decode(p, x):
        d = dense_of(p, x)
        return jnp.sum(d["scores"]) + jnp.sum(d["boxes"])

    def topk_of(d, conf_thres):
        # single-label pre-NMS stage of postprocess_impl
        gated = jnp.where(d["scores"] >= conf_thres, d["scores"], NEG_INF)
        top_scores, box_idx = jax.lax.top_k(gated, cfg.pre_nms)
        return (d["boxes"][box_idx], top_scores,
                d["classes"][box_idx].astype(jnp.int32))

    def run_topk(p, x):
        d = dense_of(p, x)
        sel_boxes, top_scores, cls_idx = jax.vmap(
            functools.partial(topk_of, conf_thres=0.3))(d)
        return (jnp.sum(sel_boxes) + jnp.sum(jnp.maximum(top_scores, -1.0))
                + jnp.sum(cls_idx))

    def run_full(p, x, use_pallas):
        d = dense_of(p, x)
        out = jax.vmap(lambda dd: postprocess_impl(
            dd["boxes"], dd["scores"], classes=dd["classes"],
            conf_thres=0.3, iou_thres=0.45, pre_nms=cfg.pre_nms,
            max_dets=cfg.max_dets, use_pallas=use_pallas,
            multi_label=False, approx_topk=cfg.approx_topk))(d)
        return jnp.sum(out["scores"]) + jnp.sum(out["boxes"])

    variants = [
        ("convs", run_convs),
        ("decode", run_decode),
        ("topk", run_topk),
        ("full", functools.partial(run_full, use_pallas=on_tpu)),
    ]
    if args.oracle_nms:
        variants.append(("full_oracle_nms",
                         functools.partial(run_full, use_pallas=False)))

    # two-batch traced-index protocol (see bench.py docstring): the
    # earlier `x + i` u8 perturbation charged a padded-NHWC3 elementwise
    # pass to every segment, inflating the early-stage splits
    imgs = jnp.asarray(np.random.RandomState(0).randint(
        0, 255, (2, args.batch, args.input_size, args.input_size, 3),
        np.uint8))
    g = args.scan_batches if on_tpu else 1

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
    for name, fn in variants:
        per_batch = timed(fn)
        rows[name] = round(1000.0 * per_batch, 3)
        print(f"{name:>16}: {rows[name]:8.3f} ms/batch-{args.batch}",
              flush=True)

    ips = args.batch / (rows["full"] / 1000.0)
    mfu = YOLOV3_416_GFLOPS * ips / (V5E_BF16_TFLOPS * 1000.0) \
        if args.input_size == 416 else None
    record = {
        "batch": args.batch,
        "input_size": args.input_size,
        "backend": backend,
        "ms_per_batch": rows,
        "split_ms": {
            "convs": rows["convs"],
            "decode": round(rows["decode"] - rows["convs"], 3),
            "topk": round(rows["topk"] - rows["decode"], 3),
            "nms+select": round(rows["full"] - rows["topk"], 3),
        },
        "images_per_sec": round(ips, 1),
        "mfu_at_full": round(mfu, 4) if mfu is not None else None,
    }
    print(json.dumps(record), flush=True)
    with open(os.path.join(HERE, "profile_split.json"), "a") as fh:
        fh.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
