"""Stage-split profile of the multi-label postprocess (RetinaNet/FCOS).

profile_resnet.py shows "full minus heads+decode" (the postprocess:
stage-1 box gate/top-k, stage-2 pair top-k, class-offset NMS, final
select) costing ~5-9 ms/batch-32 @608 — vs yolov3's ~2 ms single-label
path. This isolates WHERE, timing cumulative prefixes over pre-staged
dense head outputs (no convs in the loop): the dense (N, C) bf16 class
logits + (N, 4) f32 boxes for N=69,354 RetinaNet-608 anchors, vmapped
over the batch, same two-buffer scan protocol as bench.py.

Run (TPU): python benchmarks/profile_post.py [--batch 32]
Appends one JSON line to benchmarks/profile_post.json.
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
    ap.add_argument("--num-anchors", type=int, default=69354)
    ap.add_argument("--num-classes", type=int, default=80)
    ap.add_argument("--pre-nms", type=int, default=1024)
    ap.add_argument("--max-dets", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mydetection_tpu.ops import nms as N

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    g_scan = args.scan_batches if on_tpu else 1
    n, c = args.num_anchors, args.num_classes
    pre_nms, max_dets = args.pre_nms, args.max_dets
    b = args.batch

    rng = np.random.RandomState(0)
    # two staged "dense head output" pairs — logits in bf16 (native head
    # dtype), boxes f32, box coords in a 608-ish range
    logits = jnp.asarray(rng.standard_normal((2, b, n, c)).astype(np.float32)
                         * 2.0 - 4.0).astype(jnp.bfloat16)
    xy = rng.uniform(0, 600, (2, b, n, 2)).astype(np.float32)
    wh = rng.uniform(4, 80, (2, b, n, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], axis=-1))

    def stage_fn(upto: str):
        def one(bx, lg):
            gate = jax.nn.sigmoid(jnp.max(lg, axis=1).astype(jnp.float32))
            if upto == "gate":
                return jnp.sum(gate)
            _, box_sel = N.topk_select(gate, pre_nms, True)
            if upto == "stage1_topk":
                return jnp.sum(box_sel.astype(jnp.float32))
            sel_scores = jax.nn.sigmoid(lg[box_sel].astype(jnp.float32))
            flat = sel_scores.reshape(-1)
            flat = jnp.where(flat >= 0.05, flat, N.NEG_INF)
            top_scores, top_idx = N.topk_select(flat, pre_nms, True)
            if upto == "stage2_topk":
                return jnp.sum(top_scores)
            box_idx = box_sel[top_idx // c]
            cls_idx = (top_idx % c).astype(jnp.int32)
            sel_boxes = bx[box_idx]
            if upto == "gathers":
                return jnp.sum(sel_boxes) + jnp.sum(top_scores)
            out = N._nms_and_select(sel_boxes, top_scores, cls_idx,
                                    iou_thres=0.45, max_dets=max_dets,
                                    block=128, use_pallas=on_tpu)
            return jnp.sum(out["scores"]) + jnp.sum(out["boxes"])

        def fn(bx, lg):
            return jnp.sum(jax.vmap(one)(bx, lg))
        return fn

    segments = ["gate", "stage1_topk", "stage2_topk", "gathers", "full"]

    def timed(fn) -> float:
        @functools.partial(jax.jit, static_argnames=("g",))
        def scan_fn(two_b, two_l, g):
            def body(acc, i):
                bx = jax.lax.dynamic_index_in_dim(two_b, i % 2, 0,
                                                  keepdims=False)
                lg = jax.lax.dynamic_index_in_dim(two_l, i % 2, 0,
                                                  keepdims=False)
                return acc + fn(bx, lg), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(g))
            return acc

        float(scan_fn(boxes, logits, g_scan))
        float(scan_fn(boxes, logits, g_scan))
        t0 = time.perf_counter()
        acc, prev = 0.0, None
        for _ in range(args.iters):
            out = scan_fn(boxes, logits, g_scan)
            if prev is not None:
                acc += float(prev)
            prev = out
        acc += float(prev)
        dt = time.perf_counter() - t0
        assert np.isfinite(acc)
        return 1000.0 * dt / (g_scan * args.iters)

    cum, prev_ms = {}, 0.0
    record = {"batch": b, "num_anchors": n, "num_classes": c,
              "backend": backend, "split_ms": {}}
    for seg in segments:
        cum[seg] = timed(stage_fn(seg))
        record["split_ms"][seg] = round(cum[seg] - prev_ms, 3)
        print(f"{seg:>12}: {cum[seg]:8.3f} cum  (+{cum[seg] - prev_ms:6.3f})"
              f" ms/batch", flush=True)
        prev_ms = cum[seg]
    record["total_ms"] = round(cum["full"], 3)
    print(json.dumps(record), flush=True)
    with open(os.path.join(HERE, "profile_post.json"), "a") as fh:
        fh.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
