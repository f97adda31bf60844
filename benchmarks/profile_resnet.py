"""Per-stage profile of the RetinaNet-R50-FPN @608 batch-32 pipeline.

Same prefix protocol as profile_stages.py (scan-amortized, two real
alternating batches, fetch-forced): where do the ~58 ms/batch go —
ResNet stem/maxpool, bottleneck stages, FPN, subnets, or decode/NMS?

Run: python benchmarks/profile_resnet.py [--batch 32] [--model fcos]
Appends one JSON line to benchmarks/profile_resnet.json.
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
    ap.add_argument("--scan-batches", type=int, default=20)
    ap.add_argument("--input-size", type=int, default=608)
    ap.add_argument("--model", default="retinanet",
                    choices=("retinanet", "fcos"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mydetection_tpu.models import fpn as fpn_mod
    from mydetection_tpu.models import layers as L, resnet
    from mydetection_tpu.ops.nms import postprocess_impl
    from mydetection_tpu.registry import get_model

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = get_model(args.model, input_size=args.input_size,
                      compute_dtype=dtype)
    cfg = model.config
    params = model.init(jax.random.PRNGKey(0))
    size = args.input_size

    def prefix_fn(upto: str):
        def fn(p, x):
            pb = p["backbone"]
            if on_tpu:
                # the SHIPPED pipeline folds /255 + ImageNet standardize
                # into the stem conv on TPU (registry forward_raw) —
                # profile the same path, or the heads+decode diff
                # silently absorbs the fold-vs-standard stem difference
                # the folded helper returns the POST-maxpool activation,
                # so "stem" reports the fused normalize+conv+pool cost
                # and the "maxpool" split reads ~0 on TPU
                y = resnet._stem_standardize_folded(
                    pb["stem"], x.astype(dtype), compute_dtype=dtype)
                if upto in ("stem", "maxpool"):
                    return jnp.sum(y.astype(jnp.float32))
            else:
                y = L.normalize_input(x, dtype)
                y = L.standardize_imagenet(y)
                y, _ = resnet._conv_bn(pb["stem"], y, stride=2,
                                       compute_dtype=dtype)
                y = jnp.maximum(y, 0.0)
                if upto == "stem":
                    return jnp.sum(y.astype(jnp.float32))
                y = L.max_pool(y, 3, 2)
                if upto == "maxpool":
                    return jnp.sum(y.astype(jnp.float32))
            feats = []
            for si, nb in enumerate(resnet.STAGE_BLOCKS[50]):
                stage = pb[f"stage{si}"]
                y, _ = resnet._bottleneck(stage["block0"], y,
                                          stride=2 if si > 0 else 1,
                                          train=False, compute_dtype=dtype)
                for bi in range(1, nb):
                    y, _ = resnet._bottleneck(stage[f"block{bi}"], y,
                                              stride=1, train=False,
                                              compute_dtype=dtype)
                if si >= 1:
                    feats.append(y)
                if upto == f"stage{si}":
                    return jnp.sum(y.astype(jnp.float32))
            pyr = fpn_mod.apply(p["fpn"], tuple(feats), compute_dtype=dtype)
            if upto == "fpn":
                return sum(jnp.sum(f.astype(jnp.float32)) for f in pyr)
            dense, _ = model.forward_dense(p, x)
            if upto == "heads+decode":
                return (jnp.sum(dense["score_logits"].astype(jnp.float32))
                        + jnp.sum(dense["boxes"]))
            out = jax.vmap(lambda d: postprocess_impl(
                d["boxes"], d.get("scores"), classes=d.get("classes"),
                score_logits=d.get("score_logits"),
                score_mul=d.get("score_mul"),
                gate_logits=d.get("score_gate"),
                conf_thres=0.3, iou_thres=0.45, pre_nms=cfg.pre_nms,
                max_dets=cfg.max_dets, use_pallas=on_tpu,
                multi_label=cfg.multi_label,
                approx_topk=cfg.approx_topk))(dense)
            return jnp.sum(out["scores"]) + jnp.sum(out["boxes"])

        return fn

    segments = ["stem", "maxpool", "stage0", "stage1", "stage2", "stage3",
                "fpn", "heads+decode", "full"]

    imgs = jnp.asarray(np.random.RandomState(0).randint(
        0, 255, (2, args.batch, size, size, 3), np.uint8))
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

        float(scan_fn(params, imgs, g))
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
        return 1000.0 * dt / (g * args.iters)

    cum = {}
    prev_ms = 0.0
    record = {"model": args.model, "batch": args.batch, "input_size": size,
              "backend": backend, "split_ms": {}}
    for seg in segments:
        cum[seg] = timed(prefix_fn(seg))
        record["split_ms"][seg] = round(cum[seg] - prev_ms, 3)
        print(f"{seg:>14}: {cum[seg]:8.3f} cum  "
              f"(+{cum[seg] - prev_ms:6.3f}) ms/batch", flush=True)
        prev_ms = cum[seg]
    record["total_ms"] = round(cum["full"], 3)
    print(json.dumps(record), flush=True)
    with open(os.path.join(HERE, "profile_resnet.json"), "a") as fh:
        fh.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
