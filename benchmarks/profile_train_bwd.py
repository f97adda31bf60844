"""Backward-pass decomposition of the yolov3-416 train step.

profile_train.py splits the 87 ms step into fwd 19 / train-BN 4.9 /
loss 1.4 / backward 60.6 / SGD 1.0 — the backward is ~1.4x over the
"fair" 2x-forward-FLOPs estimate (~43 ms). This tool finds WHERE: it
times value_and_grad of scalarized cumulative PREFIXES of the
train-mode network (same prefix construction as profile_stages.py but
train=True, gradients w.r.t. params), so per-segment diffs charge each
stage with its own forward+backward cost. A final "loss" segment runs
the real model.loss to include target assignment.

Per-segment fwd+bwd time next to 3x the segment's analytic forward
FLOPs (fwd + dx-conv + dw-conv) pinpoints which stage's backward runs
cold on the MXU.

Run (TPU): python benchmarks/profile_train_bwd.py [--batch 32]
Appends one JSON line to benchmarks/profile_train_bwd.json.
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


def conv_gflops(k, cin, cout, hw):
    return 2.0 * k * k * cin * cout * hw * hw / 1e9


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--scan-batches", type=int, default=10)
    ap.add_argument("--input-size", type=int, default=416)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mydetection_tpu.models import darknet, layers as L, yolov3
    from mydetection_tpu.models.darknet import STAGE_BLOCKS, STAGE_CHANNELS
    from mydetection_tpu.registry import get_model

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    size = args.input_size
    model = get_model("yolov3", input_size=size, compute_dtype=dtype)
    params = model.init(jax.random.PRNGKey(0))

    # ---- analytic forward FLOPs per segment (per image), as in
    # profile_stages.py; backward fair cost = 3x forward (fwd + dx + dw)
    seg_gflops = {"stem": conv_gflops(3, 3, 32, size)}
    hw, cin = size, 32
    for si, (nb, cout) in enumerate(zip(STAGE_BLOCKS, STAGE_CHANNELS)):
        hw //= 2
        g = conv_gflops(3, cin, cout, hw)
        g += nb * (conv_gflops(1, cout, cout // 2, hw)
                   + conv_gflops(3, cout // 2, cout, hw))
        seg_gflops[f"stage{si}"] = g
        cin = cout
    s32, s16, s8 = size // 32, size // 16, size // 8
    g = 0.0
    for cmid, cin_, hw_ in ((512, 1024, s32), (256, 512 + 256, s16),
                            (128, 256 + 128, s8)):
        g += conv_gflops(1, cin_, cmid, hw_)
        g += 2 * (conv_gflops(3, cmid, cmid * 2, hw_)
                  + conv_gflops(1, cmid * 2, cmid, hw_))
    g += conv_gflops(3, 512, 1024, s32) + conv_gflops(1, 1024, 255, s32)
    g += conv_gflops(3, 256, 512, s16) + conv_gflops(1, 512, 255, s16)
    g += conv_gflops(3, 128, 256, s8) + conv_gflops(1, 256, 255, s8)
    g += conv_gflops(1, 512, 256, s32) + conv_gflops(1, 256, 128, s16)
    seg_gflops["neck+heads"] = g
    seg_gflops["loss"] = 0.0  # target assignment: not conv FLOPs

    # ---- train-mode prefix runners -------------------------------------
    def prefix_fn(upto: str):
        """fn(params, x) -> scalar, running train-mode through `upto`."""

        def fn(p, x):
            y = L.normalize_input(x, dtype)
            s2d = darknet._use_s2d(None, True, y)
            if s2d:
                y, _ = darknet._early_s2d(p["backbone"], y,
                                          compute_dtype=dtype, train=True)
            else:
                y, _ = L.conv_bn_leaky(p["backbone"]["stem"], y, train=True,
                                       compute_dtype=dtype)
            if upto == "stem":
                return jnp.sum(y.astype(jnp.float32))
            feats = []
            for si, nb in enumerate(STAGE_BLOCKS):
                stage = p["backbone"][f"stage{si}"]
                if si == 0 and s2d:
                    if upto == "stage0":
                        return jnp.sum(y.astype(jnp.float32))
                    continue
                if not (si == 1 and s2d):
                    y, _ = L.conv_bn_leaky(stage["down"], y, stride=2,
                                           train=True, compute_dtype=dtype)
                y, _ = darknet._res_stage(stage, y, nb, train=True,
                                          compute_dtype=dtype,
                                          scan_blocks=None)
                if si >= 2:
                    feats.append(y)
                if upto == f"stage{si}":
                    return jnp.sum(y.astype(jnp.float32))
            raw, _ = yolov3.apply(p["head"], tuple(feats), train=True,
                                  compute_dtype=dtype)
            return sum(jnp.sum(r.astype(jnp.float32)) for r in raw)

        return fn

    # the real loss (adds target assignment + loss math + its backward)
    rng = np.random.RandomState(0)
    m = 8
    cx = rng.uniform(0.15, 0.85, (2, args.batch, m)) * size
    cy = rng.uniform(0.15, 0.85, (2, args.batch, m)) * size
    w = rng.uniform(0.05, 0.3, (2, args.batch, m)) * size
    h = rng.uniform(0.05, 0.3, (2, args.batch, m)) * size
    gt_boxes = jnp.asarray(np.stack([cx, cy, w, h], -1), jnp.float32)
    gt_classes = jnp.asarray(
        rng.randint(0, 80, (2, args.batch, m)), jnp.int32)
    gt_valid = jnp.ones((2, args.batch, m), bool)

    def loss_fn(p, x, bi):
        terms = model.loss(p, x, gt_boxes[bi], gt_classes[bi],
                           gt_valid[bi], input_size=size)
        return terms["total"]

    imgs = jnp.asarray(rng.randint(
        0, 255, (2, args.batch, size, size, 3), np.uint8))
    g_scan = args.scan_batches if on_tpu else 1

    def timed(fn, with_labels=False):
        @functools.partial(jax.jit, static_argnames=("g",))
        def scan_fn(p, two, g):
            def body(acc, i):
                x = jax.lax.dynamic_index_in_dim(two, i % 2, 0,
                                                 keepdims=False)
                if with_labels:
                    val, grads = jax.value_and_grad(fn)(p, x, i % 2)
                else:
                    val, grads = jax.value_and_grad(fn)(p, x)
                # fold a grad leaf into the carry so the backward can't
                # be dead-code-eliminated
                gsum = sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                           for l in jax.tree_util.tree_leaves(grads))
                return acc + val + 1e-12 * gsum, None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(g))
            return acc

        float(scan_fn(params, imgs, g_scan))
        float(scan_fn(params, imgs, g_scan))
        t0 = time.perf_counter()
        acc, prev = 0.0, None
        for _ in range(args.iters):
            out = scan_fn(params, imgs, g_scan)
            if prev is not None:
                acc += float(prev)
            prev = out
        acc += float(prev)
        dt = time.perf_counter() - t0
        assert np.isfinite(acc)
        return 1000.0 * dt / (g_scan * args.iters)

    segments = (["stem"] + [f"stage{si}" for si in range(5)]
                + ["neck+heads", "loss"])
    cum = {}
    for seg in segments:
        if seg == "loss":
            cum[seg] = timed(loss_fn, with_labels=True)
        else:
            cum[seg] = timed(prefix_fn(seg))
        print(f"  cum[{seg}] = {cum[seg]:.3f} ms", flush=True)

    split = {}
    prev_ms = 0.0
    for seg in segments:
        ms = cum[seg] - prev_ms
        prev_ms = cum[seg]
        fair3 = 3.0 * seg_gflops[seg] * args.batch / V5E_BF16_TFLOPS
        split[seg] = {
            "fwdbwd_ms": round(ms, 3),
            "fair3x_ms": round(fair3, 3),
            "mfu3x": round(fair3 / ms, 3) if ms > 0 else None,
        }
    row = {
        "batch": args.batch, "input_size": size, "backend": backend,
        "cumulative_ms": {k: round(v, 3) for k, v in cum.items()},
        "split": split,
    }
    out = os.path.join(HERE, "profile_train_bwd.json")
    with open(out, "a") as fh:
        fh.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
