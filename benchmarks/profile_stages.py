"""Per-stage conv profile of YOLOv3-416: where inside the 22 ms of
batch-32 conv time does the MFU go?

Times cumulative PREFIXES of the network (stem, +stage0, …, +neck/
heads) with the scan-amortized fetch-forced protocol, then reports the
per-segment time difference next to each segment's analytic FLOPs —
per-segment MFU pinpoints which resolutions/channel widths run cold.

Run: python benchmarks/profile_stages.py [--batch 32]
Appends one JSON line to benchmarks/profile_stages.json.
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
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--scan-batches", type=int, default=40)
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
    model = get_model("yolov3", input_size=args.input_size,
                      compute_dtype=dtype)
    params = model.init(jax.random.PRNGKey(0))
    size = args.input_size

    # ---- analytic FLOPs per segment (per image) -------------------------
    seg_gflops = {"stem": conv_gflops(3, 3, 32, size)}
    hw = size
    cin = 32
    for si, (nb, cout) in enumerate(zip(STAGE_BLOCKS, STAGE_CHANNELS)):
        hw //= 2
        g = conv_gflops(3, cin, cout, hw)
        g += nb * (conv_gflops(1, cout, cout // 2, hw)
                   + conv_gflops(3, cout // 2, cout, hw))
        seg_gflops[f"stage{si}"] = g
        cin = cout
    # neck+heads (yolov3.init structure): block5 @ s/32, block4 @ s/16,
    # block3 @ s/8 + branches + laterals
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

    # ---- prefix runners --------------------------------------------------
    def prefix_fn(upto: str):
        """Build fn(params, x) running the net through segment `upto`."""

        def fn(p, x):
            y = L.normalize_input(x, dtype)
            s2d = darknet._use_s2d(None, False, y)  # mirror darknet.apply
            if s2d:
                # the S2D chain covers stem + stage0 + stage1.down, so
                # under it the "stem"/"stage0" prefixes report the whole
                # chain and stage1 adds only its residual blocks
                y = darknet._early_s2d(p["backbone"], y, compute_dtype=dtype)
            else:
                y, _ = L.conv_bn_leaky(p["backbone"]["stem"], y, train=False,
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
                                           train=False, compute_dtype=dtype)
                y, _ = darknet._res_stage(stage, y, nb, train=False,
                                          compute_dtype=dtype,
                                          scan_blocks=None)
                if si >= 2:
                    feats.append(y)
                if upto == f"stage{si}":
                    return jnp.sum(y.astype(jnp.float32))
            raw, _ = yolov3.apply(p["head"], tuple(feats), train=False,
                                  compute_dtype=dtype)
            return sum(jnp.sum(r.astype(jnp.float32)) for r in raw)

        return fn

    segments = ["stem"] + [f"stage{si}" for si in range(5)] + ["neck+heads"]

    # two pre-staged batches alternated via a traced index — the same
    # protocol as bench.py; the earlier `x + i` uint8 perturbation
    # charged an elementwise pass over the padded NHWC3 tensor to every
    # prefix (inflating exactly the early segments this tool exists to
    # split — see the tpu-bench memory / bench.py docstring)
    imgs = jnp.asarray(np.random.RandomState(0).randint(
        0, 255, (2, args.batch, size, size, 3), np.uint8))
    g_scan = args.scan_batches if on_tpu else 1

    def timed(fn):
        @functools.partial(jax.jit, static_argnames=("g",))
        def scan_fn(p, two, g):
            def body(acc, i):
                x = jax.lax.dynamic_index_in_dim(two, i % 2, 0,
                                                 keepdims=False)
                return acc + fn(p, x), None
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
        return 1000.0 * dt / (g_scan * args.iters)  # ms per batch

    cum = {}
    for seg in segments:
        cum[seg] = timed(prefix_fn(seg))
        print(f"prefix through {seg:>10}: {cum[seg]:8.3f} ms/batch",
              flush=True)

    split = {}
    prev_ms = 0.0
    for seg in segments:
        seg_ms = cum[seg] - prev_ms
        prev_ms = cum[seg]
        gf = seg_gflops[seg] * args.batch
        mfu = gf / max(seg_ms, 1e-9) / (V5E_BF16_TFLOPS * 1e3) * 1e3
        split[seg] = {"ms": round(seg_ms, 3),
                      "gflops_batch": round(gf, 1),
                      "mfu": round(mfu, 3)}
        print(f"{seg:>10}: {seg_ms:7.3f} ms  {gf:8.1f} GF  MFU={mfu:.1%}",
              flush=True)

    record = {"batch": args.batch, "input_size": size, "backend": backend,
              "cumulative_ms": {k: round(v, 3) for k, v in cum.items()},
              "split": split}
    print(json.dumps(record), flush=True)
    with open(os.path.join(HERE, "profile_stages.json"), "a") as fh:
        fh.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
