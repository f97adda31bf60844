"""Benchmark harness: images/sec/chip at batch 32, YOLOv3-416.

The driver runs this on real TPU hardware at the end of every round
and records the single JSON line it prints (BASELINE.json north-star:
≥5× CPU-reference images/sec/chip at batch 32 on the detect pipeline).

Measures the FUSED device pipeline — uint8 batch in → normalize →
Darknet-53 → YOLOv3 heads → dense decode → padded top-k → class-wise
Pallas NMS → padded detections out — as one XLA executable per call.
One executable matters on this transport: the axon remote-TPU tunnel
materializes every executable's outputs on the host, so a split
pipeline would ship the ~115 MB dense tensor per batch.

Timing is fetch-forced: a scalar reduced from EVERY iteration's output
is pulled to host inside the timed region (`block_until_ready` alone
returns early through the tunnel — measured 26 k img/s "throughput",
4× over chip peak FLOPs, i.e. a lie). Host letterbox/JPEG decode is
excluded here; its overlap with device compute is proven separately by
the streaming harness (benchmarks/streaming.py).

vs_baseline = measured images/sec ÷ the CPU-reference throughput in
benchmarks/cpu_baseline.json (same pipeline, CPU backend — the
reference repo itself was not runnable, SURVEY.md §0/§6). Target ≥5.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main(batch: int = 32, iters: int = 20, input_size: int = 416) -> None:
    import jax
    import jax.numpy as jnp

    from mydetection_tpu.ops.nms import postprocess_impl
    from mydetection_tpu.registry import get_model

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    model = get_model("yolov3",
                      compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    params = model.init(jax.random.PRNGKey(0))

    @jax.jit
    def detect(p, x):
        dense, _ = model.forward_dense(p, x)
        out = jax.vmap(lambda b, s: postprocess_impl(
            b, s, conf_thres=0.3, iou_thres=0.45,
            use_pallas=on_tpu))(dense["boxes"], dense["scores"])
        # scalar checksum: forces the full chain when fetched
        out["checksum"] = jnp.sum(out["scores"]) + jnp.sum(out["boxes"])
        return out

    imgs = jnp.asarray(np.random.RandomState(0).randint(
        0, 255, (batch, input_size, input_size, 3), np.uint8))

    float(detect(params, imgs)["checksum"])  # compile + warm
    float(detect(params, imgs)["checksum"])

    # depth-2 software pipeline: dispatch iteration i+1 before fetching
    # i's checksum, overlapping upload/compute with the host fetch.
    # Every iteration's checksum IS fetched inside the timed region.
    t0 = time.perf_counter()
    acc = 0.0
    prev = None
    for _ in range(iters):
        out = detect(params, imgs)
        if prev is not None:
            acc += float(prev)
        prev = out["checksum"]
    acc += float(prev)
    dt = time.perf_counter() - t0
    assert np.isfinite(acc)
    ips = batch * iters / dt

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "benchmarks", "cpu_baseline.json")
    vs = None
    if os.path.exists(base_path):
        with open(base_path) as fh:
            cpu_ips = json.load(fh)["cpu_images_per_sec"]
        vs = ips / cpu_ips
    print(json.dumps({
        "metric": f"yolov3-416 detect images/sec/chip @ batch {batch} ({backend})",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
