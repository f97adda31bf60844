"""Benchmark harness: images/sec/chip at batch 32, YOLOv3-416.

The driver runs this on real TPU hardware at the end of every round
and records the single JSON line it prints (BASELINE.json north-star:
≥5× CPU-reference images/sec/chip at batch 32 on the detect pipeline).

Measures the FUSED device pipeline — uint8 batch in → normalize →
Darknet-53 → YOLOv3 heads → dense decode (single-label, 3-D layout) →
padded top-k → class-wise Pallas NMS → padded detections out.

Dispatch amortization: each jitted call runs `scan_batches` batches via
`lax.scan`; the body alternates between TWO distinct device-resident
batches via a traced index, so every iteration reads a fresh batch
from HBM (as a production server would) and XLA cannot hoist the
loop-invariant pipeline out of the scan. This matters on the axon
remote-TPU transport, where every executable dispatch costs a ~30 ms
host↔TPU round-trip (measured: a trivial `sum(x*2)` takes 30.4 ms wall
at any software-pipeline depth) — single-batch dispatch measures the
tunnel, not the chip, and even the r2 default of scan(10) left a ~3 ms
(~12%) residual dispatch floor inside every per-batch number. scan(40)
bounds it at <1 ms while keeping each dispatch well under the 60 s
transport watchdog. (The r2 protocol's `x + i` uint8 perturbation also
charged an elementwise pass over the padded-layout NHWC3 tensor to the
pipeline; indexing pre-staged batches removes that artifact.)

Timing is fetch-forced: a scalar reduced from EVERY iteration's output
is pulled to host inside the timed region (`block_until_ready` alone
returns early through the tunnel). Host letterbox/JPEG decode is
excluded here; its overlap with device compute is proven separately by
the streaming harness (benchmarks/streaming.py).

vs_baseline = measured images/sec ÷ the CPU-reference throughput in
benchmarks/cpu_baseline.json (same pipeline, CPU backend — the
reference repo itself was not runnable, SURVEY.md §0/§6). Target ≥5.

Noise band: ±1% run-to-run on the axon transport (measured across the
r2–r4 repeated captures; e.g. 1751 → 1738.6 img/s r3→r4 with no change
on the flagship path). Round-over-round deltas under ~2% are within
noise; treat only larger moves as signal.
"""

from __future__ import annotations

import functools
import json
import os
import time

import numpy as np


def main(batch: int = 32, iters: int = 5, input_size: int = 416,
         scan_batches: int = 40) -> None:
    import jax
    import jax.numpy as jnp

    from mydetection_tpu.ops.nms import postprocess_impl
    from mydetection_tpu.registry import get_model

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    if not on_tpu:
        scan_batches = 1  # no dispatch floor to amortize off-TPU
    model = get_model("yolov3",
                      compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    params = model.init(jax.random.PRNGKey(0))

    def detect(p, x):
        dense, _ = model.forward_dense(p, x)
        out = jax.vmap(lambda d: postprocess_impl(
            d["boxes"], d["scores"], classes=d.get("classes"),
            conf_thres=0.3, iou_thres=0.45, use_pallas=on_tpu,
            multi_label=model.config.multi_label,
            approx_topk=model.config.approx_topk))(dense)
        # scalar checksum: forces the full chain when fetched
        return jnp.sum(out["scores"]) + jnp.sum(out["boxes"])

    @functools.partial(jax.jit, static_argnames=("g",))
    def detect_scan(p, two, g):
        def body(acc, i):
            # alternate two real batches via a traced index: fresh HBM
            # read per iteration, nothing loop-invariant to hoist
            x = jax.lax.dynamic_index_in_dim(two, i % 2, 0, keepdims=False)
            return acc + detect(p, x), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(g))
        return acc

    imgs = jnp.asarray(np.random.RandomState(0).randint(
        0, 255, (2, batch, input_size, input_size, 3), np.uint8))

    float(detect_scan(params, imgs, scan_batches))  # compile + warm
    float(detect_scan(params, imgs, scan_batches))

    # depth-2 software pipeline: dispatch iteration i+1 before fetching
    # i's checksum. Every iteration's checksum IS fetched in the timed
    # region.
    t0 = time.perf_counter()
    acc = 0.0
    prev = None
    for _ in range(iters):
        out = detect_scan(params, imgs, scan_batches)
        if prev is not None:
            acc += float(prev)
        prev = out
    acc += float(prev)
    dt = time.perf_counter() - t0
    assert np.isfinite(acc)
    ips = batch * scan_batches * iters / dt

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
    }), flush=True)


# The driver records the LAST printed line as the headline metric, so
# the flagship yolov3 line must always print last — the extra family /
# int8 lines run first under a wall-clock budget: if they overrun
# (slow compiles, transport hiccups), they're skipped rather than
# risking the driver's own timeout cutting the run before the
# flagship line lands.
_EXTRAS_BUDGET_S = float(os.environ.get("MYDET_BENCH_EXTRAS_BUDGET", 600))
_T_START = time.time()


def _over_budget(label: str) -> bool:
    elapsed = time.time() - _T_START
    if elapsed > _EXTRAS_BUDGET_S:
        print(f"# skipping {label}: extras budget exhausted "
              f"({elapsed:.0f}s > {_EXTRAS_BUDGET_S:.0f}s)", flush=True)
        return True
    return False


def _family_lines() -> None:
    """One JSON line per non-flagship family (retinanet@608, fcos@608,
    rapid@1024) so BENCH_r*.json tracks regressions on every hot path,
    not just yolov3 (VERDICT r2 #8). TPU-only (CPU would take hours);
    each family is individually guarded so a failure can't block the
    flagship line. Printed BEFORE the flagship line — the driver parses
    the LAST line as the headline metric."""
    import jax

    if jax.default_backend() != "tpu":
        print("# skipping per-family bench lines (backend="
              f"{jax.default_backend()}): TPU-only — this bench file is "
              "PARTIAL", flush=True)
        return
    import traceback

    from benchmarks.device_bench import bench_model

    for name, size in (("retinanet", 608), ("fcos", 608), ("rapid", 1024),
                       ("retinanet_r101", 608)):
        if _over_budget(f"{name}-{size}"):
            continue
        try:
            row = bench_model(name, input_size=size, batch=32, iters=4)
            print(json.dumps({
                "metric": (f"{name}-{size} detect images/sec/chip "
                           f"@ batch 32 ({row['backend']})"),
                "value": row["images_per_sec_per_chip"],
                "unit": "images/sec/chip",
                "vs_baseline": None,
            }), flush=True)
        except Exception:
            traceback.print_exc()


def _numerics_line() -> None:
    """Device-side numerics validation (SURVEY.md §4.2 second leg):
    Pallas-vs-oracle NMS keep-mask equality + e2e goldens recomputed
    through the device pipeline, COMPILED on the TPU (the test suite
    only ever runs these in CPU/interpret mode). Prints value 1.0 only
    if every check passed; 0.0 (plus the failing detail on a comment
    line) otherwise. Full sweep: benchmarks/device_checks.py."""
    import jax

    if jax.default_backend() != "tpu":
        print("# skipping device numerics line (backend="
              f"{jax.default_backend()}): TPU-only — this bench file is "
              "PARTIAL", flush=True)
        return
    import traceback

    if _over_budget("device-numerics"):
        return
    try:
        from benchmarks.device_checks import run as numerics_run

        res = numerics_run(quick=True)
        if not res["ok"]:
            print("# DEVICE NUMERICS FAILURE: " + json.dumps(res), flush=True)
        print(json.dumps({
            "metric": ("device numerics_ok (pallas-vs-oracle NMS + e2e "
                       "goldens, compiled on tpu)"),
            "value": 1.0 if res["ok"] else 0.0,
            "unit": "bool",
            "vs_baseline": None,
        }), flush=True)
    except Exception:
        traceback.print_exc()


def _int8_line() -> None:
    """Opt-in int8 PTQ serving-path number (quant.py) as an extra
    tracked line. The float flagship stays the headline (last line) —
    int8 is not mAP-neutral, so the apples-to-apples number vs the
    float CPU reference is the bf16 one. TPU-only, guarded."""
    import jax

    if jax.default_backend() != "tpu":
        print("# skipping int8 bench line (backend="
              f"{jax.default_backend()}): TPU-only — this bench file is "
              "PARTIAL", flush=True)
        return
    import traceback

    from benchmarks.quant_bench import bench as quant_bench

    if _over_budget("yolov3-416-int8"):
        return
    try:
        row = quant_bench("yolov3", 416, 32, iters=4, modes=("int8",))
        print(json.dumps({
            "metric": "yolov3-416 int8-PTQ images/sec/chip @ batch 32 (tpu)",
            "value": row["int8"],
            "unit": "images/sec/chip",
            "vs_baseline": None,
        }), flush=True)
    except Exception:
        traceback.print_exc()


if __name__ == "__main__":
    _numerics_line()
    _family_lines()
    _int8_line()
    main()
