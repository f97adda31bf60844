"""Small-batch serving latency sweep: device ms/image per family.

Throughput (bench.py, batch 32) is the north-star, but serving users
also care about single-stream latency. This sweep runs every family at
batch ∈ {1, 4, 8, 32} through the same fused detect pipeline and scan
protocol as device_bench.bench_model (dispatch amortization included —
on the axon transport a raw dispatch costs ~30 ms, so per-batch device
time must come from a deep lax.scan, see bench.py docstring).

`device_ms_per_batch` at batch 1 IS the steady-state per-image device
latency (host letterbox/JPEG excluded; those are measured by
benchmarks/streaming.py). Results append to latency_bench.json, one
JSON object per line.

Reference scope note: the PyTorch reference (SURVEY.md §3.2) has no
latency harness; its demo prints ad-hoc FPS. This harness is the
TPU-native equivalent with fetch-forced timing.
"""

from __future__ import annotations

import json
import os

CASES = (
    ("yolov3", 416),
    ("retinanet", 608),
    ("fcos", 608),
    ("rapid", 1024),
)

BATCHES = (1, 4, 8, 32)


def main() -> None:
    from benchmarks.device_bench import bench_model

    out_path = os.path.join(os.path.dirname(__file__), "latency_bench.json")
    rows = []
    for name, size in CASES:
        for batch in BATCHES:
            # keep each timed dispatch a few seconds long: deep scans for
            # tiny batches (cheap per iter), shallower for rapid@1024
            scan = max(8, min(200, 4096 // (batch * (size // 416) ** 2)))
            row = bench_model(name, input_size=size, batch=batch,
                              iters=4, scan_batches=scan)
            row["ms_per_image"] = round(
                row["device_ms_per_batch"] / batch, 3)
            rows.append(row)
            print(json.dumps(row), flush=True)
            with open(out_path, "a") as f:
                f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
