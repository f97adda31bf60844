"""Measure the CPU-reference throughput denominator for bench.py.

BASELINE.json's north-star is "≥5× CPU-reference images/sec/chip at
batch 32". The reference repo could not be run (mount empty, no
network — SURVEY.md §0), so the CPU reference is THIS framework's own
detect pipeline executed on the CPU backend: same model (YOLOv3@416),
same batch-32 pipeline, float32 (CPU has no bf16 units). The measured
number is committed to benchmarks/cpu_baseline.json and read by
bench.py as the vs_baseline denominator.

Run: python benchmarks/cpu_baseline.py
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if "_MYDET_CPU_BENCH" not in os.environ:
    env = dict(os.environ, _MYDET_CPU_BENCH="1", JAX_PLATFORMS="cpu",
               PALLAS_AXON_POOL_IPS="",
               PYTHONPATH=_REPO_ROOT + ":" + os.environ.get("PYTHONPATH", ""))
    os.execvpe(sys.executable, [sys.executable, *sys.argv], env)
sys.path.insert(0, _REPO_ROOT)

import jax
import jax.numpy as jnp
import numpy as np


def main(batch: int = 32, iters: int = 5, input_size: int = 416):
    from mydetection_tpu.registry import get_model
    from mydetection_tpu.ops.nms import postprocess

    model = get_model("yolov3", compute_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    fwd = jax.jit(lambda p, x: model.forward_dense(p, x)[0])
    post = jax.jit(lambda b, s: jax.vmap(
        lambda bb, ss: postprocess(bb, ss, conf_thres=0.3, iou_thres=0.45,
                                   use_pallas=False))(b, s))
    imgs = jnp.asarray(np.random.RandomState(0).randint(
        0, 255, (batch, input_size, input_size, 3), np.uint8))

    def run():
        dense = fwd(params, imgs)
        return post(dense["boxes"], dense["scores"])

    jax.block_until_ready(run())  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run()
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    ips = batch * iters / dt
    result = {
        "cpu_images_per_sec": ips,
        "batch": batch,
        "input_size": input_size,
        "backend": jax.default_backend(),
        "host_cpus": os.cpu_count(),
    }
    out_path = os.path.join(os.path.dirname(__file__), "cpu_baseline.json")
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
