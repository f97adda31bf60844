"""Fused head-tower chain kernel vs XLA conv chain (VERDICT r4 next #2).

RetinaNet's 2×4-conv head towers run at ~46% MFU through XLA's
per-conv kernels (3.38 ms for the lone P3 cls conv @608/b32). The
bespoke kernel (ops/pallas/tower_kernel.py) holds the 4 layers'
weights VMEM-resident and streams one image-level slab per grid step,
running the 9-tap shifted-GEMM decomposition back-to-back on the MXU
with zero inter-conv HBM traffic.

On hardware this harness:
  1. asserts the COMPILED kernel matches the pure-jax chain on every
     level shape (bf16 tolerance — the kernel's f32 epilogue differs
     from XLA's bf16 conv-output rounding);
  2. times the full 2-branch RetinaNet tower set (5 levels × 2
     branches, batch 32 @608): XLA chain vs fused chain;
  3. times the two paths per level, to show where the win/loss lives.

Run (TPU): python benchmarks/tower_kernel_bench.py
Appends one JSON line to benchmarks/tower_kernel_bench.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def _stack(p):
    import jax.numpy as jnp

    ws = jnp.stack([p[f"conv{i}"]["w"] for i in range(4)])
    bs = jnp.stack([p[f"conv{i}"]["b"] for i in range(4)])
    return ws, bs


def chain_xla(p, x, *, dtype):
    import jax.numpy as jnp

    from mydetection_tpu.models.layers import conv2d

    for i in range(4):
        w = p[f"conv{i}"]
        x = conv2d(x, w["w"], compute_dtype=dtype) + w["b"].astype(dtype)
        x = jnp.maximum(x, 0.0)
    return x


def chain_pallas(p, x, *, dtype):
    from mydetection_tpu.ops.pallas.tower_kernel import (
        conv3x3_chain_pallas_impl,
    )

    ws, bs = _stack(p)
    return conv3x3_chain_pallas_impl(x.astype(dtype), ws, bs)


def check_close(size: int = 608, batch: int = 2) -> dict:
    import jax
    import jax.numpy as jnp

    from mydetection_tpu.models import retinanet

    params = retinanet.init(jax.random.PRNGKey(0), 80)["cls"]
    rng = np.random.RandomState(0)
    out = {}
    # HIGHEST so both the XLA convs and the kernel's dot_generals run
    # true-f32 (at DEFAULT both decompose f32 into bf16 MXU passes,
    # with different pass structures — measured 1.6e-3 rel divergence
    # that is precision-pass rounding, not a kernel bug; the serving
    # dtype is bf16 anyway)
    # P3 (76x76) in f32 exceeds physical VMEM (142 MB needed of 128 —
    # the f32 working set doubles every temp); parity is checked on
    # shapes that exercise the same border/offset paths, and P3 itself
    # runs in the bf16 bench below (~half the footprint).
    shapes = [(h, w) for h, w in retinanet.level_shapes(size)
              if h * w <= 48 * 48] + [(40, 40), (48, 33)]
    with jax.default_matmul_precision("highest"):
        for h, w in shapes:
            x = jnp.asarray(rng.randn(batch, h, w, 256).astype(np.float32))
            a = jax.jit(lambda p, x: chain_xla(p, x, dtype=jnp.float32))(
                params, x)
            b = jax.jit(lambda p, x: chain_pallas(p, x, dtype=jnp.float32))(
                params, x)
            scale = float(jnp.max(jnp.abs(a))) + 1e-8
            d = float(jnp.max(jnp.abs(a - b))) / scale
            out[f"{h}x{w}"] = round(d, 9)
            assert d < 1e-5, (h, w, d)
    return out


def bench(size: int = 608, batch: int = 32, iters: int = 20) -> dict:
    import jax
    import jax.numpy as jnp

    from mydetection_tpu.models import retinanet

    dtype = jnp.bfloat16
    params = retinanet.init(jax.random.PRNGKey(0), 80)
    rng = np.random.RandomState(0)
    shapes = retinanet.level_shapes(size)
    feats = [jnp.asarray(rng.randn(batch, h, w, 256).astype(np.float32)
                         ).astype(dtype) for h, w in shapes]

    def heads(p, feats, chain_fn):
        acc = 0.0
        for f in feats:
            for br in ("cls", "box"):
                acc += jnp.sum(chain_fn(p[br], f, dtype=dtype
                                        ).astype(jnp.float32))
        return acc

    def timeit(fn, feats_subset):
        j = jax.jit(lambda p, fs: heads(p, fs, fn))
        float(j(params, feats_subset))
        float(j(params, feats_subset))
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(iters):
            acc += float(j(params, feats_subset))
        assert np.isfinite(acc)
        return (time.perf_counter() - t0) / iters * 1e3

    res = {"xla_chain_ms": timeit(chain_xla, feats),
           "pallas_chain_ms": timeit(chain_pallas, feats)}
    per_level = {}
    for (h, w), f in zip(shapes, feats):
        per_level[f"{h}x{w}"] = {
            "xla_ms": round(timeit(chain_xla, [f]), 3),
            "pallas_ms": round(timeit(chain_pallas, [f]), 3),
        }
    res["per_level"] = per_level
    return res


def main():
    import jax

    res = {"backend": jax.default_backend()}
    if jax.default_backend() != "tpu":
        print("# TPU-only harness; interpret-mode equality lives in "
              "tests/test_retinanet.py")
        return
    res["close"] = check_close()
    print(json.dumps(res["close"], indent=2), flush=True)
    res.update(bench())
    print(json.dumps(res, indent=2))
    with open(os.path.join(HERE, "tower_kernel_bench.json"), "a") as fh:
        fh.write(json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
