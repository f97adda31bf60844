"""FCOS GroupNorm floor experiments (VERDICT r3 next #9).

FCOS serves at ~35.6% MFU vs RetinaNet's 45%+ with identical tower
FLOPs; the difference is the GN between every tower conv: XLA can't
fuse the stats reduce into the conv kernel nor the normalize into the
stats pass, so each GN costs extra full HBM passes over the
(B, H, W, 256) activations. `ops/pallas/gn_kernel.py` fuses
bias+GN-stats+normalize+ReLU into ONE VMEM-resident pass per image.

This harness, on hardware:
  1. asserts the compiled kernel matches the pure-jax tower step
     (f32, HIGHEST) on every level shape of a 608 pyramid;
  2. times the full 2-tower FCOS head per level-set: XLA GN vs fused
     Pallas GN, bf16, batch 32 @608.

Run (TPU): python benchmarks/fcos_gn_experiments.py
Appends one JSON line to benchmarks/fcos_gn_experiments.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def tower_xla(p, x, *, dtype):
    from mydetection_tpu.models import fcos

    return fcos._tower(p, x, compute_dtype=dtype)


def tower_pallas(p, x, *, dtype):
    from mydetection_tpu.models.layers import conv2d
    from mydetection_tpu.ops.pallas.gn_kernel import bias_gn_relu_pallas_impl

    for i in range(4):
        w = p[f"conv{i}"]
        x = conv2d(x, w["w"], compute_dtype=dtype)
        gn = p[f"gn{i}"]
        x = bias_gn_relu_pallas_impl(x, w["b"], gn["scale"], gn["bias"])
    return x


def check_exact(size: int = 608) -> dict:
    """Compiled kernel vs pure-jax tower, f32 HIGHEST, every level."""
    import jax
    import jax.numpy as jnp

    from mydetection_tpu.models import fcos

    params = fcos.init(jax.random.PRNGKey(0))["cls_tower"]
    rng = np.random.RandomState(0)
    out = {}
    with jax.default_matmul_precision("highest"):
        for h, w in fcos.level_shapes(size):
            x = jnp.asarray(rng.randn(2, h, w, 256).astype(np.float32))
            want = jax.jit(lambda p, v: tower_xla(p, v, dtype=jnp.float32)
                           )(params, x)
            got = jax.jit(lambda p, v: tower_pallas(p, v, dtype=jnp.float32)
                          )(params, x)
            d = float(jnp.max(jnp.abs(want - got)))
            out[f"P{h}x{w}_max_abs_diff"] = d
    out["ok"] = all(v <= 1e-5 for k, v in out.items() if k != "ok")
    return out


def bench(size: int = 608, batch: int = 32, iters: int = 20) -> dict:
    import jax
    import jax.numpy as jnp

    from mydetection_tpu.models import fcos

    dtype = jnp.bfloat16
    params = fcos.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.randn(batch, h, w, 256).astype(np.float32)
                         ).astype(dtype)
             for h, w in fcos.level_shapes(size)]

    def heads(p, feats, tower_fn):
        acc = 0.0
        for f in feats:
            for t in ("cls_tower", "box_tower"):
                acc += jnp.sum(tower_fn(p[t], f, dtype=dtype
                                        ).astype(jnp.float32))
        return acc

    def timeit(fn):
        j = jax.jit(lambda p, fs: heads(p, fs, fn))
        float(j(params, feats))
        float(j(params, feats))
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(iters):
            acc += float(j(params, feats))
        assert np.isfinite(acc)
        return (time.perf_counter() - t0) / iters * 1e3

    return {"xla_gn_ms": timeit(tower_xla),
            "pallas_gn_ms": timeit(tower_pallas)}


def main():
    import jax

    res = {"backend": jax.default_backend()}
    if jax.default_backend() != "tpu":
        print("# TPU-only harness; interpret-mode equality lives in "
              "tests/test_fcos.py")
        return
    res["exact"] = check_exact()
    print(json.dumps(res["exact"], indent=2))
    res.update(bench())
    print(json.dumps(res, indent=2))
    with open(os.path.join(HERE, "fcos_gn_experiments.json"), "a") as fh:
        fh.write(json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
