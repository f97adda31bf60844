"""Train-mode BatchNorm variants: can single-pass statistics shave the
~4.7 ms/step the train forward pays over the dense graph (plus the
matching share of the backward)?

Variants (per representative activation shape from yolov3@416 b32):
  v0_two_pass     shipped batch_norm: jnp.mean + jnp.var (the var is a
                  dependent second pass: mean((x-mean)^2))
  v1_one_pass     E[x]/E[x^2] in one fused read; var = E[x^2]-E[x]^2.
                  Backward of the stats is elementwise in x (no
                  (x-mean) recompute pass).

Both normalize in the activation dtype with f32 stats. Numeric check:
max |y0-y1| and |var0-var1| printed per shape (post-conv activations
are O(1-10); the cancellation in E[x^2]-E[x]^2 costs ~2 of f32's 7
digits, well inside BN_EPS=1e-5 territory).

Run (TPU): python benchmarks/bn_train_experiments.py
Appends one JSON line to benchmarks/bn_train_experiments.json.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

SHAPES = [  # (B, H, W, C) spine of yolov3@416 b32 (S2D chain excluded)
    (32, 104, 104, 128),
    (32, 104, 104, 64),
    (32, 52, 52, 256),
    (32, 52, 52, 128),
    (32, 26, 26, 512),
    (32, 13, 13, 1024),
]


def main() -> None:
    import jax
    import jax.numpy as jnp

    from mydetection_tpu.models.layers import BN_EPS

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    def bn_two_pass(x, scale_p, bias_p):
        xf = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(xf, axis=axes)
        var = jnp.var(xf, axis=axes)
        scale = scale_p * jax.lax.rsqrt(var + BN_EPS)
        shift = bias_p - mean * scale
        return x * scale.astype(x.dtype) + shift.astype(x.dtype), var

    def bn_one_pass(x, scale_p, bias_p):
        xf = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        n = 1
        for a in axes:
            n *= x.shape[a]
        s1 = jnp.sum(xf, axis=axes)
        s2 = jnp.sum(xf * xf, axis=axes)
        mean = s1 / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
        scale = scale_p * jax.lax.rsqrt(var + BN_EPS)
        shift = bias_p - mean * scale
        return x * scale.astype(x.dtype) + shift.astype(x.dtype), var

    g_scan = 30 if on_tpu else 1

    def timed(fn, args, with_grad):
        def scalar(x, s, b):
            y, _ = fn(x, s, b)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        @functools.partial(jax.jit, static_argnames=("g",))
        def scan_fn(x, s, b, g):
            def body(acc, i):
                xi = x + acc * 1e-20  # loop-dependent, nothing hoists
                if with_grad:
                    val, gr = jax.value_and_grad(scalar, argnums=(0, 1, 2))(
                        xi, s, b)
                    val = val + 1e-12 * sum(
                        jnp.sum(jnp.abs(t.astype(jnp.float32)))
                        for t in gr)
                else:
                    val = scalar(xi, s, b)
                return acc + val * 1e-30, None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(g))
            return acc

        float(scan_fn(*args, g_scan))
        float(scan_fn(*args, g_scan))
        iters = 4
        t0 = time.perf_counter()
        prev = None
        for _ in range(iters):
            out = scan_fn(*args, g_scan)
            if prev is not None:
                float(prev)
            prev = out
        float(prev)
        dt = time.perf_counter() - t0
        return 1000.0 * dt / (g_scan * iters)

    rows = []
    tot = {"v0_fwd": 0.0, "v1_fwd": 0.0, "v0_fwdbwd": 0.0,
           "v1_fwdbwd": 0.0}
    for shape in SHAPES:
        c = shape[-1]
        rng = np.random.RandomState(0)
        x = jnp.asarray(3.0 * rng.randn(*shape).astype(np.float32),
                        dtype)
        s = jnp.asarray(1.0 + 0.1 * rng.randn(c).astype(np.float32))
        b = jnp.asarray(0.1 * rng.randn(c).astype(np.float32))
        y0, var0 = jax.jit(bn_two_pass)(x, s, b)
        y1, var1 = jax.jit(bn_one_pass)(x, s, b)
        dy = float(jnp.max(jnp.abs(y0.astype(jnp.float32)
                                   - y1.astype(jnp.float32))))
        dv = float(jnp.max(jnp.abs(var0 - var1)))
        r = {
            "shape": list(shape),
            "max_abs_dy": dy, "max_abs_dvar": dv,
            "v0_fwd_ms": round(timed(bn_two_pass, (x, s, b), False), 4),
            "v1_fwd_ms": round(timed(bn_one_pass, (x, s, b), False), 4),
            "v0_fwdbwd_ms": round(timed(bn_two_pass, (x, s, b), True), 4),
            "v1_fwdbwd_ms": round(timed(bn_one_pass, (x, s, b), True), 4),
        }
        tot["v0_fwd"] += r["v0_fwd_ms"]
        tot["v1_fwd"] += r["v1_fwd_ms"]
        tot["v0_fwdbwd"] += r["v0_fwdbwd_ms"]
        tot["v1_fwdbwd"] += r["v1_fwdbwd_ms"]
        print(r, flush=True)
        rows.append(r)
    print("totals:", {k: round(v, 3) for k, v in tot.items()}, flush=True)
    out = os.path.join(HERE, "bn_train_experiments.json")
    with open(out, "a") as fh:
        fh.write(json.dumps({"backend": backend, "rows": rows,
                             "totals_ms": {k: round(v, 4)
                                           for k, v in tot.items()}})
                 + "\n")


if __name__ == "__main__":
    main()
