"""Isolate the early-chain BACKWARD cost (profile_train_bwd.py measured
22.9 ms fwd+bwd for stem..stage1.down at batch 32 @416 — ~10x its fair
3x-FLOPs cost; the whole train step is 87 ms).

Variants timed (value_and_grad w.r.t. params, scalarized output, same
two-buffer scan protocol as bench.py):
  s2d_train      shipped S2D chain, train-mode BN (the 22.9 ms path)
  s2d_eval       S2D chain, eval BN (isolates _bn_s2d_train's backward)
  std_train      standard stem/down/res/down chain, train-mode BN
  std_eval       standard chain, eval BN
  s2d_fwd        forward only (no grad) of s2d_train — chain fwd floor

Run (TPU): python benchmarks/chain_bwd_experiments.py
Appends one JSON line to benchmarks/chain_bwd_experiments.json.
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


def main() -> None:
    import jax
    import jax.numpy as jnp

    from mydetection_tpu.models import darknet, layers as L
    from mydetection_tpu.registry import get_model

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    batch, size = 32, 416
    model = get_model("yolov3", input_size=size, compute_dtype=dtype)
    params = model.init(jax.random.PRNGKey(0))["backbone"]

    def std_chain(p, x, train):
        y, _ = L.conv_bn_leaky(p["stem"], x, train=train,
                               compute_dtype=dtype)
        s0, s1 = p["stage0"], p["stage1"]
        y, _ = L.conv_bn_leaky(s0["down"], y, stride=2, train=train,
                               compute_dtype=dtype)
        r, _ = L.conv_bn_leaky(s0["res0"]["conv1"], y, train=train,
                               compute_dtype=dtype)
        r, _ = L.conv_bn_leaky(s0["res0"]["conv2"], r, train=train,
                               compute_dtype=dtype)
        y = y + r
        y, _ = L.conv_bn_leaky(s1["down"], y, stride=2, train=train,
                               compute_dtype=dtype)
        return y

    def s2d_chain(p, x, train):
        out = darknet._early_s2d(p, x, compute_dtype=dtype, train=train)
        return out[0] if train else out

    def make_fn(chain, train):
        def fn(p, x):
            y = L.normalize_input(x, dtype)
            y = chain(p, y, train)
            return jnp.sum(y.astype(jnp.float32))
        return fn

    imgs = jnp.asarray(np.random.RandomState(0).randint(
        0, 255, (2, batch, size, size, 3), np.uint8))
    g_scan = 20 if on_tpu else 1

    def timed(fn, with_grad=True):
        @functools.partial(jax.jit, static_argnames=("g",))
        def scan_fn(p, two, g):
            def body(acc, i):
                x = jax.lax.dynamic_index_in_dim(two, i % 2, 0,
                                                 keepdims=False)
                if with_grad:
                    val, grads = jax.value_and_grad(fn)(p, x)
                    gsum = sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                               for l in jax.tree_util.tree_leaves(grads))
                    val = val + 1e-12 * gsum
                else:
                    val = fn(p, x)
                return acc + val, None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(g))
            return acc

        float(scan_fn(params, imgs, g_scan))
        float(scan_fn(params, imgs, g_scan))
        iters = 4
        t0 = time.perf_counter()
        acc, prev = 0.0, None
        for _ in range(iters):
            out = scan_fn(params, imgs, g_scan)
            if prev is not None:
                acc += float(prev)
            prev = out
        acc += float(prev)
        dt = time.perf_counter() - t0
        assert np.isfinite(acc)
        return round(1000.0 * dt / (g_scan * iters), 3)

    res = {}
    res["s2d_fwd"] = timed(make_fn(s2d_chain, True), with_grad=False)
    res["s2d_train"] = timed(make_fn(s2d_chain, True))
    res["s2d_eval"] = timed(make_fn(s2d_chain, False))
    res["std_train"] = timed(make_fn(std_chain, True))
    res["std_eval"] = timed(make_fn(std_chain, False))
    row = {"batch": batch, "input_size": size, "backend": backend,
           "ms_per_batch": res}
    out = os.path.join(HERE, "chain_bwd_experiments.json")
    with open(out, "a") as fh:
        fh.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
