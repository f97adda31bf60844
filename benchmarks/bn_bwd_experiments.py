"""Fused conv+BN-train+leaky BACKWARD experiments (VERDICT r3 next #6).

The S2D early chain's backward is HBM-bound: chain_bwd_experiments
measured fwd 8.2 ms / train fwd+bwd 22.6 / eval-BN fwd+bwd 14.7 at
batch 32 @416, so train-mode BN adds ~7.9 ms of backward traffic. The
README flagged a fused conv+BN+leaky backward as the remaining lever
(~10% of the yolov3 train step).

Before writing a Pallas conv backward, this measures the cheaper
intermediate: a `custom_vjp` for the BN-train+leaky epilogue whose
hand-written backward needs exactly one reduction pass (dβ, dγ from
(dz, x̂) — both ride one read) and one elementwise pass
(du = rstd·γ·(dz − dβ/N − x̂·dγ/N)), saving x̂ in bf16 instead of the
conv output. Autodiff through jnp.mean/jnp.var builds a larger
reduce/rematerialize graph; if XLA already fuses it to the same
traffic this is a recorded negative.

Variants (value_and_grad over a scalarized 4-layer conv chain,
bench.py two-buffer scan protocol):
  autodiff   conv → batch_norm(train=True) → leaky, plain autodiff
  fused      conv → bn_leaky_train_fused (custom_vjp)
  evalbn     conv → batch_norm(train=False) → leaky (traffic floor)

RESULT — recorded NEGATIVE (v5e, batch 32, 208², C=128, 4 layers):
evalbn 56.66 ms, autodiff 61.48, fused 60.59. Train-BN adds 4.8 ms of
backward over the eval-BN floor and the hand-fused two-pass backward
recovers only 0.9 ms (19%) of it — XLA's autodiff already fuses the
BN reductions close to their traffic floor. Gradients agree with
autodiff to 1e-6 relative in f32 (the in-run bf16 4-layer comparison
shows only compounded rounding noise), so the experiment measured the
real thing. Remaining upside for a Pallas conv+BN+leaky backward is
bounded by the 4.8 ms margin on a ~61 ms chain step (<8%), with the
conv backward itself — where XLA's emitter is strongest — making up
the rest; not worth the engineering risk. NOT integrated.

Run (TPU): python benchmarks/bn_bwd_experiments.py
Appends one JSON line to benchmarks/bn_bwd_experiments.json.
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

BN_EPS = 1e-5


def _make_fused():
    import jax
    import jax.numpy as jnp

    def _fwd(u, scale, bias):
        uf = u.astype(jnp.float32)
        axes = tuple(range(u.ndim - 1))
        mean = jnp.mean(uf, axis=axes)
        var = jnp.var(uf, axis=axes)
        rstd = jax.lax.rsqrt(var + BN_EPS)
        xhat = ((uf - mean) * rstd).astype(u.dtype)
        z = xhat * scale.astype(u.dtype) + bias.astype(u.dtype)
        return jnp.where(z > 0, z, 0.1 * z), (xhat, scale, bias, rstd)

    @jax.custom_vjp
    def bn_leaky_train(u, scale, bias):
        return _fwd(u, scale, bias)[0]

    def fwd_rule(u, scale, bias):
        # residuals: x̂ in the compute dtype (bf16) — not the raw conv
        # output — plus the tiny per-channel vectors
        return _fwd(u, scale, bias)

    def bwd_rule(res, dy):
        xhat, scale, bias, rstd = res
        axes = tuple(range(dy.ndim - 1))
        n = 1
        for a in axes:
            n *= dy.shape[a]
        # leaky gate recomputed from x̂ (elementwise, fuses into pass 1)
        z = xhat * scale.astype(xhat.dtype) + bias.astype(xhat.dtype)
        dz = jnp.where(z > 0, dy, 0.1 * dy).astype(jnp.float32)
        xf = xhat.astype(jnp.float32)
        # ONE reduction pass: both sums read the same (dz, x̂) tiles
        dbeta = jnp.sum(dz, axis=axes)
        dgamma = jnp.sum(dz * xf, axis=axes)
        # ONE elementwise pass — using mean(dx̂)=γ·dβ/N, mean(dx̂·x̂)=γ·dγ/N
        du = (rstd * scale) * (dz - dbeta / n - xf * (dgamma / n))
        return du.astype(xhat.dtype), dgamma, dbeta

    bn_leaky_train.defvjp(fwd_rule, bwd_rule)
    return bn_leaky_train


def main() -> None:
    import jax
    import jax.numpy as jnp

    from mydetection_tpu.models.layers import (batch_norm, conv2d,
                                               leaky_relu)

    backend = jax.default_backend()
    dtype = jnp.bfloat16 if backend == "tpu" else jnp.float32
    # the S2D early-chain regime: big spatial, low-ish channels
    batch, s, c = 32, 208, 128
    layers = 4
    rng = np.random.RandomState(0)
    # generate ON DEVICE: a host-staged (32,208,208,128) f32 exceeds
    # the axon transport's request-body limit (HTTP 413)
    x0 = jax.jit(lambda k: jax.random.normal(
        k, (batch, s, s, c), jnp.float32).astype(dtype))(
        jax.random.PRNGKey(0))
    params = {
        f"l{i}": {
            "w": jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32) * 0.05),
            "scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32),
            "mean": jnp.zeros((c,), jnp.float32),
            "var": jnp.ones((c,), jnp.float32),
        } for i in range(layers)
    }
    fused = _make_fused()

    def chain(p, x, mode):
        for i in range(layers):
            l = p[f"l{i}"]
            u = conv2d(x, l["w"].astype(dtype), compute_dtype=dtype)
            if mode == "autodiff":
                y, _ = batch_norm(u, l, train=True)
                x = leaky_relu(y)
            elif mode == "fused":
                x = fused(u, l["scale"], l["bias"])
            else:  # evalbn
                y, _ = batch_norm(u, l, train=False)
                x = leaky_relu(y)
        return jnp.sum(x.astype(jnp.float32))

    def timeit(mode, iters=20):
        @jax.jit
        def step(p, x):
            loss, g = jax.value_and_grad(lambda pp: chain(pp, x, mode))(p)
            return loss + sum(jnp.sum(l["w"]) for l in g.values())

        float(step(params, x0))
        float(step(params, x0))
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(iters):
            acc += float(step(params, x0))
        assert np.isfinite(acc)
        return (time.perf_counter() - t0) / iters * 1e3

    # gradient equality first (same dtype/backend as the bench).
    # x0 must be an ARGUMENT — closing over it bakes a 350 MB constant
    # into the HLO and the remote-compile endpoint rejects the body.
    def grads(mode):
        return jax.jit(jax.grad(
            lambda pp, x: chain(pp, x, mode)))(params, x0)

    ga, gf = grads("autodiff"), grads("fused")
    import jax.tree_util as jtu

    rel = max(float(jnp.max(jnp.abs(a - b)) /
                    (jnp.max(jnp.abs(a)) + 1e-9))
              for a, b in zip(jtu.tree_leaves(ga), jtu.tree_leaves(gf)))
    res = {"backend": backend, "batch": batch, "spatial": s, "channels": c,
           "layers": layers, "grad_max_rel_diff": rel}
    print(f"# grad max rel diff fused vs autodiff: {rel:.2e}", flush=True)
    if backend == "tpu":
        for mode in ("evalbn", "autodiff", "fused"):
            res[f"{mode}_ms"] = round(timeit(mode), 3)
            print(f"# {mode}: {res[f'{mode}_ms']} ms", flush=True)
    print(json.dumps(res))
    with open(os.path.join(HERE, "bn_bwd_experiments.json"), "a") as fh:
        fh.write(json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
