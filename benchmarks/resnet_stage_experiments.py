"""Fused-bottleneck Pallas kernels vs the XLA conv chain — NEGATIVE.

profile_resnet.py shows ResNet stage0 (152², C 64/256) at ~23% MFU and
stage1 (76², C 512/128) at ~38% on v5e — both HBM-bound: XLA
round-trips every conv's output through HBM (~1.1 GB/block at stage1),
so a VMEM-resident fused block (read x once, write out once) has a
~2.5x traffic headroom on paper. Measured, it does NOT materialize:

  stage0   (3 blocks, batch 32):  XLA 9.85 ms   fused 8.52-9.46 ms
  stage1_s1 (3 blocks, batch 32): XLA 4.27 ms   fused 7.24-7.71 ms
  stage1 im2col variant:                        8.35-8.46 ms

Strip heights 4..152 (whole image; v5e's VMEM holds >=120 MB, probed)
all land within ~10% of each other, so per-step pipeline overhead is
not the limiter — the in-kernel conv formulations are: both the
nine shifted (Hs·W, Cm)x(Cm, Cm) MXU matmuls and the single-deep-K
im2col matmul (K=9·Cm, lane-aligned for Cm=128) run the MXU at ~22%,
vs the ~37% XLA's native conv emitter sustains at the same shapes,
which swamps the HBM savings. This matches the round-3 negative on
fused *residual* Pallas kernels at darknet shapes (README): Mosaic's
matmul pipeline cannot express the deeper kh·kw·Cin contraction +
spatial-tile double buffering XLA's conv emitter schedules. stage0's
~13% fused win is real but is 1.3 ms on a 56 ms batch — not worth a
second convolution codepath; the production graph keeps XLA convs.

The kernels live inline below so the experiment stays reproducible.
Run (TPU): python benchmarks/resnet_stage_experiments.py
Appends JSON lines to resnet_stage_experiments.json.
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
sys.path.insert(0, os.path.dirname(HERE))

BN_EPS = 1e-5


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--scan-batches", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mydetection_tpu.models import resnet
    from mydetection_tpu.models.layers import KeyGen

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    g_scan = args.scan_batches if on_tpu else 1
    b = args.batch if on_tpu else 2
    interp = not on_tpu

    def fold(p):
        w = p["conv"]["w"]
        bn = p["bn"]
        s = bn["scale"] * jax.lax.rsqrt(bn["var"] + BN_EPS)
        return w * s[None, None, None, :], (bn["bias"] - bn["mean"] * s
                                            ).astype(jnp.float32)

    def fused_block(x, w1, b1, w2, b2, w3, b3, wd=None, bd=None, *,
                    hs, im2col=False):
        """Stride-1 bottleneck, VMEM-resident intermediates, 1-row halo
        via clamped single-row BlockSpecs (masked at image edges)."""
        bsz, h, w, c_in = x.shape
        c_mid = w1.shape[-1]
        c_out = w3.shape[-1]
        has_down = wd is not None
        if not has_down:
            wd = jnp.zeros((1, 1), x.dtype)
            bd = jnp.zeros((1,), jnp.float32)
        w1 = w1.astype(x.dtype)
        w2k = (w2.astype(x.dtype).reshape(9 * c_mid, c_mid) if im2col
               else w2.astype(x.dtype).reshape(9, c_mid, c_mid))
        w3 = w3.astype(x.dtype)
        wd = wd.astype(x.dtype)
        b1 = b1.reshape(1, c_mid)
        b2 = b2.reshape(1, c_mid)
        b3 = b3.reshape(1, c_out)
        bd = bd.reshape(1, -1)

        def kernel(x_ref, xt_ref, xb_ref, w1_r, b1_r, w2_r, b2_r, w3_r,
                   b3_r, wd_r, bd_r, out_ref, y1_scr, col_scr):
            i = pl.program_id(1)
            n_i = pl.num_programs(1)
            dt = x_ref.dtype

            def conv1(rows2d):
                y = jnp.dot(rows2d, w1_r[...],
                            preferred_element_type=jnp.float32)
                return jnp.maximum(y + b1_r[...], 0.0).astype(dt)

            xm = x_ref[0]
            y1_scr[1:hs + 1, 1:w + 1, :] = conv1(
                xm.reshape(hs * w, c_in)).reshape(hs, w, c_mid)
            top = conv1(xt_ref[0].reshape(w, c_in))
            y1_scr[0:1, 1:w + 1, :] = jnp.where(
                i > 0, top, jnp.zeros_like(top)).reshape(1, w, c_mid)
            bot = conv1(xb_ref[0].reshape(w, c_in))
            y1_scr[hs + 1:hs + 2, 1:w + 1, :] = jnp.where(
                i < n_i - 1, bot, jnp.zeros_like(bot)).reshape(1, w, c_mid)
            y1_scr[:, 0:1, :] = jnp.zeros((hs + 2, 1, c_mid), dt)
            y1_scr[:, w + 1:w + 2, :] = jnp.zeros((hs + 2, 1, c_mid), dt)

            if im2col:
                for t in range(9):
                    ki, kj = t // 3, t % 3
                    col_scr[:, t * c_mid:(t + 1) * c_mid] = \
                        y1_scr[ki:ki + hs, kj:kj + w, :].reshape(
                            hs * w, c_mid)
                acc = jnp.dot(col_scr[...], w2_r[...],
                              preferred_element_type=jnp.float32)
            else:
                acc = jnp.zeros((hs * w, c_mid), jnp.float32)
                for t in range(9):
                    ki, kj = t // 3, t % 3
                    sl = y1_scr[ki:ki + hs, kj:kj + w, :].reshape(
                        hs * w, c_mid)
                    acc = acc + jnp.dot(
                        sl, w2_r[t], preferred_element_type=jnp.float32)
            y2 = jnp.maximum(acc + b2_r[...], 0.0).astype(dt)
            out = jnp.dot(y2, w3_r[...],
                          preferred_element_type=jnp.float32) + b3_r[...]
            if has_down:
                out = out + bd_r[...] + jnp.dot(
                    xm.reshape(hs * w, c_in), wd_r[...],
                    preferred_element_type=jnp.float32)
            else:
                out = out + xm.reshape(hs * w, c_out).astype(jnp.float32)
            out_ref[0] = jnp.maximum(out, 0.0).astype(dt).reshape(
                hs, w, c_out)

        full = lambda *s: pl.BlockSpec(
            s, lambda bb, ii: (0,) * len(s), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((bsz, h, w, c_out), x.dtype),
            grid=(bsz, h // hs),
            in_specs=[
                pl.BlockSpec((1, hs, w, c_in),
                             lambda bb, ii: (bb, ii, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, w, c_in),
                             lambda bb, ii: (bb, jnp.maximum(ii * hs - 1, 0), 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, w, c_in),
                             lambda bb, ii: (bb, jnp.minimum(ii * hs + hs, h - 1), 0, 0),
                             memory_space=pltpu.VMEM),
                full(*w1.shape), full(*b1.shape), full(*w2k.shape),
                full(*b2.shape), full(*w3.shape), full(*b3.shape),
                full(*wd.shape), full(*bd.shape),
            ],
            out_specs=pl.BlockSpec((1, hs, w, c_out),
                                   lambda bb, ii: (bb, ii, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((hs + 2, w + 2, c_mid), x.dtype),
                pltpu.VMEM((hs * w, 9 * c_mid) if im2col else (8, 128),
                           x.dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interp,
        )(x, x, x, w1, b1, w2k, b2, w3, b3, wd, bd)

    def timed(fn, *xs) -> float:
        @functools.partial(jax.jit, static_argnames=("g",))
        def scan_fn(two_x, g):
            def body(acc, i):
                x = jax.lax.dynamic_index_in_dim(two_x, i % 2, 0,
                                                 keepdims=False)
                return acc + jnp.sum(fn(x).astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(g))
            return acc

        two_x = jnp.stack(xs)
        float(scan_fn(two_x, g_scan))
        float(scan_fn(two_x, g_scan))
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(args.iters):
            acc += float(scan_fn(two_x, g_scan))
        dt = time.perf_counter() - t0
        assert np.isfinite(acc)
        return 1000.0 * dt / (g_scan * args.iters)

    keys = KeyGen(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    out_path = os.path.join(HERE, "resnet_stage_experiments.json")

    stages = [
        ("stage0", 152 if on_tpu else 16, 64, 256, 3, True, 19 if on_tpu else 8),
        ("stage1_s1", 76 if on_tpu else 16, 512, 512, 3, False, 19 if on_tpu else 8),
    ]
    for name, hw, c_in, c_out, nblocks, has_down, hs in stages:
        blocks = []
        for bi in range(nblocks):
            blocks.append(resnet._bottleneck_init(
                keys, c_in if bi == 0 else c_out, c_out,
                downsample=(bi == 0 and has_down)))
            for cv in blocks[-1].values():
                bn = cv["bn"]
                bn["mean"] = jnp.asarray(rng.standard_normal(
                    bn["mean"].shape).astype(np.float32) * 0.1)
                bn["var"] = jnp.asarray(rng.uniform(
                    0.5, 2.0, bn["var"].shape).astype(np.float32))
        folded = [{k: fold(blk[k]) for k in blk} for blk in blocks]

        def xla_chain(x, _blocks=blocks):
            y = x
            for blk in _blocks:
                y, _ = resnet._bottleneck(blk, y, stride=1, train=False,
                                          compute_dtype=jnp.bfloat16)
            return y

        def mk_chain(im2col, _folded=folded, _hs=hs):
            def chain(x):
                y = x
                for f in _folded:
                    (w1, b1), (w2, b2), (w3, b3) = (
                        f["conv1"], f["conv2"], f["conv3"])
                    dargs = ()
                    if "down" in f:
                        wdv, bdv = f["down"]
                        dargs = (wdv[0, 0], bdv)
                    y = fused_block(y, w1[0, 0], b1, w2, b2, w3[0, 0],
                                    b3, *dargs, hs=_hs, im2col=im2col)
                return y
            return chain

        x0 = jnp.asarray(rng.standard_normal(
            (b, hw, hw, c_in)).astype(np.float32)).astype(jnp.bfloat16)
        x1 = x0 + jnp.asarray(0.01, jnp.bfloat16)

        ref = np.asarray(xla_chain(x0[:1]).astype(jnp.float32))
        for variant, chain in (("fused", mk_chain(False)),
                               ("im2col", mk_chain(True))):
            got = np.asarray(chain(x0[:1]).astype(jnp.float32))
            rel = float(np.abs(ref - got).max()) / max(
                1e-6, float(np.abs(ref).max()))
            assert rel < 0.05, f"{name}/{variant} diverged: {rel}"

        row = {"stage": name, "batch": b, "hw": hw, "hs": hs,
               "backend": backend, "ms": {}}
        row["ms"]["xla"] = round(timed(xla_chain, x0, x1), 3)
        row["ms"]["fused"] = round(timed(mk_chain(False), x0, x1), 3)
        row["ms"]["im2col"] = round(timed(mk_chain(True), x0, x1), 3)
        print(json.dumps(row))
        with open(out_path, "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
