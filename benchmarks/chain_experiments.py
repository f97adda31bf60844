"""Microbenchmark CANDIDATE rewrites of the S2D early chain.

Context (benchmarks/stem_experiments.json, v5e, batch 32 @416): the
shipped S2D chain (stem..stage1.down) measures 5.16 ms incl. the
0.74 ms scan floor -> ~4.4 ms net, 2x faster than the standard path
(10.7 ms). But the phase-folded weights are DENSE with 75% zero
blocks: the two 3x3 S2D convs and the 1x1 block-diagonal compute 4x
the original FLOPs (real chain FLOPs ~539 GFLOP/batch -> 2.7 ms
roofline, so the dense chain already runs at ~76% MFU of its own
inflated FLOPs). Candidates below cut the inflation:

  * split33 — an S2D 3x3 conv decomposes EXACTLY into 4 convs, one per
    input phase q=(qi,qj): kernel (2,2,Cin,4Cout), padding (0,1) on an
    axis where q's bit is 0 else (1,0). Dense FLOPs drop 4x -> 1.78x.
  * split-down — the stride-2 S2D->S2D conv decomposes per input
    phase into a (2,2)-kernel pad-0 conv (q bit 0) and a (3,3)-kernel
    pad (1,0) conv (q bit 1), stride 2: 4x -> ~1.74x.
  * grouped 1x1 — the block-diagonal 1x1 is exactly a
    feature_group_count=4 conv: no inflation at all.

Also times stage1's residual blocks (C=128/64 @104^2, ~26% MFU per
the stage profile) standalone, to decide whether extending the S2D
domain through stage1 is worth it.

Variants (each barrier-materializes its final activation):
  chain_v0       shipped `_early_s2d` (baseline re-measure)
  chain_grp      v0 + grouped 1x1 for res0.conv1
  chain_split    v0 + split33 for res0.conv2 + grouped 1x1
  chain_split_dn chain_split + split-down for stage0.down
  s1res_std      stage1's two residual blocks, standard, from a staged
                 (104,104,128) input
  full_v0        chain_v0 + s1res_std (stem..stage1 complete)
  full_best      chain_split_dn + s1res_std

Run (TPU): python benchmarks/chain_experiments.py [--batch 32]
Appends one JSON line to benchmarks/chain_experiments.json.
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--scan-batches", type=int, default=40)
    ap.add_argument("--input-size", type=int, default=416)
    ap.add_argument("--check", action="store_true",
                    help="verify split/grouped variants match the dense "
                         "chain numerically (float32) before timing")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mydetection_tpu.models import darknet
    from mydetection_tpu.models.layers import (
        batch_norm, leaky_relu, normalize_input, conv_bn_leaky)
    from mydetection_tpu.registry import get_model

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    size = args.input_size
    batch = args.batch
    g_scan = args.scan_batches if on_tpu else 1

    model = get_model("yolov3", input_size=size, compute_dtype=dtype)
    params = model.init(jax.random.PRNGKey(0))["backbone"]

    rng = np.random.RandomState(0)
    imgs_u8 = jnp.asarray(
        rng.randint(0, 255, (2, batch, size, size, 3), np.uint8))
    s1_in = jnp.asarray(rng.standard_normal(
        (2, batch, size // 4, size // 4, 128)).astype(np.float32)).astype(dtype)

    # -- candidate weight transforms (promoted to darknet.py if they win) --

    def split_conv3_weights(w):
        """3x3 s1 (3,3,Cin,Cout) S2D in/out -> 4 per-input-phase convs:
        [(kernel (2,2,Cin,4Cout), padding)] for q = (0,0),(0,1),(1,0),(1,1).
        Row placement: for input phase bit qi, valid (pi, di) have
        (pi+di)&1 == qi; cell ai=(pi+di)>>1 lies in {0,1} (qi=0, pad
        (0,1)) or {-1,0} (qi=1, pad (1,0)); kernel row = ai + qi."""
        cin, cout = w.shape[2], w.shape[3]
        out = []
        for qi in range(2):
            for qj in range(2):
                k = jnp.zeros((2, 2, cin, 4 * cout), w.dtype)
                for pi in range(2):
                    for pj in range(2):
                        for di in (-1, 0, 1):
                            for dj in (-1, 0, 1):
                                si, sj = pi + di, pj + dj
                                if (si & 1) != qi or (sj & 1) != qj:
                                    continue
                                k = k.at[(si >> 1) + qi, (sj >> 1) + qj, :,
                                         (pi * 2 + pj) * cout:
                                         (pi * 2 + pj + 1) * cout
                                         ].set(w[di + 1, dj + 1])
                pad = ((0, 1) if qi == 0 else (1, 0),
                       (0, 1) if qj == 0 else (1, 0))
                out.append((k, pad))
        return out

    def split_down_weights(w):
        """3x3 s2 (3,3,Cin,Cout) S2D in -> S2D out, per input phase.
        From _phase_fold_s2_weight: cell ti = pi + (di>>1) + 1 in a
        3-window padded (1,0); input phase qi = di & 1. qi=0 (di=0)
        hits window cells {1,2} -> 2-kernel, pad (0,0); qi=1 (di=+-1)
        hits {0,1,2} -> 3-kernel, pad (1,0). Both stride 2."""
        cin, cout = w.shape[2], w.shape[3]
        out = []
        for qi in range(2):
            for qj in range(2):
                kh, kw = (2 if qi == 0 else 3), (2 if qj == 0 else 3)
                k = jnp.zeros((kh, kw, cin, 4 * cout), w.dtype)
                for pi in range(2):
                    for pj in range(2):
                        for di in (-1, 0, 1):
                            for dj in (-1, 0, 1):
                                if (di & 1) != qi or (dj & 1) != qj:
                                    continue
                                ti = pi + (di >> 1) + 1 - (1 if qi == 0 else 0)
                                tj = pj + (dj >> 1) + 1 - (1 if qj == 0 else 0)
                                k = k.at[ti, tj, :,
                                         (pi * 2 + pj) * cout:
                                         (pi * 2 + pj + 1) * cout
                                         ].set(w[di + 1, dj + 1])
                pad = ((0, 0) if qi == 0 else (1, 0),
                       (0, 0) if qj == 0 else (1, 0))
                out.append((k, pad))
        return out

    def conv_split(x, pieces, *, stride=1):
        """Sum of per-input-phase convs; x is S2D (…, 4*Cin) phase-major."""
        cin = x.shape[-1] // 4
        acc = None
        for q, (k, pad) in enumerate(pieces):
            xq = x[..., q * cin:(q + 1) * cin]
            y = jax.lax.conv_general_dilated(
                xq, k.astype(x.dtype), window_strides=(stride, stride),
                padding=pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))
            acc = y if acc is None else acc + y
        return acc

    def conv_grouped_1x1(x, w):
        """Block-diagonal 1x1 (same weights per phase) as a grouped conv."""
        k = jnp.tile(w, (1, 1, 1, 4)).astype(x.dtype)
        return jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 1), padding=((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=4)

    def bn_act(y, bn, tiled=True):
        b = darknet._tile_bn(bn) if tiled else bn
        y, _ = batch_norm(y, b, train=False)
        return leaky_relu(y)

    s0, s1 = params["stage0"], params["stage1"]

    def chain(x, *, grp=False, split=False, split_dn=False):
        y = darknet._cbl_s2d(params["stem"], x, darknet._phase_fold_s1_weight,
                             [(1, 1), (1, 1)], stride=2, compute_dtype=dtype)
        if split_dn:
            y = bn_act(conv_split(y, split_down_weights(s0["down"]["conv"]["w"]),
                                  stride=2), s0["down"]["bn"])
        else:
            y = darknet._cbl_s2d(s0["down"], y, darknet._phase_fold_s2_weight,
                                 [(1, 0), (1, 0)], stride=2, compute_dtype=dtype)
        if grp or split:
            r = bn_act(conv_grouped_1x1(y, s0["res0"]["conv1"]["conv"]["w"]),
                       s0["res0"]["conv1"]["bn"])
        else:
            r = darknet._cbl_s2d(s0["res0"]["conv1"], y,
                                 darknet._blockdiag_1x1_weight,
                                 [(0, 0), (0, 0)], compute_dtype=dtype)
        if split:
            r = bn_act(conv_split(r, split_conv3_weights(
                s0["res0"]["conv2"]["conv"]["w"])), s0["res0"]["conv2"]["bn"])
        else:
            r = darknet._cbl_s2d(s0["res0"]["conv2"], r,
                                 darknet._s2d_conv3_weight,
                                 [(1, 1), (1, 1)], compute_dtype=dtype)
        y = y + r
        return darknet._cbl_s2d(s1["down"], y, darknet._s2d_exit_weight,
                                [(1, 0), (1, 0)], tiled_bn=False,
                                compute_dtype=dtype)

    def s1res(y):
        for bi in range(2):
            y, _ = darknet._res_block(s1[f"res{bi}"], y, train=False,
                                      compute_dtype=dtype)
        return y

    if args.check:
        # On TPU, f32 convs default to bf16 MXU passes; pin true-f32
        # precision so the reassociation tolerance matches CPU.
        ctx = jax.default_matmul_precision("float32")
        ctx.__enter__()
        x32 = normalize_input(imgs_u8[0, :2], jnp.float32)

        def chain32(x, **kw):
            nonlocal dtype
            saved, dtype = dtype, jnp.float32
            try:
                return chain(x, **kw)
            finally:
                dtype = saved

        ref = chain32(x32)
        for name, kw in [("grp", dict(grp=True)),
                         ("split", dict(split=True)),
                         ("split_dn", dict(split=True, split_dn=True))]:
            got = chain32(x32, **kw)
            err = float(jnp.max(jnp.abs(got - ref)))
            print(f"check {name}: max|diff| = {err:.2e}")
            # the transforms are exact (float64 diff ~1e-14, verified);
            # float32 slack is conv-sum reassociation through BN+LReLU
            assert err < 2e-3, name
        print("checks passed")
        ctx.__exit__(None, None, None)

    def checksum(y):
        return jnp.sum(y.astype(jnp.float32))

    def barrier_sum(y):
        return checksum(jax.lax.optimization_barrier(y))

    variants = {
        "chain_v0": (lambda x: barrier_sum(chain(x)), imgs_u8, True),
        "chain_grp": (lambda x: barrier_sum(chain(x, grp=True)), imgs_u8, True),
        "chain_split": (lambda x: barrier_sum(chain(x, split=True)),
                        imgs_u8, True),
        "chain_split_dn": (lambda x: barrier_sum(
            chain(x, split=True, split_dn=True)), imgs_u8, True),
        "s1res_std": (lambda y: barrier_sum(s1res(y)), s1_in, False),
        "full_v0": (lambda x: barrier_sum(s1res(chain(x))), imgs_u8, True),
        "full_best": (lambda x: barrier_sum(s1res(
            chain(x, split=True, split_dn=True))), imgs_u8, True),
    }

    def timed(fn, staged, is_u8) -> float:
        @functools.partial(jax.jit, static_argnames=("g",))
        def scan_fn(two, g):
            def body(acc, i):
                x = jax.lax.dynamic_index_in_dim(two, i % 2, 0,
                                                 keepdims=False)
                if is_u8:
                    x = normalize_input(x, dtype)
                return acc + fn(x), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(g))
            return acc
        float(scan_fn(staged, g_scan))
        float(scan_fn(staged, g_scan))
        t0 = time.perf_counter()
        prev = None
        acc = 0.0
        for _ in range(args.iters):
            out = scan_fn(staged, g_scan)
            if prev is not None:
                acc += float(prev)
            prev = out
        acc += float(prev)
        dt = time.perf_counter() - t0
        assert np.isfinite(acc)
        return round(1000.0 * dt / (g_scan * args.iters), 3)

    results = {}
    for name, (fn, staged, is_u8) in variants.items():
        results[name] = timed(fn, staged, is_u8)
        print(f"{name:>14}: {results[name]:8.3f} ms/batch-{batch}",
              flush=True)

    row = {"batch": batch, "input_size": size, "backend": backend,
           "scan_batches": g_scan, "ms_per_batch": results}
    out_path = os.path.join(HERE, "chain_experiments.json")
    with open(out_path, "a") as fh:
        fh.write(json.dumps(row) + "\n")
    print(json.dumps(row))


if __name__ == "__main__":
    main()
