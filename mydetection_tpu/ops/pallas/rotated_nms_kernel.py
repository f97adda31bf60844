"""Pallas TPU kernel: greedy NMS suppression over a precomputed IoU
matrix — the rotated-NMS device kernel (SURVEY.md §7 kernel k3).

Split of labor: the analytic rotated IoU (candidate-point polygon +
shoelace, `ops/rotated.py`) is dense vectorized math that XLA already
fuses well, so it stays an XLA computation producing the (K, K) IoU
matrix. What XLA does NOT do well is the sequential greedy suppress —
this kernel keeps the whole matrix VMEM-resident (K=512 → 1 MB f32)
and runs the blocked suppression with one MXU contraction per block
tile instead of per-iteration HBM traffic.

Mosaic constraints are the same as nms_kernel.py: no traced
dynamic_slice and 2-D-only layouts, so block extraction is a one-hot
MXU contraction (`tile = onehot @ iou`) and all vectors are (1, K) or
(BLOCK, 1).

Works for ANY IoU definition (rotated, axis-aligned, DIoU, ...) —
semantics identical to the pure-jax `rotated_nms_padded` oracle
(asserted in tests/test_rotated.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mydetection_tpu.ops.pallas.common import greedy_fixpoint_keep

NEG_INF = -1e30  # == ops.nms.NEG_INF (kept literal: no kernel↔nms import cycle)


def _suppress_kernel(iou_ref, valid_ref, keep_ref, *, iou_thres: float,
                     block: int):
    """iou_ref (K, K) f32; valid_ref/keep_ref (1, K) f32."""
    k = iou_ref.shape[0]
    num_blocks = k // block
    keep_ref[0:1, :] = valid_ref[0:1, :]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)             # (1, K)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (block, k), 0)     # (B, K)

    def outer(b, _):
        start = b * block
        onehot = (col == (start + row_ids)).astype(jnp.float32)      # (B, K)
        # block rows of the IoU matrix via MXU contraction. HIGHEST
        # precision is REQUIRED for oracle equality: these one-hot
        # contractions only *select* f32 IoU entries, but at DEFAULT
        # precision the MXU rounds them through bf16 passes and
        # near-iou_thres comparisons flip vs the exact-f32 lax loop
        # (caught on hardware by benchmarks/device_checks.py: 6/32768
        # keep-rows diverged; interpret-mode tests can't see it).
        tile = jax.lax.dot_general(onehot, iou_ref[:, :],
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
        intra = jax.lax.dot_general(tile, onehot, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.HIGHEST)
        bk0 = jnp.sum(onehot * keep_ref[0:1, :], axis=1, keepdims=True)
        # intra-block greedy resolve: shared fixpoint helper
        # (ops/pallas/common.py — one definition for both NMS kernels),
        # which replaced the always-B sequential inner loop that
        # dominated the rotated-NMS slice of RAPiD@1024
        bk = greedy_fixpoint_keep(intra, bk0, iou_thres=iou_thres)

        sup_any = jnp.max(
            jnp.where((tile > iou_thres) & (bk > 0.5), 1.0, 0.0),
            axis=0, keepdims=True)
        keep = keep_ref[0:1, :]
        keep = jnp.where((sup_any > 0.5) & (col >= start + block), 0.0, keep)
        in_block = (col >= start) & (col < start + block)
        keep_in = jnp.sum(onehot * bk, axis=0, keepdims=True)
        keep_ref[0:1, :] = jnp.where(in_block, keep_in, keep)
        return 0

    jax.lax.fori_loop(0, num_blocks, outer, 0)


def nms_from_iou_pallas_impl(iou: jnp.ndarray, scores: jnp.ndarray, *,
                             iou_thres: float = 0.45, block: int = 64,
                             interpret: bool = False) -> jnp.ndarray:
    """Greedy keep-mask from a (K, K) IoU matrix of score-sorted boxes.

    scores (K,): padding rows carry score <= NEG_INF/2. Returns bool (K,).
    """
    k = iou.shape[0]
    assert iou.shape == (k, k) and k % block == 0, (iou.shape, block)
    valid = (scores > NEG_INF / 2).astype(jnp.float32)[None, :]
    keep = pl.pallas_call(
        functools.partial(_suppress_kernel, iou_thres=float(iou_thres),
                          block=block),
        out_shape=jax.ShapeDtypeStruct((1, k), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(iou.astype(jnp.float32), valid)
    return keep[0] > 0.5


nms_from_iou_pallas = jax.jit(
    nms_from_iou_pallas_impl,
    static_argnames=("iou_thres", "block", "interpret"))
