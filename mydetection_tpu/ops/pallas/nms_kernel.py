"""Pallas TPU kernel: static-shape blocked greedy NMS.

Replaces `torchvision.ops.nms` (C++/CUDA, data-dependent loop) from the
reference's post-processing [recalled; SURVEY.md §2.N]. Semantics are
identical to the pure-jax oracle `mydetection_tpu.ops.nms.nms_padded`
(asserted in tests/test_nms.py).

Kernel shape: boxes arrive TRANSPOSED as (4, K) so the K axis lies on
the 128-lane dimension (K is a multiple of the block size). The whole
problem lives in VMEM — K=1024 boxes is 16 KB — and each (BLOCK, K)
IoU tile is recomputed on the fly instead of materializing the full
(K, K) matrix in HBM.

Mosaic lowering constraints shape the implementation:
  * `dynamic_slice` with traced offsets is unimplemented → all block
    extraction/scatter uses one-hot masked reductions over the lane
    axis (`onehot[i, j] = (col_j == start + i)`).
  * 1-D vector layouts crash the Mosaic layout pass → every
    intermediate stays 2-D ((1, K), (BLOCK, 1), (BLOCK, K)).
  * no transposes: the intra-block IoU matrix is symmetric, so
    "row i" is read as column i via a lane-masked reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mydetection_tpu.ops.pallas.common import greedy_fixpoint_keep

NEG_INF = -1e30  # == ops.nms.NEG_INF (kept literal: no kernel↔nms import cycle)


def _nms_kernel(boxes_ref, valid_ref, keep_ref, *, iou_thres: float, block: int):
    """boxes_ref (4, K) f32; valid_ref/keep_ref (1, K) f32 (1.0 = valid/kept)."""
    k = boxes_ref.shape[1]
    num_blocks = k // block
    x1 = boxes_ref[0:1, :]   # (1, K)
    y1 = boxes_ref[1:2, :]
    x2 = boxes_ref[2:3, :]
    y2 = boxes_ref[3:4, :]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)  # (1, K)

    keep_ref[0:1, :] = valid_ref[0:1, :]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)             # (1, K)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (block, k), 0)     # (B, K)

    def outer(b, _):
        start = b * block
        onehot = (col == (start + row_ids)).astype(jnp.float32)  # (B, K)

        def extract(vec_1k):
            """(1, K) -> (BLOCK, 1) block values via one-hot reduction."""
            return jnp.sum(onehot * vec_1k, axis=1, keepdims=True)

        bx1, by1 = extract(x1), extract(y1)
        bx2, by2 = extract(x2), extract(y2)
        barea = extract(area)

        # (BLOCK, K) IoU tile of block boxes vs all boxes
        ix1 = jnp.maximum(bx1, x1)
        iy1 = jnp.maximum(by1, y1)
        ix2 = jnp.minimum(bx2, x2)
        iy2 = jnp.minimum(by2, y2)
        inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
        union = barea + area - inter
        iou = inter / jnp.maximum(union, 1e-9)

        # intra-block (BLOCK, BLOCK) IoU — contraction instead of
        # slicing. HIGHEST precision is REQUIRED for oracle equality:
        # the one-hot contraction merely *selects* f32 IoU entries, but
        # at DEFAULT precision the MXU rounds them through bf16 passes
        # and near-iou_thres comparisons flip vs the exact-f32 oracle
        # (caught on hardware by benchmarks/device_checks.py: 2/98304
        # keep-rows diverged; interpret-mode tests can't see it).
        intra = jax.lax.dot_general(
            iou, onehot, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

        bk0 = extract(keep_ref[0:1, :])  # (BLOCK, 1) keep flags
        # intra-block greedy resolve: shared fixpoint helper
        # (ops/pallas/common.py — one definition for both NMS kernels)
        bk = greedy_fixpoint_keep(intra, bk0, iou_thres=iou_thres)

        # resolved block suppresses all later boxes in one pass
        sup_any = jnp.max(
            jnp.where((iou > iou_thres) & (bk > 0.5), 1.0, 0.0),
            axis=0, keepdims=True)                               # (1, K)
        keep = keep_ref[0:1, :]
        keep = jnp.where((sup_any > 0.5) & (col >= start + block), 0.0, keep)
        # scatter bk back into the block's columns
        in_block = (col >= start) & (col < start + block)
        keep_in = jnp.sum(onehot * bk, axis=0, keepdims=True)    # (1, K)
        keep_ref[0:1, :] = jnp.where(in_block, keep_in, keep)
        return 0

    jax.lax.fori_loop(0, num_blocks, outer, 0)


def nms_pallas_impl(boxes: jnp.ndarray, scores: jnp.ndarray, *,
               iou_thres: float = 0.45, block: int = 128,
               interpret: bool = False) -> jnp.ndarray:
    """Greedy NMS keep-mask via a Pallas kernel.

    Args:
      boxes:  (K, 4) xyxy float32, sorted by descending score; K % block == 0.
      scores: (K,) — padding rows carry score <= NEG_INF/2.
    Returns bool (K,).
    """
    k = boxes.shape[0]
    assert k % block == 0, (k, block)
    boxes_t = boxes.T.astype(jnp.float32)          # (4, K)
    valid = (scores > NEG_INF / 2).astype(jnp.float32)[None, :]  # (1, K)
    keep = pl.pallas_call(
        functools.partial(_nms_kernel, iou_thres=float(iou_thres), block=block),
        out_shape=jax.ShapeDtypeStruct((1, k), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(boxes_t, valid)
    return keep[0] > 0.5


nms_pallas = jax.jit(nms_pallas_impl,
                     static_argnames=("iou_thres", "block", "interpret"))
