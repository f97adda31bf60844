"""Shared in-kernel helpers for the Pallas NMS kernels.

One definition of the intra-block greedy fixpoint resolve used by both
the axis-aligned kernel (nms_kernel.py) and the rotated suppress
kernel (rotated_nms_kernel.py) — a change to the convergence
condition, the threshold comparison (> vs >=), or the {0,1} encoding
must hit both kernels at once or their keep-sets silently diverge from
the shared oracle semantics.

Mosaic constraints shape the formulation (see nms_kernel.py header):
2-D-only layouts, no transposes (the (1, B) → (B, 1) move is an
identity-masked reduction), everything expressible inside a Pallas
kernel body.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def greedy_fixpoint_keep(intra: jnp.ndarray, bk0: jnp.ndarray, *,
                         iou_thres: float) -> jnp.ndarray:
    """Intra-block greedy NMS resolve as a fixpoint iteration.

    The greedy keep-vector is the unique fixpoint of
        f(k)[j] = valid[j] ∧ ¬∃i<j: k[i] ∧ iou[i, j] > t
    (unique by induction on j: each entry is forced by the prefix).
    Iterating k ← f(k) from k = valid stabilizes the length-t prefix
    after t steps, so exiting when f(k) == k yields exactly the greedy
    answer — a handful of vectorized (B, B) passes for real box sets
    instead of an always-B sequential inner loop (~5.8 ms → sub-ms for
    batch-32×K=1024 axis NMS on v5e; same win on the rotated kernel).

    Args:
      intra: (B, B) IoU of the block's boxes against themselves,
             score-sorted (row/col i = i-th highest score in block).
      bk0:   (B, 1) {0,1} validity/keep flags entering the block.
    Returns (B, 1) {0,1} resolved keep flags.
    """
    block = intra.shape[0]
    col_b = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
    row_col = jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
    sup_mat = jnp.where((intra > iou_thres) & (col_b > row_col),
                        1.0, 0.0)                        # [i, j]: i<j
    eye_b = (col_b == row_col).astype(jnp.float32)       # (B, B)

    def f(kv):  # kv: (B, 1) keep flags as {0,1} over rows
        # suppressed[j] = max_i sup_mat[i, j] * kv[i]  → lanes (1, B)
        sup_j = jnp.max(sup_mat * kv, axis=0, keepdims=True)
        # transpose (1, B) → (B, 1) via identity-masked reduction
        sup_rows = jnp.sum(eye_b * sup_j, axis=1, keepdims=True)
        return bk0 * (1.0 - sup_rows)

    def cond(state):
        kv, kn = state
        return jnp.sum(jnp.abs(kn - kv)) > 0.0

    def step(state):
        _, kn = state
        return kn, f(kn)

    _, bk = jax.lax.while_loop(cond, step, (bk0, f(bk0)))
    return bk
