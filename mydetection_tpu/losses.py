"""Shared loss functions: BCE, focal, smooth-L1, IoU losses, periodic
angle loss.

Reference parity: `models/losses.py` in duanzhiihao/myDetection
[recalled; SURVEY.md §2.13] — BCE (obj/cls), focal loss
(RetinaNet/FCOS), IoU/GIoU box losses, smooth-L1, and RAPiD's periodic
angle loss handling the θ ↔ θ+π symmetry (arXiv 2005.11623).

All functions are elementwise/pure and jit-safe; reductions are the
caller's job (heads own their loss — SURVEY.md §3.3 idiom).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mydetection_tpu.ops.boxes import elementwise_giou, elementwise_iou


def onehot_gather(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """`take_along_axis(table, idx)` for a tiny per-image table, as an
    exact one-hot contraction: (B, M, ...) table + (B, N) idx → (B, N, ...).

    Target assignment gathers per-anchor rows out of the padded GT
    table (M ≈ 8-100). XLA lowers that dynamic gather to a serialized
    loop fusion on TPU — measured 6.4 + 8.6 ms for the two gathers in
    the RetinaNet@608 batch-16 train step (benchmarks/xplane_top_ops
    r3), ~13 % of the whole step. The one-hot matmul is the TPU-shaped
    formulation (dense, MXU/VPU-friendly) and is EXACT: each one-hot
    row selects a single element, so the float contraction reproduces
    table[idx] bitwise (integer tables round-trip exactly through f32
    for |v| < 2^24).

    HIGHEST precision on the TABLE operand is load-bearing for that
    exactness claim: the TPU MXU's DEFAULT f32 dot truncates operands
    to bf16, which would silently round gathered f32 GT box
    coordinates (≈2 px at 608 input) and corrupt integer class ids
    above 256. HIGHEST decomposes the f32 table into exact bf16 parts,
    so v·1.0 + Σ v·0.0 reconstructs v bitwise. The one-hot operand is
    exact 0.0/1.0 — already bf16-exact — so it stays at DEFAULT
    (per-operand precision): 3 MXU passes instead of 9 for
    HIGHEST-on-both, same bitwise result. Cost bound: the passes
    multiply only this contraction's ~1 GFLOP (B·N·M·F ≈ 16·69k·8·5 at
    retinanet@608 b16) — sub-ms against the ~15 ms serialized gather
    it replaces, so the measured win stands.
    """
    b, m = table.shape[0], table.shape[1]
    onehot = (idx[..., None] == jnp.arange(m)).astype(jnp.float32)
    flat = table.reshape(b, m, -1).astype(jnp.float32)
    out = jnp.einsum("bnm,bmf->bnf", onehot, flat,
                     precision=(jax.lax.Precision.DEFAULT,
                                jax.lax.Precision.HIGHEST))
    return out.reshape(*idx.shape, *table.shape[2:]).astype(table.dtype)


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable sigmoid binary cross-entropy, elementwise."""
    return (jnp.maximum(logits, 0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def focal_loss(logits: jnp.ndarray, targets: jnp.ndarray, *,
               alpha: float = 0.25, gamma: float = 2.0) -> jnp.ndarray:
    """Sigmoid focal loss (RetinaNet, arXiv 1708.02002), elementwise.

    targets ∈ {0, 1}; returns per-element loss (no reduction).
    """
    ce = bce_with_logits(logits, targets)   # = -log p_t
    p_t = jnp.exp(-ce)
    alpha_t = jnp.where(targets > 0.5, alpha, 1.0 - alpha)
    return alpha_t * (1.0 - p_t) ** gamma * ce


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, *,
              beta: float = 1.0 / 9.0) -> jnp.ndarray:
    """Huber/smooth-L1, elementwise (RetinaNet box regression default)."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff ** 2 / beta, diff - 0.5 * beta)


def iou_loss(pred_xyxy: jnp.ndarray, target_xyxy: jnp.ndarray) -> jnp.ndarray:
    """-log IoU loss (FCOS UnitBox-style), per box pair (...,)."""
    iou = elementwise_iou(pred_xyxy, target_xyxy)
    return -jnp.log(jnp.clip(iou, 1e-8, 1.0))


def giou_loss(pred_xyxy: jnp.ndarray, target_xyxy: jnp.ndarray) -> jnp.ndarray:
    """1 - GIoU, per box pair (...,)."""
    return 1.0 - elementwise_giou(pred_xyxy, target_xyxy)


def period_l1(pred: jnp.ndarray, target: jnp.ndarray,
              period: float = jnp.pi) -> jnp.ndarray:
    """Periodic L1: distance on the circle of the given period.

    RAPiD's angle loss [recalled; SURVEY.md §2.7b]: a rotated box is
    identical under θ → θ+π, so the loss is min over the symmetry:
        L = |((pred - target + p/2) mod p) - p/2|.
    """
    diff = jnp.mod(pred - target + period / 2.0, period) - period / 2.0
    return jnp.abs(diff)


def period_l2(pred: jnp.ndarray, target: jnp.ndarray,
              period: float = jnp.pi) -> jnp.ndarray:
    """Periodic squared error (see period_l1)."""
    diff = jnp.mod(pred - target + period / 2.0, period) - period / 2.0
    return 0.5 * diff ** 2
