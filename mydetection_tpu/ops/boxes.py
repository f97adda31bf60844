"""Axis-aligned box ops in JAX: format conversion, IoU / GIoU matrices.

Reference parity: `utils/` box helpers (`cal_ious`, xywh<->xyxy) in
duanzhiihao/myDetection [recalled; SURVEY.md §2.8]. All functions are
pure, static-shape, jit-safe, and broadcast over leading batch dims.

Box formats:
  cxcywh — (cx, cy, w, h) center format (YOLO native)
  xyxy   — (x1, y1, x2, y2) corner format (NMS / COCO-eval native;
           COCO-JSON itself uses xywh top-left, handled in data/coco.py)
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-9


def cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(boxes[..., :4], 4, axis=-1)
    half_w, half_h = w * 0.5, h * 0.5
    return jnp.concatenate([cx - half_w, cy - half_h, cx + half_w, cy + half_h], axis=-1)


def xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.split(boxes[..., :4], 4, axis=-1)
    return jnp.concatenate([(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1)


def box_area(boxes_xyxy: jnp.ndarray) -> jnp.ndarray:
    w = jnp.maximum(boxes_xyxy[..., 2] - boxes_xyxy[..., 0], 0.0)
    h = jnp.maximum(boxes_xyxy[..., 3] - boxes_xyxy[..., 1], 0.0)
    return w * h


def pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix between xyxy box sets a (..., N, 4) and b (..., M, 4).

    Returns (..., N, M) float32. Static shapes; degenerate boxes give 0.
    """
    a = a[..., :, None, :4]
    b = b[..., None, :, :4]
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    aw = jnp.maximum(a[..., 2] - a[..., 0], 0.0)
    ah = jnp.maximum(a[..., 3] - a[..., 1], 0.0)
    bw = jnp.maximum(b[..., 2] - b[..., 0], 0.0)
    bh = jnp.maximum(b[..., 3] - b[..., 1], 0.0)
    union = aw * ah + bw * bh - inter
    return inter / jnp.maximum(union, EPS)


def _iou_union(a: jnp.ndarray, b: jnp.ndarray):
    """(iou, union) for matched xyxy boxes — ONE definition of the
    intersection/union math shared by IoU and GIoU (a divergent fix to
    e.g. the EPS handling in only one of them would silently skew the
    other)."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:4], b[..., 2:4])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a) + box_area(b) - inter
    return inter / jnp.maximum(union, EPS), union


def elementwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU between matched xyxy boxes of identical shape (..., 4)."""
    return _iou_union(a, b)[0]


def elementwise_giou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Generalized IoU between matched xyxy boxes (..., 4) -> (...)."""
    iou, union = _iou_union(a, b)
    lt = jnp.minimum(a[..., :2], b[..., :2])
    rb = jnp.maximum(a[..., 2:4], b[..., 2:4])
    wh = jnp.maximum(rb - lt, 0.0)
    hull = wh[..., 0] * wh[..., 1]
    return iou - (hull - union) / jnp.maximum(hull, EPS)


