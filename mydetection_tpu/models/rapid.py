"""RAPiD-style rotated-bbox detector head: angle-aware YOLO decode +
periodic angle loss.

Reference parity: `models/rapid.py` in duanzhiihao/myDetection
[recalled; SURVEY.md §2.7b] — RAPiD (arXiv 2005.11623): a YOLOv3-style
3-scale head over Darknet-53 with one extra angle channel per anchor,
prediction (x, y, w, h, θ, conf) for rotated people in overhead
fisheye images (single class); θ decoded by a scaled sigmoid into
(−π/2, π/2]; the angle loss is *periodic* L1 handling the θ ↔ θ+π
box symmetry; post-processing uses rotated-IoU NMS [spec].

TPU-native: dense static decode feeding the analytic rotated-IoU NMS
(mydetection_tpu.ops.rotated — polygon-clip candidates, not the
reference's mask rasterization). Angle convention is radians
internally; the Detector API reports degrees (RAPiD convention).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from mydetection_tpu.losses import bce_with_logits, period_l1
from mydetection_tpu.ops.boxes import pairwise_iou

# Person anchors (w, h) in input pixels per level, P5/P4/P3 order.
# The reference's exact values are unrecoverable offline (SURVEY.md §0);
# these are person-shaped priors spanning the same scale range as the
# canonical YOLO anchors. Override via config for retrained models.
ANCHORS = (
    ((187, 374), (259, 311), (374, 187)),   # P5, stride 32
    ((94, 187), (130, 155), (187, 94)),     # P4, stride 16
    ((47, 94), (65, 78), (94, 47)),         # P3, stride 8
)
STRIDES = (32, 16, 8)
IGNORE_THRES = 0.6
CHANNELS_PER_ANCHOR = 6  # x, y, w, h, theta, conf


def decode_level(raw: jnp.ndarray, anchors, stride: int):
    """One level raw (B, H, W, A*6) → dense rotated predictions.

    Returns {"boxes5": (B, N, 5) cxcywhθ net-pixels f32, "conf": (B, N)}.
    θ = (sigmoid(t_θ) − 0.5)·π ∈ (−π/2, π/2).
    """
    b, h, w, _ = raw.shape
    na = len(anchors)
    n = h * w * na
    # 3-D (B, N, 6) decode — 5-D (B, H, W, A, 6) tilings are ~14x
    # slower on TPU (see yolov3._grid_anchor_tables)
    r = raw.reshape(b, n, CHANNELS_PER_ANCHOR)
    from mydetection_tpu.models.yolov3 import (
        _grid_anchor_tables,
        decode_boxes_level,
    )
    grid, anc = _grid_anchor_tables(h, w, anchors)

    xywh = decode_boxes_level(r, grid, anc, stride)  # shared YOLO decode
    theta = (jax.nn.sigmoid(r[..., 4:5].astype(jnp.float32)) - 0.5) * jnp.pi
    conf = jax.nn.sigmoid(r[..., 5].astype(jnp.float32))

    boxes5 = jnp.concatenate([xywh, theta], -1)
    return {"boxes5": boxes5, "conf": conf}


def decode(raw_outputs: Sequence[jnp.ndarray], *, anchors=ANCHORS):
    parts = [decode_level(raw, anchors[i], STRIDES[i])
             for i, raw in enumerate(raw_outputs)]
    return {
        "boxes5": jnp.concatenate([p["boxes5"] for p in parts], 1),
        "conf": jnp.concatenate([p["conf"] for p in parts], 1),
    }


def loss(raw_outputs: Sequence[jnp.ndarray], gt_boxes5: jnp.ndarray,
         gt_valid: jnp.ndarray, *, input_size: int, anchors=ANCHORS) -> dict:
    """RAPiD loss: BCE(xy) + MSE(wh) + periodic-L1(θ) + BCE(conf).

    gt_boxes5: (B, M, 5) cxcywhθ (radians) in network pixels, padded.
    Assignment mirrors YOLOv3 (best wh-IoU anchor per GT); the conf
    ignore mask uses axis-aligned IoU of the enclosing boxes — cheap
    and sufficient for "don't punish near-duplicates" [inferred].
    `anchors`: 3-level (w, h) table, P5→P3 — derive from a user dataset
    with mydetection_tpu.anchors.anchor_table (the default table is an
    admitted guess, PARITY.md).
    """
    all_anchors = jnp.asarray([a for lvl in anchors for a in lvl], jnp.float32)
    b, m = gt_valid.shape

    gw, gh = gt_boxes5[..., 2], gt_boxes5[..., 3]
    aw, ah = all_anchors[:, 0], all_anchors[:, 1]
    inter = jnp.minimum(gw[..., None], aw) * jnp.minimum(gh[..., None], ah)
    union = gw[..., None] * gh[..., None] + aw * ah - inter
    anchor_iou = inter / jnp.maximum(union, 1e-9)
    best_a = jnp.argmax(anchor_iou, -1)
    best_level = best_a // 3
    best_sub = best_a % 3

    decoded = decode(raw_outputs, anchors=anchors)
    # enclosing axis-aligned approximation for the ignore mask
    def enclose(b5):
        cos = jnp.abs(jnp.cos(b5[..., 4]))
        sin = jnp.abs(jnp.sin(b5[..., 4]))
        w = b5[..., 2] * cos + b5[..., 3] * sin
        h = b5[..., 2] * sin + b5[..., 3] * cos
        return jnp.stack([b5[..., 0] - w / 2, b5[..., 1] - h / 2,
                          b5[..., 0] + w / 2, b5[..., 1] + h / 2], -1)

    iou_pg = pairwise_iou(enclose(decoded["boxes5"]), enclose(gt_boxes5))
    iou_pg = jnp.where(gt_valid[:, None, :], iou_pg, 0.0)
    ignore_flat = jnp.max(iou_pg, -1) > IGNORE_THRES

    total_conf = jnp.float32(0)
    total_box = jnp.float32(0)
    total_angle = jnp.float32(0)
    num_pos = jnp.float32(0)
    offset = 0

    for li, raw in enumerate(raw_outputs):
        bb, h, w, _ = raw.shape
        na = 3
        stride = STRIDES[li]
        raw = raw.astype(jnp.float32).reshape(bb, h, w, na, CHANNELS_PER_ANCHOR)
        n = h * w * na

        sel = gt_valid & (best_level == li)
        cx, cy = gt_boxes5[..., 0] / stride, gt_boxes5[..., 1] / stride
        ci = jnp.clip(cx.astype(jnp.int32), 0, w - 1)
        cj = jnp.clip(cy.astype(jnp.int32), 0, h - 1)
        flat_idx = (cj * w + ci) * na + best_sub
        flat_idx = jnp.where(sel, flat_idx, n)

        anc = jnp.asarray(anchors[li], jnp.float32)
        t_xy = jnp.stack([cx - jnp.floor(cx), cy - jnp.floor(cy)], -1)
        t_wh = jnp.log(jnp.maximum(gt_boxes5[..., 2:4] / anc[best_sub], 1e-9))
        w_box = 2.0 - (gt_boxes5[..., 2] * gt_boxes5[..., 3]) / float(input_size) ** 2

        # single combined scatter so a duplicate cell+anchor collision
        # resolves to ONE GT for every channel (see yolov3.loss)
        packed = jnp.concatenate([
            jnp.ones((bb, m, 1), jnp.float32),               # conf
            t_xy,                                            # 2
            t_wh,                                            # 2
            gt_boxes5[..., 4:5],                             # θ
            w_box[..., None],                                # 1
        ], axis=-1)
        out = jnp.zeros((bb, n + 1, packed.shape[-1]), jnp.float32)
        bidx = jnp.arange(bb)[:, None].repeat(m, 1)
        packed = out.at[bidx, flat_idx].set(packed)[:, :n]
        conf_tgt = packed[..., 0]
        assigned = conf_tgt > 0
        xy_tgt = packed[..., 1:3]
        wh_tgt = packed[..., 3:5]
        th_tgt = packed[..., 5]
        wbox = packed[..., 6]

        flat_raw = raw.reshape(bb, n, CHANNELS_PER_ANCHOR)
        ignore = jax.lax.dynamic_slice_in_dim(ignore_flat, offset, n, axis=1)

        conf_bce = bce_with_logits(flat_raw[..., 5], assigned.astype(jnp.float32))
        total_conf += jnp.sum(conf_bce * (assigned | ~ignore))

        xy_bce = jnp.sum(bce_with_logits(flat_raw[..., 0:2], xy_tgt), -1)
        wh_mse = jnp.sum((flat_raw[..., 2:4] - wh_tgt) ** 2, -1) * 0.5
        total_box += jnp.sum((xy_bce + wh_mse) * wbox * assigned)

        pred_theta = (jax.nn.sigmoid(flat_raw[..., 4]) - 0.5) * jnp.pi
        total_angle += jnp.sum(period_l1(pred_theta, th_tgt) * assigned)
        num_pos += jnp.sum(assigned)
        offset += n

    norm = jnp.maximum(num_pos, 1.0)
    losses = {
        "conf": total_conf / (b if b else 1),
        "box": total_box / norm,
        "angle": total_angle / norm,
    }
    losses["total"] = losses["conf"] + losses["box"] + losses["angle"]
    return losses
