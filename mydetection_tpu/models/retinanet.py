"""RetinaNet head: anchors, shared subnets, decode, focal loss.

Reference parity: `models/retinanet.py` in duanzhiihao/myDetection
[recalled; SURVEY.md §2.6] — shared 4-conv class & box subnets over
P3–P7, A=9 anchors/cell (3 octave scales × 3 aspect ratios), focal
loss for classification and smooth-L1 for boxes, class-wise NMS at
decode (arXiv 1708.02002).

TPU-native: anchors are a static per-input-size constant folded into
the jitted graph; decode is dense/static (all ΣA·H·W boxes) feeding
the shared padded-top-k + Pallas NMS postprocess; target assignment is
one vectorized (B, N, M) IoU matrix, no per-image loops.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

from mydetection_tpu.losses import focal_loss, onehot_gather, smooth_l1
from mydetection_tpu.models.layers import KeyGen, Params, conv2d, conv_init
from mydetection_tpu.ops.boxes import cxcywh_to_xyxy, pairwise_iou

STRIDES = (8, 16, 32, 64, 128)
OCTAVE_SCALES = (1.0, 2 ** (1 / 3), 2 ** (2 / 3))
ASPECT_RATIOS = (0.5, 1.0, 2.0)  # h/w
NUM_ANCHORS = len(OCTAVE_SCALES) * len(ASPECT_RATIOS)
DWH_CLAMP = math.log(1000.0 / 16)
PRIOR_PROB = 0.01
POS_IOU, NEG_IOU = 0.5, 0.4


# ---------------------------------------------------------------------------
# anchors
# ---------------------------------------------------------------------------

def level_shapes(input_size: int) -> list[tuple[int, int]]:
    return [(math.ceil(input_size / s), math.ceil(input_size / s))
            for s in STRIDES]


def anchor_wh(base_size: float) -> jnp.ndarray:
    """The 9 (w, h) anchors for a level with `base_size` px, (A, 2).

    TORCHVISION-exact (`AnchorGenerator` semantics, the weight-import
    parity target): per-level pixel sizes (x, int(x·2^⅓), int(x·2^⅔))
    — note the int() truncation torchvision applies when building the
    sizes tuple — aspect via √ratio, and half-extents rounded to
    integers (`base_anchors.round()`; banker's rounding like torch).
    Base size is 4× the stride (32..512 over P3..P7), as in the
    RetinaNet paper.
    """
    scales = (base_size, float(int(base_size * 2 ** (1 / 3))),
              float(int(base_size * 2 ** (2 / 3))))
    shapes = []
    for ratio in ASPECT_RATIOS:
        h_r = math.sqrt(ratio)
        w_r = 1.0 / h_r
        for scale in scales:
            # x1 = round(-ws/2), x2 = round(ws/2) → width 2·round(ws/2)
            shapes.append((2.0 * round(w_r * scale / 2.0),
                           2.0 * round(h_r * scale / 2.0)))
    return jnp.asarray(shapes, jnp.float32)  # (9, 2) pixels


def generate_anchors(input_size: int) -> jnp.ndarray:
    """All anchors for an input size, (N, 4) cxcywh in pixels.

    Order matches the head's flattened output: level-major, then
    row-major cells, then the 9 anchor shapes. Anchor centers sit at
    grid·stride — torchvision's convention (its shifts are
    arange(grid)·stride with base anchors centered at 0), NOT the
    (grid+0.5)·stride cell centers some implementations use; imported
    torchvision weights regress against these exact centers.
    """
    out = []
    for stride, (h, w) in zip(STRIDES, level_shapes(input_size)):
        wh_px = anchor_wh(4.0 * stride)
        gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        cx = gx * stride
        cy = gy * stride
        ctr = jnp.stack([cx, cy], -1)[:, :, None, :]          # (H, W, 1, 2)
        wh = wh_px[None, None, :, :]                          # (1, 1, 9, 2)
        boxes = jnp.concatenate(
            [jnp.broadcast_to(ctr, (h, w, NUM_ANCHORS, 2)),
             jnp.broadcast_to(wh, (h, w, NUM_ANCHORS, 2))], -1)
        out.append(boxes.reshape(-1, 4))
    return jnp.concatenate(out, axis=0)


# ---------------------------------------------------------------------------
# head params + apply (subnets shared across levels)
# ---------------------------------------------------------------------------

def init(rng: jax.Array, num_classes: int = 80, *, channels: int = 256) -> Params:
    keys = KeyGen(rng)

    def subnet(c_final: int, final_bias: float) -> Params:
        # every subnet conv is N(0, 0.01) (paper §4.1 / torchvision) —
        # see conv_init's docstring for why He-scale diverges here
        p: Params = {}
        for i in range(4):
            p[f"conv{i}"] = conv_init(keys(), 3, channels, channels,
                                      bias=True, std=0.01)
        p["out"] = conv_init(keys(), 3, channels, c_final, bias=True,
                             std=0.01)
        p["out"]["b"] = jnp.full((c_final,), final_bias, jnp.float32)
        return p

    cls_bias = -math.log((1 - PRIOR_PROB) / PRIOR_PROB)
    return {
        "cls": subnet(NUM_ANCHORS * num_classes, cls_bias),
        "box": subnet(NUM_ANCHORS * 4, 0.0),
    }


def _subnet(p: Params, x, *, compute_dtype):
    # Recorded NEGATIVE (VERDICT r3 #4): packing the tiny P5-P7 levels
    # into one gap-masked canvas per tower dispatch (3 conv calls per
    # layer instead of 5, bit-exact modulo f32 ulps) wins on the
    # isolated 2-tower microbench (49.1 -> 45.4 ms @608/b32,
    # benchmarks/retinanet_head_experiments.py) but LOSES end-to-end:
    # 621.8 -> 615.0 img/s (device_bench). The packed canvas's
    # pad/gap cells add +1.9% FLOPs (142.9 -> 145.6 GF/img) and the
    # concat+pad+slice glue costs a fused graph more than the tiny
    # convs' MXU under-fill, which XLA already overlaps with the
    # backbone's HBM-bound stretches. Kept per-level.
    for i in range(4):
        w = p[f"conv{i}"]
        x = conv2d(x, w["w"], compute_dtype=compute_dtype) + w["b"].astype(
            x.dtype if compute_dtype is None else compute_dtype)
        x = jnp.maximum(x, 0.0)
    y = conv2d(x, p["out"]["w"], compute_dtype=compute_dtype)
    return y + p["out"]["b"].astype(y.dtype)


def apply(params: Params, pyramid: Sequence[jnp.ndarray], *,
          num_classes: int = 80, compute_dtype=None,
          with_gate: bool = False):
    """[P3..P7] → (cls_logits (B, N, C) native dtype, box_deltas
    (B, N, 4) f32[, gate (B, N) native dtype when with_gate]).

    cls_logits stay in the conv compute dtype (bf16 on TPU): the dense
    (B, N, C) tensor is large (355 MB at 608²/80c/batch-32) and the
    postprocess consumes LOGITS directly (ops/nms.postprocess_impl
    score_logits path), deferring the f32 sigmoid past top-k selection.

    with_gate: also return each box's max-over-classes logit, computed
    PER LEVEL in the conv-native layout. Without it the postprocess
    reduces the concatenated (B, N, C) over classes, and XLA's layout
    assignment relayouts the whole 355 MB tensor to N-minor to make
    that reduce cheap (measured 1.37 ms/batch-32 copy in the XPlane
    profile); the per-level reduce fuses into the head epilogue
    instead. Bit-exact: max is associative, and the same bf16 values
    feed the same downstream sigmoid.

    End-to-end throughput on v5e measured NEUTRAL (621.8 vs 623 img/s
    @608 batch 32): the relayout copy overlaps other work and is not
    on the critical path. Kept anyway — it removes ~355 MB/step of
    HBM traffic, which matters whenever the graph IS bandwidth-bound
    (smaller batches, multi-model serving) and costs nothing here.
    """
    cls_flat, box_flat, gate_flat = [], [], []
    for feat in pyramid:
        b, h, w, _ = feat.shape
        cl = _subnet(params["cls"], feat, compute_dtype=compute_dtype)
        bx = _subnet(params["box"], feat, compute_dtype=compute_dtype)
        cl = cl.reshape(b, h * w * NUM_ANCHORS, num_classes)
        cls_flat.append(cl)
        if with_gate:
            gate_flat.append(jnp.max(cl, axis=-1))
        box_flat.append(bx.astype(jnp.float32).reshape(b, h * w * NUM_ANCHORS, 4))
    out = (jnp.concatenate(cls_flat, 1), jnp.concatenate(box_flat, 1))
    if with_gate:
        return out + (jnp.concatenate(gate_flat, 1),)
    return out


# ---------------------------------------------------------------------------
# decode + encode
# ---------------------------------------------------------------------------

def decode_boxes(box_deltas: jnp.ndarray,
                 anchors_cxcywh: jnp.ndarray) -> jnp.ndarray:
    """Deltas + anchors → (B, N, 4) xyxy. Standard R-CNN box coder with
    unit weights: ctr = d*wh_a + ctr_a ; wh = exp(clamp(d)) * wh_a."""
    ctr_a = anchors_cxcywh[None, :, :2]
    wh_a = anchors_cxcywh[None, :, 2:]
    ctr = box_deltas[..., :2] * wh_a + ctr_a
    wh = jnp.exp(jnp.clip(box_deltas[..., 2:], -DWH_CLAMP, DWH_CLAMP)) * wh_a
    return cxcywh_to_xyxy(jnp.concatenate([ctr, wh], -1))


def decode(cls_logits: jnp.ndarray, box_deltas: jnp.ndarray,
           anchors_cxcywh: jnp.ndarray):
    """Deltas + anchors → dense detections with materialized scores.

    Returns {"boxes": (B, N, 4) xyxy, "scores": (B, N, C) f32 sigmoid}.
    The production pipeline instead passes raw logits to the
    postprocess (registry forward_dense → score_logits) so the dense
    f32 probability tensor never materializes; this form is kept for
    tests and direct use.
    """
    return {"boxes": decode_boxes(box_deltas, anchors_cxcywh),
            "scores": jax.nn.sigmoid(cls_logits.astype(jnp.float32))}


def encode(gt_cxcywh: jnp.ndarray, anchors_cxcywh: jnp.ndarray) -> jnp.ndarray:
    """Inverse of decode: gt boxes → regression targets vs anchors."""
    d_ctr = (gt_cxcywh[..., :2] - anchors_cxcywh[..., :2]) / anchors_cxcywh[..., 2:]
    d_wh = jnp.log(jnp.maximum(gt_cxcywh[..., 2:] / anchors_cxcywh[..., 2:], 1e-8))
    return jnp.concatenate([d_ctr, d_wh], -1)


# ---------------------------------------------------------------------------
# loss
# ---------------------------------------------------------------------------

def loss(cls_logits: jnp.ndarray, box_deltas: jnp.ndarray,
         anchors_cxcywh: jnp.ndarray, gt_boxes: jnp.ndarray,
         gt_classes: jnp.ndarray, gt_valid: jnp.ndarray, *,
         num_classes: int = 80) -> dict:
    """Focal + smooth-L1 with IoU-based anchor assignment.

    Anchors with best-GT IoU ≥ 0.5 are positive, < 0.4 negative, the
    band between is ignored; additionally every GT's single best anchor
    is forced positive (low-quality match recovery). gt_boxes are
    (B, M, 4) cxcywh net pixels, padded with gt_valid mask.
    """
    anchors_xyxy = cxcywh_to_xyxy(anchors_cxcywh)
    gt_xyxy = cxcywh_to_xyxy(gt_boxes)
    iou = pairwise_iou(anchors_xyxy[None], gt_xyxy)          # (B, N, M)
    iou = jnp.where(gt_valid[:, None, :], iou, -1.0)

    best_gt_iou = jnp.max(iou, axis=-1)                       # (B, N)
    best_gt = jnp.argmax(iou, axis=-1)                        # (B, N)

    # force-match: the best anchor of each valid GT becomes positive.
    # Scatter with MAX semantics (-1 = no vote): every padded/invalid GT
    # votes for anchor 0 (argmax of its constant -1 IoU row), and a
    # plain .set there has undefined duplicate-index order that could
    # clobber a valid GT's force on the same anchor.
    best_anchor = jnp.argmax(iou, axis=1)                     # (B, M)
    b, n, m = iou.shape
    bidx = jnp.arange(b)[:, None].repeat(m, 1)
    gt_idx = jnp.arange(m)[None, :].repeat(b, 0)
    force_votes = jnp.full((b, n), -1, jnp.int32).at[bidx, best_anchor].max(
        jnp.where(gt_valid, gt_idx, -1))
    force = force_votes >= 0

    positive = (best_gt_iou >= POS_IOU) | force
    negative = (best_gt_iou < NEG_IOU) & ~force
    matched_gt = jnp.where(force, jnp.maximum(force_votes, 0),
                           best_gt)                           # (B, N)

    # one-hot contraction, not take_along_axis: XLA's dynamic gather
    # from the tiny GT table serializes on TPU (see losses.onehot_gather)
    tgt_cls = onehot_gather(gt_classes, matched_gt)           # (B, N)
    cls_onehot = jax.nn.one_hot(tgt_cls, num_classes) * positive[..., None]
    fl = focal_loss(cls_logits, cls_onehot)                   # (B, N, C)
    fl_mask = (positive | negative)[..., None]
    num_pos = jnp.maximum(jnp.sum(positive), 1.0)
    cls_loss = jnp.sum(fl * fl_mask) / num_pos

    tgt_boxes = onehot_gather(gt_boxes, matched_gt)           # (B, N, 4)
    reg_tgt = encode(tgt_boxes, anchors_cxcywh[None])
    reg = jnp.sum(smooth_l1(box_deltas, reg_tgt), -1)         # (B, N)
    box_loss = jnp.sum(reg * positive) / num_pos

    return {"cls": cls_loss, "box": box_loss, "total": cls_loss + box_loss}
