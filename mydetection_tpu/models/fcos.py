"""FCOS head: anchor-free per-pixel regression + centerness.

Reference parity: `models/fcos.py` in duanzhiihao/myDetection
[recalled; SURVEY.md §2.7] — FCOS (arXiv 1904.01355): per-location
(l, t, r, b) distance regression, a centerness branch, per-level
learnable scalar scales, group-norm conv towers, focal classification
loss, IoU box loss, center-sampling target assignment. No anchor
tables anywhere [spec].

TPU-native: locations are a static constant per input size; target
assignment is one vectorized (B, N, M) candidate tensor (inside-box ∧
center-sample ∧ level-range, min-area tie-break) — no loops.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

from mydetection_tpu.losses import (bce_with_logits, focal_loss, giou_loss,
                                    onehot_gather)
from mydetection_tpu.models.layers import KeyGen, Params, conv2d, conv_init
from mydetection_tpu.ops.boxes import cxcywh_to_xyxy

STRIDES = (8, 16, 32, 64, 128)
# per-level regression range for max(l,t,r,b)
LEVEL_RANGES = ((0, 64), (64, 128), (128, 256), (256, 512), (512, 1e8))
PRIOR_PROB = 0.01
CENTER_RADIUS = 1.5  # center-sampling radius in stride units
GN_GROUPS = 32


def level_shapes(input_size: int) -> list[tuple[int, int]]:
    return [(math.ceil(input_size / s), math.ceil(input_size / s))
            for s in STRIDES]


def generate_locations(input_size: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """All pyramid locations: ((N, 2) xy pixels, (N,) stride per loc).

    Locations sit at grid·stride — torchvision's convention (FCOS there
    regresses against anchor centers at arange(grid)·stride), NOT the
    paper's floor(s/2)+grid·s cell centers; imported torchvision
    weights decode against these exact points.
    """
    locs, strides = [], []
    for stride, (h, w) in zip(STRIDES, level_shapes(input_size)):
        gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        xy = jnp.stack([gx * stride, gy * stride], -1)
        locs.append(xy.reshape(-1, 2))
        strides.append(jnp.full((h * w,), float(stride), jnp.float32))
    return jnp.concatenate(locs, 0), jnp.concatenate(strides, 0)


# ---------------------------------------------------------------------------
# params + apply
# ---------------------------------------------------------------------------

def _gn_init(c: int) -> Params:
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32)}


def group_norm(x: jnp.ndarray, p: Params, *, groups: int = GN_GROUPS) -> jnp.ndarray:
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h, w, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 4), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
    xf = xf.reshape(b, h, w, c)
    return (xf * p["scale"] + p["bias"]).astype(x.dtype)


def init(rng: jax.Array, num_classes: int = 80, *, channels: int = 256) -> Params:
    keys = KeyGen(rng)

    def tower() -> Params:
        # N(0, 0.01) like torchvision's FCOSClassificationHead — the GN
        # renormalizes tower activations, but the out convs below have
        # no norm after them, and He-scale out weights swamp the focal
        # prior bias (see conv_init's docstring)
        p: Params = {}
        for i in range(4):
            p[f"conv{i}"] = conv_init(keys(), 3, channels, channels,
                                      bias=True, std=0.01)
            p[f"gn{i}"] = _gn_init(channels)
        return p

    cls_bias = -math.log((1 - PRIOR_PROB) / PRIOR_PROB)
    p: Params = {
        "cls_tower": tower(),
        "box_tower": tower(),
        "cls_out": conv_init(keys(), 3, channels, num_classes, bias=True,
                             std=0.01),
        "box_out": conv_init(keys(), 3, channels, 4, bias=True, std=0.01),
        "ctr_out": conv_init(keys(), 3, channels, 1, bias=True, std=0.01),
        "scales": jnp.ones((len(STRIDES),), jnp.float32),
    }
    p["cls_out"]["b"] = jnp.full((num_classes,), cls_bias, jnp.float32)
    return p


def _tower(p: Params, x, *, compute_dtype, fused_gn: bool = False):
    """fused_gn: route the bias+GN+ReLU between convs through the
    Pallas kernel (ops/pallas/gn_kernel.py) — one VMEM-resident HBM
    pass per image instead of XLA's ~3 un-fusable passes. Measured on
    v5e @608 batch 32: the 2-tower head drops 56.95 → 48.55 ms
    (benchmarks/fcos_gn_experiments.py; compiled max |Δ| vs this
    pure-jax path 1.7e-6 f32). Trainable since round 5: the call
    routes through `bias_gn_relu_trainable` (custom_vjp pairing the
    same forward with a fused single-pass backward kernel, gradients
    oracle-pinned in tests/test_fcos.py), so the registry no longer
    gates on `train`.

    Batch-size gate (shape is static at trace time): at batch 1 the 40
    per-image kernel invocations (8 tower GNs × 5 levels) don't
    pipeline and their fixed dispatch overhead DOUBLES single-image
    latency (measured 2.95 → 5.8 ms @608); from batch 4 up the grid
    amortizes and the kernel wins (10.2 → 9.97 ms @b4, 14.2 → 13.96
    @b8, 54.7 → 49.7 @b32). Each batch bucket compiles its own graph,
    so the gate picks the right path per bucket at zero runtime cost.

    VMEM gate (ADVICE r4): the kernel stages one whole (H·W, C) slab
    per grid step with an f32 working set ~3× the slab (xf, xf², y)
    plus the native-dtype in/out blocks; it was validated at ≤1024²
    (P3 slab ≤16 MB → ≤50 MB working set) under a 100 MB
    vmem_limit_bytes on v5e. Above a 64 MB working-set estimate
    (P3 @ >1152² input, or smaller-VMEM generations' safety margin)
    fall back to the XLA GN path rather than risk a Mosaic
    compile-time VMEM overflow."""
    hw_c_bytes = x.shape[1] * x.shape[2] * x.shape[3] * 4 * 3
    if fused_gn and x.shape[0] >= 4 and hw_c_bytes <= 64 * 1024 * 1024:
        from mydetection_tpu.ops.pallas.gn_kernel import (
            bias_gn_relu_trainable,
        )
        for i in range(4):
            w = p[f"conv{i}"]
            x = conv2d(x, w["w"], compute_dtype=compute_dtype)
            gn = p[f"gn{i}"]
            # differentiable wrapper: the primal is the same fused
            # kernel (zero inference cost); under jax.grad it pairs
            # with the fused single-pass backward (custom_vjp)
            x = bias_gn_relu_trainable(x, w["b"], gn["scale"], gn["bias"],
                                       groups=GN_GROUPS)
        return x
    for i in range(4):
        w = p[f"conv{i}"]
        x = conv2d(x, w["w"], compute_dtype=compute_dtype)
        x = x + w["b"].astype(x.dtype)
        x = group_norm(x, p[f"gn{i}"])
        x = jnp.maximum(x, 0.0)
    return x


def _head_conv(p: Params, x, *, compute_dtype):
    y = conv2d(x, p["w"], compute_dtype=compute_dtype)
    return y + p["b"].astype(y.dtype)


def apply(params: Params, pyramid: Sequence[jnp.ndarray], *,
          num_classes: int = 80, compute_dtype=None,
          ltrb_decode: str = "exp", with_gate: bool = False,
          fused_gn: bool = False):
    """[P3..P7] → (cls (B,N,C), ltrb (B,N,4) px, ctr (B,N)
    [, gate (B,N) native dtype when with_gate]), f32.

    with_gate: also return each location's max-over-classes logit,
    computed per level so the postprocess never reduces (and XLA never
    relayouts) the concatenated dense logits — see
    models/retinanet.apply, same rationale, bit-exact.

    ltrb is already decoded to pixel distances. Two conventions exist:
      * "exp"    — the FCOS PAPER (and the reference's idiom): exp(s_l ·
        raw) · stride with learnable per-level scales s_l. Default; use
        for models trained with THIS framework.
      * "linear" — TORCHVISION's FCOS: relu(raw) · stride (its
        regression head applies F.relu and BoxLinearCoder multiplies by
        the per-level anchor size = stride; no learnable scales).
        REQUIRED when importing torchvision checkpoints — the exp
        decode turns a trained raw value of 2.0 at P3 into e²·8≈59 px
        instead of 16 px and mAP collapses.
    """
    if ltrb_decode not in ("exp", "linear"):
        raise ValueError(f"ltrb_decode must be 'exp' or 'linear', got "
                         f"{ltrb_decode!r}")
    cls_f, box_f, ctr_f, gate_f = [], [], [], []
    for li, feat in enumerate(pyramid):
        b, h, w, _ = feat.shape
        ct = _tower(params["cls_tower"], feat, compute_dtype=compute_dtype,
                    fused_gn=fused_gn)
        bt = _tower(params["box_tower"], feat, compute_dtype=compute_dtype,
                    fused_gn=fused_gn)
        cls = _head_conv(params["cls_out"], ct, compute_dtype=compute_dtype)
        raw_box = _head_conv(params["box_out"], bt, compute_dtype=compute_dtype)
        ctr = _head_conv(params["ctr_out"], bt, compute_dtype=compute_dtype)
        if ltrb_decode == "exp":
            scale = params["scales"][li]
            ltrb = jnp.exp(jnp.clip(raw_box.astype(jnp.float32) * scale,
                                    -10, 10))
        else:
            ltrb = jnp.maximum(raw_box.astype(jnp.float32), 0.0)
        ltrb = ltrb * float(STRIDES[li])
        # cls logits stay in the conv compute dtype (bf16 on TPU): the
        # postprocess consumes logits directly (score_logits path),
        # deferring the f32 sigmoid past top-k selection
        cls = cls.reshape(b, h * w, num_classes)
        cls_f.append(cls)
        if with_gate:
            gate_f.append(jnp.max(cls, axis=-1))
        box_f.append(ltrb.reshape(b, h * w, 4))
        ctr_f.append(ctr.astype(jnp.float32).reshape(b, h * w))
    out = (jnp.concatenate(cls_f, 1), jnp.concatenate(box_f, 1),
           jnp.concatenate(ctr_f, 1))
    if with_gate:
        return out + (jnp.concatenate(gate_f, 1),)
    return out


def decode_boxes(ltrb, locations) -> jnp.ndarray:
    """ltrb pixel distances + locations → (B, N, 4) xyxy."""
    xy = locations[None]
    return jnp.concatenate([xy - ltrb[..., 0:2], xy + ltrb[..., 2:4]], -1)


def decode(cls_logits, ltrb, ctr_logits, locations):
    """Head outputs + locations → dense detections with materialized
    scores. Score = cls_prob * centerness_prob (the FCOS ranking
    score). Returns {"boxes": (B,N,4) xyxy, "scores": (B,N,C) f32}.

    The production pipeline instead passes raw cls logits +
    sigmoid(ctr) to the postprocess (registry forward_dense →
    score_logits/score_mul) so the dense f32 probability tensor never
    materializes; this form is kept for tests and direct use.
    """
    scores = jax.nn.sigmoid(cls_logits.astype(jnp.float32)) \
        * jax.nn.sigmoid(ctr_logits)[..., None]
    return {"boxes": decode_boxes(ltrb, locations), "scores": scores}


# ---------------------------------------------------------------------------
# loss
# ---------------------------------------------------------------------------

def _assign(locations, strides, gt_xyxy, gt_valid):
    """Vectorized FCOS target assignment for one batch.

    Returns (positive (B,N), matched_gt (B,N), tgt_ltrb (B,N,4),
    centerness (B,N)).
    """
    x, y = locations[:, 0], locations[:, 1]                   # (N,)
    x1, y1, x2, y2 = (gt_xyxy[..., i] for i in range(4))      # (B, M)
    l = x[None, :, None] - x1[:, None, :]                     # (B, N, M)
    t = y[None, :, None] - y1[:, None, :]
    r = x2[:, None, :] - x[None, :, None]
    b = y2[:, None, :] - y[None, :, None]
    ltrb = jnp.stack([l, t, r, b], -1)                        # (B, N, M, 4)
    inside = jnp.min(ltrb, -1) > 0

    # center sampling: location within radius*stride of the GT center
    cx = (x1 + x2) * 0.5
    cy = (y1 + y2) * 0.5
    rad = CENTER_RADIUS * strides[None, :, None]
    near = ((jnp.abs(x[None, :, None] - cx[:, None, :]) < rad)
            & (jnp.abs(y[None, :, None] - cy[:, None, :]) < rad))

    maxd = jnp.max(ltrb, -1)                                  # (B, N, M)
    lo = jnp.zeros_like(strides)
    hi = jnp.zeros_like(strides)
    for s, (a, c) in zip(STRIDES, LEVEL_RANGES):
        lo = jnp.where(strides == s, a, lo)
        hi = jnp.where(strides == s, c, hi)
    in_range = (maxd >= lo[None, :, None]) & (maxd <= hi[None, :, None])

    candidate = inside & near & in_range & gt_valid[:, None, :]
    area = (x2 - x1) * (y2 - y1)                              # (B, M)
    big = jnp.float32(1e18)
    cand_area = jnp.where(candidate, area[:, None, :], big)
    matched = jnp.argmin(cand_area, -1)                       # (B, N)
    positive = jnp.any(candidate, -1)

    # Select the matched GT box with a one-hot contraction and rebuild
    # its ltrb directly — bitwise-identical to gathering rows out of
    # the (B, N, M, 4) tensor (same subtraction, same operands), but
    # avoids both the huge gather and XLA's serialized dynamic-gather
    # lowering on TPU (see losses.onehot_gather).
    sel = onehot_gather(jnp.stack([x1, y1, x2, y2], -1), matched)  # (B, N, 4)
    tgt = jnp.stack([x[None, :] - sel[..., 0], y[None, :] - sel[..., 1],
                     sel[..., 2] - x[None, :], sel[..., 3] - y[None, :]],
                    -1)                                       # (B, N, 4)
    lr = tgt[..., 0::2]
    tb = tgt[..., 1::2]
    ctr_tgt = jnp.sqrt(jnp.clip(
        (jnp.min(lr, -1) / jnp.maximum(jnp.max(lr, -1), 1e-8))
        * (jnp.min(tb, -1) / jnp.maximum(jnp.max(tb, -1), 1e-8)), 0.0, 1.0))
    return positive, matched, tgt, ctr_tgt


def loss(cls_logits, ltrb_pred, ctr_logits, locations, strides,
         gt_boxes, gt_classes, gt_valid, *, num_classes: int = 80) -> dict:
    """Focal(cls) + GIoU(box) + BCE(centerness), FCOS assignment.

    gt_boxes (B, M, 4) cxcywh net pixels, padded with gt_valid.
    """
    gt_xyxy = cxcywh_to_xyxy(gt_boxes)
    positive, matched, tgt_ltrb, ctr_tgt = _assign(
        locations, strides, gt_xyxy, gt_valid)

    tgt_cls = onehot_gather(gt_classes, matched)
    cls_onehot = jax.nn.one_hot(tgt_cls, num_classes) * positive[..., None]
    num_pos = jnp.maximum(jnp.sum(positive), 1.0)
    cls_loss = jnp.sum(focal_loss(cls_logits, cls_onehot)) / num_pos

    # one geometry definition for training and inference: a change to
    # the location/decode convention cannot silently diverge the loss
    pred_xyxy = decode_boxes(ltrb_pred, locations)
    tgt_xyxy = decode_boxes(tgt_ltrb, locations)
    g = giou_loss(pred_xyxy, tgt_xyxy)                        # (B, N)
    # centerness-weighted box loss (FCOS normalization)
    w = ctr_tgt * positive
    box_loss = jnp.sum(g * w) / jnp.maximum(jnp.sum(w), 1e-6)

    ctr_bce = bce_with_logits(ctr_logits, ctr_tgt)
    ctr_loss = jnp.sum(ctr_bce * positive) / num_pos

    return {"cls": cls_loss, "box": box_loss, "ctr": ctr_loss,
            "total": cls_loss + box_loss + ctr_loss}
