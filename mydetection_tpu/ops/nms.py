"""Static-shape greedy NMS for TPU.

The reference dispatches to `torchvision.ops.nms` (C++/CUDA greedy
suppress loop with data-dependent shapes) [recalled; SURVEY.md §2.8].
That shape-dynamic pattern cannot live inside an XLA graph, so the
TPU-native design is (SURVEY.md §7):

    dense decode → padded top-k pre-select (fixed K) →
    blocked greedy NMS over the K boxes → fixed max_dets rows + mask.

Greedy NMS is inherently sequential, but only *between* boxes that
survive. The blocked formulation keeps the sequential chain short:
process boxes (sorted by score desc) in blocks of B. Within a block,
resolve suppression with a B-step `lax.fori_loop`; then one vectorized
(B × K) IoU mask application suppresses all later boxes at once. Total
sequential depth is K/B outer steps instead of K.

Two implementations with identical semantics:
  * `nms_padded` — pure jax/lax (runs everywhere; the oracle).
  * `mydetection_tpu.ops.pallas.nms_kernel.nms_pallas` — Pallas kernel
    (VMEM-resident IoU tiles); validated against the oracle in tests.

Class-wise NMS uses the classic coordinate-offset trick: shift each
class's boxes by `class_id * OFFSET` so cross-class pairs never overlap
— one kernel serves all classes (SURVEY.md §7 hard-part #1).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from mydetection_tpu.ops.boxes import pairwise_iou

CLASS_OFFSET = 8192.0  # > any input_size; guarantees class separation
NEG_INF = -1e30

# TPU hardware PartialReduce recall for approximate pre-NMS top-k
# (jax.lax.approx_max_k). Only candidates near the pre_nms-th rank can
# be missed — with trained weights those sit at/below the confidence
# threshold, and the reference's own pre-NMS cutoff (topk-1000/level
# [recalled; SURVEY.md §3.2]) is itself an arbitrary truncation of the
# same tail. Measured on v5e @608/batch-32: exact top-k 2.84 ms vs
# approx 1.20 ms over N=69 354; full RetinaNet postprocess 9.6 → 5.4 ms.
APPROX_RECALL = 0.95


def topk_select(x: jnp.ndarray, k: int, approx: bool):
    """top-k that uses the TPU approx_max_k path when `approx` and the
    input is large enough for the approximation to pay (and to be
    sound: approx_max_k needs n reasonably above k). Returns
    (values desc-sorted, indices) exactly like lax.top_k —
    aggregate_to_topk (default) ends with an exact top-k over the
    per-bin maxima, so ordering semantics are identical. On CPU/GPU
    approx_max_k falls back to an exact sort, so non-TPU callers and
    tests see exact results regardless of the flag."""
    if approx and x.shape[0] >= 4 * k:
        return jax.lax.approx_max_k(x, k, recall_target=APPROX_RECALL)
    return jax.lax.top_k(x, k)


def _blocked_greedy_keep(boxes: jnp.ndarray, valid: jnp.ndarray,
                         iou_thres: float, block: int) -> jnp.ndarray:
    """Keep-mask for score-sorted xyxy `boxes` (K, 4) with validity mask.

    K must be a multiple of `block`. Returns bool (K,).
    """
    k = boxes.shape[0]
    block = min(block, k)  # small pre_nms budgets (< block) still work
    assert k % block == 0, (k, block)
    num_blocks = k // block
    iou = pairwise_iou(boxes, boxes)  # (K, K)
    idx = jnp.arange(k)

    def outer(b, keep):
        start = b * block
        blk_rows = jax.lax.dynamic_slice(iou, (start, 0), (block, k))  # (B, K)
        blk_keep0 = jax.lax.dynamic_slice(keep, (start,), (block,))
        # Intra-block sequential resolve: box i suppresses later in-block
        # boxes with IoU > thres, but only if i itself is still kept.
        intra = jax.lax.dynamic_slice(blk_rows, (0, start), (block, block))

        def inner(i, bk):
            row = intra[i]
            sup = (row > iou_thres) & (jnp.arange(block) > i) & bk[i]
            return bk & ~sup

        blk_keep = jax.lax.fori_loop(0, block, inner, blk_keep0)
        # Apply resolved block to ALL later boxes in one vectorized pass.
        sup_any = jnp.any(blk_rows * blk_keep[:, None].astype(iou.dtype) > iou_thres, axis=0)
        later = idx >= (start + block)
        keep = keep & ~(sup_any & later)
        keep = jax.lax.dynamic_update_slice(keep, blk_keep, (start,))
        return keep

    keep = jax.lax.fori_loop(0, num_blocks, outer, valid)
    return keep & valid


def nms_padded_impl(boxes: jnp.ndarray, scores: jnp.ndarray, *,
               iou_thres: float = 0.45, block: int = 128) -> jnp.ndarray:
    """Greedy NMS over score-sorted padded boxes. Pure-jax oracle.

    Args:
      boxes:  (K, 4) xyxy, sorted by descending score.
      scores: (K,) — padding rows carry score <= NEG_INF/2.
    Returns bool keep mask (K,).
    """
    valid = scores > NEG_INF / 2
    return _blocked_greedy_keep(boxes, valid, iou_thres, block)


def batched_class_nms_impl(boxes: jnp.ndarray, scores: jnp.ndarray,
                           classes: jnp.ndarray, *, iou_thres: float = 0.45,
                           block: int = 128) -> jnp.ndarray:
    """Per-class NMS via the class-offset trick. Shapes as `nms_padded`."""
    offset_boxes = boxes + (classes.astype(boxes.dtype) * CLASS_OFFSET)[:, None]
    return nms_padded_impl(offset_boxes, scores, iou_thres=iou_thres, block=block)


# Standalone jitted wrappers. Inside a larger traced graph call the
# *_impl versions — nested jit explodes XLA compile time.
nms_padded = jax.jit(nms_padded_impl, static_argnames=("iou_thres", "block"))
batched_class_nms = jax.jit(batched_class_nms_impl,
                            static_argnames=("iou_thres", "block"))


def postprocess_impl(boxes: jnp.ndarray, scores: jnp.ndarray | None = None, *,
                     conf_thres: float, iou_thres: float,
                     classes: jnp.ndarray | None = None,
                     score_logits: jnp.ndarray | None = None,
                     score_mul: jnp.ndarray | None = None,
                     gate_logits: jnp.ndarray | None = None,
                     pre_nms: int = 1024, max_dets: int = 100,
                     block: int = 128, use_pallas: bool = False,
                     multi_label: bool = True,
                     approx_topk: bool = False) -> dict:
    """Dense predictions → final padded detections. Fully static shapes.

    This replaces the reference's host-side `conf filter → per-class NMS`
    (data-dependent shapes, SURVEY.md §3.2) with an in-graph pipeline:

      1. flatten (N boxes × C classes) scores,
      2. top-`pre_nms` (box, class) pairs,
      3. class-offset greedy NMS,
      4. top-`max_dets` kept rows + validity mask.

    `multi_label=False` takes each box's best class only (max/argmax) —
    the YOLO decode idiom the reference uses for the darknet-family
    heads [recalled; SURVEY.md §2.5 per-branch decode]; RetinaNet/FCOS
    emit (box, class) pairs. Single-label also skips the second-stage
    top-k (a full 81,920-element sort at C=80 — ~3 ms/batch-32 on TPU).

    Args:
      boxes:  (N, 4) xyxy in network coords.
      scores: (N, C) final per-class scores (already obj*cls etc.), or
              (N,) pre-reduced per-box scores with `classes` (N,) given
              (the single-label decode fast path — the class reduction
              then fuses into the head instead of re-reading N×C here).
      score_logits: alternative to `scores` for multi-label heads:
              (N, C) class LOGITS in their native (bf16) dtype. The
              sigmoid is deferred until AFTER the stage-1 box top-k —
              sigmoid is monotone so the selection is identical, but
              the (N, C) float32 probability tensor (710 MB at
              RetinaNet-608/batch-32) never materializes; measured
              ~2x faster postprocess on v5e. `score_mul` (N,) is an
              optional per-box factor applied OUTSIDE the sigmoid
              (FCOS centerness: score = sigmoid(cls)·sigmoid(ctr)).
      gate_logits: optional (N,) precomputed max-over-classes LOGIT per
              box (native dtype), usually reduced per level inside the
              head (models/retinanet.apply(with_gate=True)). Skips the
              dense reduce here, whose N-minor layout demand makes XLA
              relayout the whole (N, C) logits tensor (1.37 ms/batch-32
              at RetinaNet-608 in the XPlane profile). Bit-exact with
              the dense reduce. Only used on the multi-label
              score_logits path.
    Returns dict of (max_dets,...) arrays: boxes, scores, classes, valid.
    """
    if score_logits is not None:
        assert scores is None, "pass scores or score_logits, not both"
        n, c = score_logits.shape
        kb = min(pre_nms, n)
        # per-box gate on raw logits (native dtype; max is monotone
        # under sigmoid) — precomputed per level in the head when
        # gate_logits is given (saves the dense N-minor relayout)
        gmax = (gate_logits if gate_logits is not None
                else jnp.max(score_logits, axis=1))
        gate = jax.nn.sigmoid(gmax.astype(jnp.float32))
        box_max = gate if score_mul is None else gate * score_mul
        if not multi_label:
            # single-label decode on the deferred-sigmoid path: best
            # class per box (argmax is sigmoid-invariant), then the
            # same conf-gate → top-k → NMS as the dense single-label
            # branch below. Honors ModelConfig(multi_label=False)
            # overrides on retinanet/fcos.
            box_cls = jnp.argmax(score_logits, axis=1).astype(jnp.int32)
            gated = jnp.where(box_max >= conf_thres, box_max, NEG_INF)
            top_scores, box_idx = topk_select(gated, kb, approx_topk)
            if kb < pre_nms:
                pad = pre_nms - kb
                top_scores = jnp.concatenate(
                    [top_scores, jnp.full((pad,), NEG_INF, top_scores.dtype)])
                box_idx = jnp.concatenate(
                    [box_idx, jnp.zeros((pad,), box_idx.dtype)])
            return _nms_and_select(boxes[box_idx], top_scores,
                                   box_cls[box_idx], iou_thres=iou_thres,
                                   max_dets=max_dets, block=block,
                                   use_pallas=use_pallas)
        _, box_sel = topk_select(box_max, kb, approx_topk)
        sel_scores = jax.nn.sigmoid(
            score_logits[box_sel].astype(jnp.float32))   # (kb, C)
        if score_mul is not None:
            sel_scores = sel_scores * score_mul[box_sel][:, None]
        return _multilabel_pairs(boxes, sel_scores, box_sel,
                                 conf_thres=conf_thres, iou_thres=iou_thres,
                                 pre_nms=pre_nms, max_dets=max_dets,
                                 block=block, use_pallas=use_pallas,
                                 approx_topk=approx_topk)
    if scores.ndim == 1:
        if classes is None:
            raise ValueError("1-D scores require a classes vector")
        multi_label = False
    if not multi_label:
        n = scores.shape[0]
        if scores.ndim == 1:
            box_max, box_cls = scores, classes.astype(jnp.int32)
        else:
            box_max = jnp.max(scores, axis=1)                # (N,)
            box_cls = jnp.argmax(scores, axis=1).astype(jnp.int32)
        gated = jnp.where(box_max >= conf_thres, box_max, NEG_INF)
        k = min(pre_nms, n)
        top_scores, box_idx = topk_select(gated, k, approx_topk)
        if k < pre_nms:
            pad = pre_nms - k
            top_scores = jnp.concatenate(
                [top_scores, jnp.full((pad,), NEG_INF, top_scores.dtype)])
            box_idx = jnp.concatenate(
                [box_idx, jnp.zeros((pad,), box_idx.dtype)])
        cls_idx = box_cls[box_idx]
        sel_boxes = boxes[box_idx]                          # (pre_nms, 4)
        return _nms_and_select(sel_boxes, top_scores, cls_idx,
                               iou_thres=iou_thres, max_dets=max_dets,
                               block=block, use_pallas=use_pallas)
    # Two-stage EXACT top-k over (box, class) pairs — ~8x cheaper than
    # one top_k over all N*C scores (21 ms -> small at batch 32/TPU).
    # Stage 1 keeps the pre_nms boxes with the highest max-class score:
    # any pair in the true top-pre_nms has score <= its box's max, and
    # more than pre_nms boxes above the pair cutoff would mean more
    # than pre_nms pairs above it — contradiction. So (modulo ties at
    # the cutoff) the surviving boxes host every true top pair.
    n, c = scores.shape
    kb = min(pre_nms, n)
    box_max = jnp.max(scores, axis=1)                       # (N,)
    _, box_sel = topk_select(box_max, kb, approx_topk)      # (kb,)
    sel_scores = scores[box_sel]                            # (kb, C)
    return _multilabel_pairs(boxes, sel_scores, box_sel,
                             conf_thres=conf_thres, iou_thres=iou_thres,
                             pre_nms=pre_nms, max_dets=max_dets,
                             block=block, use_pallas=use_pallas,
                             approx_topk=approx_topk)


def _multilabel_pairs(boxes, sel_scores, box_sel, *, conf_thres, iou_thres,
                      pre_nms, max_dets, block, use_pallas,
                      approx_topk: bool = False) -> dict:
    """Stage 2 of the multi-label path: top-pre_nms (box, class) pairs
    over the stage-1-selected boxes, then class-offset NMS."""
    kb, c = sel_scores.shape
    flat = sel_scores.reshape(-1)
    flat = jnp.where(flat >= conf_thres, flat, NEG_INF)
    k = min(pre_nms, kb * c)
    top_scores, top_idx = topk_select(flat, k, approx_topk)
    if k < pre_nms:  # pad up to static pre_nms
        pad = pre_nms - k
        top_scores = jnp.concatenate([top_scores, jnp.full((pad,), NEG_INF, top_scores.dtype)])
        top_idx = jnp.concatenate([top_idx, jnp.zeros((pad,), top_idx.dtype)])
    box_idx = box_sel[top_idx // c]
    cls_idx = (top_idx % c).astype(jnp.int32)
    sel_boxes = boxes[box_idx]  # (pre_nms, 4)

    return _nms_and_select(sel_boxes, top_scores, cls_idx,
                           iou_thres=iou_thres, max_dets=max_dets,
                           block=block, use_pallas=use_pallas)


def _nms_and_select(sel_boxes, top_scores, cls_idx, *, iou_thres, max_dets,
                    block, use_pallas) -> dict:
    """Class-offset NMS over sorted candidates + final top-max_dets."""
    if use_pallas:
        from mydetection_tpu.ops.pallas.nms_kernel import nms_pallas_impl
        offset = sel_boxes + (cls_idx.astype(sel_boxes.dtype) * CLASS_OFFSET)[:, None]
        keep = nms_pallas_impl(offset, top_scores, iou_thres=iou_thres, block=block)
    else:
        keep = batched_class_nms_impl(sel_boxes, top_scores, cls_idx,
                                      iou_thres=iou_thres, block=block)

    final_scores = jnp.where(keep, top_scores, NEG_INF)
    out_scores, order = jax.lax.top_k(final_scores, max_dets)
    out_valid = out_scores > NEG_INF / 2
    out_boxes = sel_boxes[order]
    out_classes = cls_idx[order]
    zero = jnp.zeros_like(out_scores)
    return {
        "boxes": jnp.where(out_valid[:, None], out_boxes, 0.0),
        "scores": jnp.where(out_valid, out_scores, zero),
        "classes": jnp.where(out_valid, out_classes, -1),
        "valid": out_valid,
    }


postprocess = jax.jit(
    postprocess_impl,
    static_argnames=("iou_thres", "pre_nms", "max_dets", "block",
                     "use_pallas", "multi_label", "approx_topk"),
)
# Call `postprocess_impl` (undecorated) when composing into a larger
# jitted graph — nesting the jitted wrapper inside another trace
# explodes XLA compile time; `postprocess` is for standalone use.
