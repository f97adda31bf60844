"""Brute-force COCO bbox AP oracle — deliberately slow, written for
OBVIOUSNESS, as an independent check on mydetection_tpu/eval/cocoeval.py
(SURVEY.md §4.1 golden-file strategy; VERDICT r2 #4: the pycocotools
differential can never arm in this image, so the numpy evaluator needs
a second, structurally different implementation to diff against).

Design rules (deliberately the OPPOSITE of the production evaluator):
  * no shared precomputation — every (category, areaRng, maxDet,
    iouThr) cell redoes its own matching from the raw dict rows;
  * scalar Python loops everywhere, one decision per line;
  * IoU recomputed per (det, gt) pair with plain floats.

Protocol implemented directly from the published COCO evaluation
rules (the same ones pycocotools implements):
  1. per (image, category): sort detections by score desc, truncate to
     maxDet; sort GTs so non-ignored come first (ignored = iscrowd or
     area outside the range);
  2. greedy matching per IoU threshold: each detection takes the
     not-yet-matched GT with the highest IoU >= thr; already-matched
     non-crowd GTs are skipped; crowd GTs may be matched repeatedly
     (their "IoU" divides by det area only); once the best candidate
     is a non-ignored GT, ignored GTs are not considered further;
  3. a detection matched to an ignored GT is ignored; an unmatched
     detection outside the area range is ignored;
  4. pool all images' detections per category, sort by score desc
     (stable), cumulate TP/FP over non-ignored detections;
  5. precision is made monotone non-increasing from the right; AP is
     the mean of precision sampled at 101 recall points (searchsorted
     left); categories with zero non-ignored GT contribute -1 (skipped
     in the final mean).
"""

from __future__ import annotations

import numpy as np

IOU_THRS = [0.5 + 0.05 * i for i in range(10)]
# i*0.01 matches np.linspace's arithmetic (i * rounded-step) except the
# endpoint, which linspace pins to exactly 1.0 (100*0.01 overshoots by
# 1 ulp and would exclude recall == 1.0 at the last sample)
REC_THRS = [0.01 * i for i in range(100)] + [1.0]
AREA_RNG = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}
MAX_DETS = (1, 10, 100)


def _iou_one(det_xywh, gt_xywh, crowd: bool) -> float:
    dx1, dy1, dw, dh = det_xywh
    gx1, gy1, gw, gh = gt_xywh
    ix = min(dx1 + dw, gx1 + gw) - max(dx1, gx1)
    iy = min(dy1 + dh, gy1 + gh) - max(dy1, gy1)
    if ix <= 0 or iy <= 0:
        return 0.0
    inter = ix * iy
    if crowd:
        union = dw * dh
    else:
        union = dw * dh + gw * gh - inter
    if union <= 0:
        return 0.0
    return inter / union


def _match_one_image(dts, gts, thr: float, area_rng, max_det: int):
    """Greedy matching for one (image, category, thr, area, maxDet).

    dts: list of {score, bbox} sorted by score desc (pre-sorted by the
         caller; truncation to max_det happens here).
    gts: list of {bbox, area, iscrowd}.
    Returns list of (score, is_tp, is_ignored) per kept detection.
    """
    dts = dts[:max_det]
    gt_ignored = []
    for g in gts:
        area = g.get("area", g["bbox"][2] * g["bbox"][3])
        ignored = bool(g.get("iscrowd", 0)) or bool(g.get("ignore", 0)) \
            or area < area_rng[0] or area > area_rng[1]
        gt_ignored.append(ignored)
    # evaluation order: all non-ignored GTs, then all ignored GTs
    gt_order = [i for i in range(len(gts)) if not gt_ignored[i]] + \
               [i for i in range(len(gts)) if gt_ignored[i]]

    gt_matched = [False] * len(gts)
    out = []
    for d in dts:
        best_iou = thr
        best_gi = -1
        for gi in gt_order:
            g = gts[gi]
            crowd = bool(g.get("iscrowd", 0))
            if gt_matched[gi] and not crowd:
                continue
            if best_gi >= 0 and not gt_ignored[best_gi] and gt_ignored[gi]:
                # a real match is in hand and only ignored GTs remain
                break
            iou = _iou_one(d["bbox"], g["bbox"], crowd)
            if iou < best_iou:
                continue
            best_iou = iou
            best_gi = gi
        if best_gi >= 0:
            gt_matched[best_gi] = True
            out.append((d["score"], True, gt_ignored[best_gi]))
        else:
            d_area = d["bbox"][2] * d["bbox"][3]
            out_of_range = d_area < area_rng[0] or d_area > area_rng[1]
            out.append((d["score"], False, out_of_range))
    num_real_gt = sum(1 for ign in gt_ignored if not ign)
    return out, num_real_gt


def _pr_curve(rows, num_gt: int):
    """rows: pooled (score, is_tp, is_ignored) across images for one
    (category, thr, area, maxDet) cell. Returns (ap, final_recall) or
    None when the cell has no GT."""
    if num_gt == 0:
        return None
    # stable sort by score desc (ties keep image pooling order, matching
    # np.argsort(-scores, kind='mergesort') in the production evaluator)
    rows = sorted(rows, key=lambda r: -r[0])
    tp, fp = 0, 0
    precisions, recalls = [], []
    for score, is_tp, is_ign in rows:
        if is_ign:
            continue
        if is_tp:
            tp += 1
        else:
            fp += 1
        precisions.append(tp / (tp + fp))
        recalls.append(tp / num_gt)
    if not precisions:
        return 0.0, 0.0
    # monotone non-increasing from the right
    for i in range(len(precisions) - 2, -1, -1):
        precisions[i] = max(precisions[i], precisions[i + 1])
    # 101-point interpolation: first index with recall >= r
    ap_samples = []
    for r_thr in REC_THRS:
        idx = None
        for i, rc in enumerate(recalls):
            if rc >= r_thr:  # == searchsorted(recalls, r_thr, 'left')
                idx = i
                break
        ap_samples.append(precisions[idx] if idx is not None else 0.0)
    return float(np.mean(ap_samples)), recalls[-1]


def brute_evaluate(gt: dict, results: list[dict]) -> dict:
    """Full 12-stat COCO bbox summary, brute force."""
    cat_ids = sorted(c["id"] for c in gt.get("categories", []))
    img_ids = sorted(im["id"] for im in gt.get("images", []))

    gts_by = {}
    for ann in gt.get("annotations", []):
        gts_by.setdefault((ann["image_id"], ann["category_id"]), []).append(ann)
    dts_by = {}
    for r in results:
        dts_by.setdefault((r["image_id"], r["category_id"]), []).append(r)
    for key in dts_by:
        dts_by[key].sort(key=lambda r: -r["score"])

    # ap[thr][cat][area][maxdet], rec likewise — explicit nests
    ap = {}
    rec = {}
    for thr in IOU_THRS:
        for cat in cat_ids:
            for area_name, area_rng in AREA_RNG.items():
                for max_det in MAX_DETS:
                    rows, num_gt = [], 0
                    for img in img_ids:
                        dts = dts_by.get((img, cat), [])
                        gts = gts_by.get((img, cat), [])
                        if not dts and not gts:
                            continue
                        r, n = _match_one_image(dts, gts, thr, area_rng,
                                                max_det)
                        rows.extend(r)
                        num_gt += n
                    cell = _pr_curve(rows, num_gt)
                    key = (thr, cat, area_name, max_det)
                    if cell is None:
                        ap[key] = -1.0
                        rec[key] = -1.0
                    else:
                        ap[key], rec[key] = cell

    def mean_ap(thrs, area, max_det):
        vals = [ap[(t, c, area, max_det)] for t in thrs for c in cat_ids]
        vals = [v for v in vals if v > -1]
        return float(np.mean(vals)) if vals else -1.0

    def mean_ar(area, max_det):
        vals = [rec[(t, c, area, max_det)] for t in IOU_THRS for c in cat_ids]
        vals = [v for v in vals if v > -1]
        return float(np.mean(vals)) if vals else -1.0

    return {
        "AP": mean_ap(IOU_THRS, "all", 100),
        "AP50": mean_ap([IOU_THRS[0]], "all", 100),
        "AP75": mean_ap([IOU_THRS[5]], "all", 100),
        "AP_small": mean_ap(IOU_THRS, "small", 100),
        "AP_medium": mean_ap(IOU_THRS, "medium", 100),
        "AP_large": mean_ap(IOU_THRS, "large", 100),
        "AR1": mean_ar("all", 1),
        "AR10": mean_ar("all", 10),
        "AR100": mean_ar("all", 100),
        "AR_small": mean_ar("small", 100),
        "AR_medium": mean_ar("medium", 100),
        "AR_large": mean_ar("large", 100),
    }
