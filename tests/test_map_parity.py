"""Offline mAP-parity differential: full torch detect pipeline vs ours.

VERDICT r2 #2 / SURVEY.md §3.5: the ±0.1-AP weight-import gate cannot
run offline (no pretrained checkpoints, no COCO). The strongest
obtainable version composes the torch mirror modules
(test_torch_parity) into COMPLETE torch detect pipelines — forward →
decode → conf filter → per-class greedy NMS (the reference's dynamic
host-side postprocess, SURVEY.md §3.2) — runs both stacks over a
synthetic dataset with shared weights, scores BOTH with
eval/cocoeval.py, and asserts the final metric agrees to |ΔAP| ≤ 1e-3.

This upgrades the parity proxy from "activations match" to "the METRIC
matches": it exercises weight import, preprocessing, decode, the
dynamic→static postprocess redesign (padded top-k + class-offset
blocked NMS vs threshold→NMS), coordinate conventions, and COCO-row
export, end to end.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_torch_parity import (  # noqa: E402
    _TorchDarknet53,
    _TorchYoloNeck,
    _full_state,
    _randomize_bn,
    _seed_all,
    _torch_final,
    _torch_fpn,
    _torch_subnet,
)

from mydetection_tpu.api import Detector  # noqa: E402
from mydetection_tpu.eval.cocoeval import COCOEvaluator, STAT_NAMES  # noqa: E402

MAX_DETS = 100


# ---------------------------------------------------------------------------
# reference-style dynamic postprocess (numpy, data-dependent shapes)
# ---------------------------------------------------------------------------

def _np_nms(boxes_xyxy, scores, iou_thres):
    """Plain greedy NMS over score-sorted candidates. Returns kept idx."""
    order = np.argsort(-scores, kind="mergesort")
    keep = []
    suppressed = np.zeros(len(scores), bool)
    areas = np.maximum(boxes_xyxy[:, 2] - boxes_xyxy[:, 0], 0) * \
        np.maximum(boxes_xyxy[:, 3] - boxes_xyxy[:, 1], 0)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes_xyxy[i, 0], boxes_xyxy[order, 0])
        y1 = np.maximum(boxes_xyxy[i, 1], boxes_xyxy[order, 1])
        x2 = np.minimum(boxes_xyxy[i, 2], boxes_xyxy[order, 2])
        y2 = np.minimum(boxes_xyxy[i, 3], boxes_xyxy[order, 3])
        inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
        iou = inter / np.maximum(areas[i] + areas[order] - inter, 1e-9)
        suppressed[order[iou > iou_thres]] = True
        suppressed[i] = False
    return keep


def _dynamic_postprocess(boxes, scores, classes, *, conf, iou):
    """threshold → per-class NMS → top-MAX_DETS (the reference idiom)."""
    m = scores >= conf
    boxes, scores, classes = boxes[m], scores[m], classes[m]
    kept = []
    for c in np.unique(classes):
        idx = np.where(classes == c)[0]
        for k in _np_nms(boxes[idx], scores[idx], iou):
            kept.append(idx[k])
    kept = np.asarray(kept, int)
    if len(kept) > MAX_DETS:
        kept = kept[np.argsort(-scores[kept], kind="mergesort")[:MAX_DETS]]
    return boxes[kept], scores[kept], classes[kept]


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _to_rows(img_id, boxes, scores, classes):
    return [{"image_id": int(img_id), "category_id": int(c),
             "bbox": [float(b[0]), float(b[1]),
                      float(b[2] - b[0]), float(b[3] - b[1])],
             "score": float(s)}
            for b, s, c in zip(boxes, scores, classes)]


def _synthetic_gt(rng, n_images, size, nc):
    images, annotations = [], []
    ann_id = 0
    for i in range(n_images):
        images.append({"id": i, "file_name": f"{i}", "width": size,
                       "height": size})
        for _ in range(int(rng.randint(1, 6))):
            bw = float(rng.uniform(6, size * 0.6))
            bh = float(rng.uniform(6, size * 0.6))
            x = float(rng.uniform(0, size - bw))
            y = float(rng.uniform(0, size - bh))
            annotations.append({
                "id": ann_id, "image_id": i,
                "category_id": int(rng.randint(nc)),
                "bbox": [x, y, bw, bh], "area": bw * bh, "iscrowd": 0})
            ann_id += 1
    return {"images": images, "annotations": annotations,
            "categories": [{"id": c, "name": str(c)} for c in range(nc)]}


def _assert_stats_close(gt, ours_rows, torch_rows, tol=1e-3):
    ev = COCOEvaluator(gt)
    ours = ev.evaluate(ours_rows, verbose=False)
    ref = COCOEvaluator(gt).evaluate(torch_rows, verbose=False)
    for name in STAT_NAMES:
        assert ours[name] == pytest.approx(ref[name], abs=tol), (
            name, ours[name], ref[name])
    return ours, ref


# ---------------------------------------------------------------------------
# YOLOv3 — through a real .weights file
# ---------------------------------------------------------------------------

def test_yolov3_map_parity(tmp_path):
    from mydetection_tpu.models import yolov3

    nc, size, n_images = 7, 64, 12
    conf, iou = 0.35, 0.45
    rng = _seed_all(11)
    trunk = _TorchDarknet53().eval()
    neck = _TorchYoloNeck(nc).eval()
    for net in (trunk, neck):
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                _randomize_bn(m, rng)

    chunks = []
    for block in trunk.seq:
        chunks.extend(block.binary_chunks())
    chunks.extend(neck.binary_chunks())
    stream = np.concatenate([np.asarray(c, np.float32).ravel()
                             for c in chunks])
    path = str(tmp_path / "map.weights")
    with open(path, "wb") as fh:
        fh.write(np.asarray([0, 2, 0], np.int32).tobytes())
        fh.write(np.asarray([0], np.int64).tobytes())
        stream.tofile(fh)

    det = Detector(model_name="yolov3", num_classes=nc, input_size=size,
                   compute_dtype=jnp.float32, use_pallas=False,
                   weights_path=path)

    imgs = [rng.randint(0, 255, (size, size, 3), np.uint8)
            for _ in range(n_images)]
    gt = _synthetic_gt(rng, n_images, size, nc)

    # ours: the full static-shape pipeline
    ours_rows = []
    for i, d in enumerate(det.detect_batch(imgs, conf_thres=conf,
                                           nms_iou=iou)):
        ours_rows.extend(d.to_coco(i))

    # torch: forward → single-label decode → dynamic postprocess
    torch_rows = []
    for i, img in enumerate(imgs):
        x = torch.tensor(img[None].astype(np.float32) / 255.0
                         ).permute(0, 3, 1, 2)
        with torch.no_grad():
            raws = neck(*trunk(x))
        boxes, scores, classes = [], [], []
        for li, raw in enumerate(raws):
            r = raw.permute(0, 2, 3, 1).numpy()[0]
            h, w, _ = r.shape
            r = r.reshape(h * w * 3, 5 + nc)
            stride = yolov3.STRIDES[li]
            anc = np.asarray(yolov3.ANCHORS[li], np.float32)
            gy, gx = np.mgrid[0:h, 0:w]
            grid = np.stack([gx, gy], -1)[:, :, None, :].astype(np.float32)
            grid = np.broadcast_to(grid, (h, w, 3, 2)).reshape(-1, 2)
            ancs = np.broadcast_to(anc[None, None], (h, w, 3, 2)).reshape(-1, 2)
            xy = (_sigmoid(r[:, 0:2]) + grid) * stride
            wh = np.exp(np.clip(r[:, 2:4], -8, 8)) * ancs
            score = _sigmoid(r[:, 4]) * _sigmoid(np.max(r[:, 5:], -1))
            cls = np.argmax(r[:, 5:], -1)
            boxes.append(np.concatenate(
                [xy - wh / 2, xy + wh / 2], -1))
            scores.append(score)
            classes.append(cls)
        b, s, c = _dynamic_postprocess(
            np.concatenate(boxes), np.concatenate(scores),
            np.concatenate(classes), conf=conf, iou=iou)
        torch_rows.append((len(s), _to_rows(i, b, s, c)))

    assert sum(n for n, _ in torch_rows) > 0, "degenerate: no detections"
    torch_rows = [row for _, rows in torch_rows for row in rows]
    _assert_stats_close(gt, ours_rows, torch_rows)


# ---------------------------------------------------------------------------
# RetinaNet / FCOS — through torchvision-named state dicts
# ---------------------------------------------------------------------------

def _resnet_family_images(rng, n_images, size):
    return [rng.randint(0, 255, (size, size, 3), np.uint8)
            for _ in range(n_images)]


def _torch_trunk_pyramid(trunk, state, img):
    """uint8 HWC image → ImageNet-standardized torch pyramid [P3..P7]."""
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    x = (img.astype(np.float32) / 255.0 - mean) / std
    tx = torch.tensor(x[None]).permute(0, 3, 1, 2)
    with torch.no_grad():
        tc3, tc4, tc5 = trunk(tx)
    return _torch_fpn(state, tc3, tc4, tc5)


@pytest.mark.parametrize("model_name,layers", [
    ("retinanet", (3, 4, 6, 3)),
    ("retinanet_r101", (3, 4, 23, 3)),  # 17 s — fine in the default run
])
def test_retinanet_map_parity(model_name, layers):
    from mydetection_tpu.models import retinanet
    from mydetection_tpu.weight_import import import_retinanet_state_dict

    nc, size, n_images = 7, 64, 8
    conf, iou = 0.55, 0.45
    # pre_nms above the worst-case candidate count (774 anchors × 7
    # classes) so the static cap cannot truncate — the differential
    # targets the non-truncating regime; truncation is the documented
    # semantic difference (SURVEY.md §7 hard-part #4)
    pre_nms = 6144
    trunk, state, rng = _full_state(12, fcos=False, num_classes=nc,
                                    layers=layers)

    det0 = Detector(model_name=model_name, num_classes=nc, input_size=size,
                    compute_dtype=jnp.float32, use_pallas=False)
    params = import_retinanet_state_dict(det0.params, state)
    det = Detector(model_name=model_name, num_classes=nc, input_size=size,
                   compute_dtype=jnp.float32, use_pallas=False, params=params,
                   pre_nms=pre_nms)

    imgs = _resnet_family_images(rng, n_images, size)
    gt = _synthetic_gt(rng, n_images, size, nc)

    ours_rows = []
    for i, d in enumerate(det.detect_batch(imgs, conf_thres=conf,
                                           nms_iou=iou)):
        ours_rows.extend(d.to_coco(i))

    anchors = np.asarray(retinanet.generate_anchors(size))  # (N, 4) cxcywh
    # (torchvision-exactness of this anchor table is pinned separately
    # in test_retinanet.py; the differential targets the pipeline)
    torch_rows, n_cand = [], 0
    for i, img in enumerate(imgs):
        pyr = _torch_trunk_pyramid(trunk, state, img)
        cls_l, box_l = [], []
        for p in pyr:
            cl = _torch_final(state, "head.classification_head.cls_logits",
                              _torch_subnet(state, "classification_head", p,
                                            fcos=False))
            bx = _torch_final(state, "head.regression_head.bbox_reg",
                              _torch_subnet(state, "regression_head", p,
                                            fcos=False))
            B, _, H, W = cl.shape
            cls_l.append(cl.permute(0, 2, 3, 1).reshape(H * W * 9, nc).numpy())
            box_l.append(bx.permute(0, 2, 3, 1).reshape(H * W * 9, 4).numpy())
        cls_logits = np.concatenate(cls_l)
        deltas = np.concatenate(box_l)
        # standard R-CNN box coder, unit weights (retinanet.decode mirror)
        ctr = deltas[:, :2] * anchors[:, 2:] + anchors[:, :2]
        wh = np.exp(np.clip(deltas[:, 2:], -retinanet.DWH_CLAMP,
                            retinanet.DWH_CLAMP)) * anchors[:, 2:]
        xyxy = np.concatenate([ctr - wh / 2, ctr + wh / 2], -1)
        probs = _sigmoid(cls_logits)                       # (N, C)
        ii, cc = np.where(probs >= conf)                   # (box, class) pairs
        n_cand = max(n_cand, len(ii))
        b, s, c = _dynamic_postprocess(xyxy[ii], probs[ii, cc], cc,
                                       conf=conf, iou=iou)
        torch_rows.extend(_to_rows(i, b, s, c))

    assert 0 < n_cand <= det.cfg.pre_nms, (
        "pick conf so the static pre_nms cap cannot truncate", n_cand)
    _assert_stats_close(gt, ours_rows, torch_rows)


def test_fcos_map_parity():
    from mydetection_tpu.models import fcos as fcos_mod
    from mydetection_tpu.weight_import import import_fcos_state_dict

    nc, size, n_images = 7, 64, 8
    conf, iou = 0.3, 0.45
    trunk, state, rng = _full_state(13, fcos=True, num_classes=nc)

    det0 = Detector(model_name="fcos", num_classes=nc, input_size=size,
                    compute_dtype=jnp.float32, use_pallas=False,
                    ltrb_decode="linear")
    params = import_fcos_state_dict(det0.params, state)
    det = Detector(model_name="fcos", num_classes=nc, input_size=size,
                   compute_dtype=jnp.float32, use_pallas=False,
                   ltrb_decode="linear", params=params)

    imgs = _resnet_family_images(rng, n_images, size)
    gt = _synthetic_gt(rng, n_images, size, nc)

    ours_rows = []
    for i, d in enumerate(det.detect_batch(imgs, conf_thres=conf,
                                           nms_iou=iou)):
        ours_rows.extend(d.to_coco(i))

    locations = np.asarray(fcos_mod.generate_locations(size)[0])  # (N, 2)
    torch_rows, total = [], 0
    for i, img in enumerate(imgs):
        pyr = _torch_trunk_pyramid(trunk, state, img)
        cls_l, box_l, ctr_l = [], [], []
        for li, p in enumerate(pyr):
            ct = _torch_subnet(state, "classification_head", p, fcos=True)
            bt = _torch_subnet(state, "regression_head", p, fcos=True)
            cl = _torch_final(state, "head.classification_head.cls_logits", ct)
            bx = _torch_final(state, "head.regression_head.bbox_reg", bt)
            cn = _torch_final(state, "head.regression_head.bbox_ctrness", bt)
            B, _, H, W = cl.shape
            cls_l.append(cl.permute(0, 2, 3, 1).reshape(H * W, nc).numpy())
            raw = bx.permute(0, 2, 3, 1).reshape(H * W, 4).numpy()
            # torchvision decode: relu(raw) * stride (linear box coder)
            box_l.append(np.maximum(raw, 0.0) * fcos_mod.STRIDES[li])
            ctr_l.append(cn.permute(0, 2, 3, 1).reshape(H * W).numpy())
        cls_logits = np.concatenate(cls_l)
        ltrb = np.concatenate(box_l)
        ctr = np.concatenate(ctr_l)
        xyxy = np.concatenate([locations - ltrb[:, 0:2],
                               locations + ltrb[:, 2:4]], -1)
        probs = _sigmoid(cls_logits) * _sigmoid(ctr)[:, None]
        ii, cc = np.where(probs >= conf)
        total += len(ii)
        b, s, c = _dynamic_postprocess(xyxy[ii], probs[ii, cc], cc,
                                       conf=conf, iou=iou)
        torch_rows.extend(_to_rows(i, b, s, c))

    assert total > 0, "degenerate: no candidates above conf"
    _assert_stats_close(gt, ours_rows, torch_rows)


# ---------------------------------------------------------------------------
# RAPiD rotated — through a real .weights file, scored by the rotated
# evaluator (completes the 4-family metric-parity matrix)
# ---------------------------------------------------------------------------

def _np_rotated_nms(iou_mat, scores, iou_thres):
    """Greedy rotated NMS on a precomputed IoU matrix (the reference's
    Python-loop idiom). Returns kept indices (score order)."""
    order = np.argsort(-scores, kind="mergesort")
    suppressed = np.zeros(len(scores), bool)
    keep = []
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed[iou_mat[i] > iou_thres] = True
        suppressed[i] = False
    return keep


def _synthetic_rotated_gt(rng, n_images, size):
    images, annotations = [], []
    ann_id = 0
    for i in range(n_images):
        images.append({"id": i, "file_name": f"{i}", "width": size,
                       "height": size})
        for _ in range(int(rng.randint(1, 5))):
            w = float(rng.uniform(8, size * 0.5))
            h = float(rng.uniform(8, size * 0.5))
            annotations.append({
                "id": ann_id, "image_id": i, "category_id": 1,
                "bbox": [float(rng.uniform(w / 2, size - w / 2)),
                         float(rng.uniform(h / 2, size - h / 2)),
                         w, h, float(rng.uniform(-89, 89))],
                "area": w * h, "iscrowd": 0})
            ann_id += 1
    return {"images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "person"}]}


def test_rapid_map_parity(tmp_path):
    """Full rotated pipeline differential: ours (static top-k + blocked
    rotated NMS on the Liang-Barsky IoU) vs a reference-style dynamic
    pipeline (numpy decode -> conf filter -> greedy Python NMS on the
    CANDIDATE-POINT IoU formulation — the independent oracle, not the
    production kernel). Both scored by eval/rotated_eval; all AP stats
    must agree to 1e-3."""
    from test_torch_parity import _TorchDarknet53, _TorchYoloNeck

    from mydetection_tpu.eval.rotated_eval import evaluate_rotated
    from mydetection_tpu.models import rapid
    from mydetection_tpu.ops.rotated import rotated_intersection_area

    size, n_images = 64, 10
    conf, iou = 0.6, 0.45
    rng = _seed_all(23)
    trunk = _TorchDarknet53().eval()
    neck = _TorchYoloNeck(1).eval()  # 3*(5+1) = 18 ch = RAPiD layout
    for net in (trunk, neck):
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                _randomize_bn(m, rng)
    chunks = []
    for block in trunk.seq:
        chunks.extend(block.binary_chunks())
    chunks.extend(neck.binary_chunks())
    stream = np.concatenate([np.asarray(c, np.float32).ravel()
                             for c in chunks])
    path = str(tmp_path / "rapid_map.weights")
    with open(path, "wb") as fh:
        fh.write(np.asarray([0, 2, 0], np.int32).tobytes())
        fh.write(np.asarray([0], np.int64).tobytes())
        stream.tofile(fh)

    # pre_nms=2048 > the 1008 total candidates at 64px: no top-k tail
    # semantics in the differential (that gap is covered by the yolov3
    # test's budget argument)
    det = Detector(model_name="rapid", input_size=size,
                   compute_dtype=jnp.float32, use_pallas=False,
                   weights_path=path, pre_nms=2048)
    imgs = [rng.randint(0, 255, (size, size, 3), np.uint8)
            for _ in range(n_images)]
    gt = _synthetic_rotated_gt(rng, n_images, size)

    ours_rows = []
    for i, d in enumerate(det.detect_batch(imgs, conf_thres=conf,
                                           nms_iou=iou)):
        for k in range(len(d)):
            cx, cy, w, h, th = (float(v) for v in d.boxes_rot[k])
            ours_rows.append({"image_id": i,
                              "bbox": [cx, cy, w, h, float(np.degrees(th))],
                              "score": float(d.scores[k])})

    pair_iou = jax.jit(jax.vmap(jax.vmap(
        lambda a, b: rotated_intersection_area(a, b)
        / (a[2] * a[3] + b[2] * b[3]
           - rotated_intersection_area(a, b) + 1e-9),
        (None, 0)), (0, None)))

    torch_rows, total = [], 0
    for i, img in enumerate(imgs):
        x = torch.tensor(img[None].astype(np.float32) / 255.0
                         ).permute(0, 3, 1, 2)
        with torch.no_grad():
            raws = neck(*trunk(x))
        boxes5, confs = [], []
        for li, raw in enumerate(raws):
            r = raw.permute(0, 2, 3, 1).numpy()[0]
            h, w, _ = r.shape
            r = r.reshape(h * w * 3, 6)
            stride = rapid.STRIDES[li]
            anc = np.asarray(rapid.ANCHORS[li], np.float32)
            gy, gx = np.mgrid[0:h, 0:w]
            grid = np.stack([gx, gy], -1)[:, :, None, :].astype(np.float32)
            grid = np.broadcast_to(grid, (h, w, 3, 2)).reshape(-1, 2)
            ancs = np.broadcast_to(anc[None, None], (h, w, 3, 2)).reshape(-1, 2)
            xy = (_sigmoid(r[:, 0:2]) + grid) * stride
            wh = np.exp(np.clip(r[:, 2:4], -8, 8)) * ancs
            theta = (_sigmoid(r[:, 4:5]) - 0.5) * np.pi
            boxes5.append(np.concatenate([xy, wh, theta], -1))
            confs.append(_sigmoid(r[:, 5]))
        b5 = np.concatenate(boxes5)
        sc = np.concatenate(confs)
        m = sc >= conf
        b5, sc = b5[m], sc[m]
        total += len(sc)
        if len(sc):
            mat = np.asarray(pair_iou(jnp.asarray(b5, jnp.float32),
                                      jnp.asarray(b5, jnp.float32)))
            keep = _np_rotated_nms(mat, sc, iou)[:MAX_DETS]
            for k in keep:
                cx, cy, w, h, th = (float(v) for v in b5[k])
                torch_rows.append({"image_id": i,
                                   "bbox": [cx, cy, w, h,
                                            float(np.degrees(th))],
                                   "score": float(sc[k])})

    assert total > 0, "degenerate: no candidates above conf"
    ours = evaluate_rotated(ours_rows, gt, verbose=False)
    ref = evaluate_rotated(torch_rows, gt, verbose=False)
    for name in ("AP", "AP50", "AP75"):
        assert ours[name] == pytest.approx(ref[name], abs=1e-3), (
            name, ours[name], ref[name])
