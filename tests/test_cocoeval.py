"""COCO evaluator tests on scenarios with analytically-known AP
(SURVEY.md §4: the metric oracle must itself be trusted — pycocotools
is absent, so the protocol reimplementation gets golden tests)."""

import numpy as np
import pytest

from mydetection_tpu.eval.cocoeval import COCOEvaluator, box_iou_xywh


def make_gt(anns, img_wh=(640, 480), n_imgs=1, cats=(1,)):
    return {
        "images": [{"id": i, "width": img_wh[0], "height": img_wh[1]}
                   for i in range(n_imgs)],
        "categories": [{"id": c, "name": f"c{c}"} for c in cats],
        "annotations": [
            dict(id=i, area=a["bbox"][2] * a["bbox"][3], iscrowd=0, **a)
            for i, a in enumerate(anns)
        ],
    }


def det(img, cat, bbox, score):
    return {"image_id": img, "category_id": cat, "bbox": bbox, "score": score}


def test_iou_xywh_crowd_semantics():
    dets = np.array([[0, 0, 10, 10]], float)
    gts = np.array([[0, 0, 100, 100]], float)
    plain = box_iou_xywh(dets, gts, np.array([False]))
    crowd = box_iou_xywh(dets, gts, np.array([True]))
    assert plain[0, 0] == pytest.approx(100 / 10000)
    assert crowd[0, 0] == pytest.approx(1.0)  # det fully inside crowd


def test_perfect_detection_ap1():
    gt = make_gt([
        {"image_id": 0, "category_id": 1, "bbox": [10, 10, 100, 100]},
        {"image_id": 0, "category_id": 1, "bbox": [300, 50, 80, 120]},
    ])
    res = [det(0, 1, [10, 10, 100, 100], 0.9),
           det(0, 1, [300, 50, 80, 120], 0.8)]
    stats = COCOEvaluator(gt).evaluate(res, verbose=False)
    assert stats["AP"] == pytest.approx(1.0)
    assert stats["AP50"] == pytest.approx(1.0)
    assert stats["AR100"] == pytest.approx(1.0)


def test_missed_gt_halves_recall():
    gt = make_gt([
        {"image_id": 0, "category_id": 1, "bbox": [10, 10, 100, 100]},
        {"image_id": 0, "category_id": 1, "bbox": [300, 50, 80, 120]},
    ])
    res = [det(0, 1, [10, 10, 100, 100], 0.9)]
    stats = COCOEvaluator(gt).evaluate(res, verbose=False)
    assert stats["AR100"] == pytest.approx(0.5)
    # precision is 1.0 up to recall 0.5, 0 beyond: 101-pt AP ≈ 51/101
    assert stats["AP"] == pytest.approx(51 / 101, abs=1e-6)


def test_fp_before_tp():
    gt = make_gt([{"image_id": 0, "category_id": 1, "bbox": [10, 10, 100, 100]}])
    res = [det(0, 1, [400, 400, 50, 50], 0.9),     # FP, higher score
           det(0, 1, [10, 10, 100, 100], 0.8)]     # TP
    stats = COCOEvaluator(gt).evaluate(res, verbose=False)
    assert stats["AP"] == pytest.approx(0.5)


def test_iou_threshold_cuts():
    # det has IoU 0.6 with GT: counts for thresholds .5/.55/.6, not above
    gt = make_gt([{"image_id": 0, "category_id": 1, "bbox": [0, 0, 100, 100]}])
    # box [0,0,100,60]: inter 6000, union 10000 -> IoU 0.6
    res = [det(0, 1, [0, 0, 100, 60], 0.9)]
    stats = COCOEvaluator(gt).evaluate(res, verbose=False)
    assert stats["AP50"] == pytest.approx(1.0)
    assert stats["AP75"] == pytest.approx(0.0)
    assert stats["AP"] == pytest.approx(3 / 10)  # thresholds .5 .55 .6


def test_crowd_gt_not_fp():
    gt = make_gt([{"image_id": 0, "category_id": 1, "bbox": [0, 0, 200, 200]}])
    gt["annotations"][0]["iscrowd"] = 1
    gt["annotations"].append(
        dict(id=99, image_id=0, category_id=1, bbox=[300, 300, 50, 50],
             area=2500, iscrowd=0))
    res = [det(0, 1, [50, 50, 20, 20], 0.95),   # inside crowd: ignored
           det(0, 1, [300, 300, 50, 50], 0.9)]  # TP on the real GT
    stats = COCOEvaluator(gt).evaluate(res, verbose=False)
    assert stats["AP"] == pytest.approx(1.0)


def test_area_range_buckets():
    gt = make_gt([
        {"image_id": 0, "category_id": 1, "bbox": [10, 10, 20, 20]},     # small (400)
        {"image_id": 0, "category_id": 1, "bbox": [300, 50, 120, 120]},  # large (14400)
    ])
    res = [det(0, 1, [10, 10, 20, 20], 0.9),
           det(0, 1, [300, 50, 120, 120], 0.8)]
    stats = COCOEvaluator(gt).evaluate(res, verbose=False)
    assert stats["AP_small"] == pytest.approx(1.0)
    assert stats["AP_large"] == pytest.approx(1.0)
    assert stats["AP_medium"] == -1.0  # no medium GT anywhere


def test_maxdets_1():
    gt = make_gt([
        {"image_id": 0, "category_id": 1, "bbox": [10, 10, 50, 50]},
        {"image_id": 0, "category_id": 1, "bbox": [300, 300, 50, 50]},
    ])
    res = [det(0, 1, [10, 10, 50, 50], 0.9),
           det(0, 1, [300, 300, 50, 50], 0.8)]
    stats = COCOEvaluator(gt).evaluate(res, verbose=False)
    assert stats["AR1"] == pytest.approx(0.5)   # only top-1 det counted
    assert stats["AR100"] == pytest.approx(1.0)


def test_multi_category_mean():
    gt = make_gt([
        {"image_id": 0, "category_id": 1, "bbox": [10, 10, 50, 50]},
        {"image_id": 0, "category_id": 2, "bbox": [300, 300, 50, 50]},
    ], cats=(1, 2))
    res = [det(0, 1, [10, 10, 50, 50], 0.9)]  # cat 2 completely missed
    stats = COCOEvaluator(gt).evaluate(res, verbose=False)
    assert stats["AP"] == pytest.approx(0.5)  # mean of 1.0 and 0.0


def test_duplicate_detections_are_fps():
    gt = make_gt([{"image_id": 0, "category_id": 1, "bbox": [10, 10, 100, 100]}])
    res = [det(0, 1, [10, 10, 100, 100], 0.9),
           det(0, 1, [11, 11, 100, 100], 0.85)]  # dup -> FP
    stats = COCOEvaluator(gt).evaluate(res, verbose=False)
    # recall 1.0 at rank 1 with precision 1.0; dup FP after doesn't
    # reduce interpolated precision at any recall level
    assert stats["AP50"] == pytest.approx(1.0)


def test_evaluator_rejects_class_count_mismatch(tmp_path):
    """A model whose num_classes differs from the annotation file's
    category count fails readably instead of KeyError-ing deep in
    to_coco (or silently remapping every class)."""
    import jax.numpy as jnp
    import pytest

    from mydetection_tpu import Detector
    from mydetection_tpu.eval.evaluator import evaluate_detector

    det = Detector(model_name="yolov3", input_size=64, num_classes=3,
                   compute_dtype=jnp.float32, use_pallas=False)
    gt = {"images": [{"id": 0, "file_name": "x.jpg"}],
          "categories": [{"id": 1}, {"id": 2}],
          "annotations": []}
    with pytest.raises(ValueError, match="3 classes.*2 categories"):
        evaluate_detector(det, gt, str(tmp_path), verbose=False)
