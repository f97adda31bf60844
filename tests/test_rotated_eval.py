"""Rotated AP evaluator tests with analytically-known values."""

import numpy as np
import pytest

from mydetection_tpu.eval.rotated_eval import evaluate_rotated


def gt_of(anns):
    imgs = sorted({a["image_id"] for a in anns} | {0})
    return {"images": [{"id": i} for i in imgs],
            "annotations": [dict(id=j, iscrowd=0, **a)
                            for j, a in enumerate(anns)]}


def test_perfect_rotated_detection():
    gt = gt_of([
        {"image_id": 0, "bbox": [100, 100, 40, 20, 30.0]},
        {"image_id": 0, "bbox": [300, 200, 60, 30, -45.0]},
    ])
    res = [{"image_id": 0, "bbox": [100, 100, 40, 20, 30.0], "score": 0.9},
           {"image_id": 0, "bbox": [300, 200, 60, 30, -45.0], "score": 0.8}]
    stats = evaluate_rotated(res, gt, verbose=False)
    assert stats["AP50"] == pytest.approx(1.0)
    assert stats["AP75"] == pytest.approx(1.0)


def test_angle_periodicity_in_matching():
    # θ and θ+180° describe the same box: must match at IoU 1
    gt = gt_of([{"image_id": 0, "bbox": [50, 50, 30, 10, 170.0]}])
    res = [{"image_id": 0, "bbox": [50, 50, 30, 10, -10.0], "score": 0.9}]
    stats = evaluate_rotated(res, gt, verbose=False)
    assert stats["AP50"] == pytest.approx(1.0)


def test_wrong_angle_fails_iou():
    # elongated box rotated 90°: IoU = (10*10)/(2*300-100) = 0.2 < 0.5
    gt = gt_of([{"image_id": 0, "bbox": [50, 50, 30, 10, 0.0]}])
    res = [{"image_id": 0, "bbox": [50, 50, 30, 10, 90.0], "score": 0.9}]
    stats = evaluate_rotated(res, gt, verbose=False)
    assert stats["AP50"] == pytest.approx(0.0)


def test_fp_before_tp_halves_ap():
    gt = gt_of([{"image_id": 0, "bbox": [50, 50, 30, 10, 10.0]}])
    res = [{"image_id": 0, "bbox": [400, 400, 30, 10, 10.0], "score": 0.95},
           {"image_id": 0, "bbox": [50, 50, 30, 10, 10.0], "score": 0.9}]
    stats = evaluate_rotated(res, gt, verbose=False)
    assert stats["AP50"] == pytest.approx(0.5, abs=0.01)


def test_missed_gt():
    gt = gt_of([
        {"image_id": 0, "bbox": [50, 50, 30, 10, 10.0]},
        {"image_id": 1, "bbox": [70, 70, 30, 10, 20.0]},
    ])
    res = [{"image_id": 0, "bbox": [50, 50, 30, 10, 10.0], "score": 0.9}]
    stats = evaluate_rotated(res, gt, verbose=False)
    # recall caps at 0.5 with precision 1: 101-pt AP = 51/101
    assert stats["AP50"] == pytest.approx(51 / 101, abs=1e-6)


def test_crowd_region_ignores_detections():
    """A detection covered by an iscrowd GT is excluded from scoring
    (COCO protocol) — it must not appear as an FP, and the crowd region
    itself never counts as a GT."""
    gt = {"images": [{"id": 0}],
          "annotations": [
              {"id": 0, "image_id": 0, "iscrowd": 0,
               "bbox": [100, 100, 40, 20, 30.0]},
              {"id": 1, "image_id": 0, "iscrowd": 1,
               "bbox": [400, 400, 200, 200, 0.0]},
          ]}
    results = [
        # perfect match to the real GT
        {"image_id": 0, "bbox": [100, 100, 40, 20, 30.0], "score": 0.9},
        # inside the crowd region: ignored, NOT an FP — scored above
        # the TP so that, without crowd semantics, it would be an FP
        # preceding every TP and provably drag AP below 1
        {"image_id": 0, "bbox": [400, 400, 30, 30, 10.0], "score": 0.95},
    ]
    out = evaluate_rotated(results, gt, verbose=False)
    assert out["AP50"] == pytest.approx(1.0)
    # without crowd semantics the second det would cap precision at 0.5
    gt_no_crowd = {"images": gt["images"],
                   "annotations": gt["annotations"][:1]}
    out2 = evaluate_rotated(results, gt_no_crowd, verbose=False)
    assert out2["AP50"] < 1.0
