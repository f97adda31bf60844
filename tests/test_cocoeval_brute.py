"""Fuzz differential: eval/cocoeval.py vs the brute-force AP oracle.

The pycocotools differential (test_cocoeval_differential.py) can never
arm in this image, which left the production numpy COCOeval gate-kept
only by hand-built scenarios — a self-referential loop (VERDICT r2 #4).
`tests/_brute_cocoeval.py` is a deliberately slow, obviously-correct,
structurally independent reimplementation of the published protocol
(scalar loops, per-cell rematch, no shared precomputation); here the
two are diffed on 100+ randomized scenarios covering crowds, ignore
flags, all area bands, score ties, maxDets pressure, empty categories,
and det-only / gt-only images, to 1e-9 on all 12 stats.
"""

import numpy as np
import pytest

from _brute_cocoeval import brute_evaluate
from mydetection_tpu.eval.cocoeval import COCOEvaluator, STAT_NAMES


def _scenario(seed: int):
    """Small randomized COCO GT + detections hitting protocol corners."""
    rng = np.random.RandomState(seed)
    n_images = int(rng.randint(2, 9))
    cats = sorted(rng.choice([1, 2, 3, 7, 9], size=rng.randint(1, 4),
                             replace=False).tolist())
    images, annotations, results = [], [], []
    ann_id = 0
    for img_id in range(n_images):
        w, h = int(rng.randint(100, 640)), int(rng.randint(100, 640))
        images.append({"id": img_id, "file_name": f"{img_id}.jpg",
                       "width": w, "height": h})
        if rng.rand() < 0.15:
            # det-only image: false positives with no GT at all
            for _ in range(int(rng.randint(1, 4))):
                results.append({
                    "image_id": img_id, "category_id": int(rng.choice(cats)),
                    "bbox": [float(rng.uniform(0, w - 20)),
                             float(rng.uniform(0, h - 20)),
                             float(rng.uniform(5, 60)),
                             float(rng.uniform(5, 60))],
                    "score": round(float(rng.uniform(0.05, 1.0)), 1),
                })
            continue
        for _ in range(int(rng.randint(0, 7))):
            # spans small (<32²) / medium / large (>96²) areas
            bw = float(rng.choice([10, 25, 50, 90, 160, 300]) * rng.uniform(0.6, 1.4))
            bh = float(rng.choice([10, 25, 50, 90, 160, 300]) * rng.uniform(0.6, 1.4))
            x = float(rng.uniform(0, max(w - bw, 1)))
            y = float(rng.uniform(0, max(h - bh, 1)))
            cat = int(rng.choice(cats))
            ann = {"id": ann_id, "image_id": img_id, "category_id": cat,
                   "bbox": [x, y, bw, bh], "area": bw * bh,
                   "iscrowd": int(rng.rand() < 0.15)}
            if rng.rand() < 0.1:
                ann["ignore"] = 1
            annotations.append(ann)
            ann_id += 1
            # 0-3 detections per GT: jittered TPs, duplicates (NMS-less
            # double matches), wrong classes — with heavy score ties
            # (1-decimal quantization) to exercise stable sorting
            for _ in range(int(rng.randint(0, 4))):
                jit = rng.uniform(-0.3, 0.3, 4) * [bw, bh, bw, bh]
                results.append({
                    "image_id": img_id,
                    "category_id": cat if rng.rand() < 0.85 else int(rng.choice(cats)),
                    "bbox": [x + jit[0], y + jit[1],
                             max(bw + jit[2], 2.0), max(bh + jit[3], 2.0)],
                    "score": round(float(rng.uniform(0.05, 1.0)), 1),
                })
        if rng.rand() < 0.3:
            # maxDets pressure: pile >10 low-score dets on one category
            cat = int(rng.choice(cats))
            for _ in range(int(rng.randint(11, 16))):
                results.append({
                    "image_id": img_id, "category_id": cat,
                    "bbox": [float(rng.uniform(0, w - 30)),
                             float(rng.uniform(0, h - 30)),
                             float(rng.uniform(8, 80)),
                             float(rng.uniform(8, 80))],
                    "score": round(float(rng.uniform(0.01, 0.4)), 1),
                })
    gt = {"images": images, "annotations": annotations,
          "categories": [{"id": c, "name": f"c{c}"} for c in cats]}
    return gt, results


@pytest.mark.parametrize("chunk", range(5))
def test_cocoeval_matches_brute_oracle_fuzz(chunk):
    """100+ randomized scenarios, 1e-9 agreement on all 12 stats."""
    for seed in range(chunk * 21, (chunk + 1) * 21):
        gt, results = _scenario(seed)
        ours = COCOEvaluator(gt).evaluate(results, verbose=False)
        brute = brute_evaluate(gt, results)
        for name in STAT_NAMES:
            assert ours[name] == pytest.approx(brute[name], abs=1e-9), (
                f"seed={seed}", name, ours[name], brute[name])


def test_brute_oracle_known_values():
    """The oracle itself is sanity-pinned on an analytic scenario: one
    perfect detection per GT → AP = AR = 1 at every threshold."""
    gt = {"images": [{"id": 0, "file_name": "0.jpg", "width": 100,
                      "height": 100}],
          "annotations": [
              {"id": 0, "image_id": 0, "category_id": 1,
               "bbox": [10, 10, 40, 40], "area": 1600, "iscrowd": 0},
              {"id": 1, "image_id": 0, "category_id": 1,
               "bbox": [60, 60, 30, 30], "area": 900, "iscrowd": 0}],
          "categories": [{"id": 1, "name": "c1"}]}
    results = [
        {"image_id": 0, "category_id": 1, "bbox": [10, 10, 40, 40],
         "score": 0.9},
        {"image_id": 0, "category_id": 1, "bbox": [60, 60, 30, 30],
         "score": 0.8}]
    s = brute_evaluate(gt, results)
    assert s["AP"] == pytest.approx(1.0)
    assert s["AP50"] == pytest.approx(1.0)
    assert s["AR100"] == pytest.approx(1.0)
    # half-overlap detection: IoU = 1/3 < 0.5 → everything zero
    bad = [{"image_id": 0, "category_id": 1, "bbox": [30, 10, 40, 40],
            "score": 0.9}]
    s2 = brute_evaluate(gt, bad)
    assert s2["AP"] == pytest.approx(0.0)
