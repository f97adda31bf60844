"""Detector API integration tests (SURVEY.md §4.4)."""

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from mydetection_tpu import Detector, get_model, list_models
from mydetection_tpu.checkpoint import load_params, save_checkpoint


@pytest.fixture(scope="module")
def detector():
    # small input size keeps CPU tests fast; float32 for determinism
    return Detector(model_name="yolov3", input_size=128,
                    compute_dtype=jnp.float32, use_pallas=False)


def test_registry_surface():
    assert "yolov3" in list_models()
    with pytest.raises(KeyError):
        get_model("nope")


def test_detect_one_returns_detections(detector):
    img = Image.fromarray(np.random.RandomState(0)
                          .randint(0, 255, (240, 320, 3), np.uint8))
    dets = detector.detect_one(pil_img=img, conf_thres=0.5)
    assert dets.boxes_xyxy.shape[1] == 4
    assert len(dets.scores) == len(dets.classes) == len(dets.boxes_xyxy)
    arr = dets.as_array()
    assert arr.shape[1] == 6
    # boxes are in original-image coords
    if len(dets):
        assert (dets.boxes_xyxy[:, 2] <= 320 + 1e-3).all()
        assert (dets.boxes_xyxy[:, 3] <= 240 + 1e-3).all()


def test_detect_batch_and_imgseq(detector, tmp_path):
    rng = np.random.RandomState(1)
    paths = []
    for i in range(3):
        p = tmp_path / f"img{i}.jpg"
        Image.fromarray(rng.randint(0, 255, (200 + 10 * i, 300, 3), np.uint8)).save(p)
        paths.append(str(p))
    dets = detector.detect_imgSeq(paths, conf_thres=0.5)
    assert len(dets) == 3
    # mixed-type batch
    arrs = [np.asarray(Image.open(paths[0]).convert("RGB")), Image.open(paths[1])]
    dets2 = detector.detect_batch(arrs, conf_thres=0.5)
    assert len(dets2) == 2


def test_detect_one_consistent_with_batch(detector):
    img = np.random.RandomState(2).randint(0, 255, (256, 256, 3), np.uint8)
    one = detector.detect_one(np_img=img, conf_thres=0.3)
    batch = detector.detect_batch([img, img], conf_thres=0.3)
    np.testing.assert_allclose(one.boxes_xyxy, batch[0].boxes_xyxy, atol=1e-4)
    np.testing.assert_allclose(batch[0].boxes_xyxy, batch[1].boxes_xyxy, atol=1e-4)


def test_weights_roundtrip(tmp_path, detector):
    path = str(tmp_path / "w.npz")
    save_checkpoint(path, detector.params, step=123)
    params2 = load_params(path)
    det2 = Detector(model_name="yolov3", input_size=128,
                    compute_dtype=jnp.float32, use_pallas=False, params=params2)
    img = np.random.RandomState(3).randint(0, 255, (128, 128, 3), np.uint8)
    a = detector.detect_one(np_img=img, conf_thres=0.3)
    b = det2.detect_one(np_img=img, conf_thres=0.3)
    np.testing.assert_allclose(a.scores, b.scores, atol=1e-6)


def test_coco_export(detector):
    img = np.random.RandomState(4).randint(0, 255, (128, 128, 3), np.uint8)
    dets = detector.detect_one(np_img=img, conf_thres=0.2)
    rows = dets.to_coco(image_id=42)
    for row in rows:
        assert row["image_id"] == 42
        assert len(row["bbox"]) == 4
        assert row["bbox"][2] >= 0 and row["bbox"][3] >= 0
