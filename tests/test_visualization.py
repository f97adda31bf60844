"""Visualization drawing tests (SURVEY.md §2.10): axis and rotated
rects must actually land on the canvas."""

import numpy as np
import pytest

from mydetection_tpu.api import Detections
from mydetection_tpu.utils import visualization as vis


@pytest.mark.skipif(not vis._HAS_CV2, reason="cv2 not available")
def test_draw_axis_detections_changes_pixels():
    img = np.zeros((120, 160, 3), np.uint8)
    dets = Detections(
        boxes_xyxy=np.asarray([[20, 20, 80, 60], [90, 40, 150, 110]], np.float32),
        scores=np.asarray([0.9, 0.5], np.float32),
        classes=np.asarray([1, 3], np.int32))
    out = vis.draw_detections(img, dets, class_names=["a", "b", "c", "d"])
    assert out.shape == img.shape and out.dtype == np.uint8
    assert (out != img).any()
    assert (img == 0).all()  # input untouched (draw on a copy)
    # box edges specifically painted
    assert out[20, 20:80].any() and out[60, 20:80].any()


@pytest.mark.skipif(not vis._HAS_CV2, reason="cv2 not available")
def test_draw_rotated_detections_changes_pixels():
    img = np.zeros((120, 160, 3), np.uint8)
    dets = Detections(
        boxes_xyxy=np.asarray([[30, 20, 110, 90]], np.float32),
        scores=np.asarray([0.8], np.float32),
        classes=np.asarray([0], np.int32),
        boxes_rot=np.asarray([[70, 55, 60, 30, 0.6]], np.float32))
    out = vis.draw_detections(img, dets)
    assert (out != img).any()
    # rotated outline: some painted pixel off the axis-aligned edges
    ys, xs = np.nonzero(out.any(-1))
    assert len(ys) > 50
