"""Letterbox geometry: pad/ratio/inverse round-trip (SURVEY.md §4.1)."""

import numpy as np
from PIL import Image

from mydetection_tpu.utils.image_ops import (
    PAD_VALUE,
    boxes_xyxy_to_original,
    detections_to_original,
    letterbox_np,
    letterbox_pil,
)


def test_letterbox_shape_and_padding():
    img = np.zeros((300, 500, 3), np.uint8)  # H=300, W=500
    canvas, info = letterbox_np(img, 416)
    assert canvas.shape == (416, 416, 3)
    assert info.ratio == 416 / 500
    # top/bottom bands are pad gray
    assert (canvas[0] == PAD_VALUE).all()
    assert (canvas[-1] == PAD_VALUE).all()
    new_h = int(round(300 * info.ratio))
    y0 = int(round((416 - new_h) / 2))
    assert info.pad_y == y0
    assert info.pad_x == 0.0


def test_letterbox_content_position():
    img = np.full((100, 200, 3), 255, np.uint8)
    canvas, info = letterbox_np(img, 416)
    y0 = int(info.pad_y)
    new_h = int(round(100 * info.ratio))
    assert (canvas[y0 : y0 + new_h] == 255).all()
    assert (canvas[: y0 - 1] == PAD_VALUE).all() if y0 > 1 else True


def test_inverse_roundtrip_center_format():
    img = Image.new("RGB", (640, 480))
    _, info = letterbox_pil(img, 416)
    # a box at original (320, 240) size (100, 50)
    cx_net = 320 * info.ratio + info.pad_x
    cy_net = 240 * info.ratio + info.pad_y
    det = np.array([[cx_net, cy_net, 100 * info.ratio, 50 * info.ratio, 0.9]])
    back = detections_to_original(det, info)
    np.testing.assert_allclose(back[0, :4], [320, 240, 100, 50], atol=1e-3)
    assert back[0, 4] == np.float32(0.9)


def test_inverse_roundtrip_xyxy_and_clip():
    img = Image.new("RGB", (640, 480))
    _, info = letterbox_pil(img, 416)
    x1 = 10 * info.ratio + info.pad_x
    y1 = 20 * info.ratio + info.pad_y
    x2 = 630 * info.ratio + info.pad_x
    y2 = 470 * info.ratio + info.pad_y
    back = boxes_xyxy_to_original(np.array([[x1, y1, x2, y2]]), info)
    np.testing.assert_allclose(back[0], [10, 20, 630, 470], atol=1e-3)
    # out-of-image coords clip
    back2 = boxes_xyxy_to_original(np.array([[-50.0, -50.0, 1e4, 1e4]]), info)
    assert back2[0, 0] == 0 and back2[0, 1] == 0
    assert back2[0, 2] == 640 and back2[0, 3] == 480


def test_empty_detections():
    img = Image.new("RGB", (64, 64))
    _, info = letterbox_pil(img, 416)
    out = detections_to_original(np.zeros((0, 5), np.float32), info)
    assert out.shape == (0, 5)


def test_letterbox_rejects_empty_image():
    import numpy as np
    import pytest

    from mydetection_tpu.utils.image_ops import letterbox_np

    with pytest.raises(ValueError, match="empty image"):
        letterbox_np(np.zeros((0, 0, 3), np.uint8), 64)
