"""Box-op unit tests against numpy oracles (SURVEY.md §4.1)."""

import jax.numpy as jnp
import numpy as np

from mydetection_tpu.ops.boxes import (
    box_area,
    cxcywh_to_xyxy,
    elementwise_giou,
    elementwise_iou,
    pairwise_iou,
    xyxy_to_cxcywh,
)


def np_iou(a, b):
    """Numpy oracle pairwise IoU."""
    n, m = len(a), len(b)
    out = np.zeros((n, m))
    for i in range(n):
        for j in range(m):
            ix1 = max(a[i, 0], b[j, 0]); iy1 = max(a[i, 1], b[j, 1])
            ix2 = min(a[i, 2], b[j, 2]); iy2 = min(a[i, 3], b[j, 3])
            inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
            aa = (a[i, 2] - a[i, 0]) * (a[i, 3] - a[i, 1])
            bb = (b[j, 2] - b[j, 0]) * (b[j, 3] - b[j, 1])
            out[i, j] = inter / max(aa + bb - inter, 1e-9)
    return out


def test_format_roundtrip(rng):
    boxes = rng.uniform(0, 400, (32, 4)).astype(np.float32)
    boxes[:, 2:] = np.abs(boxes[:, 2:]) + 1  # positive w, h
    back = np.asarray(xyxy_to_cxcywh(cxcywh_to_xyxy(jnp.asarray(boxes))))
    np.testing.assert_allclose(back, boxes, atol=1e-4)


def test_pairwise_iou_matches_numpy(rng):
    a = np.sort(rng.uniform(0, 400, (16, 4)).astype(np.float32), axis=-1)
    b = np.sort(rng.uniform(0, 400, (24, 4)).astype(np.float32), axis=-1)
    got = np.asarray(pairwise_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, np_iou(a, b), atol=1e-5)


def test_iou_known_values():
    a = jnp.array([[0.0, 0, 10, 10]])
    b = jnp.array([[5.0, 5, 15, 15], [0, 0, 10, 10], [20, 20, 30, 30]])
    got = np.asarray(pairwise_iou(a, b))[0]
    np.testing.assert_allclose(got, [25 / 175, 1.0, 0.0], atol=1e-6)


def test_elementwise_and_giou():
    a = jnp.array([[0.0, 0, 10, 10], [0, 0, 10, 10]])
    b = jnp.array([[0.0, 0, 10, 10], [20, 0, 30, 10]])
    np.testing.assert_allclose(np.asarray(elementwise_iou(a, b)), [1.0, 0.0], atol=1e-6)
    giou = np.asarray(elementwise_giou(a, b))
    assert giou[0] == 1.0
    # disjoint boxes: giou = -(hull - union)/hull = -(300-200)/300
    np.testing.assert_allclose(giou[1], -100 / 300, atol=1e-6)


def test_area_degenerate():
    assert float(box_area(jnp.array([5.0, 5, 3, 9]))) == 0.0  # x2 < x1
