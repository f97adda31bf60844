"""Rotated IoU vs a numpy rasterization oracle (SURVEY.md §7 hard-part
5: "validate against a numpy rasterization oracle in tests")."""

import jax.numpy as jnp
import numpy as np
import pytest

from mydetection_tpu.ops.nms import NEG_INF
from mydetection_tpu.ops.rotated import (
    box_corners,
    pairwise_rotated_iou,
    rotated_iou,
    rotated_nms_padded,
    rotated_postprocess,
)


def raster_iou(a, b, res=400):
    """Rasterization oracle (the reference's approach, used here only
    as a test oracle)."""
    import cv2

    pts = np.concatenate([np.asarray(box_corners(jnp.asarray(a))),
                          np.asarray(box_corners(jnp.asarray(b)))])
    lo = pts.reshape(-1, 2).min(0) - 2
    hi = pts.reshape(-1, 2).max(0) + 2
    scale = res / max(hi - lo)

    def mask(box):
        c = (np.asarray(box_corners(jnp.asarray(box))) - lo) * scale
        m = np.zeros((res, res), np.uint8)
        cv2.fillPoly(m, [c.astype(np.int32)], 1)
        return m

    ma, mb = mask(a), mask(b)
    inter = np.logical_and(ma, mb).sum()
    union = np.logical_or(ma, mb).sum()
    return inter / max(union, 1)


def test_axis_aligned_matches_axis_iou():
    a = jnp.array([0.0, 0, 20, 10, 0])   # cx,cy,w,h,theta
    b = jnp.array([5.0, 0, 20, 10, 0])
    # overlap: x in [-5,10] w=15, y h=10 -> inter 150, union 400-150=250
    np.testing.assert_allclose(float(rotated_iou(a, b)), 150 / 250, atol=1e-5)


def test_identical_boxes_rotated():
    a = jnp.array([3.0, -2, 8, 4, 0.7])
    assert float(rotated_iou(a, a)) == pytest.approx(1.0, abs=1e-5)


def test_disjoint():
    a = jnp.array([0.0, 0, 4, 4, 0.3])
    b = jnp.array([100.0, 100, 4, 4, 1.0])
    assert float(rotated_iou(a, b)) == 0.0


def test_90_degree_cross():
    # two elongated boxes crossing at right angles through the origin
    a = jnp.array([0.0, 0, 20, 4, 0])
    b = jnp.array([0.0, 0, 20, 4, np.pi / 2])
    # intersection = 4x4 = 16, union = 80+80-16 = 144
    np.testing.assert_allclose(float(rotated_iou(a, b)), 16 / 144, atol=1e-5)


def test_contained_box():
    a = jnp.array([0.0, 0, 20, 20, 0.2])
    b = jnp.array([0.0, 0, 4, 4, 0.9])  # fully inside a
    np.testing.assert_allclose(float(rotated_iou(a, b)), 16 / 400, atol=1e-5)


@pytest.mark.parametrize("seed", range(5))
def test_random_vs_rasterization(seed):
    rng = np.random.RandomState(seed)
    a = np.array([*rng.uniform(-5, 5, 2), *rng.uniform(5, 20, 2),
                  rng.uniform(-np.pi, np.pi)], np.float32)
    b = np.array([*rng.uniform(-5, 5, 2), *rng.uniform(5, 20, 2),
                  rng.uniform(-np.pi, np.pi)], np.float32)
    got = float(rotated_iou(jnp.asarray(a), jnp.asarray(b)))
    expect = raster_iou(a, b)
    assert got == pytest.approx(expect, abs=0.02)


def test_lb_area_matches_candidate_formulation():
    """The production Liang–Barsky line-integral area must agree with
    the 24-candidate polygon construction (the slower formulation kept
    as an oracle) across random boxes AND the boundary-degenerate cases
    the line-integral handles via the shared-segment ½ weight."""
    from mydetection_tpu.ops.rotated import (
        rotated_intersection_area,
        rotated_intersection_area_lb,
    )

    rng = np.random.RandomState(11)
    n = 4000
    def sample(off):
        return np.stack([rng.uniform(0, 100, n) + off,
                         rng.uniform(0, 100, n) + off,
                         rng.uniform(5, 60, n), rng.uniform(5, 60, n),
                         rng.uniform(-np.pi / 2, np.pi / 2, n)],
                        -1).astype(np.float32)
    for off in (0.0, 900.0):  # small and image-scale (1024 px) coords
        a, b = sample(off), sample(off)
        cand = np.asarray(rotated_intersection_area(jnp.asarray(a), jnp.asarray(b)))
        lb = np.asarray(rotated_intersection_area_lb(jnp.asarray(a), jnp.asarray(b)))
        min_area = np.minimum(a[:, 2] * a[:, 3], b[:, 2] * b[:, 3])
        np.testing.assert_array_less(np.abs(cand - lb) / min_area, 0.005)

    cases = [  # (A, B, exact intersection area)
        ([10, 10, 8, 4, 0.3], [10, 10, 8, 4, 0.3], 32.0),        # identical
        ([0, 0, 2, 2, 0.0], [2, 0, 2, 2, 0.0], 0.0),             # touching
        ([1, 0.5, 2, 1, 0.0], [2, 0.5, 2, 1, 0.0], 1.0),         # shared edge
        ([0, 0, 2, 2, np.pi / 4], [0, 0, 2, 2, 0.0], 8 * (np.sqrt(2) - 1)),
        ([10, 10, 20, 20, 0.0], [10, 10, 4, 4, 0.5], 16.0),      # contained
        ([0, 0, 10, 2, 0.0], [0, 0, 2, 10, 0.0], 4.0),           # cross
    ]
    for aa, bb, want in cases:
        got = float(rotated_intersection_area_lb(
            jnp.asarray(aa, jnp.float32), jnp.asarray(bb, jnp.float32)))
        assert got == pytest.approx(want, abs=5e-3), (aa, bb, got, want)


def test_pairwise_shape_and_symmetry(rng):
    a = np.column_stack([rng.uniform(-5, 5, (8, 2)), rng.uniform(5, 15, (8, 2)),
                         rng.uniform(-1.5, 1.5, 8)]).astype(np.float32)
    m = np.asarray(pairwise_rotated_iou(jnp.asarray(a), jnp.asarray(a)))
    assert m.shape == (8, 8)
    np.testing.assert_allclose(m, m.T, atol=1e-4)
    np.testing.assert_allclose(np.diag(m), 1.0, atol=1e-4)


def test_rotated_nms():
    k = 64
    boxes = np.zeros((k, 5), np.float32)
    scores = np.full(k, NEG_INF, np.float32)
    boxes[0] = [50, 50, 30, 10, 0.3]; scores[0] = 0.9
    boxes[1] = [51, 51, 30, 10, 0.32]; scores[1] = 0.8   # near-dup -> suppressed
    boxes[2] = [150, 150, 30, 10, 1.0]; scores[2] = 0.7  # far -> kept
    keep = np.asarray(rotated_nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                                         iou_thres=0.3, block=32))
    assert keep[:3].tolist() == [True, False, True]
    assert not keep[3:].any()


def test_rotated_postprocess():
    n = 200
    boxes = np.zeros((n, 5), np.float32)
    scores = np.zeros(n, np.float32)
    boxes[0] = [100, 100, 40, 20, 0.5]; scores[0] = 0.95
    boxes[1] = [101, 100, 40, 20, 0.5]; scores[1] = 0.90
    boxes[2] = [300, 300, 40, 20, -0.5]; scores[2] = 0.85
    out = rotated_postprocess(jnp.asarray(boxes), jnp.asarray(scores),
                              conf_thres=0.3, iou_thres=0.4,
                              pre_nms=64, max_dets=10, block=32)
    valid = np.asarray(out["valid"])
    assert valid.sum() == 2
    np.testing.assert_allclose(np.asarray(out["boxes"])[0], boxes[0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["boxes"])[1], boxes[2], atol=1e-5)


def test_pallas_suppress_matches_oracle():
    """The Pallas suppress kernel (interpret mode) must reproduce the
    pure-jax rotated NMS keep-set exactly."""
    from mydetection_tpu.ops.pallas.rotated_nms_kernel import nms_from_iou_pallas
    from mydetection_tpu.ops.rotated import (
        pairwise_rotated_iou,
        rotated_nms_padded,
    )

    rng = np.random.RandomState(0)
    k, n_real = 128, 100
    boxes = np.zeros((k, 5), np.float32)
    boxes[:n_real, :2] = rng.uniform(50, 350, (n_real, 2))
    boxes[:n_real, 2:4] = rng.uniform(20, 90, (n_real, 2))
    boxes[:n_real, 4] = rng.uniform(-1.5, 1.5, n_real)
    scores = np.full(k, NEG_INF, np.float32)
    scores[:n_real] = np.sort(rng.uniform(0, 1, n_real))[::-1]

    expect = np.asarray(rotated_nms_padded(jnp.asarray(boxes),
                                           jnp.asarray(scores),
                                           iou_thres=0.3, block=32))
    iou = pairwise_rotated_iou(jnp.asarray(boxes), jnp.asarray(boxes))
    got = np.asarray(nms_from_iou_pallas(iou, jnp.asarray(scores),
                                         iou_thres=0.3, block=32,
                                         interpret=True))
    np.testing.assert_array_equal(got, expect)


@pytest.mark.parametrize("block", [32, 64, 128])
def test_pallas_suppress_block_sizes(block):
    """Fixpoint suppress is block-size invariant (semantics must not
    depend on the perf tile): kernel == greedy oracle for every block."""
    from mydetection_tpu.ops.pallas.rotated_nms_kernel import nms_from_iou_pallas
    from mydetection_tpu.ops.rotated import (
        pairwise_rotated_iou,
        rotated_nms_padded,
    )

    rng = np.random.RandomState(7)
    k, n_real = 256, 200
    boxes = np.zeros((k, 5), np.float32)
    boxes[:n_real, :2] = rng.uniform(30, 480, (n_real, 2))
    boxes[:n_real, 2:4] = rng.uniform(15, 100, (n_real, 2))
    boxes[:n_real, 4] = rng.uniform(-1.5, 1.5, n_real)
    scores = np.full(k, NEG_INF, np.float32)
    scores[:n_real] = np.sort(rng.uniform(0, 1, n_real))[::-1]

    expect = np.asarray(rotated_nms_padded(jnp.asarray(boxes),
                                           jnp.asarray(scores),
                                           iou_thres=0.4, block=64))
    iou = pairwise_rotated_iou(jnp.asarray(boxes), jnp.asarray(boxes))
    got = np.asarray(nms_from_iou_pallas(iou, jnp.asarray(scores),
                                         iou_thres=0.4, block=block,
                                         interpret=True))
    np.testing.assert_array_equal(got, expect)


def test_near_face_tolerance_window_exact():
    """Regression: an edge sitting (EPS_INSIDE, 2*EPS_INSIDE] px inside
    the other box's parallel face used to be half-weighted while its
    mirror face-edge was rejected, losing 25% of the area. The on_face
    tolerance must match the slab inside-acceptance tolerance."""
    from mydetection_tpu.ops.rotated import (
        EPS_INSIDE,
        rotated_intersection_area_lb,
    )

    for delta in (1.5 * EPS_INSIDE, 2.0 * EPS_INSIDE, 3.0 * EPS_INSIDE):
        a = jnp.array([50.0 - delta, 50.0, 100.0, 100.0, 0.0])
        b = jnp.array([50.0, 50.0, 100.0, 100.0, 0.0])
        got = float(rotated_intersection_area_lb(a, b))
        true = 100.0 * (100.0 - delta)
        assert abs(got - true) < 0.01, (delta, got, true)
    # within-tolerance offsets stay at shared-boundary fuzz level
    for delta in (0.0, 0.5 * EPS_INSIDE):
        a = jnp.array([50.0 - delta, 50.0, 100.0, 100.0, 0.0])
        b = jnp.array([50.0, 50.0, 100.0, 100.0, 0.0])
        got = float(rotated_intersection_area_lb(a, b))
        assert abs(got - 100.0 * (100.0 - delta)) < 0.1


def test_pairwise_trig_precompute_is_bitwise_identical():
    """pairwise_rotated_iou evaluates cos/sin once per box and
    broadcasts; the result must be BITWISE identical to the naive
    per-pair evaluation (same scalar fn, same θ values — this is a
    pure cost refactor, not an approximation)."""
    import jax.numpy as jnp

    from mydetection_tpu.ops import rotated as R

    rng = np.random.RandomState(7)
    n, m = 33, 17
    a = np.stack([rng.uniform(0, 512, n), rng.uniform(0, 512, n),
                  rng.uniform(8, 120, n), rng.uniform(8, 120, n),
                  rng.uniform(-np.pi / 2, np.pi / 2, n)], 1).astype(np.float32)
    b = np.stack([rng.uniform(0, 512, m), rng.uniform(0, 512, m),
                  rng.uniform(8, 120, m), rng.uniform(8, 120, m),
                  rng.uniform(-np.pi / 2, np.pi / 2, m)], 1).astype(np.float32)
    got = np.asarray(R.pairwise_rotated_iou_impl(jnp.asarray(a),
                                                 jnp.asarray(b)))
    aa = jnp.broadcast_to(jnp.asarray(a)[:, None, :], (n, m, 5))
    bb = jnp.broadcast_to(jnp.asarray(b)[None, :, :], (n, m, 5))
    ref = np.asarray(R.rotated_iou_impl(aa, bb))  # per-pair trig
    np.testing.assert_array_equal(got, ref)
