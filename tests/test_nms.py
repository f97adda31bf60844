"""NMS: pure-jax blocked implementation and Pallas kernel vs a numpy
greedy oracle (SURVEY.md §4.1/§4.2 — keep-sets for hand-built overlap
cases; every Pallas kernel asserted equal to its oracle)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mydetection_tpu.ops.nms import (
    NEG_INF,
    batched_class_nms,
    nms_padded,
    postprocess,
)
from mydetection_tpu.ops.pallas.nms_kernel import nms_pallas


def np_greedy_nms(boxes, scores, thres):
    """Numpy oracle: classic greedy NMS over score-sorted boxes."""
    keep = np.zeros(len(boxes), bool)
    alive = scores > NEG_INF / 2
    for i in range(len(boxes)):
        if not alive[i]:
            continue
        keep[i] = True
        for j in range(i + 1, len(boxes)):
            if not alive[j]:
                continue
            ix1 = max(boxes[i, 0], boxes[j, 0]); iy1 = max(boxes[i, 1], boxes[j, 1])
            ix2 = min(boxes[i, 2], boxes[j, 2]); iy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
            a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            iou = inter / max(a + b - inter, 1e-9)
            if iou > thres:
                alive[j] = False
    return keep


def _random_case(rng, k=256, n_real=180):
    centers = rng.uniform(50, 350, (n_real, 2))
    wh = rng.uniform(10, 80, (n_real, 2))
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], 1).astype(np.float32)
    scores = np.sort(rng.uniform(0.05, 1.0, n_real).astype(np.float32))[::-1].copy()
    pad = k - n_real
    boxes = np.concatenate([boxes, np.zeros((pad, 4), np.float32)])
    scores = np.concatenate([scores, np.full(pad, NEG_INF, np.float32)])
    return boxes, scores


def test_nms_handbuilt():
    boxes = np.array([
        [0, 0, 10, 10],    # kept
        [1, 1, 11, 11],    # IoU with 0 high -> suppressed
        [20, 20, 30, 30],  # kept
        [0, 0, 10, 10],    # duplicate of 0 -> suppressed
    ], np.float32)
    scores = np.array([0.9, 0.8, 0.7, 0.6], np.float32)
    pad_b = np.concatenate([boxes, np.zeros((124, 4), np.float32)])
    pad_s = np.concatenate([scores, np.full(124, NEG_INF, np.float32)])
    keep = np.asarray(nms_padded(jnp.asarray(pad_b), jnp.asarray(pad_s),
                                 iou_thres=0.5, block=128))
    assert keep[:4].tolist() == [True, False, True, False]
    assert not keep[4:].any()


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("block", [64, 128])
def test_nms_matches_oracle(seed, block):
    rng = np.random.RandomState(seed)
    boxes, scores = _random_case(rng)
    expect = np_greedy_nms(boxes, scores, 0.45)
    got = np.asarray(nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                                iou_thres=0.45, block=block))
    np.testing.assert_array_equal(got, expect)


@pytest.mark.parametrize("seed", [0, 3])
def test_pallas_nms_matches_oracle(seed):
    rng = np.random.RandomState(seed)
    boxes, scores = _random_case(rng, k=256, n_real=200)
    expect = np_greedy_nms(boxes, scores, 0.45)
    got = np.asarray(nms_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                                iou_thres=0.45, block=128, interpret=True))
    np.testing.assert_array_equal(got, expect)


def test_class_offset_separates_classes():
    boxes = np.tile(np.array([[0, 0, 10, 10]], np.float32), (128, 1))
    scores = np.full(128, NEG_INF, np.float32)
    scores[:2] = [0.9, 0.8]
    classes = np.zeros(128, np.int32)
    classes[1] = 1  # same box, different class -> both kept
    keep = np.asarray(batched_class_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                        jnp.asarray(classes), iou_thres=0.5))
    assert keep[0] and keep[1]


def test_postprocess_end_to_end():
    n, c = 500, 3
    boxes = np.zeros((n, 4), np.float32)
    scores = np.zeros((n, c), np.float32)
    boxes[0] = [10, 10, 50, 50]; scores[0, 1] = 0.95
    boxes[1] = [12, 12, 52, 52]; scores[1, 1] = 0.90   # suppressed by 0
    boxes[2] = [200, 200, 260, 260]; scores[2, 0] = 0.80
    boxes[3] = [10, 10, 50, 50]; scores[3, 2] = 0.70   # diff class, kept
    out = postprocess(jnp.asarray(boxes), jnp.asarray(scores),
                      conf_thres=0.3, iou_thres=0.5, pre_nms=128, max_dets=10)
    valid = np.asarray(out["valid"])
    assert valid.sum() == 3
    np.testing.assert_allclose(np.asarray(out["scores"])[:3], [0.95, 0.80, 0.70], atol=1e-6)
    assert np.asarray(out["classes"])[:3].tolist() == [1, 0, 2]
    np.testing.assert_allclose(np.asarray(out["boxes"])[0], [10, 10, 50, 50])
    # padded rows are zeroed and invalid
    assert not valid[3:].any()
    assert (np.asarray(out["boxes"])[3:] == 0).all()


def test_postprocess_conf_threshold_filters_everything():
    boxes = np.random.RandomState(0).uniform(0, 100, (64, 4)).astype(np.float32)
    scores = np.full((64, 2), 0.01, np.float32)
    out = postprocess(jnp.asarray(boxes), jnp.asarray(scores),
                      conf_thres=0.5, iou_thres=0.5, pre_nms=128, max_dets=10)
    assert not np.asarray(out["valid"]).any()


def test_approx_topk_matches_exact_off_tpu():
    """approx_topk=True must be a no-op off TPU (lax.approx_max_k falls
    back to an exact sort on CPU/GPU), so the whole postprocess output
    is bitwise identical — this is what keeps CPU golden/parity tests
    meaningful while TPU serving uses the PartialReduce path."""
    rng = np.random.RandomState(7)
    n, c = 6000, 5
    boxes = rng.uniform(0, 400, (n, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(4, 60, (n, 2)).astype(np.float32)
    scores = rng.uniform(0, 1, (n, c)).astype(np.float32)
    kw = dict(conf_thres=0.4, iou_thres=0.5, pre_nms=256, max_dets=50)
    exact = postprocess(jnp.asarray(boxes), jnp.asarray(scores),
                        approx_topk=False, **kw)
    approx = postprocess(jnp.asarray(boxes), jnp.asarray(scores),
                         approx_topk=True, **kw)
    for k in ("boxes", "scores", "classes", "valid"):
        np.testing.assert_array_equal(np.asarray(exact[k]), np.asarray(approx[k]))


def test_approx_topk_config_flows_to_detector():
    from mydetection_tpu import Detector

    det = Detector(model_name="yolov3", input_size=64, approx_topk=False)
    assert det.cfg.approx_topk is False
    det2 = Detector(model_name="yolov3", input_size=64)
    assert det2.cfg.approx_topk is True


def test_score_logits_single_label_honors_multi_label_false():
    """ModelConfig(multi_label=False) must reach the deferred-sigmoid
    (score_logits) path: a box whose logits put TWO classes above
    conf_thres yields ONE detection (best class), matching the dense
    single-label branch exactly."""
    import jax

    n, c = 300, 4
    rng = np.random.RandomState(5)
    boxes = rng.uniform(0, 300, (n, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(10, 60, (n, 2))
    logits = np.full((n, c), -6.0, np.float32)
    # box 0: classes 1 and 2 both confident -> single-label keeps cls 1
    logits[0, 1] = 3.0
    logits[0, 2] = 2.5
    logits[7, 3] = 2.0
    kw = dict(conf_thres=0.3, iou_thres=0.5, pre_nms=128, max_dets=10)
    out = postprocess(jnp.asarray(boxes), score_logits=jnp.asarray(logits),
                      multi_label=False, **kw)
    dense = postprocess(jnp.asarray(boxes),
                        np.asarray(jax.nn.sigmoid(jnp.asarray(logits))),
                        multi_label=False, **kw)
    valid = np.asarray(out["valid"])
    assert valid.sum() == 2  # NOT 3 — box 0 contributes one pair only
    for k in ("boxes", "scores", "classes", "valid"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(dense[k]),
                                   rtol=1e-6, atol=1e-6)
    # and multi_label=True on the same logits DOES emit both classes
    ml = postprocess(jnp.asarray(boxes), score_logits=jnp.asarray(logits),
                     multi_label=True, **kw)
    assert np.asarray(ml["valid"]).sum() == 3


def test_gate_logits_matches_dense_reduce():
    """postprocess with a head-precomputed gate (per-level max over
    classes, concatenated — models/retinanet.apply(with_gate=True))
    must be BIT-identical to the dense in-postprocess reduce: max is
    associative, so reducing per level then concatenating gives the
    same values XLA's dense reduce produces."""
    n, c = 500, 6
    rng = np.random.RandomState(11)
    boxes = rng.uniform(0, 400, (n, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(5, 80, (n, 2))
    logits = rng.randn(n, c).astype(np.float32) * 2.0
    mul = rng.uniform(0.1, 1.0, (n,)).astype(np.float32)
    # "levels" of uneven sizes, like an FPN pyramid
    splits = np.cumsum([0, 311, 97, 52, 25, 15])
    gate = np.concatenate([logits[a:b].max(axis=1)
                           for a, b in zip(splits[:-1], splits[1:])])
    kw = dict(conf_thres=0.05, iou_thres=0.5, pre_nms=256, max_dets=20)
    for score_mul in (None, jnp.asarray(mul)):
        ref = postprocess(jnp.asarray(boxes),
                          score_logits=jnp.asarray(logits),
                          score_mul=score_mul, **kw)
        got = postprocess(jnp.asarray(boxes),
                          score_logits=jnp.asarray(logits),
                          score_mul=score_mul,
                          gate_logits=jnp.asarray(gate), **kw)
        for k in ("boxes", "scores", "classes", "valid"):
            np.testing.assert_array_equal(np.asarray(ref[k]),
                                          np.asarray(got[k]))


def test_forward_dense_score_gate_matches_dense_max():
    """The retinanet/fcos forward_dense score_gate entry equals the
    max over the dense score_logits (per-level reduce + concat ==
    global reduce)."""
    import jax

    from mydetection_tpu.registry import get_model

    for name in ("retinanet", "fcos"):
        model = get_model(name, input_size=64, num_classes=5,
                          compute_dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(3))
        imgs = jnp.asarray(np.random.RandomState(4).randint(
            0, 255, (1, 64, 64, 3), np.uint8))
        dense, _ = jax.jit(lambda p, x: model.forward_dense(p, x))(
            params, imgs)
        assert "score_gate" in dense, name
        np.testing.assert_array_equal(
            np.asarray(dense["score_gate"]),
            np.asarray(jnp.max(dense["score_logits"], axis=-1)))
