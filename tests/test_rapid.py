"""RAPiD rotated-detector tests: decode golden, loss, end-to-end
Detector with rotated NMS (SURVEY.md §4.1/§4.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mydetection_tpu.losses import period_l1, period_l2
from mydetection_tpu.models import rapid
from mydetection_tpu.registry import get_model


def test_period_l1_symmetry():
    # θ and θ+π are the same rotated box -> zero loss
    assert float(period_l1(jnp.asarray(0.3), jnp.asarray(0.3 + np.pi))) == \
        pytest.approx(0.0, abs=1e-6)
    assert float(period_l1(jnp.asarray(0.2), jnp.asarray(0.5))) == \
        pytest.approx(0.3, abs=1e-6)
    # wrap-around: distance between -pi/2+0.1 and pi/2 is 0.1 (period pi)
    assert float(period_l1(jnp.asarray(-np.pi / 2 + 0.1), jnp.asarray(np.pi / 2))) == \
        pytest.approx(0.1, abs=1e-5)
    assert float(period_l2(jnp.asarray(0.2), jnp.asarray(0.5))) == \
        pytest.approx(0.5 * 0.3 ** 2, abs=1e-6)


def test_decode_golden():
    h = w = 2
    raw = np.zeros((1, h, w, 3 * 6), np.float32)
    # cell (0, 1), anchor 1 of P5: txy=0, twh=0, t_theta=0 -> theta=0,
    # conf logit 1.5
    raw[0, 0, 1, 6:12] = [0.0, 0.0, 0.0, 0.0, 0.0, 1.5]
    out = rapid.decode_level(jnp.asarray(raw), rapid.ANCHORS[0], 32)
    i = (0 * w + 1) * 3 + 1
    box = np.asarray(out["boxes5"])[0, i]
    sig = lambda v: 1 / (1 + np.exp(-v))
    np.testing.assert_allclose(box[0], (sig(0) + 1) * 32, rtol=1e-6)  # cx
    np.testing.assert_allclose(box[1], (sig(0) + 0) * 32, rtol=1e-6)  # cy
    np.testing.assert_allclose(box[2:4], rapid.ANCHORS[0][1], rtol=1e-6)
    np.testing.assert_allclose(box[4], 0.0, atol=1e-7)  # sigmoid(0)-0.5 -> 0
    np.testing.assert_allclose(np.asarray(out["conf"])[0, i], sig(1.5), rtol=1e-6)


def test_theta_range():
    raw = np.zeros((1, 1, 1, 18), np.float32)
    raw[0, 0, 0, 4] = 100.0   # saturate sigmoid -> theta -> pi/2
    raw[0, 0, 0, 10] = -100.0  # -> -pi/2
    out = rapid.decode_level(jnp.asarray(raw), rapid.ANCHORS[0], 32)
    th = np.asarray(out["boxes5"])[0, :, 4]
    assert th[0] == pytest.approx(np.pi / 2, abs=1e-4)
    assert th[1] == pytest.approx(-np.pi / 2, abs=1e-4)
    assert -np.pi / 2 <= th.min() and th.max() <= np.pi / 2


def test_loss_finite_and_angle_term():
    shapes = [(1, 2, 2, 18), (1, 4, 4, 18), (1, 8, 8, 18)]
    key = jax.random.PRNGKey(0)
    raws = [0.1 * jax.random.normal(jax.random.fold_in(key, i), s)
            for i, s in enumerate(shapes)]
    gt = jnp.asarray([[[32.0, 32, 60, 120, 0.7], [10.0, 50, 40, 80, -1.2]]])
    valid = jnp.asarray([[True, True]])
    terms = jax.jit(lambda r: rapid.loss(r, gt, valid, input_size=64))(raws)
    for k in ("conf", "box", "angle", "total"):
        assert np.isfinite(float(terms[k])), k
    assert float(terms["angle"]) > 0


def test_rapid_detector_end_to_end():
    det = get_model  # silence lint
    from mydetection_tpu import Detector
    d = Detector(model_name="rapid", input_size=128,
                 compute_dtype=jnp.float32, use_pallas=False)
    img = np.random.RandomState(0).randint(0, 255, (200, 300, 3), np.uint8)
    dets = d.detect_one(np_img=img, conf_thres=0.4)
    assert dets.boxes_rot is not None
    assert dets.boxes_rot.shape[1] == 5
    arr = dets.as_array()
    assert arr.shape[1] == 6  # cx, cy, w, h, theta_deg, score
    if len(dets):
        assert (np.abs(arr[:, 4]) <= 90 + 1e-3).all()  # degrees range
        # xyxy envelope exists and is consistent
        assert dets.boxes_xyxy.shape == (len(dets), 4)
