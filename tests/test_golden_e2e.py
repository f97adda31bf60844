"""End-to-end golden regression + static-shape discipline tests.

[spec] gate: "bit-consistent box decode on golden images". The golden
is procedurally generated (no binary blobs in git): a deterministic
structured image + PRNGKey(0) weights; the expected detections are
committed in tests/golden/yolov3_e2e.npz. Any change to letterbox
geometry, normalize, decode math, top-k or NMS semantics moves these
numbers and fails the test.

SURVEY.md §4.3: static-shape discipline — the detect pipeline must
trace exactly once per (model, input-size) bucket; data-dependent
shapes would force retraces.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "yolov3_e2e.npz")


def golden_image() -> np.ndarray:
    """Deterministic 300x400 structured RGB image (no RNG, no PIL)."""
    h, w = 300, 400
    y = np.arange(h)[:, None]
    x = np.arange(w)[None, :]
    r = (x * 255 // w).astype(np.uint8)
    g = (y * 255 // h).astype(np.uint8)
    b = ((x + y) % 256).astype(np.uint8)
    img = np.stack([r + 0 * y, 0 * x + g, b], -1).astype(np.uint8)
    img[60:180, 50:150] = (220, 40, 40)     # solid rectangle
    img[100:250, 220:360] = (40, 200, 80)   # second rectangle
    return img


def compute_detections():
    from mydetection_tpu import Detector

    det = Detector(model_name="yolov3", input_size=416,
                   compute_dtype=jnp.float32, use_pallas=False, rng_seed=0)
    d = det.detect_one(np_img=golden_image(), conf_thres=0.25, nms_iou=0.45)
    return d


def test_e2e_golden_regression():
    d = compute_detections()
    if not os.path.exists(GOLDEN):  # first run: write the golden
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez(GOLDEN, boxes=d.boxes_xyxy, scores=d.scores,
                 classes=d.classes)
        pytest.skip("golden file created; rerun to verify")
    ref = np.load(GOLDEN)
    assert len(d) == len(ref["scores"]), (len(d), len(ref["scores"]))
    np.testing.assert_allclose(d.scores, ref["scores"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(d.boxes_xyxy, ref["boxes"], rtol=1e-4,
                               atol=1e-2)
    np.testing.assert_array_equal(d.classes, ref["classes"])


@pytest.mark.parametrize("name,size,conf", [
    ("retinanet", 160, 0.005),  # prior-prob bias → ~0.01 scores at init
    ("retinanet_r101", 160, 0.005),
    ("fcos", 160, 0.005),
    ("rapid", 128, 0.25),
])
def test_e2e_golden_all_families(name, size, conf):
    """Same regression pin for every model family: any change to the
    family's decode / postprocess / letterbox semantics moves these
    self-generated goldens (small input sizes keep XLA:CPU compiles
    cheap; the semantics pinned are size-independent)."""
    from mydetection_tpu import Detector

    golden = os.path.join(os.path.dirname(__file__), "golden",
                          f"{name}_e2e.npz")
    det = Detector(model_name=name, input_size=size,
                   compute_dtype=jnp.float32, use_pallas=False, rng_seed=0)
    d = det.detect_one(np_img=golden_image(), conf_thres=conf, nms_iou=0.45)
    assert len(d) > 0, "golden scenario must produce detections"
    payload = {"boxes": d.boxes_xyxy, "scores": d.scores, "classes": d.classes}
    if d.boxes_rot is not None:
        payload["boxes_rot"] = d.boxes_rot
    if not os.path.exists(golden):  # first run: write the golden
        os.makedirs(os.path.dirname(golden), exist_ok=True)
        np.savez(golden, **payload)
        pytest.skip("golden file created; rerun to verify")
    ref = np.load(golden)
    assert len(d) == len(ref["scores"]), (len(d), len(ref["scores"]))
    np.testing.assert_allclose(d.scores, ref["scores"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(d.boxes_xyxy, ref["boxes"], rtol=1e-4,
                               atol=1e-2)
    np.testing.assert_array_equal(d.classes, ref["classes"])
    if "boxes_rot" in payload:
        np.testing.assert_allclose(d.boxes_rot, ref["boxes_rot"], rtol=1e-4,
                                   atol=1e-2)


def test_pipeline_traces_once_per_bucket():
    import jax

    from mydetection_tpu import Detector

    det = Detector(model_name="yolov3", input_size=128,
                   compute_dtype=jnp.float32, use_pallas=False)
    traces = {"n": 0}
    orig = det.model.forward_dense

    def counting_forward(*a, **kw):
        traces["n"] += 1  # Python side effect: runs only while TRACING
        return orig(*a, **kw)

    object.__setattr__(det.model, "forward_dense", counting_forward)
    img = np.zeros((100, 160, 3), np.uint8)
    det.detect_one(np_img=img, conf_thres=0.3)
    assert traces["n"] == 1
    for _ in range(3):  # same bucket, varying conf: no retrace
        det.detect_one(np_img=img, conf_thres=0.5)
        det.detect_one(np_img=img[:50], conf_thres=0.1)
    assert traces["n"] == 1
    det.detect_one(np_img=img, input_size=64)  # new bucket: one trace
    assert traces["n"] == 2
    det.detect_one(np_img=img, input_size=64)
    assert traces["n"] == 2
