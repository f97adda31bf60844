"""Static-scale int8 quantization for the ResNet-FPN families
(mydetection_tpu/quant_resnet.py).

Gates (mirroring tests/test_quant.py for the darknet families):
quantized forward close to the float forward on both families,
scan/unroll bitwise agreement, family dispatch through
quant.quantize_model, and the Detector integration path.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mydetection_tpu import quant, quant_resnet
from mydetection_tpu.registry import get_model

SIZE = 128


def _quantize(name):
    model = get_model(name, input_size=SIZE, num_classes=6,
                      compute_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batches = [rng.randint(0, 255, (2, SIZE, SIZE, 3), np.uint8)
               for _ in range(2)]
    qp = quant.quantize_model(model.config, params, batches)
    return model, params, batches, qp


@pytest.fixture(scope="module")
def small_retinanet():
    return _quantize("retinanet")


@pytest.fixture(scope="module")
def small_fcos():
    return _quantize("fcos")


def _check_close(model, params, qp, x_u8):
    """int8 dense output vs float dense output: cos/rel-RMS bounds.
    Random-init nets are PTQ's worst case (uncontrolled activation
    ranges); trained/BN-controlled nets sit far inside these bounds."""
    fq = jax.jit(lambda q, x: quant.forward_dense_quantized(q, x,
                                                            model.config))
    ff = jax.jit(lambda p, x: model.forward_dense(p, x)[0])
    dq = jax.device_get(fq(qp, x_u8))
    df = jax.device_get(ff(params, x_u8))
    for k in df:
        a = np.asarray(dq[k], np.float64)
        b = np.asarray(df[k], np.float64)
        assert a.shape == b.shape, k
        cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        rel = np.sqrt(((a - b) ** 2).mean()) / (np.sqrt((b ** 2).mean()) + 1e-12)
        assert cos > 0.99, (k, cos)
        assert rel < 0.15, (k, rel)


def test_retinanet_quantized_close_to_float(small_retinanet):
    model, params, batches, qp = small_retinanet
    _check_close(model, params, qp, jnp.asarray(batches[0]))


def test_fcos_quantized_close_to_float(small_fcos):
    model, params, batches, qp = small_fcos
    _check_close(model, params, qp, jnp.asarray(batches[0]))


def test_scan_matches_unrolled(small_retinanet):
    """lax.scan-stacked bottleneck stages must be bitwise identical to
    the unrolled walk under ONE jit (see test_quant.py's scan test for
    why eager-mode comparison is invalid)."""
    model, params, batches, qp = small_retinanet
    cfg = model.config
    x_u8 = jnp.asarray(batches[1])

    @jax.jit
    def both(qp, x):
        r_un = quant_resnet.forward_raw(qp, x, cfg=cfg, scan_blocks=False)
        r_sc = quant_resnet.forward_raw(qp, x, cfg=cfg, scan_blocks=True)
        return r_un, r_sc

    r_un, r_sc = both(qp, x_u8)
    for a, b in zip(r_un, r_sc):
        assert bool(jnp.all(a == b))


def test_dispatch_and_unknown_family_rejected(small_retinanet):
    model, params, batches, qp = small_retinanet
    assert isinstance(qp, quant_resnet.QuantizedResnetParams)
    bad = dataclasses.replace(model.config, family="mystery")
    with pytest.raises(ValueError, match="family 'mystery'"):
        quant.quantize_model(bad, params, batches)


def test_scale_keys_lockstep(small_retinanet):
    """Every calibration-recorded scale is either consumed as a scalar
    or folded into a stage scan stack — no orphans in either direction
    (the shared-walk guarantee)."""
    model, params, batches, qp = small_retinanet
    # per-level tower scales exist for convs 0-2 of all 5 levels; c3
    # deliberately has NO scale — its only consumer is the float out
    # conv, so it is never requantized (quant_resnet._region.tower,
    # round-5 sensitivity-sweep finding)
    for branch in ("cls", "box"):
        for li in range(5):
            for ci in range(3):
                assert f"{branch}/l{li}/c{ci}" in qp.scales
            assert f"{branch}/l{li}/c3" not in qp.scales
    for si in range(4):
        assert f"stage{si}/scan" in qp.scales
        assert f"stage{si}/b0/add" in qp.scales


def test_quantized_save_load_roundtrip(small_fcos, tmp_path):
    """Resnet-family artifact round-trip: loaded forward bitwise equal
    (covers the FCOS head extras — GN params, per-level ltrb scales)."""
    model, params, batches, qp = small_fcos
    cfg = model.config
    path = str(tmp_path / "q.npz")
    quant.save_quantized(path, qp)
    qp2 = quant.load_quantized(path)
    assert sorted(qp2.scales) == sorted(qp.scales)
    x = jnp.asarray(batches[0])

    @jax.jit
    def fwd(q, x):
        return quant_resnet.forward_raw(q, x, cfg=cfg)

    for a, b in zip(fwd(qp, x), fwd(qp2, x)):
        assert bool(jnp.all(a == b))


@pytest.mark.slow
def test_retinanet_r101_depth_inferred_and_close():
    """The walker infers block counts from the param tree (cfg carries
    no depth), so ResNet-101's 23-block stage2 must quantize and stay
    close to float without any config plumbing."""
    model = get_model("retinanet_r101", input_size=SIZE, num_classes=6,
                      compute_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batches = [rng.randint(0, 255, (1, SIZE, SIZE, 3), np.uint8)]
    qp = quant.quantize_model(model.config, params, batches)
    assert qp.scales["stage2/scan"].shape == (22, 3)
    _check_close(model, params, qp, jnp.asarray(batches[0]))


def test_detector_quantized_retinanet_end_to_end(small_retinanet):
    """Detector(quantized=True) on a ResNet family: int8 detections
    must locate the float pipeline's top boxes (IoU-matched)."""
    from mydetection_tpu.api import Detector

    model, params, batches, qp = small_retinanet
    # A raw random-init RetinaNet decodes every top box to a degenerate
    # off-image sliver (random deltas throw centers off the canvas),
    # making IoU matching vacuous. Shrink the box-out conv so deltas
    # are tiny and boxes sit ≈ on the anchors — solid, matchable boxes
    # that exercise the full pipeline plumbing (letterbox, scales dict,
    # postprocess) rather than random-net pathology.
    head = dict(params["head"])
    box = dict(head["box"])
    box["out"] = jax.tree_util.tree_map(lambda a: a * 0.01, box["out"])
    head["box"] = box
    p2 = {**params, "head": head}
    det_f = Detector(model_name="retinanet", params=p2, input_size=SIZE,
                     num_classes=6, compute_dtype=jnp.float32)
    det_q = Detector(model_name="retinanet", params=p2, input_size=SIZE,
                     num_classes=6, compute_dtype=jnp.float32,
                     quantized=True,
                     calib_images=[batches[0][0], batches[0][1]])
    img = batches[1][0]
    # random-init RetinaNet scores sit near the focal prior (~0.01) —
    # use a low threshold so both pipelines produce detections
    df = det_f.detect_one(np_img=img, conf_thres=1e-3)
    dq = det_q.detect_one(np_img=img, conf_thres=1e-3)
    assert len(df) > 0 and len(dq) > 0
    from mydetection_tpu.ops.boxes import pairwise_iou

    ious = np.asarray(pairwise_iou(jnp.asarray(df.boxes_xyxy[:5]),
                                   jnp.asarray(dq.boxes_xyxy)))
    # scores on a random net are near-ties (~the focal prior), so the
    # kept top-100 sets reshuffle under quantization noise; require a
    # majority of the float top-5 to be located by the int8 pipeline
    assert int((ious.max(axis=1) > 0.5).sum()) >= 3


def test_fakequant_gates_off_is_float_and_on_is_int8(small_retinanet):
    """ResNet-FPN counterpart of tests/test_quant.py's fake-quant pin:
    all gates OFF reproduces the folded-float walk bit-for-bit; all
    gates ON tracks the real int8 chain (cos/rel-RMS bounds — bitwise
    is unattainable, see the darknet test's docstring; the binding
    fidelity gate is the AP-level cross-check recorded by
    benchmarks/int8_sensitivity.py)."""
    model, params, batches, qp = small_retinanet
    cfg = model.config
    imgs = jnp.asarray(batches[0])
    ft = quant_resnet._fold_only(params["backbone"])
    ff = quant_resnet._fold_fpn_float(params["fpn"])
    fh = quant_resnet._fold_head_float(params["head"], cfg.family)
    ranges = quant_resnet.calibrate(cfg, params, batches,
                                    _folded=(ft, ff, fh))
    scales = {k: jnp.float32(max(abs(lo), abs(hi)) / 127.0 + 1e-12)
              for k, (lo, hi) in ranges.items()}

    def run(gate_val):
        g = jnp.float32(gate_val)
        gates = {k: g for k in scales}
        ftb = quant.blend_weight_tree(ft, lambda p: g)
        ffb = quant.blend_weight_tree(ff, lambda p: g)
        fhb = quant.blend_weight_tree(fh, lambda p: g)
        be = quant_resnet._FakeQuantBE(jnp.float32, scales, gates)
        y = quant_resnet._prologue(params["backbone"], imgs, jnp.float32)
        return quant_resnet._region(be, ftb, ffb, fhb, y, cfg=cfg)

    off = run(0.0)
    be_f = quant_resnet._CalibBE(jnp.float32)
    y0 = quant_resnet._prologue(params["backbone"], imgs, jnp.float32)
    ref = quant_resnet._region(be_f, ft, ff, fh, y0, cfg=cfg)
    for a, b in zip(off, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    on = run(1.0)
    real = quant_resnet.forward_raw(qp, imgs, cfg=cfg)
    for a, b in zip(on, real):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        rel_rms = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)
        assert cos >= 0.99, cos
        assert rel_rms <= 0.15, rel_rms
