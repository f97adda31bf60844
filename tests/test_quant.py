"""Static-scale int8 quantization (mydetection_tpu/quant.py).

Gates: exact BN fold, scan/unroll bitwise agreement, quantized forward
close to the float forward (quant-error bounded), and the Detector
integration path. All on the CPU backend (conftest) — int8 convs are
exact there (verified: int32 accum equals the f32 conv bit-for-bit on
integer inputs).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mydetection_tpu import quant
from mydetection_tpu.models import darknet, yolov3
from mydetection_tpu.models.layers import conv2d, conv_bn_leaky, leaky_relu
from mydetection_tpu.registry import get_model

SIZE = 96


@pytest.fixture(scope="module")
def small_yolo():
    model = get_model("yolov3", input_size=SIZE, num_classes=8,
                      compute_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batches = [rng.randint(0, 255, (2, SIZE, SIZE, 3), np.uint8)
               for _ in range(2)]
    qp = quant.quantize_model(model.config, params, batches)
    return model, params, batches, qp


def test_fold_cbl_exact():
    """conv(w·s)+shift ≡ BN(conv(w)) at inference — relative 1e-5
    (f32 reassociation only; BN stats randomized so the fold is
    actually exercised)."""
    rng = jax.random.PRNGKey(3)
    ks = jax.random.split(rng, 6)
    p = {"conv": {"w": 0.05 * jax.random.normal(ks[0], (3, 3, 32, 64))},
         "bn": {"scale": 1.0 + 0.3 * jax.random.normal(ks[1], (64,)),
                "bias": jax.random.normal(ks[2], (64,)),
                "mean": jax.random.normal(ks[3], (64,)),
                "var": jnp.exp(jax.random.normal(ks[4], (64,)))}}
    x = jax.random.normal(ks[5], (2, 16, 16, 32))
    ref, _ = conv_bn_leaky(p, x, stride=2)
    f = quant.fold_cbl(p)
    got = leaky_relu(conv2d(x, f["wf"], stride=2) + f["bias"])
    scale = float(jnp.max(jnp.abs(ref))) + 1e-8
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(ref) / scale, atol=1e-5)


def test_weight_quant_roundtrip_error_bound():
    w = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (3, 3, 16, 32))
    wq, ws = quant.quantize_weight(w)
    deq = wq.astype(jnp.float32) * ws
    # symmetric per-channel: error ≤ half a quantization step per channel
    err = jnp.max(jnp.abs(deq - w), axis=(0, 1, 2))
    assert bool(jnp.all(err <= 0.5 * ws + 1e-9))


def test_quantized_forward_close_to_float(small_yolo):
    """End-to-end raw head outputs: int8 chain vs float chain. On a
    RANDOM-init net the activations explode through 50 layers (worst
    case for PTQ); cosine ≥ 0.99 and rel-RMS ≤ 15% still holds — on a
    trained net (BN-controlled scales) the error is far smaller."""
    model, params, batches, qp = small_yolo
    x_u8 = jnp.asarray(batches[0])
    raw_q = quant.forward_raw(qp, x_u8, compute_dtype=jnp.float32)
    xf = x_u8.astype(jnp.float32) / 255.0
    feats, _ = darknet.apply(params["backbone"], xf, compute_dtype=jnp.float32)
    raw_f, _ = yolov3.apply(params["head"], feats, compute_dtype=jnp.float32)
    for q, r in zip(raw_q, raw_f):
        q = np.asarray(q, np.float64)
        r = np.asarray(r, np.float64)
        cos = (q * r).sum() / (np.linalg.norm(q) * np.linalg.norm(r) + 1e-12)
        rel = np.sqrt(((q - r) ** 2).mean()) / (np.sqrt((r ** 2).mean()) + 1e-12)
        assert cos > 0.99, cos
        assert rel < 0.15, rel


def test_quant_scan_matches_unrolled(small_yolo):
    """The lax.scan-stacked res stages must be BITWISE identical to the
    unrolled walk (same int8 ops, different control flow). Compared
    under ONE jit: eager mode compiles each op separately and its
    dequant arithmetic can round differently (FMA fusion) than the
    scan body's fused epilogue, flipping round() at .5 boundaries —
    within a single compilation XLA treats both paths identically
    (measured maxabs 0 on all three heads)."""
    model, params, batches, qp = small_yolo
    x_u8 = jnp.asarray(batches[1])

    @jax.jit
    def both(qp, x):
        y = quant._prologue(qp.backbone_float, x, jnp.float32)
        r_un = quant._region(
            quant._QuantBE(qp.scales, jnp.float32, scan_blocks=False),
            qp.qb, qp.qh, y)
        r_sc = quant._region(
            quant._QuantBE(qp.scales, jnp.float32, scan_blocks=True),
            qp.qb, qp.qh, y)
        return r_un, r_sc

    r_un, r_sc = both(qp, x_u8)
    for a, b in zip(r_un, r_sc):
        assert bool(jnp.all(a == b))


def test_quantized_save_load_roundtrip(small_yolo, tmp_path):
    """save_quantized/load_quantized must round-trip the artifact so a
    serving process skips calibration — loaded forward is BITWISE
    identical to the in-memory one (int8 dtypes and '/'-bearing scale
    keys preserved)."""
    model, params, batches, qp = small_yolo
    path = str(tmp_path / "q.npz")
    quant.save_quantized(path, qp, model.config)
    qp2 = quant.load_quantized(path, model.config)
    assert sorted(qp2.scales) == sorted(qp.scales)
    # structural-identity guard: a mismatched Detector fails readably
    import dataclasses as dc
    with pytest.raises(ValueError, match="num_classes"):
        quant.load_quantized(path, dc.replace(model.config, num_classes=3))
    x = jnp.asarray(batches[0])

    @jax.jit
    def fwd(q, x):
        return quant.forward_raw(q, x, compute_dtype=jnp.float32)

    for a, b in zip(fwd(qp, x), fwd(qp2, x)):
        assert bool(jnp.all(a == b))


def test_quantize_dispatches_resnet_families():
    """ResNet families route to quant_resnet (whose own tests live in
    test_quant_resnet.py); unknown families fail readably."""
    import dataclasses

    model = get_model("retinanet", input_size=64, compute_dtype=jnp.float32)
    bad = dataclasses.replace(model.config, family="mystery")
    with pytest.raises(ValueError, match="family 'mystery'"):
        quant.quantize_model(bad, {}, [])


def test_detector_quantized_end_to_end(small_yolo):
    """Detector(quantized=True): detections from the int8 pipeline must
    closely match the float pipeline's on the same image (same boxes
    within a few px for confidently-detected objects). Uses the float
    detector's params so weights are shared."""
    from mydetection_tpu.api import Detector

    model, params, batches, qp = small_yolo
    det_f = Detector(model_name="yolov3", params=params, input_size=SIZE,
                     num_classes=8, compute_dtype=jnp.float32)
    det_q = Detector(model_name="yolov3", params=params, input_size=SIZE,
                     num_classes=8, compute_dtype=jnp.float32,
                     quantized=True,
                     calib_images=[batches[0][0], batches[0][1]])
    img = batches[1][0]
    df = det_f.detect_one(np_img=img, conf_thres=0.5)
    dq = det_q.detect_one(np_img=img, conf_thres=0.5)
    assert len(dq) > 0  # random-init sigmoid(large logits) detects plenty
    # detect_prepared (the evaluator/streaming entry) must also route
    # to the quantized params (regression: it once passed float params
    # into the quantized graph)
    from mydetection_tpu.utils.image_ops import letterbox_pil
    from PIL import Image

    canvas, info = letterbox_pil(Image.fromarray(img), SIZE)
    dp = det_q.detect_prepared(np.stack([canvas]), [info], conf_thres=0.5)
    assert len(dp) == 1 and len(dp[0]) == len(dq)
    # the top-scoring detections should agree on location: compare the
    # best-IoU match for each of the float pipeline's top-5 boxes
    from mydetection_tpu.ops.boxes import pairwise_iou
    if len(df) and len(dq):
        ious = np.asarray(pairwise_iou(jnp.asarray(df.boxes_xyxy[:5]),
                                       jnp.asarray(dq.boxes_xyxy)))
        assert float(ious.max(axis=1).min()) > 0.5


def test_fakequant_gates_off_is_float_and_on_is_int8(small_yolo):
    """The sensitivity-sweep simulation (_FakeQuantBE +
    blend_weight_tree) is pinned at both ends: all gates OFF
    reproduces the folded-float chain bit-for-bit (jnp.where passes y
    through), and all gates ON tracks the REAL int8 chain
    (`forward_raw`). The ON leg cannot be bitwise: the real path
    accumulates int32 exactly while the simulation's f32 conv rounds,
    and values landing on round-to-nearest boundaries flip by one
    quantum, cascading — on THIS random-init net (activations explode
    to ~8e4 through 50 layers) that compounds to a few percent
    rel-RMS. The binding fidelity gate is AP-level: the sensitivity
    sweep (benchmarks/int8_sensitivity.py) records all-gates-on
    simulated AP next to the real int8 path's AP on the trained proxy
    and they must agree to ~0.01 AP."""
    model, params, batches, qp = small_yolo
    imgs = jnp.asarray(batches[0])
    bt, ht = quant._fold_region(params)
    ranges = quant.calibrate(params, batches, compute_dtype=jnp.float32,
                             _folded=(bt, ht))
    scales = {k: jnp.float32(max(abs(lo), abs(hi)) / 127.0 + 1e-12)
              for k, (lo, hi) in ranges.items()}

    def run(gate_val):
        gates = {k: jnp.float32(gate_val) for k in scales}
        btb = quant.blend_weight_tree(bt, lambda p: jnp.float32(gate_val))
        htb = quant.blend_weight_tree(ht, lambda p: jnp.float32(gate_val))
        be = quant._FakeQuantBE(jnp.float32, scales, gates)
        y = quant._prologue(params["backbone"], imgs, jnp.float32)
        return quant._region(be, btb, htb, y)

    off = run(0.0)
    be_f = quant._CalibBE(jnp.float32)
    y0 = quant._prologue(params["backbone"], imgs, jnp.float32)
    ref_float = quant._region(be_f, bt, ht, y0)
    for a, b in zip(off, ref_float):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    on = run(1.0)
    real = quant.forward_raw(qp, imgs, compute_dtype=jnp.float32)
    for a, b in zip(on, real):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        rel_rms = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)
        assert cos >= 0.99, cos
        assert rel_rms <= 0.15, rel_rms
    # and the ON leg is NOT the float chain (the gates do something)
    d0 = np.asarray(on[0], np.float64) - np.asarray(off[0], np.float64)
    assert np.max(np.abs(d0)) > 0.0


def test_act_scheme_ab_and_old_artifact_upgrade(small_yolo, tmp_path):
    """(a) act_scheme='sym' still works (the A/B escape hatch) and its
    scales carry m0=0. (b) A pre-round-5 artifact (scalar symmetric
    scales, no wsum) loads through the upgrade path and produces the
    SAME forward as the in-memory sym quantization — bitwise."""
    model, params, batches, qp_asym = small_yolo
    qp = quant.quantize_model(model.config, params, batches,
                              act_scheme="sym")
    flat_ok = all(np.asarray(v)[..., 1].max() == 0.0
                  for v in qp.scales.values())
    assert flat_ok  # sym == affine with m0=0
    # downgrade to the old on-disk format: drop the m0 column + wsum
    old_scales = {k: jnp.asarray(np.asarray(v)[..., 0])
                  for k, v in qp.scales.items()}

    def strip_wsum(node):
        if isinstance(node, dict):
            return {k: strip_wsum(v) for k, v in node.items()
                    if k != "wsum"}
        return node

    qp_old = quant.QuantizedParams(
        backbone_float=qp.backbone_float,
        qb=strip_wsum(qp.qb), qh=strip_wsum(qp.qh), scales=old_scales)
    path = str(tmp_path / "old.npz")
    quant.save_quantized(path, qp_old, model.config)
    qp2 = quant.load_quantized(path, model.config)
    x = jnp.asarray(batches[0])

    @jax.jit
    def fwd(q, x):
        return quant.forward_raw(q, x, compute_dtype=jnp.float32)

    for a, b in zip(fwd(qp, x), fwd(qp2, x)):
        assert bool(jnp.all(a == b))
    # and asym != sym on at least one head (the schemes genuinely differ)
    da = fwd(qp_asym, x)
    assert any(bool(jnp.any(a != b)) for a, b in zip(da, fwd(qp, x)))
