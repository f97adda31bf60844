"""Model component tests: shapes, decode math golden values, loss
gradients (SURVEY.md §4.1 golden decode; §4 strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mydetection_tpu.models import darknet, yolov3
from mydetection_tpu.registry import get_model


def test_darknet_feature_shapes():
    params = darknet.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    (c3, c4, c5), updates = jax.jit(darknet.apply)(params, x)
    assert c3.shape == (1, 16, 16, 256)
    assert c4.shape == (1, 8, 8, 512)
    assert c5.shape == (1, 4, 4, 1024)
    assert updates is None


def test_darknet_s2d_stem_matches_standard_path():
    """The space-to-depth stem fast path (TPU MFU fix: stem+first
    downsample fold into half-resolution 4x-channel convs) is an EXACT
    rewrite — same dot products, different layout. C3/C4/C5 must match
    the standard path to float32-reassociation noise."""
    params = darknet.init(jax.random.PRNGKey(3))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3)
                    .astype(np.float32))
    ref = jax.jit(lambda p, v: darknet.apply(p, v, s2d_stem=False)[0])(params, x)
    got = jax.jit(lambda p, v: darknet.apply(p, v, s2d_stem=True)[0])(params, x)
    for r, g in zip(ref, got):
        r, g = np.asarray(r), np.asarray(g)
        scale = np.abs(r).max() + 1e-8
        np.testing.assert_allclose(g / scale, r / scale, atol=1e-5)
    # odd spatial dims can't split into 2x2 cells: auto-path must fall
    # back to the standard stem rather than mis-shaping
    x_odd = jnp.asarray(np.random.RandomState(1).randn(1, 33, 33, 3)
                        .astype(np.float32))
    assert not darknet._use_s2d(True, False, x_odd)
    assert not darknet._use_s2d(True, True, x_odd)  # train, odd dims


def test_darknet_s2d_train_matches_standard():
    """Training through the S2D chain is exact: forward features, BN
    batch-stat updates (phase-pooled over the 4 phase blocks — same
    pixel multiset as the standard reduction), and parameter gradients
    (flowing through the weight folds) all match the standard path.

    Tolerances: the weight folds are exact (f64: pre-BN relayout diff
    0.0, pooled mean/var diff ~1e-15 — verified), but batch_norm
    quantizes batch stats to float32 in BOTH paths, and that rounding
    lands differently for the two reduction layouts; through 53 chained
    BN layers + backward it amplifies to ~2e-5 on features and ~2e-4
    on scaled gradients (measured; identical magnitude under x64,
    which pins it to the f32 stat cast, not the rewrite)."""
    params = darknet.init(jax.random.PRNGKey(3))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3)
                    .astype(np.float32))

    def run(s2d):
        def loss(p):
            feats, upd = darknet.apply(p, x, train=True, s2d_stem=s2d,
                                       scan_blocks=False)
            return sum(jnp.sum(f ** 2) for f in feats) / 1e3, (feats, upd)

        (val, (feats, upd)), grads = jax.value_and_grad(
            loss, has_aux=True)(params)
        return val, feats, upd, grads

    val_r, feats_r, upd_r, grads_r = jax.jit(lambda: run(False))()
    val_g, feats_g, upd_g, grads_g = jax.jit(lambda: run(True))()

    np.testing.assert_allclose(float(val_g), float(val_r), rtol=1e-5)
    for r, g in zip(feats_r, feats_g):
        r, g = np.asarray(r), np.asarray(g)
        scale = np.abs(r).max() + 1e-8
        np.testing.assert_allclose(g / scale, r / scale, atol=1e-4)
    # identical tree structure AND values for BN updates + grads
    assert (jax.tree_util.tree_structure(upd_r)
            == jax.tree_util.tree_structure(upd_g))
    for r, g in zip(jax.tree_util.tree_leaves(upd_r),
                    jax.tree_util.tree_leaves(upd_g)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-3, atol=1e-4)
    for (pr, r), (pg, g) in zip(
            jax.tree_util.tree_leaves_with_path(grads_r),
            jax.tree_util.tree_leaves_with_path(grads_g)):
        assert pr == pg
        r, g = np.asarray(r), np.asarray(g)
        scale = np.abs(r).max() + 1e-8
        np.testing.assert_allclose(g / scale, r / scale, atol=1e-3,
                                   err_msg=jax.tree_util.keystr(pr))


def test_darknet_packed_s2d2_input_matches_standard_path():
    """Host-packed S2D-2 uint8 input (B, H/2, W/2, 12) must produce
    the same features as the unpacked standard path: the pack is a
    pure relayout and the stem weight fold (_s2d_conv3_weight) is an
    exact rewrite. This pins the TPU inference fast path end to end,
    including uint8 normalize on the packed layout."""
    from mydetection_tpu.models import layers as L
    from mydetection_tpu.utils.image_ops import pack_s2d2

    params = darknet.init(jax.random.PRNGKey(3))
    imgs = np.random.RandomState(0).randint(0, 255, (2, 64, 64, 3),
                                            np.uint8)
    xf = L.normalize_input(jnp.asarray(imgs))
    ref = jax.jit(lambda p, v: darknet.apply(p, v, s2d_stem=False)[0])(
        params, xf)
    xp = L.normalize_input(jnp.asarray(pack_s2d2(imgs)))
    got = jax.jit(lambda p, v: darknet.apply(p, v)[0])(params, xp)
    for r, g in zip(ref, got):
        r, g = np.asarray(r), np.asarray(g)
        scale = np.abs(r).max() + 1e-8
        np.testing.assert_allclose(g / scale, r / scale, atol=1e-5)
    # packed input is inference-only: train mode must refuse, not
    # silently compute BN stats over phase-split channels
    with pytest.raises(ValueError):
        darknet.apply(params, xp, train=True)


def test_darknet_train_mode_returns_bn_updates():
    params = darknet.init(jax.random.PRNGKey(0))
    x = jnp.ones((2, 64, 64, 3), jnp.float32)
    _, updates = jax.jit(lambda p, v: darknet.apply(p, v, train=True))(params, x)
    assert "stem" in updates and "mean" in updates["stem"]["bn"]
    # batch stats moved toward the data (input mean 1, post-conv nonzero)
    assert not np.allclose(np.asarray(updates["stem"]["bn"]["mean"]), 0.0)


def test_yolo_head_output_shapes():
    nc = 80
    hp = yolov3.init(jax.random.PRNGKey(1), nc)
    c3 = jnp.zeros((1, 52, 52, 256))
    c4 = jnp.zeros((1, 26, 26, 512))
    c5 = jnp.zeros((1, 13, 13, 1024))
    raw, _ = jax.jit(yolov3.apply)(hp, (c3, c4, c5))
    assert raw[0].shape == (1, 13, 13, 3 * 85)
    assert raw[1].shape == (1, 26, 26, 3 * 85)
    assert raw[2].shape == (1, 52, 52, 3 * 85)
    decoded = yolov3.decode(raw, nc)
    n = (13 * 13 + 26 * 26 + 52 * 52) * 3
    assert decoded["boxes"].shape == (1, n, 4)
    assert decoded["obj"].shape == (1, n)
    assert decoded["cls"].shape == (1, n, nc)


def test_decode_golden_values():
    """Bit-level decode check against hand-computed values
    (SURVEY.md §4.1: grid/anchor box decode for fixed raw logits)."""
    nc = 2
    h = w = 2
    raw = np.zeros((1, h, w, 3 * (5 + nc)), np.float32)
    # cell (y=1, x=0), anchor 0 of P5 (116, 90), stride 32
    raw[0, 1, 0, 0:7] = [0.0, 0.5, np.log(2.0), 0.0, 2.0, -1.0, 1.0]
    out = yolov3.decode_level(jnp.asarray(raw), yolov3.ANCHORS[0], 32, nc)
    i = (1 * w + 0) * 3 + 0  # flat index of (y=1, x=0, a=0)
    box = np.asarray(out["boxes"])[0, i]
    sig = lambda v: 1 / (1 + np.exp(-v))
    np.testing.assert_allclose(box[0], (sig(0.0) + 0) * 32, rtol=1e-6)   # cx
    np.testing.assert_allclose(box[1], (sig(0.5) + 1) * 32, rtol=1e-6)   # cy
    np.testing.assert_allclose(box[2], 2.0 * 116, rtol=1e-6)             # w
    np.testing.assert_allclose(box[3], 1.0 * 90, rtol=1e-6)              # h
    np.testing.assert_allclose(np.asarray(out["obj"])[0, i], sig(2.0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["cls"])[0, i],
                               [sig(-1.0), sig(1.0)], rtol=1e-6)


def test_loss_finite_and_differentiable():
    model = get_model("yolov3", input_size=128, compute_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    # Random (not all-zero) images: constant input gives every BN layer
    # zero batch variance, whose backward amplifies cotangents by
    # rsqrt(eps) per layer until float32 overflow -> inf*0 NaN. That
    # degenerate regime is shared with the reference's torch BN and is
    # not a real training state.
    images = jax.random.uniform(jax.random.PRNGKey(5), (1, 128, 128, 3))
    gt_boxes = jnp.asarray([[[64, 64, 40, 30], [20, 100, 16, 16]]], jnp.float32)
    gt_classes = jnp.asarray([[3, 7]], jnp.int32)
    gt_valid = jnp.asarray([[True, True]])

    def scalar_loss(p):
        terms = model.loss(p, images, gt_boxes, gt_classes, gt_valid,
                           input_size=128)
        return terms["total"]

    val, grads = jax.jit(jax.value_and_grad(scalar_loss))(params)
    assert np.isfinite(float(val))
    gnorm = jax.tree_util.tree_reduce(
        lambda a, g: a + float(jnp.sum(jnp.abs(g))), grads, 0.0)
    assert np.isfinite(gnorm) and gnorm > 0


def test_loss_ignore_mask_golden():
    """Hand-built ignore-mask case pinning the darknet obj-loss idiom
    (VERDICT r1 weak #7): predictions whose decoded box overlaps ANY GT
    with IoU > 0.6 are dropped from the negative obj BCE; the assigned
    cell always counts.

    With all-zero logits every prediction decodes to its cell center
    with its anchor's size and every BCE term is exactly log(2), so the
    expected obj loss is log(2) · |{assigned} ∪ {not ignored}| — fully
    computable by brute force in numpy.
    """
    nc = 2
    size = 64
    raws = [np.zeros((1, size // s, size // s, 3 * (5 + nc)), np.float32)
            for s in yolov3.STRIDES]
    # GT sized exactly like P3 anchor (33, 23), centered on P3 cell (2,2):
    # its 8 px-offset P3 neighbors decode to IoU ≈ 0.61 > 0.6 → ignored.
    gt_boxes = jnp.asarray([[[20.0, 20.0, 33.0, 23.0]]])
    gt_classes = jnp.asarray([[1]], jnp.int32)
    gt_valid = jnp.asarray([[True]])

    terms = yolov3.loss(None, [jnp.asarray(r) for r in raws], gt_boxes,
                        gt_classes, gt_valid, input_size=size, num_classes=nc)

    # brute-force oracle over every (level, cell, anchor)
    def iou(a, b):
        ax1, ay1, ax2, ay2 = a[0]-a[2]/2, a[1]-a[3]/2, a[0]+a[2]/2, a[1]+a[3]/2
        bx1, by1, bx2, by2 = b[0]-b[2]/2, b[1]-b[3]/2, b[0]+b[2]/2, b[1]+b[3]/2
        iw = max(0.0, min(ax2, bx2) - max(ax1, bx1))
        ih = max(0.0, min(ay2, by2) - max(ay1, by1))
        inter = iw * ih
        return inter / (a[2]*a[3] + b[2]*b[3] - inter)

    gt = (20.0, 20.0, 33.0, 23.0)
    all_anchors = [a for lvl in yolov3.ANCHORS for a in lvl]
    best = int(np.argmax([iou((0, 0, w, h), (0, 0, gt[2], gt[3]))
                          for (w, h) in all_anchors]))
    assert best == 8  # P3 anchor (33, 23) — the case is on the level we built
    count, ignored = 0, 0
    for li, stride in enumerate(yolov3.STRIDES):
        g = size // stride
        for j in range(g):
            for i in range(g):
                for ai, (aw, ah) in enumerate(yolov3.ANCHORS[li]):
                    pred = ((i + 0.5) * stride, (j + 0.5) * stride, aw, ah)
                    assigned = (li == 2 and (i, j) == (2, 2) and ai == 2)
                    if assigned or iou(pred, gt) <= yolov3.IGNORE_THRES:
                        count += 1
                    else:
                        ignored += 1
    assert ignored > 0  # the scenario genuinely exercises the mask
    np.testing.assert_allclose(float(terms["obj"]), np.log(2.0) * count,
                               rtol=1e-5)


def test_loss_zero_when_no_gt_positives_cls_box():
    model = get_model("yolov3", input_size=128, compute_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    images = jnp.zeros((1, 128, 128, 3), jnp.float32)
    gt_boxes = jnp.zeros((1, 2, 4), jnp.float32)
    gt_classes = jnp.zeros((1, 2), jnp.int32)
    gt_valid = jnp.zeros((1, 2), bool)
    terms = jax.jit(lambda p, x, b, c, v: model.loss(p, x, b, c, v,
                                                     input_size=128))(
        params, images, gt_boxes, gt_classes, gt_valid)
    assert float(terms["box"]) == 0.0
    assert float(terms["cls"]) == 0.0
    assert float(terms["obj"]) > 0.0  # background objectness BCE remains


def test_forward_dense_uint8_entry():
    model = get_model("yolov3", input_size=128, compute_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    imgs = jnp.zeros((2, 128, 128, 3), jnp.uint8)
    dense, updates = jax.jit(lambda p, x: model.forward_dense(p, x))(params, imgs)
    n = (4 * 4 + 8 * 8 + 16 * 16) * 3
    assert dense["boxes"].shape == (2, n, 4)
    # yolov3 is single-label: per-box best-class score + class id
    assert dense["scores"].shape == (2, n)
    assert dense["classes"].shape == (2, n)
    assert dense["classes"].dtype == jnp.int32
    assert updates is None
    assert np.isfinite(np.asarray(dense["boxes"])).all()


def test_single_label_decode_matches_dense_reduction():
    """decode_single_label must equal max/argmax over the dense
    multi-label scores (sigmoid is monotone, so reducing logits first
    is exact)."""
    rng = np.random.RandomState(0)
    sizes = [(4, 4), (8, 8), (16, 16)]  # P5, P4, P3 at input 128
    # modest logit magnitude so f32 sigmoid does NOT saturate (untrained
    # conv outputs saturate to exactly 1.0 and tie every argmax)
    raw = [jnp.asarray(2.0 * rng.randn(2, h, w, 3 * 85).astype(np.float32))
           for h, w in sizes]
    d1 = yolov3.decode_single_label(raw, 80)
    d2 = yolov3.decode(raw, 80)
    s2 = np.asarray(yolov3.scores_from(d2))

    np.testing.assert_allclose(np.asarray(d1["boxes"]),
                               np.asarray(d2["boxes"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d1["scores"]), s2.max(-1),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(d1["classes"]), s2.argmax(-1))


def test_stride2_padding_matches_torch():
    """Stride-2 convs / max-pool must use symmetric (torch/darknet)
    padding, not XLA 'SAME' — on even inputs SAME pads (0,1) and shifts
    every downsampled feature map by one pixel, which silently breaks
    imported official weights (SURVEY.md §7 hard-part #3)."""
    torch = __import__("torch")
    import torch.nn.functional as F

    from mydetection_tpu.models.layers import conv2d, max_pool

    rng = np.random.RandomState(0)
    x = rng.randn(2, 16, 16, 5).astype(np.float32)          # NHWC, even H/W
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))          # NCHW

    for k, pad in ((3, 1), (7, 3)):
        w = rng.randn(k, k, 5, 6).astype(np.float32)        # HWIO
        wt = torch.from_numpy(w.transpose(3, 2, 0, 1))      # OIHW
        ours = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), stride=2))
        ref = F.conv2d(xt, wt, stride=2, padding=pad).numpy()
        np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref,
                                   rtol=1e-4, atol=1e-4)

    ours = np.asarray(max_pool(jnp.asarray(x), 3, 2))
    ref = F.max_pool2d(xt, 3, stride=2, padding=1).numpy()
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref)


def test_use_scan_policy(monkeypatch):
    """Block-scan resolves: TPU inference scans (fast cold compile),
    TPU training unrolls (the scan backward cost 43.6 ms/step of
    while-op time — see _use_scan docstring), CPU always unrolls;
    explicit True/False override the auto policy."""
    monkeypatch.setattr(darknet.jax, "default_backend", lambda: "tpu")
    assert darknet._use_scan(None) is True
    assert darknet._use_scan(None, train=True) is False
    assert darknet._use_scan(True, train=True) is True
    assert darknet._use_scan(False) is False
    monkeypatch.setattr(darknet.jax, "default_backend", lambda: "cpu")
    assert darknet._use_scan(None) is False
    assert darknet._use_scan(None, train=True) is False
