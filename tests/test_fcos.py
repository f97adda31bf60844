"""FCOS component tests: locations, assignment, centerness golden
values, decode, loss (SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mydetection_tpu.models import fcos
from mydetection_tpu.registry import get_model


def test_locations_order_and_values():
    locs, strides = fcos.generate_locations(128)
    locs, strides = np.asarray(locs), np.asarray(strides)
    shapes = fcos.level_shapes(128)
    assert len(locs) == sum(h * w for h, w in shapes)
    # torchvision convention: locations at grid·stride (see
    # generate_locations docstring)
    np.testing.assert_allclose(locs[0], [0.0, 0.0])   # P3 cell (0,0)
    np.testing.assert_allclose(locs[1], [8.0, 0.0])   # P3 cell (0,1)
    assert strides[0] == 8.0
    n3 = shapes[0][0] * shapes[0][1]
    np.testing.assert_allclose(locs[n3], [0.0, 0.0])  # first P4 loc
    np.testing.assert_allclose(locs[n3 + 1], [16.0, 0.0])
    assert strides[n3] == 16.0


def test_assignment_center_and_range():
    locs, strides = fcos.generate_locations(128)
    # one big GT centered at (64, 64), size 60x60 -> max ltrb 30+, fits P3
    gt = jnp.asarray([[[34.0, 34, 94, 94]]])  # xyxy
    valid = jnp.asarray([[True]])
    positive, matched, tgt, ctr = fcos._assign(locs, strides, gt, valid)
    positive = np.asarray(positive)[0]
    assert positive.any()
    # the P3 location nearest the center must be positive with high ctr
    # (restrict to P3: higher levels also have a location at the exact
    # center but are excluded by the level-range rule)
    locs_np = np.asarray(locs)
    p3 = np.asarray(strides) == 8.0
    center_idx = np.argmin(np.where(p3, np.abs(locs_np - 64).sum(1), 1e9))
    assert positive[center_idx]
    # nearest P3 loc is exactly (64,64) (grid·stride): l=t=r=b=30 → ctr 1
    assert float(np.asarray(ctr)[0, center_idx]) == pytest.approx(1.0, abs=1e-4)
    # all positives sit on P3 (max dist 60 < 64) given center sampling
    assert (np.asarray(strides)[positive] == 8.0).all()


def test_centerness_golden():
    # location at (10, 10) inside box [0,0,40,20]: l=10,t=10,r=30,b=10
    # ctr = sqrt((10/30)*(10/10)) = sqrt(1/3)
    locs = jnp.asarray([[10.0, 10.0]])
    strides = jnp.asarray([8.0])
    gt = jnp.asarray([[[0.0, 0, 40, 20]]])
    valid = jnp.asarray([[True]])
    _, _, tgt, ctr = fcos._assign(locs, strides, gt, valid)
    np.testing.assert_allclose(np.asarray(tgt)[0, 0], [10, 10, 30, 10],
                               atol=1e-5)
    np.testing.assert_allclose(float(np.asarray(ctr)[0, 0]),
                               np.sqrt(1 / 3), rtol=1e-5)


def test_min_area_tiebreak():
    locs = jnp.asarray([[50.0, 50.0]])
    strides = jnp.asarray([8.0])
    gt = jnp.asarray([[[0.0, 0, 100, 100], [40.0, 40, 60, 60]]])  # big, small
    valid = jnp.asarray([[True, True]])
    _, matched, _, _ = fcos._assign(locs, strides, gt, valid)
    assert int(np.asarray(matched)[0, 0]) == 1  # smaller box wins


def test_decode_golden():
    locs = jnp.asarray([[100.0, 50.0]])
    ltrb = jnp.asarray([[[10.0, 20.0, 30.0, 40.0]]])
    cls = jnp.zeros((1, 1, 2))
    ctr = jnp.full((1, 1), 10.0)  # sigmoid ~ 1
    out = fcos.decode(cls, ltrb, ctr, locs)
    np.testing.assert_allclose(np.asarray(out["boxes"])[0, 0],
                               [90, 30, 130, 90], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["scores"])[0, 0], [0.5, 0.5],
                               rtol=1e-3)


def test_loss_finite_and_zero_box_on_perfect():
    locs, strides = fcos.generate_locations(64)
    n = locs.shape[0]
    gt_boxes = jnp.asarray([[[32.0, 32, 40, 40]]])  # cxcywh
    gt_classes = jnp.asarray([[2]], jnp.int32)
    gt_valid = jnp.asarray([[True]])
    # construct perfect ltrb predictions from the assignment itself
    from mydetection_tpu.ops.boxes import cxcywh_to_xyxy
    positive, matched, tgt, ctr_tgt = fcos._assign(
        locs, strides, cxcywh_to_xyxy(gt_boxes), gt_valid)
    terms = fcos.loss(jnp.zeros((1, n, 5)), tgt, jnp.zeros((1, n)),
                      locs, strides, gt_boxes, gt_classes, gt_valid,
                      num_classes=5)
    assert np.isfinite(float(terms["total"]))
    assert float(terms["box"]) == pytest.approx(0.0, abs=1e-5)


@pytest.mark.slow
def test_end_to_end_forward_shapes():
    model = get_model("fcos", input_size=128, compute_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    # ImageNet-mean pixels standardize to ~0, so untrained scores
    # sit at the prior-prob bias (zero pixels standardize to ~-2
    # and swamp it through random weights)
    imgs = jnp.broadcast_to(jnp.asarray([124, 116, 104], jnp.uint8),
                            (1, 128, 128, 3))
    dense, _ = jax.jit(lambda p, x: model.forward_dense(p, x))(params, imgs)
    n = sum(h * w for h, w in fcos.level_shapes(128))
    assert dense["boxes"].shape == (1, n, 4)
    # forward_dense emits logits + centerness multiplier (sigmoid
    # deferred past top-k in the postprocess)
    assert dense["score_logits"].shape == (1, n, 80)
    assert dense["score_mul"].shape == (1, n)
    assert np.isfinite(np.asarray(dense["boxes"])).all()


@pytest.mark.slow
def test_head_init_keeps_focal_prior():
    """Tower + out convs are N(0, 0.01) like torchvision's FCOS head:
    a He-scale cls_out swamps the -log((1-π)/π) prior bias and random
    images score ~0.5 instead of ~0.01 at init (see retinanet's
    divergence regression test for the training consequence)."""
    model = get_model("fcos", input_size=128, num_classes=8,
                      compute_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 255, (2, 128, 128, 3), np.uint8))
    dense, _ = jax.jit(model.forward_dense)(params, imgs)
    s = 1 / (1 + np.exp(-np.asarray(dense["score_logits"], np.float32)))
    assert 0.005 < float(s.mean()) < 0.02

    gt_boxes = jnp.asarray(rng.uniform(30, 90, (2, 4, 4)), jnp.float32)
    terms = model.loss(params, imgs, gt_boxes,
                       jnp.asarray(rng.randint(0, 8, (2, 4)), jnp.int32),
                       jnp.ones((2, 4), bool), input_size=128)
    assert np.isfinite(float(terms["total"]))
    assert float(terms["total"]) < 20.0, float(terms["total"])


def test_gn_kernel_matches_oracle():
    """The fused Pallas bias+GN+ReLU kernel (ops/pallas/gn_kernel.py,
    interpret mode here; compiled equality re-checked on hardware by
    benchmarks/fcos_gn_experiments.py) must reproduce the pure-jax
    tower step: relu(group_norm(x + b))."""
    from mydetection_tpu.models.fcos import group_norm
    from mydetection_tpu.ops.pallas.gn_kernel import bias_gn_relu_pallas_impl

    rng = np.random.RandomState(0)
    b, h, w, c, g = 3, 9, 11, 64, 32
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32) * 3,
                        dtype)
        bias = jnp.asarray(rng.randn(c).astype(np.float32))
        scale = jnp.asarray(rng.uniform(0.5, 2, c).astype(np.float32))
        shift = jnp.asarray(rng.randn(c).astype(np.float32))
        xb = x + bias.astype(x.dtype)
        want = jnp.maximum(group_norm(xb, {"scale": scale, "bias": shift},
                                      groups=g), 0.0)
        got = bias_gn_relu_pallas_impl(x, bias, scale, shift, groups=g,
                                       interpret=True)
        assert got.dtype == x.dtype
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=2e-2 if dtype == jnp.bfloat16 else 1e-5,
            atol=2e-2 if dtype == jnp.bfloat16 else 1e-5)


def test_gn_trainable_value_and_grads_match_oracle():
    """The custom-VJP fused GN (bias_gn_relu_trainable) must match the
    pure-jax tower step in BOTH value and all four gradients (dx,
    dbias, dscale, dshift) — the analytic fused backward
    (ops/pallas/gn_kernel._gn_bwd_kernel) vs jax autodiff of
    relu(group_norm(x + b)). Interpret mode here; the compiled train
    step delta is measured by benchmarks/fcos_gn_experiments.py."""
    from mydetection_tpu.models.fcos import group_norm
    from mydetection_tpu.ops.pallas.gn_kernel import bias_gn_relu_trainable

    rng = np.random.RandomState(1)
    b, h, w, c, g = 2, 7, 9, 64, 32
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32) * 2)
    bias = jnp.asarray(rng.randn(c).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 2, c).astype(np.float32))
    shift = jnp.asarray(rng.randn(c).astype(np.float32))
    ct = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))

    def loss_oracle(x, bias, scale, shift):
        xb = x + bias
        y = jnp.maximum(group_norm(xb, {"scale": scale, "bias": shift},
                                   groups=g), 0.0)
        return jnp.sum(y * ct)

    def loss_fused(x, bias, scale, shift):
        y = bias_gn_relu_trainable(x, bias, scale, shift, groups=g,
                                   interpret=True)
        return jnp.sum(y * ct)

    v0, g0 = jax.value_and_grad(loss_oracle, argnums=(0, 1, 2, 3))(
        x, bias, scale, shift)
    v1, g1 = jax.value_and_grad(loss_fused, argnums=(0, 1, 2, 3))(
        x, bias, scale, shift)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5)
    for name, a, b_ in zip(("dx", "dbias", "dscale", "dshift"), g1, g0):
        ref = np.asarray(b_, np.float64)
        got = np.asarray(a, np.float64)
        denom = np.max(np.abs(ref)) + 1e-8
        np.testing.assert_allclose(got / denom, ref / denom,
                                   atol=1e-5, err_msg=name)


def test_gn_trainable_bf16_grads_close():
    """bf16 in/out (the training compute dtype on TPU): gradients stay
    within bf16 rounding of the f32 oracle."""
    from mydetection_tpu.models.fcos import group_norm
    from mydetection_tpu.ops.pallas.gn_kernel import bias_gn_relu_trainable

    rng = np.random.RandomState(2)
    b, h, w, c, g = 2, 5, 6, 64, 32
    xf = rng.randn(b, h, w, c).astype(np.float32)
    x = jnp.asarray(xf, jnp.bfloat16)
    bias = jnp.asarray(rng.randn(c).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 2, c).astype(np.float32))
    shift = jnp.asarray(rng.randn(c).astype(np.float32))

    def loss_fused(x, bias, scale, shift):
        y = bias_gn_relu_trainable(x, bias, scale, shift, groups=g,
                                   interpret=True)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def loss_oracle(x, bias, scale, shift):
        xb = x + bias.astype(x.dtype)
        y = jnp.maximum(group_norm(xb, {"scale": scale, "bias": shift},
                                   groups=g), 0.0)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    gf = jax.grad(loss_fused, argnums=(1, 2, 3))(x, bias, scale, shift)
    go = jax.grad(loss_oracle, argnums=(1, 2, 3))(x, bias, scale, shift)
    for name, a, b_ in zip(("dbias", "dscale", "dshift"), gf, go):
        ref = np.asarray(b_, np.float64)
        got = np.asarray(a, np.float64)
        denom = np.max(np.abs(ref)) + 1e-8
        np.testing.assert_allclose(got / denom, ref / denom, atol=2e-2,
                                   err_msg=name)
