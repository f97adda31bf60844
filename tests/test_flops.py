"""utils/flops: XLA cost-model FLOP counting + MFU arithmetic."""

import jax
import jax.numpy as jnp
import numpy as np

from mydetection_tpu.utils import flops as F


def test_conv_flops_close_to_analytic():
    H = W = 32
    cin = cout = 64

    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    x = jnp.zeros((1, H, W, cin), jnp.float32)
    w = jnp.zeros((3, 3, cin, cout), jnp.float32)
    got = F.compiled_flops(f, x, w)
    expect = H * W * cin * cout * 9 * 2  # MACs * 2
    assert got is not None
    # XLA counts adds/muls slightly differently at borders; 10% is tight
    # enough to catch a wrong formula and loose enough to be stable
    assert abs(got - expect) / expect < 0.10, (got, expect)


def test_detect_graph_reports_flops():
    from mydetection_tpu.registry import get_model

    model = get_model("yolov3", input_size=64, num_classes=5,
                      compute_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))

    def fwd(p, x):
        dense, _ = model.forward_dense(p, x)
        return dense["boxes"].sum()

    x = jnp.zeros((1, 64, 64, 3), jnp.uint8)
    got = F.compiled_flops(fwd, params, x)
    assert got is not None and got > 1e8, got  # Darknet-53 @64 is ~GFLOPs


def test_mfu_none_when_unknown():
    # CPU device kind is not in the peak table -> honest None, not a guess
    assert F.device_peak_flops("bfloat16") is None or \
        jax.devices()[0].platform == "tpu"
    if jax.devices()[0].platform != "tpu":
        assert F.mfu(1e9, 100.0) is None
    assert F.mfu(None, 100.0) is None


def test_mfu_arithmetic(monkeypatch):
    monkeypatch.setattr(F, "device_peak_flops", lambda dtype: 200e12)
    u = F.mfu(10e9, 2000.0)  # 20 TFLOP/s on a 200 TFLOP/s chip
    assert u is not None and np.isclose(u, 0.1)
