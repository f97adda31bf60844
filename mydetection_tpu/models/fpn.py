"""Feature Pyramid Network (RetinaNet variant, P3–P7).

Reference parity: `models/fpns/` in duanzhiihao/myDetection [recalled;
SURVEY.md §2.4] — lateral 1x1 convs on C3–C5, top-down nearest-neighbor
upsample + sum, 3x3 smoothing convs, plus extra P6 (3x3 stride-2) and
P7 (ReLU + 3x3 stride-2 on P6) levels.

P6 input: the RetinaNet PAPER (arXiv 1708.02002 §4) feeds P6 from C5
(2048-ch); torchvision's `retinanet_resnet50_fpn` / `fcos_resnet50_fpn`
feed it from the smoothed P5 (`LastLevelP6P7(256, 256)` → use_P5).
We follow TORCHVISION because its checkpoints are the weight-import
parity target (weight_import._import_fpn maps `extra_blocks.p6` whose
weight is (256, 256, 3, 3) — the C5 variant could not accept it).

All convs carry bias (no BN in FPN, matching the standard design).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mydetection_tpu.models.layers import (
    KeyGen,
    Params,
    conv2d,
    conv_init,
    upsample2x,
)

FPN_CHANNELS = 256


def init(rng: jax.Array, c3: int = 512, c4: int = 1024, c5: int = 2048,
         *, channels: int = FPN_CHANNELS) -> Params:
    keys = KeyGen(rng)
    return {
        "lateral3": conv_init(keys(), 1, c3, channels, bias=True),
        "lateral4": conv_init(keys(), 1, c4, channels, bias=True),
        "lateral5": conv_init(keys(), 1, c5, channels, bias=True),
        "smooth3": conv_init(keys(), 3, channels, channels, bias=True),
        "smooth4": conv_init(keys(), 3, channels, channels, bias=True),
        "smooth5": conv_init(keys(), 3, channels, channels, bias=True),
        "p6": conv_init(keys(), 3, channels, channels, bias=True),
        "p7": conv_init(keys(), 3, channels, channels, bias=True),
    }


def _conv(p: Params, x, *, stride=1, compute_dtype=None):
    y = conv2d(x, p["w"], stride=stride, compute_dtype=compute_dtype)
    return y + p["b"].astype(y.dtype)


def apply(params: Params, feats, *, compute_dtype=None):
    """(C3, C4, C5) → [P3, P4, P5, P6, P7], all `channels`-wide NHWC."""
    c3, c4, c5 = feats
    l5 = _conv(params["lateral5"], c5, compute_dtype=compute_dtype)
    l4 = _conv(params["lateral4"], c4, compute_dtype=compute_dtype) + upsample2x(l5)
    l3 = _conv(params["lateral3"], c3, compute_dtype=compute_dtype) + upsample2x(l4)
    p3 = _conv(params["smooth3"], l3, compute_dtype=compute_dtype)
    p4 = _conv(params["smooth4"], l4, compute_dtype=compute_dtype)
    p5 = _conv(params["smooth5"], l5, compute_dtype=compute_dtype)
    p6 = _conv(params["p6"], p5, stride=2, compute_dtype=compute_dtype)
    p7 = _conv(params["p7"], jnp.maximum(p6, 0.0), stride=2,
               compute_dtype=compute_dtype)
    return [p3, p4, p5, p6, p7]
