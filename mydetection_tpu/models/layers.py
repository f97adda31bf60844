"""Shared neural-net building blocks: conv / batch-norm / activations.

Pure-functional JAX with plain pytree (nested-dict) params — design
decision from SURVEY.md §7 ("pure-functional JAX, plain pytree params",
no framework dependency). Every block is an `init(rng, ...) -> params`
plus an `apply(params, x, ...)` pair.

TPU-native layout choices:
  * activations NHWC, conv weights HWIO — XLA's native TPU layouts, so
    convs tile straight onto the MXU with no transposes.
  * compute dtype is a parameter (`bfloat16` for inference throughput,
    `float32` for golden-parity tests); params are stored float32 and
    cast at the conv (SURVEY.md §7 hard-part #2: pinned precision).
  * BatchNorm is folded to a single scale+shift at inference.

Reference parity: `ConvBnLeaky` blocks of `models/backbones/darknet.py`
in duanzhiihao/myDetection [recalled; SURVEY.md §2.3]; LeakyReLU slope
is 0.1 (a silent-mAP-killer if wrong — SURVEY.md §7 hard-part #3).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

LEAKY_SLOPE = 0.1
BN_EPS = 1e-5
BN_MOMENTUM = 0.9

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

class KeyGen:
    """Sequential PRNG key dispenser.

    Iterating / tuple-unpacking the array from `jax.random.split(rng, n)`
    unstacks it element-by-element with device→host round-trips — which
    the axon TPU tunnel backend rejects outright. Splitting one key per
    call stays entirely on device.
    """

    def __init__(self, rng: jax.Array):
        self._rng = rng

    def __call__(self) -> jax.Array:
        ks = jax.random.split(self._rng, 2)
        self._rng = ks[0]
        return ks[1]


def split2(rng: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Split into two keys without host-side unstacking."""
    ks = jax.random.split(rng, 2)
    return ks[0], ks[1]


def kaiming_conv_init(rng: jax.Array, ksize: int, c_in: int, c_out: int,
                      dtype=jnp.float32) -> jnp.ndarray:
    """He-normal conv weight (HWIO): std = sqrt(2/fan_in).

    NOTE: this is the He/Kaiming-NORMAL init, NOT torch's Conv2d
    default (kaiming_uniform with a=sqrt(5), std ≈ sqrt(1/(3·fan_in)),
    ~2.4x smaller) — step-0 activation magnitudes will differ from a
    torch twin. Import parity is unaffected (imported weights replace
    the init); from-scratch training uses this deliberately."""
    fan_in = ksize * ksize * c_in
    std = math.sqrt(2.0 / fan_in)
    return std * jax.random.normal(rng, (ksize, ksize, c_in, c_out), dtype)


def conv_init(rng: jax.Array, ksize: int, c_in: int, c_out: int,
              bias: bool = False, std: float | None = None) -> Params:
    """Conv params; He-normal weight by default.

    `std`: fixed gaussian std instead of He scaling. RetinaNet/FCOS
    detection heads REQUIRE std=0.01 (arXiv 1708.02002 §4.1 /
    torchvision RetinaNetHead): with He-scale weights the 5-conv subnet
    produces O(1) logits that swamp the -log((1-π)/π) focal prior bias,
    so the init cls loss lands ~4 orders too high and SGD diverges to
    NaN within a few steps (measured on TPU bf16 @608 before the fix).
    """
    if std is None:
        w = kaiming_conv_init(rng, ksize, c_in, c_out)
    else:
        w = std * jax.random.normal(
            rng, (ksize, ksize, c_in, c_out), jnp.float32)
    p: Params = {"w": w}
    if bias:
        p["b"] = jnp.zeros((c_out,), jnp.float32)
    return p


def bn_init(c: int) -> Params:
    return {
        "scale": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


# ---------------------------------------------------------------------------
# apply fns
# ---------------------------------------------------------------------------

def conv2d(x: jnp.ndarray, w: jnp.ndarray, *, stride: int = 1,
           padding: str | int | None = None, compute_dtype=None) -> jnp.ndarray:
    """NHWC x HWIO conv. `padding`: None (default) = explicit symmetric
    (k-1)//2 per side — torch/darknet convention; or 'SAME'/'VALID'/int.

    Symmetric padding matters for stride-2 convs: XLA 'SAME' pads
    asymmetrically ((0,1) for 3x3 s2 on even inputs) which shifts every
    downsampled feature map by one pixel vs the reference darknet /
    torchvision weights (SURVEY.md §7 hard-part #3 — a silent
    mAP-killer for imported checkpoints). At stride 1 with odd kernels
    the two conventions coincide, so this default is safe everywhere.
    """
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    if padding is None:
        ph, pw = (w.shape[0] - 1) // 2, (w.shape[1] - 1) // 2
        padding = [(ph, ph), (pw, pw)]
    elif isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def batch_norm(x: jnp.ndarray, bn: Params, *, train: bool = False,
               momentum: float = BN_MOMENTUM):
    """BatchNorm. Inference: folded scale+shift from running stats.

    Training mode returns (y, new_stats) where new_stats is the updated
    {mean, var} running-average pair; inference returns (y, None).
    Stats math is always float32 regardless of compute dtype.
    """
    if train:
        xf = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(xf, axis=axes)
        var = jnp.var(xf, axis=axes)
        # torch parity: batch NORMALIZATION uses the biased variance,
        # but the RUNNING average accumulates the unbiased (n/(n-1))
        # estimate — a biased running var drifts low on small spatial
        # batches and diverges from a torch-trained twin at inference
        n = 1
        for a in axes:
            n *= x.shape[a]
        unbiased = var * (n / max(n - 1, 1))
        new_stats = {
            "mean": momentum * bn["mean"] + (1 - momentum) * mean,
            "var": momentum * bn["var"] + (1 - momentum) * unbiased,
        }
    else:
        mean, var = bn["mean"], bn["var"]
        new_stats = None
    scale = bn["scale"] * jax.lax.rsqrt(var + BN_EPS)
    shift = bn["bias"] - mean * scale
    y = x * scale.astype(x.dtype) + shift.astype(x.dtype)
    return y, new_stats


def leaky_relu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x >= 0, x, LEAKY_SLOPE * x)


def conv_bn_leaky_init(rng: jax.Array, ksize: int, c_in: int, c_out: int) -> Params:
    return {"conv": conv_init(rng, ksize, c_in, c_out), "bn": bn_init(c_out)}


def conv_bn_leaky(params: Params, x: jnp.ndarray, *, stride: int = 1,
                  train: bool = False, compute_dtype=None):
    """Conv→BN→LeakyReLU(0.1) — the Darknet building block.

    Returns (y, bn_stats_update_or_None).
    """
    y = conv2d(x, params["conv"]["w"], stride=stride, compute_dtype=compute_dtype)
    y, stats = batch_norm(y, params["bn"], train=train)
    return leaky_relu(y), stats


def conv_bn_relu(params: Params, x: jnp.ndarray, *, stride: int = 1,
                 train: bool = False, compute_dtype=None):
    """Conv→BN→ReLU — the ResNet building block."""
    y = conv2d(x, params["conv"]["w"], stride=stride, compute_dtype=compute_dtype)
    y, stats = batch_norm(y, params["bn"], train=train)
    return jnp.maximum(y, 0.0), stats


def normalize_input(images_u8: jnp.ndarray, compute_dtype=jnp.float32) -> jnp.ndarray:
    """uint8 NHWC RGB → float [0,1] NHWC, inside the jitted graph.

    The reference normalizes on host ([spec]: the normalize / HWC→CHW
    math must live in-graph; we keep NHWC which is the TPU layout, so
    only the /255 normalize remains).
    """
    return images_u8.astype(compute_dtype) / jnp.asarray(255.0, compute_dtype)


IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def standardize_imagenet(x01: jnp.ndarray) -> jnp.ndarray:
    """[0,1] RGB → ImageNet-standardized, in-graph.

    torchvision-pretrained ResNet backbones (the import target of
    weight_import.import_resnet_state_dict) were trained on
    mean/std-standardized inputs; feeding plain [0,1] mis-scales every
    BN running stat. YOLO-family stays at plain /255 (darknet idiom).
    """
    mean = jnp.asarray(IMAGENET_MEAN, x01.dtype)
    std = jnp.asarray(IMAGENET_STD, x01.dtype)
    return (x01 - mean) / std


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample, NHWC (YOLOv3 neck idiom)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def max_pool(x: jnp.ndarray, window: int, stride: int,
             padding: str | int | None = None) -> jnp.ndarray:
    """Max pool. `padding` None/int = explicit symmetric pad with -inf
    (torch MaxPool2d convention — same stride-2 parity issue as conv2d)."""
    if padding is None:
        padding = (window - 1) // 2
    if isinstance(padding, int):
        padding = [(0, 0), (padding, padding), (padding, padding), (0, 0)]
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1), (1, stride, stride, 1), padding
    )


def tree_merge(params: Params, updates: Params | None) -> Params:
    """Functional deep-merge of a (sparse) update tree into a param tree.

    Used to fold train-mode BatchNorm running-stat updates back into the
    param pytree without mutation: every `apply(..., train=True)` returns
    an update tree mirroring the param structure at the BN leaves.
    """
    if updates is None:
        return params
    out = dict(params)
    for k, v in updates.items():
        if isinstance(v, dict) and isinstance(params.get(k), dict):
            out[k] = tree_merge(params[k], v)
        else:
            out[k] = v
    return out
