"""ResNet-50/101 backbone (bottleneck blocks) in pure-functional JAX.

Reference parity: `models/backbones/resnet.py` in
duanzhiihao/myDetection wraps torchvision's ResNet truncated to C3–C5
[recalled; SURVEY.md §2.4]. This is a from-scratch NHWC implementation
of the same architecture (He et al., arXiv 1512.03385, v1.5 stride
placement as in torchvision: stride-2 on the 3x3 conv) so torchvision
checkpoints can be imported by the weight importer.

Returns C3/C4/C5 features at strides 8/16/32, channels 512/1024/2048.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mydetection_tpu.models.layers import (
    KeyGen,
    Params,
    batch_norm,
    bn_init,
    conv2d,
    conv_init,
    max_pool,
)

STAGE_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}
STAGE_CHANNELS = (256, 512, 1024, 2048)  # bottleneck output channels


def _conv_bn_init(rng, k, c_in, c_out) -> Params:
    return {"conv": conv_init(rng, k, c_in, c_out), "bn": bn_init(c_out)}


def _bottleneck_init(keys: KeyGen, c_in: int, c_out: int,
                     downsample: bool) -> Params:
    c_mid = c_out // 4
    p: Params = {
        "conv1": _conv_bn_init(keys(), 1, c_in, c_mid),
        "conv2": _conv_bn_init(keys(), 3, c_mid, c_mid),
        "conv3": _conv_bn_init(keys(), 1, c_mid, c_out),
    }
    if downsample:
        p["down"] = _conv_bn_init(keys(), 1, c_in, c_out)
    return p


def init(rng: jax.Array, *, depth: int = 50) -> Params:
    if depth not in STAGE_BLOCKS:
        raise ValueError(f"unsupported ResNet depth {depth}")
    keys = KeyGen(rng)
    params: Params = {"stem": _conv_bn_init(keys(), 7, 3, 64)}
    c_in = 64
    for si, nblocks in enumerate(STAGE_BLOCKS[depth]):
        c_out = STAGE_CHANNELS[si]
        stage: Params = {}
        for bi in range(nblocks):
            stage[f"block{bi}"] = _bottleneck_init(
                keys, c_in if bi == 0 else c_out, c_out, downsample=(bi == 0))
        params[f"stage{si}"] = stage
        c_in = c_out
    return params


def _conv_bn(p: Params, x, *, stride=1, train=False, compute_dtype=None):
    y = conv2d(x, p["conv"]["w"], stride=stride, compute_dtype=compute_dtype)
    y, stats = batch_norm(y, p["bn"], train=train)
    return y, ({"bn": stats} if train else None)


def _bottleneck(p: Params, x, *, stride: int, train, compute_dtype):
    u: Params = {}
    y, s = _conv_bn(p["conv1"], x, train=train, compute_dtype=compute_dtype)
    if train:
        u["conv1"] = s
    y = jnp.maximum(y, 0.0)
    # torchvision v1.5: stride lives on the 3x3 conv
    y, s = _conv_bn(p["conv2"], y, stride=stride, train=train,
                    compute_dtype=compute_dtype)
    if train:
        u["conv2"] = s
    y = jnp.maximum(y, 0.0)
    y, s = _conv_bn(p["conv3"], y, train=train, compute_dtype=compute_dtype)
    if train:
        u["conv3"] = s
    if "down" in p:
        sc, s = _conv_bn(p["down"], x, stride=stride, train=train,
                         compute_dtype=compute_dtype)
        if train:
            u["down"] = s
    else:
        sc = x
    return jnp.maximum(y + sc, 0.0), (u if train else None)


def apply(params: Params, x: jnp.ndarray, *, depth: int = 50,
          train: bool = False, compute_dtype=None,
          scan_blocks: bool | None = None):
    """NHWC float batch → (C3, C4, C5), plus BN-update tree.

    `scan_blocks`: None (auto: scan on TPU — see darknet._use_scan for
    the measured CPU regression) / True / False.
    """
    from mydetection_tpu.models.darknet import _use_scan
    updates: Params = {}
    y, s = _conv_bn(params["stem"], x, stride=2, train=train,
                    compute_dtype=compute_dtype)
    if train:
        updates["stem"] = s
    y = jnp.maximum(y, 0.0)
    y = max_pool(y, 3, 2)  # torch MaxPool2d(3, 2, padding=1): symmetric -inf pad

    feats = []
    for si, nblocks in enumerate(STAGE_BLOCKS[depth]):
        stage = params[f"stage{si}"]
        su: Params = {}
        # block 0 carries the projection shortcut + stage stride and is
        # structurally unique — unrolled; blocks 1..n-1 are identical
        # (c_out→c_out, stride 1) so their params (still `block1..N` in
        # the tree — torchvision-import layout unchanged) are STACKED
        # and run under one lax.scan: the bottleneck body compiles once
        # per stage instead of once per block (ResNet-101's 23-block
        # stage3 compiles the same graph as ResNet-50's 6-block one).
        y, s = _bottleneck(stage["block0"], y,
                           stride=2 if si > 0 else 1,
                           train=train, compute_dtype=compute_dtype)
        if train:
            su["block0"] = s
        if nblocks > 1 and _use_scan(scan_blocks):
            blocks = [stage[f"block{bi}"] for bi in range(1, nblocks)]
            stacked = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *blocks)

            def body(carry, p):
                out, stats = _bottleneck(p, carry, stride=1, train=train,
                                         compute_dtype=compute_dtype)
                return out, stats

            y, stats_stacked = jax.lax.scan(body, y, stacked)
            if train:
                for bi in range(1, nblocks):
                    su[f"block{bi}"] = jax.tree_util.tree_map(
                        lambda s, i=bi - 1: s[i], stats_stacked)
        else:
            for bi in range(1, nblocks):
                y, s = _bottleneck(stage[f"block{bi}"], y, stride=1,
                                   train=train, compute_dtype=compute_dtype)
                if train:
                    su[f"block{bi}"] = s
        if train:
            updates[f"stage{si}"] = su
        if si >= 1:  # stages 1/2/3 emit C3/C4/C5
            feats.append(y)
    return tuple(feats), (updates if train else None)
