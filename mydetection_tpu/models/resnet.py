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
    IMAGENET_MEAN,
    IMAGENET_STD,
    KeyGen,
    Params,
    batch_norm,
    bn_init,
    conv2d,
    conv_init,
    max_pool,
    normalize_input,
    standardize_imagenet,
)

STAGE_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}
STAGE_CHANNELS = (256, 512, 1024, 2048)  # bottleneck output channels


# ---------------------------------------------------------------------------
# space-to-depth stem (TPU fast path; exact rewrite — see darknet.py)
# ---------------------------------------------------------------------------
#
# Profiled on v5e at batch 32/608²: the 7×7-stride-2 stem (3→64) runs
# at ~2% MFU (4.4 ms) — C=3 input and C=64 output pad the 128-lane
# units. Same cure as the darknet stem: fold a 2×2 space-to-depth into
# the weights. The stem becomes ONE 9×9-stride-4 conv on the original
# layout whose 256 output channels are the four phases of the
# 64-channel activation; the 3×3-stride-2 maxpool then reduces over 9
# (cell, phase) channel-sliced taps and exits the S2D domain. Exact
# (inference BN); pinned against the standard path in tests.

def _phase_fold_stem7_weight(w: jnp.ndarray) -> jnp.ndarray:
    """7×7 stride-2 conv (7,7,Cin,Cout), pad 3 → 9×9 stride-4 conv
    (9,9,Cin,4Cout), pad (3,2): output phase pi's pixel (2K+pi) reads
    input rows 4K+2pi+di-3, di∈0..6 → window position 2pi+di ∈ 0..8."""
    cin, cout = w.shape[2], w.shape[3]
    k = jnp.zeros((9, 9, cin, 4 * cout), w.dtype)
    for pi in range(2):
        for pj in range(2):
            k = k.at[2 * pi:2 * pi + 7, 2 * pj:2 * pj + 7, :,
                     (pi * 2 + pj) * cout:(pi * 2 + pj + 1) * cout].set(w)
    return k


def _maxpool_s2d_exit(y: jnp.ndarray, base_c: int) -> jnp.ndarray:
    """3×3-stride-2 maxpool (pad 1, torch convention) applied to an
    S2D-domain input, emitting the ORIGINAL-domain half-res output.

    Output (i, j) maxes original rows 2i-1..2i+1 = S2D (cell, phase)
    taps (i-1, 1), (i, 0), (i, 1) per axis → 9 channel-sliced shifted
    views reduced elementwise."""
    b, h, w, _ = y.shape
    neg = jnp.asarray(-jnp.inf, y.dtype)
    yp = jnp.pad(y, ((0, 0), (1, 0), (1, 0), (0, 0)), constant_values=neg)
    taps = []
    for ai, qi in ((-1, 1), (0, 0), (0, 1)):
        for aj, qj in ((-1, 1), (0, 0), (0, 1)):
            taps.append(yp[:, 1 + ai:1 + ai + h, 1 + aj:1 + aj + w,
                           (qi * 2 + qj) * base_c:(qi * 2 + qj + 1) * base_c])
    out = taps[0]
    for t in taps[1:]:
        out = jnp.maximum(out, t)
    return out


def _stem_s2d(stem: Params, x: jnp.ndarray, *, compute_dtype) -> jnp.ndarray:
    """7×7-s2 conv + BN + ReLU + 3×3-s2 maxpool, S2D-fused. Returns the
    original-domain (B, H/4, W/4, 64) post-pool activation."""
    from mydetection_tpu.models.darknet import _tile_bn

    w9 = _phase_fold_stem7_weight(stem["conv"]["w"])
    y = conv2d(x, w9, stride=4, padding=[(3, 2), (3, 2)],
               compute_dtype=compute_dtype)
    y, _ = batch_norm(y, _tile_bn(stem["bn"]), train=False)
    y = jnp.maximum(y, 0.0)
    return _maxpool_s2d_exit(y, stem["conv"]["w"].shape[-1])


def _stem_s2d_standardize_folded(stem: Params, x_raw: jnp.ndarray, *,
                                 compute_dtype) -> jnp.ndarray:
    """S2D stem with the `/255` + ImageNet standardize folded in: ONE
    9×9-stride-4 phase-folded conv on the RAW uint8-cast batch + BN +
    ReLU + channel-sliced maxpool exit. Combines `_stem_s2d` (the
    (H/2, W/2, 64) intermediate never round-trips HBM before the pool)
    with `_stem_standardize_folded` (no C=3-minor elementwise pass).

    Exact, including borders, by the same argument as the 7×7 fold:
    XLA zero-pads the RAW input where the standard path zero-pads the
    STANDARDIZED tensor, and the difference is a per-tap constant. For
    pad (3, 2) / stride 4 / H,W divisible by 4, only the FIRST output
    row/col (window positions 0..2 out of bounds) and the LAST
    (positions 7..8 out of bounds) need closed-form corrections.
    Pinned exact in tests/test_retinanet.py.

    NEGATIVE RESULT (v5e, benchmarks/resnet_stem_s2d_experiments):
    6.43 ms/batch-32 @608 vs 4.47 ms for the shipped folded 7×7 stem —
    the 9×9-s4 conv from a 3-channel input runs even colder on the MXU
    than the 7×7 it replaces, and avoiding the (304,304,64) HBM
    round-trip doesn't make that back. Not wired into apply(); kept as
    a pinned exact rewrite for future hardware where the fold wins.
    """
    from mydetection_tpu.models.darknet import _tile_bn

    w9 = _phase_fold_stem7_weight(stem["conv"]["w"])        # (9,9,3,4C)
    std = jnp.asarray(IMAGENET_STD, w9.dtype)
    inv = jnp.asarray(IMAGENET_MEAN, w9.dtype) / std        # μ/σ (3,)
    wf = w9 / (255.0 * std[:, None])
    tap = jnp.einsum("hwic,i->hwc", w9, inv)                # (9,9,4C)
    y = conv2d(x_raw, wf, stride=4, padding=[(3, 2), (3, 2)],
               compute_dtype=compute_dtype)
    # conv_std = conv_raw − Σ_all tap + Σ_OOB tap
    y = y - jnp.sum(tap, axis=(0, 1)).astype(y.dtype)
    edges = {0: (0, 3), -1: (7, 9)}  # output index → OOB window positions
    for i, (ra, rb) in edges.items():
        y = y.at[:, i, :, :].add(
            jnp.sum(tap[ra:rb], axis=(0, 1)).astype(y.dtype))
    for j, (ca, cb) in edges.items():
        y = y.at[:, :, j, :].add(
            jnp.sum(tap[:, ca:cb], axis=(0, 1)).astype(y.dtype))
    # corners were double-counted by the row and col strips
    for i, (ra, rb) in edges.items():
        for j, (ca, cb) in edges.items():
            y = y.at[:, i, j, :].add(
                -jnp.sum(tap[ra:rb, ca:cb], axis=(0, 1)).astype(y.dtype))
    y, _ = batch_norm(y, _tile_bn(stem["bn"]), train=False)
    y = jnp.maximum(y, 0.0)
    return _maxpool_s2d_exit(y, stem["conv"]["w"].shape[-1])


def prepare_input(x: jnp.ndarray, *, compute_dtype,
                  train: bool = False) -> tuple[jnp.ndarray, bool]:
    """THE ResNet-family input policy — one definition shared by the
    float builders (registry retinanet/fcos forward_raw) and the int8
    prologue (quant_resnet._prologue), so the 'calibration and serving
    see identical activations' invariant cannot silently drift.

    Decides whether /255 + ImageNet standardize FOLD into the stem
    conv (uint8 inference on TPU — kills the C=3-minor elementwise
    passes; see _stem_standardize_folded) or run as elementwise
    passes. Returns (x_prepared, fold): when fold, x_prepared is the
    RAW 0..255 batch cast to compute dtype, for consumption by
    apply(..., stem_fold_std=True) / the quantized prologue."""
    dt = compute_dtype if compute_dtype is not None else jnp.float32
    fold = (x.dtype == jnp.uint8 and not train
            and jax.default_backend() == "tpu")
    if fold:
        return x.astype(dt), True
    if x.dtype == jnp.uint8:
        return standardize_imagenet(normalize_input(x, dt)), False
    return standardize_imagenet(x.astype(dt)), False


def _stem_standardize_folded(stem: Params, x_raw: jnp.ndarray, *,
                             compute_dtype) -> jnp.ndarray:
    """7×7-s2 stem conv with the `/255` normalize AND the ImageNet
    mean/std standardize folded into the conv weights — the input is
    the RAW uint8-cast batch (values 0..255), so no C=3-minor
    elementwise pass ever materializes (measured: 5.60 → 4.40 ms per
    batch-32 @608 on v5e for normalize+stem+pool).

    Exact, including borders: XLA zero-pads the RAW input, but the
    standard path zero-pads the STANDARDIZED tensor (i.e. raw value
    255·mean). The difference is a per-tap constant, so the affected
    output rows/cols (0, 1, last — pad 3, stride 2) get a closed-form
    correction added before BN. Pinned against the standard path in
    tests/test_models.py.

    y = conv(x_raw, w/(255σ)) − Σ_taps w·(μ/σ)  [+ border corrections]
    """
    w = stem["conv"]["w"]                                   # (7,7,3,64)
    inv = (jnp.asarray(IMAGENET_MEAN, w.dtype)
           / jnp.asarray(IMAGENET_STD, w.dtype))            # μ/σ (3,)
    wf = w / (255.0 * jnp.asarray(IMAGENET_STD, w.dtype)[:, None])
    tap = jnp.einsum("hwic,i->hwc", w, inv)                 # (7,7,C)
    b0 = -jnp.sum(tap, axis=(0, 1))                         # (C,)
    y = conv2d(x_raw, wf, stride=2, compute_dtype=compute_dtype)
    y = y + b0.astype(y.dtype)
    # border corrections: +Σ_{OOB taps} w·μ/σ. For pad 3 / stride 2 /
    # even H, the out-of-bounds tap rows are: row 0 → di∈{0,1,2},
    # row 1 → di∈{0}, last row → di∈{5,6} (cols identical).
    r0 = jnp.sum(tap[0:3], axis=(0, 1)).astype(y.dtype)
    r1 = jnp.sum(tap[0:1], axis=(0, 1)).astype(y.dtype)
    rl = jnp.sum(tap[5:7], axis=(0, 1)).astype(y.dtype)
    c0 = jnp.sum(tap[:, 0:3], axis=(0, 1)).astype(y.dtype)
    c1 = jnp.sum(tap[:, 0:1], axis=(0, 1)).astype(y.dtype)
    cl = jnp.sum(tap[:, 5:7], axis=(0, 1)).astype(y.dtype)
    for i, r in ((0, r0), (1, r1), (-1, rl)):
        y = y.at[:, i, :, :].add(r)
    for j, c in ((0, c0), (1, c1), (-1, cl)):
        y = y.at[:, :, j, :].add(c)
    # corners were double-counted: both-OOB taps (row-set ∩ col-set)
    # were added once by the row strip and once by the col strip but
    # belong once — subtract the overlap term.
    rsets = {0: (0, 3), 1: (0, 1), -1: (5, 7)}
    for i, (ra, rb) in rsets.items():
        for j, (ca, cb) in rsets.items():
            both = jnp.sum(tap[ra:rb, ca:cb], axis=(0, 1)).astype(y.dtype)
            y = y.at[:, i, j, :].add(-both)
    y, _ = batch_norm(y, stem["bn"], train=False)
    y = jnp.maximum(y, 0.0)
    return max_pool(y, 3, 2)


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
          scan_blocks: bool | None = None, s2d_stem: bool | None = None,
          stem_fold_std: bool = False):
    """NHWC float batch → (C3, C4, C5), plus BN-update tree.

    `scan_blocks`: None (auto: scan on TPU, inference only — see
    darknet._use_scan for the measured CPU and train-backward
    regressions) / True / False.
    `s2d_stem`: True folds the stem+maxpool into the space-to-depth
    domain — an exact rewrite (tested), but measured SLOWER end-to-end
    on v5e (67 vs 59 ms/batch-32 @608: the 9×9-stride-4 phase-folded
    conv from a 3-channel input runs even colder than the 7×7 it
    replaces, unlike the darknet 4×4 case). Default/None = off; kept
    as an opt-in for future hardware where the tradeoff flips.
    `stem_fold_std`: x is the RAW uint8-cast batch (0..255) and the
    `/255` + ImageNet standardize are folded into the stem conv
    (exact incl. borders; inference fast path — see
    _stem_standardize_folded). Mutually exclusive with `s2d_stem`.
    """
    from mydetection_tpu.models.darknet import _use_scan
    updates: Params = {}
    if stem_fold_std:
        if train:
            raise ValueError("stem_fold_std is an inference-only fast "
                             "path (train updates BN batch stats)")
        y = _stem_standardize_folded(params["stem"], x,
                                     compute_dtype=compute_dtype)
    elif s2d_stem is True and not train \
            and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0:
        y = _stem_s2d(params["stem"], x, compute_dtype=compute_dtype)
    else:
        y, s = _conv_bn(params["stem"], x, stride=2, train=train,
                        compute_dtype=compute_dtype)
        if train:
            updates["stem"] = s
        y = jnp.maximum(y, 0.0)
        y = max_pool(y, 3, 2)  # torch MaxPool2d(3,2,padding=1): symmetric -inf pad

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
        if nblocks > 1 and _use_scan(scan_blocks, train):
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
