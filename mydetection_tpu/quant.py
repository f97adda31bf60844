"""Static-scale int8 inference quantization for the darknet families.

Reference parity: the reference has no quantized path — this is a
TPU-native OPT-IN serving mode (SURVEY.md §6 "the better the
performance, the better"). The v5e MXU runs int8 at ~1.5× its bf16
rate at darknet shapes (measured 237 TOP/s vs 153 TFLOP/s), but the
round-2 DYNAMIC quantization attempt lost end-to-end (875 vs
1174 img/s): per-layer abs-max reductions + unfused round/clip/cast
passes cost more than the MXU saved. This module is the static-scale
redesign that wins: with calibrated per-layer constants the whole
dequant→leaky→requant chain is elementwise and XLA fuses it into the
int8 conv's epilogue — measured 1.44× over bf16 on an 8-block residual
chain at stage-2 shape (52², C=256, batch 32; /tmp probe recorded in
README).

Scheme (standard post-training quantization):
  * BN folded into conv weights/bias (exact affine fold, inference
    stats) — `fold_cbl`.
  * Weights: per-output-channel symmetric int8 (`wscale` (Cout,)).
  * Activations: per-layer static AFFINE quantization (x ≈ s·xq + m0,
    default since round 5): calibration records the signed (min, max)
    range and the full range maps onto 256 levels. Leaky/ReLU
    activations are heavily one-sided, so the old symmetric scheme
    wasted most of the negative half — the mode sweep measured asym
    +0.08…+0.19 AP over sym on every family
    (benchmarks/int8_modes.json). `act_scheme="sym"` keeps the
    symmetric scheme for A/B.
  * int8 conv accumulates int32 on the MXU; the epilogue dequantizes
    (in_scale·wscale), adds the zero-point correction
    (m0·wscale·wsum — a per-out-channel CONSTANT, because the conv
    input is border-padded with the zero-point so every tap has a
    defined affine value), adds the folded bias, applies
    LeakyReLU(0.1), and requantizes with the next static scale.
  * Residual adds and channel concats happen in the dequantized f32
    domain (still elementwise/fused), then requantize.

What stays float: the early-stage prologue (stem → stage0 →
stage1.down, incl. the space-to-depth chain on TPU — those layers are
MXU-*packing* bound at C≤64, int8 doesn't help), the head output
1×1 convs (accuracy-critical, tiny share of time), and the decode/NMS.

The quantized region covers darknet stages 1–4 plus the whole YOLOv3
neck (block5/4/3, laterals, head conv towers) — ~80 % of the bf16
device time. Both darknet families (`yolov3`, `rapid`) share the
structure, so one walker serves both; entry point is
`Detector(..., quantized=True)` (api.py) or `quantize_model` +
`forward_dense` here.

Accuracy — MEASURED, not assumed (benchmarks/knob_accuracy.py:
overfit-trained synthetic models, the available offline proxy and a
PTQ worst case — saturated activations, extreme weight ranges): with
real-image abs-max calibration (the default) int8 cost +0.004 (rapid)
to −0.345 AP (retinanet) on that proxy — worst on the deep-quantized
BN-fold families (yolov3 −0.212, retinanet −0.345), near-neutral on
rapid (+0.004); noise calibration measured far
worse (up to total collapse on rapid) — calibrate on real images at
the serving size. Percentile clipping (the textbook outlier fix)
also measured WORSE than abs-max here — see CALIB_PERCENTILE. All
numbers live in benchmarks/knob_accuracy.json and the README table.
The float path remains the default; tests pin the quantized pipeline
to the float one within quantization-error tolerances
(tests/test_quant.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from mydetection_tpu.models import darknet, yolov3
from mydetection_tpu.models.layers import (
    BN_EPS,
    Params,
    conv2d,
    conv_bn_leaky,
    leaky_relu,
    normalize_input,
    upsample2x,
)

QUANT_FAMILIES = ("yolov3", "rapid")
_STAGE_BLOCKS = darknet.STAGE_BLOCKS  # (1, 2, 8, 8, 4); stage0 in prologue


# ---------------------------------------------------------------------------
# folding + weight quantization
# ---------------------------------------------------------------------------

def fold_cbl(p: Params) -> Params:
    """conv+BN (inference) → {'wf' (HWIO), 'bias' (Cout,)} float32.

    Exact: BN(conv(x,w)) = conv(x, w·s) + (β − μ·s), s = γ·rsqrt(σ²+ε)
    (conv is linear per output channel).
    """
    w = p["conv"]["w"]
    bn = p["bn"]
    s = bn["scale"] * jax.lax.rsqrt(bn["var"] + BN_EPS)
    return {"wf": w * s[None, None, None, :], "bias": bn["bias"] - bn["mean"] * s}


def quantize_weight(wf: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric int8: returns (wq int8, wscale f32)."""
    ws = jnp.max(jnp.abs(wf), axis=(0, 1, 2)) / 127.0 + 1e-12
    wq = jnp.clip(jnp.round(wf / ws), -127, 127).astype(jnp.int8)
    return wq, ws.astype(jnp.float32)


def _conv_i8(x: jnp.ndarray, w: jnp.ndarray, *, stride: int = 1,
             pad_val=None) -> jnp.ndarray:
    """int8 NHWC × HWIO conv → int32, symmetric (k-1)//2 padding (the
    same convention as layers.conv2d — stride-2 parity matters).

    pad_val: border fill in the int8 domain. For affine activations
    (x = s·xq + m0) the float-conv's zero padding corresponds to
    xq = −m0/s, NOT 0 — padding with that zero-point keeps the
    per-output-channel dequant correction (m0·wscale·wsum, folded
    into the epilogue) exact at the borders. None = plain zero pad
    (symmetric scheme, m0 = 0)."""
    ph, pw = (w.shape[0] - 1) // 2, (w.shape[1] - 1) // 2
    if pad_val is not None and (ph or pw):
        x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)),
                    constant_values=pad_val)
        padding = [(0, 0), (0, 0)]
    else:
        padding = [(ph, ph), (pw, pw)]
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def _quant(y: jnp.ndarray, sm) -> jnp.ndarray:
    """Float → int8 under the affine map x ≈ s·xq + m0.

    sm: (2,) [scale, m0] (sym is the m0 = 0 special case). The int8
    grid is the full −128..127; m0 = lo + 128·s centers the
    calibrated [lo, hi] range onto it."""
    s, m0 = sm[..., 0], sm[..., 1]
    return jnp.clip(jnp.round((y - m0) / s), -128, 127).astype(jnp.int8)


def _zero_point(sm) -> jnp.ndarray:
    """int8 value representing float zero under sm (the pad value)."""
    s, m0 = sm[..., 0], sm[..., 1]
    return jnp.clip(jnp.round(-m0 / s), -128, 127).astype(jnp.int8)


def _sm_of(lo, hi, scheme: str) -> np.ndarray:
    """Calibrated (lo, hi) → [scale, m0] under the scheme.

    asym (default since round 5): the full signed range maps onto 256
    levels — measured +0.08…+0.19 AP over sym on every family
    (benchmarks/int8_modes.json): leaky/ReLU activations are heavily
    one-sided, so symmetric int8 wastes most of its negative half.
    sym: the historical symmetric scheme (abs-max / 127, m0 = 0)."""
    lo, hi = float(lo), float(hi)
    if scheme == "asym":
        s = (hi - lo) / 255.0 + 1e-12
        return np.asarray([s, lo + 128.0 * s], np.float32)
    if scheme == "sym":
        return np.asarray([max(abs(lo), abs(hi)) / 127.0 + 1e-12, 0.0],
                          np.float32)
    raise ValueError(f"act_scheme must be 'asym' or 'sym', got {scheme!r}")


# ---------------------------------------------------------------------------
# the shared structure walk (calibration backend / int8 backend)
#
# Both backends walk the SAME region code (`_region`) so the set of
# recorded scales and the set of consumed scales cannot diverge. An
# activation is represented as:
#   calib:  a float tensor (folded-float chain; maxima recorded)
#   quant:  (xq int8 tensor, scale f32 scalar)
# ---------------------------------------------------------------------------


# Activation-scale calibration statistic: the q-th percentile of |y|
# (100 = plain abs-max, the DEFAULT). Percentile clipping is the
# textbook outlier fix, but it MEASURED WORSE here: on overfit-trained
# synthetic models (benchmarks/knob_accuracy.py) yolov3 int8 lost 0.21
# AP with abs-max vs 0.68 AP at the 99.9th percentile — with saturated
# detector activations the top 0.1% are the OBJECT EVIDENCE (peak
# objectness/class activations), not noise, and clipping them at 127
# destroys exactly the scores that rank detections. Models with true
# activation outliers can opt in per call:
# quantize_model(..., percentile=99.9).
CALIB_PERCENTILE = 100.0


class _CalibBE:
    """Folded-float forward that records post-activation ranges.

    Records the signed (min, max) per requant key — the affine
    ("asym") scheme maps that full range onto 256 levels; the "sym"
    scheme derives abs-max from it (see `_sm_of`)."""

    def __init__(self, compute_dtype, percentile: float = CALIB_PERCENTILE):
        self.dt = compute_dtype
        self.percentile = float(percentile)
        self.stats: dict[str, jnp.ndarray] = {}

    def _rec(self, key: str, y):
        """Record the key's statistic; returns the (possibly
        transformed) activation so _FakeQuantBE can override this one
        hook to inject simulated quantization at every requant point."""
        yf = y.astype(jnp.float32).ravel()
        if self.percentile >= 100.0:
            self.stats[key] = jnp.stack([jnp.min(yf), jnp.max(yf)])
        else:
            # strided subsample caps the sort at ~1M elements — the
            # tail percentile estimate is stable far below that
            stride = max(1, yf.size // (1 << 20))
            sub = yf[::stride]
            self.stats[key] = jnp.stack([
                jnp.percentile(sub, 100.0 - self.percentile),
                jnp.percentile(sub, self.percentile)])
        return y


    def entry(self, key, y):
        return self._rec(key, y)

    def cbl(self, key, f: Params, x, *, stride: int = 1):
        y = conv2d(x, f["wf"], stride=stride, compute_dtype=self.dt)
        y = leaky_relu(y + f["bias"].astype(y.dtype))
        return self._rec(key, y)

    def cbl_out(self, key, f: Params, x, *, stride: int = 1):
        """Head-conv variant: its only consumer is the FLOAT `out`
        conv, so the activation is NOT requantized (and no scale is
        recorded). The round-5 sensitivity sweep measured the
        head4/conv requant ALONE costing 0.097 AP on the trained
        yolov3 proxy for zero speed benefit — the quantized value was
        dequantized immediately by `out` (int8_sensitivity.json
        per_key_dAP; VERDICT r4 next #1)."""
        y = conv2d(x, f["wf"], stride=stride, compute_dtype=self.dt)
        return leaky_relu(y + f["bias"].astype(y.dtype))

    def res_block(self, key, f: Params, x):
        r = self.cbl(key + "/c1", f["c1"], x)
        y = conv2d(r, f["c2"]["wf"], compute_dtype=self.dt)
        y = leaky_relu(y + f["c2"]["bias"].astype(y.dtype))
        y = x + y
        return self._rec(key + "/add", y)

    def res_stage(self, key, f: Params, x, nblocks: int):
        for bi in range(nblocks):
            x = self.res_block(f"{key}/res{bi}", f[f"res{bi}"], x)
        return x

    def up(self, x):
        return upsample2x(x)

    def concat(self, key, a, b):
        y = jnp.concatenate([a, b], axis=-1)
        return self._rec(key, y)

    def out(self, p: Params, x):
        y = conv2d(x, p["w"], compute_dtype=self.dt)
        return y + p["b"].astype(y.dtype)


def _fq(y, s):
    """Simulated int8 requantization: dequant(quant(y, s)), f32."""
    return jnp.clip(jnp.round(y.astype(jnp.float32) / s), -127, 127) * s


class _FakeQuantBE(_CalibBE):
    """Float-domain walk with per-key SIMULATED activation quantization
    (dequant∘quant at every requant point), each key gated by a traced
    0/1 scalar — so ONE compiled graph serves every on/off pattern and
    a per-layer sensitivity sweep costs one compile total
    (benchmarks/int8_sensitivity.py; VERDICT r4 next #1).

    Fidelity vs the real int8 path (`_QuantBE`): the real path's
    int8×int8→int32 conv computes exactly conv(quant(x)·s, quant(w)·ws)
    up to f32 epilogue rounding; simulating it as a float conv over
    fake-quantized operands reproduces it to f32 accumulation error
    (~1e-7 relative; pinned by tests/test_quant.py). Weight
    quantization is simulated separately by blending the folded tree —
    see `blend_weight_tree`."""

    def __init__(self, compute_dtype, scales: dict, gates: dict):
        super().__init__(compute_dtype)
        self.scales = scales  # flat key → f32 scale (abs-max/127)
        self.gates = gates    # flat key → traced scalar (1 = quantize)

    def _rec(self, key: str, y):
        g = self.gates[key]
        return jnp.where(g > 0.5,
                         _fq(y, self.scales[key]).astype(y.dtype), y)


def blend_weight_tree(ft: Params, gate_of) -> Params:
    """Folded-float tree → same tree with each conv leaf's 'wf'
    replaced by where(gate, dequant(per-channel int8 wf), wf).

    gate_of: leaf path string (e.g. 'stage2/res0/c1') → traced 0/1
    scalar. Leaves without 'wf' (head 'out' convs {'w','b'}, GN params)
    pass through — they stay float in the real int8 path too."""

    def walk(node, path):
        if isinstance(node, dict) and "wf" in node:
            wq, ws = quantize_weight(node["wf"])
            wfq = (wq.astype(jnp.float32) * ws).astype(node["wf"].dtype)
            g = gate_of(path)
            return {**node, "wf": jnp.where(g > 0.5, wfq, node["wf"])}
        if isinstance(node, dict):
            return {k: walk(v, f"{path}/{k}" if path else k)
                    for k, v in node.items()}
        return node

    return walk(ft, "")


class _QuantBE:
    """int8 forward; activations are (xq int8, sm (2,) [scale, m0]).

    Affine dequant x = s·xq + m0: the conv epilogue gains one
    per-output-channel constant term m0·wscale·wsum (wsum = Σ wq over
    taps×in-channels, stored at quantize time) and the conv input is
    border-padded with the zero-point — both fold into the existing
    fused epilogue / a cheap int8 pad; sym (m0 = 0, pad 0) is the
    degenerate case of the same code."""

    def __init__(self, scales: dict, compute_dtype,
                 scan_blocks: bool | None = None):
        self.s = scales
        self.dt = compute_dtype
        self.scan = scan_blocks

    def entry(self, key, y):
        sm = self.s[key]
        return _quant(y.astype(jnp.float32), sm), sm

    def _deq_conv(self, q: Params, xr, *, stride: int = 1):
        xq, sm = xr
        s, m0 = sm[..., 0], sm[..., 1]
        acc = _conv_i8(xq, q["wq"], stride=stride, pad_val=_zero_point(sm))
        return leaky_relu(acc.astype(jnp.float32) * (s * q["wscale"])
                          + m0 * q["wscale"] * q["wsum"] + q["bias"])

    def cbl(self, key, q: Params, xr, *, stride: int = 1):
        y = self._deq_conv(q, xr, stride=stride)
        sm = self.s[key]
        return _quant(y, sm), sm

    def cbl_out(self, key, q: Params, xr, *, stride: int = 1):
        # float output, no requant: the consumer is the float `out`
        # conv (see _CalibBE.cbl_out — measured 0.097 AP for free)
        return self._deq_conv(q, xr, stride=stride)

    def _res_block_body(self, q: Params, xr, out_scales):
        """out_scales: (2, 2) rows [conv1_out, post_add] of [s, m0]."""
        xq, sm = xr
        rsm = out_scales[0]
        rq = _quant(self._deq_conv(q["c1"], xr), rsm)
        acc = _conv_i8(rq, q["c2"]["wq"], pad_val=_zero_point(rsm))
        y = leaky_relu(acc.astype(jnp.float32)
                       * (rsm[0] * q["c2"]["wscale"])
                       + rsm[1] * q["c2"]["wscale"] * q["c2"]["wsum"]
                       + q["c2"]["bias"])
        y = y + (xq.astype(jnp.float32) * sm[..., 0] + sm[..., 1])
        return _quant(y, out_scales[1]), out_scales[1]

    def res_stage(self, key, q: Params, xr, nblocks: int):
        scales = self.s[key + "/res"]  # (n, 2, 2)
        if nblocks == 1 or not darknet._use_scan(self.scan):
            for bi in range(nblocks):
                blk = jax.tree_util.tree_map(lambda l, bi=bi: l[bi],
                                             q["res_stacked"])
                xr = self._res_block_body(blk, xr, scales[bi])
            return xr

        def body(carry, per):
            blk, sc = per
            return self._res_block_body(blk, carry, sc), None

        xr, _ = jax.lax.scan(body, xr, (q["res_stacked"], scales))
        return xr

    def up(self, xr):
        xq, sm = xr
        return upsample2x(xq), sm

    def concat(self, key, ar, br):
        aq, asm = ar
        bq, bsm = br
        y = jnp.concatenate(
            [aq.astype(jnp.float32) * asm[..., 0] + asm[..., 1],
             bq.astype(jnp.float32) * bsm[..., 0] + bsm[..., 1]], axis=-1)
        sm = self.s[key]
        return _quant(y, sm), sm

    def out(self, p: Params, xr):
        if isinstance(xr, tuple):
            xq, sm = xr
            x = (xq.astype(jnp.float32) * sm[..., 0]
                 + sm[..., 1]).astype(self.dt)
        else:  # float activation from cbl_out
            x = xr.astype(self.dt)
        y = conv2d(x, p["w"], compute_dtype=self.dt)
        return y + p["b"].astype(y.dtype)


def _region(be, bt: Params, ht: Params, y):
    """Darknet stages 1–4 + the full YOLOv3 neck/heads, over either
    backend. `bt`/`ht` are the backend's backbone/head trees; `y` is
    the float stage1.down activation (prologue output).

    Mirrors darknet.apply (stages) + yolov3.apply (neck) exactly —
    structure changes there must be reflected here (pinned by
    tests/test_quant.py equivalence tests).
    """
    x = be.entry("entry", y)
    feats = []
    for si in (1, 2, 3, 4):
        st = bt[f"stage{si}"]
        if si > 1:
            x = be.cbl(f"stage{si}/down", st["down"], x, stride=2)
        x = be.res_stage(f"stage{si}", st, x, _STAGE_BLOCKS[si])
        if si >= 2:
            feats.append(x)
    c3, c4, c5 = feats

    def conv5(key, p, x):
        for name in ("c0", "c1", "c2", "c3", "c4"):
            x = be.cbl(f"{key}/{name}", p[name], x)
        return x

    x5 = conv5("block5", ht["block5"], c5)
    h5 = be.cbl_out("head5/conv", ht["head5"]["conv"], x5)
    out5 = be.out(ht["head5"]["out"], h5)

    lat = be.cbl("lateral4", ht["lateral4"], x5)
    x4 = be.concat("cat4", be.up(lat), c4)
    x4 = conv5("block4", ht["block4"], x4)
    h4 = be.cbl_out("head4/conv", ht["head4"]["conv"], x4)
    out4 = be.out(ht["head4"]["out"], h4)

    lat = be.cbl("lateral3", ht["lateral3"], x4)
    x3 = be.concat("cat3", be.up(lat), c3)
    x3 = conv5("block3", ht["block3"], x3)
    h3 = be.cbl_out("head3/conv", ht["head3"]["conv"], x3)
    out3 = be.out(ht["head3"]["out"], h3)
    return [out5, out4, out3]


# ---------------------------------------------------------------------------
# prologue (always float — the early stages are MXU-packing bound)
# ---------------------------------------------------------------------------

def _prologue(backbone: Params, images, compute_dtype) -> jnp.ndarray:
    """uint8/float batch → stage1.down activation (B, H/4, W/4, 128).

    Uses the same space-to-depth policy as darknet.apply (exact
    rewrite), so calibration and serving see identical activations.
    """
    x = images
    if x.dtype == jnp.uint8:
        x = normalize_input(x, compute_dtype or jnp.float32)
    elif compute_dtype is not None:
        x = x.astype(compute_dtype)
    if x.shape[-1] == 12:  # host-packed S2D-2 input (image_ops.pack_s2d2)
        return darknet._early_s2d(backbone, x, compute_dtype=compute_dtype,
                                  packed=True)
    if darknet._use_s2d(None, False, x):
        return darknet._early_s2d(backbone, x, compute_dtype=compute_dtype)
    y, _ = conv_bn_leaky(backbone["stem"], x, compute_dtype=compute_dtype)
    s0 = backbone["stage0"]
    y, _ = conv_bn_leaky(s0["down"], y, stride=2, compute_dtype=compute_dtype)
    y, _ = darknet._res_block(s0["res0"], y, train=False,
                              compute_dtype=compute_dtype)
    y, _ = conv_bn_leaky(backbone["stage1"]["down"], y, stride=2,
                         compute_dtype=compute_dtype)
    return y


# ---------------------------------------------------------------------------
# tree preparation
# ---------------------------------------------------------------------------

def _fold_region(params: Params) -> tuple[Params, Params]:
    """Fold BN for every quant-region block. Returns (backbone_f, head_f)
    trees whose leaves are {'wf','bias'} (head 'out' convs pass through
    as {'w','b'})."""
    bb, hd = params["backbone"], params["head"]
    bt: Params = {}
    for si in (1, 2, 3, 4):
        st = bb[f"stage{si}"]
        fst: Params = {} if si == 1 else {"down": fold_cbl(st["down"])}
        for bi in range(_STAGE_BLOCKS[si]):
            fst[f"res{bi}"] = {"c1": fold_cbl(st[f"res{bi}"]["conv1"]),
                               "c2": fold_cbl(st[f"res{bi}"]["conv2"])}
        bt[f"stage{si}"] = fst
    ht: Params = {}
    for key in ("block5", "block4", "block3"):
        ht[key] = {name: fold_cbl(hd[key][name])
                   for name in ("c0", "c1", "c2", "c3", "c4")}
    for key in ("lateral4", "lateral3"):
        ht[key] = fold_cbl(hd[key])
    for key in ("head5", "head4", "head3"):
        ht[key] = {"conv": fold_cbl(hd[key]["conv"]), "out": hd[key]["out"]}
    return bt, ht


def _quantize_folded(bt: Params, ht: Params) -> tuple[Params, Params]:
    """Folded-float trees → int8 trees; res blocks stacked per stage for
    lax.scan (leaf 'res_stacked')."""

    def qleaf(f: Params) -> Params:
        wq, ws = quantize_weight(f["wf"])
        # wsum = Σ wq over taps × in-channels, per out channel: the
        # affine dequant's constant term m0·wscale·wsum (exact in f32:
        # |wsum| ≤ 9·1024·127 < 2^24)
        return {"wq": wq, "wscale": ws,
                "wsum": jnp.sum(wq.astype(jnp.float32), axis=(0, 1, 2)),
                "bias": f["bias"].astype(jnp.float32)}

    qb: Params = {}
    for si in (1, 2, 3, 4):
        st = bt[f"stage{si}"]
        qst: Params = {} if si == 1 else {"down": qleaf(st["down"])}
        blocks = [{"c1": qleaf(st[f"res{bi}"]["c1"]),
                   "c2": qleaf(st[f"res{bi}"]["c2"])}
                  for bi in range(_STAGE_BLOCKS[si])]
        qst["res_stacked"] = jax.tree_util.tree_map(
            lambda *ls: jnp.stack(ls), *blocks)
        qb[f"stage{si}"] = qst
    qh: Params = {}
    for key in ("block5", "block4", "block3"):
        qh[key] = {name: qleaf(ht[key][name])
                   for name in ("c0", "c1", "c2", "c3", "c4")}
    for key in ("lateral4", "lateral3"):
        qh[key] = qleaf(ht[key])
    for key in ("head5", "head4", "head3"):
        qh[key] = {"conv": qleaf(ht[key]["conv"]), "out": ht[key]["out"]}
    return qb, qh


def _stack_scales(ranges: dict[str, tuple], scheme: str) -> dict[str, Any]:
    """Flat (lo, hi) dict → scales dict of (2,) [s, m0] pairs; res
    stages stacked to (n, 2, 2) [conv1_out, post_add] rows for the
    scan body."""
    scales: dict[str, Any] = {}
    for k, (lo, hi) in ranges.items():
        scales[k] = _sm_of(lo, hi, scheme)
    out: dict[str, Any] = {}
    for si in (1, 2, 3, 4):
        n = _STAGE_BLOCKS[si]
        arr = np.zeros((n, 2, 2), np.float32)
        for bi in range(n):
            arr[bi, 0] = scales.pop(f"stage{si}/res{bi}/c1")
            arr[bi, 1] = scales.pop(f"stage{si}/res{bi}/add")
        out[f"stage{si}/res"] = jnp.asarray(arr)
    for k, v in scales.items():
        out[k] = jnp.asarray(v)
    return out


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class QuantizedParams:
    """Everything the quantized forward needs (a pytree-of-arrays)."""

    backbone_float: Params  # original darknet params (prologue)
    qb: Params              # int8 stages 1-4
    qh: Params              # int8 neck/heads (+ float out convs)
    scales: dict[str, Any]


def calibrate(params: Params, batches: Iterable[np.ndarray], *,
              compute_dtype=None, _folded=None,
              percentile: float = CALIB_PERCENTILE) -> dict[str, tuple]:
    """Run the folded-float chain over calibration batches, return the
    per-layer signed (lo, hi) range dict. Batches: uint8/float NHWC at
    the serving input size (use REAL images for accuracy; noise
    calibration keeps the pipeline functional but costs mAP).
    `_folded`: pre-folded (bt, ht) trees from quantize_model, avoiding
    a second full fold."""
    bt, ht = _folded if _folded is not None else _fold_region(params)

    @jax.jit
    def one(x):
        be = _CalibBE(compute_dtype, percentile)
        y = _prologue(params["backbone"], x, compute_dtype)
        _region(be, bt, ht, y)
        return be.stats

    ranges: dict[str, tuple] = {}
    for b in batches:
        m = jax.device_get(one(jnp.asarray(b)))
        for k, v in m.items():
            lo, hi = float(v[0]), float(v[1])
            if k in ranges:
                lo, hi = min(lo, ranges[k][0]), max(hi, ranges[k][1])
            ranges[k] = (lo, hi)
    if not ranges:
        raise ValueError("calibrate() needs at least one batch")
    return ranges


def quantize_model(cfg, params: Params, calib_batches: Iterable[np.ndarray],
                   *, percentile: float = CALIB_PERCENTILE,
                   act_scheme: str = "asym"):
    """Fold, calibrate, and quantize a model's params. Dispatches by
    family: darknet families here, ResNet-FPN families to
    quant_resnet.py. Returns the family's QuantizedParams pytree.

    act_scheme: activation quantization — "asym" (affine, the default
    since round 5: measured +0.08…+0.19 AP over "sym" on every family,
    benchmarks/int8_modes.json) or "sym" (the historical symmetric
    scheme, kept for A/B)."""
    if cfg.family not in QUANT_FAMILIES:
        from mydetection_tpu import quant_resnet
        if cfg.family in quant_resnet.RESNET_QUANT_FAMILIES:
            return quant_resnet.quantize_model(cfg, params, calib_batches,
                                               percentile=percentile,
                                               act_scheme=act_scheme)
        raise ValueError(
            f"int8 quantization supports families "
            f"{QUANT_FAMILIES + quant_resnet.RESNET_QUANT_FAMILIES}; "
            f"'{cfg.name}' has family '{cfg.family}'")
    bt, ht = _fold_region(params)
    ranges = calibrate(params, calib_batches, compute_dtype=cfg.compute_dtype,
                       _folded=(bt, ht), percentile=percentile)
    qb, qh = _quantize_folded(bt, ht)
    # prologue keeps ONLY what _prologue touches (stem, stage0,
    # stage1.down) — the float res blocks of stages 1-4 are ~90% of
    # darknet's params and would otherwise ride along in HBM, in every
    # save_quantized artifact, and in every data-parallel replica
    bb = params["backbone"]
    prologue = {"stem": bb["stem"], "stage0": bb["stage0"],
                "stage1": {"down": bb["stage1"]["down"]}}
    return QuantizedParams(backbone_float=prologue, qb=qb, qh=qh,
                           scales=_stack_scales(ranges, act_scheme))


def forward_raw(qp: QuantizedParams, images, *, compute_dtype=None) -> list:
    """Quantized inference → raw head outputs [P5, P4, P3] (float),
    drop-in for the float forward_raw (same decode downstream)."""
    y = _prologue(qp.backbone_float, images, compute_dtype)
    be = _QuantBE(qp.scales, compute_dtype)
    return _region(be, qp.qb, qp.qh, y)


def forward_dense_quantized(qp, images, cfg) -> dict:
    """Family-dispatched quantized forward → the dense dict the
    postprocess consumes (the int8 counterpart of Model.forward_dense;
    decode glue shared via registry.dense_from_raw)."""
    from mydetection_tpu.registry import dense_from_raw

    if isinstance(qp, QuantizedParams):
        raw = forward_raw(qp, images, compute_dtype=cfg.compute_dtype)
    else:
        from mydetection_tpu import quant_resnet
        raw = quant_resnet.forward_raw(qp, images, cfg=cfg)
    return dense_from_raw(raw, cfg, input_size=images.shape[1])


jax.tree_util.register_dataclass(
    QuantizedParams,
    data_fields=["backbone_float", "qb", "qh", "scales"],
    meta_fields=[])


# ---------------------------------------------------------------------------
# persistence — calibration costs real time (a full forward compile +
# pass over the calib set); serving processes load the finished
# artifact instead of recalibrating.
# ---------------------------------------------------------------------------

def save_quantized(path: str, qp, cfg=None) -> None:
    """Persist a QuantizedParams / QuantizedResnetParams as .npz
    (atomic, via checkpoint.save_checkpoint; int8 dtypes preserved).
    Pass the model's cfg to stamp structural identity (family /
    num_classes) so a mismatched load fails readably instead of with
    an opaque shape error deep in the graph."""
    from mydetection_tpu import checkpoint as ck
    from mydetection_tpu import quant_resnet

    if isinstance(qp, QuantizedParams):
        kind = "darknet"
    elif isinstance(qp, quant_resnet.QuantizedResnetParams):
        kind = "resnet"
    else:
        raise TypeError(f"not a quantized-params pytree: {type(qp)}")
    extra = {"quant_kind": kind}
    if cfg is not None:
        extra.update(family=cfg.family, num_classes=cfg.num_classes,
                     input_size=cfg.input_size)
    tree = {f: jax.device_get(getattr(qp, f))
            for f in (fd.name for fd in dataclasses.fields(qp))}
    # the scales dict's keys are '/'-joined paths; nest them explicitly
    # (the checkpoint layer rejects '/' in dict keys — relying on its
    # silent split corrupted structure when a key was both a leaf and
    # a prefix). The flat npz layout is unchanged, so old artifacts
    # load identically through _reflatten below.
    tree["scales"] = _nest(tree["scales"])
    ck.save_checkpoint(path, tree, extra=extra)


def _nest(flat: dict) -> dict:
    """'/'-joined flat dict → nested dict (inverse of _reflatten),
    loud on leaf/subtree key collisions."""
    out: dict = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = out
        for p in parts[:-1]:
            nxt = node.setdefault(p, {})
            if not isinstance(nxt, dict):
                raise ValueError(f"scale key {k!r} collides with the "
                                 f"leaf key {p!r}")
            node = nxt
        if isinstance(node.get(parts[-1]), dict):
            raise ValueError(f"scale key {k!r} collides with an "
                             "existing subtree of the same name")
        node[parts[-1]] = v
    return out


def _reflatten(d: dict, prefix: str = "") -> dict:
    """Nested dict → '/'-joined flat dict (inverse of `_nest`; the
    scales dict is stored nested in the checkpoint tree)."""
    out = {}
    for k, v in d.items():
        if isinstance(v, dict):
            out.update(_reflatten(v, prefix + k + "/"))
        else:
            out[prefix + k] = v
    return out


def load_quantized(path: str, cfg=None):
    """Load a save_quantized artifact → the family's QuantizedParams.
    With cfg given, checks the stamped structural identity first."""
    from mydetection_tpu import checkpoint as ck
    from mydetection_tpu import quant_resnet

    ckpt = ck.load_checkpoint(path)
    extra = ckpt["extra"]
    kind = str(extra.get("quant_kind", ""))
    tree = ckpt["params"]
    if not kind or tree is None:
        raise ValueError(f"{path} is not a quantized-params artifact "
                         "(missing quant_kind/params)")
    if cfg is not None and "family" in extra:
        saved = (str(extra["family"]), int(extra["num_classes"]))
        want = (cfg.family, cfg.num_classes)
        if saved != want:
            raise ValueError(
                f"quantized artifact {path} was saved for family="
                f"{saved[0]!r} num_classes={saved[1]}, but this Detector "
                f"is family={want[0]!r} num_classes={want[1]} — "
                "recalibrate with quantized=True")
        if "input_size" in extra \
                and int(extra["input_size"]) != cfg.input_size:
            import warnings

            warnings.warn(
                f"quantized artifact {path} was calibrated at input_size="
                f"{int(extra['input_size'])} but this Detector serves "
                f"{cfg.input_size}; static activation scales are "
                "size-sensitive — expect some accuracy cost, or "
                "recalibrate at the serving size", stacklevel=2)
    tree["scales"] = _reflatten(tree["scales"])

    def _upgrade(v):
        """Pre-round-5 artifacts stored symmetric SCALARS (plus (n, k)
        res/scan stacks); the affine forward consumes [s, m0] pairs.
        m0 = 0 reproduces the old symmetric dequant exactly (modulo
        the clip floor moving −127 → −128, which old scales never
        reach). Only called when the artifact-wide scalar probe below
        says the whole artifact is old-format."""
        v = jnp.asarray(v)
        if v.ndim == 0:
            return jnp.stack([v, jnp.zeros((), v.dtype)])
        if v.ndim == 2:
            return jnp.stack([v, jnp.zeros_like(v)], axis=-1)
        return v

    needs_upgrade = any(jnp.asarray(v).ndim == 0
                        for v in tree["scales"].values())
    if needs_upgrade:
        tree["scales"] = {k: _upgrade(v) for k, v in tree["scales"].items()}
    # the affine epilogue needs wsum per conv leaf; absent in old
    # artifacts — derive it from the stored int8 weights
    def _add_wsum(node):
        if isinstance(node, dict):
            if "wq" in node and "wsum" not in node:
                node = {**node, "wsum": jnp.sum(
                    node["wq"].astype(jnp.float32), axis=(0, 1, 2))}
                return node
            return {k: _add_wsum(v) for k, v in node.items()}
        return node

    for k in ("qb", "qh", "qf"):
        if k in tree and tree[k] is not None:
            tree[k] = _add_wsum(tree[k])
    if kind == "darknet":
        return QuantizedParams(**tree)
    if kind == "resnet":
        return quant_resnet.QuantizedResnetParams(**tree)
    raise ValueError(f"unknown quant_kind {kind!r} in {path}")
