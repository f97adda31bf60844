"""Static-scale int8 inference quantization for the ResNet-FPN families.

The sibling of `quant.py` (darknet families — see its docstring for the
scheme and the measured why-static-scales rationale). This module
covers `retinanet` / `retinanet_r101` / `fcos`: ResNet bottleneck
stages (BN folded exactly), the FPN, and the shared head conv towers
run int8 on the MXU; everything between an int8 conv's int32 output
and the next requantization is elementwise constants that XLA fuses
into the conv epilogue.

What stays float:
  * the prologue — normalize/standardize (+ optional stem fold),
    7x7 stem, maxpool (C in {3, 64}: MXU-packing bound, int8 can't
    help);
  * the head output convs (cls/box/ctr logits — accuracy-critical,
    tiny share of time);
  * FCOS GroupNorm — GN computes batch-dependent statistics, so it
    cannot fold into weights; it runs on the dequantized f32 tower
    activation between conv and requant (two extra fused elementwise
    passes per tower conv);
  * residual adds, FPN top-down sums and the decode/postprocess.

Design: a tiny value algebra shared by the calibration and int8
backends —
  toq(key, y_f32) -> handle   requantization point (calib: record
                              abs-max, pass through; quant: int8 cast)
  conv(leaf, handle)  -> f32  the conv + dequant + bias epilogue
  deq(handle)         -> f32
so `_region` (stages -> FPN -> towers) is written ONCE in float-domain
code and the two backends cannot diverge on which activations carry
scales. The head towers are weight-shared across pyramid levels but
get PER-LEVEL activation scales (the level statistics differ by an
order of magnitude).

Accuracy note: activations after ReLU are non-negative, which is why
the default activation scheme is AFFINE since round 5 (quant._sm_of
"asym") — the old symmetric scheme spent the sign bit on a half-range
that post-ReLU activations never use, and the mode sweep measured the
affine scheme recovering +0.09…+0.19 AP on these families
(benchmarks/int8_modes.json). Per-channel weights keep weight error
small. Calibrate on real images for serving.

Entry points: `quantize_model` / `forward_raw` (drop-in for the float
`forward_raw` raw tuple), dispatched via `quant.quantize_model` and
`Detector(..., quantized=True)`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from mydetection_tpu.models import fcos as fcos_mod
from mydetection_tpu.models import resnet
from mydetection_tpu.models import retinanet as retinanet_mod
from mydetection_tpu.models.layers import (
    Params,
    batch_norm,
    conv2d,
    max_pool,
    upsample2x,
)
from mydetection_tpu.quant import _conv_i8, _quant, fold_cbl, quantize_weight

RESNET_QUANT_FAMILIES = ("retinanet", "fcos")


def _relu(x):
    return jnp.maximum(x, 0.0)


def _stage_nblocks(tree: Params) -> int:
    return sum(1 for k in tree if k.startswith("block"))


# ---------------------------------------------------------------------------
# backends
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
    """Folded-float forward; `toq` records the signed (min, max) range
    and passes the float tensor through unchanged (the affine scheme
    maps the full range onto 256 levels — see quant._sm_of)."""

    def __init__(self, compute_dtype, percentile: float = CALIB_PERCENTILE):
        self.dt = compute_dtype
        self.percentile = float(percentile)
        self.stats: dict[str, jnp.ndarray] = {}

    def toq(self, key: str, y):
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

    def conv(self, f: Params, x, *, stride: int = 1):
        y = conv2d(x, f["wf"], stride=stride, compute_dtype=self.dt)
        return y + f["bias"].astype(y.dtype)

    def deq(self, x):
        return x

    def out(self, p: Params, x):
        y = conv2d(x, p["w"], compute_dtype=self.dt)
        return y + p["b"].astype(y.dtype)

    def stage(self, key: str, t: Params, xr, stride: int):
        n = _stage_nblocks(t)
        xr = _bottleneck(self, f"{key}/b0", t["block0"], xr, stride)
        for bi in range(1, n):
            xr = _bottleneck(self, f"{key}/b{bi}", t[f"block{bi}"], xr, 1)
        return xr


class _FakeQuantBE(_CalibBE):
    """Float-domain walk with per-key SIMULATED activation
    quantization, gated by traced 0/1 scalars — the ResNet-FPN
    counterpart of quant._FakeQuantBE (see its docstring; one compiled
    graph serves every on/off pattern for the sensitivity sweep).
    Weight simulation: quant.blend_weight_tree over the folded trees."""

    def __init__(self, compute_dtype, scales: dict, gates: dict):
        super().__init__(compute_dtype)
        self.scales = scales
        self.gates = gates

    def toq(self, key: str, y):
        from mydetection_tpu.quant import _fq

        g = self.gates[key]
        return jnp.where(g > 0.5,
                         _fq(y, self.scales[key]).astype(y.dtype), y)


class _QuantBE:
    """int8 forward; handles are (xq int8, sm (2,) [scale, m0]) —
    affine dequant x = s·xq + m0 (see quant._QuantBE: zero-point
    border padding + the m0·wscale·wsum epilogue constant)."""

    def __init__(self, scales: dict, compute_dtype,
                 scan_blocks: bool | None = None):
        self.s = scales
        self.dt = compute_dtype
        self.scan = scan_blocks

    def toq(self, key: str, y):
        sm = self.s[key]
        return _quant(y, sm), sm

    def conv(self, q: Params, xr, *, stride: int = 1):
        xq, sm = xr
        from mydetection_tpu.quant import _zero_point

        acc = _conv_i8(xq, q["wq"], stride=stride, pad_val=_zero_point(sm))
        return (acc.astype(jnp.float32) * (sm[..., 0] * q["wscale"])
                + sm[..., 1] * q["wscale"] * q["wsum"] + q["bias"])

    def deq(self, xr):
        xq, sm = xr
        return xq.astype(jnp.float32) * sm[..., 0] + sm[..., 1]

    def out(self, p: Params, xr):
        x = (self.deq(xr) if isinstance(xr, tuple) else xr).astype(self.dt)
        y = conv2d(x, p["w"], compute_dtype=self.dt)
        return y + p["b"].astype(y.dtype)

    def stage(self, key: str, t: Params, xr, stride: int):
        xr = _bottleneck(self, f"{key}/b0", t["block0"], xr, stride)
        if "scan_stacked" not in t:
            return xr
        scales = self.s[key + "/scan"]  # (n-1, 3) [c1, c2, add]
        from mydetection_tpu.models.darknet import _use_scan

        if not _use_scan(self.scan):
            n1 = scales.shape[0]
            for bi in range(n1):
                blk = jax.tree_util.tree_map(lambda l, bi=bi: l[bi],
                                             t["scan_stacked"])
                xr = _bottleneck(_SliceBE(self, scales[bi]), "", blk, xr, 1)
            return xr

        def body(carry, per):
            blk, sc = per
            return _bottleneck(_SliceBE(self, sc), "", blk, carry, 1), None

        xr, _ = jax.lax.scan(body, xr, (t["scan_stacked"], scales))
        return xr


class _SliceBE:
    """Quant backend view whose `toq` consumes a (3, 2) [s, m0] stack
    positionally — the bottleneck body requantizes exactly 3 times in
    fixed order (c1, c2, add), so keys are ignored inside the scan."""

    def __init__(self, parent: _QuantBE, svec):
        self.p = parent
        self.svec = svec
        self.i = 0

    def toq(self, key: str, y):
        s = self.svec[self.i]
        self.i += 1
        return _quant(y, s), s

    def conv(self, q, xr, *, stride: int = 1):
        return self.p.conv(q, xr, stride=stride)

    def deq(self, xr):
        return self.p.deq(xr)


def _bottleneck(be, key: str, t: Params, xr, stride: int):
    """torchvision-v1.5 bottleneck over either backend (stride on the
    3x3; projection shortcut when 'down' present). Mirrors
    resnet._bottleneck — pinned by tests/test_quant_resnet.py."""
    y = be.toq(f"{key}/c1", _relu(be.conv(t["c1"], xr)))
    y = be.toq(f"{key}/c2", _relu(be.conv(t["c2"], y, stride=stride)))
    y3 = be.conv(t["c3"], y)
    sc = (be.conv(t["down"], xr, stride=stride) if "down" in t
          else be.deq(xr))
    return be.toq(f"{key}/add", _relu(y3 + sc))


# ---------------------------------------------------------------------------
# the shared region walk: stages 0-3 -> FPN -> head towers
# ---------------------------------------------------------------------------

def _region(be, qb: Params, qf: Params, qh: Params, y, *, cfg):
    """`y` = float post-maxpool stem activation (B, S/4, S/4, 64).
    Returns the family's raw tuple (same layout as the float
    forward_raw; decode glue is registry.dense_from_raw)."""
    xr = be.toq("entry", y)
    feats = []
    for si in range(4):
        xr = be.stage(f"stage{si}", qb[f"stage{si}"], xr,
                      stride=1 if si == 0 else 2)
        if si >= 1:
            feats.append(xr)
    c3, c4, c5 = feats

    # FPN (mirrors fpn.apply): laterals/sums in f32, requant at the
    # smoothing-conv and head inputs
    l5 = be.conv(qf["lateral5"], c5)
    l4 = be.conv(qf["lateral4"], c4) + upsample2x(l5)
    l3 = be.conv(qf["lateral3"], c3) + upsample2x(l4)
    p3 = be.conv(qf["smooth3"], be.toq("fpn/l3", l3))
    p4 = be.conv(qf["smooth4"], be.toq("fpn/l4", l4))
    p5 = be.conv(qf["smooth5"], be.toq("fpn/l5", l5))
    q5 = be.toq("fpn/p5", p5)
    p6 = be.conv(qf["p6"], q5, stride=2)
    p7 = be.conv(qf["p7"], be.toq("fpn/p6r", _relu(p6)), stride=2)
    levels = [be.toq("fpn/p3", p3), be.toq("fpn/p4", p4), q5,
              be.toq("fpn/p6", p6), be.toq("fpn/p7", p7)]

    def tower(branch: str, li: int, xr):
        t = qh[branch]
        for i in range(4):
            y = be.conv(t[f"conv{i}"], xr)
            if f"gn{i}" in t:  # FCOS towers: GN in f32 between conv/ReLU
                y = fcos_mod.group_norm(y, t[f"gn{i}"])
            if i == 3:
                # the tower output's only consumers are the FLOAT
                # head `out` convs — requantizing it here would cost
                # accuracy for zero speed (quant._CalibBE.cbl_out;
                # measured by the round-5 sensitivity sweep)
                return _relu(y)
            xr = be.toq(f"{branch}/l{li}/c{i}", _relu(y))
        return xr

    if cfg.family == "retinanet":
        nc = cfg.num_classes
        # per-level max-over-classes gate, same as the float head's
        # with_gate path (skips the dense N-minor relayout on TPU)
        cls_f, box_f, gate_f = [], [], []
        for li, q in enumerate(levels):
            cl = be.out(qh["cls"]["out"], tower("cls", li, q))
            bx = be.out(qh["box"]["out"], tower("box", li, q))
            b, h, w, _ = cl.shape
            a = retinanet_mod.NUM_ANCHORS
            cl = cl.reshape(b, h * w * a, nc)
            cls_f.append(cl)
            if cfg.multi_label:
                gate_f.append(jnp.max(cl, axis=-1))
            box_f.append(bx.astype(jnp.float32).reshape(b, h * w * a, 4))
        out = (jnp.concatenate(cls_f, 1), jnp.concatenate(box_f, 1))
        if cfg.multi_label:
            out = out + (jnp.concatenate(gate_f, 1),)
        return out

    # fcos (mirrors fcos.apply incl. the ltrb decode conventions)
    nc = cfg.num_classes
    cls_f, box_f, ctr_f, gate_f = [], [], [], []
    for li, q in enumerate(levels):
        ct = tower("cls_tower", li, q)
        bt = tower("box_tower", li, q)
        cl = be.out(qh["cls_out"], ct)
        raw_box = be.out(qh["box_out"], bt)
        ctr = be.out(qh["ctr_out"], bt)
        if cfg.ltrb_decode == "exp":
            scale = qh["scales"][li]
            ltrb = jnp.exp(jnp.clip(raw_box.astype(jnp.float32) * scale,
                                    -10, 10))
        else:
            ltrb = _relu(raw_box.astype(jnp.float32))
        ltrb = ltrb * float(fcos_mod.STRIDES[li])
        b, h, w, _ = cl.shape
        cl = cl.reshape(b, h * w, nc)
        cls_f.append(cl)
        if cfg.multi_label:
            gate_f.append(jnp.max(cl, axis=-1))
        box_f.append(ltrb.reshape(b, h * w, 4))
        ctr_f.append(ctr.astype(jnp.float32).reshape(b, h * w))
    out = (jnp.concatenate(cls_f, 1), jnp.concatenate(box_f, 1),
           jnp.concatenate(ctr_f, 1))
    if cfg.multi_label:
        out = out + (jnp.concatenate(gate_f, 1),)
    return out


# ---------------------------------------------------------------------------
# prologue (always float)
# ---------------------------------------------------------------------------

def _prologue(backbone: Params, images, compute_dtype) -> jnp.ndarray:
    """uint8/float batch -> post-maxpool stem activation. The
    normalize/standardize/stem-fold policy is resnet.prepare_input —
    the SAME definition the registry's float forward_raw uses, so
    calibration and serving see identical activations by construction."""
    x, fold = resnet.prepare_input(images, compute_dtype=compute_dtype,
                                   train=False)
    if fold:
        return resnet._stem_standardize_folded(backbone["stem"], x,
                                               compute_dtype=compute_dtype)
    y = conv2d(x, backbone["stem"]["conv"]["w"], stride=2,
               compute_dtype=compute_dtype)
    y, _ = batch_norm(y, backbone["stem"]["bn"], train=False)
    return max_pool(_relu(y), 3, 2)


# ---------------------------------------------------------------------------
# tree preparation
# ---------------------------------------------------------------------------

def _qleaf_bias(p: Params) -> Params:
    """bias-conv {'w','b'} -> int8 leaf (no BN to fold)."""
    wq, ws = quantize_weight(p["w"])
    return {"wq": wq, "wscale": ws,
            "wsum": jnp.sum(wq.astype(jnp.float32), axis=(0, 1, 2)),
            "bias": p["b"].astype(jnp.float32)}


def _qleaf_folded(f: Params) -> Params:
    """Folded-float leaf {'wf','bias'} → int8 leaf."""
    wq, ws = quantize_weight(f["wf"])
    return {"wq": wq, "wscale": ws,
            "wsum": jnp.sum(wq.astype(jnp.float32), axis=(0, 1, 2)),
            "bias": f["bias"].astype(jnp.float32)}


def _prep_backbone(ft: Params) -> Params:
    """_fold_only output → int8 backbone tree (no second BN fold)."""
    qb: Params = {}
    for si in range(4):
        st = ft[f"stage{si}"]
        n = _stage_nblocks(st)

        def qblock(b: Params) -> Params:
            return {k: _qleaf_folded(v) for k, v in b.items()}

        qst: Params = {"block0": qblock(st["block0"])}
        if n > 1:
            rest = [qblock(st[f"block{bi}"]) for bi in range(1, n)]
            qst["scan_stacked"] = jax.tree_util.tree_map(
                lambda *ls: jnp.stack(ls), *rest)
        qb[f"stage{si}"] = qst
    return qb


def _prep_fpn(fp: Params) -> Params:
    return {k: _qleaf_bias(fp[k]) for k in fp}


def _prep_head(hd: Params, family: str) -> Params:
    if family == "retinanet":
        out: Params = {}
        for branch in ("cls", "box"):
            t = {f"conv{i}": _qleaf_bias(hd[branch][f"conv{i}"])
                 for i in range(4)}
            t["out"] = hd[branch]["out"]
            out[branch] = t
        return out
    out = {}
    for branch in ("cls_tower", "box_tower"):
        t: Params = {}
        for i in range(4):
            t[f"conv{i}"] = _qleaf_bias(hd[branch][f"conv{i}"])
            t[f"gn{i}"] = hd[branch][f"gn{i}"]  # float GN passthrough
        out[branch] = t
    for k in ("cls_out", "box_out", "ctr_out", "scales"):
        out[k] = hd[k]
    return out


def _stack_scales(ranges: dict[str, tuple], qb: Params,
                  scheme: str) -> dict[str, Any]:
    from mydetection_tpu.quant import _sm_of

    scales = {k: _sm_of(lo, hi, scheme) for k, (lo, hi) in ranges.items()}
    out: dict[str, Any] = {}
    for si in range(4):
        if "scan_stacked" not in qb[f"stage{si}"]:
            continue
        n1 = jax.tree_util.tree_leaves(
            qb[f"stage{si}"]["scan_stacked"])[0].shape[0]
        arr = np.zeros((n1, 3, 2), np.float32)
        for bi in range(n1):
            for ci, part in enumerate(("c1", "c2", "add")):
                arr[bi, ci] = scales.pop(f"stage{si}/b{bi + 1}/{part}")
        out[f"stage{si}/scan"] = jnp.asarray(arr)
    for k, v in scales.items():
        out[k] = jnp.asarray(v)
    return out


# ---------------------------------------------------------------------------
# public API (mirrors quant.py's)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class QuantizedResnetParams:
    backbone_float: Params  # stem (prologue); stages unused but kept
    qb: Params
    qf: Params
    qh: Params
    scales: dict[str, Any]


def calibrate(cfg, params: Params, batches: Iterable[np.ndarray], *,
              _folded=None,
              percentile: float = CALIB_PERCENTILE) -> dict[str, float]:
    if _folded is not None:
        qb, qf, qh = _folded
    else:
        qb = _fold_only(params["backbone"])
        qf = _fold_fpn_float(params["fpn"])
        qh = _fold_head_float(params["head"], cfg.family)

    @jax.jit
    def one(x):
        be = _CalibBE(cfg.compute_dtype, percentile)
        y = _prologue(params["backbone"], x, cfg.compute_dtype)
        _region(be, qb, qf, qh, y, cfg=cfg)
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


def _fold_only(bb: Params) -> Params:
    """Folded-FLOAT backbone tree for the calibration walk (same
    structure as the int8 tree, leaves {'wf','bias'} renamed to the
    conv interface the calib backend expects)."""
    qb: Params = {}
    for si in range(4):
        st = bb[f"stage{si}"]

        def fblock(b: Params) -> Params:
            f = {"c1": fold_cbl(b["conv1"]), "c2": fold_cbl(b["conv2"]),
                 "c3": fold_cbl(b["conv3"])}
            if "down" in b:
                f["down"] = fold_cbl(b["down"])
            return f

        qb[f"stage{si}"] = {f"block{bi}": fblock(st[f"block{bi}"])
                            for bi in range(_stage_nblocks(st))}
    return qb


def _fold_fpn_float(fp: Params) -> Params:
    return {k: {"wf": fp[k]["w"], "bias": fp[k]["b"]} for k in fp}


def _fold_head_float(hd: Params, family: str) -> Params:
    def as_f(p):
        return {"wf": p["w"], "bias": p["b"]}

    if family == "retinanet":
        out: Params = {}
        for branch in ("cls", "box"):
            t = {f"conv{i}": as_f(hd[branch][f"conv{i}"]) for i in range(4)}
            t["out"] = hd[branch]["out"]
            out[branch] = t
        return out
    out = {}
    for branch in ("cls_tower", "box_tower"):
        t: Params = {}
        for i in range(4):
            t[f"conv{i}"] = as_f(hd[branch][f"conv{i}"])
            t[f"gn{i}"] = hd[branch][f"gn{i}"]
        out[branch] = t
    for k in ("cls_out", "box_out", "ctr_out", "scales"):
        out[k] = hd[k]
    return out


def quantize_model(cfg, params: Params,
                   calib_batches: Iterable[np.ndarray],
                   *, percentile: float = CALIB_PERCENTILE,
                   act_scheme: str = "asym") -> QuantizedResnetParams:
    if cfg.family not in RESNET_QUANT_FAMILIES:
        raise ValueError(f"quant_resnet supports {RESNET_QUANT_FAMILIES}, "
                         f"got family '{cfg.family}'")
    ft = _fold_only(params["backbone"])
    ff = _fold_fpn_float(params["fpn"])
    fh = _fold_head_float(params["head"], cfg.family)
    ranges = calibrate(cfg, params, calib_batches, _folded=(ft, ff, fh),
                       percentile=percentile)
    qb = _prep_backbone(ft)
    return QuantizedResnetParams(
        backbone_float={"stem": params["backbone"]["stem"]},
        qb=qb, qf=_prep_fpn(params["fpn"]),
        qh=_prep_head(params["head"], cfg.family),
        scales=_stack_scales(ranges, qb, act_scheme))


def forward_raw(qp: QuantizedResnetParams, images, *, cfg,
                scan_blocks: bool | None = None):
    """Quantized inference -> the family's raw tuple (drop-in for the
    float forward_raw; decode via registry.dense_from_raw)."""
    y = _prologue(qp.backbone_float, images, cfg.compute_dtype)
    be = _QuantBE(qp.scales, cfg.compute_dtype, scan_blocks=scan_blocks)
    return _region(be, qp.qb, qp.qf, qp.qh, y, cfg=cfg)


jax.tree_util.register_dataclass(
    QuantizedResnetParams,
    data_fields=["backbone_float", "qb", "qf", "qh", "scales"],
    meta_fields=[])
