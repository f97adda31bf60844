"""Model factory: string name → assembled model (the build-by-name surface).

Reference parity: `models/__init__.py` `name_to_model(name)` in
duanzhiihao/myDetection [recalled; SURVEY.md §2.2] — per-name config
dicts (anchors, strides, class count, input norm) plus construction.
Here a model is a frozen config + a bundle of pure functions
(init / forward_dense / loss); there is no module object to mutate.

`forward_dense` is THE compiled unit: uint8 NHWC batch → dense decoded
(boxes, scores) still on device, ready for the static postprocess. One
XLA graph per (model, input-size bucket) [spec].
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from mydetection_tpu.models import darknet
from mydetection_tpu.models import layers as L
from mydetection_tpu.models import yolov3


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    name: str
    family: str
    num_classes: int = 80
    input_size: int = 416
    conf_thres: float = 0.005
    nms_iou: float = 0.45
    pre_nms: int = 1024
    max_dets: int = 100
    rotated: bool = False
    # multi_label: emit every (box, class) pair above conf (RetinaNet/
    # FCOS convention); False = per-box best class only (the reference's
    # YOLO decode idiom [recalled; SURVEY.md §2.5]).
    multi_label: bool = True
    compute_dtype: Any = jnp.bfloat16  # conv compute; decode is always f32
    class_names: tuple[str, ...] | None = None
    # FCOS ltrb regression decode: "exp" = the FCOS paper (exp with
    # learnable per-level scales; the reference's idiom, and what THIS
    # framework trains). "linear" = torchvision's relu(raw)·stride —
    # REQUIRED when importing torchvision fcos checkpoints (see
    # models/fcos.apply).
    ltrb_decode: str = "exp"
    # anchor table override for the darknet families: 3 levels (P5→P3)
    # of per-level (w, h) tuples in input pixels. None = the family
    # default (yolov3: the canonical COCO anchors; rapid: admitted-guess
    # person priors). Derive from a user dataset with
    # mydetection_tpu.anchors.anchor_table (SURVEY.md §2.7b).
    anchors: tuple | None = None
    # pre-NMS candidate top-k via the TPU PartialReduce hardware path
    # (jax.lax.approx_max_k, recall 0.95) instead of an exact sort.
    # Only the pre-NMS select is approximate — the post-NMS top-max_dets
    # stays exact — and only candidates at the pre_nms-th-rank tail can
    # be missed, which with trained weights sit at/below conf_thres (the
    # reference's own topk-1000/level cutoff truncates the same tail
    # [recalled; SURVEY.md §3.2]). Exact-sort fallback off-TPU, so CPU
    # tests/golden runs are unaffected. Measured on v5e @608 batch-32:
    # RetinaNet postprocess 9.6 → 5.4 ms. Set False for bit-exact
    # parity runs: Detector(..., approx_topk=False).
    approx_topk: bool = True
    # Fused Pallas bias+GN+ReLU in GN-tower heads (fcos). None = auto:
    # on when the backend is TPU at trace time (inference only).
    # Detector threads its use_pallas flag here (ADVICE r4:
    # use_pallas=False must restore the pure-JAX oracle path for EVERY
    # Pallas kernel, GN included); an explicit
    # Detector(fused_gn=...) / get_model(..., fused_gn=...) overrides.
    fused_gn: bool | None = None


@dataclasses.dataclass(frozen=True)
class Model:
    """A detector family instance: frozen config + pure functions.

    forward_dense(params, images, train=False) →
        ({"boxes": (B,N,4|5) , "scores": (B,N,C) or (B,N)}, bn_updates)
    loss(params, images, gt_boxes, gt_classes, gt_valid) → dict of scalars
    """

    config: ModelConfig
    init: Callable[[jax.Array], dict]
    forward_dense: Callable[..., tuple[dict, dict | None]]
    loss: Callable[..., dict]


_REGISTRY: dict[str, Callable[[ModelConfig], Model]] = {}
_CONFIGS: dict[str, ModelConfig] = {}


def register(name: str, config: ModelConfig):
    def deco(builder: Callable[[ModelConfig], Model]):
        _REGISTRY[name] = builder
        _CONFIGS[name] = config
        return builder
    return deco


def list_models() -> list[str]:
    return sorted(_REGISTRY)


def default_config(name: str) -> ModelConfig:
    """The registered (pre-override) config for `name` — for callers
    that need config facts (rotated, family, input_size) BEFORE
    building the model, e.g. train.py choosing the dataset parser."""
    if name not in _CONFIGS:
        raise KeyError(f"unknown model '{name}'; available: {list_models()}")
    return _CONFIGS[name]


def get_model(name: str, **overrides) -> Model:
    """Build a model by name — the reference's `name_to_model` surface.

    Keyword overrides patch the registered config (e.g.
    `get_model('yolov3', input_size=608, compute_dtype=jnp.float32)`).
    """
    if name not in _REGISTRY:
        raise KeyError(f"unknown model '{name}'; available: {list_models()}")
    cfg = dataclasses.replace(_CONFIGS[name], **overrides)
    check_input_size(cfg.input_size)
    if cfg.anchors is not None:
        check_anchor_table(cfg.anchors, cfg.family)
    return _REGISTRY[name](cfg)


def check_anchor_table(anchors, family: str) -> None:
    """Reject anchor tables the darknet heads can't consume.

    The yolov3/rapid heads are built with exactly 3 anchors per level
    over 3 levels (head output channels and the loss's
    `best_level = best_a // 3` assignment both hardcode it); a table
    from `anchors.anchor_table(per_level=4)` would otherwise fail as
    an opaque reshape deep inside decode."""
    if family not in ("yolov3", "rapid"):
        raise ValueError(f"anchors override is only meaningful for the "
                         f"darknet families (yolov3/rapid), not {family}")
    ok = (isinstance(anchors, (tuple, list)) and len(anchors) == 3
          and all(len(lvl) == 3 for lvl in anchors)
          and all(len(a) == 2 and float(a[0]) > 0 and float(a[1]) > 0
                  for lvl in anchors for a in lvl))
    if not ok:
        raise ValueError(
            "anchors must be 3 levels (P5→P3) × 3 (w, h) pairs with "
            "positive sizes — the shape mydetection_tpu.anchors."
            "anchor_table() produces with default levels/per_level; "
            f"got {anchors!r}")


def check_input_size(size: int) -> None:
    """Reject sizes the feature pyramids can't tile.

    Every model downsamples by 32 and re-merges levels with exact 2x
    upsampling (yolov3 neck concat, FPN top-down add); a non-multiple
    of 32 fails deep inside jit with an opaque XLA concatenate/add
    shape error (e.g. 500 → C3=63 vs upsample2x(C4)=64). Fail HERE
    with a readable message instead.
    """
    if size < 32 or size % 32 != 0:
        raise ValueError(
            f"input_size must be a positive multiple of 32, got {size} "
            "(the backbone downsamples by 32 and the neck/FPN re-merges "
            "levels with exact 2x upsampling)")


def fast_init(model: "Model", rng: jax.Array):
    """Initialize params with backend-appropriate dispatch granularity.

    On the TPU (remote transport, ~30 ms per dispatch) the eager init's
    hundreds of tiny RNG ops dominate cold start: jitting the whole
    init collapses them to one executable (measured 26.4 s → 16.9 s
    cold, ~0 s for further inits, and the executable persists in the
    compilation cache). On CPU the jitted graph compiles SLOWER than
    the eager loop runs (12 s vs 16 s), so eager stays the default
    there.
    """
    if jax.default_backend() == "tpu":
        return jax.jit(model.init)(rng)
    return model.init(rng)


# ---------------------------------------------------------------------------
# YOLOv3
# ---------------------------------------------------------------------------

def dense_from_raw(raw, cfg: ModelConfig, input_size: int | None = None) -> dict:
    """Family raw head outputs → the dense dict `forward_dense` returns
    (boxes xyxy + scores | score_logits [+ classes / score_mul]). The
    ONE decode-glue definition, shared by the float builders below and
    the int8 paths (quant/quant_resnet forward_raw produce the same raw
    layouts). `input_size` is required for the anchor/location grids of
    the ResNet families (darknet decode derives grids from raw shapes)."""
    from mydetection_tpu.ops.boxes import cxcywh_to_xyxy

    if cfg.family == "retinanet":
        from mydetection_tpu.models import retinanet
        # raw may carry the optional head-computed per-box gate (the
        # max-over-classes logit, reduced per level before the concat
        # — retinanet.apply(with_gate=True)); the postprocess then
        # skips its own dense reduce and XLA never relayouts the
        # (B, N, C) logits tensor to N-minor.
        cls_logits, box_deltas = raw[:2]
        anchors = retinanet.generate_anchors(input_size)
        out = {"boxes": retinanet.decode_boxes(box_deltas, anchors),
               "score_logits": cls_logits}
        if len(raw) > 2:
            out["score_gate"] = raw[2]
        return out
    if cfg.family == "fcos":
        from mydetection_tpu.models import fcos
        cls_logits, ltrb, ctr = raw[:3]
        locations, _ = fcos.generate_locations(input_size)
        # ranking score sigmoid(cls)·sigmoid(ctr) is assembled after
        # top-k in the postprocess (score_logits + score_mul)
        out = {"boxes": fcos.decode_boxes(ltrb, locations),
               "score_logits": cls_logits,
               "score_mul": jax.nn.sigmoid(ctr)}
        if len(raw) > 3:
            out["score_gate"] = raw[3]
        return out
    if cfg.family == "rapid":
        from mydetection_tpu.models import rapid
        anchors = cfg.anchors if cfg.anchors is not None else rapid.ANCHORS
        decoded = rapid.decode(raw, anchors=anchors)
        return {"boxes": decoded["boxes5"], "scores": decoded["conf"]}
    anchors = cfg.anchors if cfg.anchors is not None else yolov3.ANCHORS
    nc = cfg.num_classes
    if cfg.multi_label:
        decoded = yolov3.decode(raw, nc, anchors=anchors)
        return {"boxes": cxcywh_to_xyxy(decoded["boxes"]),
                "scores": yolov3.scores_from(decoded)}
    decoded = yolov3.decode_single_label(raw, nc, anchors=anchors)
    return {"boxes": cxcywh_to_xyxy(decoded["boxes"]),
            "scores": decoded["scores"],
            "classes": decoded["classes"]}


def _build_yolov3(cfg: ModelConfig) -> Model:
    nc = cfg.num_classes
    anchors = cfg.anchors if cfg.anchors is not None else yolov3.ANCHORS

    def init(rng: jax.Array) -> dict:
        ks = jax.random.split(rng, 2)
        return {"backbone": darknet.init(ks[0]), "head": yolov3.init(ks[1], nc)}

    def forward_dense(params, images, *, train: bool = False):
        """images: uint8 or float NHWC. Returns dense (boxes, scores[,
        classes]) — single-label configs pre-reduce the class axis in
        the decode (scores (B, N), classes (B, N))."""
        raw, updates = forward_raw(params, images, train=train)
        return dense_from_raw(raw, cfg), updates

    def forward_raw(params, images, *, train: bool = False):
        x = images
        if x.dtype == jnp.uint8:
            x = L.normalize_input(x, cfg.compute_dtype)
        else:
            x = x.astype(cfg.compute_dtype)
        feats, bu = darknet.apply(params["backbone"], x, train=train,
                                  compute_dtype=cfg.compute_dtype)
        raw, hu = yolov3.apply(params["head"], feats, train=train,
                               compute_dtype=cfg.compute_dtype)
        return raw, ({"backbone": bu, "head": hu} if train else None)

    def loss(params, images, gt_boxes, gt_classes, gt_valid, *,
             input_size: int | None = None):
        raw, updates = forward_raw(params, images, train=True)
        terms = yolov3.loss(None, raw, gt_boxes, gt_classes, gt_valid,
                            input_size=input_size or cfg.input_size,
                            num_classes=nc, anchors=anchors)
        terms["bn_updates"] = updates
        return terms

    return Model(config=cfg, init=init, forward_dense=forward_dense, loss=loss)


register("yolov3", ModelConfig(name="yolov3", family="yolov3",
                               num_classes=80, input_size=416,
                               multi_label=False))(_build_yolov3)
register("yolov3_608", ModelConfig(name="yolov3_608", family="yolov3",
                                   num_classes=80, input_size=608,
                                   multi_label=False))(_build_yolov3)


# ---------------------------------------------------------------------------
# RetinaNet (ResNet-FPN)
# ---------------------------------------------------------------------------

def _build_retinanet(depth: int):
    def build(cfg: ModelConfig) -> Model:
        from mydetection_tpu.models import fpn, resnet, retinanet

        nc = cfg.num_classes

        def init(rng: jax.Array) -> dict:
            ks = jax.random.split(rng, 3)
            return {
                "backbone": resnet.init(ks[0], depth=depth),
                "fpn": fpn.init(ks[1]),
                "head": retinanet.init(ks[2], nc),
            }

        def forward_raw(params, images, *, train: bool = False):
            # normalize/standardize/stem-fold policy: resnet.prepare_input
            x, fold = resnet.prepare_input(images,
                                           compute_dtype=cfg.compute_dtype,
                                           train=train)
            feats, bu = resnet.apply(params["backbone"], x, depth=depth,
                                     train=train, compute_dtype=cfg.compute_dtype,
                                     stem_fold_std=fold)
            pyr = fpn.apply(params["fpn"], feats, compute_dtype=cfg.compute_dtype)
            # inference also gets the per-level max-over-classes gate
            # (multi-label postprocess stage 1) fused into the head
            head = retinanet.apply(
                params["head"], pyr, num_classes=nc,
                compute_dtype=cfg.compute_dtype,
                with_gate=not train and cfg.multi_label)
            return head + (({"backbone": bu} if train else None),)

        def forward_dense(params, images, *, train: bool = False):
            *raw, updates = forward_raw(params, images, train=train)
            # logits stay dense/native; sigmoid happens after top-k in
            # the postprocess (ops/nms score_logits path)
            dense = dense_from_raw(tuple(raw), cfg,
                                   input_size=images.shape[1])
            return dense, updates

        def loss(params, images, gt_boxes, gt_classes, gt_valid, *,
                 input_size: int | None = None):
            cls_logits, box_deltas, updates = forward_raw(params, images,
                                                          train=True)
            anchors = retinanet.generate_anchors(images.shape[1])
            terms = retinanet.loss(cls_logits.astype(jnp.float32),
                                   box_deltas, anchors,
                                   gt_boxes, gt_classes, gt_valid,
                                   num_classes=nc)
            terms["bn_updates"] = updates
            return terms

        return Model(config=cfg, init=init, forward_dense=forward_dense,
                     loss=loss)

    return build


# ---------------------------------------------------------------------------
# RAPiD (rotated bboxes, Darknet-53, person-only)
# ---------------------------------------------------------------------------

def _build_rapid(cfg: ModelConfig) -> Model:
    from mydetection_tpu.models import rapid

    anchors = cfg.anchors if cfg.anchors is not None else rapid.ANCHORS

    def init(rng: jax.Array) -> dict:
        ks = jax.random.split(rng, 2)
        return {"backbone": darknet.init(ks[0]),
                "head": yolov3.init(ks[1], 1, channels_per_anchor=rapid.CHANNELS_PER_ANCHOR)}

    def forward_raw(params, images, *, train: bool = False):
        x = images
        if x.dtype == jnp.uint8:
            x = L.normalize_input(x, cfg.compute_dtype)
        else:
            x = x.astype(cfg.compute_dtype)
        feats, bu = darknet.apply(params["backbone"], x, train=train,
                                  compute_dtype=cfg.compute_dtype)
        raw, hu = yolov3.apply(params["head"], feats, train=train,
                               compute_dtype=cfg.compute_dtype)
        return raw, ({"backbone": bu, "head": hu} if train else None)

    def forward_dense(params, images, *, train: bool = False):
        raw, updates = forward_raw(params, images, train=train)
        # rotated models: "boxes" carries (cx, cy, w, h, θ); "scores" (B, N)
        return dense_from_raw(raw, cfg), updates

    def loss(params, images, gt_boxes, gt_classes, gt_valid, *,
             input_size: int | None = None):
        """gt_boxes here are (B, M, 5) cxcywhθ; gt_classes unused (person)."""
        raw, updates = forward_raw(params, images, train=True)
        terms = rapid.loss(raw, gt_boxes, gt_valid,
                           input_size=input_size or cfg.input_size,
                           anchors=anchors)
        terms["bn_updates"] = updates
        return terms

    return Model(config=cfg, init=init, forward_dense=forward_dense, loss=loss)


register("rapid", ModelConfig(
    name="rapid", family="rapid", num_classes=1, input_size=1024,
    rotated=True, conf_thres=0.3, pre_nms=512,
    class_names=("person",)))(_build_rapid)


# ---------------------------------------------------------------------------
# FCOS (ResNet-FPN, anchor-free)
# ---------------------------------------------------------------------------

def _build_fcos(cfg: ModelConfig) -> Model:
    from mydetection_tpu.models import fcos, fpn, resnet

    nc = cfg.num_classes

    def init(rng: jax.Array) -> dict:
        ks = jax.random.split(rng, 3)
        return {
            "backbone": resnet.init(ks[0], depth=50),
            "fpn": fpn.init(ks[1]),
            "head": fcos.init(ks[2], nc),
        }

    def forward_raw(params, images, *, train: bool = False):
        # normalize/standardize/stem-fold policy: resnet.prepare_input
        x, fold = resnet.prepare_input(images,
                                       compute_dtype=cfg.compute_dtype,
                                       train=train)
        feats, bu = resnet.apply(params["backbone"], x, depth=50,
                                 train=train, compute_dtype=cfg.compute_dtype,
                                 stem_fold_std=fold)
        pyr = fpn.apply(params["fpn"], feats, compute_dtype=cfg.compute_dtype)
        head = fcos.apply(params["head"], pyr, num_classes=nc,
                          compute_dtype=cfg.compute_dtype,
                          ltrb_decode=cfg.ltrb_decode,
                          with_gate=not train and cfg.multi_label,
                          # fused Pallas bias+GN+ReLU (one HBM pass;
                          # 56.95 -> 48.55 ms on the 2-tower @608/b32
                          # microbench), Mosaic-only. Differentiable
                          # since round 5 (custom-VJP fused backward),
                          # so training uses it too. cfg.fused_gn
                          # None = auto (TPU backend); Detector threads
                          # use_pallas into it (ADVICE r4).
                          fused_gn=(cfg.fused_gn if cfg.fused_gn is not None
                                    else jax.default_backend() == "tpu"))
        return head + (({"backbone": bu} if train else None),)

    def forward_dense(params, images, *, train: bool = False):
        *raw, updates = forward_raw(params, images, train=train)
        # cls logits stay dense/native; scoring assembled post-top-k
        dense = dense_from_raw(tuple(raw), cfg,
                               input_size=images.shape[1])
        return dense, updates

    def loss(params, images, gt_boxes, gt_classes, gt_valid, *,
             input_size: int | None = None):
        cls_logits, ltrb, ctr, updates = forward_raw(params, images, train=True)
        locations, strides = fcos.generate_locations(images.shape[1])
        terms = fcos.loss(cls_logits.astype(jnp.float32), ltrb, ctr,
                          locations, strides,
                          gt_boxes, gt_classes, gt_valid, num_classes=nc)
        terms["bn_updates"] = updates
        return terms

    return Model(config=cfg, init=init, forward_dense=forward_dense, loss=loss)


register("fcos", ModelConfig(
    name="fcos", family="fcos", num_classes=80, input_size=608,
    conf_thres=0.05))(_build_fcos)


register("retinanet", ModelConfig(
    name="retinanet", family="retinanet", num_classes=80, input_size=608,
    conf_thres=0.05))(_build_retinanet(50))
register("retinanet_r101", ModelConfig(
    name="retinanet_r101", family="retinanet", num_classes=80, input_size=608,
    conf_thres=0.05))(_build_retinanet(101))
