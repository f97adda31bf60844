"""AOT export: serialize the compiled detect pipeline to one artifact.

The reference ships inference as code + a checkpoint — serving always
re-runs model-building Python (myDetection api.py [recalled; SURVEY.md
§2.1/§3.1]). On TPU the natural production artifact is the *compiled
function itself*: `jax.export` serializes the jitted detect pipeline
(normalize → backbone → heads → decode → top-k → NMS) as portable
StableHLO plus the parameter leaves (flat, jax tree order — the traced
fn rebuilds the tree, so even registered-dataclass trees like the int8
`QuantizedParams` need no class at load time), and a serving process
reloads it WITHOUT this package's model code — only the thin host
pre/post (letterbox, inverse mapping) runs in Python.

What the artifact pins:
  - the full device graph at a fixed (batch_size, input_size) bucket,
    float or int8-quantized, exactly as `Detector` would run it
    (same `make_post_one` postprocess — bitwise-identical outputs);
  - the weights (float params or the calibrated int8 tree);
  - `nms_iou` (static under jit, so baked at export time) and the
    default `conf_thres` (a traced scalar — overridable per call).

Portability: StableHLO carries jax.export's compatibility guarantees
(backward ≥ 6 months) for everything EXCEPT custom calls. The TPU
pipeline uses two: the Pallas NMS kernel (`tpu_custom_call`) and the
approx-top-k PartialReduce. Exporting with those requires explicitly
waiving the stability check per target (recorded in the artifact's
metadata); such artifacts should be served on a matching jaxlib/libtpu.
A CPU export of the oracle-NMS pipeline contains no custom calls and
is fully covered by the guarantees.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mydetection_tpu.checkpoint import SEP

_FORMAT = "mydetection-tpu-export"
# 2: (size × batch) bucket grid — blob keys became __mlir__<size>x<b>.
# Version-1 single-size artifacts (__mlir__<b>) still load (the size
# comes from meta["input_size"]); a v1 LIBRARY given a v2 artifact
# fails with the readable upgrade message below.
# 3: conf_thres is traced as a PER-IMAGE (batch,) vector
# (meta["conf_vector"]) so the serving daemon batches mixed-threshold
# requests; v<=2 scalar-conf artifacts still load and serve (uniform
# conf only).
_VERSION = 3
# Custom-call targets this pipeline can legitimately emit on TPU.
# Anything else failing the stability check is a real error.
_KNOWN_CUSTOM_CALLS = ("tpu_custom_call", "ApproxTopK", "PartialReduce",
                       "Sharding", "annotate_device_placement")


def _export_fn(det, treedef):
    """One traceable fn(param_leaves, images_u8, conf_thres) → padded dets.

    Mirrors `Detector._pipeline`'s fused TPU graph (the CPU split there
    is only a compile-time dodge; the math is identical). Takes the
    parameters as a FLAT LEAF LIST — a plain-list pytree jax.export can
    always serialize — and rebuilds the real tree (which may be a
    registered dataclass like `quant.QuantizedParams`) via the closed-
    over `treedef` at trace time.
    """
    from mydetection_tpu.api import _make_forward_dense, make_post_one

    cfg = det.cfg
    forward_dense = _make_forward_dense(det)
    post_one = make_post_one(cfg, det.use_pallas)
    nms_iou = float(cfg.nms_iou)

    def fn(param_leaves, images_u8, conf_thres):
        # conf_thres: (batch,) per-image vector — mirrors the live
        # pipeline so mixed-threshold requests share one dispatch
        params = jax.tree_util.tree_unflatten(treedef, param_leaves)
        dense, _ = forward_dense(params, images_u8)
        return jax.vmap(lambda d, c: post_one(d, c, nms_iou))(
            dense, conf_thres)

    return fn


def export_detector(det, path: str, *, batch_size: int | Sequence[int] = 1,
                    input_size: int | Sequence[int] | None = None,
                    platforms: Sequence[str] | None = None) -> None:
    """Serialize `det`'s detect pipeline at a (size × batch) bucket grid.

    batch_size: one int or several (e.g. (1, 32) — a latency bucket
    next to a throughput bucket; the loader picks the best fit per
    request). input_size: one square size or several (e.g. (416, 608)
    — the reference's `input_size` kwarg / multi-scale serving,
    SURVEY.md §5.7). Every (size, batch) pair becomes one compiled
    graph; all buckets share one weight copy in the artifact.

    platforms: lowering targets (default: the current backend). Multi-
    platform export (e.g. ("tpu", "cpu")) requires every op in the
    graph to lower for all targets — the Pallas-NMS path is TPU-only,
    so multi-platform exports need a Detector(use_pallas=False).
    """
    from mydetection_tpu.registry import check_input_size

    cfg = det.cfg
    if input_size is None:
        input_size = cfg.input_size
    sizes = sorted({int(s) for s in (
        (input_size,) if isinstance(input_size, int) else input_size)})
    if not sizes:
        raise ValueError("input_size is an empty sequence — pass at "
                         "least one square size (e.g. 416 or (416, 608))")
    for s in sizes:
        check_input_size(s)
    if platforms is None:
        backend = jax.default_backend()
        # jax.export names GPU lowerings 'cuda'/'rocm', never 'gpu'
        if backend == "gpu":
            backend = getattr(jax.devices()[0], "platform_version", "")
            backend = "rocm" if "rocm" in backend.lower() else "cuda"
        platforms = (backend,)
    platforms = tuple(str(p) for p in platforms)
    batch_sizes = sorted({int(b) for b in (
        (batch_size,) if isinstance(batch_size, int) else batch_size)})
    if not batch_sizes or batch_sizes[0] < 1:
        raise ValueError(f"batch sizes must be >= 1, got {batch_sizes}")

    params = det.params if det._q is None else det._q
    if params is None:
        raise ValueError("detector has no parameters to export")
    leaves, treedef = jax.tree_util.tree_flatten(params)
    p_spec = [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves]

    fn = jax.jit(_export_fn(det, treedef))
    from jax import export as jexport

    waived: list[str] = []
    blobs: dict[tuple[int, int], bytes] = {}
    for size in sizes:
        for b in batch_sizes:
            if det._pack_input:
                img_spec = jax.ShapeDtypeStruct(
                    (b, size // 2, size // 2, 12), jnp.uint8)
            else:
                img_spec = jax.ShapeDtypeStruct((b, size, size, 3),
                                                jnp.uint8)
            conf_spec = jax.ShapeDtypeStruct((b,), jnp.float32)
            checks = [jexport.DisabledSafetyCheck.custom_call(t)
                      for t in waived]
            try:
                exp = jexport.export(fn, platforms=platforms,
                                     disabled_checks=checks)(
                    p_spec, img_spec, conf_spec)
            except ValueError as e:
                # Re-run waiving exactly the known TPU custom calls
                # this pipeline emits (Pallas NMS, approx top-k). An
                # unknown target in the message stays fatal. Waivers
                # accumulate so later buckets export in one pass.
                msg = str(e)
                fresh = ({t for t in _KNOWN_CUSTOM_CALLS if t in msg}
                         - set(waived))
                if not fresh:
                    raise
                waived = sorted(set(waived) | fresh)
                checks = [jexport.DisabledSafetyCheck.custom_call(t)
                          for t in waived]
                exp = jexport.export(fn, platforms=platforms,
                                     disabled_checks=checks)(
                    p_spec, img_spec, conf_spec)
            blobs[(size, b)] = exp.serialize()

    meta = {
        "format": _FORMAT,
        "version": _VERSION,
        "model": cfg.name,
        # default serving size: the model's configured size when
        # exported, else the smallest bucket
        "input_size": (cfg.input_size if cfg.input_size in sizes
                       else sizes[0]),
        "input_sizes": sizes,
        "batch_size": batch_sizes[-1],  # legacy single-bucket field
        "batch_sizes": batch_sizes,
        "rotated": bool(cfg.rotated),
        "num_classes": int(cfg.num_classes),
        "class_names": list(cfg.class_names) if cfg.class_names else None,
        "conf_thres": float(cfg.conf_thres),
        "nms_iou": float(cfg.nms_iou),
        "max_dets": int(cfg.max_dets),
        "quantized": det._q is not None,
        "conf_vector": True,  # v3: per-image (batch,) conf_thres arg
        "pack_input": bool(det._pack_input),
        "platforms": list(platforms),
        "jax_version": jax.__version__,
        "waived_custom_call_checks": waived,
    }
    flat = {f"params{SEP}{i:06d}": np.asarray(l)
            for i, l in enumerate(jax.device_get(leaves))}
    flat["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8)
    for (size, b), blob in blobs.items():
        flat[f"__mlir__{size}x{b}"] = np.frombuffer(blob, dtype=np.uint8)
    with open(path, "wb") as f:
        np.savez(f, **flat)


@dataclasses.dataclass
class ExportedDetector:
    """Serve a `export_detector` artifact — no model-building code runs.

    detect_one/detect_batch/detect_imgSeq mirror `Detector`'s host
    pipeline (letterbox → exported device graph → strip +
    inverse-letterbox); batches are chunked over the exported batch
    buckets, each chunk padded to its bucket.
    """

    meta: dict
    params: object
    _calls: dict  # (input_size, batch_size) -> jitted exported.call

    @property
    def batch_sizes(self) -> list[int]:
        return sorted({b for _, b in self._calls})

    @property
    def input_sizes(self) -> list[int]:
        return sorted({s for s, _ in self._calls})

    def _resolve_size(self, input_size: int | None) -> int:
        size = input_size or self.meta["input_size"]
        if size not in self.input_sizes:
            raise ValueError(
                f"input_size={size} is not in this artifact's exported "
                f"buckets {self.input_sizes} — re-export with "
                f"input_size=(…, {size})")
        return size

    @property
    def cfg(self):
        """Config view over the metadata — enough surface for the
        evaluators (`eval/evaluator.py` reads cfg.name / input_size /
        num_classes / conf_thres / nms_iou)."""
        from types import SimpleNamespace

        m = self.meta
        return SimpleNamespace(
            name=m["model"], input_size=m["input_size"],
            num_classes=m.get("num_classes"), conf_thres=m["conf_thres"],
            nms_iou=m["nms_iou"], rotated=m["rotated"],
            max_dets=m["max_dets"], class_names=m["class_names"])

    def warmup(self) -> None:
        """Compile every exported (size, batch) bucket up front (the
        StableHLO still goes through XLA's backend compile on first
        call)."""
        for size, b in self._calls:
            self._run(np.zeros((b, size, size, 3), np.uint8),
                      self.meta["conf_thres"])

    @property
    def supports_conf_vector(self) -> bool:
        """True when the artifact's graphs take a per-image conf vector
        (export version >= 3) — serve.py batches mixed-conf requests
        only when this holds; legacy scalar artifacts keep per-conf
        grouping."""
        return bool(self.meta.get("conf_vector"))

    def _run(self, canvases: np.ndarray, conf) -> dict:
        """conf: one float, or a per-image sequence covering the
        leading rows (padding rows reuse the last value)."""
        if self.meta["pack_input"] and canvases.shape[-1] == 3:
            from mydetection_tpu.utils.image_ops import pack_s2d2
            canvases = pack_s2d2(np.asarray(canvases))
        size = canvases.shape[1] * (2 if canvases.shape[-1] == 12 else 1)
        b = canvases.shape[0]
        call = self._calls[(size, b)]
        if self.supports_conf_vector:
            if np.ndim(conf) == 0:
                conf_arg = jnp.full((b,), conf, jnp.float32)
            else:
                cv = np.asarray(conf, np.float32)
                if len(cv) < b:
                    cv = np.concatenate([cv, np.repeat(cv[-1:], b - len(cv))])
                conf_arg = jnp.asarray(cv)
        else:  # legacy scalar-conf artifact: uniform threshold only
            if np.ndim(conf) != 0:
                uniq = set(float(c) for c in np.asarray(conf).ravel())
                if len(uniq) > 1:
                    raise ValueError(
                        "this artifact predates per-image conf_thres "
                        "(export version < 3) — re-export to serve "
                        "mixed-threshold batches")
                conf = uniq.pop()
            conf_arg = jnp.float32(conf)
        out = call(self.params, jnp.asarray(canvases), conf_arg)
        return jax.device_get(out)

    def _chunks(self, n: int) -> list[tuple[int, int]]:
        """(rows_taken, bucket) plan covering n images.

        Fill the largest bucket while it fits; for the remainder,
        one padded call with the smallest bucket that covers it beats
        a pile of small-bucket calls (each call is a device dispatch)
        unless the remainder is tiny — heuristics: pad when the
        remainder fills more than half the covering bucket, or when
        greedy small-bucket filling would need > 4 calls."""
        bs = self.batch_sizes
        plan, rem = [], n
        while rem > 0:
            if rem >= bs[-1]:
                plan.append((bs[-1], bs[-1]))
                rem -= bs[-1]
                continue
            covering = [b for b in bs if b >= rem]  # non-empty: rem < bs[-1]
            b_hi = min(covering)
            filled = [b for b in bs if b <= rem]
            if not filled or rem > b_hi // 2 or rem // max(filled) > 4:
                plan.append((rem, b_hi))  # one padded call finishes
                return plan
            b = max(filled)
            plan.append((b, b))
            rem -= b
        return plan

    def _check_nms_iou(self, nms_iou: float | None) -> None:
        """`nms_iou` is static under jit, so it is baked at export time;
        accepting (and checking) the kwarg keeps drop-in parity with
        `Detector`'s surfaces instead of a bare TypeError."""
        if nms_iou is not None and abs(nms_iou - self.meta["nms_iou"]) > 1e-9:
            raise ValueError(
                f"nms_iou is static in an exported artifact (baked at "
                f"{self.meta['nms_iou']}); re-export to change it")

    def detect_one(self, *, img_path=None, pil_img=None, np_img=None,
                   conf_thres: float | None = None,
                   nms_iou: float | None = None,
                   input_size: int | None = None, visualize: bool = False,
                   save_path: str | None = None):
        from mydetection_tpu.api import (_load_image, finalize_visualize,
                                         strip_detections)
        from mydetection_tpu.utils.image_ops import letterbox_pil

        self._check_nms_iou(nms_iou)
        img = _load_image(img_path, pil_img, np_img)
        conf = conf_thres if conf_thres is not None else self.meta["conf_thres"]
        canvas, info = letterbox_pil(img, self._resolve_size(input_size))
        bsz = self.batch_sizes[0]  # smallest bucket: lowest latency
        out = self._run(np.repeat(canvas[None], bsz, axis=0), conf)
        dets = strip_detections(out, 0, info, rotated=self.meta["rotated"])
        return finalize_visualize(dets, img, self.meta["class_names"],
                                  visualize, save_path)

    def detect_batch(self, images, *, conf_thres: float | None = None,
                     nms_iou: float | None = None,
                     input_size: int | None = None) -> list:
        from mydetection_tpu.api import load_image_any, strip_detections
        from mydetection_tpu.utils.image_ops import letterbox_pil

        self._check_nms_iou(nms_iou)
        conf = conf_thres if conf_thres is not None else self.meta["conf_thres"]
        size = self._resolve_size(input_size)
        canvases, infos = [], []
        for im in images:
            canvas, info = letterbox_pil(load_image_any(im), size)
            canvases.append(canvas)
            infos.append(info)
        dets, start = [], 0
        for n, bsz in self._chunks(len(canvases)):
            chunk = canvases[start:start + n]
            while len(chunk) < bsz:  # pad the tail chunk; rows dropped below
                chunk = chunk + [chunk[-1]]
            out = self._run(np.stack(chunk), conf)
            dets += [strip_detections(out, i, infos[start + i],
                                      rotated=self.meta["rotated"])
                     for i in range(n)]
            start += n
        return dets

    # reference-name alias, matching Detector.detect_imgSeq
    def detect_imgSeq(self, img_paths: Sequence[str], **kw) -> list:
        return self.detect_batch(list(img_paths), **kw)

    def detect_prepared(self, canvases, infos, *,
                        conf_thres: float | None = None,
                        nms_iou: float | None = None) -> list:
        """Detect on already-letterboxed uint8 canvases — the evaluator
        / streaming fast path (`eval/evaluator.py`). Only the first
        len(infos) rows are real. `nms_iou` is baked into the artifact;
        passing a different value is an error, not a silent ignore.
        `conf_thres` may be a per-image sequence (len == len(infos))
        on conf-vector artifacts (export version >= 3)."""
        from mydetection_tpu.api import strip_detections

        self._check_nms_iou(nms_iou)
        conf = conf_thres if conf_thres is not None else self.meta["conf_thres"]
        if np.ndim(conf) != 0 and len(np.asarray(conf)) != len(infos):
            raise ValueError(
                f"per-image conf_thres has {len(np.asarray(conf))} "
                f"entries for {len(infos)} images")
        if canvases.shape[-1] not in (3, 12):
            raise ValueError(
                f"detect_prepared expects (B, S, S, 3) RGB or "
                f"(B, S/2, S/2, 12) S2D-2 packed canvases, got shape "
                f"{tuple(canvases.shape)}")
        if self.meta["pack_input"] and canvases.shape[-1] == 3:
            # pack up front (mirroring Detector.detect_prepared) so the
            # bucket fast path below sees the layout the graphs want —
            # otherwise a bucket-matched batch would fall to the
            # _chunks re-plan and warmup would never touch the big
            # buckets
            from mydetection_tpu.utils.image_ops import pack_s2d2

            canvases = pack_s2d2(np.asarray(canvases))
        packed = canvases.shape[-1] == 12
        if packed and not self.meta["pack_input"]:
            raise ValueError(
                "S2D-2 packed canvases staged against an artifact "
                "exported without pack_input — stage unpacked "
                "(B, S, S, 3) canvases (StreamingPipeline(pack_s2d2="
                "False)) or re-export from a Detector(pack_input=True)")
        size = canvases.shape[1] * (2 if packed else 1)
        if (size not in self.input_sizes
                or canvases.shape[1] != canvases.shape[2]):
            raise ValueError(
                f"canvases are letterboxed to {tuple(canvases.shape[1:3])} "
                f"but the artifact is baked at input_size(s) "
                f"{self.input_sizes} — re-letterbox or re-export")
        rotated = self.meta["rotated"]
        n = len(infos)
        # (layout is settled above: pack_input inputs are packed by
        # now, so bucket membership is the only live condition)
        if (size, canvases.shape[0]) in self._calls:
            # device fast path: the staged batch (real rows + the
            # pipeline's own padding) matches an exported bucket —
            # run it as-is, no host round-trip, strip the first n rows
            out = self._run(canvases, conf)
            return [strip_detections(out, i, infos[i], rotated=rotated)
                    for i in range(n)]
        canvases = np.asarray(canvases)  # device-resident input → host
        dets, start = [], 0
        for take, bsz in self._chunks(n):
            chunk = canvases[start:start + take]
            if len(chunk) < bsz:
                pad = np.repeat(chunk[-1:], bsz - len(chunk), axis=0)
                chunk = np.concatenate([chunk, pad], axis=0)
            c = (conf if np.ndim(conf) == 0
                 else np.asarray(conf)[start:start + take])
            out = self._run(chunk, c)
            dets += [strip_detections(out, i, infos[start + i],
                                      rotated=rotated)
                     for i in range(take)]
            start += take
        return dets


def load_exported(path: str) -> ExportedDetector:
    """Reload an `export_detector` artifact for serving."""
    from jax import export as jexport

    try:
        with np.load(path, allow_pickle=False) as z:
            flat = {k: z[k] for k in z.files}
    except Exception as e:  # not an npz at all (jpeg, pickle, garbage)
        raise ValueError(f"{path} is not a {_FORMAT} artifact: {e}") from e
    if "__meta__" not in flat:
        raise ValueError(f"{path} is not a {_FORMAT} artifact")
    meta = json.loads(bytes(flat.pop("__meta__")).decode("utf-8"))
    if meta.get("format") != _FORMAT:
        raise ValueError(f"{path} is not a {_FORMAT} artifact")
    if meta.get("version", 0) > _VERSION:
        raise ValueError(
            f"artifact version {meta['version']} is newer than this "
            f"library supports ({_VERSION}) — upgrade mydetection_tpu")
    def _bucket(key: str) -> tuple[int, int]:
        tail = key[len("__mlir__"):]
        if not tail:
            # the very first single-bucket format: one bare '__mlir__'
            # blob, batch and size only in meta
            return int(meta["input_size"]), int(meta["batch_size"])
        if "x" not in tail:
            # version-1 multi-batch artifact: keys were __mlir__<batch>
            # with the size only in meta
            return int(meta["input_size"]), int(tail)
        size, b = tail.split("x")
        return int(size), int(b)

    blobs = {_bucket(k): bytes(v) for k, v in flat.items()
             if k.startswith("__mlir__")}
    prefix = f"params{SEP}"
    # param leaves are stored by zero-padded flat index (jax tree order);
    # the exported fn takes them as a plain list — no tree structure or
    # model classes needed at serving time.
    params = [v for _, v in sorted((k, v) for k, v in flat.items()
                                   if k.startswith(prefix))]
    backend = jax.default_backend()
    # 'gpu' backend serves artifacts lowered for 'cuda' or 'rocm'
    compatible = {backend} | ({"cuda", "rocm"} if backend == "gpu" else set())
    if not compatible & set(meta["platforms"]):
        raise ValueError(
            f"artifact was lowered for {meta['platforms']} but this "
            f"process runs on '{backend}' — re-export on the serving "
            "platform (or export with platforms=(…))")
    calls = {b: jax.jit(jexport.deserialize(bytearray(blob)).call)
             for b, blob in blobs.items()}
    return ExportedDetector(meta=meta, params=jax.device_put(params),
                            _calls=calls)


def main() -> None:
    """CLI: `python -m mydetection_tpu.export --model yolov3 …`."""
    import argparse

    from mydetection_tpu import Detector

    ap = argparse.ArgumentParser(
        description="Serialize a detector's compiled pipeline to one "
                    "serving artifact (StableHLO + weights).")
    ap.add_argument("--model", required=True, help="registered model name")
    ap.add_argument("--out", required=True, help="output .mydet path")
    ap.add_argument("--weights", default=None,
                    help=".npz / .pt / .weights checkpoint (default: "
                         "random init — useful only for smoke tests)")
    ap.add_argument("--quantized", default=None, metavar="INT8_NPZ",
                    help="saved save_quantized() artifact to export the "
                         "int8 serving path instead of float")
    ap.add_argument("--batch-size", default="1",
                    help="batch bucket(s), comma-separated — e.g. 1,32 "
                         "for a latency bucket next to a throughput one")
    ap.add_argument("--input-size", default=None,
                    help="square input bucket(s), comma-separated — "
                         "e.g. 416,608 (default: model config)")
    ap.add_argument("--num-classes", type=int, default=None)
    ap.add_argument("--oracle-nms", action="store_true",
                    help="lower the pure-XLA NMS instead of the Pallas "
                         "kernel (no custom calls — fully portable)")
    ap.add_argument("--platforms", default=None,
                    help="comma-separated lowering targets, e.g. tpu,cpu "
                         "(default: current backend)")
    args = ap.parse_args()

    overrides = {}
    if args.num_classes is not None:
        overrides["num_classes"] = args.num_classes
    sizes = None
    if args.input_size is not None:
        sizes = [int(x) for x in str(args.input_size).split(",")]
        overrides["input_size"] = sizes[0]
    det = Detector(model_name=args.model, weights_path=args.weights,
                   quantized=args.quantized or False,
                   use_pallas=False if args.oracle_nms else None, **overrides)
    platforms = args.platforms.split(",") if args.platforms else None
    export_detector(det, args.out,
                    batch_size=[int(x) for x in
                                str(args.batch_size).split(",")],
                    input_size=sizes, platforms=platforms)
    meta = load_exported(args.out).meta
    print(json.dumps({"out": args.out, **{k: meta[k] for k in (
        "model", "input_sizes", "batch_sizes", "platforms", "quantized",
        "waived_custom_call_checks")}}))


if __name__ == "__main__":
    main()
