"""Device-side numerics validation: the SURVEY.md §4.2 second leg.

The test suite asserts every Pallas kernel equals its pure-jax oracle —
but under `interpret=True` on the CPU backend (tests/conftest.py forces
it), so a Mosaic *lowering* bug in either NMS kernel, the S2D weight
folds, or the f32 device pipeline would corrupt every TPU detection
while all tests stay green. This script closes that hole by re-running
the same equalities COMPILED ON THE DEVICE:

  (a) axis NMS: `nms_pallas` vs the `batched_class_nms` oracle at the
      exact production divergence point (`ops/nms._nms_and_select`) on
      ~1k random score-sorted padded candidate sets — several
      iou_thres values; degenerate (zero-area/point), duplicate
      (IoU=1), and coarsely-tied-score boxes included; vmapped over
      sets exactly like the production per-image vmap.
  (b) rotated NMS: `nms_from_iou_pallas` vs the lax suppress loop on
      the same device-computed Liang–Barsky IoU matrices
      (`ops/rotated.rotated_nms_padded_impl` use_pallas=True/False).
  (c) e2e goldens: the four committed CPU goldens
      (tests/golden/*_e2e.npz) recomputed through the DEVICE pipeline —
      Pallas on, approx_topk=False, f32 compute under
      `jax.default_matmul_precision('highest')` so MXU bf16-pass
      rounding doesn't mask a real lowering bug behind loose
      tolerances. Covers letterbox→normalize→backbone (S2D folds)→
      decode→top-k→Pallas NMS end-to-end.
  (d) knob deltas: approx_topk on/off and bf16 vs f32 final-detection
      deltas per family, RECORDED (not asserted) — the data behind the
      serving-knob defaults.

Standalone: `python benchmarks/device_checks.py` on hardware writes
benchmarks/device_checks.json. bench.py runs a budget-guarded subset
(`run(quick=True)`) so every BENCH_r*.json carries a numerics_ok line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------- helpers

def _candidate_sets(n_sets: int, k: int, seed: int, span: float = 416.0):
    """Score-sorted padded candidate sets shaped like production NMS
    input: (S, K, 4) xyxy f32, (S, K) desc-sorted scores with NEG_INF
    padding tails, (S, K) int32 classes. Deliberately adversarial:
    ~10% zero-area/point boxes, ~10% exact duplicates (IoU=1), scores
    coarsely quantized in half the sets (exact ties), variable valid
    counts (including tiny and full)."""
    from mydetection_tpu.ops.nms import NEG_INF

    rng = np.random.RandomState(seed)
    cxy = rng.uniform(0, span, (n_sets, k, 2)).astype(np.float32)
    wh = rng.uniform(0, span / 3, (n_sets, k, 2)).astype(np.float32)
    boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1)
    # degenerate: zero-area (x2==x1) and point boxes
    degen = rng.rand(n_sets, k) < 0.10
    boxes[degen, 2] = boxes[degen, 0]
    hits = np.argwhere(degen)
    half = hits[: len(hits) // 2]
    boxes[half[:, 0], half[:, 1], 3] = boxes[half[:, 0], half[:, 1], 1]
    # duplicates: copy a random earlier box (IoU exactly 1 with it)
    dup = rng.rand(n_sets, k) < 0.10
    src = rng.randint(0, k, (n_sets, k))
    for s in range(n_sets):
        rows = np.where(dup[s])[0]
        boxes[s, rows] = boxes[s, src[s, rows]]
    scores = rng.uniform(0.01, 1.0, (n_sets, k)).astype(np.float32)
    # exact score ties in half the sets (16-level quantization)
    tied = np.arange(n_sets) % 2 == 0
    scores[tied] = np.round(scores[tied] * 16) / 16
    scores = -np.sort(-scores, axis=1)
    # padding tails: valid counts from tiny to full
    nvalid = rng.randint(1, k + 1, n_sets)
    pad = np.arange(k)[None, :] >= nvalid[:, None]
    scores[pad] = NEG_INF
    classes = rng.randint(0, 80, (n_sets, k)).astype(np.int32)
    return boxes, scores, classes


def check_axis_nms(n_sets: int = 1024, k: int = 512, chunk: int = 64,
                   iou_thres_list=(0.3, 0.45, 0.6), seed: int = 0) -> dict:
    """Pallas axis NMS vs pure-jax oracle, both compiled on the default
    backend, at the production divergence point (class-offset trick on
    the Pallas side, batched_class_nms on the oracle side)."""
    import jax
    import jax.numpy as jnp

    from mydetection_tpu.ops.nms import CLASS_OFFSET, batched_class_nms_impl
    from mydetection_tpu.ops.pallas.nms_kernel import nms_pallas_impl

    boxes, scores, classes = _candidate_sets(n_sets, k, seed)
    out = {"n_sets": n_sets, "k": k, "iou_thres": list(iou_thres_list),
           "mismatched_sets": 0, "mismatched_rows": 0, "total_rows": 0}
    for iou_thres in iou_thres_list:
        def pallas_path(b, s, c):
            off = b + (c.astype(b.dtype) * CLASS_OFFSET)[:, None]
            return nms_pallas_impl(off, s, iou_thres=iou_thres)

        def oracle_path(b, s, c):
            return batched_class_nms_impl(b, s, c, iou_thres=iou_thres)

        jp = jax.jit(jax.vmap(pallas_path))
        jo = jax.jit(jax.vmap(oracle_path))
        for lo in range(0, n_sets, chunk):
            hi = min(lo + chunk, n_sets)
            b = jnp.asarray(boxes[lo:hi])
            s = jnp.asarray(scores[lo:hi])
            c = jnp.asarray(classes[lo:hi])
            kp = np.asarray(jp(b, s, c))
            ko = np.asarray(jo(b, s, c))
            neq = kp != ko
            out["total_rows"] += int(neq.size)
            out["mismatched_rows"] += int(neq.sum())
            out["mismatched_sets"] += int(neq.any(axis=1).sum())
    out["ok"] = out["mismatched_rows"] == 0
    return out


def check_rotated_nms(n_sets: int = 512, k: int = 256, chunk: int = 64,
                      iou_thres_list=(0.3, 0.45, 0.6), seed: int = 1) -> dict:
    """Pallas rotated suppress kernel vs the lax loop on identical
    device-computed Liang–Barsky IoU matrices (the production
    divergence point inside rotated_nms_padded_impl)."""
    import jax
    import jax.numpy as jnp

    from mydetection_tpu.ops.nms import NEG_INF
    from mydetection_tpu.ops.rotated import rotated_nms_padded_impl

    rng = np.random.RandomState(seed)
    cxy = rng.uniform(0, 1024, (n_sets, k, 2)).astype(np.float32)
    wh = rng.uniform(4, 300, (n_sets, k, 2)).astype(np.float32)
    th = rng.uniform(-np.pi / 2, np.pi / 2, (n_sets, k, 1)).astype(np.float32)
    boxes = np.concatenate([cxy, wh, th], -1)
    # duplicates (IoU exactly 1) + axis-aligned thetas (boundary cases)
    dup = rng.rand(n_sets, k) < 0.10
    src = rng.randint(0, k, (n_sets, k))
    for s in range(n_sets):
        rows = np.where(dup[s])[0]
        boxes[s, rows] = boxes[s, src[s, rows]]
    axis = rng.rand(n_sets, k) < 0.10
    boxes[axis, 4] = 0.0
    scores = -np.sort(-rng.uniform(0.01, 1.0, (n_sets, k)).astype(np.float32),
                      axis=1)
    nvalid = rng.randint(1, k + 1, n_sets)
    scores[np.arange(k)[None, :] >= nvalid[:, None]] = NEG_INF

    out = {"n_sets": n_sets, "k": k, "iou_thres": list(iou_thres_list),
           "mismatched_sets": 0, "mismatched_rows": 0, "total_rows": 0}
    for iou_thres in iou_thres_list:
        jp = jax.jit(jax.vmap(lambda b, s: rotated_nms_padded_impl(
            b, s, iou_thres=iou_thres, use_pallas=True)))
        jo = jax.jit(jax.vmap(lambda b, s: rotated_nms_padded_impl(
            b, s, iou_thres=iou_thres, use_pallas=False)))
        for lo in range(0, n_sets, chunk):
            hi = min(lo + chunk, n_sets)
            b = jnp.asarray(boxes[lo:hi])
            s = jnp.asarray(scores[lo:hi])
            kp = np.asarray(jp(b, s))
            ko = np.asarray(jo(b, s))
            neq = kp != ko
            out["total_rows"] += int(neq.size)
            out["mismatched_rows"] += int(neq.sum())
            out["mismatched_sets"] += int(neq.any(axis=1).sum())
    out["ok"] = out["mismatched_rows"] == 0
    return out


# ---------------------------------------------------------------- goldens

_GOLDEN_SPECS = (
    # (family, size, conf, box_tol_px) — must mirror
    # tests/test_golden_e2e.py. Per-family box tolerances (VERDICT r4
    # #7): families measured at ~0.00-0.04 px device-vs-CPU get a
    # 0.1 px gate; retinanet keeps 2.0 px because its golden scene is
    # maximally tie-degenerate — benchmarks/r50_drift_bisect.json
    # shows every pre-NMS stage agreeing to <=4.8e-6 RELATIVE while
    # 99 of its 100 final detections share ONE tied score, so CPU and
    # TPU top-k/NMS legitimately keep different sub-pixel twins (the
    # r4 0.38 px reading was twin spread, not arithmetic drift; r101
    # runs the same FPN/head code and its ties happen to resolve
    # identically).
    ("yolov3", 416, 0.25, 0.1),
    ("retinanet", 160, 0.005, 2.0),
    ("retinanet_r101", 160, 0.005, 0.1),
    ("fcos", 160, 0.005, 0.1),
    ("rapid", 128, 0.25, 0.1),
)


def _golden_image() -> np.ndarray:
    """Same deterministic image as tests/test_golden_e2e.golden_image
    (duplicated: benchmarks must not import from tests/, whose conftest
    forces the CPU backend)."""
    h, w = 300, 400
    y = np.arange(h)[:, None]
    x = np.arange(w)[None, :]
    r = (x * 255 // w).astype(np.uint8)
    g = (y * 255 // h).astype(np.uint8)
    b = ((x + y) % 256).astype(np.uint8)
    img = np.stack([r + 0 * y, 0 * x + g, b], -1).astype(np.uint8)
    img[60:180, 50:150] = (220, 40, 40)
    img[100:250, 220:360] = (40, 200, 80)
    return img


def _match_golden(dev_boxes, dev_scores, dev_classes,
                  ref_boxes, ref_scores, ref_classes, *,
                  score_tol: float = 1e-3, box_tol: float = 2.0) -> dict:
    """Tie-aware device-vs-golden diff: greedy one-to-one matching.

    The random-init golden scenes are tie-degenerate: uniform image
    regions (solid rectangles, letterbox padding) produce bit-identical
    features at many anchor positions, so hundreds of candidates carry
    EXACTLY the same score and which of them survive top-k + NMS is
    backend-tie-order-dependent (measured on v5e: all 100 retinanet
    golden detections share one score; CPU and TPU keep permuted
    sub-pixel twins). A row-by-row diff misreads that permutation as
    corruption. Instead, each device detection must match a distinct
    golden row with the same class, |Δscore| ≤ 1e-3, and box within
    2px + 1e-5 rel (covers tie-twin spread and the ~1e-6-relative
    CPU-libm-vs-TPU transcendental drift on degenerate exp-decoded
    boxes). Real corruption — shifted boxes, wrong scores/classes/
    counts — cannot produce a perfect matching."""
    n = len(dev_scores)
    if n == 0 and len(ref_scores) == 0:
        return {"ok": True, "max_matched_dbox": 0.0, "unmatched": 0}
    if n == 0 or len(ref_scores) == 0:
        return {"ok": False, "max_matched_dbox": 0.0,
                "unmatched": max(n, len(ref_scores))}
    ref_used = np.zeros(len(ref_scores), bool)
    max_dbox, unmatched = 0.0, 0
    for i in range(n):
        db = np.max(np.abs(ref_boxes - dev_boxes[i][None, :])
                    - 1e-5 * np.abs(ref_boxes), axis=1)
        cand = ((~ref_used)
                & (ref_classes == dev_classes[i])
                & (np.abs(ref_scores - dev_scores[i]) <= score_tol)
                & (db <= box_tol))
        if not cand.any():
            unmatched += 1
            continue
        j = int(np.argmin(np.where(cand, db, np.inf)))
        ref_used[j] = True
        max_dbox = max(max_dbox, float(db[j]))
    return {"ok": unmatched == 0,
            "max_matched_dbox": round(max_dbox, 4),
            "unmatched": int(unmatched)}


def check_goldens(families=None) -> dict:
    """Recompute the committed CPU goldens through the DEVICE pipeline:
    Pallas NMS on, approx_topk off, f32 compute at HIGHEST matmul
    precision (so MXU bf16-pass rounding can't mask a lowering bug).
    Pass = tie-aware set equality (`_match_golden`): same count, and a
    perfect class/score/box matching between device and golden rows."""
    import jax
    import jax.numpy as jnp

    from mydetection_tpu import Detector

    golden_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden")
    img = _golden_image()
    results = {}
    for name, size, conf, box_tol in _GOLDEN_SPECS:
        if families is not None and name not in families:
            continue
        path = os.path.join(golden_dir, f"{name}_e2e.npz")
        if not os.path.exists(path):
            results[name] = {"ok": False, "error": "golden file missing"}
            continue
        ref = np.load(path)
        t0 = time.time()
        try:
            with jax.default_matmul_precision("highest"):
                det = Detector(model_name=name, input_size=size,
                               compute_dtype=jnp.float32, use_pallas=True,
                               approx_topk=False, rng_seed=0)
                d = det.detect_one(np_img=img, conf_thres=conf, nms_iou=0.45)
        except Exception as e:  # record, don't abort the other families
            results[name] = {"ok": False, "error": repr(e)}
            continue
        row = {"n_ref": int(len(ref["scores"])), "n_dev": int(len(d)),
               "secs": round(time.time() - t0, 1)}
        if len(d) == len(ref["scores"]):
            rot = "boxes_rot" in ref.files and d.boxes_rot is not None
            dev_boxes = d.boxes_rot if rot else d.boxes_xyxy
            ref_boxes = ref["boxes_rot"] if rot else ref["boxes"]
            row.update(_match_golden(dev_boxes, d.scores, d.classes,
                                     ref_boxes, ref["scores"],
                                     ref["classes"], box_tol=box_tol))
        else:
            row["ok"] = False
        results[name] = row
    results["ok"] = all(v.get("ok") for v in results.values()
                        if isinstance(v, dict))
    return results


def check_knob_deltas(families=None) -> dict:
    """Final-detection deltas of the serving knobs vs the exact-f32
    device baseline, per family: approx_topk on/off and bf16 vs f32.
    Recorded, not asserted — ΔAP on trained weights lives in
    benchmarks/knob_accuracy.py; this is the raw per-image delta on the
    golden scene at serving settings."""
    import jax.numpy as jnp

    from mydetection_tpu import Detector

    img = _golden_image()
    results = {}
    for name, size, conf, box_tol in _GOLDEN_SPECS:
        if families is not None and name not in families:
            continue
        if name == "retinanet_r101":
            continue  # knob behavior identical to retinanet (same head/
            # decode/postprocess); skip the 3 extra backbone compiles
        try:
            base = Detector(model_name=name, input_size=size,
                            compute_dtype=jnp.float32, use_pallas=True,
                            approx_topk=False, rng_seed=0).detect_one(
                np_img=img, conf_thres=conf, nms_iou=0.45)
            row = {}
            for knob, kw in (("approx_topk", dict(compute_dtype=jnp.float32,
                                                  approx_topk=True)),
                             ("bf16", dict(compute_dtype=jnp.bfloat16,
                                           approx_topk=False))):
                d = Detector(model_name=name, input_size=size,
                             use_pallas=True, rng_seed=0, **kw).detect_one(
                    np_img=img, conf_thres=conf, nms_iou=0.45)
                n = min(len(d), len(base))
                row[knob] = {
                    "dcount": int(len(d) - len(base)),
                    "max_abs_dscore": float(np.max(np.abs(
                        d.scores[:n] - base.scores[:n])) if n else 0.0),
                    # tie-aware set match vs the exact baseline (see
                    # _match_golden) — row-order diffs on the tied
                    # random-init scenes are meaningless
                    "set_match": _match_golden(
                        d.boxes_xyxy, d.scores, d.classes,
                        base.boxes_xyxy, base.scores, base.classes,
                        score_tol=0.05, box_tol=5.0),
                }
            results[name] = row
        except Exception as e:
            results[name] = {"error": repr(e)}
    return results


# ---------------------------------------------------------------- driver

def run(quick: bool = False) -> dict:
    """Full (standalone) or quick (bench.py budget slice) validation.
    Quick keeps compiles to the two kernel paths + the two families
    that exercise both kernels end-to-end (yolov3 axis / rapid rotated)."""
    import jax

    backend = jax.default_backend()
    out = {"backend": backend, "quick": bool(quick),
           "jax": jax.__version__}
    t0 = time.time()
    if quick:
        out["axis_nms"] = check_axis_nms(n_sets=192, k=512, chunk=64,
                                         iou_thres_list=(0.45,))
        out["rotated_nms"] = check_rotated_nms(n_sets=128, k=256, chunk=64,
                                               iou_thres_list=(0.45,))
        out["goldens"] = check_goldens(families=("yolov3", "rapid"))
    else:
        out["axis_nms"] = check_axis_nms()
        out["rotated_nms"] = check_rotated_nms()
        out["goldens"] = check_goldens()
        out["knob_deltas"] = check_knob_deltas()
    out["ok"] = (out["axis_nms"]["ok"] and out["rotated_nms"]["ok"]
                 and out["goldens"]["ok"])
    out["secs"] = round(time.time() - t0, 1)
    return out


if __name__ == "__main__":
    quick = "--quick" in sys.argv
    res = run(quick=quick)
    print(json.dumps(res, indent=2))
    if not quick:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "device_checks.json")
        with open(path, "w") as fh:
            json.dump(res, fh, indent=2)
        print(f"# wrote {path}")
    sys.exit(0 if res["ok"] else 1)
