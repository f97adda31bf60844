"""Measured ΔAP of the accuracy-affecting serving knobs (VERDICT r3 #3).

The serving surface exposes three knobs whose accuracy cost had only
been *argued*: `approx_topk` (TPU PartialReduce pre-NMS select,
recall 0.95 — the registry default), bf16 conv compute (the TPU
default dtype), and int8 PTQ (`quant.py`, real-image vs noise
calibration). This script replaces the arguments with numbers the
environment can actually produce (no COCO, no pretrained checkpoints
— SURVEY.md §0): it overfit-trains each family on a ~48-image
synthetic set (the README §training recipe: N(0,0.01) focal heads,
burn-in SGD) so score distributions near the conf/pre-NMS tails are
realistic, then scores every knob combination with the committed
evaluators (eval/cocoeval.py, eval/rotated_eval.py) against the same
GT and reports AP deltas vs the exact-f32 device baseline.

Run on TPU: `python benchmarks/knob_accuracy.py [--families yolov3,...]`
→ writes benchmarks/knob_accuracy.json and prints a per-family table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_IMAGES = 48
MAX_GT = 4

# per-family recipe: training size == eval size (no letterbox rescale),
# small class count so 300-400 steps overfit cleanly
FAMS = {
    "yolov3": dict(size=256, nc=6, steps=400, lr=2e-3, burn_in=50),
    # steps raised r4: at 300 the focal families plateaued near AP
    # 0.37/0.82 and rapid at 0.29 — longer overfit gives the knob
    # deltas a stronger base to move against
    "retinanet": dict(size=256, nc=6, steps=700, lr=1e-3, burn_in=50),
    "fcos": dict(size=256, nc=6, steps=600, lr=1e-3, burn_in=50),
    "rapid": dict(size=256, nc=1, steps=800, lr=2e-3, burn_in=50),
}

# distinct, well-separated class colors (class identity must be
# learnable from appearance)
_COLORS = np.asarray([
    (230, 60, 60), (60, 200, 80), (70, 90, 230),
    (240, 200, 50), (200, 70, 220), (60, 210, 210),
], np.uint8)


def _draw_axis(img, cx, cy, w, h, color):
    x1 = max(int(round(cx - w / 2)), 0)
    y1 = max(int(round(cy - h / 2)), 0)
    x2 = min(int(round(cx + w / 2)), img.shape[1])
    y2 = min(int(round(cy + h / 2)), img.shape[0])
    img[y1:y2, x1:x2] = color


def _draw_rotated(img, cx, cy, w, h, theta, color):
    """Fill a rotated rectangle via a per-pixel inclusion mask."""
    size = img.shape[0]
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    dx, dy = xx - cx, yy - cy
    c, s = np.cos(theta), np.sin(theta)
    u = dx * c + dy * s       # along-w axis
    v = -dx * s + dy * c      # along-h axis
    mask = (np.abs(u) <= w / 2) & (np.abs(v) <= h / 2)
    img[mask] = color


def make_dataset(family: str, size: int, nc: int, seed: int = 0):
    """Synthetic learnable detection set: noise background + solid
    class-colored rectangles (rotated for rapid). Returns
    (images, train_arrays, gt_for_eval)."""
    rng = np.random.RandomState(seed)
    rotated = family == "rapid"
    dim = 5 if rotated else 4
    imgs, boxes_all, classes_all, valid_all = [], [], [], []
    coco_images, coco_anns = [], []
    ann_id = 0
    for i in range(N_IMAGES):
        img = rng.randint(0, 60, (size, size, 3)).astype(np.uint8)
        n = int(rng.randint(1, MAX_GT + 1))
        gtb = np.zeros((MAX_GT, dim), np.float32)
        gtc = np.zeros((MAX_GT,), np.int32)
        gtv = np.zeros((MAX_GT,), bool)
        for j in range(n):
            w = float(rng.uniform(24, size * 0.45))
            h = float(rng.uniform(24, size * 0.45))
            cx = float(rng.uniform(w / 2, size - w / 2))
            cy = float(rng.uniform(h / 2, size - h / 2))
            cls = int(rng.randint(nc))
            color = _COLORS[cls]
            if rotated:
                th = float(rng.uniform(-np.pi / 2 + 0.05, np.pi / 2))
                _draw_rotated(img, cx, cy, w, h, th, color)
                gtb[j] = (cx, cy, w, h, th)
                bbox = [cx, cy, w, h, float(np.degrees(th))]
            else:
                _draw_axis(img, cx, cy, w, h, color)
                gtb[j] = (cx, cy, w, h)
                bbox = [cx - w / 2, cy - h / 2, w, h]
            gtc[j] = cls
            gtv[j] = True
            coco_anns.append({"id": ann_id, "image_id": i,
                              "category_id": cls, "bbox": bbox,
                              "area": w * h, "iscrowd": 0})
            ann_id += 1
        imgs.append(img)
        boxes_all.append(gtb)
        classes_all.append(gtc)
        valid_all.append(gtv)
        coco_images.append({"id": i, "file_name": str(i), "width": size,
                            "height": size})
    gt = {"images": coco_images, "annotations": coco_anns,
          "categories": [{"id": c, "name": str(c)} for c in range(nc)]}
    train = (np.stack(imgs), np.stack(boxes_all), np.stack(classes_all),
             np.stack(valid_all))
    return imgs, train, gt


def train_family(family: str, spec: dict, train_arrays, verbose=True):
    """Overfit the family on the synthetic set; returns (params, losses)."""
    import jax
    import jax.numpy as jnp

    from mydetection_tpu.registry import get_model
    from mydetection_tpu.training import burn_in_lr, make_train_step, sgd_init

    images, gtb, gtc, gtv = (jnp.asarray(a) for a in train_arrays)
    model = get_model(family, input_size=spec["size"],
                      num_classes=spec["nc"])
    params = model.init(jax.random.PRNGKey(0))
    vel = sgd_init(params)
    step = make_train_step(model, input_size=spec["size"])
    first = last = None
    for it in range(spec["steps"]):
        lr = burn_in_lr(it, base_lr=spec["lr"], burn_in=spec["burn_in"])
        params, vel, m = step(params, vel, images, gtb, gtc, gtv, lr)
        if it == 0:
            first = float(m["total"])
        if verbose and it % 100 == 0:
            print(f"#   {family} step {it}: loss {float(m['total']):.3f}",
                  flush=True)
    last = float(m["total"])
    assert np.isfinite(last), (family, last)
    return params, {"loss_first": first, "loss_last": last}


def _eval_axis(det, imgs, gt, conf):
    from mydetection_tpu.eval.cocoeval import COCOEvaluator

    rows = []
    for i, d in enumerate(det.detect_batch(imgs, conf_thres=conf,
                                           nms_iou=0.45)):
        rows.extend(d.to_coco(i))
    stats = COCOEvaluator(gt).evaluate(rows, verbose=False)
    return {"AP": stats["AP"], "AP50": stats["AP50"], "AP75": stats["AP75"],
            "n_dets": len(rows)}


def _eval_rotated(det, imgs, gt, conf):
    from mydetection_tpu.eval.rotated_eval import evaluate_rotated

    rows = []
    for i, d in enumerate(det.detect_batch(imgs, conf_thres=conf,
                                           nms_iou=0.45)):
        if d.boxes_rot is None:
            continue
        for b, s in zip(d.boxes_rot, d.scores):
            rows.append({"image_id": i,
                         "bbox": [float(b[0]), float(b[1]), float(b[2]),
                                  float(b[3]), float(np.degrees(b[4]))],
                         "score": float(s)})
    stats = evaluate_rotated(rows, gt, verbose=False)
    return {"AP": stats["AP"], "AP50": stats["AP50"], "AP75": stats["AP75"],
            "n_dets": len(rows)}


def run_family(family: str, spec: dict, *, eval_conf: float = 0.005,
               only_variants=None, merge_into=None) -> dict:
    import jax.numpy as jnp

    from mydetection_tpu import Detector

    t0 = time.time()
    imgs, train_arrays, gt = make_dataset(family, spec["size"], spec["nc"])
    params, losses = train_family(family, spec, train_arrays)
    ev = _eval_rotated if family == "rapid" else _eval_axis

    common = dict(model_name=family, input_size=spec["size"],
                  num_classes=spec["nc"], use_pallas=True, params=params)
    variants = {
        # exact-f32 device baseline
        "base_f32_exact": dict(compute_dtype=jnp.float32, approx_topk=False),
        # one knob at a time
        "approx_topk": dict(compute_dtype=jnp.float32, approx_topk=True),
        "bf16": dict(compute_dtype=jnp.bfloat16, approx_topk=False),
        # the actual TPU serving default (both on)
        "serving_default": dict(compute_dtype=jnp.bfloat16, approx_topk=True),
        # int8 PTQ at exact topk so the delta isolates quantization;
        # real-image calibration vs the noise fallback
        "int8_calib_real": dict(approx_topk=False, quantized=True,
                                calib_images=imgs[:16]),
        "int8_calib_noise": dict(approx_topk=False, quantized=True,
                                 calib_images=None),
        # NOTE: a serve-at-larger-size variant was tried here and
        # RETRACTED: these proxies overfit at ONE size with no
        # multi-scale augmentation, so evaluating at 1.5x size
        # measures the proxy's scale brittleness (dAP -0.85!), not
        # the serve.py --coalesce-sizes policy. The policy's honest
        # offline measurement trains a MULTI-SCALE proxy first —
        # benchmarks/size_policy_accuracy.py.
    }
    out = {"spec": {k: v for k, v in spec.items()}, "train": losses,
           "eval_conf": eval_conf, "variants": {}}
    if merge_into:  # partial rerun: keep prior variants not re-measured
        out["variants"].update(merge_into.get("variants", {}))
    base_ap = out["variants"].get("base_f32_exact", {}).get("AP")
    for vname, kw in variants.items():
        if (only_variants is not None and vname not in only_variants
                and vname != "base_f32_exact"):
            continue
        if (only_variants is not None and vname == "base_f32_exact"
                and base_ap is not None):
            continue  # deterministic retrain reproduces the base
        try:
            det = Detector(**{**common, **kw})
            stats = ev(det, imgs, gt, eval_conf)
        except Exception as e:
            out["variants"][vname] = {"error": repr(e)}
            print(f"#   {family}/{vname}: ERROR {e!r}", flush=True)
            continue
        if vname == "base_f32_exact":
            base_ap = stats["AP"]
        stats["dAP_vs_base"] = (None if base_ap is None
                                else round(stats["AP"] - base_ap, 4))
        out["variants"][vname] = stats
        print(f"#   {family}/{vname}: AP {stats['AP']:.4f} "
              f"(dAP {stats['dAP_vs_base']})", flush=True)
    out["secs"] = round(time.time() - t0, 1)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default=",".join(FAMS))
    ap.add_argument("--eval-conf", type=float, default=0.005)
    ap.add_argument("--variants", default=None,
                    help="comma-separated variant subset to (re)measure "
                         "(training still reruns — it is deterministic); "
                         "others keep their prior recorded values")
    args = ap.parse_args(argv)
    only = (None if args.variants is None
            else set(args.variants.split(",")))
    import jax

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "knob_accuracy.json")
    results = {}
    if os.path.exists(path):  # partial runs merge, not clobber
        with open(path) as fh:
            results = json.load(fh)
    results["backend"] = jax.default_backend()
    for family in args.families.split(","):
        family = family.strip()
        print(f"# training + evaluating {family} ...", flush=True)
        results[family] = run_family(family, FAMS[family],
                                     eval_conf=args.eval_conf,
                                     only_variants=only,
                                     merge_into=results.get(family))
        # write after EVERY family: a transport fault mid-run must not
        # lose the completed measurements (it did once, round 5)
        with open(path, "w") as fh:
            json.dump(results, fh, indent=2)
    print(json.dumps(results, indent=2))
    print(f"# wrote {path}")


if __name__ == "__main__":
    main()
