"""Per-layer int8 PTQ sensitivity sweep + recovery search (VERDICT r4 #1).

Round 4 measured (benchmarks/knob_accuracy.json) that int8 PTQ with
real-image abs-max calibration costs −0.212 AP on yolov3 and −0.345 on
retinanet on the trained offline proxy — but nothing localized WHERE
the loss comes from: the quantized region boundary was chosen for
speed, never searched for accuracy. This script answers that with
measurements:

  * the simulation: `quant._FakeQuantBE` / `quant_resnet._FakeQuantBE`
    walk the SAME region code as the real int8 path, fake-quantizing
    each requant point / conv weight behind a per-key TRACED 0/1 gate
    — one compiled graph serves every on/off pattern, so the whole
    sweep costs ONE compile per family (pinned against the real chain
    by tests/test_quant*.py, and at AP level by the `int8_sim_all` vs
    `int8_real` rows this script records);
  * activations-only vs weights-only decomposition;
  * one-group-ON  (only that group quantized)  → who creates error;
  * leave-one-group-OUT (all but that group)   → who, if excluded,
    recovers the most;
  * per-key refinement inside the guiltiest groups;
  * recovery: greedy exclusion of the worst keys until the simulated
    ΔAP clears the target (−0.05), reported as the float_keys set the
    serving path would need to keep in float.

Run on TPU: `python benchmarks/int8_sensitivity.py [--families ...]`
→ writes benchmarks/int8_sensitivity.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.knob_accuracy import (  # noqa: E402
    FAMS,
    make_dataset,
    train_family,
)

EVAL_CONF = 0.005
NMS_IOU = 0.45
TARGET_DAP = -0.05  # VERDICT r4 #1 "done" bar


# ---------------------------------------------------------------------------
# group mapping: activation keys AND weight-leaf paths → named group
# ---------------------------------------------------------------------------

def group_of_darknet(key: str) -> str:
    if key == "entry":
        return "entry"
    if key.startswith("stage"):
        return key.split("/")[0]
    for lvl in ("5", "4", "3"):
        if key.startswith((f"block{lvl}", f"head{lvl}", f"lateral{lvl}",
                           f"cat{lvl}")):
            return f"p{lvl}"
    raise KeyError(key)


def group_of_resnet(key: str) -> str:
    if key == "entry":
        return "entry"
    if key.startswith("stage"):
        return key.split("/")[0]
    if key.startswith(("fpn/", "lateral", "smooth", "p6", "p7")):
        return "fpn"
    if key.startswith(("cls_tower", "cls/")):
        return "cls_tower"
    if key.startswith(("box_tower", "box/")):
        return "box_tower"
    raise KeyError(key)


# ---------------------------------------------------------------------------
# simulation builders: family → (dense_fn(images, act_g, w_g), act_keys,
#                                w_keys)
# ---------------------------------------------------------------------------

def build_sim(family: str, cfg, params, calib_batches):
    import jax.numpy as jnp

    from mydetection_tpu import quant, quant_resnet
    from mydetection_tpu.registry import dense_from_raw

    if cfg.family in quant.QUANT_FAMILIES:  # darknet walker
        bt, ht = quant._fold_region(params)
        ranges = quant.calibrate(params, calib_batches,
                                 compute_dtype=jnp.float32, _folded=(bt, ht))
        scales = {k: jnp.float32(max(abs(lo), abs(hi)) / 127.0 + 1e-12)
                  for k, (lo, hi) in ranges.items()}
        wkeys: list[str] = []
        quant.blend_weight_tree(
            bt, lambda p: (wkeys.append(p), jnp.float32(0))[1])
        quant.blend_weight_tree(
            ht, lambda p: (wkeys.append(p), jnp.float32(0))[1])

        def dense_fn(images, act_g, w_g):
            btb = quant.blend_weight_tree(bt, lambda p: w_g[p])
            htb = quant.blend_weight_tree(ht, lambda p: w_g[p])
            be = quant._FakeQuantBE(jnp.float32, scales, act_g)
            y = quant._prologue(params["backbone"], images, jnp.float32)
            raw = quant._region(be, btb, htb, y)
            return dense_from_raw(raw, cfg, input_size=images.shape[1])

        return dense_fn, sorted(scales), sorted(set(wkeys)), group_of_darknet

    ft = quant_resnet._fold_only(params["backbone"])
    ff = quant_resnet._fold_fpn_float(params["fpn"])
    fh = quant_resnet._fold_head_float(params["head"], cfg.family)
    ranges = quant_resnet.calibrate(cfg, params, calib_batches,
                                    _folded=(ft, ff, fh))
    scales = {k: jnp.float32(max(abs(lo), abs(hi)) / 127.0 + 1e-12)
              for k, (lo, hi) in ranges.items()}
    wkeys = []
    for tree in (ft, ff, fh):
        quant.blend_weight_tree(
            tree, lambda p: (wkeys.append(p), jnp.float32(0))[1])

    def dense_fn(images, act_g, w_g):
        ftb = quant.blend_weight_tree(ft, lambda p: w_g[p])
        ffb = quant.blend_weight_tree(ff, lambda p: w_g[p])
        fhb = quant.blend_weight_tree(fh, lambda p: w_g[p])
        be = quant_resnet._FakeQuantBE(jnp.float32, scales, act_g)
        y = quant_resnet._prologue(params["backbone"], images, jnp.float32)
        raw = quant_resnet._region(be, ftb, ffb, fhb, y, cfg=cfg)
        return dense_from_raw(raw, cfg, input_size=images.shape[1])

    return dense_fn, sorted(scales), sorted(set(wkeys)), group_of_resnet


# ---------------------------------------------------------------------------
# evaluation plumbing (mirrors knob_accuracy's eval at identity geometry)
# ---------------------------------------------------------------------------

def make_eval(family: str, cfg, dense_fn, imgs, gt):
    import jax
    import jax.numpy as jnp

    from mydetection_tpu.api import make_post_one, strip_detections
    from mydetection_tpu.utils.image_ops import LetterboxInfo

    size = imgs[0].shape[0]
    images_dev = jnp.asarray(np.stack(imgs))
    post_one = make_post_one(cfg, use_pallas=jax.default_backend() == "tpu")
    info = LetterboxInfo(ori_w=size, ori_h=size, ratio=1.0,
                         pad_x=0.0, pad_y=0.0, input_size=size)

    @jax.jit
    def run(act_g, w_g):
        dense = dense_fn(images_dev, act_g, w_g)
        return jax.vmap(lambda d: post_one(d, jnp.float32(EVAL_CONF),
                                           NMS_IOU))(dense)

    if family == "rapid":
        from mydetection_tpu.eval.rotated_eval import evaluate_rotated

        def score(act_g, w_g):
            out = jax.device_get(run(act_g, w_g))
            rows = []
            for i in range(len(imgs)):
                d = strip_detections(out, i, info, rotated=True)
                for b, s in zip(d.boxes_rot, d.scores):
                    rows.append({"image_id": i,
                                 "bbox": [float(b[0]), float(b[1]),
                                          float(b[2]), float(b[3]),
                                          float(np.degrees(b[4]))],
                                 "score": float(s)})
            st = evaluate_rotated(rows, gt, verbose=False)
            return st["AP"]
    else:
        from mydetection_tpu.eval.cocoeval import COCOEvaluator

        evaluator = COCOEvaluator(gt)

        def score(act_g, w_g):
            out = jax.device_get(run(act_g, w_g))
            rows = []
            for i in range(len(imgs)):
                rows.extend(strip_detections(out, i, info,
                                             rotated=False).to_coco(i))
            st = evaluator.evaluate(rows, verbose=False)
            return st["AP"]

    return score


def gates(keys, on_fn):
    import jax.numpy as jnp

    return {k: jnp.float32(1.0 if on_fn(k) else 0.0) for k in keys}


# ---------------------------------------------------------------------------
# the sweep
# ---------------------------------------------------------------------------

def run_family(family: str, spec: dict) -> dict:
    import jax.numpy as jnp

    from mydetection_tpu import Detector
    from mydetection_tpu.registry import get_model

    t0 = time.time()
    imgs, train_arrays, gt = make_dataset(family, spec["size"], spec["nc"])
    params, losses = train_family(family, spec, train_arrays)
    model = get_model(family, input_size=spec["size"], num_classes=spec["nc"],
                      compute_dtype=jnp.float32)
    cfg = model.config
    calib = [np.stack(imgs[:16])]

    dense_fn, akeys, wkeys, group_of = build_sim(family, cfg, params, calib)
    groups = sorted({group_of(k) for k in akeys}
                    | {group_of(k) for k in wkeys})
    score = make_eval(family, cfg, dense_fn, imgs, gt)

    res: dict = {"spec": spec, "train": losses, "groups": groups,
                 "variants": {}}

    def measure(name, act_on, w_on):
        ap = score(gates(akeys, act_on), gates(wkeys, w_on))
        res["variants"][name] = round(ap, 4)
        print(f"#   {family}/{name}: AP {ap:.4f}", flush=True)
        return ap

    base = measure("float", lambda k: False, lambda k: False)
    allq = measure("int8_sim_all", lambda k: True, lambda k: True)
    res["dAP_all"] = round(allq - base, 4)

    # real-path cross-check (f32 epilogues, exact topk — isolates the
    # quantization itself; the AP-level fidelity gate for the sim)
    det_real = Detector(model_name=family, input_size=spec["size"],
                        num_classes=spec["nc"], params=params,
                        compute_dtype=jnp.float32, approx_topk=False,
                        quantized=True, calib_images=imgs[:16])
    from benchmarks.knob_accuracy import _eval_axis, _eval_rotated
    ev = _eval_rotated if family == "rapid" else _eval_axis
    real_ap = ev(det_real, imgs, gt, EVAL_CONF)["AP"]
    res["variants"]["int8_real"] = round(real_ap, 4)
    res["sim_vs_real"] = round(allq - real_ap, 4)
    print(f"#   {family}/int8_real: AP {real_ap:.4f} "
          f"(sim-real {allq - real_ap:+.4f})", flush=True)

    measure("acts_only", lambda k: True, lambda k: False)
    measure("weights_only", lambda k: False, lambda k: True)

    one_on, loo = {}, {}
    for g in groups:
        ap = measure(f"only[{g}]",
                     lambda k, g=g: group_of(k) == g,
                     lambda k, g=g: group_of(k) == g)
        one_on[g] = round(ap - base, 4)
        ap = measure(f"all_but[{g}]",
                     lambda k, g=g: group_of(k) != g,
                     lambda k, g=g: group_of(k) != g)
        loo[g] = round(ap - allq, 4)
    res["one_group_dAP"] = one_on
    res["leave_one_out_recovery"] = loo

    # per-key refinement in the guiltiest groups (worst one-on dAP)
    guilty = sorted(one_on, key=lambda g: one_on[g])[:2]
    per_key = {}
    for g in guilty:
        if one_on[g] > -0.01:
            continue
        for k in [k for k in akeys if group_of(k) == g]:
            ap = score(gates(akeys, lambda q, k=k: q == k),
                       gates(wkeys, lambda q: False))
            per_key[f"act:{k}"] = round(ap - base, 4)
        for k in [k for k in wkeys if group_of(k) == g]:
            ap = score(gates(akeys, lambda q: False),
                       gates(wkeys, lambda q, k=k: q == k))
            per_key[f"w:{k}"] = round(ap - base, 4)
    res["per_key_dAP"] = dict(sorted(per_key.items(),
                                     key=lambda kv: kv[1])[:40])
    for k, v in list(res["per_key_dAP"].items())[:12]:
        print(f"#   {family} per-key {k}: {v:+.4f}", flush=True)

    # greedy recovery: exclude worst keys (acts+weights together per
    # key prefix) until sim dAP clears the target
    excluded: set[str] = set()
    order = sorted(per_key.items(), key=lambda kv: kv[1])
    cur = allq
    steps = []
    for name, _ in order:
        if cur - base >= TARGET_DAP:
            break
        key = name.split(":", 1)[1]
        excluded.add(key)
        ap = score(gates(akeys, lambda q: not (q in excluded)),
                   gates(wkeys, lambda q: not (q in excluded)))
        steps.append({"excluded": sorted(excluded), "AP": round(ap, 4),
                      "dAP": round(ap - base, 4)})
        print(f"#   {family} exclude {sorted(excluded)} -> "
              f"dAP {ap - base:+.4f}", flush=True)
        cur = ap
    res["greedy_exclusion"] = steps
    res["recovered"] = bool(cur - base >= TARGET_DAP)
    res["secs"] = round(time.time() - t0, 1)
    return res


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default="yolov3,retinanet,fcos")
    args = ap.parse_args(argv)
    import jax

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "int8_sensitivity.json")
    results = {}
    if os.path.exists(path):
        with open(path) as fh:
            results = json.load(fh)
    results["backend"] = jax.default_backend()
    for family in args.families.split(","):
        family = family.strip()
        print(f"# sweeping {family} ...", flush=True)
        results[family] = run_family(family, FAMS[family])
        with open(path, "w") as fh:
            json.dump(results, fh, indent=2)
    print(f"# wrote {path}")


if __name__ == "__main__":
    main()
