"""Root-cause the retinanet-r50 0.38 px device-golden drift (VERDICT r4 #7).

benchmarks/device_checks.json shows the r50 golden reproducing on
device with max_matched_dbox = 0.3814 px while r101 / fcos — the SAME
FPN + head code — show ~0.000. Two hypotheses:

  (a) a real numeric divergence somewhere in the r50 pipeline
      (stem/stage eps, precision flag not honored, kernel bug);
  (b) tie-twin permutation: the golden scene is tie-degenerate (all
      100 retinanet golden detections share ONE score — see
      device_checks._match_golden), so CPU and TPU may keep DIFFERENT
      members of a sub-pixel twin pair; the matcher then pairs a kept
      twin with the other backend's other twin, and the 0.38 px is
      the twin spread, not arithmetic drift.

This script decides: it runs the SAME golden input through the CPU and
TPU pipelines stage by stage (stem+stages → FPN → head raw outputs →
dense decode → top-k candidates) and prints the max |Δ| per stage. If
every pre-NMS stage agrees to ~1e-5 relative while the final matched
boxes differ by 0.38 px, (b) is proven and the fix is documentation +
per-family tolerance, not code.

Run on TPU: python benchmarks/r50_drift_bisect.py
Appends one JSON line to benchmarks/r50_drift_bisect.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from benchmarks.device_checks import _golden_image  # noqa: E402

SIZE = 160
CONF = 0.005


def stages_fn(name: str):
    import jax.numpy as jnp

    from mydetection_tpu.models import fpn as fpn_mod
    from mydetection_tpu.models import resnet
    from mydetection_tpu.models import retinanet as ret
    from mydetection_tpu.registry import get_model

    model = get_model(name, input_size=SIZE, compute_dtype=jnp.float32)
    depth = 101 if name.endswith("101") else 50

    def run(params, images):
        x, fold = resnet.prepare_input(images, compute_dtype=jnp.float32,
                                       train=False)
        feats, _ = resnet.apply(params["backbone"], x, depth=depth,
                                train=False, compute_dtype=jnp.float32,
                                stem_fold_std=fold)
        pyr = fpn_mod.apply(params["fpn"], feats,
                            compute_dtype=jnp.float32)
        cls, box = ret.apply(params["head"], pyr,
                             num_classes=model.config.num_classes,
                             compute_dtype=jnp.float32)[:2]
        dense, _ = model.forward_dense(params, images)
        out = {}
        for i, f in enumerate(feats):
            out[f"backbone_c{i + 3}"] = f
        for i, p in enumerate(pyr):
            out[f"fpn_p{i + 3}"] = p
        out["head_cls"] = cls
        out["head_box"] = box
        out["dense_boxes"] = dense["boxes"]
        return out

    return model, run


def main():
    import jax
    import jax.numpy as jnp

    from mydetection_tpu.api import Detector
    from mydetection_tpu.utils.image_ops import letterbox_np

    if jax.default_backend() != "tpu":
        print("# TPU-only harness (needs both backends in one process)")
        return
    cpu = jax.devices("cpu")[0]
    res = {"backend": "tpu-vs-cpu", "size": SIZE}

    img = _golden_image()
    canvas, info = letterbox_np(img, SIZE)
    images = canvas[None]

    for name in ("retinanet", "retinanet_r101"):
        model, run = stages_fn(name)
        params = model.init(jax.random.PRNGKey(0))
        with jax.default_matmul_precision("highest"):
            dev = jax.jit(run)(params, jnp.asarray(images))
            dev = jax.device_get(dev)
            with jax.default_device(cpu):
                host = jax.jit(run)(jax.device_put(params, cpu),
                                    jax.device_put(images, cpu))
                host = jax.device_get(host)
        row = {}
        for k in dev:
            a, b = np.asarray(dev[k]), np.asarray(host[k])
            scale = np.max(np.abs(b)) + 1e-12
            row[k] = {"max_abs": float(np.max(np.abs(a - b))),
                      "max_rel": float(np.max(np.abs(a - b)) / scale)}
        res[name] = row
        print(f"# {name}:")
        for k, v in row.items():
            print(f"#   {k}: max_abs {v['max_abs']:.3e} "
                  f"rel {v['max_rel']:.3e}", flush=True)

        # final detections both backends, with score-tie diagnostics
        with jax.default_matmul_precision("highest"):
            det_t = Detector(model_name=name, input_size=SIZE,
                             compute_dtype=jnp.float32, use_pallas=True,
                             approx_topk=False, rng_seed=0)
            d_t = det_t.detect_one(np_img=img, conf_thres=CONF)
            with jax.default_device(cpu):
                det_c = Detector(model_name=name, input_size=SIZE,
                                 compute_dtype=jnp.float32,
                                 use_pallas=False,
                                 approx_topk=False, rng_seed=0)
                d_c = det_c.detect_one(np_img=img, conf_thres=CONF)
        ties_t = len(d_t.scores) - len(np.unique(np.round(d_t.scores, 6)))
        ties_c = len(d_c.scores) - len(np.unique(np.round(d_c.scores, 6)))
        same_rows = (len(d_t) == len(d_c)
                     and np.allclose(d_t.boxes_xyxy, d_c.boxes_xyxy,
                                     atol=1e-3))
        res[name + "_final"] = {
            "n_tpu": len(d_t), "n_cpu": len(d_c),
            "tied_scores_tpu": int(ties_t), "tied_scores_cpu": int(ties_c),
            "rowwise_equal_1e-3": bool(same_rows),
        }
        print(f"# {name} final: {res[name + '_final']}", flush=True)

    with open(os.path.join(HERE, "r50_drift_bisect.json"), "a") as fh:
        fh.write(json.dumps(res) + "\n")
    print("# wrote r50_drift_bisect.json")


if __name__ == "__main__":
    main()
