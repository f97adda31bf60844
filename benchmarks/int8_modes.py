"""Activation-quantization MODE sweep: symmetric per-tensor (the
current scheme) vs asymmetric and/or per-channel (VERDICT r4 #1,
stage 2 — after int8_sensitivity.py localized WHERE the loss lives).

The sensitivity sweep measured: activations dominate weights in every
family; retinanet/fcos loss concentrates at entry+stage0 where
post-ReLU activations are non-negative (symmetric int8 wastes the
sign bit — effective 7-bit), and yolov3's is spread through the
leaky chain (negative lobe is 10x smaller than the positive — nearly
a bit wasted too). The candidate fixes, simulated here on the SAME
trained proxies with the real calibration stats:

  sym      per-tensor symmetric (the shipping scheme, post-cbl_out)
  asym     per-tensor affine (zero-point; pad-with-z realizable in
           the int8 conv via constant-padding the input with z)
  sym_ch   per-CHANNEL symmetric (scales fold into the next conv's
           weights — zero runtime cost; requant divides by a (C,)
           vector instead of a scalar)
  asym_ch  per-channel affine (realizable but messier — per-channel
           zero-points can't ride the pad trick)

Weights stay per-out-channel symmetric everywhere (the weights-only
cost measured -0.03 AP worst). Whichever mode wins — and clears
dAP >= -0.05 — gets implemented in the real int8 path.

Run on TPU: python benchmarks/int8_modes.py [--families ...]
Writes benchmarks/int8_modes.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.int8_sensitivity import make_eval  # noqa: E402
from benchmarks.knob_accuracy import (  # noqa: E402
    FAMS,
    make_dataset,
    train_family,
)

EPS = 1e-12


def _stat_of(y):
    import jax.numpy as jnp

    yf = y.astype(jnp.float32)
    flat = yf.reshape(-1, yf.shape[-1])
    return {"amax": jnp.max(jnp.abs(flat)),
            "min": jnp.min(flat), "max": jnp.max(flat),
            "ch_amax": jnp.max(jnp.abs(flat), axis=0),
            "ch_min": jnp.min(flat, axis=0),
            "ch_max": jnp.max(flat, axis=0)}


def _merge(agg, new):
    out = {}
    for k, st in new.items():
        if k not in agg:
            out[k] = st
            continue
        a = agg[k]
        out[k] = {"amax": max(a["amax"], st["amax"]),
                  "min": min(a["min"], st["min"]),
                  "max": max(a["max"], st["max"]),
                  "ch_amax": np.maximum(a["ch_amax"], st["ch_amax"]),
                  "ch_min": np.minimum(a["ch_min"], st["ch_min"]),
                  "ch_max": np.maximum(a["ch_max"], st["ch_max"])}
    return out


def _fq_mode(y, st, mode):
    import jax.numpy as jnp

    yf = y.astype(jnp.float32)
    if mode == "float":
        return y
    if mode == "sym":
        s = st["amax"] / 127.0 + EPS
        q = jnp.clip(jnp.round(yf / s), -127, 127) * s
    elif mode == "sym_ch":
        s = st["ch_amax"] / 127.0 + EPS
        q = jnp.clip(jnp.round(yf / s), -127, 127) * s
    elif mode == "asym":
        s = (st["max"] - st["min"]) / 255.0 + EPS
        z = jnp.round(-st["min"] / s)
        q = (jnp.clip(jnp.round(yf / s) + z, 0, 255) - z) * s
    elif mode == "asym_ch":
        s = (st["ch_max"] - st["ch_min"]) / 255.0 + EPS
        z = jnp.round(-st["ch_min"] / s)
        q = (jnp.clip(jnp.round(yf / s) + z, 0, 255) - z) * s
    else:
        raise ValueError(mode)
    return q.astype(y.dtype)


def build_mode_sim(family: str, cfg, params, calib_batches):
    """→ (dense_fn_factory(mode) , stats dict). Stats collected with
    the SAME region walk the real calibration uses."""
    import jax
    import jax.numpy as jnp

    from mydetection_tpu import quant, quant_resnet
    from mydetection_tpu.registry import dense_from_raw

    darknet = cfg.family in quant.QUANT_FAMILIES

    if darknet:
        bt, ht = quant._fold_region(params)

        class _StatsBE(quant._CalibBE):
            def __init__(self):
                super().__init__(jnp.float32)
                self.stats = {}

            def _rec(self, key, y):
                self.stats[key] = _stat_of(y)
                return y

        @jax.jit
        def stats_one(x):
            be = _StatsBE()
            y = quant._prologue(params["backbone"], x, jnp.float32)
            quant._region(be, bt, ht, y)
            return be.stats

    else:
        ft = quant_resnet._fold_only(params["backbone"])
        ff = quant_resnet._fold_fpn_float(params["fpn"])
        fh = quant_resnet._fold_head_float(params["head"], cfg.family)

        class _StatsBE(quant_resnet._CalibBE):
            def __init__(self):
                super().__init__(jnp.float32)
                self.stats = {}

            def toq(self, key, y):
                self.stats[key] = _stat_of(y)
                return y

        @jax.jit
        def stats_one(x):
            be = _StatsBE()
            y = quant_resnet._prologue(params["backbone"], x, jnp.float32)
            quant_resnet._region(be, ft, ff, fh, y, cfg=cfg)
            return be.stats

    stats: dict = {}
    for b in calib_batches:
        stats = _merge(stats, jax.device_get(stats_one(jnp.asarray(b))))

    def dense_fn_for(mode, exclude=()):
        stats_dev = jax.tree_util.tree_map(jnp.asarray, stats)

        if darknet:
            class _BE(quant._CalibBE):
                def __init__(self):
                    super().__init__(jnp.float32)

                def _rec(self, key, y):
                    if key in exclude:
                        return y
                    return _fq_mode(y, stats_dev[key], mode)

            btb = quant.blend_weight_tree(bt, lambda p: jnp.float32(1.0))
            htb = quant.blend_weight_tree(ht, lambda p: jnp.float32(1.0))

            def dense_fn(images, act_g, w_g):
                be = _BE()
                y = quant._prologue(params["backbone"], images, jnp.float32)
                raw = quant._region(be, btb, htb, y)
                return dense_from_raw(raw, cfg, input_size=images.shape[1])

            return dense_fn

        class _BE(quant_resnet._CalibBE):
            def __init__(self):
                super().__init__(jnp.float32)

            def toq(self, key, y):
                if key in exclude:
                    return y
                return _fq_mode(y, stats_dev[key], mode)

        ftb = quant.blend_weight_tree(ft, lambda p: jnp.float32(1.0))
        ffb = quant.blend_weight_tree(ff, lambda p: jnp.float32(1.0))
        fhb = quant.blend_weight_tree(fh, lambda p: jnp.float32(1.0))

        def dense_fn(images, act_g, w_g):
            be = _BE()
            y = quant_resnet._prologue(params["backbone"], images,
                                       jnp.float32)
            raw = quant_resnet._region(be, ftb, ffb, fhb, y, cfg=cfg)
            return dense_from_raw(raw, cfg, input_size=images.shape[1])

        return dense_fn

    return dense_fn_for, stats


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
    dense_fn_for, _stats = build_mode_sim(family, cfg, params, calib)

    res: dict = {"spec": spec, "train": losses, "variants": {}}
    # NOTE on the baseline: every mode below runs with WEIGHTS
    # int8-quantized (blend gate 1.0) — that is the serving
    # configuration being compared. The "float" row is therefore a
    # weights-only-quantized baseline (acts float); the TRUE float AP
    # for these proxies lives in int8_sensitivity.json's "float" row
    # (trained identically: same seed/steps).
    base = None
    for mode in ("float", "sym", "asym", "sym_ch", "asym_ch"):
        label = "weights_only" if mode == "float" else mode
        score = make_eval(family, cfg, dense_fn_for(mode), imgs, gt)
        ap = score({}, {})
        if mode == "float":
            base = ap
        res["variants"][label] = {"AP": round(ap, 4),
                                  "dAP_vs_wonly": round(ap - base, 4)}
        print(f"#   {family}/{label}: AP {ap:.4f} (dAP {ap - base:+.4f})",
              flush=True)

    # real int8 path, post-cbl_out (the shipping sym scheme)
    from benchmarks.knob_accuracy import _eval_axis, _eval_rotated
    ev = _eval_rotated if family == "rapid" else _eval_axis
    det = Detector(model_name=family, input_size=spec["size"],
                   num_classes=spec["nc"], params=params,
                   compute_dtype=jnp.float32, approx_topk=False,
                   quantized=True, calib_images=imgs[:16])
    ap = ev(det, imgs, gt, 0.005)["AP"]
    res["variants"]["int8_real_cblout"] = {"AP": round(ap, 4),
                                           "dAP": round(ap - base, 4)}
    print(f"#   {family}/int8_real_cblout: AP {ap:.4f} "
          f"(dAP {ap - base:+.4f})", flush=True)
    res["secs"] = round(time.time() - t0, 1)
    return res


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default="yolov3,retinanet,fcos")
    args = ap.parse_args(argv)
    import jax

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "int8_modes.json")
    results = {}
    if os.path.exists(path):
        with open(path) as fh:
            results = json.load(fh)
    results["backend"] = jax.default_backend()
    for family in args.families.split(","):
        family = family.strip()
        print(f"# mode sweep {family} ...", flush=True)
        results[family] = run_family(family, FAMS[family])
        with open(path, "w") as fh:
            json.dump(results, fh, indent=2)
    print(f"# wrote {path}")


if __name__ == "__main__":
    main()
