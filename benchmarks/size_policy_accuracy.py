"""Accuracy effect of serve.py --coalesce-sizes, measured honestly.

The policy letterboxes small-size requests onto the largest served
canvas, so a client asking for 320 gets its image processed at 416.
Measuring that with the single-size overfit proxies of
knob_accuracy.py is INVALID — they are scale-brittle by construction
(no multi-scale augmentation; a 1.5× eval collapsed AP by 0.85,
measuring the proxy, not the policy). Real detectors train
multi-scale exactly to be size-robust (SURVEY.md §2.12: the reference
resizes every ~10 iters), so this harness does the same:

  1. trains a yolov3 proxy with MULTI-SCALE steps (256/320/384,
     cycled; GT scaled with the resize — the training loop's
     own multi-scale recipe at proxy scale);
  2. evaluates the SAME trained net detecting the 256-px images
     at native 256 (what a 256-client gets without coalescing) vs at
     384 (what the policy serves them at);
  3. reports the ΔAP between the two — the policy's accuracy effect
     on a size-robust net.

Run on TPU: python benchmarks/size_policy_accuracy.py
Appends one JSON line to benchmarks/size_policy_accuracy.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from benchmarks.knob_accuracy import _eval_axis, make_dataset  # noqa: E402

SIZES = (256, 320, 384)
NC = 6
STEPS = 600
EVAL_CONF = 0.005


def _resize_set(train_arrays, size: int, base: int):
    """Nearest-neighbor resize of the whole (N, S, S, 3) uint8 set +
    GT scaling (exact for the synthetic solid rectangles)."""
    images, gtb, gtc, gtv = train_arrays
    idx = (np.arange(size) * base // size).clip(0, base - 1)
    imgs = images[:, idx][:, :, idx]
    r = size / base
    gtb2 = gtb.copy()
    gtb2[..., :4] = gtb[..., :4] * r
    return imgs, gtb2, gtc, gtv


def main():
    import jax
    import jax.numpy as jnp

    from mydetection_tpu import Detector
    from mydetection_tpu.registry import get_model
    from mydetection_tpu.training import burn_in_lr, make_train_step, sgd_init

    if jax.default_backend() != "tpu":
        print("# TPU-only harness")
        return
    t0 = time.time()
    imgs, train_arrays, gt = make_dataset("yolov3", SIZES[0], NC)
    model = get_model("yolov3", input_size=SIZES[0], num_classes=NC)
    params = model.init(jax.random.PRNGKey(0))
    vel = sgd_init(params)
    per_size = {s: (_resize_set(train_arrays, s, SIZES[0]),
                    make_train_step(model, input_size=s)) for s in SIZES}
    for it in range(STEPS):
        size = SIZES[(it // 10) % len(SIZES)]  # resize every 10 iters
        (im, gb, gc, gv), step = per_size[size]
        lr = burn_in_lr(it, base_lr=2e-3, burn_in=50)
        params, vel, m = step(params, vel, jnp.asarray(im), jnp.asarray(gb),
                              jnp.asarray(gc), jnp.asarray(gv), lr)
        if it % 100 == 0:
            print(f"#   step {it} @{size}: loss {float(m['total']):.3f}",
                  flush=True)
    loss_last = float(m["total"])

    res = {"backend": "tpu", "sizes": list(SIZES), "steps": STEPS,
           "loss_last": round(loss_last, 3)}
    for serve_size in (256, 384):
        det = Detector(model_name="yolov3", input_size=serve_size,
                       num_classes=NC, params=params,
                       compute_dtype=jnp.float32, approx_topk=False)
        stats = _eval_axis(det, imgs, gt, EVAL_CONF)
        res[f"AP_at_{serve_size}"] = round(stats["AP"], 4)
        print(f"#   detect 256-px images at {serve_size}: "
              f"AP {stats['AP']:.4f}", flush=True)
    res["policy_dAP"] = round(res["AP_at_384"] - res["AP_at_256"], 4)
    res["secs"] = round(time.time() - t0, 1)
    print(json.dumps(res))
    with open(os.path.join(HERE, "size_policy_accuracy.json"), "a") as fh:
        fh.write(json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
