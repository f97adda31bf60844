"""Per-HLO-op device-time breakdown of the jitted train step (or the
inference graph) via an XPlane trace.

Captures jax.profiler traces of N steps, then parses the xplane.pb
with tensorflow's profiler protos (present in this image) and prints
the top ops on the TPU device plane by total duration, grouped by HLO
category (fusion/convolution/reduce/...). This is the ground truth the
segment-diff profilers (profile_train_bwd.py etc.) approximate.

Run (TPU): python benchmarks/xplane_top_ops.py [--mode train|infer]
Prints a table; appends a JSON summary to benchmarks/xplane_top_ops.json.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
import tempfile
from collections import defaultdict

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def capture(mode: str, batch: int, size: int, steps: int,
            model_name: str = "yolov3") -> str:
    import jax
    import jax.numpy as jnp

    from mydetection_tpu.models.layers import tree_merge
    from mydetection_tpu.registry import get_model
    from mydetection_tpu.training import sgd_init, sgd_update

    dtype = (jnp.bfloat16 if jax.default_backend() == "tpu"
             else jnp.float32)
    model = get_model(model_name, input_size=size, compute_dtype=dtype)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 255, (batch, size, size, 3),
                                   np.uint8))

    if mode == "train":
        m = 8
        gb = jnp.asarray(np.stack(
            [rng.uniform(0.15, 0.85, (batch, m)) * size,
             rng.uniform(0.15, 0.85, (batch, m)) * size,
             rng.uniform(0.05, 0.3, (batch, m)) * size,
             rng.uniform(0.05, 0.3, (batch, m)) * size], -1), jnp.float32)
        gc = jnp.asarray(rng.randint(0, 80, (batch, m)), jnp.int32)
        gv = jnp.ones((batch, m), bool)
        vel = sgd_init(params)

        @jax.jit
        def step(p, v):
            def loss_fn(p):
                terms = model.loss(p, imgs, gb, gc, gv, input_size=size)
                bn = terms.pop("bn_updates", None)
                return terms["total"], bn
            (tot, bn), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p)
            p, v = sgd_update(p, grads, v, lr=1e-4)
            return tree_merge(p, bn), v, tot

        params, vel, t = step(params, vel)   # compile
        float(t)
        logdir = tempfile.mkdtemp(prefix="xplane_")
        jax.profiler.start_trace(logdir)
        for _ in range(steps):
            params, vel, t = step(params, vel)
        float(t)
        jax.profiler.stop_trace()
        return logdir

    fwd = jax.jit(lambda p, x: model.forward_dense(p, x))
    out, _ = fwd(params, imgs)
    jax.block_until_ready(out)
    logdir = tempfile.mkdtemp(prefix="xplane_")
    jax.profiler.start_trace(logdir)
    for _ in range(steps):
        out, _ = fwd(params, imgs)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    return logdir


def parse(logdir: str, steps: int, top: int):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {logdir}"
    space = xplane_pb2.XSpace()
    with open(paths[0], "rb") as fh:
        space.ParseFromString(fh.read())

    per_op = defaultdict(float)     # name -> total us
    per_cat = defaultdict(float)
    dev_planes = [p for p in space.planes
                  if re.search(r"TPU|/device", p.name)
                  and "Host" not in p.name]
    for plane in dev_planes:
        meta = plane.event_metadata
        stat_meta = plane.stat_metadata
        for line in plane.lines:
            for ev in line.events:
                md = meta[ev.metadata_id]
                dur_us = ev.duration_ps / 1e6
                name = md.name
                cat = ""
                for st in list(ev.stats) + list(md.stats):
                    sm = stat_meta[st.metadata_id].name
                    if sm == "hlo_category":
                        cat = (st.str_value
                               or stat_meta[st.ref_value].name)
                per_op[name] += dur_us
                per_cat[cat or "?"] += dur_us
    return per_op, per_cat, [p.name for p in dev_planes]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="train",
                    choices=["train", "infer"])
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--input-size", type=int, default=416)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--model", default="yolov3")
    args = ap.parse_args()

    logdir = capture(args.mode, args.batch, args.input_size, args.steps,
                     model_name=args.model)
    per_op, per_cat, planes = parse(logdir, args.steps, args.top)
    print("device planes:", planes)
    tot = sum(per_cat.values())
    print(f"total device op time: {tot / args.steps / 1000:.2f} "
          f"ms/step over {args.steps} steps")
    print("\n-- by category (ms/step) --")
    for cat, us in sorted(per_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:24s} {us / args.steps / 1000:8.3f}")
    print(f"\n-- top {args.top} ops (ms/step) --")
    rows = sorted(per_op.items(), key=lambda kv: -kv[1])[:args.top]
    for name, us in rows:
        print(f"  {us / args.steps / 1000:8.3f}  {name[:100]}")
    summary = {
        "model": args.model,
        "mode": args.mode, "batch": args.batch,
        "input_size": args.input_size,
        "total_ms_per_step": round(tot / args.steps / 1000, 3),
        "by_category_ms": {c: round(u / args.steps / 1000, 3)
                           for c, u in sorted(per_cat.items(),
                                              key=lambda kv: -kv[1])},
        "top_ops_ms": [{"name": n[:120],
                        "ms": round(u / args.steps / 1000, 3)}
                       for n, u in rows[:20]],
    }
    with open(os.path.join(HERE, "xplane_top_ops.json"), "a") as fh:
        fh.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
