#!/usr/bin/env python
"""Training CLI — reference parity with `train.py` in
duanzhiihao/myDetection [recalled; SURVEY.md §2.12/§3.4]: SGD with
momentum + weight decay, darknet burn-in LR warmup, iteration-based
loop, multi-scale input sizes, periodic checkpoint + val-eval,
`--resume` from the latest checkpoint.

TPU-native specifics: one compiled train-step per input-size bucket
(multi-scale = cycling pre-compiled graphs); data parallelism via a
1-D device mesh with the batch axis sharded (XLA inserts the gradient
psums); metrics go to stdout + a JSONL file, and optionally to real
TensorBoard event files via the dependency-free writer
(`--tensorboard-dir`, utils/tb_writer.py) — the reference's two sinks.

Example:
    python train.py --model yolov3 --ann data/train.json \
        --img-dir data/train2017 --batch-size 16 --iterations 5000
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="yolov3")
    ap.add_argument("--ann", required=True)
    ap.add_argument("--img-dir", required=True)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--iterations", type=int, default=10000)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--momentum", type=float, default=0.9)
    ap.add_argument("--weight-decay", type=float, default=5e-4)
    ap.add_argument("--burn-in", type=int, default=1000)
    ap.add_argument("--milestones", type=int, nargs="*", default=[])
    ap.add_argument("--sizes", type=int, nargs="*", default=None,
                    help="multi-scale bucket list (default: model size ±)")
    ap.add_argument("--rescale-every", type=int, default=10)
    ap.add_argument("--rotate-prob", type=float, default=None,
                    help="arbitrary-rotation augmentation probability "
                         "(default: 0.5 for rotated models, 0 otherwise)")
    ap.add_argument("--max-gt", type=int, default=100)
    ap.add_argument("--num-threads", type=int, default=4)
    ap.add_argument("--ckpt-dir", default="weights")
    ap.add_argument("--ckpt-every", type=int, default=1000)
    ap.add_argument("--log-every", type=int, default=20)
    ap.add_argument("--resume", default=None,
                    help="checkpoint path to resume from")
    ap.add_argument("--pretrained-backbone", default=None,
                    help="darknet53.conv.74-style backbone-only weights "
                         "to initialize from (yolov3/rapid; the "
                         "reference's standard training init)")
    ap.add_argument("--tensorboard-dir", default=None,
                    help="also write TensorBoard event files here "
                         "(dependency-free writer, utils/tb_writer.py — "
                         "the reference's second metrics sink)")
    ap.add_argument("--val-ann", default=None)
    ap.add_argument("--val-img-dir", default=None)
    ap.add_argument("--val-every", type=int, default=0)
    ap.add_argument("--val-max-images", type=int, default=500)
    ap.add_argument("--data-parallel", action="store_true",
                    help="shard the batch over all local devices")
    ap.add_argument("--float32", action="store_true",
                    help="float32 conv compute (debug/CPU; default bf16)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mydetection_tpu import checkpoint as ckpt_lib
    from mydetection_tpu.data.coco import CocoDataset
    from mydetection_tpu.data.loader import TrainLoader
    from mydetection_tpu.registry import fast_init, get_model
    from mydetection_tpu.training import burn_in_lr, make_train_step, sgd_init

    from mydetection_tpu.registry import default_config
    # the registered config, not the literal name: any rotated
    # registration (not just 'rapid' exactly) gets the rotated parser
    rotated = default_config(args.model).rotated
    ds = CocoDataset(args.ann, args.img_dir, rotated=rotated, skip_empty=True)
    overrides = {}
    if args.float32:
        overrides["compute_dtype"] = jnp.float32
    model = get_model(args.model,
                      num_classes=max(ds.num_classes, 1) if not rotated else 1,
                      **overrides)
    cfg = model.config
    sizes = args.sizes or sorted({max(cfg.input_size - 96, 128),
                                  cfg.input_size,
                                  cfg.input_size + 96})
    print(f"model={cfg.name} classes={cfg.num_classes} sizes={sizes} "
          f"dataset={len(ds)} imgs devices={len(jax.devices())}")

    params = fast_init(model, jax.random.PRNGKey(args.seed))
    if args.pretrained_backbone:
        if cfg.family not in ("yolov3", "rapid"):
            raise SystemExit("--pretrained-backbone is darknet-format "
                             "(yolov3/rapid families only)")
        from mydetection_tpu.weight_import import load_darknet_backbone_weights
        params = load_darknet_backbone_weights(jax.device_get(params),
                                               args.pretrained_backbone)
        print(f"backbone initialized from {args.pretrained_backbone}")
    velocity = sgd_init(params)
    start_iter = 0
    if args.resume:
        ck = ckpt_lib.load_checkpoint(args.resume)
        params = ck["params"]
        if ck["opt"] is not None:
            velocity = ck["opt"]
        start_iter = ck["step"] or 0
        print(f"resumed from {args.resume} at iteration {start_iter}")

    mesh = None
    if args.data_parallel and len(jax.devices()) > 1:
        from mydetection_tpu.parallel.mesh import make_mesh, replicate, shard_batch
        mesh = make_mesh()
        params = replicate(params, mesh)
        velocity = replicate(velocity, mesh)
        print(f"data-parallel over {len(jax.devices())} devices")

    steps = {s: make_train_step(model, input_size=s,
                                momentum=args.momentum,
                                weight_decay=args.weight_decay)
             for s in sizes}

    loader = TrainLoader(ds, batch_size=args.batch_size, sizes=sizes,
                         max_gt=args.max_gt, num_threads=args.num_threads,
                         rotated=rotated, rotate_prob=args.rotate_prob,
                         rescale_every=args.rescale_every,
                         seed=args.seed, device_put=mesh is None)
    os.makedirs(args.ckpt_dir, exist_ok=True)
    metrics_path = os.path.join(args.ckpt_dir, f"{cfg.name}_metrics.jsonl")
    metrics_fh = open(metrics_path, "a")
    tb = None
    if args.tensorboard_dir:
        from mydetection_tpu.utils.tb_writer import TBWriter
        tb = TBWriter(args.tensorboard_dir)

    it = start_iter
    val_det = None
    t_log = time.perf_counter()
    for images, gt_boxes, gt_classes, gt_valid, size in loader:
        if it >= args.iterations:
            break
        lr = burn_in_lr(it, base_lr=args.lr, burn_in=args.burn_in,
                        milestones=tuple(args.milestones))
        if mesh is not None:
            batch = shard_batch({"i": np.asarray(images), "b": gt_boxes,
                                 "c": gt_classes, "v": gt_valid}, mesh)
            images, gt_boxes, gt_classes, gt_valid = (
                batch["i"], batch["b"], batch["c"], batch["v"])
        params, velocity, m = steps[size](
            params, velocity, images, jnp.asarray(gt_boxes),
            jnp.asarray(gt_classes), jnp.asarray(gt_valid), lr)
        it += 1

        if it % args.log_every == 0:
            m = {k: float(v) for k, v in m.items() if k != "bn_updates"}
            dt = time.perf_counter() - t_log
            t_log = time.perf_counter()
            rate = args.log_every * args.batch_size / dt
            row = {"iter": it, "lr": float(lr), "size": size,
                   "img_per_sec": round(rate, 2), **{k: round(v, 5) for k, v in m.items()}}
            print(row, flush=True)
            metrics_fh.write(json.dumps(row) + "\n")
            metrics_fh.flush()
            if tb is not None:
                tb.add_scalars(
                    {"train/lr": float(lr),
                     "train/img_per_sec": rate,
                     **{f"loss/{k}": v for k, v in m.items()}}, step=it)
                tb.flush()

        if it % args.ckpt_every == 0 or it == args.iterations:
            path = os.path.join(args.ckpt_dir, f"{cfg.name}_{it}.npz")
            ckpt_lib.save_checkpoint(path, jax.device_get(params), step=it,
                                     opt_state=jax.device_get(velocity))
            print(f"checkpoint -> {path}", flush=True)

        if args.val_every and it % args.val_every == 0 and args.val_ann:
            from mydetection_tpu.api import Detector
            # build the val Detector ONCE and swap params in: a fresh
            # Detector per interval starts with an empty jit cache and
            # recompiles the detect pipeline (~17 s+) every val run
            # under a mesh the live params carry replicated shardings;
            # hand the (mesh-less) val Detector host copies instead
            val_params = params if mesh is None else jax.device_get(params)
            if val_det is None:
                val_det = Detector(model_name=args.model, params=val_params,
                                   num_classes=cfg.num_classes, **overrides)
            else:
                val_det.params = val_params
            det = val_det
            if rotated:
                # rotated models score with rotated-IoU matching
                # (SURVEY.md §2.14 fisheye evaluator), not enclosing-box
                # COCO AP
                from mydetection_tpu.eval.rotated_eval import (
                    evaluate_rotated_detector,
                )
                stats = evaluate_rotated_detector(
                    det, args.val_ann, args.val_img_dir or args.img_dir,
                    max_images=args.val_max_images, verbose=False)
            else:
                from mydetection_tpu.eval.evaluator import evaluate_detector
                stats = evaluate_detector(det, args.val_ann,
                                          args.val_img_dir or args.img_dir,
                                          max_images=args.val_max_images,
                                          verbose=False)
            row = {"iter": it, "val_AP": stats.get("AP", stats.get("AP50")),
                   "val_AP50": stats["AP50"]}
            print(row, flush=True)
            metrics_fh.write(json.dumps(row) + "\n")
            metrics_fh.flush()
            if tb is not None:
                tb.add_scalars({"val/AP": row["val_AP"] or 0.0,
                                "val/AP50": row["val_AP50"]}, step=it)
                tb.flush()

    if tb is not None:
        tb.close()
    print(f"done at iteration {it}")


if __name__ == "__main__":
    main()
