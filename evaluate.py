#!/usr/bin/env python
"""COCO evaluation CLI — reference parity with `evaluate.py` in
duanzhiihao/myDetection [recalled; SURVEY.md §2.14/§3.5].

Example:
    python evaluate.py --model yolov3 --weights weights/yolov3.npz \
        --ann data/instances_val2017.json --img-dir data/val2017 \
        --input-size 416 --batch-size 32
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="yolov3")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--ann", required=True, help="COCO annotation JSON")
    ap.add_argument("--img-dir", required=True)
    ap.add_argument("--input-size", type=int, default=None)
    ap.add_argument("--conf-thres", type=float, default=0.005)
    ap.add_argument("--nms-iou", type=float, default=0.45)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--max-images", type=int, default=None)
    ap.add_argument("--num-threads", type=int, default=4)
    ap.add_argument("--out", default=None, help="write results JSON here")
    ap.add_argument("--float32", action="store_true",
                    help="float32 compute (bit-consistency runs)")
    ap.add_argument("--exact-topk", action="store_true",
                    help="exact pre-NMS top-k (the TPU serving default "
                         "uses approx_max_k at 0.95 recall; pass this "
                         "for parity/reference mAP runs)")
    ap.add_argument("--rotated", action="store_true",
                    help="rotated-box evaluation (fisheye datasets, "
                         "AP50/AP75 with rotated-IoU matching)")
    ap.add_argument("--quantized", action="store_true",
                    help="int8 static-scale PTQ serving path; calibrates "
                         "on --calib-images images from --img-dir, then "
                         "evaluates the quantized pipeline (diff against "
                         "a float run to measure the PTQ mAP cost)")
    ap.add_argument("--calib-images", type=int, default=32,
                    help="calibration images for --quantized")
    ap.add_argument("--data-parallel", action="store_true",
                    help="shard eval batches over all local devices")
    ap.add_argument("--exported", default=None, metavar="ARTIFACT",
                    help="evaluate a .mydet export artifact "
                         "(mydetection_tpu.export) instead of building "
                         "a model — --model/--weights and all model "
                         "overrides are ignored; nms_iou/input size are "
                         "the artifact's baked values")
    args = ap.parse_args()

    import jax.numpy as jnp

    from mydetection_tpu import Detector
    from mydetection_tpu.eval.evaluator import evaluate_detector

    if args.exported:
        from mydetection_tpu.export import load_exported

        served = load_exported(args.exported)
        nms = served.meta["nms_iou"]  # baked; CLI --nms-iou is ignored
        # the artifact knows whether it is rotated — dispatch on its
        # metadata, and reject a contradicting flag loudly
        if args.rotated and not served.meta["rotated"]:
            raise SystemExit(
                f"--rotated passed but {args.exported} is an axis-aligned "
                f"{served.meta['model']!r} artifact")
        if served.meta["rotated"]:
            from mydetection_tpu.eval.rotated_eval import (
                evaluate_rotated_detector,
            )
            stats = evaluate_rotated_detector(
                served, args.ann, args.img_dir, conf_thres=args.conf_thres,
                nms_iou=nms, batch_size=args.batch_size,
                max_images=args.max_images, num_threads=args.num_threads,
                results_path=args.out)
        else:
            stats = evaluate_detector(
                served, args.ann, args.img_dir, conf_thres=args.conf_thres,
                nms_iou=nms, batch_size=args.batch_size,
                max_images=args.max_images, num_threads=args.num_threads,
                results_path=args.out)
        print({k: round(v, 4) for k, v in stats.items()})
        return

    overrides = {}
    if args.data_parallel:
        overrides["data_parallel"] = True
    if args.input_size:
        overrides["input_size"] = args.input_size
    if args.float32:
        overrides["compute_dtype"] = jnp.float32
    if args.exact_topk:
        overrides["approx_topk"] = False
    if args.quantized:
        import glob
        import os

        from mydetection_tpu.utils.image_ops import IMAGE_EXTS

        paths = sorted(
            p for p in glob.glob(os.path.join(args.img_dir, "*"))
            if os.path.splitext(p)[1].lower() in IMAGE_EXTS)
        if not paths:
            raise SystemExit(f"--quantized: no images in {args.img_dir} "
                             "to calibrate on")
        overrides["quantized"] = True
        overrides["calib_images"] = paths[:args.calib_images]
    if args.rotated:
        from mydetection_tpu.eval.rotated_eval import evaluate_rotated_detector
        det = Detector(model_name=args.model, weights_path=args.weights,
                       **overrides)
        stats = evaluate_rotated_detector(
            det, args.ann, args.img_dir, conf_thres=args.conf_thres,
            nms_iou=args.nms_iou, batch_size=args.batch_size,
            input_size=args.input_size, max_images=args.max_images,
            num_threads=args.num_threads, results_path=args.out)
    else:
        # the head's class count must match the GT category set
        from mydetection_tpu.eval.cocoeval import COCOGt
        gt = COCOGt(args.ann)
        if gt.cat_ids:
            overrides["num_classes"] = len(gt.cat_ids)
        det = Detector(model_name=args.model, weights_path=args.weights,
                       **overrides)
        stats = evaluate_detector(
            det, gt, args.img_dir, conf_thres=args.conf_thres,
            nms_iou=args.nms_iou, batch_size=args.batch_size,
            input_size=args.input_size, max_images=args.max_images,
            num_threads=args.num_threads, results_path=args.out)
    print({k: round(v, 4) for k, v in stats.items()})


if __name__ == "__main__":
    main()
