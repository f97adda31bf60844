#!/usr/bin/env python
"""Detection demo CLI: run a model on images and save visualizations.

Reference parity: the reference's demo usage —
`Detector(...).detect_one(..., visualize=True)` over sample images
[recalled; SURVEY.md §4 "(b) visual inspection via detect_one"].

Examples:
    python demo.py --model yolov3 --weights weights/yolov3.npz \
        --input dog.jpg --out-dir demo_out --conf-thres 0.3
    python demo.py --model rapid --input fisheye_dir/ --out-dir out/
"""

from __future__ import annotations

import argparse
import os
import time

IMAGE_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="yolov3")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--input", required=True, help="image file or directory")
    ap.add_argument("--out-dir", default="demo_out")
    ap.add_argument("--conf-thres", type=float, default=0.3)
    ap.add_argument("--nms-iou", type=float, default=0.45)
    ap.add_argument("--input-size", type=int, default=None)
    ap.add_argument("--float32", action="store_true",
                    help="float32 conv compute (debug/CPU; default bf16)")
    ap.add_argument("--quantized", action="store_true",
                    help="int8 static-scale PTQ serving path, calibrated "
                         "on the input images themselves")
    args = ap.parse_args()

    import jax.numpy as jnp

    from mydetection_tpu import Detector

    if os.path.isdir(args.input):
        paths = sorted(
            os.path.join(args.input, f) for f in os.listdir(args.input)
            if os.path.splitext(f)[1].lower() in IMAGE_EXTS)
    else:
        paths = [args.input]

    overrides = {}
    if args.input_size:
        overrides["input_size"] = args.input_size
    if args.float32:
        overrides["compute_dtype"] = jnp.float32
    if args.quantized:
        overrides["quantized"] = True
        overrides["calib_images"] = paths[:32]
    det = Detector(model_name=args.model, weights_path=args.weights,
                   **overrides)
    os.makedirs(args.out_dir, exist_ok=True)

    for path in paths:
        name = os.path.splitext(os.path.basename(path))[0]
        out_path = os.path.join(args.out_dir, f"{name}_det.png")
        t0 = time.perf_counter()
        dets = det.detect_one(img_path=path, conf_thres=args.conf_thres,
                              nms_iou=args.nms_iou, save_path=out_path)
        dt = (time.perf_counter() - t0) * 1000
        print(f"{path}: {len(dets)} detections in {dt:.0f} ms -> {out_path}")
        for row in dets.as_array()[:10]:
            print("   ", [round(float(v), 1) for v in row])


if __name__ == "__main__":
    main()
