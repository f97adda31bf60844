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

from mydetection_tpu.utils.image_ops import IMAGE_EXTS  # noqa: E402

VIDEO_EXTS = {".mp4", ".avi", ".mov", ".mkv", ".webm"}


def run_video(det, path: str, out_dir: str, *, conf_thres: float,
              nms_iou: float, batch_size: int = 16) -> str:
    """Video inference: decode frames with cv2, detect in batches
    (detect_batch amortizes one device dispatch over the batch), draw,
    and write an annotated copy next to the image outputs. Returns the
    output path. Mirrors the reference author's video demos (RAPiD
    ships overhead-fisheye video examples) with a batched device path."""
    import cv2
    import numpy as np

    from mydetection_tpu.utils.visualization import draw_detections

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise SystemExit(f"cannot open video {path}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    name = os.path.splitext(os.path.basename(path))[0]
    out_path = os.path.join(out_dir, f"{name}_det.avi")
    writer = None
    names = det.cfg.class_names
    n_frames = 0
    t0 = time.perf_counter()
    while True:
        frames = []
        while len(frames) < batch_size:
            ok, bgr = cap.read()
            if not ok:
                break
            frames.append(np.ascontiguousarray(bgr[:, :, ::-1]))  # RGB
        if not frames:
            break
        # pad the tail to batch_size: a shorter final batch is a new
        # shape and would recompile the whole detect pipeline (~17 s)
        real = len(frames)
        padded = frames + [frames[-1]] * (batch_size - real)
        for rgb, dets in zip(frames, det.detect_batch(
                padded, conf_thres=conf_thres, nms_iou=nms_iou)[:real]):
            vis = draw_detections(rgb, dets, class_names=names)
            if writer is None:
                h, w = vis.shape[:2]
                writer = cv2.VideoWriter(
                    out_path, cv2.VideoWriter_fourcc(*"MJPG"), fps, (w, h))
            writer.write(np.ascontiguousarray(vis[:, :, ::-1]))
            n_frames += 1
        if len(frames) < batch_size:
            break
    cap.release()
    if writer is None:
        raise SystemExit(f"no frames decoded from {path}")
    writer.release()
    dt = time.perf_counter() - t0
    print(f"{path}: {n_frames} frames in {dt:.1f} s "
          f"({n_frames / dt:.1f} fps incl. host decode) -> {out_path}")
    return out_path


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
            if os.path.splitext(f)[1].lower() in IMAGE_EXTS | VIDEO_EXTS)
    else:
        paths = [args.input]

    videos = [p for p in paths
              if os.path.splitext(p)[1].lower() in VIDEO_EXTS]
    paths = [p for p in paths if p not in videos]

    overrides = {}
    if args.input_size:
        overrides["input_size"] = args.input_size
    if args.float32:
        overrides["compute_dtype"] = jnp.float32
    if args.quantized:
        calib = paths[:32]
        if not calib and videos:
            # video-only input: calibrate on real decoded frames, not
            # the noise fallback — the user DID supply real data
            import cv2
            import numpy as np

            cap = cv2.VideoCapture(videos[0])
            while len(calib) < 8:
                ok, bgr = cap.read()
                if not ok:
                    break
                calib.append(np.ascontiguousarray(bgr[:, :, ::-1]))
            cap.release()
        overrides["quantized"] = True
        overrides["calib_images"] = calib or None
    det = Detector(model_name=args.model, weights_path=args.weights,
                   **overrides)
    os.makedirs(args.out_dir, exist_ok=True)
    for path in videos:
        run_video(det, path, args.out_dir, conf_thres=args.conf_thres,
                  nms_iou=args.nms_iou)

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
