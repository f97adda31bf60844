"""Streaming batched-inference throughput harness.

[spec] configs item 5: "Batched streaming inference: 64-image batches,
async host JPEG decode + device prefetch" — this harness measures
end-to-end images/sec INCLUDING host JPEG decode, and proves the
overlap claim by comparing:

  * pipelined  — StreamingPipeline (threaded decode, double-buffered
    device batches) feeding the fused detect graph;
  * serial     — decode a batch, then run it, strictly alternating
    (what the overlap saves us from).

Also reports the decode-only and device-only rates so the bound is
visible (min(decode, device) ≈ pipelined when overlap works —
SURVEY.md §7 hard-part #6: prove decode never gates step time), and
`device_idle_frac` — the fraction of pipelined wall time the consumer
spent WAITING for the next batch (input starvation). On a decode-bound
host that fraction is high by physics; the pipeline's job is to make
it ~0 whenever decode capacity ≥ device rate.

`--synthetic-decode-ms D --synthetic-device-ms V` replaces both the
decoder (per-image sleep, GIL-free like libjpeg) and the device call
(per-batch sleep) to prove the OVERLAP MECHANISM independent of this
host's core count: pipelined wall ≈ max(decode, device) while serial
= their sum (VERDICT r2 #5).

Usage: python benchmarks/streaming.py [--batch 64] [--images 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def make_jpegs(n: int, root: str, *, wh=(640, 480)) -> list[str]:
    from PIL import Image

    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        arr = rng.randint(0, 255, (wh[1], wh[0], 3), np.uint8)
        p = os.path.join(root, f"img{i}.jpg")
        Image.fromarray(arr).save(p, quality=90)
        paths.append(p)
    return paths


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--images", type=int, default=256)
    ap.add_argument("--input-size", type=int, default=416)
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--model", default="yolov3")
    ap.add_argument("--synthetic-decode-ms", type=float, default=None,
                    help="replace the decoder with a per-image sleep")
    ap.add_argument("--synthetic-device-ms", type=float, default=None,
                    help="replace the device call with a per-batch sleep")
    args = ap.parse_args()

    if args.synthetic_decode_ms is not None:
        run_synthetic(args)
        return

    import jax
    import jax.numpy as jnp

    from mydetection_tpu import Detector
    from mydetection_tpu.data.loader import StreamingPipeline
    from mydetection_tpu.utils.image_ops import letterbox_np

    on_tpu = jax.default_backend() == "tpu"
    det = Detector(model_name=args.model, input_size=args.input_size,
                   compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
                   use_pallas=on_tpu)

    with tempfile.TemporaryDirectory() as td:
        paths = make_jpegs(args.images, td)

        # warm up the compiled graph
        warm = np.zeros((args.batch, args.input_size, args.input_size, 3),
                        np.uint8)
        from mydetection_tpu.utils.image_ops import LetterboxInfo
        infos = [LetterboxInfo(640, 480, 1.0, 0, 0, args.input_size)] * args.batch
        det.detect_prepared(warm, infos, conf_thres=0.3)

        # decode-only rate
        t0 = time.perf_counter()
        pipe = StreamingPipeline(paths, input_size=args.input_size,
                                 batch_size=args.batch,
                                 num_threads=args.threads, device_put=False)
        n_batches = 0
        for canv, infos_b, _ in pipe:
            n_batches += 1
        decode_dt = time.perf_counter() - t0
        decode_ips = len(paths) / decode_dt

        # device-only rate (pre-decoded batch, fetch-forced)
        t0 = time.perf_counter()
        iters = max(n_batches, 4)
        for _ in range(iters):
            det.detect_prepared(warm, infos, conf_thres=0.3)
        device_dt = time.perf_counter() - t0
        device_ips = iters * args.batch / device_dt

        # serial: decode batch, then infer, STRICTLY alternating — no
        # thread pool, so no background decode overlaps the device call
        # (a StreamingPipeline here would keep decoding during
        # detect_prepared and overstate the serial rate). Uses the same
        # decoder the pipeline uses (native C++ when built, PIL else)
        # so the comparison isolates OVERLAP, not decoder choice.
        from mydetection_tpu import native as native_mod
        from PIL import Image

        def decode_one(p):
            if native_mod.available():
                try:
                    return native_mod.decode_letterbox_file(p, args.input_size)
                except (ValueError, RuntimeError):
                    pass
            img = np.asarray(Image.open(p).convert("RGB"))
            return letterbox_np(img, args.input_size)

        t0 = time.perf_counter()
        for start in range(0, len(paths), args.batch):
            chunk = paths[start:start + args.batch]
            decoded = [decode_one(p) for p in chunk]
            canvases = [c for c, _ in decoded]
            infos_b = [i for _, i in decoded]
            while len(canvases) < args.batch:  # static batch shape
                canvases.append(canvases[-1])
            det.detect_prepared(np.stack(canvases), infos_b, conf_thres=0.3)
        serial_dt = time.perf_counter() - t0
        serial_ips = len(paths) / serial_dt

        # pipelined: decode overlapped with device compute. The wait on
        # `next(it)` is exactly the time the device-side consumer sat
        # starved for input → device_idle_frac.
        t0 = time.perf_counter()
        pipe = StreamingPipeline(paths, input_size=args.input_size,
                                 batch_size=args.batch,
                                 num_threads=args.threads)
        total_dets = 0
        wait_s = 0.0
        it = iter(pipe)
        while True:
            tw = time.perf_counter()
            try:
                canv, infos_b, _ = next(it)
            except StopIteration:
                break
            wait_s += time.perf_counter() - tw
            dets = det.detect_prepared(canv, infos_b, conf_thres=0.3)
            total_dets += sum(len(d) for d in dets)
        pipe_dt = time.perf_counter() - t0
        pipe_ips = len(paths) / pipe_dt

    print(json.dumps({
        "decode_only_img_s": round(decode_ips, 1),
        "device_only_img_s": round(device_ips, 1),
        "serial_img_s": round(serial_ips, 1),
        "pipelined_img_s": round(pipe_ips, 1),
        "overlap_speedup": round(pipe_ips / max(serial_ips, 1e-9), 3),
        "bound": round(min(decode_ips, device_ips), 1),
        "device_idle_frac": round(wait_s / pipe_dt, 3),
        "batch": args.batch,
        "total_dets": total_dets,
    }))


def run_synthetic(args) -> None:
    """Overlap-mechanism proof with synthetic decode + device stages.

    sleep() releases the GIL exactly like libjpeg's decode loop, so N
    decode threads genuinely run concurrently even on a 1-core host —
    this isolates the PIPELINE's overlap behavior from CPU capacity.
    """
    import time as _t

    from mydetection_tpu.data.loader import StreamingPipeline
    from mydetection_tpu.utils.image_ops import LetterboxInfo

    size = args.input_size
    dec_ms = args.synthetic_decode_ms
    dev_ms = args.synthetic_device_ms or 0.0
    canvas = np.zeros((size, size, 3), np.uint8)
    info = LetterboxInfo(size, size, 1.0, 0, 0, size)

    def fake_decode(path):
        _t.sleep(dec_ms / 1000.0)
        return canvas, info

    paths = [f"synthetic://{i}" for i in range(args.images)]
    n_batches = -(-len(paths) // args.batch)

    # serial: decode a batch, then "device" it, strictly alternating
    t0 = _t.perf_counter()
    for start in range(0, len(paths), args.batch):
        for _ in paths[start:start + args.batch]:
            fake_decode(None)
        _t.sleep(dev_ms / 1000.0)
    serial_dt = _t.perf_counter() - t0

    # pipelined
    pipe = StreamingPipeline(paths, input_size=size, batch_size=args.batch,
                             num_threads=args.threads, device_put=False,
                             load_fn=fake_decode)
    t0 = _t.perf_counter()
    wait_s = 0.0
    it = iter(pipe)
    while True:
        tw = _t.perf_counter()
        try:
            next(it)
        except StopIteration:
            break
        wait_s += _t.perf_counter() - tw
        _t.sleep(dev_ms / 1000.0)
    pipe_dt = _t.perf_counter() - t0

    decode_bound = len(paths) * dec_ms / 1000.0 / args.threads
    device_bound = n_batches * dev_ms / 1000.0
    print(json.dumps({
        "synthetic": True,
        "decode_ms_per_img": dec_ms,
        "device_ms_per_batch": dev_ms,
        "threads": args.threads,
        "serial_s": round(serial_dt, 3),
        "pipelined_s": round(pipe_dt, 3),
        "ideal_overlap_s": round(max(decode_bound, device_bound), 3),
        "overlap_speedup": round(serial_dt / max(pipe_dt, 1e-9), 3),
        "device_idle_frac": round(wait_s / pipe_dt, 3),
    }))


if __name__ == "__main__":
    main()
