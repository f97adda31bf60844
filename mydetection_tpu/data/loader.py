"""Host-pipelined data loading: threaded decode + device prefetch.

The reference uses multiprocess `DataLoader` workers (fork) for
decode+augment — the only process boundary in that codebase [recalled;
SURVEY.md §2.P]. TPU-native equivalent [spec]: a host THREAD pool
(PIL/numpy release the GIL for the heavy parts) feeding a bounded
queue, with `jax.device_put` double-buffering so the accelerator never
stalls on input ("batched streaming inference pipelines the host JPEG
decode against device compute so the TPU never stalls").

Two front-ends:
  * `StreamingPipeline` — inference: image paths → ready device batches
    (letterboxed uint8 canvases + LetterboxInfo list).
  * `TrainLoader` — training: dataset → (images, gt_boxes, gt_classes,
    gt_valid) batches with augmentation + multi-scale size buckets.

Determinism: each item's augmentation RNG is seeded by (epoch, index),
so results are independent of thread scheduling (SURVEY.md §5.2 —
deterministic-order assertion is in tests/test_data.py).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Sequence

import numpy as np

from mydetection_tpu.data.coco import letterbox_labels
from mydetection_tpu.data.transforms import random_augment
from mydetection_tpu.utils.image_ops import LetterboxInfo, letterbox_np

_STOP = object()


class _ThreadPool:
    """Ordered map over an index stream with N worker threads.

    Workers pull indices, compute `fn(index)`, and results are yielded
    IN ORDER (a reorder buffer keeps the output deterministic while
    decode parallelism stays unordered underneath).
    """

    def __init__(self, fn: Callable[[int], object], indices: Iterable[int],
                 num_threads: int, prefetch: int):
        self._fn = fn
        self._in: queue.Queue = queue.Queue()
        self._done: dict[int, object] = {}
        self._done_lock = threading.Condition()
        self._indices = list(indices)
        self._max_ahead = max(prefetch, num_threads) * 2
        self._next_emit = 0
        self._closed = False
        self._errors: list[BaseException] = []
        for pos, idx in enumerate(self._indices):
            self._in.put((pos, idx))
        for _ in range(num_threads):
            self._in.put(_STOP)
        self._threads = [threading.Thread(target=self._worker, daemon=True)
                         for _ in range(num_threads)]
        for t in self._threads:
            t.start()

    def _worker(self):
        while True:
            item = self._in.get()
            if item is _STOP:
                return
            pos, idx = item
            # backpressure: don't run far ahead of the consumer
            with self._done_lock:
                while (pos - self._next_emit > self._max_ahead
                       and not self._errors and not self._closed):
                    self._done_lock.wait(timeout=0.5)
                if self._errors or self._closed:
                    # another worker failed (consumer is about to
                    # raise) or the consumer abandoned the stream:
                    # stop instead of spinning forever in the
                    # backpressure wait with the reorder buffer pinned
                    return
            try:
                result = self._fn(idx)
            except BaseException as e:  # surfaced on the consumer side
                with self._done_lock:
                    self._errors.append(e)
                    self._done_lock.notify_all()
                return
            with self._done_lock:
                self._done[pos] = result
                self._done_lock.notify_all()

    def close(self):
        """Release the workers. Called automatically when the iterator
        finishes OR is abandoned (generator finally) — without it, a
        consumer breaking out mid-stream (train.py's iteration cap,
        a partially-read StreamingPipeline) left every worker waiting
        in the backpressure loop forever with the reorder buffer
        pinned in memory."""
        with self._done_lock:
            self._closed = True
            self._done_lock.notify_all()

    def __iter__(self):
        try:
            for pos in range(len(self._indices)):
                with self._done_lock:
                    while pos not in self._done and not self._errors:
                        self._done_lock.wait()
                    if self._errors:
                        raise self._errors[0]
                    result = self._done.pop(pos)
                    self._next_emit = pos + 1
                    self._done_lock.notify_all()
                yield result
        finally:
            self.close()


class StreamingPipeline:
    """Paths → device-ready letterboxed batches, decode overlapped.

    Usage:
        pipe = StreamingPipeline(paths, input_size=416, batch_size=64)
        for canvases_dev, infos, paths_batch in pipe:
            out = detect_fn(params, canvases_dev)
    Batches are padded to `batch_size` by repeating the last image
    (static shapes for jit); `infos` carries the true count.
    """

    def __init__(self, paths: Sequence[str], *, input_size: int,
                 batch_size: int = 64, num_threads: int = 4,
                 device_put: bool = True, native: str | bool = "auto",
                 load_fn: Callable[[str], tuple] | None = None,
                 pack_s2d2: bool = False):
        self.paths = list(paths)
        self.input_size = input_size
        self.batch_size = batch_size
        self.num_threads = num_threads
        self.device_put = device_put
        # stage batches host-packed as S2D-2 (B, S/2, S/2, 12) uint8 —
        # the TPU darknet-family fast-path layout (Detector._pack_input;
        # utils/image_ops.pack_s2d2). detect_prepared consumes either.
        self.pack_s2d2 = pack_s2d2
        # load_fn(path) -> (canvas u8 (S,S,3), LetterboxInfo) overrides
        # the decoder — benchmarks use it to bound overlap with a
        # synthetic (sleep) decode independent of this host's CPU.
        self.load_fn = load_fn
        # native C++ decode+letterbox (mydetection_tpu.native): ~1.4-2x
        # faster than PIL and GIL-free for the whole call; "auto" uses
        # it when the library builds, falling back per-image on non-JPEG
        # inputs. False forces the PIL path (bit-consistency runs).
        if native == "auto":
            from mydetection_tpu import native as native_mod

            self._native = native_mod if native_mod.available() else None
        elif native:
            from mydetection_tpu import native as native_mod

            self._native = native_mod
        else:
            self._native = None

    def _load(self, i: int):
        if self.load_fn is not None:
            return self.load_fn(self.paths[i])
        if self._native is not None:
            try:
                return self._native.decode_letterbox_file(
                    self.paths[i], self.input_size)
            except (ValueError, RuntimeError):
                pass  # non-JPEG or decode failure: PIL fallback
        from PIL import Image

        img = Image.open(self.paths[i]).convert("RGB")
        canvas, info = letterbox_np(np.asarray(img), self.input_size)
        return canvas, info

    def __iter__(self):
        import jax

        pool = _ThreadPool(self._load, range(len(self.paths)),
                           self.num_threads, prefetch=2 * self.batch_size)
        it = iter(pool)
        pending = None  # double buffer: one device batch in flight
        batch_canvases: list[np.ndarray] = []
        batch_infos: list[LetterboxInfo] = []
        batch_paths: list[str] = []
        pos = 0

        def flush():
            nonlocal batch_canvases, batch_infos, batch_paths
            real = len(batch_canvases)
            if real == 0:
                return None
            while len(batch_canvases) < self.batch_size:
                batch_canvases.append(batch_canvases[-1])
            arr = np.stack(batch_canvases)
            if self.pack_s2d2:
                from mydetection_tpu.utils.image_ops import pack_s2d2
                arr = pack_s2d2(arr)
            dev = jax.device_put(arr) if self.device_put else arr
            out = (dev, batch_infos, batch_paths)
            batch_canvases, batch_infos, batch_paths = [], [], []
            return out

        try:
            for canvas, info in it:
                batch_canvases.append(canvas)
                batch_infos.append(info)
                batch_paths.append(self.paths[pos])
                pos += 1
                if len(batch_canvases) == self.batch_size:
                    ready = flush()
                    if pending is not None:
                        yield pending
                    pending = ready
            tail = flush()
            if pending is not None:
                yield pending
            if tail is not None:
                yield tail
        finally:
            pool.close()  # consumer may abandon the stream mid-batch


class TrainLoader:
    """Dataset → augmented, letterboxed, padded label batches.

    Iterates epochs indefinitely; `sizes` is the multi-scale bucket
    list — a new size is drawn every `rescale_every` batches
    (reference idiom: every ~10 iterations [recalled; SURVEY.md §2.12]),
    which on TPU means switching between a small set of pre-compiled
    graphs rather than recompiling.
    """

    def __init__(self, dataset, *, batch_size: int, sizes: Sequence[int],
                 max_gt: int = 100, num_threads: int = 4, augment: bool = True,
                 rotated: bool = False, rotate_prob: float | None = None,
                 rescale_every: int = 10, seed: int = 0,
                 device_put: bool = True):
        if len(dataset) == 0:
            raise ValueError(
                "TrainLoader: dataset is empty — every epoch would "
                "yield zero batches and the training loop would spin "
                "forever (check the annotation file / skip_empty)")
        self.ds = dataset
        self.batch_size = batch_size
        self.sizes = list(sizes)
        self.max_gt = max_gt
        self.num_threads = num_threads
        self.augment = augment
        self.rotated = rotated
        # arbitrary-rotation augmentation is the key symmetry for
        # overhead-fisheye rotated boxes (SURVEY.md §2.11): default it
        # ON for rotated datasets, OFF for axis-aligned ones (where the
        # enclosing-box approximation would degrade labels).
        self.rotate_prob = (0.5 if rotated else 0.0) \
            if rotate_prob is None else float(rotate_prob)
        self.rescale_every = rescale_every
        self.seed = seed
        self.device_put = device_put

    def _load(self, work: tuple[int, int, int]):
        epoch, index, size = work
        item = self.ds[index]
        image, boxes, classes = item["image"], item["boxes"], item["classes"]
        if self.augment:
            rng = np.random.RandomState(
                (self.seed * 9_999_991 + epoch * 1_000_003 + index) % (2 ** 31))
            image, boxes, classes = random_augment(
                image, boxes, rng, rotated=self.rotated,
                rotate_prob=self.rotate_prob, classes=classes)
        canvas, info = letterbox_np(image, size)
        boxes = letterbox_labels(boxes, info.ratio, info.pad_x, info.pad_y)
        return canvas, boxes, classes

    def epoch(self, epoch_idx: int):
        """One epoch of batches: (images u8, gt_boxes, gt_classes, gt_valid, size)."""
        import jax

        rng = np.random.RandomState(self.seed + epoch_idx)
        order = rng.permutation(len(self.ds))
        # every index is visited every epoch: the tail `len % batch`
        # images form a final batch padded (to the static batch shape)
        # by cycling the permutation — real images with real labels,
        # never silently dropped. np.resize cycles as many times as
        # needed, so datasets SMALLER than one batch still yield a full
        # batch (duplicates within a batch are valid samples) instead
        # of zero batches.
        total = len(order) + (-len(order)) % self.batch_size
        if total != len(order) and len(order):
            order = np.resize(order, total)
        nb = len(order) // self.batch_size
        sizes = []
        size = self.sizes[0]
        for bi in range(nb):
            if bi % self.rescale_every == 0:
                size = self.sizes[int(rng.randint(len(self.sizes)))]
            sizes.append(size)
        work = [(epoch_idx, int(order[bi * self.batch_size + j]), sizes[bi])
                for bi in range(nb) for j in range(self.batch_size)]
        pool = _ThreadPool(lambda w: self._load(work[w]), range(len(work)),
                           self.num_threads, prefetch=2 * self.batch_size)
        it = iter(pool)

        dim = 5 if self.rotated else 4
        try:
            yield from self._batches(it, sizes, nb, dim)
        finally:
            pool.close()  # train loops break out at an iteration cap

    def _batches(self, it, sizes, nb, dim):
        import jax

        for bi in range(nb):
            canvases, all_boxes, all_classes = [], [], []
            for _ in range(self.batch_size):
                c, b, cl = next(it)
                canvases.append(c)
                all_boxes.append(b)
                all_classes.append(cl)
            gt_boxes = np.zeros((self.batch_size, self.max_gt, dim), np.float32)
            gt_classes = np.zeros((self.batch_size, self.max_gt), np.int32)
            gt_valid = np.zeros((self.batch_size, self.max_gt), bool)
            for j, (b, cl) in enumerate(zip(all_boxes, all_classes)):
                k = min(len(b), self.max_gt)
                if k:
                    gt_boxes[j, :k] = b[:k]
                    gt_classes[j, :k] = cl[:k]
                    gt_valid[j, :k] = True
            images = np.stack(canvases)
            if self.device_put:
                images = jax.device_put(images)
            yield images, gt_boxes, gt_classes, gt_valid, sizes[bi]

    def __iter__(self):
        epoch_idx = 0
        while True:
            yield from self.epoch(epoch_idx)
            epoch_idx += 1
