"""Data layer tests: COCO dataset parsing, augmentation label math,
threaded loader determinism + ordering (SURVEY.md §4 / §5.2)."""

import json

import numpy as np
import pytest
from PIL import Image

from mydetection_tpu.data.coco import CocoDataset, letterbox_labels
from mydetection_tpu.data.loader import StreamingPipeline, TrainLoader, _ThreadPool
from mydetection_tpu.data.transforms import hflip, hsv_jitter, rotate, vflip


@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(6):
        w, h = int(rng.randint(80, 200)), int(rng.randint(80, 200))
        arr = rng.randint(0, 255, (h, w, 3), np.uint8)
        Image.fromarray(arr).save(root / f"img{i}.jpg")
        images.append({"id": i, "file_name": f"img{i}.jpg",
                       "width": w, "height": h})
        for j in range(int(rng.randint(0, 4))):
            bw, bh = float(rng.uniform(10, 30)), float(rng.uniform(10, 30))
            x = float(rng.uniform(0, w - bw))
            y = float(rng.uniform(0, h - bh))
            annotations.append({
                "id": len(annotations), "image_id": i,
                "category_id": int(rng.choice([1, 3, 7])),
                "bbox": [x, y, bw, bh], "area": bw * bh, "iscrowd": 0,
            })
    gt = {"images": images, "annotations": annotations,
          "categories": [{"id": c, "name": f"c{c}"} for c in (1, 3, 7)]}
    with open(root / "ann.json", "w") as fh:
        json.dump(gt, fh)
    return root


def test_dataset_parsing_and_remap(coco_dir):
    ds = CocoDataset(str(coco_dir / "ann.json"), str(coco_dir))
    assert len(ds) == 6
    assert ds.num_classes == 3
    assert ds.cat_to_contig == {1: 0, 3: 1, 7: 2}
    item = ds[0]
    assert item["image"].ndim == 3
    assert item["boxes"].shape[1] == 4
    assert (item["classes"] < 3).all()
    # cxcywh conversion: centers inside the image
    if len(item["boxes"]):
        h, w = item["image"].shape[:2]
        assert (item["boxes"][:, 0] <= w).all()
        assert (item["boxes"][:, 1] <= h).all()


def test_rotated_dataset_mode(coco_dir):
    gt = json.load(open(coco_dir / "ann.json"))
    for ann in gt["annotations"]:
        bb = ann["bbox"]
        ann["bbox"] = [bb[0] + bb[2] / 2, bb[1] + bb[3] / 2, bb[2], bb[3], 45.0]
    ds = CocoDataset(gt, str(coco_dir), rotated=True)
    item = ds[0]
    if len(item["boxes"]):
        assert item["boxes"].shape[1] == 5
        np.testing.assert_allclose(item["boxes"][:, 4], np.radians(45))


def test_flips_roundtrip():
    img = np.random.RandomState(0).randint(0, 255, (40, 60, 3), np.uint8)
    boxes = np.array([[10.0, 20, 8, 6, 0.5]], np.float32)
    img2, b2 = hflip(*hflip(img, boxes))
    np.testing.assert_array_equal(img2, img)
    np.testing.assert_allclose(b2, boxes)
    img3, b3 = vflip(img, boxes)
    assert b3[0, 1] == 40 - 20
    assert b3[0, 4] == -0.5


def test_rotation_exact_for_rotated_boxes():
    img = np.zeros((100, 100, 3), np.uint8)
    boxes = np.array([[70.0, 50, 20, 10, 0.2]], np.float32)
    out_img, out, keep = rotate(img, boxes, 90.0)
    # CCW 90°: point (70,50) about center (50,50) -> (50, 30)
    np.testing.assert_allclose(out[0, :2], [50, 30], atol=1e-4)
    # θ decreases by π/2, wrapped into (-π/2, π/2]
    expect = np.mod(0.2 - np.pi / 2 + np.pi / 2, np.pi) - np.pi / 2
    np.testing.assert_allclose(out[0, 4], expect, atol=1e-6)
    assert out_img.shape == img.shape
    assert keep.all() and len(out) == 1


def test_rotation_drops_offcanvas_boxes_with_classes():
    """Objects whose center rotates off the uncropped canvas are
    dropped, and parallel class arrays are filtered in lockstep."""
    from mydetection_tpu.data.transforms import random_augment

    img = np.zeros((100, 100, 3), np.uint8)
    # corner object: rotating 45° about the center pushes its center
    # off-canvas; center object survives any rotation
    boxes = np.array([[97.0, 97, 10, 10, 0.0], [50.0, 50, 10, 10, 0.0]],
                     np.float32)
    _, out, keep = rotate(img, boxes, 45.0)
    assert len(out) == 1 and keep.tolist() == [False, True]
    np.testing.assert_allclose(out[0, :2], [50, 50], atol=1e-4)

    classes = np.array([3, 7], np.int32)
    rng = np.random.RandomState(0)
    for _ in range(20):  # rotation fires with prob 1; angle random
        _, b, c = random_augment(img, boxes, rng, rotated=True,
                                 rotate_prob=1.0, classes=classes)
        assert len(b) == len(c)  # never desynchronized
        if len(b) == 1:
            assert c[0] == 7  # the surviving center object's class


def test_hsv_jitter_preserves_shape_dtype():
    img = np.random.RandomState(0).randint(0, 255, (32, 32, 3), np.uint8)
    out = hsv_jitter(img, np.random.RandomState(1))
    assert out.shape == img.shape and out.dtype == np.uint8


def test_threadpool_ordered_and_exception():
    import time

    def slow_square(i):
        time.sleep(0.001 * ((7 - i) % 5))  # adversarial scheduling
        return i * i

    out = list(_ThreadPool(slow_square, range(20), num_threads=4, prefetch=4))
    assert out == [i * i for i in range(20)]

    def boom(i):
        if i == 3:
            raise ValueError("boom")
        return i

    with pytest.raises(ValueError, match="boom"):
        list(_ThreadPool(boom, range(8), num_threads=2, prefetch=2))


def test_streaming_pipeline_batches(coco_dir):
    paths = [str(coco_dir / f"img{i}.jpg") for i in range(6)]
    pipe = StreamingPipeline(paths, input_size=64, batch_size=4,
                             num_threads=2, device_put=False)
    batches = list(pipe)
    assert len(batches) == 2
    canv, infos, bpaths = batches[0]
    assert canv.shape == (4, 64, 64, 3) and canv.dtype == np.uint8
    assert len(infos) == 4 and bpaths == paths[:4]
    canv2, infos2, bpaths2 = batches[1]
    assert canv2.shape == (4, 64, 64, 3)  # padded to full batch
    assert len(infos2) == 2 and bpaths2 == paths[4:]


def test_train_loader_batches_and_determinism(coco_dir):
    ds = CocoDataset(str(coco_dir / "ann.json"), str(coco_dir))
    def batches():
        loader = TrainLoader(ds, batch_size=2, sizes=[64, 96], max_gt=10,
                             num_threads=3, seed=7, device_put=False)
        return list(loader.epoch(0))
    b1, b2 = batches(), batches()
    assert len(b1) == 3
    for (i1, gb1, gc1, gv1, s1), (i2, gb2, gc2, gv2, s2) in zip(b1, b2):
        assert s1 == s2 and i1.shape == (2, s1, s1, 3)
        np.testing.assert_array_equal(i1, i2)  # thread-schedule independent
        np.testing.assert_allclose(gb1, gb2)
        np.testing.assert_array_equal(gv1, gv2)
    # labels inside the canvas
    for imgs, gb, gc, gv, size in b1:
        assert (gb[gv][:, 0] >= 0).all() and (gb[gv][:, 0] <= size).all()


def test_train_loader_rotated_applies_rotation(coco_dir):
    """Rotated loaders default rotate_prob=0.5 — the fisheye rotation
    augmentation must actually fire in the train path (VERDICT r1 #4)."""
    gt = json.load(open(coco_dir / "ann.json"))
    for ann in gt["annotations"]:
        bb = ann["bbox"]
        ann["bbox"] = [bb[0] + bb[2] / 2, bb[1] + bb[3] / 2, bb[2], bb[3], 0.0]
    ds = CocoDataset(gt, str(coco_dir), rotated=True)

    def thetas(prob):
        loader = TrainLoader(ds, batch_size=2, sizes=[64], max_gt=10,
                             num_threads=2, rotated=True, rotate_prob=prob,
                             seed=3, device_put=False)
        out = []
        for _, gb, _, gv, _ in loader.epoch(0):
            out.extend(gb[gv][:, 4].tolist())
        return np.asarray(out)

    assert TrainLoader(ds, batch_size=2, sizes=[64], rotated=True,
                       device_put=False).rotate_prob == 0.5
    assert TrainLoader(ds, batch_size=2, sizes=[64], rotated=False,
                       device_put=False).rotate_prob == 0.0
    th_off = thetas(0.0)
    th_on = thetas(1.0)
    # all GT start at θ=0: rotation must move some θ away from 0
    assert np.allclose(th_off, 0.0)
    assert (np.abs(th_on) > 1e-3).any()


def test_streaming_pipeline_overlaps_decode_with_consumer():
    """Overlap proof for the pipeline mechanism (VERDICT r2 #5): with a
    synthetic GIL-free decode (sleep, like libjpeg) and a consumer that
    also sleeps, pipelined wall time must approach
    max(decode_bound, consumer_bound) — NOT their sum — and the
    consumer must spend most of its time computing, not starved."""
    import time

    from mydetection_tpu.utils.image_ops import LetterboxInfo

    size, batch, threads = 32, 4, 4
    n_images = 24
    dec_ms, dev_ms = 20.0, 10.0
    canvas = np.zeros((size, size, 3), np.uint8)
    info = LetterboxInfo(size, size, 1.0, 0, 0, size)

    def fake_decode(path):
        time.sleep(dec_ms / 1000.0)
        return canvas, info

    pipe = StreamingPipeline([f"s://{i}" for i in range(n_images)],
                             input_size=size, batch_size=batch,
                             num_threads=threads, device_put=False,
                             load_fn=fake_decode)
    t0 = time.perf_counter()
    wait_s, n_batches = 0.0, 0
    it = iter(pipe)
    while True:
        tw = time.perf_counter()
        try:
            next(it)
        except StopIteration:
            break
        wait_s += time.perf_counter() - tw
        n_batches += 1
        time.sleep(dev_ms / 1000.0)  # consumer (device) stage
    total = time.perf_counter() - t0

    assert n_batches == n_images // batch
    decode_bound = n_images * dec_ms / 1000.0 / threads  # 0.12 s
    consumer_time = n_batches * dev_ms / 1000.0          # 0.06 s
    serial_sum = n_images * dec_ms / 1000.0 + consumer_time  # 0.54 s
    # overlapped: well under the serial sum, near the decode bound
    # (generous 2.5x margin absorbs 1-core scheduling jitter)
    assert total < 0.65 * serial_sum, (total, serial_sum)
    assert total < 2.5 * max(decode_bound, consumer_time), (
        total, decode_bound, consumer_time)
    # the consumer is the bottleneck's complement: idle time is bounded
    # by the decode/consumer imbalance, never ~100%
    assert wait_s / total < 0.8, (wait_s, total)


def test_train_loader_visits_every_index(coco_dir):
    """The tail `len(ds) % batch` images are not silently dropped: the
    final batch is padded by cycling the permutation (VERDICT r2 #6)."""
    ds = CocoDataset(str(coco_dir / "ann.json"), str(coco_dir))
    assert len(ds) == 6
    loader = TrainLoader(ds, batch_size=4, sizes=[64], max_gt=10,
                         num_threads=2, augment=False, seed=1,
                         device_put=False)
    batches = list(loader.epoch(0))
    assert len(batches) == 2  # ceil(6/4), not floor
    # recover visited dataset indices by matching letterboxed images
    canon = {}
    from mydetection_tpu.utils.image_ops import letterbox_np
    for i in range(len(ds)):
        canvas, _ = letterbox_np(ds[i]["image"], 64)
        canon[canvas.tobytes()] = i
    visited = [canon[img.tobytes()]
               for imgs, *_ in batches for img in imgs]
    assert set(visited) == set(range(6))  # every index every epoch
    assert len(visited) == 8  # 2 static-shape batches of 4


def test_train_loader_dataset_smaller_than_batch(coco_dir):
    """len(ds) < batch_size must still yield one full cycled batch —
    not zero batches (train.py would otherwise spin through empty
    epochs forever)."""
    ds = CocoDataset(str(coco_dir / "ann.json"), str(coco_dir))
    assert len(ds) == 6
    loader = TrainLoader(ds, batch_size=16, sizes=[64], max_gt=10,
                         num_threads=2, augment=False, seed=1,
                         device_put=False)
    batches = list(loader.epoch(0))
    assert len(batches) == 1
    imgs = batches[0][0]
    assert imgs.shape[0] == 16  # static batch shape, cycled content
    from mydetection_tpu.utils.image_ops import letterbox_np
    canon = {}
    for i in range(len(ds)):
        canvas, _ = letterbox_np(ds[i]["image"], 64)
        canon[canvas.tobytes()] = i
    visited = [canon[img.tobytes()] for img in imgs]
    assert set(visited) == set(range(6))  # every image appears


def test_random_augment_requires_classes_when_rotating():
    """rotate_prob>0 without classes is a silent-desync hazard for
    callers holding parallel arrays — rejected loudly (ADVICE r2)."""
    from mydetection_tpu.data.transforms import random_augment

    img = np.zeros((32, 32, 3), np.uint8)
    boxes = np.array([[16.0, 16, 8, 8, 0.0]], np.float32)
    with pytest.raises(ValueError, match="classes"):
        random_augment(img, boxes, np.random.RandomState(0),
                       rotated=True, rotate_prob=1.0, classes=None)
    # rotate_prob == 0 keeps the classes-free call path working
    _, b, c = random_augment(img, boxes, np.random.RandomState(0),
                             rotated=True, rotate_prob=0.0, classes=None)
    assert c is None and len(b) == 1


def test_fisheye_adapters(tmp_path, coco_dir):
    """Named CEPDOF/MW-R/HABBOF on-ramps (SURVEY.md §2.11): COCO-style
    rotated JSON adapters + the HABBOF per-frame txt layout."""
    from mydetection_tpu.data import fisheye

    # CEPDOF / MW-R: rotated 5-element-bbox COCO JSON
    gt = json.load(open(coco_dir / "ann.json"))
    for ann in gt["annotations"]:
        bb = ann["bbox"]
        ann["bbox"] = [bb[0] + bb[2] / 2, bb[1] + bb[3] / 2, bb[2], bb[3], 30.0]
    ds = fisheye.cepdof(gt, str(coco_dir))
    item = ds[0]
    if len(item["boxes"]):
        assert item["boxes"].shape[1] == 5
        np.testing.assert_allclose(item["boxes"][:, 4], np.radians(30))
    assert fisheye.mw_r(gt, str(coco_dir)).rotated

    # HABBOF: frames + per-frame txt "person cx cy w h degrees"
    root = tmp_path / "habbof"
    root.mkdir()
    img = np.random.RandomState(0).randint(0, 255, (80, 100, 3), np.uint8)
    Image.fromarray(img).save(root / "f000.jpg")
    Image.fromarray(img).save(root / "f001.jpg")
    (root / "f000.txt").write_text(
        "person 50 40 20 30 45\n30 20 10 12 -15\n")  # class token optional
    ds = fisheye.HabbofDataset(str(root))
    assert len(ds) == 2
    a = ds[0]
    assert a["boxes"].shape == (2, 5)
    np.testing.assert_allclose(a["boxes"][0], [50, 40, 20, 30, np.radians(45)])
    np.testing.assert_allclose(a["boxes"][1, 4], np.radians(-15))
    assert len(ds[1]["boxes"]) == 0  # missing txt → empty labels
    (root / "f001.txt").write_text("garbage line\n")
    with pytest.raises(ValueError, match="cx cy w h"):
        ds[1]
    with pytest.raises(ValueError, match="no images"):
        fisheye.HabbofDataset(str(tmp_path / "empty-nowhere"))


def test_letterbox_labels_math():
    boxes = np.array([[100.0, 50, 40, 20]], np.float32)
    out = letterbox_labels(boxes, ratio=0.5, pad_x=10, pad_y=20)
    np.testing.assert_allclose(out[0], [60, 45, 20, 10])


def test_train_loader_rejects_empty_dataset():
    import pytest

    class Empty:
        def __len__(self):
            return 0

    with pytest.raises(ValueError, match="dataset is empty"):
        TrainLoader(Empty(), batch_size=4, sizes=[64], max_gt=4,
                    device_put=False)


def test_habbof_numeric_class_token(tmp_path):
    """6-token lines with a NUMERIC leading class id ('0 cx cy w h deg')
    must strip the class token — previously the class id was consumed
    as cx and the angle silently dropped."""
    from mydetection_tpu.data import fisheye

    root = tmp_path / "habbof-num"
    root.mkdir()
    img = np.random.RandomState(1).randint(0, 255, (60, 60, 3), np.uint8)
    Image.fromarray(img).save(root / "a.jpg")
    (root / "a.txt").write_text("0 512.5 200.25 55 110 12.5\n")
    item = fisheye.HabbofDataset(str(root))[0]
    np.testing.assert_allclose(
        item["boxes"][0], [512.5, 200.25, 55, 110, np.radians(12.5)],
        rtol=1e-6)


def test_habbof_no_annotations_resolved_raises(tmp_path):
    """If NO frame's annotation file resolves, init fails readably
    instead of training against silently-empty labels."""
    from mydetection_tpu.data import fisheye

    root = tmp_path / "habbof-noann"
    root.mkdir()
    img = np.zeros((40, 40, 3), np.uint8)
    Image.fromarray(img).save(root / "a.jpg")
    with pytest.raises(ValueError, match="no annotation"):
        fisheye.HabbofDataset(str(root))


def test_threadpool_released_on_abandoned_iterator():
    """Breaking out of a pool-backed stream must release the workers
    (they used to spin in the backpressure wait forever, pinning the
    reorder buffer)."""
    import threading
    import time

    before = threading.active_count()
    pool = _ThreadPool(lambda i: i * i, range(500), num_threads=3,
                       prefetch=1)
    it = iter(pool)
    assert next(it) == 0
    it.close()  # what a consumer's break/GC does to the generator
    deadline = time.time() + 10
    while time.time() < deadline:
        if all(not t.is_alive() for t in pool._threads):
            break
        time.sleep(0.05)
    assert all(not t.is_alive() for t in pool._threads)
    assert threading.active_count() <= before


def test_coco_unknown_category_id_raises(coco_dir):
    """An annotation with a category_id absent from categories fails
    readably instead of silently becoming class 0."""
    gt = json.load(open(coco_dir / "ann.json"))
    if not gt["annotations"]:
        pytest.skip("fixture has no annotations")
    gt["annotations"][0]["category_id"] = 9999
    ds = CocoDataset(gt, str(coco_dir))
    bad_img = gt["annotations"][0]["image_id"]
    with pytest.raises(ValueError, match="category_id=9999"):
        ds.load_labels(bad_img)
