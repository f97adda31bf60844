"""AOT export round-trip: the serialized StableHLO artifact must serve
bit-identical detections WITHOUT running any model-building code.

Reference context: the reference serves from code + checkpoint
(SURVEY.md §2.1/§3.1); the TPU-native production artifact is the
compiled pipeline itself (mydetection_tpu/export.py). These tests pin
the round-trip on the CPU backend (oracle-NMS path — no custom calls,
so the artifact sits fully inside jax.export's stability guarantees).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mydetection_tpu import Detector
from mydetection_tpu.export import export_detector, load_exported

RNG = np.random.RandomState(7)
IMG = RNG.randint(0, 255, (97, 140, 3), np.uint8)  # non-square: real letterbox
IMGS = [RNG.randint(0, 255, (80 + 7 * i, 100, 3), np.uint8) for i in range(3)]


@pytest.fixture(scope="module")
def det():
    # small everything keeps the fused CPU compile fast
    return Detector(model_name="yolov3", input_size=128, num_classes=3,
                    compute_dtype=jnp.float32, use_pallas=False,
                    pre_nms=64, max_dets=10)


@pytest.fixture(scope="module")
def artifact(det, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("export") / "yolov3.mydet")
    export_detector(det, path, batch_size=2)
    return path


def _assert_same(a, b):
    assert len(a) == len(b)
    np.testing.assert_allclose(a.boxes_xyxy, b.boxes_xyxy, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(a.scores, b.scores, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(a.classes, b.classes)
    if a.boxes_rot is not None:
        np.testing.assert_allclose(a.boxes_rot, b.boxes_rot,
                                   rtol=1e-5, atol=1e-4)


def test_roundtrip_detect_one(det, artifact):
    served = load_exported(artifact)
    assert served.meta["model"] == "yolov3"
    assert served.meta["batch_size"] == 2
    want = det.detect_one(np_img=IMG, conf_thres=0.3)
    got = served.detect_one(np_img=IMG, conf_thres=0.3)
    assert len(got) > 0, "random-init yolov3 at conf 0.3 should detect"
    _assert_same(want, got)


def test_roundtrip_batch_chunking(det, artifact):
    """3 images through an exported batch-2 graph: two chunks, the tail
    chunk padded — padded-row outputs must not leak into results."""
    served = load_exported(artifact)
    want = det.detect_batch(IMGS, conf_thres=0.3)
    got = served.detect_batch(IMGS, conf_thres=0.3)
    assert len(got) == 3
    for w, g in zip(want, got):
        _assert_same(w, g)


def test_conf_thres_stays_dynamic(det, artifact):
    """conf_thres is a traced scalar, not baked: raising it must shrink
    the detection set on the SAME deserialized artifact."""
    served = load_exported(artifact)
    lo = served.detect_one(np_img=IMG, conf_thres=0.05)
    hi = served.detect_one(np_img=IMG, conf_thres=0.9)
    assert len(hi) <= len(lo)
    # default conf comes from metadata when not passed
    assert served.meta["conf_thres"] == pytest.approx(det.cfg.conf_thres)
    served.detect_one(np_img=IMG)  # must not raise


def test_rotated_roundtrip(tmp_path):
    det = Detector(model_name="rapid", input_size=128,
                   compute_dtype=jnp.float32, use_pallas=False,
                   pre_nms=32, max_dets=8)
    path = str(tmp_path / "rapid.mydet")
    export_detector(det, path, batch_size=1)
    served = load_exported(path)
    assert served.meta["rotated"] is True
    want = det.detect_one(np_img=IMG, conf_thres=0.3)
    got = served.detect_one(np_img=IMG, conf_thres=0.3)
    _assert_same(want, got)


def test_multi_bucket_and_parity_surface(det, tmp_path):
    """A (1, 2)-bucket artifact serves 3 images as one full batch-2
    chunk plus one batch-1 chunk (no padding waste), and the serving
    surface matches Detector: detect_imgSeq, visualize, warmup."""
    path = str(tmp_path / "multi.mydet")
    export_detector(det, path, batch_size=(1, 2))
    served = load_exported(path)
    assert served.batch_sizes == [1, 2]
    assert served.meta["batch_sizes"] == [1, 2]
    assert served._chunks(3) == [(2, 2), (1, 1)]
    assert served._chunks(1) == [(1, 1)]
    served.warmup()

    want = det.detect_batch(IMGS, conf_thres=0.3)
    got = served.detect_batch(IMGS, conf_thres=0.3)
    for w, g in zip(want, got):
        _assert_same(w, g)

    # detect_imgSeq parity via paths
    from PIL import Image
    paths = []
    for i, im in enumerate(IMGS):
        p = str(tmp_path / f"im{i}.png")
        Image.fromarray(im).save(p)
        paths.append(p)
    seq = served.detect_imgSeq(paths, conf_thres=0.3)
    for w, g in zip(want, seq):
        _assert_same(w, g)

    vis_path = str(tmp_path / "vis.png")
    dets = served.detect_one(np_img=IMG, conf_thres=0.3, visualize=True,
                             save_path=vis_path)
    assert dets.visualized is not None and dets.visualized.shape == IMG.shape
    assert Image.open(vis_path).size == (IMG.shape[1], IMG.shape[0])


def test_chunk_plan_avoids_tiny_call_storms():
    """A (1, 32) artifact must serve 31 images as ONE padded batch-32
    call, not 31 batch-1 dispatches."""
    from mydetection_tpu.export import ExportedDetector

    ed = ExportedDetector(meta={}, params=None,
                          _calls={(416, 1): None, (416, 32): None})
    assert ed._chunks(31) == [(31, 32)]
    assert ed._chunks(16) == [(16, 32)]
    assert ed._chunks(33) == [(32, 32), (1, 1)]
    assert ed._chunks(64) == [(32, 32), (32, 32)]
    assert ed._chunks(2) == [(1, 1), (1, 1)]  # tiny tails stay small
    only4 = ExportedDetector(meta={}, params=None, _calls={(416, 4): None})
    assert only4._chunks(3) == [(3, 4)]
    assert only4._chunks(9) == [(4, 4), (4, 4), (1, 4)]


def test_multi_size_buckets(det, tmp_path):
    """One artifact carrying (96, 128) sizes serves detect_one at
    either size and rejects a size that was not exported."""
    path = str(tmp_path / "sizes.mydet")
    export_detector(det, path, batch_size=1, input_size=(96, 128))
    served = load_exported(path)
    assert served.input_sizes == [96, 128]
    assert served.meta["input_size"] == 128  # the Detector's config size
    for s in (96, 128):
        want = det.detect_one(np_img=IMG, conf_thres=0.3, input_size=s)
        got = served.detect_one(np_img=IMG, conf_thres=0.3, input_size=s)
        _assert_same(want, got)
    with pytest.raises(ValueError, match="not in this artifact"):
        served.detect_one(np_img=IMG, input_size=160)


def test_legacy_v1_artifact_loads(det, artifact, tmp_path):
    """Version-1 artifacts stored blobs as __mlir__<batch> with the
    size only in meta; they must keep loading after the (size × batch)
    key change, not die in a bare unpack error."""
    import json as json_mod

    with np.load(artifact, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    meta = json_mod.loads(bytes(flat.pop("__meta__")).decode("utf-8"))
    size = meta["input_size"]
    meta["version"] = 1
    meta.pop("input_sizes")  # v1 meta had no such key
    legacy = {}
    for k, v in flat.items():
        if k.startswith("__mlir__"):
            s, b = k[len("__mlir__"):].split("x")
            assert int(s) == size
            legacy[f"__mlir__{b}"] = v
        else:
            legacy[k] = v
    legacy["__meta__"] = np.frombuffer(
        json_mod.dumps(meta).encode("utf-8"), dtype=np.uint8)
    path = str(tmp_path / "legacy.mydet")
    with open(path, "wb") as f:
        np.savez(f, **legacy)
    served = load_exported(path)
    assert served.input_sizes == [size]
    _assert_same(det.detect_one(np_img=IMG, conf_thres=0.3),
                 served.detect_one(np_img=IMG, conf_thres=0.3))


def test_v0_bare_mlir_artifact_loads(det, artifact, tmp_path):
    """The very first export format stored ONE blob under the bare key
    '__mlir__' (batch and size only in meta); it must still load."""
    import json as json_mod

    with np.load(artifact, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    meta = json_mod.loads(bytes(flat.pop("__meta__")).decode("utf-8"))
    meta["version"] = 1
    meta.pop("input_sizes")
    meta.pop("batch_sizes")  # v0 meta had only the scalar batch_size
    legacy = {}
    for k, v in flat.items():
        if k.startswith("__mlir__"):
            legacy["__mlir__"] = v  # one bucket: batch 2 (the fixture's)
        else:
            legacy[k] = v
    legacy["__meta__"] = np.frombuffer(
        json_mod.dumps(meta).encode("utf-8"), dtype=np.uint8)
    path = str(tmp_path / "v0.mydet")
    with open(path, "wb") as f:
        np.savez(f, **legacy)
    served = load_exported(path)
    assert served.batch_sizes == [meta["batch_size"]]
    _assert_same(det.detect_one(np_img=IMG, conf_thres=0.3),
                 served.detect_one(np_img=IMG, conf_thres=0.3))


def test_exported_nms_iou_kwarg_parity(det, artifact):
    """Detector's detect surfaces accept nms_iou; the exported ones
    must too — matching the baked value works, differing fails with
    the readable re-export message, never a TypeError."""
    served = load_exported(artifact)
    baked = served.meta["nms_iou"]
    want = det.detect_one(np_img=IMG, conf_thres=0.3)
    _assert_same(want, served.detect_one(np_img=IMG, conf_thres=0.3,
                                         nms_iou=baked))
    got = served.detect_batch([IMG], conf_thres=0.3, nms_iou=baked)
    _assert_same(want, got[0])
    for call in (lambda: served.detect_one(np_img=IMG, nms_iou=baked + 0.1),
                 lambda: served.detect_batch([IMG], nms_iou=baked + 0.1)):
        with pytest.raises(ValueError, match="re-export"):
            call()


def test_empty_input_size_rejected(det, tmp_path):
    with pytest.raises(ValueError, match="empty sequence"):
        export_detector(det, str(tmp_path / "x.mydet"), input_size=[])


def test_future_version_rejected_readably(det, artifact, tmp_path):
    import json as json_mod

    with np.load(artifact, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    meta = json_mod.loads(bytes(flat.pop("__meta__")).decode("utf-8"))
    meta["version"] = 99
    flat["__meta__"] = np.frombuffer(
        json_mod.dumps(meta).encode("utf-8"), dtype=np.uint8)
    path = str(tmp_path / "future.mydet")
    with open(path, "wb") as f:
        np.savez(f, **flat)
    with pytest.raises(ValueError, match="upgrade mydetection_tpu"):
        load_exported(path)


def test_pack_input_artifact_unpacked_canvases_fast_path(det, tmp_path):
    """A pack_input artifact fed plain (B, S, S, 3) canvases must pack
    up front and hit the bucket graph — bitwise-equal to the live
    pack_input Detector, with no chunk re-plan."""
    pdet = Detector(model_name="yolov3", input_size=128, num_classes=3,
                    compute_dtype=jnp.float32, use_pallas=False,
                    pre_nms=64, max_dets=10, pack_input=True,
                    params=det.params)
    path = str(tmp_path / "packed.mydet")
    export_detector(pdet, path, batch_size=2)
    served = load_exported(path)
    assert served.meta["pack_input"] is True
    from mydetection_tpu.utils.image_ops import letterbox_pil
    from PIL import Image

    canvases, infos = [], []
    for im in IMGS[:2]:
        c, i = letterbox_pil(Image.fromarray(im), 128)
        canvases.append(c)
        infos.append(i)
    want = pdet.detect_prepared(np.stack(canvases), infos, conf_thres=0.3)
    calls = {}

    def spy(c, conf, _orig=served._run):
        calls["shape"] = tuple(c.shape)
        return _orig(c, conf)

    served._run = spy
    got = served.detect_prepared(np.stack(canvases), infos, conf_thres=0.3)
    assert calls["shape"] == (2, 64, 64, 12)  # one packed bucket call
    for w, g in zip(want, got):
        _assert_same(w, g)


def test_detect_prepared_guards(det, artifact):
    """Layout/size mistakes fail with readable errors, not deep
    StableHLO shape errors."""
    from mydetection_tpu.utils.image_ops import letterbox_pil
    from PIL import Image

    served = load_exported(artifact)
    cv, info = letterbox_pil(Image.fromarray(IMG), 128)
    with pytest.raises(ValueError, match="nms_iou is static"):
        served.detect_prepared(cv[None], [info], nms_iou=0.99)
    with pytest.raises(ValueError, match="expects"):
        served.detect_prepared(np.zeros((1, 128, 128, 4), np.uint8), [info])
    with pytest.raises(ValueError, match="exported without pack_input"):
        served.detect_prepared(np.zeros((1, 64, 64, 12), np.uint8), [info])
    with pytest.raises(ValueError, match=r"input_size\(s\) \[128\]"):
        served.detect_prepared(np.zeros((1, 96, 96, 3), np.uint8), [info])
    # bucket-matched batch runs as-is (fast path), padding rows ignored
    batch = np.stack([cv, np.zeros_like(cv)])
    got = served.detect_prepared(batch, [info], conf_thres=0.3)
    want = det.detect_one(np_img=IMG, conf_thres=0.3)
    assert len(got) == 1
    _assert_same(want, got[0])


def test_int8_roundtrip(tmp_path):
    """The int8 serving path exports too: the artifact carries the
    calibrated quantized tree and reproduces the live int8 detections."""
    det = Detector(model_name="yolov3", input_size=128, num_classes=3,
                   compute_dtype=jnp.float32, use_pallas=False,
                   pre_nms=64, max_dets=10, quantized=True)  # noise calib
    path = str(tmp_path / "yolov3-int8.mydet")
    export_detector(det, path, batch_size=1)
    served = load_exported(path)
    assert served.meta["quantized"] is True
    want = det.detect_one(np_img=IMG, conf_thres=0.3)
    got = served.detect_one(np_img=IMG, conf_thres=0.3)
    _assert_same(want, got)


def test_cli_export(det, tmp_path, monkeypatch, capsys):
    """`python -m mydetection_tpu.export` writes a loadable artifact and
    prints one JSON line of its metadata."""
    import json
    import sys

    from mydetection_tpu import export as export_cli

    out = str(tmp_path / "cli.mydet")
    monkeypatch.setattr(sys, "argv", [
        "export", "--model", "yolov3", "--out", out, "--num-classes", "3",
        "--input-size", "128", "--batch-size", "2", "--oracle-nms"])
    export_cli.main()
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["out"] == out and meta["batch_sizes"] == [2]
    served = load_exported(out)
    dets = served.detect_one(np_img=IMG, conf_thres=0.05)
    assert len(dets) > 0, "random-init yolov3 at conf 0.05 must detect"
    assert np.all(np.diff(dets.scores) <= 1e-6)  # sorted descending
    h, w = IMG.shape[:2]
    assert np.all(dets.boxes_xyxy[:, [0, 1]] >= 0)
    assert np.all(dets.boxes_xyxy[:, 2] <= w)
    assert np.all(dets.boxes_xyxy[:, 3] <= h)


def test_eval_from_artifact_matches_live(det, artifact, tmp_path):
    """evaluate_detector accepts an ExportedDetector (the evaluate.py
    --exported path) and produces the same mAP as the live Detector."""
    import json

    from mydetection_tpu.eval.cocoeval import COCOGt
    from mydetection_tpu.eval.evaluator import evaluate_detector

    rng = np.random.RandomState(11)
    images, annotations = [], []
    for i in range(5):
        w, h = 100, 80
        from PIL import Image
        Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(
            tmp_path / f"img{i}.jpg")
        images.append({"id": i, "file_name": f"img{i}.jpg",
                       "width": w, "height": h})
        bw, bh = float(rng.uniform(10, 30)), float(rng.uniform(10, 30))
        annotations.append({
            "id": i, "image_id": i, "category_id": int(rng.choice([1, 2, 3])),
            "bbox": [float(rng.uniform(0, w - bw)),
                     float(rng.uniform(0, h - bh)), bw, bh],
            "area": bw * bh, "iscrowd": 0})
    gt_dict = {"images": images, "annotations": annotations,
               "categories": [{"id": c, "name": str(c)} for c in (1, 2, 3)]}
    ann = str(tmp_path / "ann.json")
    with open(ann, "w") as fh:
        json.dump(gt_dict, fh)

    served = load_exported(artifact)
    kw = dict(conf_thres=0.3, nms_iou=served.meta["nms_iou"],
              batch_size=2, num_threads=1, verbose=False)
    want = evaluate_detector(det, COCOGt(ann), str(tmp_path), **kw)
    got = evaluate_detector(served, COCOGt(ann), str(tmp_path), **kw)
    assert want.keys() == got.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k


def test_evaluate_cli_rejects_rotated_mismatch(artifact, tmp_path,
                                               monkeypatch):
    """evaluate.py --exported dispatches on the artifact's own rotated
    metadata; a contradicting --rotated flag fails loudly."""
    import importlib.util
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "_eval_cli_export", os.path.join(repo, "evaluate.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(sys, "argv", [
        "evaluate.py", "--exported", artifact, "--rotated",
        "--ann", str(tmp_path / "none.json"), "--img-dir", str(tmp_path)])
    with pytest.raises(SystemExit, match="axis-aligned"):
        mod.main()


def test_rejects_non_artifact(tmp_path, det):
    from mydetection_tpu.checkpoint import save_checkpoint
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, det.params)
    with pytest.raises(ValueError, match="not a mydetection-tpu-export"):
        load_exported(path)


def test_rejects_platform_mismatch(artifact, tmp_path):
    """A CPU process must refuse an artifact lowered only for TPU with
    a readable re-export hint, not a deep StableHLO error."""
    import json

    with np.load(artifact, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    meta = json.loads(bytes(flat["__meta__"]).decode("utf-8"))
    meta["platforms"] = ["tpu"]
    flat["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8)
    path = str(tmp_path / "tpu-only.mydet")
    with open(path, "wb") as f:
        np.savez(f, **flat)
    with pytest.raises(ValueError, match="re-export on the serving"):
        load_exported(path)


def test_public_surface_reexport():
    import mydetection_tpu as m

    assert m.export_detector is not None and m.load_exported is not None
    assert m.ExportedDetector is not None
    with pytest.raises(AttributeError):
        m.no_such_symbol
