"""CLI integration tests: train.py (fresh + resume) and evaluate.py on
a synthetic COCO dataset (SURVEY.md §4.4)."""

import json
import os
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco_cli")
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(6):
        w, h = 96, 80
        arr = rng.randint(0, 255, (h, w, 3), np.uint8)
        Image.fromarray(arr).save(root / f"img{i}.jpg")
        images.append({"id": i, "file_name": f"img{i}.jpg", "width": w,
                       "height": h})
        for _ in range(2):
            bw, bh = float(rng.uniform(10, 30)), float(rng.uniform(10, 30))
            annotations.append({
                "id": len(annotations), "image_id": i,
                "category_id": int(rng.choice([1, 2])),
                "bbox": [float(rng.uniform(0, w - bw)),
                         float(rng.uniform(0, h - bh)), bw, bh],
                "area": bw * bh, "iscrowd": 0})
    gt = {"images": images, "annotations": annotations,
          "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]}
    with open(root / "ann.json", "w") as fh:
        json.dump(gt, fh)
    return root


def run_main(script: str, args: list[str], monkeypatch, capsys):
    """Drive a CLI main() in-process (shares the jit cache across calls
    — a fresh subprocess per run costs minutes of recompiles on this
    1-core host)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        f"_cli_{script}", os.path.join(REPO, f"{script}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(sys, "argv", [f"{script}.py", *args])
    mod.main()
    return capsys.readouterr().out


def test_train_and_resume(coco_dir, tmp_path, monkeypatch, capsys):
    ckpt_dir = str(tmp_path / "weights")
    base = ["--model", "yolov3", "--ann", str(coco_dir / "ann.json"),
            "--img-dir", str(coco_dir), "--batch-size", "2", "--sizes", "64",
            "--max-gt", "8", "--log-every", "2", "--ckpt-dir", ckpt_dir,
            "--float32"]  # bf16 emulation is slow on the CPU test host
    tb_dir = str(tmp_path / "tb")
    out = run_main("train", base + ["--iterations", "3", "--ckpt-every", "3",
                                    "--tensorboard-dir", tb_dir],
                   monkeypatch, capsys)
    ckpt = os.path.join(ckpt_dir, "yolov3_3.npz")
    assert os.path.exists(ckpt), out[-2000:]
    metrics = open(os.path.join(ckpt_dir, "yolov3_metrics.jsonl")).read()
    row = json.loads(metrics.strip().splitlines()[0])
    assert np.isfinite(row["total"]) and row["iter"] == 2
    # the TensorBoard sink wrote a parseable event file with the same scalars
    from mydetection_tpu.utils.tb_writer import read_scalars
    events = [f for f in os.listdir(tb_dir) if f.startswith("events.out")]
    assert len(events) == 1
    rows_tb = read_scalars(os.path.join(tb_dir, events[0]))
    assert any(t == "loss/total" and s == 2 and np.isfinite(v)
               for s, t, v in rows_tb), rows_tb

    out2 = run_main("train", base + ["--iterations", "5", "--ckpt-every", "2",
                                     "--resume", ckpt], monkeypatch, capsys)
    assert "resumed" in out2
    assert os.path.exists(os.path.join(ckpt_dir, "yolov3_5.npz"))


def test_evaluate_cli(coco_dir, tmp_path, monkeypatch, capsys):
    out = str(tmp_path / "results.json")
    stdout = run_main("evaluate", [
        "--model", "yolov3", "--ann", str(coco_dir / "ann.json"),
        "--img-dir", str(coco_dir), "--input-size", "64", "--batch-size", "4",
        "--conf-thres", "0.3", "--max-images", "4", "--float32",
        "--out", out], monkeypatch, capsys)
    assert "'AP'" in stdout or '"AP"' in stdout.replace("'", '"')
    rows = json.load(open(out))
    assert isinstance(rows, list)
    for row in rows[:5]:
        assert set(row) == {"image_id", "category_id", "bbox", "score"}


def test_evaluate_cli_rotated(coco_dir, tmp_path, monkeypatch, capsys):
    gt = json.load(open(coco_dir / "ann.json"))
    for a in gt["annotations"]:
        bb = a["bbox"]
        a["bbox"] = [bb[0] + bb[2] / 2, bb[1] + bb[3] / 2, bb[2], bb[3], 15.0]
    ann = tmp_path / "rot_ann.json"
    json.dump(gt, open(ann, "w"))
    out = run_main("evaluate", [
        "--model", "rapid", "--ann", str(ann), "--img-dir", str(coco_dir),
        "--input-size", "64", "--batch-size", "4", "--conf-thres", "0.3",
        "--max-images", "4", "--float32", "--rotated"], monkeypatch, capsys)
    assert "AP50" in out


@pytest.mark.slow
def test_train_rotated_with_val(coco_dir, tmp_path, monkeypatch, capsys):
    """RAPiD CLI training: rotated labels, rotation augmentation, and
    the rotated-IoU val evaluator wired into --val-every."""
    gt = json.load(open(coco_dir / "ann.json"))
    for a in gt["annotations"]:
        bb = a["bbox"]
        a["bbox"] = [bb[0] + bb[2] / 2, bb[1] + bb[3] / 2, bb[2], bb[3], 20.0]
    ann = tmp_path / "rot_ann.json"
    json.dump(gt, open(ann, "w"))
    ckpt_dir = str(tmp_path / "weights")
    out = run_main("train", [
        "--model", "rapid", "--ann", str(ann), "--img-dir", str(coco_dir),
        "--batch-size", "2", "--sizes", "64", "--max-gt", "8",
        "--iterations", "2", "--ckpt-every", "2", "--log-every", "2",
        "--ckpt-dir", ckpt_dir, "--float32",
        "--val-every", "2", "--val-ann", str(ann), "--val-max-images", "4",
    ], monkeypatch, capsys)
    assert os.path.exists(os.path.join(ckpt_dir, "rapid_2.npz")), out[-2000:]
    assert "val_AP50" in out


def test_demo_cli(coco_dir, tmp_path, monkeypatch, capsys):
    """demo.py over a directory: visualizations written for each image."""
    out_dir = str(tmp_path / "demo_out")
    out = run_main("demo", [
        "--model", "yolov3", "--input", str(coco_dir), "--out-dir", out_dir,
        "--conf-thres", "0.2", "--input-size", "64", "--float32",
    ], monkeypatch, capsys)
    pngs = [f for f in os.listdir(out_dir) if f.endswith("_det.png")]
    assert len(pngs) == 6, (pngs, out[-1000:])


def test_demo_cli_video(tmp_path, monkeypatch, capsys):
    """demo.py on a video file: frames decoded, detected in batches,
    annotated video written with the same frame count."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(0)
    vid_path = str(tmp_path / "clip.avi")
    wr = cv2.VideoWriter(vid_path, cv2.VideoWriter_fourcc(*"MJPG"),
                         10.0, (160, 120))
    for _ in range(5):
        wr.write(rng.randint(0, 255, (120, 160, 3), np.uint8))
    wr.release()
    out_dir = str(tmp_path / "demo_out")
    out = run_main("demo", [
        "--model", "yolov3", "--input", vid_path, "--out-dir", out_dir,
        "--conf-thres", "0.2", "--input-size", "64", "--float32",
    ], monkeypatch, capsys)
    out_path = os.path.join(out_dir, "clip_det.avi")
    assert os.path.exists(out_path), out[-500:]
    cap = cv2.VideoCapture(out_path)
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert n == 5
