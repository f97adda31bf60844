"""Named fisheye-dataset adapters: CEPDOF / MW-R / HABBOF.

Reference parity: the RAPiD datasets [recalled; SURVEY.md §2.11] —
overhead-fisheye person detection with rotated boxes. Their real
on-disk schemas are unverifiable offline (SURVEY.md §0), so each
adapter documents the schema it EXPECTS and maps it onto the generic
rotated `CocoDataset`; a user with the real files gets a named on-ramp
plus a readable error when the layout differs (VERDICT r2 missing #3).

Expected schemas (per the published RAPiD tooling [recalled]):

* **CEPDOF** (Challenging Events for Person Detection from Overhead
  Fisheye images): one COCO-style JSON per video directory —
  `{"images": [...], "annotations": [...], "categories": [person]}`
  with `bbox = [cx, cy, w, h, degrees]` (center-based, angle in
  degrees, person-only). Images live beside the JSON in a directory
  named after the video.
* **MW-R** (Mirror Worlds - Rotated re-annotation): same COCO-style
  rotated-bbox JSON convention as CEPDOF.
* **HABBOF** (Human-Aligned Bounding Boxes from Overhead Fisheye):
  per-image plain-text annotations — one `<frame>.txt` next to (or in
  an `annotations/` sibling of) each `<frame>.jpg`, each line
  `person cx cy w h degrees` (the class token may be absent).

All adapters return datasets yielding the framework's standard item
dict: `{"image" uint8 HWC, "boxes" (N, 5) cxcywh+θ_radians, "classes"
(N,) int32, "image_id"}` — directly consumable by `TrainLoader`
(`rotated=True`) and `eval/rotated_eval.py`.
"""

from __future__ import annotations

import glob
import os

import numpy as np
from PIL import Image

from mydetection_tpu.data.coco import CocoDataset


def cepdof(ann_file: str, img_dir: str, **kw) -> CocoDataset:
    """CEPDOF video directory → rotated dataset.

    `ann_file`: the video's COCO-style JSON (rotated 5-element bboxes,
    degrees); `img_dir`: the directory holding that video's frames.
    """
    return CocoDataset(ann_file, img_dir, rotated=True, **kw)


def mw_r(ann_file: str, img_dir: str, **kw) -> CocoDataset:
    """MW-R (Mirror Worlds rotated re-annotation) → rotated dataset.
    Same COCO-style rotated-bbox JSON convention as CEPDOF."""
    return CocoDataset(ann_file, img_dir, rotated=True, **kw)


class HabbofDataset:
    """HABBOF-style folder: frames + per-frame `.txt` annotations.

    Each annotation line is `person cx cy w h degrees` (the leading
    class token optional; values in image pixels, angle degrees).
    Annotations are looked up as `<stem>.txt` next to the image, then
    under an `annotations/` sibling directory.
    """

    def __init__(self, img_dir: str, *, ann_dir: str | None = None,
                 exts: tuple[str, ...] = (".jpg", ".jpeg", ".png")):
        self.img_dir = img_dir
        self.ann_dir = ann_dir
        self.paths = sorted(
            p for ext in exts
            for p in glob.glob(os.path.join(img_dir, f"*{ext}")))
        if not self.paths:
            raise ValueError(
                f"no images ({'/'.join(exts)}) found in {img_dir!r} — "
                "expected a HABBOF-style folder of frames with "
                "per-frame .txt annotations")
        self.num_classes = 1
        self.cat_to_contig = {1: 0}
        self.contig_to_cat = {0: 1}
        if not any(self._ann_path(p) is not None for p in self.paths):
            raise ValueError(
                f"no annotation .txt resolved for ANY of the "
                f"{len(self.paths)} frames in {img_dir!r} (looked next "
                f"to each frame, in ann_dir={ann_dir!r}, and in an "
                f"'annotations/' sibling) — pass ann_dir= pointing at "
                f"the HABBOF label files")

    def _ann_path(self, img_path: str) -> str | None:
        stem = os.path.splitext(os.path.basename(img_path))[0]
        candidates = [os.path.splitext(img_path)[0] + ".txt"]
        if self.ann_dir:
            candidates.insert(0, os.path.join(self.ann_dir, stem + ".txt"))
        candidates.append(os.path.join(
            os.path.dirname(img_path), "annotations", stem + ".txt"))
        for c in candidates:
            if os.path.exists(c):
                return c
        return None

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, index: int) -> dict:
        path = self.paths[index]
        image = np.asarray(Image.open(path).convert("RGB"))
        rows = []
        ann = self._ann_path(path)
        if ann is not None:
            with open(ann) as fh:
                for line in fh:
                    parts = line.split()
                    if not parts:
                        continue
                    if not _is_number(parts[0]):
                        parts = parts[1:]  # leading word class token
                    elif len(parts) >= 6:
                        # NUMERIC class id variant ('0 cx cy w h deg'):
                        # 6+ tokens means the first is the class, not
                        # cx — without this the angle silently dropped
                        parts = parts[1:]
                    if len(parts) < 5:
                        raise ValueError(
                            f"{ann}: expected `[person] cx cy w h "
                            f"degrees`, got {line.rstrip()!r}")
                    cx, cy, w, h, deg = (float(v) for v in parts[:5])
                    rows.append([cx, cy, w, h, np.radians(deg)])
        boxes = np.asarray(rows, np.float32).reshape(-1, 5)
        return {"image": image, "boxes": boxes,
                "classes": np.zeros((len(boxes),), np.int32),
                "image_id": index}


def _is_number(tok: str) -> bool:
    try:
        float(tok)
        return True
    except ValueError:
        return False


habbof = HabbofDataset
