"""Host-side image geometry: letterbox + inverse mapping.

Reference parity: `utils/image_ops.py` (`rect_to_square`,
`detection2original`) in duanzhiihao/myDetection [recalled — reference
mount empty at survey time, see SURVEY.md §0]. The reference pads an
image to a square with gray pixels, resizes to `input_size`, and maps
detections back with the recorded (ratio, pad) pair.

TPU-native split (SURVEY.md §1 L2): the *geometry* (PIL resize + pad)
stays on host with ONE fixed resampler so device graphs never resize;
the normalize / HWC→CHW math lives inside the jitted graph
(`mydetection_tpu.models.layers.normalize_input`).
"""

from __future__ import annotations

import dataclasses

import numpy as np
from PIL import Image

PAD_VALUE = 114  # gray padding, standard letterbox fill
# decodable-by-PIL image extensions, shared by the CLIs (demo,
# evaluate --quantized calibration) so the lists cannot diverge
IMAGE_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}


@dataclasses.dataclass(frozen=True)
class LetterboxInfo:
    """Geometry record needed to invert a letterbox transform."""

    ori_w: int
    ori_h: int
    ratio: float   # scale from original pixels -> network pixels
    pad_x: float   # left pad in network pixels
    pad_y: float   # top pad in network pixels
    input_size: int


def letterbox_pil(img: Image.Image, input_size: int) -> tuple[np.ndarray, LetterboxInfo]:
    """Resize-preserving-aspect + center-pad a PIL image to a square.

    Returns (uint8 HWC RGB array of shape (input_size, input_size, 3),
    LetterboxInfo). Resampling is pinned to bilinear so results are
    reproducible across hosts (SURVEY.md §7 hard-part #2).
    """
    if img.mode != "RGB":
        img = img.convert("RGB")
    ori_w, ori_h = img.size
    if ori_w == 0 or ori_h == 0:
        raise ValueError(f"empty image ({ori_w}x{ori_h}) cannot be "
                         "letterboxed")
    ratio = input_size / max(ori_w, ori_h)
    new_w = max(1, int(round(ori_w * ratio)))
    new_h = max(1, int(round(ori_h * ratio)))
    resized = img.resize((new_w, new_h), resample=Image.BILINEAR)

    canvas = np.full((input_size, input_size, 3), PAD_VALUE, dtype=np.uint8)
    # floor split: unambiguous across languages (round(x.5) is banker's
    # in Python but half-away in C lround — the native path must agree)
    x0 = (input_size - new_w) // 2
    y0 = (input_size - new_h) // 2
    canvas[y0 : y0 + new_h, x0 : x0 + new_w] = np.asarray(resized, dtype=np.uint8)
    info = LetterboxInfo(
        ori_w=ori_w, ori_h=ori_h, ratio=ratio, pad_x=float(x0), pad_y=float(y0),
        input_size=input_size,
    )
    return canvas, info


def letterbox_np(img: np.ndarray, input_size: int) -> tuple[np.ndarray, LetterboxInfo]:
    """Letterbox a uint8 HWC RGB numpy array (wraps PIL for the resize)."""
    return letterbox_pil(Image.fromarray(img), input_size)


def pack_s2d2(canvases: np.ndarray) -> np.ndarray:
    """Host-side 2×2 space-to-depth pack: (B, H, W, 3) uint8 →
    (B, H/2, W/2, 12) uint8, phase-major channels (pi·2+pj)·3+c.

    TPU inference fast path: a C=3-minor uint8 tensor is pathological
    on the 128-lane VPU (the device-side normalize materializes a
    42×-padded layout); packed C=12 cuts that waste 4× AND lets the
    stem conv consume 12 input channels instead of 3. The device graph
    consumes this layout directly via phase-folded stem weights
    (models/darknet.py `_s2d_conv3_weight`) — numerically identical to
    the unpacked path (pinned by tests/test_models.py). Pure memory
    shuffle: no pixel math, letterbox geometry is unaffected.
    """
    b, h, w, c = canvases.shape
    if h % 2 or w % 2 or c != 3:
        raise ValueError(f"pack_s2d2 needs (B, even H, even W, 3), got "
                         f"{canvases.shape}")
    return np.ascontiguousarray(
        canvases.reshape(b, h // 2, 2, w // 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, h // 2, w // 2, 4 * c))


def detections_to_original(dets: np.ndarray, info: LetterboxInfo) -> np.ndarray:
    """Map detections from network coords back to original image coords.

    `dets` has boxes in columns 0:4. Axis-aligned rows are
    (cx, cy, w, h, ...); the same math is valid for rotated rows
    (cx, cy, w, h, angle, ...) because rotation is scale-invariant under
    the uniform letterbox ratio. Returns a copy.

    Reference parity: `detection2original` [recalled].
    """
    out = np.array(dets, dtype=np.float32, copy=True)
    if out.size == 0:
        return out
    out[:, 0] = (out[:, 0] - info.pad_x) / info.ratio
    out[:, 1] = (out[:, 1] - info.pad_y) / info.ratio
    out[:, 2] = out[:, 2] / info.ratio
    out[:, 3] = out[:, 3] / info.ratio
    return out


def boxes_xyxy_to_original(boxes: np.ndarray, info: LetterboxInfo, clip: bool = True) -> np.ndarray:
    """Map xyxy boxes in network coords to original coords (and clip)."""
    out = np.array(boxes, dtype=np.float32, copy=True)
    if out.size == 0:
        return out
    out[:, 0] = (out[:, 0] - info.pad_x) / info.ratio
    out[:, 2] = (out[:, 2] - info.pad_x) / info.ratio
    out[:, 1] = (out[:, 1] - info.pad_y) / info.ratio
    out[:, 3] = (out[:, 3] - info.pad_y) / info.ratio
    if clip:
        out[:, 0::2] = np.clip(out[:, 0::2], 0.0, info.ori_w)
        out[:, 1::2] = np.clip(out[:, 1::2], 0.0, info.ori_h)
    return out
