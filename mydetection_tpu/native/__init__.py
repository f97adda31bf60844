"""ctypes bindings for the native C++ image pipeline (imagepipe.cpp).

Builds `libimagepipe.so` on first use with g++ (cached next to the
source; rebuilt when the source is newer). Falls back cleanly —
callers check `available()` and use the PIL path otherwise, so the
package works on hosts without a toolchain.

ctypes releases the GIL for the duration of each call, so the decode
thread pool in `data.loader` gets true decode parallelism through this
path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "imagepipe.cpp")
_LIB = os.path.join(_DIR, "libimagepipe.so")

_lock = threading.Lock()
_lib = None
_build_error: str | None = None


def _build() -> str | None:
    cmd = ["g++", "-O3", "-march=native", "-funroll-loops", "-shared",
           "-fPIC", "-o", _LIB, _SRC, "-ljpeg"]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=180)
    except (OSError, subprocess.TimeoutExpired) as e:
        return f"{type(e).__name__}: {e}"
    if proc.returncode != 0:
        return proc.stderr[-2000:]
    return None


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build_error = _build()
            if _build_error is not None:
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as e:
            _build_error = str(e)
            return None
        lib.decode_letterbox_jpeg.restype = ctypes.c_int
        lib.decode_letterbox_jpeg.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float)]
        lib.letterbox_rgb.restype = ctypes.c_int
        lib.letterbox_rgb.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float)]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_error() -> str | None:
    _load()
    return _build_error


def _geom_to_info(geom: np.ndarray, input_size: int):
    from mydetection_tpu.utils.image_ops import LetterboxInfo

    return LetterboxInfo(
        ori_w=int(round(float(geom[3]))), ori_h=int(round(float(geom[4]))),
        ratio=float(geom[0]), pad_x=float(geom[1]), pad_y=float(geom[2]),
        input_size=input_size)


def decode_letterbox_jpeg(data: bytes, input_size: int):
    """JPEG bytes → (canvas u8 (S, S, 3), LetterboxInfo). Raises on
    decode failure (caller falls back to PIL)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native imagepipe unavailable: {_build_error}")
    canvas = np.empty((input_size, input_size, 3), np.uint8)
    geom = np.empty(5, np.float32)
    rc = lib.decode_letterbox_jpeg(
        data, len(data), input_size,
        canvas.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        geom.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise ValueError(f"libjpeg decode failed (rc={rc})")
    return canvas, _geom_to_info(geom, input_size)


def decode_letterbox_file(path: str, input_size: int):
    with open(path, "rb") as fh:
        return decode_letterbox_jpeg(fh.read(), input_size)


def letterbox_rgb(img: np.ndarray, input_size: int):
    """HWC RGB uint8 → (canvas, LetterboxInfo) via the native resampler."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native imagepipe unavailable: {_build_error}")
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"letterbox_rgb expects HWC RGB uint8, got "
                         f"shape {img.shape}")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        # mirror the Python path's guard (utils/image_ops): the C++
        # ratio would be inf and the geometry NaN
        raise ValueError(f"letterbox_rgb: empty image (shape {img.shape})")
    canvas = np.empty((input_size, input_size, 3), np.uint8)
    geom = np.empty(5, np.float32)
    rc = lib.letterbox_rgb(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, input_size,
        canvas.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        geom.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise ValueError(f"native letterbox failed (rc={rc})")
    return canvas, _geom_to_info(geom, input_size)
