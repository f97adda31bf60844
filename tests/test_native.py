"""Native C++ image pipeline tests: parity with the PIL path, JPEG
decode, prescale behavior, fallback (SURVEY.md §2.N)."""

import io

import numpy as np
import pytest
from PIL import Image

from mydetection_tpu import native
from mydetection_tpu.utils.image_ops import letterbox_np

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native build failed: {native.build_error()}")


def test_letterbox_rgb_matches_pil():
    rng = np.random.RandomState(0)
    for shape in ((480, 640), (640, 480), (100, 300), (50, 40)):
        img = rng.randint(0, 255, (*shape, 3), np.uint8)
        c_pil, i_pil = letterbox_np(img, 128)
        c_nat, i_nat = native.letterbox_rgb(img, 128)
        assert c_nat.shape == (128, 128, 3)
        assert i_nat.ratio == pytest.approx(i_pil.ratio, rel=1e-6)
        assert i_nat.pad_x == i_pil.pad_x and i_nat.pad_y == i_pil.pad_y
        assert (i_nat.ori_w, i_nat.ori_h) == (i_pil.ori_w, i_pil.ori_h)
        diff = np.abs(c_pil.astype(int) - c_nat.astype(int))
        assert diff.max() <= 2, shape  # triangle filter parity within 2 LSB
        assert diff.mean() < 0.5


def test_jpeg_decode_and_geometry():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (300, 500, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=95)
    canvas, info = native.decode_letterbox_jpeg(buf.getvalue(), 256)
    assert canvas.shape == (256, 256, 3)
    assert (info.ori_w, info.ori_h) == (500, 300)
    assert info.ratio == pytest.approx(256 / 500, rel=1e-6)
    # pad bands are gray
    assert (canvas[0] == 114).all() and (canvas[-1] == 114).all()


def test_dct_prescale_consistent():
    """Large JPEG triggers 1/2^k DCT-domain decode; the letterbox
    geometry must stay identical to the full-resolution path."""
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (1200, 1600, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=90)
    canvas, info = native.decode_letterbox_jpeg(buf.getvalue(), 128)
    pil = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
    c_pil, i_pil = letterbox_np(pil, 128)
    assert info.ratio == pytest.approx(i_pil.ratio, rel=1e-6)
    assert (info.pad_x, info.pad_y) == (i_pil.pad_x, i_pil.pad_y)
    assert (info.ori_w, info.ori_h) == (1600, 1200)
    # content close despite the different decode path
    assert np.abs(canvas.astype(int) - c_pil.astype(int)).mean() < 6


def test_dct_prescale_odd_dims_exact_geometry():
    """Dims NOT divisible by the DCT prescale denominator: the reported
    ori_w/ori_h must be the true header dims, not reconstructed from a
    single width-derived ratio (which skewed ori_h by up to denom-1
    rows and the inverse box mapping by several px on tall images)."""
    rng = np.random.RandomState(3)
    h, w = 1201, 1603  # neither divisible by denom=8
    img = rng.randint(0, 255, (h, w, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=90)
    canvas, info = native.decode_letterbox_jpeg(buf.getvalue(), 128)
    assert (info.ori_w, info.ori_h) == (w, h)
    pil = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
    _, i_pil = letterbox_np(pil, 128)
    assert info.ratio == pytest.approx(i_pil.ratio, rel=1e-6)
    assert (info.pad_x, info.pad_y) == (i_pil.pad_x, i_pil.pad_y)


def test_invalid_jpeg_raises():
    with pytest.raises(ValueError):
        native.decode_letterbox_jpeg(b"not a jpeg at all", 64)


def test_loader_native_fallback(tmp_path):
    """Non-JPEG files fall back to PIL inside StreamingPipeline."""
    from mydetection_tpu.data.loader import StreamingPipeline

    rng = np.random.RandomState(3)
    paths = []
    for i, fmt in enumerate(["JPEG", "PNG"]):
        p = tmp_path / f"img{i}.{fmt.lower()}"
        Image.fromarray(rng.randint(0, 255, (60, 90, 3), np.uint8)).save(
            p, format=fmt)
        paths.append(str(p))
    pipe = StreamingPipeline(paths, input_size=64, batch_size=2,
                             num_threads=1, device_put=False, native=True)
    [(canv, infos, _)] = list(pipe)
    assert canv.shape == (2, 64, 64, 3)
    assert infos[0].ori_w == 90 and infos[1].ori_w == 90
