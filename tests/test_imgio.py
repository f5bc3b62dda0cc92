"""Image IO tests.

Mirrors the reference's imgio_test strategy (src/imgio/impl/main.cpp:43-91):
a 2x2 four-color fixture is decoded from every supported format and compared
byte-exactly (exactly for lossless formats, tolerantly for JPEG).
"""

import io

import numpy as np
import pytest
from PIL import Image as PILImage

from gatling_tpu import imgio

# The 2x2 4-color fixture: red, green, blue, white (like the reference 4c.*).
FIXTURE = np.array(
    [[[255, 0, 0, 255], [0, 255, 0, 255]],
     [[0, 0, 255, 255], [255, 255, 255, 255]]], dtype=np.uint8)


def _pil_bytes(fmt: str, mode: str = "RGBA") -> bytes:
    im = PILImage.fromarray(FIXTURE, "RGBA")
    if mode != "RGBA":
        im = im.convert(mode)
    buf = io.BytesIO()
    im.save(buf, format=fmt, **({"quality": 100, "subsampling": 0} if fmt == "JPEG" else {}))
    return buf.getvalue()


@pytest.mark.parametrize("fmt", ["PNG", "TGA", "TIFF"])
def test_lossless_ldr_formats_exact(fmt):
    img = imgio.load_image(_pil_bytes(fmt))
    assert img.data.dtype == np.uint8
    np.testing.assert_array_equal(img.data, FIXTURE)


def test_jpeg_close():
    img = imgio.load_image(_pil_bytes("JPEG", mode="RGB"))
    assert img.data.shape == (2, 2, 4)
    assert np.abs(img.data[..., :3].astype(int) - FIXTURE[..., :3].astype(int)).max() <= 16
    assert (img.data[..., 3] == 255).all()


def test_hdr_roundtrip():
    f = FIXTURE.astype(np.float32) / 255.0
    data = imgio.encode_hdr(f)
    img = imgio.load_image(data)
    assert img.is_hdr
    assert np.abs(img.data[..., :3] - f[..., :3]).max() < 0.005


def test_hdr_high_dynamic_range():
    rng = np.random.default_rng(0)
    f = (rng.random((16, 16, 3)) * 1000.0).astype(np.float32)
    img = imgio.load_image(imgio.encode_hdr(f))
    # RGBE precision: the shared exponent quantizes each pixel to steps of
    # ~max_channel/256 (stb decode adds no half-step), so bound by that.
    step = f.max(axis=-1, keepdims=True) / 256.0 * 1.01
    assert (np.abs(img.data[..., :3] - f) <= step).all()


@pytest.mark.parametrize("half", [True, False])
def test_exr_roundtrip(half):
    rng = np.random.default_rng(1)
    f = (rng.random((33, 17, 4)) * 10.0).astype(np.float32)
    img = imgio.load_image(imgio.encode_exr(f, half=half))
    assert img.is_hdr
    tol = 0.01 if half else 1e-6
    rel = np.abs(img.data - f) / np.maximum(np.abs(f), 1.0)
    assert rel.max() < tol


def test_exr_rgb_no_alpha():
    f = np.ones((4, 4, 3), np.float32) * 0.5
    img = imgio.load_image(imgio.encode_exr(f))
    assert (img.data[..., 3] == 1.0).all()


def test_write_and_load_file(tmp_path):
    for name in ["a.png", "a.tga", "a.tiff", "a.exr", "a.hdr"]:
        p = tmp_path / name
        imgio.write_image_file(p, FIXTURE if name.endswith(("png", "tga", "tiff")) else FIXTURE.astype(np.float32) / 255.0)
        img = imgio.load_image_file(p)
        assert img.width == 2 and img.height == 2


def test_grayscale_expansion():
    im = PILImage.fromarray(np.array([[0, 255]], dtype=np.uint8), "L")
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    img = imgio.load_image(buf.getvalue())
    assert img.data.shape == (1, 2, 4)
    np.testing.assert_array_equal(img.data[0, 1], [255, 255, 255, 255])


def test_garbage_rejected():
    with pytest.raises(ValueError):
        imgio.load_image(b"this is not an image at all........")
