"""Image IO: decode PNG/JPEG/EXR/HDR/TGA/TIFF to RGBA arrays.

The dispatch mirrors the reference's decoder chain
(src/imgio/impl/Imgio.cpp: try each decoder in turn). PNG/JPEG/TGA/TIFF go
through Pillow; EXR and Radiance HDR use the pure-NumPy codecs in this
package since no native decoders are available.
"""

from __future__ import annotations

import io
import os

import numpy as np

from gatling_tpu.imgio.image import Image, to_rgba
from gatling_tpu.imgio.exr import decode_exr, encode_exr  # noqa: F401
from gatling_tpu.imgio.hdr import decode_hdr, encode_hdr  # noqa: F401
from gatling_tpu.utils.log import get_logger


def _decode_pil(data: bytes) -> np.ndarray:
    from PIL import Image as PILImage

    with PILImage.open(io.BytesIO(data)) as im:
        im.load()
        if im.mode in ("P", "CMYK", "YCbCr"):
            im = im.convert("RGBA")
        if im.mode in ("I;16", "I;16B", "I", "F"):
            arr = np.asarray(im, dtype=np.float32)
            if arr.dtype == np.float32 and im.mode.startswith("I"):
                arr = arr / 65535.0
            return to_rgba(arr.astype(np.float32))
        return to_rgba(np.asarray(im))


def load_image(data: bytes) -> Image:
    """Decode image bytes, trying each decoder in turn (Imgio.cpp pattern)."""
    errors = []
    if data[:4] == b"\x76\x2f\x31\x01":
        return Image(decode_exr(data))
    if data[:2] == b"#?":
        return Image(decode_hdr(data))
    try:
        return Image(_decode_pil(data))
    except Exception as e:  # noqa: BLE001
        errors.append(f"pil: {e}")
    for dec in (decode_exr, decode_hdr):
        try:
            return Image(dec(data))
        except Exception as e:  # noqa: BLE001
            errors.append(f"{dec.__name__}: {e}")
    raise ValueError(f"no decoder accepted image data: {errors}")


def load_image_file(path: str | os.PathLike) -> Image:
    with open(path, "rb") as f:
        data = f.read()
    try:
        return load_image(data)
    except ValueError:
        get_logger().error("failed to decode image %s", path)
        raise


def write_image_file(path: str | os.PathLike, rgba: np.ndarray) -> None:
    """Write an image; format chosen by extension (png/jpg/tga/tiff/exr/hdr)."""
    ext = os.path.splitext(str(path))[1].lower()
    rgba = np.asarray(rgba)
    if ext == ".exr":
        with open(path, "wb") as f:
            f.write(encode_exr(rgba.astype(np.float32)))
        return
    if ext == ".hdr":
        with open(path, "wb") as f:
            f.write(encode_hdr(rgba.astype(np.float32)))
        return
    from PIL import Image as PILImage

    if rgba.dtype != np.uint8:
        rgba = np.clip(rgba * 255.0 + 0.5, 0, 255).astype(np.uint8)
    mode = {1: "L", 3: "RGB", 4: "RGBA"}[rgba.shape[2] if rgba.ndim == 3 else 1]
    if ext in (".jpg", ".jpeg") and mode == "RGBA":
        rgba, mode = rgba[:, :, :3], "RGB"
    PILImage.fromarray(rgba.squeeze() if mode == "L" else rgba, mode).save(path)
