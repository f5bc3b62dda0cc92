"""Decoded image container (reference: src/imgio/gtl/imgio/Image.h)."""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class Image:
    """An always-RGBA decoded image.

    `data` is [H, W, 4], dtype uint8 (LDR formats) or float32 (HDR formats),
    mirroring the reference decoders' RGBA8 / RGBA16F / R32F outputs
    (src/imgio/impl/Imgio.cpp).
    """

    data: np.ndarray

    @property
    def width(self) -> int:
        return self.data.shape[1]

    @property
    def height(self) -> int:
        return self.data.shape[0]

    @property
    def is_hdr(self) -> bool:
        return self.data.dtype != np.uint8

    def as_float_rgba(self) -> np.ndarray:
        """Return [H,W,4] float32 with LDR data normalized to [0,1]."""
        if self.data.dtype == np.uint8:
            return self.data.astype(np.float32) / 255.0
        return self.data.astype(np.float32)


def to_rgba(arr: np.ndarray) -> np.ndarray:
    """Expand gray/rgb/gray-alpha arrays to RGBA with opaque alpha."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c == 4:
        return np.ascontiguousarray(arr)
    one = np.array(255 if arr.dtype == np.uint8 else 1.0, dtype=arr.dtype)
    out = np.empty((h, w, 4), dtype=arr.dtype)
    if c == 1:
        out[:, :, 0] = out[:, :, 1] = out[:, :, 2] = arr[:, :, 0]
        out[:, :, 3] = one
    elif c == 2:  # gray + alpha
        out[:, :, 0] = out[:, :, 1] = out[:, :, 2] = arr[:, :, 0]
        out[:, :, 3] = arr[:, :, 1]
    elif c == 3:
        out[:, :, :3] = arr
        out[:, :, 3] = one
    else:
        raise ValueError(f"unsupported channel count {c}")
    return out
