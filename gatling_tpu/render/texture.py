"""Texture management: host-side cache + device-side flat texel pool.

Host side mirrors the reference's TextureManager
(reference: src/gi/impl/TextureManager.cpp — path-keyed cache :100-150,
1x1 black fallback on decode failure :253-267) and its slot allocator
(OffsetAllocator with 65535 slots, Gi.cpp:1446-1490 / rp_main.h
MAX_TEXTURE_COUNT).

Device side replaces Vulkan's 65535-entry descriptor arrays
(rp_main_descriptors.glsl set 1/2) with a single flat texel buffer plus a
per-texture record table: TPU kernels want one statically-shaped array, so
every texture is appended to a [total_texels, 4] pool and sampled by
computed flat indices (bilinear, wrap-mode aware) — 4 gathers per lookup.

UsdUVTexture semantics implemented here: wrap modes (repeat / clamp /
mirror / black), scale & bias applied after lookup, sRGB->linear conversion
applied at upload time for color textures.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from gatling_tpu.interface import MAX_TEXTURE_COUNT
from gatling_tpu.utils.log import get_logger
from gatling_tpu import imgio

WRAP_BLACK = 0
WRAP_CLAMP = 1
WRAP_REPEAT = 2
WRAP_MIRROR = 3

_WRAP_NAMES = {
    "black": WRAP_BLACK, "clamp": WRAP_CLAMP,
    "repeat": WRAP_REPEAT, "mirror": WRAP_MIRROR,
    "useMetadata": WRAP_REPEAT,
}


@dataclasses.dataclass(frozen=True)
class TextureRef:
    """One texture request from a material network."""

    file_path: str
    is_srgb: bool = False
    wrap_s: str = "repeat"
    wrap_t: str = "repeat"
    scale: tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)
    bias: tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.0)
    channel: str = "rgb"  # rgb / r / g / b / a


class TexturePool(NamedTuple):
    """Device texture pool: flat texels + per-slot records."""

    texels: jnp.ndarray  # [N, 4] f32 linear
    offset: jnp.ndarray  # [T] i32 flat offset of texture start
    width: jnp.ndarray  # [T] i32
    height: jnp.ndarray  # [T] i32
    wrap_s: jnp.ndarray  # [T] i32 WRAP_*
    wrap_t: jnp.ndarray  # [T] i32
    scale: jnp.ndarray  # [T, 4] f32
    bias: jnp.ndarray  # [T, 4] f32

    @property
    def count(self) -> int:
        return self.offset.shape[0]


def empty_pool() -> TexturePool:
    return TexturePool(
        texels=jnp.zeros((1, 4), jnp.float32),
        offset=jnp.zeros((1,), jnp.int32),
        width=jnp.ones((1,), jnp.int32),
        height=jnp.ones((1,), jnp.int32),
        wrap_s=jnp.full((1,), WRAP_REPEAT, jnp.int32),
        wrap_t=jnp.full((1,), WRAP_REPEAT, jnp.int32),
        scale=jnp.ones((1, 4), jnp.float32),
        bias=jnp.zeros((1, 4), jnp.float32),
    )


def _srgb_to_linear(c: np.ndarray) -> np.ndarray:
    return np.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4).astype(np.float32)


class TextureManager:
    """Loads, caches, and packs textures (TextureManager.cpp analog)."""

    def __init__(self) -> None:
        self._image_cache: dict[str, np.ndarray] = {}  # path -> linear RGBA f32

    def _load(self, ref: TextureRef) -> np.ndarray:
        key = (ref.file_path, ref.is_srgb)
        cached = self._image_cache.get(key)
        if cached is not None:
            return cached
        try:
            from gatling_tpu.render.assets import read_asset

            raw = read_asset(ref.file_path)
            if raw is None:
                raise FileNotFoundError(ref.file_path)
            img = imgio.load_image(raw)
            rgba = img.as_float_rgba()
            if ref.is_srgb and not img.is_hdr:
                rgba = np.concatenate(
                    [_srgb_to_linear(rgba[..., :3]), rgba[..., 3:]], axis=-1)
        except Exception:  # noqa: BLE001
            # 1x1 black fallback (TextureManager.cpp:253-267)
            get_logger().error("texture load failed: %s", ref.file_path)
            rgba = np.zeros((1, 1, 4), np.float32)
        self._image_cache[key] = rgba.astype(np.float32)
        return self._image_cache[key]

    def build_pool(self, refs: list[TextureRef]) -> TexturePool:
        """Pack the given textures into a device pool. Slot i <-> refs[i]."""
        if not refs:
            return empty_pool()
        if len(refs) > MAX_TEXTURE_COUNT:
            raise ValueError(f"too many textures ({len(refs)} > {MAX_TEXTURE_COUNT})")
        texels = []
        offsets, widths, heights, ws, wt, scales, biases = [], [], [], [], [], [], []
        off = 0
        for ref in refs:
            img = self._load(ref)
            h, w = img.shape[:2]
            texels.append(img.reshape(-1, 4))
            offsets.append(off)
            widths.append(w)
            heights.append(h)
            ws.append(_WRAP_NAMES.get(ref.wrap_s, WRAP_REPEAT))
            wt.append(_WRAP_NAMES.get(ref.wrap_t, WRAP_REPEAT))
            scales.append(ref.scale)
            biases.append(ref.bias)
            off += h * w
        return TexturePool(
            texels=jnp.asarray(np.concatenate(texels, axis=0)),
            offset=jnp.asarray(np.array(offsets, np.int32)),
            width=jnp.asarray(np.array(widths, np.int32)),
            height=jnp.asarray(np.array(heights, np.int32)),
            wrap_s=jnp.asarray(np.array(ws, np.int32)),
            wrap_t=jnp.asarray(np.array(wt, np.int32)),
            scale=jnp.asarray(np.array(scales, np.float32)),
            bias=jnp.asarray(np.array(biases, np.float32)),
        )


def _wrap_coord(x: jnp.ndarray, size: jnp.ndarray, mode: jnp.ndarray):
    """Wrap integer texel coordinates; returns (index, inside_mask)."""
    size = jnp.maximum(size, 1)
    rep = jnp.mod(x, size)
    clamped = jnp.clip(x, 0, size - 1)
    period = jnp.mod(x, 2 * size)
    mirrored = jnp.where(period < size, period, 2 * size - 1 - period)
    inside = (x >= 0) & (x < size)
    idx = jnp.where(mode == WRAP_REPEAT, rep,
                    jnp.where(mode == WRAP_CLAMP, clamped,
                              jnp.where(mode == WRAP_MIRROR, mirrored, clamped)))
    valid = jnp.where(mode == WRAP_BLACK, inside, True)
    return idx, valid


def sample_pool(pool: TexturePool, tex_id: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear texture lookup for a batch of rays.

    tex_id [R] i32 (values < 0 are sampled as slot 0 — callers select the
    constant via jnp.where), uv [R,2] in UsdUVTexture convention
    (v up; texel row 0 is the image top). Returns RGBA [R,4] with
    scale/bias applied (mdl_interface.glsl tex_lookup analog).
    """
    t = jnp.maximum(tex_id, 0)
    w = pool.width[t]
    h = pool.height[t]
    off = pool.offset[t]
    ws = pool.wrap_s[t]
    wt = pool.wrap_t[t]

    # UsdUVTexture: v=0 is bottom; flip to row index
    x = uv[:, 0] * w.astype(jnp.float32) - 0.5
    y = (1.0 - uv[:, 1]) * h.astype(jnp.float32) - 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = (x - x0f)[:, None]
    fy = (y - y0f)[:, None]
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    def texel(xi, yi):
        xi_w, vx = _wrap_coord(xi, w, ws)
        yi_w, vy = _wrap_coord(yi, h, wt)
        val = pool.texels[off + yi_w * w + xi_w]
        return jnp.where((vx & vy)[:, None], val, 0.0)

    c00 = texel(x0, y0)
    c10 = texel(x0 + 1, y0)
    c01 = texel(x0, y0 + 1)
    c11 = texel(x0 + 1, y0 + 1)
    out = (c00 * (1 - fx) + c10 * fx) * (1 - fy) + (c01 * (1 - fx) + c11 * fx) * fy
    return out * pool.scale[t] + pool.bias[t]

