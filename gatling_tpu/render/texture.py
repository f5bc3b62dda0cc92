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

# procedural generator Expr ops baked over a uv grid (render/procedural.py)
_PROC_OPS = frozenset((
    "checkerboard", "ramplr", "ramptb", "ramp4", "noise2d", "noise3d",
    "fractal3d", "cellnoise2d", "cellnoise3d", "worleynoise2d",
    "worleynoise3d", "texcoord",
))

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
    # non-affine shader-graph subtree to BAKE into this texture's pixels at
    # load time (render/shadergraph.py Expr); file_path is then a synthetic
    # baked:// cache key
    bake: "object | None" = None


class TexturePool(NamedTuple):
    """Device texture pool: flat texels + per-slot records.

    When every texture in the pool is exactly representable as 8-bit RGBA
    (the PNG/JPEG/TGA majority), `texels_u32` holds the pool as ONE packed
    uint32 per texel and `texels` shrinks to a dummy: a bilinear tap then
    gathers 1 element instead of 4 (TPU gathers are element-count-bound —
    measured 4x on the split-bounce texture stage), and sRGB decode moves
    after the tap (bit-exact vs decode-at-upload since the 8-bit codes are
    the source data). HDR pools (EXR/HDR inputs) keep the f32 path."""

    texels: jnp.ndarray  # [N, 4] f32 linear ([1,4] dummy when packed)
    texels_u32: jnp.ndarray  # [N] u32 rgba8 raw codes ([1] dummy when not)
    # [N, 4] u32: each texel's 2x2 neighborhood (self, +x, +y, +x+y) with
    # repeat wrap baked in — ONE gather row per bilinear tap instead of 4
    # (built when packed and every slot wraps repeat; [1,4] dummy else)
    texels_q22: jnp.ndarray
    is_srgb: jnp.ndarray  # [T] i32 1 = decode sRGB after unpack (packed)
    offset: jnp.ndarray  # [T] i32 flat offset of texture start
    width: jnp.ndarray  # [T] i32
    height: jnp.ndarray  # [T] i32
    wrap_s: jnp.ndarray  # [T] i32 WRAP_*
    wrap_t: jnp.ndarray  # [T] i32
    scale: jnp.ndarray  # [T, 4] f32
    bias: jnp.ndarray  # [T, 4] f32
    # [T, 4] f32 per-slot mean of (linear texels * scale + bias) — the
    # "top mip": texture-LOD bounces substitute it for the per-ray tap
    # (render setting textureLodBounces; material.substitute_texture_means)
    mean: jnp.ndarray

    @property
    def count(self) -> int:
        return self.offset.shape[0]

    @property
    def packed(self) -> bool:
        return self.texels_u32.shape[0] > 1

    @property
    def bilinear_packed(self) -> bool:
        return self.texels_q22.shape[0] > 1


def empty_pool() -> TexturePool:
    return TexturePool(
        texels=jnp.zeros((1, 4), jnp.float32),
        texels_u32=jnp.zeros((1,), jnp.uint32),
        texels_q22=jnp.zeros((1, 4), jnp.uint32),
        is_srgb=jnp.zeros((1,), jnp.int32),
        offset=jnp.zeros((1,), jnp.int32),
        width=jnp.ones((1,), jnp.int32),
        height=jnp.ones((1,), jnp.int32),
        wrap_s=jnp.full((1,), WRAP_REPEAT, jnp.int32),
        wrap_t=jnp.full((1,), WRAP_REPEAT, jnp.int32),
        scale=jnp.ones((1, 4), jnp.float32),
        bias=jnp.zeros((1, 4), jnp.float32),
        mean=jnp.zeros((1, 4), jnp.float32),
    )


def baked_ref(expr, channel: str = "rgb") -> TextureRef:
    """TextureRef for a non-affine shader-graph composite (baked at pool
    build, TextureManager._eval_bake). Wrap modes come from the first
    texture leaf; the synthetic baked:// path is the cache key."""
    import hashlib

    def first_leaf(e):
        if e.op == "tex":
            return e.tex
        for a in e.args:
            leaf = first_leaf(a)
            if leaf is not None:
                return leaf
        return None

    leaf = first_leaf(expr)
    key = hashlib.md5(repr(expr).encode()).hexdigest()[:16]
    return TextureRef(
        file_path=f"baked://{key}",
        is_srgb=True,  # baked LDR composites are stored sRGB-encoded
        wrap_s=leaf.wrap_s if leaf is not None else "repeat",
        wrap_t=leaf.wrap_t if leaf is not None else "repeat",
        channel=channel, bake=expr)


def _srgb_to_linear(c: np.ndarray) -> np.ndarray:
    return np.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4).astype(np.float32)


class TextureManager:
    """Loads, caches, and packs textures (TextureManager.cpp analog)."""

    def __init__(self) -> None:
        self._image_cache: dict[str, np.ndarray] = {}  # path -> linear RGBA f32
        # path -> (raw RGBA f32 as decoded, is_hdr) for u32 pool packing
        self._raw_cache: dict[str, tuple[np.ndarray, bool]] = {}

    def _resize(self, img: np.ndarray, h: int, w: int) -> np.ndarray:
        """Bilinear resize [h0,w0,4] -> [h,w,4] (for baking mixed-resolution
        composites)."""
        h0, w0 = img.shape[:2]
        if (h0, w0) == (h, w):
            return img
        ys = (np.arange(h) + 0.5) * h0 / h - 0.5
        xs = (np.arange(w) + 0.5) * w0 / w - 0.5
        y0 = np.clip(np.floor(ys).astype(int), 0, h0 - 1)
        x0 = np.clip(np.floor(xs).astype(int), 0, w0 - 1)
        y1 = np.minimum(y0 + 1, h0 - 1)
        x1 = np.minimum(x0 + 1, w0 - 1)
        fy = np.clip(ys - y0, 0, 1)[:, None, None]
        fx = np.clip(xs - x0, 0, 1)[None, :, None]
        a = img[y0][:, x0] * (1 - fx) + img[y0][:, x1] * fx
        b = img[y1][:, x0] * (1 - fx) + img[y1][:, x1] * fx
        return (a * (1 - fy) + b * fy).astype(np.float32)

    def _eval_bake(self, expr) -> np.ndarray:
        """Evaluate a shader-graph Expr to a LINEAR rgba image on the host
        (the composite-baking backend of render/shadergraph.py): texture
        leaves load through the cache with their own sRGB/affine applied,
        constants broadcast, mixed resolutions bilinearly upsample to the
        largest leaf."""
        if expr.op == "const":
            return np.asarray(expr.const, np.float32).reshape(1, 1, 4)
        if expr.op == "tex":
            ref = expr.tex
            img = self._load(ref) * np.asarray(ref.scale, np.float32) \
                + np.asarray(ref.bias, np.float32)
            if ref.channel in ("r", "g", "b", "a"):
                i = "rgba".index(ref.channel)
                img = np.repeat(img[..., i:i + 1], 4, axis=-1)
            return img.astype(np.float32)
        from gatling_tpu.render.procedural import (PROC_BAKE_RES,
                                                   eval_generator)

        args = [self._eval_bake(a) for a in expr.args]
        is_proc = expr.op in _PROC_OPS
        h = max([a.shape[0] for a in args]
                + ([PROC_BAKE_RES] if is_proc else []))
        w = max([a.shape[1] for a in args]
                + ([PROC_BAKE_RES] if is_proc else []))
        args = [self._resize(a, h, w) if a.shape[:2] != (1, 1) else a
                for a in args]
        if is_proc:
            # texel-center uv grid; v=0 is the BOTTOM row (UsdUVTexture
            # convention, sample_pool)
            u = ((np.arange(w) + 0.5) / w)[None, :] * np.ones((h, 1))
            v = (1.0 - (np.arange(h) + 0.5) / h)[:, None] * np.ones((1, w))
            args = [np.broadcast_to(a, (h, w, 4)) for a in args]
            return eval_generator(expr.op, expr.const, args, u, v)
        if expr.op == "multiply":
            return args[0] * args[1]
        if expr.op == "divide":
            d = args[1]
            return np.where(d != 0.0, args[0] / np.where(d != 0.0, d, 1.0), 0.0)
        if expr.op == "add":
            return args[0] + args[1]
        if expr.op == "subtract":
            return args[0] - args[1]
        if expr.op == "mix":
            fg, bg, m = args
            return fg * m + bg * (1.0 - m)
        if expr.op == "clamp":
            return np.clip(args[0], args[1], args[2])
        if expr.op == "extract":
            i = "rgba".index(expr.channel)
            return np.repeat(args[0][..., i:i + 1], 4, axis=-1)
        raise ValueError(f"unbakeable shader expr op: {expr.op}")

    def _bake_shape(self, expr) -> tuple[int, int, int]:
        """(H, W, 4) of a baked composite: the largest leaf resolution."""
        if expr.op == "tex":
            img, _hdr = self._load_raw(expr.tex)
            return (img.shape[0], img.shape[1], 4)
        if expr.op == "const":
            return (1, 1, 4)
        from gatling_tpu.render.procedural import PROC_BAKE_RES

        base = [PROC_BAKE_RES] if expr.op in _PROC_OPS else [1]
        shapes = [self._bake_shape(a) for a in expr.args]
        return (max([s[0] for s in shapes] + base),
                max([s[1] for s in shapes] + base), 4)

    def _load_raw(self, ref: TextureRef) -> tuple[np.ndarray, bool]:
        cached = self._raw_cache.get(ref.file_path)
        if cached is not None:
            return cached
        if ref.bake is not None:
            # bake the composite; store sRGB-encoded when LDR so the pool
            # stays u32-packable (ref.is_srgb must be True for the decode)
            linear = np.broadcast_to(self._eval_bake(ref.bake),
                                     self._bake_shape(ref.bake)).copy()
            if linear.min() >= 0.0 and linear.max() <= 1.0:
                rgb = linear[..., :3]
                enc = np.where(rgb <= 0.0031308, rgb * 12.92,
                               1.055 * np.maximum(rgb, 1e-12) ** (1 / 2.4) - 0.055)
                raw = np.concatenate([enc, linear[..., 3:]], axis=-1)
                # quantize to the 8-bit codes the u32 pool stores, so the
                # f32 fallback path sees the same values (half-step sRGB
                # error — the same class as any LDR source texture)
                raw = np.round(np.clip(raw, 0.0, 1.0) * 255.0) / 255.0
                out = (raw.astype(np.float32), False)
            else:
                # HDR result: keep linear floats (pool falls back to f32);
                # _load skips the sRGB decode via the hdr flag
                out = (linear.astype(np.float32), True)
            self._raw_cache[ref.file_path] = out
            return out
        try:
            from gatling_tpu.render.assets import read_asset

            raw = read_asset(ref.file_path)
            if raw is None:
                raise FileNotFoundError(ref.file_path)
            img = imgio.load_image(raw)
            rgba = img.as_float_rgba().astype(np.float32)
            hdr = bool(img.is_hdr)
        except Exception:  # noqa: BLE001
            # 1x1 black fallback (TextureManager.cpp:253-267)
            get_logger().error("texture load failed: %s", ref.file_path)
            rgba, hdr = np.zeros((1, 1, 4), np.float32), False
        self._raw_cache[ref.file_path] = (rgba, hdr)
        return self._raw_cache[ref.file_path]

    def _load(self, ref: TextureRef) -> np.ndarray:
        key = (ref.file_path, ref.is_srgb)
        cached = self._image_cache.get(key)
        if cached is not None:
            return cached
        rgba, hdr = self._load_raw(ref)
        if ref.is_srgb and not hdr:
            rgba = np.concatenate(
                [_srgb_to_linear(rgba[..., :3]), rgba[..., 3:]], axis=-1)
        self._image_cache[key] = rgba.astype(np.float32)
        return self._image_cache[key]

    def build_pool(self, refs: list[TextureRef]) -> TexturePool:
        """Pack the given textures into a device pool. Slot i <-> refs[i]."""
        if not refs:
            return empty_pool()
        if len(refs) > MAX_TEXTURE_COUNT:
            raise ValueError(f"too many textures ({len(refs)} > {MAX_TEXTURE_COUNT})")
        texels = []
        raws, srgbs = [], []
        packable = True
        offsets, widths, heights, ws, wt, scales, biases = [], [], [], [], [], [], []
        means = []
        off = 0
        for ref in refs:
            img = self._load(ref)
            means.append(img.reshape(-1, 4).mean(axis=0)
                         * np.asarray(ref.scale, np.float32)
                         + np.asarray(ref.bias, np.float32))
            raw, hdr = self._load_raw(ref)
            codes = np.round(raw * 255.0)
            if hdr or raw.size == 0 or np.abs(raw * 255.0 - codes).max() > 1e-3 \
                    or codes.min() < 0 or codes.max() > 255:
                packable = False
            else:
                c = codes.astype(np.uint32).reshape(-1, 4)
                raws.append(c[:, 0] | (c[:, 1] << 8) | (c[:, 2] << 16)
                            | (c[:, 3] << 24))
                srgbs.append(1 if ref.is_srgb else 0)
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
        if packable:
            tex_f32 = jnp.zeros((1, 4), jnp.float32)
            # trailing dummy element: `packed` (shape > 1) must hold even
            # for a single-texel pool
            tex_u32 = jnp.asarray(np.concatenate(
                raws + [np.zeros(1, np.uint32)]))
            is_srgb = jnp.asarray(np.array(srgbs, np.int32))
        else:
            tex_f32 = jnp.asarray(np.concatenate(texels, axis=0))
            tex_u32 = jnp.zeros((1,), jnp.uint32)
            is_srgb = jnp.zeros((len(refs),), jnp.int32)
        all_repeat = all(w == WRAP_REPEAT for w in ws + wt)
        if packable and all_repeat:
            # 2x2-neighborhood rows (repeat wrap baked in): a bilinear tap
            # becomes ONE gathered [4]-row instead of 4 separate gathers
            q22 = []
            for codes, w, h in zip(raws, widths, heights):
                c = codes.reshape(h, w)
                q = np.stack([c,
                              np.roll(c, -1, axis=1),
                              np.roll(c, -1, axis=0),
                              np.roll(np.roll(c, -1, axis=0), -1, axis=1)],
                             axis=-1)
                q22.append(q.reshape(-1, 4))
            q22.append(np.zeros((1, 4), np.uint32))
            tex_q22 = jnp.asarray(np.concatenate(q22, axis=0))
        else:
            tex_q22 = jnp.zeros((1, 4), jnp.uint32)
        return TexturePool(
            texels=tex_f32,
            texels_u32=tex_u32,
            texels_q22=tex_q22,
            is_srgb=is_srgb,
            offset=jnp.asarray(np.array(offsets, np.int32)),
            width=jnp.asarray(np.array(widths, np.int32)),
            height=jnp.asarray(np.array(heights, np.int32)),
            wrap_s=jnp.asarray(np.array(ws, np.int32)),
            wrap_t=jnp.asarray(np.array(wt, np.int32)),
            scale=jnp.asarray(np.array(scales, np.float32)),
            bias=jnp.asarray(np.array(biases, np.float32)),
            mean=jnp.asarray(np.array(means, np.float32)),
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


def _filter_mode() -> str:
    """Texture filter: 'bilinear' (default, reference parity) or 'nearest'
    (GATLING_TEX_FILTER=nearest). XLA TPU gathers cost ~8 cycles per
    gathered row regardless of width (measured), so nearest is ~4x cheaper
    per lookup. Process-level switch: set before the first render (jitted
    graphs bake the mode in)."""
    import os

    return os.environ.get("GATLING_TEX_FILTER", "bilinear")


def sample_pool(pool: TexturePool, tex_id: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Texture lookup for a batch of rays (bilinear, or nearest under
    GATLING_TEX_FILTER=nearest).

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

    if pool.packed:
        srgb = (pool.is_srgb[t] > 0)[:, None]

        def unpack(code):
            # u32 rgba8 -> [R,4] f32 linear; sRGB decoded after the tap:
            # bit-exact vs decode-at-upload because the u32 codes ARE the
            # 8-bit source data
            val = jnp.stack([
                (code & 0xFF).astype(jnp.float32),
                ((code >> 8) & 0xFF).astype(jnp.float32),
                ((code >> 16) & 0xFF).astype(jnp.float32),
                ((code >> 24) & 0xFF).astype(jnp.float32),
            ], axis=-1) * (1.0 / 255.0)
            c = val[:, :3]
            lin = jnp.where(c <= 0.04045, c / 12.92,
                            ((c + 0.055) / 1.055) ** 2.4)
            return jnp.concatenate(
                [jnp.where(srgb, lin, c), val[:, 3:]], axis=-1)

    bilinear = _filter_mode() != "nearest"
    if bilinear and pool.bilinear_packed:
        # fast bilinear: ONE gathered [4]-row per tap — the 2x2
        # neighborhood was baked per texel at build time (repeat wrap).
        # XLA TPU gathers cost ~8 cycles per gathered row regardless of
        # row width (measured: 2.5x on the full textured frame).
        xw = jnp.mod(x0, w)
        yw = jnp.mod(y0, h)
        rowq = pool.texels_q22[off + yw * w + xw]  # [R, 4] u32
        c00 = unpack(rowq[:, 0])
        c10 = unpack(rowq[:, 1])
        c01 = unpack(rowq[:, 2])
        c11 = unpack(rowq[:, 3])
        out = ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
               + (c01 * (1 - fx) + c11 * fx) * fy)
        return out * pool.scale[t] + pool.bias[t]

    if pool.packed:
        # one u32 gather per tap (4x less gathered data than f32x4)
        def texel(xi, yi):
            xi_w, vx = _wrap_coord(xi, w, ws)
            yi_w, vy = _wrap_coord(yi, h, wt)
            code = pool.texels_u32[off + yi_w * w + xi_w]
            return jnp.where((vx & vy)[:, None], unpack(code), 0.0)
    else:
        def texel(xi, yi):
            xi_w, vx = _wrap_coord(xi, w, ws)
            yi_w, vy = _wrap_coord(yi, h, wt)
            val = pool.texels[off + yi_w * w + xi_w]
            return jnp.where((vx & vy)[:, None], val, 0.0)

    if not bilinear:
        out = texel(jnp.round(x).astype(jnp.int32),
                    jnp.round(y).astype(jnp.int32))
    else:
        c00 = texel(x0, y0)
        c10 = texel(x0 + 1, y0)
        c01 = texel(x0, y0 + 1)
        c11 = texel(x0 + 1, y0 + 1)
        out = ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
               + (c01 * (1 - fx) + c11 * fx) * fy)
    return out * pool.scale[t] + pool.bias[t]

