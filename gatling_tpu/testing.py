"""Graphical test harness.

Mirrors the reference's hdGatling_test GraphicalTestContext
(reference: src/hdGatling/main.cpp:220-509): a scene's UsdRenderSettings
prim drives resolution, camera, AOV render products and namespaced `gtl:`
settings (gtl:spp, gtl:errorPixelThreshold, gtl:jitteredSampling,
gtl:clippingPlanes, gtl:frame); each product is rendered, encoded to sRGB
bytes, diffed byte-wise against a committed reference PNG with an
error-pixel-count threshold, and a diff image is written as an artifact on
mismatch.
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path

import numpy as np

from gatling_tpu import gi, imgio
from gatling_tpu.interface import AOV_CHANNELS, AovId
from gatling_tpu.scene.stage import build_scene
from gatling_tpu.scene.usda import Stage, load_usd, load_usda
from gatling_tpu.utils.config import default_settings
from gatling_tpu.utils.log import get_logger

# Hydra AOV token -> AovId (reference: renderPass.cpp:41-59)
AOV_TOKENS = {
    "color": AovId.COLOR,
    "normal": AovId.NORMAL,
    "albedo": AovId.ALBEDO,
    "depth": AovId.DEPTH,
    "objectId": AovId.OBJECT_ID,
    "primId": AovId.OBJECT_ID,
    "faceId": AovId.FACE_ID,
    "element": AovId.FACE_ID,
    "instanceId": AovId.INSTANCE_ID,
    "barycentrics": AovId.BARYCENTRICS,
    "texcoords": AovId.TEXCOORDS,
    "bounces": AovId.BOUNCES,
    "opacity": AovId.OPACITY,
    "tangents": AovId.TANGENTS,
    "bitangents": AovId.BITANGENTS,
    "thinWalled": AovId.THIN_WALLED,
    "doubleSided": AovId.DOUBLE_SIDED,
    "nee": AovId.NEE,
    "clockCycles": AovId.CLOCK_CYCLES,
}


@dataclasses.dataclass
class RenderProduct:
    name: str
    resolution: tuple[int, int]
    camera_path: str | None
    aovs: list[tuple[str, AovId]]  # (sourceName, id)


@dataclasses.dataclass
class RenderSpec:
    products: list[RenderProduct]
    settings: dict


def compute_render_spec(stage: Stage) -> RenderSpec:
    """UsdRenderComputeSpec analog: resolve RenderSettings/Product/Var prims
    plus `gtl:` namespaced settings (main.cpp:288-330)."""
    rs_prim = None
    rs_path = stage.meta.get("renderSettingsPrimPath")
    if rs_path:
        rs_prim = stage.find(str(rs_path))
    if rs_prim is None:
        for p in stage.walk():
            if p.type_name == "RenderSettings":
                rs_prim = p
                break
    if rs_prim is None:
        raise ValueError("no RenderSettings prim in stage")

    settings = {}
    mapping = {
        "gtl:spp": ("spp", int),
        "gtl:errorPixelThreshold": ("errorPixelThreshold", int),
        "gtl:flipThreshold": ("flipThreshold", float),
        "gtl:frame": ("frame", float),
        "gtl:jitteredSampling": ("jitteredSampling", bool),
        "gtl:clippingPlanes": ("clippingPlanes", bool),
        "gtl:maxBounces": ("maxBounces", int),
        "gtl:nextEventEstimation": ("nextEventEstimation", bool),
    }
    for attr_name, (key, conv) in mapping.items():
        a = rs_prim.attrs.get(attr_name)
        if a is not None and a.value is not None:
            settings[key] = conv(a.value)

    def resolve_targets(prim, rel_name):
        out = []
        for target in prim.rels.get(rel_name, []):
            t = stage.find(target)
            if t is not None:
                out.append(t)
        return out

    products = []
    product_prims = resolve_targets(rs_prim, "products")
    if not product_prims:  # RenderSettings itself can hold resolution/camera
        product_prims = [rs_prim]
    for pp in product_prims:
        res = pp.attrs.get("resolution")
        resolution = tuple(int(v) for v in res.value) if res and res.value else (64, 64)
        cam_rel = pp.rels.get("camera", [])
        camera_path = cam_rel[0] if cam_rel else None
        aovs = []
        var_prims = resolve_targets(pp, "orderedVars")
        for vp in var_prims:
            src = vp.attrs.get("sourceName")
            name = str(src.value) if src and src.value else "color"
            aov = AOV_TOKENS.get(name)
            if aov is None:
                get_logger().warning("unknown render var sourceName %r", name)
                continue
            aovs.append((name, aov))
        if not aovs:
            aovs = [("color", AovId.COLOR)]
        products.append(RenderProduct(
            name=pp.name, resolution=resolution, camera_path=camera_path, aovs=aovs))
    return RenderSpec(products=products, settings=settings)


def _encode_srgb_u8(aov: AovId, data: np.ndarray) -> np.ndarray:
    """Render buffer -> RGBA8 bytes for diffing (main.cpp:332-376: sRGB for
    color, direct byte encode for data AOVs)."""
    h, w = data.shape[:2]
    out = np.full((h, w, 4), 255, np.uint8)
    if data.dtype == np.int32:
        v = data[:, :, 0].astype(np.float64)
        # stable id visualization: hash to gray
        v = np.where(v < 0, 0.0, (v % 255) / 255.0 * 0.8 + 0.2)
        rgb = np.repeat(v[:, :, None], 3, axis=2)
    else:
        rgb = data[:, :, :3].astype(np.float64)
        if aov == AovId.COLOR:
            rgb = np.clip(rgb, 0.0, 1.0)
            rgb = np.where(rgb <= 0.0031308, rgb * 12.92,
                           1.055 * np.power(np.maximum(rgb, 1e-9), 1 / 2.4) - 0.055)
        elif aov == AovId.DEPTH:
            rgb = np.repeat(np.clip(rgb[:, :, :1], 0, 1), 3, axis=2)
        else:
            rgb = np.clip(rgb, 0.0, 1.0)
    out[:, :, :3] = (rgb * 255.0 + 0.5).astype(np.uint8)
    return out


def render_products(scene_path: str | Path) -> tuple[dict[str, np.ndarray], RenderSpec]:
    """Render every (product, aov) of a test scene; returns byte images keyed
    by '<aov-name>' (flipped to image convention)."""
    stage = load_usd(scene_path)
    spec = compute_render_spec(stage)
    # resolve timeSamples (geometry AND skinning) at the test's frame —
    # gtl:frame beats the layer default (renderPass.cpp frame plumbing)
    from gatling_tpu.scene.usda import resolve_frame, stage_frame_default

    frame = spec.settings.get("frame")
    resolve_frame(stage, float(frame) if frame is not None
                  else stage_frame_default(stage))
    desc = build_scene(stage)

    scene = gi.create_scene()
    for m in desc.meshes:
        scene.add_mesh(m)
    for mat in desc.materials.values():
        scene.add_material(mat)
    dome = None
    for l in desc.lights:
        if l.light_type == "dome":
            dome = gi.GiDomeLight(file_path=l.params.get("texture"))
            scene.set_dome_light(dome)
        else:
            scene.add_light(l)

    merged = default_settings()
    merged["metersPerSceneUnit"] = desc.meters_per_unit
    merged.update({k: v for k, v in spec.settings.items() if k != "errorPixelThreshold"})

    images: dict[str, np.ndarray] = {}
    for product in spec.products:
        camera = None
        if product.camera_path:
            camera = desc.cameras.get(product.camera_path)
        if camera is None:
            camera = desc.first_camera()
        if camera is None:
            raise ValueError(f"no camera for product {product.name}")
        w, h = product.resolution
        bindings = []
        buffers = {}
        for name, aov in product.aovs:
            is_int = aov in (AovId.OBJECT_ID, AovId.FACE_ID, AovId.INSTANCE_ID)
            ch = 1 if is_int else max(AOV_CHANNELS[aov], 3)
            buf = gi.GiRenderBuffer(w, h, ch, is_int)
            clear = -1 if is_int else None
            bindings.append(gi.GiAovBinding(aov, buf, clear_value=clear))
            buffers[name] = (aov, buf)
        params = gi.GiRenderParams(
            scene=scene, camera=camera, aov_bindings=bindings,
            render_settings=dict(merged), dome_light=dome)
        scene.dirty |= gi.DirtyFlags.FRAMEBUFFER  # independent products
        gi.render(params)
        for name, (aov, buf) in buffers.items():
            images[name] = _encode_srgb_u8(aov, buf.data[::-1])
    return images, spec


def run_graphical_test(scene_path: str | Path, output_dir: str | Path) -> list[str]:
    """Render a test scene and diff against committed refs.

    Returns a list of failure messages (empty = pass). Writes test_*.png
    always and diff_*.png for mismatches (artifact upload analog,
    build.yml:182-188).
    """
    scene_path = Path(scene_path)
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    images, spec = render_products(scene_path)
    threshold = int(spec.settings.get("errorPixelThreshold", 0))
    flip_threshold = float(spec.settings.get("flipThreshold", 0.0))

    failures = []
    for name, test_img in images.items():
        imgio.write_image_file(output_dir / f"test_{name}.png", test_img)
        ref_path = scene_path.parent / f"ref_{name}.png"
        if not ref_path.exists():
            failures.append(f"{name}: missing reference image {ref_path}")
            continue
        ref_img = imgio.load_image_file(ref_path).data
        if ref_img.shape != test_img.shape:
            failures.append(f"{name}: resolution mismatch {ref_img.shape} vs {test_img.shape}")
            continue
        diff = np.abs(ref_img.astype(int) - test_img.astype(int))
        error_pixels = int((diff > 0).sum())
        if error_pixels > threshold:
            diff_img = (255 - diff).astype(np.uint8)
            imgio.write_image_file(output_dir / f"diff_{name}.png", diff_img)
            failures.append(
                f"{name}: {error_pixels} error components > threshold {threshold}")
        if flip_threshold > 0.0 and test_img.shape[-1] >= 3:
            # perceptual gate (BASELINE north star: FLIP-matched images):
            # mean LDR-FLIP against the committed reference
            from gatling_tpu.flip import mean_flip

            score = mean_flip(ref_img[..., :3], test_img[..., :3])
            if score > flip_threshold:
                failures.append(
                    f"{name}: mean FLIP {score:.4f} > threshold {flip_threshold}")
    return failures


def generate_references(scene_path: str | Path) -> None:
    """(Re)generate the committed reference images for a test scene."""
    scene_path = Path(scene_path)
    images, _spec = render_products(scene_path)
    for name, img in images.items():
        imgio.write_image_file(scene_path.parent / f"ref_{name}.png", img)
