"""Headless standalone renderer CLI.

Mirrors the reference CLI (reference: src/gatling/main.cpp:94-265 and
Argparse.cpp:30-318): `gatling <scene.usda> <out.png> [options]` where the
option table is auto-generated from the render-setting descriptors (the same
single-source-of-truth pattern: one table drives UI, DS files and CLI), plus
the app settings image-width/height, camera-path, aov and gamma-correction.
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

import numpy as np

from gatling_tpu import gi, imgio
from gatling_tpu.interface import AovId
from gatling_tpu.scene.stage import load_scene
from gatling_tpu.utils.config import SETTING_DESCRIPTORS, default_settings
from gatling_tpu.utils.log import get_logger, init_logging


def _kebab(name: str) -> str:
    return re.sub(r"(?<!^)(?=[A-Z])", "-", name).lower()


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="gatling",
        description="TPU-native USD path tracer (gatling_tpu)")
    p.add_argument("scene", help="input USD scene (.usd / .usda / .usdc / .usdz)")
    p.add_argument("output", help="output image (.png/.exr/.hdr/...)")
    # app settings (Argparse.cpp:150-200)
    p.add_argument("--image-width", type=int, default=1200)
    p.add_argument("--image-height", type=int, default=1200)
    p.add_argument("--camera-path", type=str, default=None)
    p.add_argument("--aov", type=str, default="color",
                   choices=[a.name.lower() for a in AovId])
    p.add_argument("--gamma-correction", action=argparse.BooleanOptionalAction, default=True,
                   help="encode output as sRGB (main.cpp:84-92)")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="progressive-accumulation checkpoint (.npz): resumed "
                        "if it exists, written after the render")
    p.add_argument("--watch", action="store_true",
                   help="re-render whenever the scene file changes (the "
                        "shader hot-reload analog, Gi.cpp:261-285)")
    # render settings auto-generated from descriptors
    for d in SETTING_DESCRIPTORS:
        flag = "--" + _kebab(d.name)
        if d.type is bool:
            p.add_argument(flag, action=argparse.BooleanOptionalAction,
                           default=d.default, help=d.help, dest=d.name)
        else:
            p.add_argument(flag, type=d.type, default=d.default, help=d.help, dest=d.name)
    return p


def linear_to_srgb(c: np.ndarray) -> np.ndarray:
    """Reference: main.cpp:84-92."""
    c = np.clip(c, 0.0, 1.0)
    return np.where(c <= 0.0031308, c * 12.92, 1.055 * np.power(c, 1.0 / 2.4) - 0.055)


def render_scene_file(
    scene_path: str,
    width: int,
    height: int,
    settings: dict,
    aov: AovId = AovId.COLOR,
    camera_path: str | None = None,
    checkpoint: str | None = None,
):
    """Load a USD scene and render one frame; returns (np image [H,W,C], scene)."""
    log = get_logger()
    t0 = time.monotonic()
    desc = load_scene(scene_path, frame=settings.get("frame"))
    log.info("loaded %s: %d meshes, %d materials, %d lights (%.1f ms)",
             scene_path, len(desc.meshes), len(desc.materials), len(desc.lights),
             1e3 * (time.monotonic() - t0))

    scene = gi.create_scene()
    for m in desc.meshes:
        scene.add_mesh(m)
    for mat in desc.materials.values():
        scene.add_material(mat)
    dome = None
    for l in desc.lights:
        if l.light_type == "dome":
            dome = gi.GiDomeLight(file_path=l.params.get("texture"))
            # UsdLux dome orientation: transform -> quat (kept identity w/o rotation)
            scene.set_dome_light(dome)
        else:
            scene.add_light(l)

    camera = None
    if camera_path:
        camera = desc.cameras.get(camera_path)
        if camera is None:
            log.error("camera %s not found", camera_path)
    if camera is None:
        camera = desc.first_camera()
    if camera is None:
        log.warning("no camera in scene; using default")
        from gatling_tpu.scene.stage import CameraDesc
        camera = CameraDesc(
            position=np.array([0, 0, 5], np.float32),
            forward=np.array([0, 0, -1], np.float32),
            up=np.array([0, 1, 0], np.float32), vfov=0.4)

    merged = default_settings()
    merged.update(desc.render_settings)
    merged.update(settings)
    if "metersPerSceneUnit" not in settings:
        merged["metersPerSceneUnit"] = desc.meters_per_unit

    is_int = aov in (AovId.OBJECT_ID, AovId.FACE_ID, AovId.INSTANCE_ID)
    from gatling_tpu.interface import AOV_CHANNELS
    buf = gi.GiRenderBuffer(width, height, max(AOV_CHANNELS[aov], 3) if not is_int else 1, is_int)
    params = gi.GiRenderParams(
        scene=scene,
        camera=camera,
        aov_bindings=[gi.GiAovBinding(aov_id=aov, render_buffer=buf)],
        render_settings=merged,
        dome_light=dome,
    )
    if checkpoint and os.path.exists(checkpoint):
        offset = gi.giLoadCheckpoint(scene, checkpoint)
        log.info("resumed checkpoint %s at sampleOffset %d", checkpoint, offset)
    t0 = time.monotonic()
    gi.render(params)
    log.info("rendered %dx%d @ %d spp in %.2f s", width, height,
             merged.get("spp", 1), time.monotonic() - t0)
    if checkpoint:
        gi.giSaveCheckpoint(scene, checkpoint)
        log.info("wrote checkpoint %s (sampleOffset %d)", checkpoint,
                 scene.sample_offset)
    return buf.data, scene


def _write_output(img, args, aov):
    out = img[::-1]  # flip vertically for image convention (main.cpp:224-249)
    if out.dtype == np.int32:
        out = out.astype(np.float32) / max(1.0, out.max())
    if args.output.endswith((".png", ".jpg", ".jpeg", ".tga", ".tiff", ".tif")):
        rgb = out[:, :, :3] if out.shape[2] >= 3 else np.repeat(out, 3, axis=2)
        if args.gamma_correction and aov == AovId.COLOR:
            rgb = linear_to_srgb(rgb)
        imgio.write_image_file(args.output, np.clip(rgb, 0, 1).astype(np.float32))
    else:
        imgio.write_image_file(args.output, out.astype(np.float32))
    get_logger().info("wrote %s", args.output)


def watched_material_sources(scene, scene_path: str) -> dict[str, float]:
    """Hot-reload watch set: the scene file plus every material source it
    references — texture files and .mdl modules — mapped to mtimes. The
    analog of the reference's efsw watcher over the GLSL/MDL shader dir
    (Gi.cpp:261-285): editing any material source invalidates and
    re-renders."""
    paths = {scene_path}
    for mat in getattr(scene, "materials", {}).values():
        base = getattr(mat, "base_dir", "") or ""
        for node in mat.nodes.values():
            f = node.inputs.get("file")
            if isinstance(f, str) and f:
                paths.add(f if os.path.isabs(f) else os.path.join(base, f))
        mdl = getattr(mat, "mdl_source", None)
        if mdl:
            paths.add(mdl)
    out = {}
    for p in paths:
        try:
            out[p] = os.path.getmtime(p)
        except OSError:
            pass
    return out


def watched_shader_sources() -> dict[str, float]:
    """The shader-code watch set: gatling_tpu's render/ and ops/ Python
    modules — the TPU analog of the reference's efsw watcher over
    src/gi/shaders (Gi.cpp:18-20, 261-285). Editing one re-execs the
    process so the new kernel/BSDF code compiles into fresh pipelines,
    with accumulation reset (the reference also resets sampleOffset on
    shader reload). Disable with GATLING_WATCH_SHADERS=0."""
    if os.environ.get("GATLING_WATCH_SHADERS", "1") == "0":
        return {}
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = {}
    for sub in ("render", "ops"):
        d = os.path.join(pkg_dir, sub)
        try:
            names = os.listdir(d)
        except OSError:
            continue
        for f in names:
            if f.endswith(".py"):
                p = os.path.join(d, f)
                try:
                    out[p] = os.path.getmtime(p)
                except OSError:
                    pass
    return out


def main(argv: list[str] | None = None) -> int:
    init_logging()
    args = build_arg_parser().parse_args(argv)
    settings = {d.name: getattr(args, d.name) for d in SETTING_DESCRIPTORS}
    aov = AovId[args.aov.upper()]

    img, _scene = render_scene_file(
        args.scene, args.image_width, args.image_height, settings, aov,
        args.camera_path, checkpoint=args.checkpoint)

    if args.watch:
        # hot-reload watcher (the efsw shader watcher analog, Gi.cpp:261-285):
        # watches the scene file AND every material source it references —
        # texture files and .mdl modules — re-rendering on any change, the
        # way the reference invalidates its shader cache when a GLSL/MDL
        # source under the shader dir is edited
        _write_output(img, args, aov)

        last = watched_material_sources(_scene, args.scene)
        last_shaders = watched_shader_sources()
        get_logger().info(
            "watching %d file(s) (scene + material sources) and %d shader "
            "module(s) for changes (ctrl-c to stop)",
            len(last), len(last_shaders))
        try:
            while True:
                time.sleep(0.5)
                shaders_now = watched_shader_sources()
                if shaders_now != last_shaders:
                    # shader-code hot reload: re-exec so the edited kernel /
                    # BSDF modules re-import and recompile (the pipeline
                    # rebuild of Gi.cpp:2036-2040 s_forceShaderCacheInvalid;
                    # accumulation resets like the reference's sample reset)
                    get_logger().info("shader module changed; reloading")
                    sys.stdout.flush()
                    os.execv(sys.executable, [sys.executable, "-m",
                                              "gatling_tpu.cli"] + sys.argv[1:])
                now = watched_material_sources(_scene, args.scene)
                if now != last:
                    img, _scene = render_scene_file(
                        args.scene, args.image_width, args.image_height,
                        settings, aov, args.camera_path)
                    _write_output(img, args, aov)
                    last = watched_material_sources(_scene, args.scene)
        except KeyboardInterrupt:
            return 0

    _write_output(img, args, aov)
    return 0


if __name__ == "__main__":
    sys.exit(main())
