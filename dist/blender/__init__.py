"""Blender addon: render the current scene's USD export through gatling_tpu.

The reference ships a Blender HydraRenderEngine addon (reference:
dist/blender/engine.py:12-54) that registers the hdGatling delegate inside
Blender's Hydra viewport. Blender's Hydra only loads native pxr plugins, so
the TPU build integrates differently: this addon exports the scene to USD
(Blender's built-in USD exporter) and drives the gatling_tpu headless CLI,
mapping the same addon properties onto the same render settings (the
descriptor table in gatling_tpu/utils/config.py is the single source of
truth, exactly like the reference's HdRenderSettingDescriptors).

Install: copy this folder to Blender's addons directory as `gatling_tpu_render`
and enable it; set the interpreter path to a python with gatling_tpu on its
PYTHONPATH in the addon preferences.
"""

bl_info = {
    "name": "Gatling TPU Renderer",
    "author": "gatling_tpu",
    "version": (0, 1, 0),
    "blender": (4, 0, 0),
    "category": "Render",
    "description": "Path-traced renders on TPU via the gatling_tpu CLI",
}

import os
import subprocess
import tempfile


def _collect_settings(scene):
    """Map addon properties -> CLI flags (engine.py:12-54 analog)."""
    props = getattr(scene, "gatling_tpu", None)
    flags = []
    if props is None:
        return flags
    for name in ("spp", "max_bounces", "rr_bounce_offset"):
        if hasattr(props, name):
            flags += [f"--{name.replace('_', '-')}", str(getattr(props, name))]
    if getattr(props, "next_event_estimation", False):
        flags.append("--next-event-estimation")
    return flags


def render_scene(scene, python_exe="python3", output_path=None):
    """Export the Blender scene to USD and render it headlessly."""
    import bpy  # noqa: PLC0415 (only importable inside Blender)

    tmpdir = tempfile.mkdtemp(prefix="gatling_tpu_")
    usd_path = os.path.join(tmpdir, "scene.usda")
    out_path = output_path or os.path.join(tmpdir, "render.png")
    bpy.ops.wm.usd_export(filepath=usd_path, export_materials=True,
                          export_textures=True)
    cmd = [python_exe, "-m", "gatling_tpu.cli", usd_path, out_path,
           "--image-width", str(scene.render.resolution_x),
           "--image-height", str(scene.render.resolution_y)]
    cmd += _collect_settings(scene)
    subprocess.run(cmd, check=True)
    return out_path


def register():  # Blender addon hook
    pass


def unregister():
    pass
