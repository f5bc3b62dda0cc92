# Gatling TPU render engine add-on for Blender.
#
# Structural mirror of the reference's add-on split (reference:
# dist/blender/__init__.py registering engine + properties + ui). The
# reference subclasses bpy.types.HydraRenderEngine and loads the hdGatling
# pxr plugin (dist/blender/engine.py:12-54); gatling_tpu is a Python
# renderer without a pxr plugin, so this engine is a classic
# bpy.types.RenderEngine that exports the scene through Blender's bundled
# USD exporter and renders it with the gatling_tpu CLI on the TPU host.

bl_info = {
    "name": "Gatling TPU",
    "description": "TPU path tracer (gatling_tpu) render engine",
    "author": "gatling_tpu",
    "version": (0, 2, 0),
    "blender": (4, 0, 0),
    "category": "Render",
}

from . import engine, properties, ui  # noqa: E402


def register():
    engine.register()
    properties.register()
    ui.register()


def unregister():
    ui.unregister()
    properties.unregister()
    engine.unregister()
