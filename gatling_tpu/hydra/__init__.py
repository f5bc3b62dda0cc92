"""Render-delegate layer (the hdGatling analog).

No pxr/Hydra runtime exists in TPU environments, so this package provides
the same architecture as the reference's Hydra plugin
(reference: src/hdGatling/*) as a host-embeddable API: a renderer-plugin
registry, a render delegate exposing setting descriptors and supported prim
types, a render pass that maps AOV bindings and drives gi.render with
convergence tracking, and render buffers. The standalone CLI builds on it
exactly like the reference CLI builds on Hydra (src/gatling/main.cpp:94).
"""

from gatling_tpu.hydra.delegate import (  # noqa: F401
    HdRenderBuffer,
    HdRenderDelegate,
    HdRenderPass,
    HdRendererPlugin,
    get_renderer_plugin,
)
