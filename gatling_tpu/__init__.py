"""gatling_tpu — a TPU-native USD path tracer.

A ground-up reimplementation of the capabilities of pablode/gatling (a Vulkan
hardware-ray-traced Hydra render delegate) as a TPU-first wavefront path
tracer built on JAX/XLA/Pallas:

* the Vulkan RT pipeline (reference: src/cgpu, src/gi/shaders) is replaced by
  batched JAX/Pallas trace + shade kernels over flat struct-of-array scene
  buffers,
* MDL->GLSL material codegen (reference: src/mc) is replaced by JAX-traceable
  BSDF evaluators behind the same distilled 11-function interface,
* the `gi` scene/render API surface (reference: src/gi/gtl/gi/Gi.h:199-261)
  is preserved in Pythonic form in :mod:`gatling_tpu.gi`,
* scaling across chips uses `jax.sharding` meshes (framebuffer-tile and spp
  sharding) instead of anything in the reference (which is single-GPU).
"""

__version__ = "0.1.0"

from gatling_tpu.interface import AovId  # noqa: F401
