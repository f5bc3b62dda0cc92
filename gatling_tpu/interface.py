"""Shared host/kernel interface constants.

This module plays the role of the reference's single-source-of-truth shader
interface header (reference: src/gi/shaders/interface/rp_main.h and
src/gi/shaders/aovs.glsl): AOV identifiers and bit masks, light-array
layouts, and packed-field conventions are defined once here and used by both
the host-side scene code and the JAX/Pallas kernels.
"""

from __future__ import annotations

import enum
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class AovId(enum.IntEnum):
    """AOV identifiers (reference: src/gi/gtl/gi/Gi.h GiAovId and aovs.glsl:5-23)."""

    COLOR = 0
    NORMAL = 1
    NEE = 2
    BARYCENTRICS = 3
    TEXCOORDS = 4
    BOUNCES = 5
    CLOCK_CYCLES = 6
    OPACITY = 7
    TANGENTS = 8
    BITANGENTS = 9
    THIN_WALLED = 10
    OBJECT_ID = 11
    DEPTH = 12
    FACE_ID = 13
    INSTANCE_ID = 14
    DOUBLE_SIDED = 15
    ALBEDO = 16


AOV_COUNT = 17


def aov_bit(aov: AovId) -> int:
    """Mask bit for an AOV (reference: aovs.glsl:25-41)."""
    return 1 << int(aov)


# Per-AOV channel count and dtype of the framebuffer storage.
# Mirrors the render-buffer formats accepted by the reference
# (renderBuffer.cpp:30-35: Int32 / Float32 / Float32Vec4) and the SSBO
# declarations in rp_main_descriptors.glsl.
AOV_CHANNELS: dict[AovId, int] = {
    AovId.COLOR: 4,
    AovId.NORMAL: 3,
    AovId.NEE: 3,
    AovId.BARYCENTRICS: 3,
    AovId.TEXCOORDS: 3,
    AovId.BOUNCES: 3,
    AovId.CLOCK_CYCLES: 1,
    AovId.OPACITY: 3,
    AovId.TANGENTS: 3,
    AovId.BITANGENTS: 3,
    AovId.THIN_WALLED: 3,
    AovId.OBJECT_ID: 1,
    AovId.DEPTH: 1,
    AovId.FACE_ID: 1,
    AovId.INSTANCE_ID: 1,
    AovId.DOUBLE_SIDED: 3,
    AovId.ALBEDO: 3,
}

AOV_IS_INT: dict[AovId, bool] = {a: a in (AovId.OBJECT_ID, AovId.FACE_ID, AovId.INSTANCE_ID) for a in AovId}


# BSDF event types, mirroring the MDL df interface used by generated code
# (reference: src/gi/shaders/mdl_types.glsl BSDF_EVENT_*).
BSDF_EVENT_ABSORB = 0
BSDF_EVENT_DIFFUSE = 1
BSDF_EVENT_GLOSSY = 1 << 1
BSDF_EVENT_SPECULAR = 1 << 2
BSDF_EVENT_REFLECTION = 1 << 3
BSDF_EVENT_TRANSMISSION = 1 << 4
BSDF_EVENT_DIFFUSE_REFLECTION = BSDF_EVENT_DIFFUSE | BSDF_EVENT_REFLECTION
BSDF_EVENT_DIFFUSE_TRANSMISSION = BSDF_EVENT_DIFFUSE | BSDF_EVENT_TRANSMISSION
BSDF_EVENT_GLOSSY_REFLECTION = BSDF_EVENT_GLOSSY | BSDF_EVENT_REFLECTION
BSDF_EVENT_GLOSSY_TRANSMISSION = BSDF_EVENT_GLOSSY | BSDF_EVENT_TRANSMISSION
BSDF_EVENT_SPECULAR_REFLECTION = BSDF_EVENT_SPECULAR | BSDF_EVENT_REFLECTION
BSDF_EVENT_SPECULAR_TRANSMISSION = BSDF_EVENT_SPECULAR | BSDF_EVENT_TRANSMISSION

# Sentinel ior value meaning "use the material's own ior"
# (reference: mdl_types.glsl BSDF_USE_MATERIAL_IOR).
BSDF_USE_MATERIAL_IOR = -1.0

# Mesh flags (reference: rp_main.h BLAS_PAYLOAD_BITFLAG_*).
MESH_FLAG_FLIP_FACING = 1 << 0
MESH_FLAG_DOUBLE_SIDED = 1 << 1

FLOAT_MAX = np.float32(3.402823466e38)

# barycentric edge slack: rays through a shared triangle edge must hit at
# least one of the adjacent triangles (the Vulkan RT hardware traversal the
# reference dispatches is watertight by spec; exact u+v == 1 pixel-center
# alignments otherwise fall through the crack). Dimensionless, applied as
# u >= -eps, v >= -eps, u + v <= 1 + eps in every intersector.
BARY_EPS = np.float32(1e-6)
FLOAT_MIN = np.float32(1.175494351e-38)

# Maximum number of per-mesh primvar streams exposed to materials
# (reference: rp_main.h MAX_SCENE_DATA_COUNT).
MAX_SCENE_DATA_COUNT = 6

# Maximum number of texture slots (reference: rp_main.h MAX_TEXTURE_COUNT).
MAX_TEXTURE_COUNT = 65535


class LightArrays(NamedTuple):
    """Packed analytic light arrays, struct-of-arrays.

    One fixed-capacity dense array per light type, matching the four
    GgpuDenseDataStore light tables of the reference (Gi.cpp:211-232) and the
    Sphere/Distant/Rect/DiskLight structs of rp_main.h. Elements
    [0, count) are valid; remaining slots are zero.
    """

    # Sphere lights (rp_main.h struct SphereLight)
    sphere_pos: jnp.ndarray  # [S,3] f32
    sphere_radius: jnp.ndarray  # [S,3] f32 (ellipsoid radii xyz)
    sphere_emission: jnp.ndarray  # [S,3] f32 base emission
    sphere_area: jnp.ndarray  # [S] f32 surface area (0 => point light)
    sphere_diff_spec: jnp.ndarray  # [S,2] f32 diffuse/specular multipliers
    sphere_count: jnp.ndarray  # [] i32

    # Distant lights (rp_main.h struct DistantLight)
    distant_dir: jnp.ndarray  # [D,3] f32 (direction light travels)
    distant_angle: jnp.ndarray  # [D] f32 half-cone angle in radians
    distant_emission: jnp.ndarray  # [D,3] f32
    distant_inv_pdf: jnp.ndarray  # [D] f32
    distant_diff_spec: jnp.ndarray  # [D,2] f32
    distant_count: jnp.ndarray  # [] i32

    # Rect lights (rp_main.h struct RectLight)
    rect_origin: jnp.ndarray  # [R,3] f32
    rect_t0: jnp.ndarray  # [R,3] f32 tangent frame
    rect_t1: jnp.ndarray  # [R,3] f32
    rect_size: jnp.ndarray  # [R,2] f32 width/height
    rect_emission: jnp.ndarray  # [R,3] f32
    rect_diff_spec: jnp.ndarray  # [R,2] f32
    rect_count: jnp.ndarray  # [] i32

    # Disk lights (rp_main.h struct DiskLight)
    disk_origin: jnp.ndarray  # [K,3] f32
    disk_t0: jnp.ndarray  # [K,3] f32
    disk_t1: jnp.ndarray  # [K,3] f32
    disk_radius: jnp.ndarray  # [K,2] f32 radiusX/radiusY
    disk_emission: jnp.ndarray  # [K,3] f32
    disk_diff_spec: jnp.ndarray  # [K,2] f32
    disk_count: jnp.ndarray  # [] i32


def empty_light_arrays(capacity: int = 8) -> LightArrays:
    """All-empty light tables with the given per-type slot capacity."""
    c = capacity
    f3 = jnp.zeros((c, 3), jnp.float32)
    f2 = jnp.zeros((c, 2), jnp.float32)
    f1 = jnp.zeros((c,), jnp.float32)
    zero = jnp.zeros((), jnp.int32)
    return LightArrays(
        sphere_pos=f3, sphere_radius=f3, sphere_emission=f3, sphere_area=f1,
        sphere_diff_spec=f2, sphere_count=zero,
        distant_dir=f3, distant_angle=f1, distant_emission=f3,
        distant_inv_pdf=f1, distant_diff_spec=f2, distant_count=zero,
        rect_origin=f3, rect_t0=f3, rect_t1=f3, rect_size=f2,
        rect_emission=f3, rect_diff_spec=f2, rect_count=zero,
        disk_origin=f3, disk_t0=f3, disk_t1=f3, disk_radius=f2,
        disk_emission=f3, disk_diff_spec=f2, disk_count=zero,
    )
