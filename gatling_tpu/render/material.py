"""Material front end: shader networks -> BSDF parameter table.

The mc-layer analog (reference: src/mc/impl/Frontend.cpp, Backend.cpp,
MtlxMdlCodeGen.cpp): instead of compiling each material network through the
MDL SDK into per-material GLSL hit shaders, networks are lowered into rows of
a packed parameter table consumed by the uber-BSDF in render/bsdf.py. The
SBT hit-group index of the reference (Gi.cpp:1195 hitGroupIndex=matIdx*2)
becomes the row index; per-material traits (emissive / cutout / thin-walled,
reference: mc/Material.h:28-45) are extracted at lowering time.

Supported source networks: UsdPreviewSurface (incl. UsdUVTexture /
UsdPrimvarReader inputs), MaterialX standard_surface / open_pbr_surface /
gltf_pbr subsets mapped onto the same parameter set.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from gatling_tpu.render.bsdf import BsdfParams
from gatling_tpu.scene.stage import MaterialDesc, ShaderNode
from gatling_tpu.utils.log import get_logger


class MaterialTable(NamedTuple):
    """Packed per-material parameter rows, [M, ...] device arrays."""

    base_color: jnp.ndarray  # [M,3]
    metallic: jnp.ndarray  # [M]
    roughness: jnp.ndarray  # [M]
    ior: jnp.ndarray  # [M]
    opacity: jnp.ndarray  # [M]
    opacity_threshold: jnp.ndarray  # [M]
    emissive: jnp.ndarray  # [M,3]
    use_specular_workflow: jnp.ndarray  # [M]
    specular_color: jnp.ndarray  # [M,3]
    transmission: jnp.ndarray  # [M]
    thin_walled: jnp.ndarray  # [M] int32 0/1
    # texture slot per parameter, -1 = constant (wired by render/texture.py)
    base_color_tex: jnp.ndarray  # [M] i32
    emissive_tex: jnp.ndarray  # [M] i32
    metallic_tex: jnp.ndarray  # [M] i32
    roughness_tex: jnp.ndarray  # [M] i32
    opacity_tex: jnp.ndarray  # [M] i32
    normal_tex: jnp.ndarray  # [M] i32

    @property
    def count(self) -> int:
        return self.base_color.shape[0]


@dataclasses.dataclass
class MaterialTraits:
    """Host-side material traits (reference: mc/Material.h McMaterial)."""

    is_emissive: bool = False
    has_cutout: bool = False
    is_thin_walled: bool = False


@dataclasses.dataclass
class LoweredMaterial:
    """One lowered material: constant params + texture references."""

    params: dict
    traits: MaterialTraits
    textures: dict[str, tuple[str, bool]]  # param -> (file path, is_srgb)


_DEFAULTS = {
    "base_color": (0.18, 0.18, 0.18),
    "metallic": 0.0,
    "roughness": 0.5,
    "ior": 1.5,
    "opacity": 1.0,
    "opacity_threshold": 0.0,
    "emissive": (0.0, 0.0, 0.0),
    "use_specular_workflow": 0.0,
    "specular_color": (0.0, 0.0, 0.0),
    "transmission": 0.0,
    "thin_walled": 0,
}


def _vec3(v) -> tuple[float, float, float]:
    if isinstance(v, (int, float)):
        return (float(v),) * 3
    v = tuple(float(x) for x in v)
    return v[:3] if len(v) >= 3 else (v + (0.0,) * 3)[:3]


def _resolve_input(desc: MaterialDesc, node: ShaderNode, name: str, default):
    """Follow a shader input: constant, or a connected texture/primvar node.

    Returns (value, texture_path_or_None, is_srgb_hint).
    """
    if name in node.input_connections:
        target_path, out_name = node.input_connections[name]
        target = desc.nodes.get(target_path)
        if target is None:
            return default, None, False
        sid = target.shader_id
        if sid == "UsdUVTexture":
            tex_file = target.inputs.get("file")
            fallback = target.inputs.get("fallback", default)
            cs = str(target.inputs.get("sourceColorSpace", "auto"))
            is_srgb = cs in ("sRGB", "auto")
            if out_name in ("r", "g", "b", "a"):
                # single-channel read of a texture
                return fallback, (str(tex_file), is_srgb, out_name) if tex_file else None, is_srgb
            return fallback, (str(tex_file), is_srgb, "rgb") if tex_file else None, is_srgb
        if sid.startswith("UsdPrimvarReader"):
            return target.inputs.get("fallback", default), None, False
        get_logger().debug("unhandled input node %s for %s", sid, name)
        return default, None, False
    if name in node.inputs:
        return node.inputs[name], None, False
    return default, None, False


def lower_material(desc: MaterialDesc | None) -> LoweredMaterial:
    """Lower one material network to uber-BSDF parameters."""
    params = dict(_DEFAULTS)
    textures: dict[str, tuple[str, bool]] = {}
    traits = MaterialTraits()

    node = None
    if desc is not None and desc.surface_node is not None:
        node = desc.nodes.get(desc.surface_node)

    if node is None:
        return LoweredMaterial(params=params, traits=traits, textures=textures)

    def grab(input_name: str, param: str, conv=float, default=None):
        d = _DEFAULTS[param] if default is None else default
        val, tex, _srgb = _resolve_input(desc, node, input_name, d)
        params[param] = conv(val) if val is not None else d
        if tex is not None:
            textures[param] = (tex[0], tex[1])

    sid = node.shader_id
    if sid == "UsdPreviewSurface":
        grab("diffuseColor", "base_color", _vec3)
        grab("metallic", "metallic")
        grab("roughness", "roughness")
        grab("ior", "ior")
        grab("opacity", "opacity")
        grab("opacityThreshold", "opacity_threshold")
        grab("emissiveColor", "emissive", _vec3)
        grab("useSpecularWorkflow", "use_specular_workflow")
        grab("specularColor", "specular_color", _vec3)
    elif sid in ("ND_standard_surface_surfaceshader", "standard_surface"):
        grab("base_color", "base_color", _vec3)
        grab("metalness", "metallic")
        grab("specular_roughness", "roughness")
        grab("specular_IOR", "ior")
        grab("transmission", "transmission")
        grab("opacity", "opacity", lambda v: float(np.mean(_vec3(v))))
        val, tex, _ = _resolve_input(desc, node, "emission_color", (1.0, 1.0, 1.0))
        emission_scale, _, _ = _resolve_input(desc, node, "emission", 0.0)
        params["emissive"] = tuple(float(emission_scale) * c for c in _vec3(val))
        params["thin_walled"] = int(bool(node.inputs.get("thin_walled", False)))
    elif sid in ("ND_open_pbr_surface_surfaceshader", "open_pbr_surface"):
        grab("base_color", "base_color", _vec3)
        grab("base_metalness", "metallic")
        grab("specular_roughness", "roughness")
        grab("specular_ior", "ior")
        grab("transmission_weight", "transmission")
        grab("geometry_opacity", "opacity")
        val, _, _ = _resolve_input(desc, node, "emission_color", (1.0, 1.0, 1.0))
        lum, _, _ = _resolve_input(desc, node, "emission_luminance", 0.0)
        params["emissive"] = tuple(float(lum) * c for c in _vec3(val))
        params["thin_walled"] = int(bool(node.inputs.get("geometry_thin_walled", False)))
    elif sid in ("ND_gltf_pbr_surfaceshader", "gltf_pbr"):
        grab("base_color", "base_color", _vec3)
        grab("metallic", "metallic")
        grab("roughness", "roughness")
        grab("transmission", "transmission")
        grab("alpha", "opacity")
        grab("emissive", "emissive", _vec3)
        if str(node.inputs.get("alpha_mode", "")).upper() == "MASK":
            params["opacity_threshold"] = float(node.inputs.get("alpha_cutoff", 0.5))
    else:
        get_logger().warning("unknown surface shader id %r; using defaults", sid)

    traits.is_emissive = any(c > 0.0 for c in params["emissive"]) or "emissive" in textures
    traits.has_cutout = (
        params["opacity_threshold"] > 0.0
        or params["opacity"] < 1.0
        or "opacity" in textures
    )
    traits.is_thin_walled = bool(params["thin_walled"])
    return LoweredMaterial(params=params, traits=traits, textures=textures)


def build_material_table(
    lowered: list[LoweredMaterial],
    texture_slots: dict[int, dict[str, int]] | None = None,
) -> MaterialTable:
    """Pack lowered materials into device arrays. texture_slots maps
    material row -> {param: texture slot} (from render/texture.py)."""
    if not lowered:
        lowered = [lower_material(None)]
    texture_slots = texture_slots or {}

    def col(name, width=None, dtype=np.float32):
        if width:
            return jnp.asarray(np.array([_vec3(m.params[name]) for m in lowered], dtype))
        return jnp.asarray(np.array([m.params[name] for m in lowered], dtype))

    def tex_col(param):
        return jnp.asarray(np.array(
            [texture_slots.get(i, {}).get(param, -1) for i in range(len(lowered))], np.int32))

    return MaterialTable(
        base_color=col("base_color", 3),
        metallic=col("metallic"),
        roughness=col("roughness"),
        ior=col("ior"),
        opacity=col("opacity"),
        opacity_threshold=col("opacity_threshold"),
        emissive=col("emissive", 3),
        use_specular_workflow=col("use_specular_workflow"),
        specular_color=col("specular_color", 3),
        transmission=col("transmission"),
        thin_walled=col("thin_walled", dtype=np.int32),
        base_color_tex=tex_col("base_color"),
        emissive_tex=tex_col("emissive"),
        metallic_tex=tex_col("metallic"),
        roughness_tex=tex_col("roughness"),
        opacity_tex=tex_col("opacity"),
        normal_tex=tex_col("normal"),
    )


def gather_params(table: MaterialTable, material_ids: jnp.ndarray) -> BsdfParams:
    """Gather per-ray BSDF parameters from the table (texture lookups are
    applied on top by the integrator when slots are >= 0)."""
    g = lambda arr: arr[material_ids]  # noqa: E731
    return BsdfParams(
        base_color=g(table.base_color),
        metallic=g(table.metallic),
        roughness=g(table.roughness),
        ior=g(table.ior),
        opacity=g(table.opacity),
        emissive=g(table.emissive),
        use_specular_workflow=g(table.use_specular_workflow),
        specular_color=g(table.specular_color),
        transmission=g(table.transmission),
        thin_walled=g(table.thin_walled) > 0,
    )
