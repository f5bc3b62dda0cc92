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
import os
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from gatling_tpu.render.bsdf import BsdfParams
from gatling_tpu.render.texture import TextureRef
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
    volume_absorption: jnp.ndarray  # [M,3]
    volume_scattering: jnp.ndarray  # [M,3]
    volume_bias: jnp.ndarray  # [M]
    backface_edf: jnp.ndarray  # [M] f32 0/1 (traits.has_backface_edf)
    vcolor_mul: jnp.ndarray  # [M] f32 0/1: multiply interpolated vcolor rows
    clearcoat: jnp.ndarray  # [M] coat weight (OpenPBR coat_weight)
    clearcoat_roughness: jnp.ndarray  # [M]
    anisotropy: jnp.ndarray  # [M]
    anisotropy_rotation: jnp.ndarray  # [M] turns
    # texture slot per parameter, -1 = constant (wired by render/texture.py)
    base_color_tex: jnp.ndarray  # [M] i32
    emissive_tex: jnp.ndarray  # [M] i32
    metallic_tex: jnp.ndarray  # [M] i32
    roughness_tex: jnp.ndarray  # [M] i32
    opacity_tex: jnp.ndarray  # [M] i32
    normal_tex: jnp.ndarray  # [M] i32
    # channel index (0..3) for single-channel texture reads (UsdUVTexture
    # outputs:r/g/b/a), e.g. ORM-packed metallic/roughness maps
    metallic_tex_ch: jnp.ndarray  # [M] i32
    roughness_tex_ch: jnp.ndarray  # [M] i32
    opacity_tex_ch: jnp.ndarray  # [M] i32
    # row the integrator shades back-facing hits with (== own index unless
    # the material has a distinct MDL backface surface; see
    # build_material_table)
    backface_id: jnp.ndarray  # [M] i32
    # packed row-gather mirrors (one gather per hit instead of ~14;
    # see ops/geometry.py packed_f rationale)
    packed_f: jnp.ndarray  # [M, 30] f32
    packed_i: jnp.ndarray  # [M, 10] i32

    @property
    def count(self) -> int:
        return self.base_color.shape[0]


# packed_f column offsets
MF_BASE, MF_METAL, MF_ROUGH, MF_IOR, MF_OPACITY = 0, 3, 4, 5, 6
MF_EMISSIVE, MF_USW, MF_SPEC, MF_TRANS, MF_THIN = 7, 10, 11, 14, 15
MF_VOL_A, MF_VOL_S, MF_VOL_BIAS, MF_OPACITY_THRESH = 16, 19, 22, 23
MF_BACKFACE_EDF = 24
MF_VCOLOR_MUL = 25
MF_COAT, MF_COAT_ROUGH, MF_ANISO, MF_ANISO_ROT = 26, 27, 28, 29
PF_COLS = 30
# packed_i column of the backface-row index (build_material_table)
MI_BACKFACE_ID = 9


def _pack_material_table(t: MaterialTable) -> MaterialTable:
    packed_f = jnp.concatenate([
        t.base_color, t.metallic[:, None], t.roughness[:, None],
        t.ior[:, None], t.opacity[:, None], t.emissive,
        t.use_specular_workflow[:, None], t.specular_color,
        t.transmission[:, None], t.thin_walled[:, None].astype(jnp.float32),
        t.volume_absorption, t.volume_scattering, t.volume_bias[:, None],
        t.opacity_threshold[:, None], t.backface_edf[:, None],
        t.vcolor_mul[:, None], t.clearcoat[:, None],
        t.clearcoat_roughness[:, None], t.anisotropy[:, None],
        t.anisotropy_rotation[:, None],
    ], axis=1)
    packed_i = jnp.stack([
        t.base_color_tex, t.emissive_tex, t.metallic_tex, t.roughness_tex,
        t.opacity_tex, t.normal_tex, t.metallic_tex_ch, t.roughness_tex_ch,
        t.opacity_tex_ch, t.backface_id,
    ], axis=1)
    return t._replace(packed_f=packed_f, packed_i=packed_i)


@dataclasses.dataclass
class MaterialTraits:
    """Host-side material traits (reference: mc/Material.h McMaterial,
    extracted per Frontend.cpp:75-181)."""

    is_emissive: bool = False
    has_cutout: bool = False
    is_thin_walled: bool = False
    # distinct backface expressions exist (MDL `backface:` field); their
    # lowered params ride LoweredMaterial.backface and become an appended
    # material row (build_material_table)
    has_backface_bsdf: bool = False
    has_backface_edf: bool = False
    # the network contains frame/time nodes (MtlxMdlCodeGen.cpp:116-144
    # time-node detection): re-lower when the frame setting changes
    is_animated: bool = False


@dataclasses.dataclass
class LoweredMaterial:
    """One lowered material: constant params + texture references."""

    params: dict
    traits: MaterialTraits
    textures: dict[str, TextureRef]  # param -> texture request
    # param -> dynamic expr (viewdirection/normal chains) evaluated per hit
    # by the wavefront integrator (shadergraph.eval_dynamic_expr)
    dynamic: dict = dataclasses.field(default_factory=dict)
    # distinct backface surface params (MDL `backface:` field, lowered by
    # render/mdl.py): build_material_table appends a second row with these
    # overriding the front params; the wavefront integrator selects it on
    # back-facing hits (reference: Backend.cpp DF_NAMES backface
    # scattering/emission/intensity)
    backface: dict = dataclasses.field(default_factory=dict)


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
    "volume_absorption": (0.0, 0.0, 0.0),
    "volume_scattering": (0.0, 0.0, 0.0),
    "volume_bias": 0.0,
    # 1.0 only on the displayColor fallback material: multiplies the
    # interpolated per-corner vcolor rows into base_color (bound materials
    # read primvars explicitly via geompropvalue instead)
    "vcolor_mul": 0.0,
    "clearcoat": 0.0,
    "clearcoat_roughness": 0.1,
    "anisotropy": 0.0,
    "anisotropy_rotation": 0.0,
}


def _vec3(v) -> tuple[float, float, float]:
    if isinstance(v, (int, float)):
        return (float(v),) * 3
    v = tuple(float(x) for x in v)
    return v[:3] if len(v) >= 3 else (v + (0.0,) * 3)[:3]


def _resolve_input(desc: MaterialDesc, node: ShaderNode, name: str, default,
                   color_hint: bool = False, frame: float = 0.0):
    """Follow a shader input through the node graph (render/shadergraph.py):
    constants and texture-affine chains (multiply/mix/add/... over one
    image) fold exactly into (value, TextureRef) — the graph-compiler
    analog of MtlxMdlCodeGen.cpp:217-287.

    Returns (value, TextureRef_or_None, is_srgb_hint, dynamic_expr_or_None).
    Texture file paths are resolved relative to the material's layer
    directory. The returned value has the shape of `default` (scalar stays
    scalar). A dynamic expr (viewdirection/normal leaves) is returned for
    per-hit evaluation by the integrator; dynamic subtrees that ALSO read
    textures fall back to the affine approximation (logged).
    """
    from gatling_tpu.render.shadergraph import (
        GraphLowering, expr_has_texture, expr_is_dynamic)
    from gatling_tpu.render.texture import baked_ref

    gv = GraphLowering(desc, frame=frame).eval_input(node, name, default, color_hint)
    if isinstance(default, (int, float, bool)) or default is None:
        value = float(gv.constant[0])
    else:
        value = gv.constant[: max(len(tuple(default)), 3)]
    tex = gv.texture
    dyn = None
    if gv.expr is not None:
        if expr_is_dynamic(gv.expr):
            if expr_has_texture(gv.expr):
                get_logger().warning(
                    "shader graph: %s.%s mixes textures with view/normal-"
                    "dependent nodes; using the affine approximation",
                    node.path, name)
            else:
                dyn = gv.expr
        else:
            # non-affine static subtree: bake the composite into one slot
            tex = baked_ref(gv.expr)
    is_srgb = tex.is_srgb if tex is not None else False
    return value, tex, is_srgb, dyn


def lower_material(desc: MaterialDesc | None, frame: float = 0.0) -> LoweredMaterial:
    """Lower one material network to uber-BSDF parameters. `frame` feeds
    frame/time nodes; materials containing them get traits.is_animated and
    are re-lowered by gi.render when the frame setting changes."""
    params = dict(_DEFAULTS)
    textures: dict[str, TextureRef] = {}
    dynamic: dict = {}
    traits = MaterialTraits()

    node = None
    if desc is not None and desc.surface_node is not None:
        node = desc.nodes.get(desc.surface_node)

    if node is None:
        return LoweredMaterial(params=params, traits=traits, textures=textures)

    from gatling_tpu.render.shadergraph import normalize_shader_id

    traits.is_animated = any(
        normalize_shader_id(n.shader_id) in ("frame", "time")
        for n in desc.nodes.values())

    def grab(input_name: str, param: str, conv=float, default=None, color=False):
        d = _DEFAULTS[param] if default is None else default
        val, tex, _srgb, dyn = _resolve_input(desc, node, input_name, d,
                                              color_hint=color, frame=frame)
        params[param] = conv(val) if val is not None else d
        if tex is not None:
            textures[param] = tex
        if dyn is not None:
            dynamic[param] = dyn

    sid = node.shader_id
    if sid == "gatling_uber":
        # pre-mapped parameter set (MDL front end, render/mdl.py)
        for k, v in node.inputs.items():
            if k.endswith("_texture"):
                param = k[: -len("_texture")]
                is_color = param in ("base_color", "emissive")
                ref = TextureRef(file_path=str(v), is_srgb=is_color)
                if param == "normal":
                    ref = dataclasses.replace(
                        ref, scale=(2.0, 2.0, 2.0, 1.0), bias=(-1.0, -1.0, -1.0, 0.0))
                textures[param] = ref
            elif k in _DEFAULTS:
                d = _DEFAULTS[k]
                params[k] = _vec3(v) if isinstance(d, tuple) else type(d)(v) if not isinstance(v, tuple) else float(v[0])
    elif sid == "UsdPreviewSurface":
        grab("diffuseColor", "base_color", _vec3, color=True)
        grab("normal", "normal", _vec3, default=(0.0, 0.0, 1.0))
        grab("metallic", "metallic")
        grab("roughness", "roughness")
        grab("ior", "ior")
        grab("opacity", "opacity")
        grab("opacityThreshold", "opacity_threshold")
        grab("emissiveColor", "emissive", _vec3, color=True)
        grab("useSpecularWorkflow", "use_specular_workflow")
        grab("specularColor", "specular_color", _vec3)
        grab("clearcoat", "clearcoat")
        grab("clearcoatRoughness", "clearcoat_roughness")
    elif sid in ("ND_standard_surface_surfaceshader", "standard_surface"):
        grab("base_color", "base_color", _vec3, color=True)
        grab("metalness", "metallic")
        grab("specular_roughness", "roughness")
        grab("coat", "clearcoat")
        grab("coat_roughness", "clearcoat_roughness")
        grab("specular_anisotropy", "anisotropy")
        grab("specular_rotation", "anisotropy_rotation")
        grab("specular_IOR", "ior")
        grab("transmission", "transmission")
        grab("opacity", "opacity", lambda v: float(np.mean(_vec3(v))))
        val, tex, _, _dyn = _resolve_input(desc, node, "emission_color", (1.0, 1.0, 1.0), frame=frame)
        emission_scale, _, _, _ = _resolve_input(desc, node, "emission", 0.0, frame=frame)
        params["emissive"] = tuple(float(emission_scale) * c for c in _vec3(val))
        params["thin_walled"] = int(bool(node.inputs.get("thin_walled", False)))
    elif sid in ("ND_open_pbr_surface_surfaceshader", "open_pbr_surface"):
        grab("base_color", "base_color", _vec3, color=True)
        grab("base_metalness", "metallic")
        grab("specular_roughness", "roughness")
        grab("specular_ior", "ior")
        grab("transmission_weight", "transmission")
        grab("coat_weight", "clearcoat")
        grab("coat_roughness", "clearcoat_roughness")
        grab("specular_roughness_anisotropy", "anisotropy")
        grab("geometry_opacity", "opacity")
        val, _, _, _ = _resolve_input(desc, node, "emission_color", (1.0, 1.0, 1.0), frame=frame)
        lum, _, _, _ = _resolve_input(desc, node, "emission_luminance", 0.0, frame=frame)
        params["emissive"] = tuple(float(lum) * c for c in _vec3(val))
        params["thin_walled"] = int(bool(node.inputs.get("geometry_thin_walled", False)))
    elif sid in ("ND_gltf_pbr_surfaceshader", "gltf_pbr"):
        grab("base_color", "base_color", _vec3, color=True)
        grab("metallic", "metallic")
        grab("roughness", "roughness")
        grab("transmission", "transmission")
        grab("alpha", "opacity")
        grab("emissive", "emissive", _vec3)
        if str(node.inputs.get("alpha_mode", "")).upper() == "MASK":
            params["opacity_threshold"] = float(node.inputs.get("alpha_cutoff", 0.5))
    else:
        get_logger().warning("unknown surface shader id %r; using defaults", sid)

    # normal-map scale/bias defaults: authors often omit the required
    # scale=2 bias=-1 mapping (reference: previewSurfaceNetworkPatcher.cpp)
    nref = textures.get("normal")
    if nref is not None and nref.scale == (1.0, 1.0, 1.0, 1.0) and nref.bias == (0.0, 0.0, 0.0, 0.0):
        textures["normal"] = dataclasses.replace(
            nref, scale=(2.0, 2.0, 2.0, 1.0), bias=(-1.0, -1.0, -1.0, 0.0), is_srgb=False)

    params["vcolor_mul"] = float(bool(node.inputs.get("_vcolor_multiply", False)))
    # MDL backface traits forwarded by the front end (render/mdl.py)
    traits.has_backface_bsdf = bool(node.inputs.get("has_backface_bsdf", False))
    traits.has_backface_edf = bool(node.inputs.get("has_backface_edf", False))
    backface = dict(node.inputs.get("backface_params") or {})
    traits.is_emissive = any(c > 0.0 for c in params["emissive"]) or "emissive" in textures
    traits.has_cutout = (
        params["opacity_threshold"] > 0.0
        or params["opacity"] < 1.0
        or "opacity" in textures
    )
    traits.is_thin_walled = bool(params["thin_walled"])
    out = LoweredMaterial(params=params, traits=traits, textures=textures,
                          dynamic=dynamic, backface=backface)
    _maybe_dump_material(desc, out)
    return out


def _maybe_dump_material(desc, low: "LoweredMaterial") -> None:
    """GATLING_DUMP_MATERIALS=<dir>: write each lowered material's
    parameter set / textures / dynamic exprs / traits as JSON — the
    observability analog of the reference's GTL_DUMP_MTLX / GTL_DUMP_MDL
    generated-source dumps (MtlxMdlCodeGen.cpp:249,280)."""
    out_dir = os.environ.get("GATLING_DUMP_MATERIALS")
    if not out_dir or desc is None:
        return
    import json

    os.makedirs(out_dir, exist_ok=True)
    name = (desc.path or "anon").strip("/").replace("/", "_") or "anon"
    doc = {
        "path": desc.path,
        "surface_node": desc.surface_node,
        "params": {k: (list(v) if isinstance(v, (tuple, list)) else v)
                   for k, v in low.params.items()},
        "textures": {k: dataclasses.asdict(t) if dataclasses.is_dataclass(t)
                     else str(t) for k, t in (low.textures or {}).items()},
        "dynamic": {k: repr(e) for k, e in (low.dynamic or {}).items()},
        "traits": dataclasses.asdict(low.traits),
        "backface": bool(low.backface),
    }
    with open(os.path.join(out_dir, name + ".json"), "w") as f:
        json.dump(doc, f, indent=2, default=str)


_CH_INDEX = {"r": 0, "g": 1, "b": 2, "a": 3, "rgb": 0}


def build_materials(lowered: list[LoweredMaterial], texture_manager=None):
    """Pack lowered materials into (MaterialTable, TexturePool): dedup the
    texture requests, load them through the TextureManager, and record the
    allocated slot per material parameter (the OffsetAllocator-slot analog,
    Gi.cpp:1446-1490)."""
    from gatling_tpu.render.texture import TextureManager, empty_pool

    if not lowered:
        lowered = [lower_material(None)]
    refs: list[TextureRef] = []
    ref_slot: dict[TextureRef, int] = {}
    texture_slots: dict[int, dict[str, int]] = {}
    for i, m in enumerate(lowered):
        for param, ref in m.textures.items():
            if ref not in ref_slot:
                ref_slot[ref] = len(refs)
                refs.append(ref)
            texture_slots.setdefault(i, {})[param] = ref_slot[ref]
    if refs:
        tm = texture_manager or TextureManager()
        pool = tm.build_pool(refs)
    else:
        pool = empty_pool()
    table = build_material_table(lowered, texture_slots)
    return table, pool


def build_material_table(
    lowered: list[LoweredMaterial],
    texture_slots: dict[int, dict[str, int]] | None = None,
) -> MaterialTable:
    """Pack lowered materials into device arrays. texture_slots maps
    material row -> {param: texture slot} (from render/texture.py).

    Materials with a distinct MDL backface surface get a SECOND row
    appended (front params overridden by the backface dict; emission is
    exactly the backface's own — material_surface() defaults to none);
    packed_i column MI_BACKFACE_ID records the row the integrator selects
    on back-facing hits. Backface rows are constants-only (no textures)."""
    if not lowered:
        lowered = [lower_material(None)]
    texture_slots = texture_slots or {}

    n_front = len(lowered)
    backface_ids = list(range(n_front))
    expanded = list(lowered)
    for i, m in enumerate(lowered):
        if not m.backface:
            continue
        bf_params = dict(m.params)
        bf_params["emissive"] = (0.0, 0.0, 0.0)
        bf_params.update({k: v for k, v in m.backface.items()
                          if k in _DEFAULTS})
        expanded.append(LoweredMaterial(
            params=bf_params, traits=m.traits, textures={}))
        backface_ids[i] = len(expanded) - 1
    backface_ids += list(range(n_front, len(expanded)))
    lowered = expanded

    def col(name, width=None, dtype=np.float32):
        if width:
            return jnp.asarray(np.array([_vec3(m.params[name]) for m in lowered], dtype))
        return jnp.asarray(np.array([m.params[name] for m in lowered], dtype))

    def tex_col(param):
        return jnp.asarray(np.array(
            [texture_slots.get(i, {}).get(param, -1) for i in range(len(lowered))], np.int32))

    def ch_col(param):
        out = []
        for m in lowered:
            ref = m.textures.get(param)
            out.append(_CH_INDEX.get(ref.channel, 0) if ref else 0)
        return jnp.asarray(np.array(out, np.int32))

    table = MaterialTable(
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
        volume_absorption=col("volume_absorption", 3),
        volume_scattering=col("volume_scattering", 3),
        volume_bias=col("volume_bias"),
        backface_edf=jnp.asarray(np.array(
            [float(m.traits.has_backface_edf) for m in lowered], np.float32)),
        vcolor_mul=jnp.asarray(np.array(
            [float(m.params.get("vcolor_mul", 0.0)) for m in lowered],
            np.float32)),
        base_color_tex=tex_col("base_color"),
        emissive_tex=tex_col("emissive"),
        metallic_tex=tex_col("metallic"),
        roughness_tex=tex_col("roughness"),
        opacity_tex=tex_col("opacity"),
        normal_tex=tex_col("normal"),
        metallic_tex_ch=ch_col("metallic"),
        roughness_tex_ch=ch_col("roughness"),
        opacity_tex_ch=ch_col("opacity"),
        backface_id=jnp.asarray(np.array(backface_ids, np.int32)),
        clearcoat=col("clearcoat"),
        clearcoat_roughness=col("clearcoat_roughness"),
        anisotropy=col("anisotropy"),
        anisotropy_rotation=col("anisotropy_rotation"),
        packed_f=jnp.zeros((len(lowered), PF_COLS), jnp.float32),
        packed_i=jnp.zeros((len(lowered), 10), jnp.int32),
    )
    return _pack_material_table(table)


def _gather_rows(table2d: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Row gather [R, C] from a small table. TPU gathers are element-count
    bound (~1 element/cycle); for the material-table sizes this is a
    one-hot [R, M] x [M, C] MXU matmul instead — integer columns (slot
    ids < 2^24) stay exact through f32 accumulation."""
    m = int(table2d.shape[0])
    if m > 128:
        return table2d[ids]
    onehot = (ids[:, None] == jnp.arange(m, dtype=ids.dtype)[None, :])
    dense = onehot.astype(jnp.float32) @ table2d.astype(jnp.float32)
    if jnp.issubdtype(table2d.dtype, jnp.integer):
        return jnp.round(dense).astype(table2d.dtype)
    return dense


def gather_params(table: MaterialTable, material_ids: jnp.ndarray) -> BsdfParams:
    """Gather per-ray BSDF parameters from the table (texture lookups are
    applied on top by the integrator when slots are >= 0). One packed row
    gather + column slices."""
    pf = _gather_rows(table.packed_f, material_ids)  # [R, 23]
    return BsdfParams(
        base_color=pf[:, MF_BASE:MF_BASE + 3],
        metallic=pf[:, MF_METAL],
        roughness=pf[:, MF_ROUGH],
        ior=pf[:, MF_IOR],
        opacity=pf[:, MF_OPACITY],
        opacity_threshold=pf[:, MF_OPACITY_THRESH],
        emissive=pf[:, MF_EMISSIVE:MF_EMISSIVE + 3],
        use_specular_workflow=pf[:, MF_USW],
        specular_color=pf[:, MF_SPEC:MF_SPEC + 3],
        transmission=pf[:, MF_TRANS],
        thin_walled=pf[:, MF_THIN] > 0,
        volume_absorption=pf[:, MF_VOL_A:MF_VOL_A + 3],
        volume_scattering=pf[:, MF_VOL_S:MF_VOL_S + 3],
        volume_bias=pf[:, MF_VOL_BIAS],
        backface_edf=pf[:, MF_BACKFACE_EDF],
        clearcoat=pf[:, MF_COAT],
        clearcoat_roughness=pf[:, MF_COAT_ROUGH],
        anisotropy=pf[:, MF_ANISO],
        anisotropy_rotation=pf[:, MF_ANISO_ROT],
    )


def apply_textures(table: MaterialTable, pool, params: BsdfParams,
                   material_ids: jnp.ndarray, uv: jnp.ndarray,
                   active: tuple[str, ...] | None = None) -> BsdfParams:
    """Overlay texture lookups on gathered constants where slots are bound
    (the wavefront analog of the MDL-generated tex_lookup calls,
    mdl_interface.glsl:8-140). No-op (and free after DCE) when the pool has
    no real textures. `active` (STATIC) restricts the sampled parameters to
    those that actually have textures anywhere in the scene — each pruned
    parameter saves 4 bilinear texel gathers per ray (see textured_params)."""
    from gatling_tpu.render.texture import sample_pool

    if (int(pool.offset.shape[0]) <= 1 and int(pool.texels.shape[0]) <= 1
            and int(pool.texels_u32.shape[0]) <= 1):
        return params

    pi = _gather_rows(table.packed_i, material_ids)  # [R, 9]: slots + channels

    def rgb(col, constant):
        slot = pi[:, col]
        val = sample_pool(pool, slot, uv)
        return jnp.where((slot >= 0)[:, None], val[:, :3], constant)

    def scalar(col, ch_col, constant):
        slot = pi[:, col]
        ch = pi[:, ch_col]
        val = sample_pool(pool, slot, uv)
        picked = jnp.take_along_axis(val, ch[:, None], axis=1)[:, 0]
        return jnp.where(slot >= 0, picked, constant)

    updates = {}
    if active is None or "base_color" in active:
        updates["base_color"] = rgb(0, params.base_color)
    if active is None or "emissive" in active:
        updates["emissive"] = rgb(1, params.emissive)
    if active is None or "metallic" in active:
        updates["metallic"] = scalar(2, 6, params.metallic)
    if active is None or "roughness" in active:
        updates["roughness"] = scalar(3, 7, params.roughness)
    if active is None or "opacity" in active:
        updates["opacity"] = scalar(4, 8, params.opacity)
    return params._replace(**updates)


def substitute_texture_means(table: MaterialTable, pool) -> MaterialTable:
    """Texture-LOD material table: every textured parameter's constant is
    replaced by its texture's MEAN value (the "top mip", pool.mean).

    Rationale (render setting textureLodBounces=k): after k path vertices
    the ray footprint on any further surface spans many texels — classic
    path-tracing texture filtering substitutes a high mip level there. With
    the slim parbuf the fused shade kernel resolves textured parameters
    from the per-ray parbuf rows, so the SMEM table's copies of those
    columns are dead on the split-bounce path; holding the means there lets
    bounces >= k run the plain (untextured) bounce_step — the whole texture
    stage disappears from late bounces at the cost of indirect-only texture
    detail. Host-side, build time only."""
    mean = np.asarray(pool.mean, np.float32)  # [T, 4]

    def rgb(const, tex):
        tex = np.asarray(tex)
        out = np.array(const, np.float32)
        sel = tex >= 0
        out[sel] = mean[tex[sel]][:, :3]
        return jnp.asarray(out)

    def scalar(const, tex, ch):
        tex, ch = np.asarray(tex), np.asarray(ch)
        out = np.array(const, np.float32)
        sel = tex >= 0
        out[sel] = mean[tex[sel], ch[sel]]
        return jnp.asarray(out)

    t = table._replace(
        base_color=rgb(table.base_color, table.base_color_tex),
        emissive=rgb(table.emissive, table.emissive_tex),
        metallic=scalar(table.metallic, table.metallic_tex,
                        table.metallic_tex_ch),
        roughness=scalar(table.roughness, table.roughness_tex,
                         table.roughness_tex_ch),
    )
    return _pack_material_table(t)


def textured_params(lowered: "list[LoweredMaterial]") -> tuple[str, ...]:
    """The STATIC set of uber-BSDF parameters that have a texture anywhere
    in the scene (for apply_textures pruning)."""
    names = ("base_color", "emissive", "metallic", "roughness", "opacity")
    return tuple(n for n in names if any(n in m.textures for m in lowered))


def perturb_normal(table: MaterialTable, pool, material_ids: jnp.ndarray,
                   uv: jnp.ndarray, n: jnp.ndarray, t: jnp.ndarray,
                   b: jnp.ndarray) -> jnp.ndarray:
    """Tangent-space normal mapping (UsdPreviewSurface `normal` input)."""
    from gatling_tpu.render.texture import sample_pool

    if (int(pool.offset.shape[0]) <= 1 and int(pool.texels.shape[0]) <= 1
            and int(pool.texels_u32.shape[0]) <= 1):
        return n
    slot = _gather_rows(table.packed_i, material_ids)[:, 5]
    nm = sample_pool(pool, slot, uv)[:, :3]
    mapped = nm[:, 0:1] * t + nm[:, 1:2] * b + jnp.maximum(nm[:, 2:3], 1e-3) * n
    mapped = mapped / jnp.maximum(jnp.linalg.norm(mapped, axis=-1, keepdims=True), 1e-20)
    return jnp.where((slot >= 0)[:, None], mapped, n)
