"""MDL material front end (text subset).

The reference compiles .mdl files through the dlopen'd NVIDIA MDL SDK
(reference: src/mc/impl/MdlMaterialCompiler.cpp compileFromFile:153,
MdlNeurayLoader.cpp). No MDL SDK exists for TPU environments, so this module
implements the part that matters for the bundled Omni* materials and
TurboSquid-style assets (reference ships OmniPBR/OmniSurface/OmniGlass in
src/gi/mdl for exactly this compatibility, rendererPlugin.cpp:54-55): a
textual parser that extracts a material definition's parameter defaults,
applies user parameter overrides (GiMaterialParameters analog), and maps the
well-known Omni/MDL parameter names onto the uber-BSDF parameter set.

This is NOT a general MDL compiler — procedural bodies are not evaluated;
unknown materials fall back to sensible defaults with a warning.
"""

from __future__ import annotations

import os
import re
from typing import Any

from gatling_tpu.scene.stage import MaterialDesc, ShaderNode
from gatling_tpu.utils.log import get_logger

# well-known parameter name -> (uber param, kind)
# kinds: f=float, c=color, b=bool, t=texture
_PARAM_MAP = {
    # OmniPBR / generic
    "diffuse_color_constant": ("base_color", "c"),
    "diffuse_tint": ("base_color", "c"),
    "base_color": ("base_color", "c"),
    "diffuse_color": ("base_color", "c"),
    "albedo": ("base_color", "c"),
    "diffuse_texture": ("base_color_texture", "t"),
    "reflection_roughness_constant": ("roughness", "f"),
    "reflectionroughness_texture": ("roughness_texture", "t"),
    "roughness": ("roughness", "f"),
    "specular_roughness": ("roughness", "f"),
    "frosting_roughness": ("roughness", "f"),
    "metallic_constant": ("metallic", "f"),
    "metallic": ("metallic", "f"),
    "metallic_texture": ("metallic_texture", "t"),
    "emissive_color": ("emissive_color", "c"),
    "emissive_intensity": ("emissive_intensity", "f"),
    "enable_emission": ("enable_emission", "b"),
    "emissive_mask_texture": ("emissive_texture", "t"),
    "opacity_constant": ("opacity", "f"),
    "opacity": ("opacity", "f"),
    "enable_opacity": ("enable_opacity", "b"),
    "opacity_threshold": ("opacity_threshold", "f"),
    "ior_constant": ("ior", "f"),
    "ior": ("ior", "f"),
    "normalmap_texture": ("normal_texture", "t"),
    # OmniGlass
    "glass_color": ("transmission_color", "c"),
    "glass_ior": ("ior", "f"),
    "thin_walled": ("thin_walled", "b"),
    # OmniSurface-ish
    "specular_reflection_roughness": ("roughness", "f"),
    "specular_reflection_ior": ("ior", "f"),
    "transmission_weight": ("transmission", "f"),
    "enable_specular_transmission": ("enable_transmission", "b"),
    "coat_weight": ("clearcoat", "f"),
}

_VALUE_RE = re.compile(
    r"""(?:uniform\s+|varying\s+)?(?P<type>[\w:]+)\s+(?P<name>\w+)\s*=\s*(?P<value>[^,]+(?:\([^)]*\))?[^,]*)""",
)


def _parse_mdl_value(text: str) -> Any:
    text = text.strip().rstrip(",").strip()
    m = re.match(r"color\s*\(([^)]*)\)", text)
    if m:
        parts = [float(x) for x in re.findall(r"-?\d+\.?\d*(?:[eE][-+]?\d+)?", m.group(1))]
        if len(parts) == 1:
            parts = parts * 3
        return tuple((parts + [0.0, 0.0, 0.0])[:3])
    m = re.match(r'texture_2d\s*\(\s*"([^"]*)"', text)
    if m:
        return ("__texture__", m.group(1))
    if text in ("true", "false"):
        return text == "true"
    m = re.match(r"-?\d+\.?\d*(?:[eE][-+]?\d+)?f?$", text)
    if m:
        return float(text.rstrip("f"))
    m = re.match(r"float\s*\(([^)]*)\)", text)
    if m:
        try:
            return float(m.group(1))
        except ValueError:
            return 0.0
    return None


def _extract_material_params(source: str, sub_identifier: str | None) -> dict[str, Any]:
    """Find `export material <name>(<params>)` and parse parameter defaults."""
    pattern = re.compile(
        r"export\s+material\s+(\w+)\s*\(", re.MULTILINE)
    for m in pattern.finditer(source):
        name = m.group(1)
        if sub_identifier and name != sub_identifier:
            continue
        # balanced-paren scan for the parameter list
        depth = 1
        i = m.end()
        while i < len(source) and depth > 0:
            if source[i] == "(":
                depth += 1
            elif source[i] == ")":
                depth -= 1
            i += 1
        param_text = source[m.end():i - 1]
        params: dict[str, Any] = {}
        # split top-level commas
        parts, depth, start = [], 0, 0
        for j, ch in enumerate(param_text):
            if ch in "([":
                depth += 1
            elif ch in ")]":
                depth -= 1
            elif ch == "," and depth == 0:
                parts.append(param_text[start:j])
                start = j + 1
        parts.append(param_text[start:])
        for part in parts:
            pm = re.search(r"(\w+)\s*=\s*(.+)", part, re.DOTALL)
            if not pm:
                continue
            val = _parse_mdl_value(pm.group(2))
            if val is not None:
                params[pm.group(1)] = val
        return params
    return {}


def load_mdl_material(
    file_path: str | os.PathLike,
    sub_identifier: str | None = None,
    user_params: dict[str, Any] | None = None,
    name: str = "mdl",
) -> MaterialDesc:
    """giCreateMaterialFromMdlFile analog: .mdl file + subIdentifier +
    typed parameter overrides -> material network."""
    file_path = str(file_path)
    try:
        with open(file_path, "r", encoding="utf-8", errors="replace") as f:
            source = f.read()
        defaults = _extract_material_params(source, sub_identifier)
    except OSError:
        get_logger().error("cannot read MDL file %s", file_path)
        defaults = {}
        source = ""
    merged = dict(defaults)
    merged.update(user_params or {})

    # backface trait detection (reference: Frontend.cpp:104-121
    # _HasCompiledMaterialBackface{Bsdf,Edf}): a `backface:` field whose
    # expression names a scattering df / an emission edf
    has_backface_bsdf = False
    has_backface_edf = False
    bf = re.search(r"backface\s*:\s*material_surface\s*\(", source)
    if bf:
        depth, i = 1, bf.end()
        while i < len(source) and depth > 0:
            if source[i] == "(":
                depth += 1
            elif source[i] == ")":
                depth -= 1
            i += 1
        bf_text = source[bf.end():i - 1]
        has_backface_bsdf = "scattering" in bf_text or "bsdf" in bf_text
        has_backface_edf = "emission" in bf_text or "edf" in bf_text

    base_dir = os.path.dirname(os.path.abspath(file_path))
    inputs: dict[str, Any] = {}
    textures: dict[str, str] = {}
    for mdl_name, value in merged.items():
        mapping = _PARAM_MAP.get(mdl_name)
        if mapping is None:
            continue
        uber, kind = mapping
        if isinstance(value, tuple) and value and value[0] == "__texture__":
            tex_path = value[1]
            if not os.path.isabs(tex_path):
                tex_path = os.path.join(base_dir, tex_path)
            textures[uber if uber.endswith("_texture") else uber + "_texture"] = tex_path
        else:
            inputs[uber] = value

    # post-process gates (OmniPBR semantics)
    if not inputs.pop("enable_emission", True):
        inputs.pop("emissive_color", None)
        inputs.pop("emissive_intensity", None)
    emissive_color = inputs.pop("emissive_color", None)
    emissive_intensity = inputs.pop("emissive_intensity", 1.0)
    if emissive_color is not None:
        inputs["emissive"] = tuple(float(c) * float(emissive_intensity) for c in emissive_color)
    if not inputs.pop("enable_opacity", True):
        inputs.pop("opacity", None)
    if "transmission_color" in inputs:  # OmniGlass: tinted transmission
        tint = inputs.pop("transmission_color")
        inputs["transmission"] = 1.0
        # tint via volume absorption: sigma_a = -ln(color)
        import math
        inputs["volume_absorption"] = tuple(
            -math.log(max(min(float(c), 0.999), 1e-3)) for c in tint)
    if not inputs.pop("enable_transmission", True):
        inputs.pop("transmission", None)

    if has_backface_bsdf:
        inputs["has_backface_bsdf"] = True
    if has_backface_edf:
        inputs["has_backface_edf"] = True
    node = ShaderNode(path=f"/{name}/shader", shader_id="gatling_uber",
                      inputs={**inputs, **{k: v for k, v in textures.items()}},
                      input_connections={})
    return MaterialDesc(path=f"/{name}", surface_node=node.path,
                        nodes={node.path: node}, base_dir=base_dir)
