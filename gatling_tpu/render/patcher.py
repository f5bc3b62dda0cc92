"""UsdPreviewSurface network patcher — in-the-wild asset quirks.

Reimplements the reference's PreviewSurfaceNetworkPatcher
(/root/reference/src/hdGatling/previewSurfaceNetworkPatcher.cpp:32-576)
against the repo's ShaderNode network model (scene/stage.py). Real DCC
exports ship broken or legacy networks; each fix below names the exporter
bug it covers (same provenance notes as the reference):

1. 'default' params on UsdUVTexture / UsdPrimvarReader_* should be
   'fallback' (certain usdzshare assets).
2. Blender <=3.x 'UVmap' varname on primvar readers under a
   Principled_BSDF-named preview surface should read 'st'
   (blender/blender#112407).
3. Sketchfab glossiness workflow: a 'glossiness' param becomes
   roughness = 1 - glossiness; a glossiness TEXTURE connection moves to
   roughness with scale -1 / bias 1 on the texture node.
4. Blender 3.1+ 'specular' float input should be 'specularColor' color3;
   a texture connection switches its output channel to rgb.
5. Normal-map readers missing scale/bias (Multiverse for Maya), or with
   Unity's scale=1/bias=0 bug, get the required scale=2 bias=-1; static
   'normal' values (Sketchfab orbs) are dropped.
6. Float inputs (metallic/roughness/clearcoat/.../occlusion) connected to
   a texture's 'rgb' output reconnect to the single 'r' channel
   (Intel Moore Lane 4004 / Houdini 19 exports).
7. Unity's legacy 'isSRGB' yes/no param becomes
   sourceColorSpace sRGB/raw.
8. Uppercase 'RAW' sourceColorSpace tokens lowercase (Blender reader
   parity).

The patcher mutates the MaterialDesc in place and is idempotent. The env
switch GATLING_MATPATCH_DISABLE_USDPREVIEWSURFACE_NORMALMAP mirrors the
reference's HDGATLING_ one for quirk 5.
"""

from __future__ import annotations

import os
from typing import TYPE_CHECKING

from gatling_tpu.utils.log import get_logger

if TYPE_CHECKING:  # pragma: no cover
    from gatling_tpu.scene.stage import MaterialDesc, ShaderNode

_PRIMVAR_READERS = {
    "UsdPrimvarReader_float", "UsdPrimvarReader_float2",
    "UsdPrimvarReader_float3", "UsdPrimvarReader_float4",
    "UsdPrimvarReader_int", "UsdPrimvarReader_string",
    "UsdPrimvarReader_normal", "UsdPrimvarReader_point",
    "UsdPrimvarReader_vector", "UsdPrimvarReader_matrix",
}

_FLOAT_INPUTS = (
    "metallic", "roughness", "clearcoat", "clearcoatRoughness",
    "opacity", "opacityThreshold", "ior", "displacement", "occlusion",
)


def _patch_default_param(desc: "MaterialDesc") -> None:
    for node in desc.nodes.values():
        if (node.shader_id != "UsdUVTexture"
                and node.shader_id not in _PRIMVAR_READERS):
            continue
        if "default" in node.inputs:
            node.inputs.setdefault("fallback", node.inputs.pop("default"))


def _patch_uvmap_varname(desc: "MaterialDesc") -> None:
    for node in desc.nodes.values():
        if node.shader_id != "UsdPreviewSurface":
            continue
        if not node.path.rsplit("/", 1)[-1] == "Principled_BSDF":
            continue
        for tex_path, _out in node.input_connections.values():
            tex = desc.nodes.get(tex_path)
            if tex is None or tex.shader_id != "UsdUVTexture":
                continue
            for rd_path, _o in tex.input_connections.values():
                rd = desc.nodes.get(rd_path)
                if (rd is not None
                        and rd.shader_id == "UsdPrimvarReader_float2"
                        and rd.inputs.get("varname") == "UVmap"):
                    rd.inputs["varname"] = "st"


def _patch_glossiness(desc: "MaterialDesc") -> None:
    for node in desc.nodes.values():
        if node.shader_id != "UsdPreviewSurface":
            continue
        if "glossiness" in node.inputs:
            g = node.inputs.pop("glossiness")
            try:
                node.inputs["roughness"] = 1.0 - float(g)
            except (TypeError, ValueError):
                pass
            continue
        conn = node.input_connections.pop("glossiness", None)
        if conn is None:
            continue
        tex = desc.nodes.get(conn[0])
        if (tex is not None and tex.shader_id == "UsdUVTexture"
                and "scale" not in tex.inputs and "bias" not in tex.inputs):
            # output = texture * scale + bias = 1 - texture
            tex.inputs["scale"] = (-1.0, -1.0, -1.0, -1.0)
            tex.inputs["bias"] = (1.0, 1.0, 1.0, 0.0)
        node.input_connections["roughness"] = conn


def _patch_specular(desc: "MaterialDesc") -> None:
    for node in desc.nodes.values():
        if node.shader_id != "UsdPreviewSurface":
            continue
        if "specular" in node.inputs:
            v = node.inputs.pop("specular")
            try:
                f = float(v)
            except (TypeError, ValueError):
                continue
            node.inputs["specularColor"] = (f, f, f)
            continue
        conn = node.input_connections.pop("specular", None)
        if conn is not None:
            tex = desc.nodes.get(conn[0])
            if tex is not None and tex.shader_id == "UsdUVTexture":
                conn = (conn[0], "rgb")
            node.input_connections["specularColor"] = conn


def _patch_normal_map(desc: "MaterialDesc") -> None:
    if os.environ.get("GATLING_MATPATCH_DISABLE_USDPREVIEWSURFACE_NORMALMAP"):
        return
    for node in desc.nodes.values():
        if node.shader_id != "UsdPreviewSurface":
            continue
        conn = node.input_connections.get("normal")
        if conn is not None:
            tex = desc.nodes.get(conn[0])
            if tex is not None and tex.shader_id == "UsdUVTexture":
                scale = tex.inputs.get("scale")
                bias = tex.inputs.get("bias")
                missing = scale is None and bias is None
                unity_bug = (
                    scale is not None and bias is not None
                    and tuple(scale)[:3] == (1.0, 1.0, 1.0)
                    and tuple(bias)[:3] == (0.0, 0.0, 0.0))
                if missing or unity_bug:
                    get_logger().info(
                        "patching %s normal reader to scale=2 bias=-1 "
                        "(set GATLING_MATPATCH_DISABLE_USDPREVIEWSURFACE_"
                        "NORMALMAP to disable)", tex.path)
                    tex.inputs["scale"] = (2.0, 2.0, 2.0, 1.0)
                    tex.inputs["bias"] = (-1.0, -1.0, -1.0, 0.0)
        # a static normal value (e.g. Sketchfab's (1,1,1)) is always wrong
        node.inputs.pop("normal", None)


def _patch_float_channel_connections(desc: "MaterialDesc") -> None:
    for node in desc.nodes.values():
        if node.shader_id != "UsdPreviewSurface":
            continue
        for name in _FLOAT_INPUTS:
            conn = node.input_connections.get(name)
            if conn is None or conn[1] != "rgb":
                continue
            tex = desc.nodes.get(conn[0])
            if tex is not None and tex.shader_id == "UsdUVTexture":
                get_logger().info(
                    "patching %s:%s input to connect to UsdUVTexture:r",
                    node.path, name)
                node.input_connections[name] = (conn[0], "r")


def _patch_texture_colorspace(desc: "MaterialDesc") -> None:
    for node in desc.nodes.values():
        if node.shader_id != "UsdUVTexture":
            continue
        if "isSRGB" in node.inputs:
            v = str(node.inputs.pop("isSRGB"))
            node.inputs["sourceColorSpace"] = {
                "yes": "sRGB", "no": "raw"}.get(v, "auto")
        if node.inputs.get("sourceColorSpace") == "RAW":
            node.inputs["sourceColorSpace"] = "raw"


def patch_preview_surface_network(desc: "MaterialDesc") -> "MaterialDesc":
    """Apply every quirk fix in the reference's order
    (previewSurfaceNetworkPatcher.cpp Patch())."""
    _patch_default_param(desc)
    _patch_uvmap_varname(desc)
    _patch_glossiness(desc)
    _patch_specular(desc)
    _patch_normal_map(desc)
    _patch_float_channel_connections(desc)
    _patch_texture_colorspace(desc)
    return desc
