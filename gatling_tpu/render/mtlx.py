"""MaterialX document front end.

The reference feeds MaterialX through MDL codegen
(reference: src/mc/impl/MtlxMdlCodeGen.cpp translate:217-287 — MaterialX doc
-> MDL source -> compiled material). Here .mtlx XML lowers directly into the
same shader-network representation the USD path produces (scene.stage
MaterialDesc/ShaderNode), which the uber-BSDF lowering in render/material.py
consumes. Supported: standard_surface / open_pbr_surface / gltf_pbr /
UsdPreviewSurface surface shaders, image/tiledimage texture nodes, constant
nodes, nodegraph outputs, surfacematerial bindings.

Document patching chores the reference does in McMtlxDocumentPatcher
(MtlxDocumentPatcher.cpp: bool-as-int literals, color3/vector3 conversion)
are handled during value parsing.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

from gatling_tpu.scene.stage import MaterialDesc, ShaderNode
from gatling_tpu.utils.log import get_logger

_SURFACE_CATEGORIES = (
    "standard_surface", "open_pbr_surface", "gltf_pbr", "UsdPreviewSurface",
    "disney_brdf", "lama_surface",
)

_TEXTURE_CATEGORIES = ("image", "tiledimage")


def _parse_value(val: str, type_name: str):
    """MaterialX value string -> python value (bool-as-int patching like
    MtlxDocumentPatcher.cpp:118-139)."""
    val = val.strip()
    if type_name == "boolean":
        return val in ("true", "1")
    if type_name in ("float", "integer", "int"):
        try:
            f = float(val)
            return int(f) if type_name in ("integer", "int") else f
        except ValueError:
            return 0.0
    if type_name in ("color3", "color4", "vector2", "vector3", "vector4"):
        try:
            return tuple(float(x) for x in val.split(","))
        except ValueError:
            return (0.0, 0.0, 0.0)
    if type_name == "filename":
        # OS-path sanitizing (MtlxDocumentPatcher.cpp:41-54): Windows
        # backslash-separated asset paths become forward-slash paths so
        # downstream resolution is platform-uniform
        return val.replace("\\", "/")
    if type_name == "string":
        return val
    return val


def parse_mtlx(text: str, name: str = "mtlx", base_dir: str = "") -> MaterialDesc:
    """Parse a MaterialX XML document into a MaterialDesc network."""
    root = ET.fromstring(text)
    nodes: dict[str, ShaderNode] = {}
    surface_node: str | None = None
    material_surface_ref: str | None = None

    def walk(elem: ET.Element, prefix: str) -> None:
        nonlocal surface_node, material_surface_ref
        for child in elem:
            tag = child.tag
            node_name = child.get("name", "")
            path = f"{prefix}/{node_name}"
            if tag == "nodegraph":
                walk(child, path)
                continue
            if tag in ("nodedef", "implementation", "typedef", "output", "input"):
                if tag == "output" and prefix != f"/{name}":
                    # nodegraph output: alias to its connected node
                    src = child.get("nodename")
                    if src:
                        nodes[path] = ShaderNode(
                            path=path, shader_id="__output",
                            inputs={}, input_connections={"in": (f"{prefix}/{src}", "out")})
                continue
            inputs: dict = {}
            conns: dict = {}
            for inp in child.findall("input"):
                iname = inp.get("name", "")
                itype = inp.get("type", "")
                if inp.get("value") is not None:
                    inputs[iname] = _parse_value(inp.get("value"), itype)
                elif inp.get("nodename"):
                    conns[iname] = (f"{prefix}/{inp.get('nodename')}", inp.get("output", "out"))
                elif inp.get("nodegraph"):
                    out = inp.get("output", "out")
                    conns[iname] = (f"{prefix}/{inp.get('nodegraph')}/{out}", "out")
            if tag == "surfacematerial":
                conn = conns.get("surfaceshader")
                if conn:
                    material_surface_ref = conn[0]
                continue
            nodes[path] = ShaderNode(path=path, shader_id=tag, inputs=inputs,
                                     input_connections=conns)
            if tag in _SURFACE_CATEGORIES and surface_node is None:
                surface_node = path

    walk(root, f"/{name}")

    if material_surface_ref and material_surface_ref in nodes:
        surface_node = material_surface_ref
    if surface_node is None and nodes:
        get_logger().warning("mtlx %s: no recognized surface shader", name)

    # resolve __output aliases transparently: rewrite connections that target
    # an output node to its source
    def resolve(target: tuple[str, str]) -> tuple[str, str]:
        seen = 0
        while seen < 8:
            node = nodes.get(target[0])
            if node is None or node.shader_id != "__output":
                return target
            target = node.input_connections.get("in", target)
            seen += 1
        return target

    for node in nodes.values():
        for k, tgt in list(node.input_connections.items()):
            node.input_connections[k] = resolve(tgt)

    return MaterialDesc(path=f"/{name}", surface_node=surface_node, nodes=nodes,
                        base_dir=base_dir)


def load_mtlx(path: str | os.PathLike) -> MaterialDesc:
    with open(path, "r", encoding="utf-8") as f:
        return parse_mtlx(f.read(), name=os.path.splitext(os.path.basename(str(path)))[0],
                          base_dir=os.path.dirname(os.path.abspath(str(path))))
