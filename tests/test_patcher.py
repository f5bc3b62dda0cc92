"""UsdPreviewSurface network patcher — in-the-wild quirks (VERDICT r4
item 8; reference: src/hdGatling/previewSurfaceNetworkPatcher.cpp)."""

import numpy as np

from gatling_tpu.render.material import lower_material
from gatling_tpu.scene.stage import build_scene
from gatling_tpu.scene.usda import parse_usda


def _mat(txt: str, path: str = "/M"):
    scene = build_scene(parse_usda(txt))
    return scene.materials[path]


def test_glossiness_param_becomes_roughness():
    """Sketchfab glossiness workflow: roughness = 1 - glossiness."""
    desc = _mat("""#usda 1.0
def Material "M"
{
    token outputs:surface.connect = </M/s.outputs:surface>
    def Shader "s"
    {
        uniform token info:id = "UsdPreviewSurface"
        float inputs:glossiness = 0.25
        token outputs:surface
    }
}
""")
    node = desc.nodes[desc.surface_node]
    assert "glossiness" not in node.inputs
    assert abs(node.inputs["roughness"] - 0.75) < 1e-6
    low = lower_material(desc)
    assert abs(low.params["roughness"] - 0.75) < 1e-6


def test_glossiness_texture_inverts_via_scale_bias(tmp_path):
    """A glossiness TEXTURE moves to roughness with scale -1 / bias 1."""
    desc = _mat("""#usda 1.0
def Material "M"
{
    token outputs:surface.connect = </M/s.outputs:surface>
    def Shader "s"
    {
        uniform token info:id = "UsdPreviewSurface"
        float inputs:glossiness.connect = </M/tex.outputs:r>
        token outputs:surface
    }
    def Shader "tex"
    {
        uniform token info:id = "UsdUVTexture"
        asset inputs:file = @gloss.png@
        float outputs:r
    }
}
""")
    node = desc.nodes[desc.surface_node]
    assert "glossiness" not in node.input_connections
    assert node.input_connections["roughness"] == ("/M/tex", "r")
    tex = desc.nodes["/M/tex"]
    assert tuple(tex.inputs["scale"]) == (-1.0, -1.0, -1.0, -1.0)
    assert tuple(tex.inputs["bias"]) == (1.0, 1.0, 1.0, 0.0)


def test_blender_specular_float_becomes_specular_color():
    desc = _mat("""#usda 1.0
def Material "M"
{
    token outputs:surface.connect = </M/s.outputs:surface>
    def Shader "s"
    {
        uniform token info:id = "UsdPreviewSurface"
        float inputs:specular = 0.5
        token outputs:surface
    }
}
""")
    node = desc.nodes[desc.surface_node]
    assert "specular" not in node.inputs
    assert tuple(node.inputs["specularColor"]) == (0.5, 0.5, 0.5)


def test_default_param_renamed_to_fallback():
    desc = _mat("""#usda 1.0
def Material "M"
{
    token outputs:surface.connect = </M/s.outputs:surface>
    def Shader "s"
    {
        uniform token info:id = "UsdPreviewSurface"
        color3f inputs:diffuseColor.connect = </M/tex.outputs:rgb>
        token outputs:surface
    }
    def Shader "tex"
    {
        uniform token info:id = "UsdUVTexture"
        float4 inputs:default = (0.25, 0.5, 0.75, 1)
        color3f outputs:rgb
    }
}
""")
    tex = desc.nodes["/M/tex"]
    assert "default" not in tex.inputs
    assert tuple(tex.inputs["fallback"])[:3] == (0.25, 0.5, 0.75)
    # and the fallback actually drives the lowered value (no file authored)
    low = lower_material(desc)
    np.testing.assert_allclose(low.params["base_color"], (0.25, 0.5, 0.75),
                               atol=1e-6)


def test_float_input_rgb_connection_reconnects_to_r():
    """Moore Lane-style mistake: roughness wired to UsdUVTexture:rgb."""
    desc = _mat("""#usda 1.0
def Material "M"
{
    token outputs:surface.connect = </M/s.outputs:surface>
    def Shader "s"
    {
        uniform token info:id = "UsdPreviewSurface"
        float inputs:roughness.connect = </M/tex.outputs:rgb>
        token outputs:surface
    }
    def Shader "tex"
    {
        uniform token info:id = "UsdUVTexture"
        asset inputs:file = @rough.png@
        color3f outputs:rgb
    }
}
""")
    node = desc.nodes[desc.surface_node]
    assert node.input_connections["roughness"] == ("/M/tex", "r")


def test_unity_issrgb_and_raw_tokens():
    desc = _mat("""#usda 1.0
def Material "M"
{
    token outputs:surface.connect = </M/s.outputs:surface>
    def Shader "s"
    {
        uniform token info:id = "UsdPreviewSurface"
        color3f inputs:diffuseColor.connect = </M/a.outputs:rgb>
        float inputs:metallic.connect = </M/b.outputs:r>
        token outputs:surface
    }
    def Shader "a"
    {
        uniform token info:id = "UsdUVTexture"
        token inputs:isSRGB = "yes"
        color3f outputs:rgb
    }
    def Shader "b"
    {
        uniform token info:id = "UsdUVTexture"
        token inputs:sourceColorSpace = "RAW"
        float outputs:r
    }
}
""")
    assert desc.nodes["/M/a"].inputs["sourceColorSpace"] == "sRGB"
    assert "isSRGB" not in desc.nodes["/M/a"].inputs
    assert desc.nodes["/M/b"].inputs["sourceColorSpace"] == "raw"


def test_principled_bsdf_uvmap_varname():
    """Blender <=3.x bug: UVmap varname under a Principled_BSDF surface."""
    desc = _mat("""#usda 1.0
def Material "M"
{
    token outputs:surface.connect = </M/Principled_BSDF.outputs:surface>
    def Shader "Principled_BSDF"
    {
        uniform token info:id = "UsdPreviewSurface"
        color3f inputs:diffuseColor.connect = </M/tex.outputs:rgb>
        token outputs:surface
    }
    def Shader "tex"
    {
        uniform token info:id = "UsdUVTexture"
        float2 inputs:st.connect = </M/uv.outputs:result>
        color3f outputs:rgb
    }
    def Shader "uv"
    {
        uniform token info:id = "UsdPrimvarReader_float2"
        token inputs:varname = "UVmap"
        float2 outputs:result
    }
}
""")
    assert desc.nodes["/M/uv"].inputs["varname"] == "st"


def test_static_normal_value_dropped():
    """Sketchfab orbs author normal = (1,1,1); any static value is wrong."""
    desc = _mat("""#usda 1.0
def Material "M"
{
    token outputs:surface.connect = </M/s.outputs:surface>
    def Shader "s"
    {
        uniform token info:id = "UsdPreviewSurface"
        normal3f inputs:normal = (1, 1, 1)
        token outputs:surface
    }
}
""")
    node = desc.nodes[desc.surface_node]
    assert "normal" not in node.inputs


def test_normal_reader_gets_scale_bias():
    """Multiverse-style networks omit the required scale=2 bias=-1."""
    desc = _mat("""#usda 1.0
def Material "M"
{
    token outputs:surface.connect = </M/s.outputs:surface>
    def Shader "s"
    {
        uniform token info:id = "UsdPreviewSurface"
        normal3f inputs:normal.connect = </M/n.outputs:rgb>
        token outputs:surface
    }
    def Shader "n"
    {
        uniform token info:id = "UsdUVTexture"
        asset inputs:file = @n.png@
        color3f outputs:rgb
    }
}
""")
    tex = desc.nodes["/M/n"]
    assert tuple(tex.inputs["scale"]) == (2.0, 2.0, 2.0, 1.0)
    assert tuple(tex.inputs["bias"]) == (-1.0, -1.0, -1.0, 0.0)
