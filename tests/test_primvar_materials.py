"""Scene-data (primvar) reads from BOUND materials, end-to-end.

The reference packs per-mesh scene-data infos the compiled material reads
by name (rp_main.h:125-145, mdl_interface.glsl scene_data_lookup_*); here
geompropvalue/UsdPrimvarReader(displayColor) lowers to a dynamic primvar
leaf the wavefront integrator substitutes with the interpolated per-corner
rows. Bound materials that read no primvar must NOT be tinted by authored
displayColor (the vcolor multiply is gated to the fallback material)."""

import numpy as np
import jax.numpy as jnp

from gatling_tpu.interface import empty_light_arrays
from gatling_tpu.ops.geometry import build_geometry
from gatling_tpu.render.camera import CameraUniforms
from gatling_tpu.render.integrator import (DomeLightData, RenderConfig,
                                           Uniforms, render_pixels)
from gatling_tpu.render.material import build_material_table, lower_material
from gatling_tpu.scene.meshproc import build_triangulated_mesh, Interpolation
from gatling_tpu.scene.stage import MaterialDesc, MeshDesc, ShaderNode


def _uniforms():
    return Uniforms(
        camera=CameraUniforms(
            position=jnp.asarray([0, 0, 4.0], jnp.float32),
            forward=jnp.asarray([0, 0, -1.0], jnp.float32),
            up=jnp.asarray([0, 1.0, 0], jnp.float32),
            vfov=jnp.float32(0.5), lens_radius=jnp.float32(0),
            focus_distance=jnp.float32(0), sensor_exposure=jnp.float32(0),
            clip_start=jnp.float32(0.01), clip_end=jnp.float32(1000.0)),
        sample_offset=jnp.int32(0), inv_total_sample_count=jnp.float32(1.0),
        max_sample_value=jnp.float32(100.0),
        rr_inv_min_term_prob=jnp.float32(0.95),
        light_intensity_multiplier=jnp.float32(1.0),
        meters_per_scene_unit=jnp.float32(1.0),
        max_volume_walk_length=jnp.int32(7),
        dome_rotation=jnp.asarray([0, 0, 0, 1.0], jnp.float32),
        dome_emission_multiplier=jnp.ones(3, jnp.float32),
        dome_diffuse_specular=jnp.ones(2, jnp.float32))


def _colored_plane_scene(material_desc):
    """Constant-per-corner colored plane (uniform green) with the given
    bound material."""
    pts = np.array([[-50, -50, 0], [50, -50, 0], [-50, 50, 0], [50, 50, 0]],
                   np.float32)
    colors = np.array([[0.1, 0.8, 0.3]], np.float32)  # uniform: 1 per face
    mesh = build_triangulated_mesh(
        pts, np.array([4]), np.array([0, 1, 3, 2]),
        colors=np.repeat(colors, 1, axis=0),
        colors_interp=Interpolation.UNIFORM)
    meshes = [MeshDesc(path="/p", mesh=mesh, transform=np.eye(4),
                       material="m", double_sided=True, object_id=0)]
    geom = build_geometry(meshes, {"m": 0, None: 1})
    m = lower_material(material_desc)
    m.params["ior"] = 1.0  # no Fresnel glossy lobe: pure Lambert furnace
    table = build_material_table([m, lower_material(None)])
    return geom, table, m


def _render(geom, table, dynamic_params, spp=64):
    cfg = RenderConfig(width=8, height=8, spp=spp, max_bounces=2,
                       jittered=False, fis=False, has_dome=True,
                       rr_bounce_offset=100, dynamic_params=dynamic_params)
    dome = DomeLightData(texture=jnp.full((1, 1, 3), 1.0, jnp.float32),
                         fallback=jnp.zeros((1, 1, 3), jnp.float32))
    pix = jnp.arange(64, dtype=jnp.int32)
    res = render_pixels(cfg, _uniforms(), geom, table, empty_light_arrays(),
                        dome, pix, spp, jnp.int32(0))
    return np.asarray(res.color).reshape(8, 8, 3)


def _primvar_material():
    nodes = [
        ShaderNode(path="/m/s", shader_id="UsdPreviewSurface", inputs={},
                   input_connections={"diffuseColor": ("/m/pv", "out")}),
        ShaderNode(path="/m/pv", shader_id="UsdPrimvarReader_float3",
                   inputs={"varname": "displayColor",
                           "fallback": (0.5, 0.5, 0.5)},
                   input_connections={}),
    ]
    return MaterialDesc(path="/m", surface_node="/m/s",
                        nodes={n.path: n for n in nodes})


def test_bound_material_reads_displaycolor_primvar():
    """Furnace reflectance of the plane equals the PRIMVAR color when the
    bound material routes displayColor into base_color."""
    geom, table, m = _colored_plane_scene(_primvar_material())
    assert "base_color" in m.dynamic and m.dynamic["base_color"].op == "primvar"
    img = _render(geom, table, ((0, "base_color", m.dynamic["base_color"]),))
    np.testing.assert_allclose(img[2:6, 2:6].mean(axis=(0, 1)),
                               (0.1, 0.8, 0.3), rtol=0.06)


def test_bound_material_ignores_displaycolor():
    """A bound material with its own base_color must NOT be tinted by the
    mesh's authored displayColor rows (vcolor multiply gated off)."""
    nodes = [ShaderNode(path="/m/s", shader_id="UsdPreviewSurface",
                        inputs={"diffuseColor": (0.6, 0.6, 0.6)},
                        input_connections={})]
    desc = MaterialDesc(path="/m", surface_node="/m/s",
                        nodes={n.path: n for n in nodes})
    geom, table, m = _colored_plane_scene(desc)
    img = _render(geom, table, ())
    np.testing.assert_allclose(img[2:6, 2:6].mean(axis=(0, 1)),
                               (0.6, 0.6, 0.6), rtol=0.06)


def test_instance_rate_primvar_drives_material():
    """VERDICT r4 item 9: an arbitrary instancer primvar (here myTint)
    routes through the scene-data path — the bound material's primvar
    leaf resolves per hit via the instance id, so two instances of ONE
    mesh shade with their own colors (reference: instancer.cpp:138-189)."""
    from gatling_tpu.ops.geometry import build_instance_primvar_tables

    pts = np.array([[-50, -50, 0], [50, -50, 0], [-50, 50, 0], [50, 50, 0]],
                   np.float32)
    mesh = build_triangulated_mesh(pts, np.array([4]), np.array([0, 1, 3, 2]))
    # two instances: left half / right half of the view
    xf_l = np.eye(4); xf_l[0, 0] = 0.001; xf_l[3, 0] = -1.0
    xf_r = np.eye(4); xf_r[0, 0] = 0.001; xf_r[3, 0] = 1.0
    # widen x-scale so each covers its half: scale 100 in local x=+-50
    xf_l[0, 0] = 0.02; xf_r[0, 0] = 0.02
    tints = np.array([[0.9, 0.1, 0.1], [0.1, 0.1, 0.9]], np.float32)
    meshes = [MeshDesc(path="/p", mesh=mesh, transform=np.eye(4),
                       material="m", double_sided=True, object_id=0,
                       instance_transforms=np.stack([xf_l, xf_r]),
                       instance_primvars={"myTint": tints})]
    geom = build_geometry(meshes, {"m": 0, None: 1})

    nodes = [
        ShaderNode(path="/m/s", shader_id="UsdPreviewSurface", inputs={},
                   input_connections={"diffuseColor": ("/m/pv", "out")}),
        ShaderNode(path="/m/pv", shader_id="UsdPrimvarReader_float3",
                   inputs={"varname": "myTint",
                           "fallback": (0.5, 0.5, 0.5)},
                   input_connections={}),
    ]
    desc = MaterialDesc(path="/m", surface_node="/m/s",
                        nodes={n.path: n for n in nodes})
    m = lower_material(desc)
    m.params["ior"] = 1.0
    table = build_material_table([m, lower_material(None)])
    assert "base_color" in m.dynamic and m.dynamic["base_color"].op == "primvar"
    assert m.dynamic["base_color"].channel == "myTint"

    tables = build_instance_primvar_tables(meshes)
    assert set(tables) == {"myTint"}
    np.testing.assert_allclose(np.asarray(tables["myTint"]), tints)

    cfg = RenderConfig(width=8, height=8, spp=32, max_bounces=2,
                       jittered=False, fis=False, has_dome=True,
                       rr_bounce_offset=100,
                       dynamic_params=((0, "base_color",
                                        m.dynamic["base_color"]),))
    dome = DomeLightData(texture=jnp.full((1, 1, 3), 1.0, jnp.float32),
                         fallback=jnp.zeros((1, 1, 3), jnp.float32))
    pix = jnp.arange(64, dtype=jnp.int32)
    res = render_pixels(cfg, _uniforms(), geom, table, empty_light_arrays(),
                        dome, pix, 32, jnp.int32(0),
                        instance_primvars=tables)
    img = np.asarray(res.color).reshape(8, 8, 3)
    left = img[2:6, 1:3].mean(axis=(0, 1))
    right = img[2:6, 5:7].mean(axis=(0, 1))
    np.testing.assert_allclose(left, (0.9, 0.1, 0.1), rtol=0.08, atol=0.02)
    np.testing.assert_allclose(right, (0.1, 0.1, 0.9), rtol=0.08, atol=0.02)


def test_instancer_primvars_flow_from_usd():
    """The stage pipeline forwards arbitrary instancer primvars into
    MeshDesc.instance_primvars."""
    from gatling_tpu.scene.stage import build_scene
    from gatling_tpu.scene.usda import parse_usda

    txt = """#usda 1.0
def PointInstancer "PI"
{
    rel prototypes = [</PI/Protos/Cube>]
    int[] protoIndices = [0, 0, 0]
    point3f[] positions = [(0,0,0), (2,0,0), (4,0,0)]
    float[] primvars:myWeight = [0.1, 0.5, 0.9]
    color3f[] primvars:myTint = [(1,0,0), (0,1,0), (0,0,1)]
    def Scope "Protos"
    {
        def Mesh "Cube" (prepend apiSchemas = ["MaterialBindingAPI"])
        {
            rel material:binding = </M>
            point3f[] points = [(0,0,0), (1,0,0), (0,1,0)]
            int[] faceVertexCounts = [3]
            int[] faceVertexIndices = [0, 1, 2]
        }
    }
}
def Material "M"
{
    token outputs:surface.connect = </M/s.outputs:surface>
    def Shader "s"
    {
        uniform token info:id = "UsdPreviewSurface"
        token outputs:surface
    }
}
"""
    sc = build_scene(parse_usda(txt))
    mesh = next(m for m in sc.meshes if m.instance_transforms is not None)
    assert mesh.instance_transforms.shape[0] == 3
    pv = mesh.instance_primvars
    assert pv is not None and set(pv) >= {"myWeight", "myTint"}
    np.testing.assert_allclose(pv["myWeight"][:, 0], [0.1, 0.5, 0.9])
    np.testing.assert_allclose(pv["myTint"],
                               [(1, 0, 0), (0, 1, 0), (0, 0, 1)])
