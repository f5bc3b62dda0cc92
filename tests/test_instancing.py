"""PointInstancer, GeomSubset and displayColor-fallback tests."""

import numpy as np

from gatling_tpu.ops.geometry import build_geometry
from gatling_tpu.scene.stage import build_scene
from gatling_tpu.scene.usda import parse_usda


def test_point_instancer_expands():
    stage = parse_usda("""#usda 1.0
def PointInstancer "Inst"
{
    point3f[] positions = [(0, 0, 0), (5, 0, 0), (0, 5, 0)]
    int[] protoIndices = [0, 0, 0]
    float3[] scales = [(1, 1, 1), (2, 2, 2), (1, 1, 1)]
    rel prototypes = [</Inst/Protos/Tri>]
    def Scope "Protos"
    {
        def Mesh "Tri"
        {
            point3f[] points = [(0, 0, 0), (1, 0, 0), (0, 1, 0)]
            int[] faceVertexCounts = [3]
            int[] faceVertexIndices = [0, 1, 2]
        }
    }
}
""")
    scene = build_scene(stage)
    assert len(scene.meshes) == 1
    mesh = scene.meshes[0]
    assert mesh.instance_transforms is not None
    assert mesh.instance_transforms.shape == (3, 4, 4)
    # second instance scaled by 2 and translated by (5,0,0)
    p = np.append([1.0, 0, 0], 1.0) @ mesh.instance_transforms[1]
    np.testing.assert_allclose(p[:3], [7, 0, 0])

    geom = build_geometry(scene.meshes, {None: 0})
    # 3 instances x 1 triangle, with distinct instance ids
    ids = np.asarray(geom.instance_id)[:3]
    assert sorted(ids.tolist()) == [0, 1, 2]


def test_point_instancer_orientation():
    stage = parse_usda("""#usda 1.0
def PointInstancer "Inst"
{
    point3f[] positions = [(0, 0, 0)]
    int[] protoIndices = [0]
    quath[] orientations = [(0.7071068, 0, 0, 0.7071068)]
    rel prototypes = [</Inst/P/M>]
    def Scope "P"
    {
        def Mesh "M"
        {
            point3f[] points = [(1, 0, 0), (2, 0, 0), (1, 1, 0)]
            int[] faceVertexCounts = [3]
            int[] faceVertexIndices = [0, 1, 2]
        }
    }
}
""")
    scene = build_scene(stage)
    m = scene.meshes[0].instance_transforms[0]
    # 90 degrees about z: x -> y
    p = np.append([1.0, 0, 0], 1.0) @ m
    np.testing.assert_allclose(p[:3], [0, 1, 0], atol=1e-4)


def test_geom_subsets_split_materials():
    stage = parse_usda("""#usda 1.0
def Mesh "Quads" (
    prepend apiSchemas = ["MaterialBindingAPI"]
)
{
    point3f[] points = [(0,0,0), (1,0,0), (1,1,0), (0,1,0), (2,0,0), (2,1,0)]
    int[] faceVertexCounts = [4, 4]
    int[] faceVertexIndices = [0, 1, 2, 3, 1, 4, 5, 2]
    rel material:binding = </MatA>
    def GeomSubset "Sub"
    {
        uniform token elementType = "face"
        uniform token familyName = "materialBind"
        int[] indices = [1]
        rel material:binding = </MatB>
    }
}
def Material "MatA" {}
def Material "MatB" {}
""")
    scene = build_scene(stage)
    assert len(scene.meshes) == 2
    by_mat = {m.material: m for m in scene.meshes}
    assert by_mat["/MatB"].mesh.num_triangles == 2  # face 1 -> 2 tris
    assert by_mat["/MatA"].mesh.num_triangles == 2  # remainder
    assert set(by_mat["/MatB"].mesh.face_ids.tolist()) == {1}


def test_display_color_fallback():
    stage = parse_usda("""#usda 1.0
def Mesh "M"
{
    point3f[] points = [(0,0,0), (1,0,0), (0,1,0)]
    int[] faceVertexCounts = [3]
    int[] faceVertexIndices = [0, 1, 2]
    color3f[] primvars:displayColor = [(0.2, 0.4, 0.9)]
}
""")
    scene = build_scene(stage)
    mesh = scene.meshes[0]
    assert mesh.material is not None
    mat = scene.materials[mesh.material]
    node = mat.nodes[mat.surface_node]
    assert node.inputs["diffuseColor"] == (0.2, 0.4, 0.9)


def test_proxy_purpose_skipped():
    stage = parse_usda("""#usda 1.0
def Xform "A"
{
    uniform token purpose = "proxy"
    def Mesh "M"
    {
        point3f[] points = [(0,0,0), (1,0,0), (0,1,0)]
        int[] faceVertexCounts = [3]
        int[] faceVertexIndices = [0, 1, 2]
    }
}
""")
    scene = build_scene(stage)
    assert len(scene.meshes) == 0


def test_transform_edit_skips_geometry_rebuild(monkeypatch):
    """set_mesh_transform after a render must take the incremental path
    (reference: TLAS-instance-only rebuild, Gi.cpp:1188-1202): no
    build_geometry_cached call, same image as a from-scratch scene."""
    import numpy as np

    import gatling_tpu.gi as gi
    from gatling_tpu.interface import AovId
    from gatling_tpu.scene.meshproc import build_triangulated_mesh
    from gatling_tpu.scene.stage import CameraDesc, MeshDesc

    def quad(size=1.0):
        pts = np.array([[-size, -size, 0], [size, -size, 0],
                        [-size, size, 0], [size, size, 0]], np.float32)
        return build_triangulated_mesh(pts, np.array([4]), np.array([0, 1, 3, 2]))

    def mk_scene(b_offset):
        scene = gi.create_scene()
        scene.add_mesh(MeshDesc(path="/glow", mesh=quad(3.0), transform=np.eye(4),
                                material="glow", double_sided=True, object_id=-1))
        xfb = np.eye(4)
        xfb[3, :3] = b_offset
        scene.add_mesh(MeshDesc(path="/b", mesh=quad(0.4), transform=xfb,
                                material=None, double_sided=True, object_id=-1))
        from gatling_tpu.scene.stage import MaterialDesc, ShaderNode

        node = ShaderNode(path="/glow/s", shader_id="UsdPreviewSurface",
                          inputs=dict(emissiveColor=(1.0, 1.0, 1.0),
                                      diffuseColor=(0, 0, 0)), input_connections={})
        scene.add_material(MaterialDesc(path="glow", surface_node=node.path,
                                        nodes={node.path: node}))
        return scene

    def render(scene):
        buf = gi.giCreateRenderBuffer(24, 24)
        params = gi.GiRenderParams(
            scene=scene,
            camera=CameraDesc(position=np.array([0.0, 0, 3.0]),
                              forward=np.array([0.0, 0, -1.0]),
                              up=np.array([0.0, 1, 0.0]), vfov=0.9),
            aov_bindings=[gi.GiAovBinding(aov_id=AovId.COLOR, render_buffer=buf)],
            render_settings={**gi.default_settings(), "spp": 4, "maxBounces": 2})
        gi.render(params)
        return buf.data.copy()

    scene = mk_scene([0.0, 0.0, 1.0])
    img_before = render(scene)

    calls = {"n": 0}
    real_build = gi.build_geometry_cached

    def counting_build(*a, **k):
        calls["n"] += 1
        return real_build(*a, **k)

    monkeypatch.setattr(gi, "build_geometry_cached", counting_build)

    mesh_b = scene.meshes[1]
    xf = np.eye(4)
    xf[3, :3] = [0.8, 0.8, 1.0]
    scene.set_mesh_transform(mesh_b, xf)
    img_moved = render(scene)
    assert calls["n"] == 0, "transform edit must not rebuild the geometry"

    fresh = mk_scene([0.8, 0.8, 1.0])
    img_fresh = render(fresh)
    np.testing.assert_allclose(img_moved, img_fresh, rtol=1e-5, atol=1e-6)
    assert not np.allclose(img_moved, img_before)  # the move is visible


def test_nested_point_instancers():
    """A PointInstancer inside another instancer's prototype flattens the
    cartesian product of transforms (reference: instancer.cpp:96-136
    recursive parent flattening)."""
    from gatling_tpu.scene.stage import build_scene
    from gatling_tpu.scene.usda import parse_usda

    stage = parse_usda("""#usda 1.0
def PointInstancer "Outer"
{
    point3f[] positions = [(0, 0, 0), (100, 0, 0)]
    int[] protoIndices = [0, 0]
    rel prototypes = [</Outer/Protos/Cell>]
    def Scope "Protos"
    {
        def Xform "Cell"
        {
            def PointInstancer "Inner"
            {
                point3f[] positions = [(0, 0, 0), (0, 10, 0), (0, 20, 0)]
                int[] protoIndices = [0, 0, 0]
                rel prototypes = [</Outer/Protos/Cell/Inner/P/Tri>]
                def Scope "P"
                {
                    def Mesh "Tri"
                    {
                        point3f[] points = [(0, 0, 0), (1, 0, 0), (0, 1, 0)]
                        int[] faceVertexCounts = [3]
                        int[] faceVertexIndices = [0, 1, 2]
                    }
                }
            }
        }
    }
}
""")
    scene = build_scene(stage)
    assert len(scene.meshes) == 1
    xf = scene.meshes[0].instance_transforms
    assert xf is not None and xf.shape == (6, 4, 4)
    # every (outer, inner) offset combination must appear exactly once
    origins = sorted(tuple(np.round((np.append([0.0, 0, 0], 1.0) @ m)[:3], 4))
                     for m in xf)
    expected = sorted([(0.0, 0.0, 0.0), (0.0, 10.0, 0.0), (0.0, 20.0, 0.0),
                       (100.0, 0.0, 0.0), (100.0, 10.0, 0.0), (100.0, 20.0, 0.0)])
    assert origins == expected


def test_instancer_display_color_primvar():
    """Per-instance displayColor (instancer.cpp:138-189 subset): unbound
    prototypes split into per-color fallback materials."""
    from gatling_tpu.scene.stage import build_scene
    from gatling_tpu.scene.usda import parse_usda

    stage = parse_usda("""#usda 1.0
def PointInstancer "Inst"
{
    point3f[] positions = [(0, 0, 0), (5, 0, 0), (10, 0, 0)]
    int[] protoIndices = [0, 0, 0]
    color3f[] primvars:displayColor = [(1, 0, 0), (0, 1, 0), (1, 0, 0)]
    rel prototypes = [</Inst/Protos/Tri>]
    def Scope "Protos"
    {
        def Mesh "Tri"
        {
            point3f[] points = [(0, 0, 0), (1, 0, 0), (0, 1, 0)]
            int[] faceVertexCounts = [3]
            int[] faceVertexIndices = [0, 1, 2]
        }
    }
}
""")
    scene = build_scene(stage)
    # two distinct colors -> two mesh groups with two fallback materials
    assert len(scene.meshes) == 2
    mats = {m.material for m in scene.meshes}
    assert len(mats) == 2 and None not in mats
    counts = sorted(m.instance_transforms.shape[0] for m in scene.meshes)
    assert counts == [1, 2]  # green x1, red x2
    colors = set()
    for m in scene.meshes:
        node = scene.materials[m.material].nodes[scene.materials[m.material].surface_node]
        colors.add(tuple(node.inputs["diffuseColor"]))
    assert colors == {(1.0, 0.0, 0.0), (0.0, 1.0, 0.0)}


def test_pointinstancer_reaches_instanced_fused(tmp_path):
    """A USD PointInstancer scene must qualify for the two-level instanced
    fused builder (shared prototype mesh -> unique-mesh dedup), including
    through gi's memoized mesh compression."""
    import numpy as np

    from gatling_tpu import gi as gi_mod
    from gatling_tpu.ops.pallas_bounce import build_fused_scene_instanced
    from gatling_tpu.render.material import build_material_table, lower_material
    from gatling_tpu.scene.stage import load_scene

    n = 6
    pos = ", ".join(f"({i * 2.0}, 0, 0)" for i in range(n))
    idx = ", ".join("0" for _ in range(n))
    (tmp_path / "inst.usda").write_text(f"""#usda 1.0
def Xform "Root"
{{
    def PointInstancer "PI"
    {{
        point3f[] positions = [{pos}]
        int[] protoIndices = [{idx}]
        rel prototypes = [</Root/PI/Proto>]
        def Xform "Proto"
        {{
            def Mesh "Quad"
            {{
                int[] faceVertexCounts = [4]
                int[] faceVertexIndices = [0, 1, 3, 2]
                point3f[] points = [(-1, -1, 0), (1, -1, 0), (-1, 1, 0), (1, 1, 0)]
            }}
        }}
    }}
}}
""")
    desc = load_scene(tmp_path / "inst.usda")
    # register through gi so compression memoization is exercised
    scene = gi_mod.create_scene()
    for m in desc.meshes:
        scene.add_mesh(m)
    midx = {None: 0}
    table = build_material_table([lower_material(None)])
    res = build_fused_scene_instanced(scene.meshes, midx, table, None,
                                      min_gain=2.0, min_flat=0)
    assert res is not None
    iscene, istatic = res
    assert istatic.n_instances == n
    # ONE unique mesh: 1 real cluster + the degenerate pad cluster
    assert istatic.n_clusters == 1


def test_fused_instanced_textured_parity():
    """Round 5: the two-level instanced walk runs the textured
    split-bounce kernels (uv rows ride the shared local clusters; the
    object-walk route for unique-mesh scenes like the interior).
    Distribution parity vs the wavefront."""
    import dataclasses

    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from gatling_tpu import imgio
    from gatling_tpu.interface import empty_light_arrays
    from gatling_tpu.ops.geometry import build_geometry
    from gatling_tpu.ops.pallas_bounce import build_fused_scene_instanced
    from gatling_tpu.render.fused import render_pixels_fused
    from gatling_tpu.render.integrator import (DomeLightData, RenderConfig,
                                               render_pixels)
    from gatling_tpu.render.material import (build_materials, lower_material,
                                             textured_params)
    from gatling_tpu.render.texture import TextureRef
    from gatling_tpu.scene.stage import MeshDesc
    from tests.test_volumes import _quad, _uniforms

    img = np.zeros((8, 8, 4), np.uint8)
    img[..., 3] = 255
    c = ((np.arange(8)[:, None] // 2 + np.arange(8)[None, :] // 2) % 2)
    img[..., 0] = np.where(c, 220, 60)
    img[..., 1] = np.where(c, 60, 200)
    img[..., 2] = 120
    imgio.write_image_file("/tmp/gatling_test_checker8.png", img)

    m = lower_material(None)
    m.textures["base_color"] = TextureRef(
        file_path="/tmp/gatling_test_checker8.png", is_srgb=False)
    m.params["ior"] = 1.0
    m2 = lower_material(None)
    m2.params.update(base_color=(0.9, 0.3, 0.1), ior=1.0)
    xf1 = np.eye(4)
    xf2 = np.eye(4)
    xf2[3, 0] = 0.6
    xf2[3, 2] = 0.8
    meshes = [
        MeshDesc(path="/q", mesh=_quad(0.0, size=1.2), transform=np.eye(4),
                 material="m", double_sided=True, object_id=0,
                 instance_transforms=np.stack([xf1, xf2])),
        MeshDesc(path="/w", mesh=_quad(-2.0, size=0.8), transform=np.eye(4),
                 material="m2", double_sided=True, object_id=1),
    ]
    midx = {"m": 0, "m2": 1, None: 2}
    geom = build_geometry(meshes, midx)
    rows = [m, m2, lower_material(None)]
    table, pool = build_materials(rows)
    res = build_fused_scene_instanced(meshes, midx, table, None, min_flat=0)
    assert res is not None
    fs, fstatic = res
    fstatic = dataclasses.replace(fstatic, textured=True,
                                  textured_params=textured_params(rows))
    cfg = RenderConfig(width=16, height=16, spp=12, max_bounces=3,
                       has_dome=True)
    dome = DomeLightData(texture=jnp.full((1, 1, 3), 1.0, jnp.float32),
                         fallback=jnp.zeros((1, 1, 3), jnp.float32))
    pix = jnp.arange(256, dtype=jnp.int32)
    uni = _uniforms()._replace(
        dome_emission_multiplier=jnp.ones(3, jnp.float32))
    with pltpu.force_tpu_interpret_mode():
        fused = np.asarray(render_pixels_fused(
            cfg, uni, fs, dome, pix, 12, jnp.int32(0), static=fstatic,
            materials=table, textures=pool))
    gen = np.asarray(render_pixels(
        cfg, uni, geom, table, empty_light_arrays(), dome, pix, 12,
        jnp.int32(0), textures=pool).color)
    f = fused.reshape(16, 16, 3)
    g = gen.reshape(16, 16, 3)
    assert np.isfinite(f).all() and (f >= 0).all()
    rel = abs(f.mean() - g.mean()) / max(g.mean(), 1e-6)
    fd = f.reshape(4, 4, 4, 4, 3).mean(axis=(1, 3)).ravel()
    gd = g.reshape(4, 4, 4, 4, 3).mean(axis=(1, 3)).ravel()
    corr = np.corrcoef(fd, gd)[0, 1]
    assert rel < 0.15 and corr > 0.9, (rel, corr)
