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
