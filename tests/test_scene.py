"""USDA parser / scene builder / mesh processing tests."""

import numpy as np
import pytest

from gatling_tpu.scene import meshproc
from gatling_tpu.scene.stage import load_scene, local_transform
from gatling_tpu.scene.usda import parse_usda

CORNELL = "/root/reference/cornell.usda"


def test_cornell_parses():
    sc = load_scene(CORNELL)
    assert len(sc.meshes) == 8
    assert sum(m.mesh.num_triangles for m in sc.meshes) == 46
    assert len(sc.materials) == 4
    cam = sc.first_camera()
    assert cam is not None
    np.testing.assert_allclose(cam.position, [0, -7, 0], atol=1e-6)
    np.testing.assert_allclose(cam.forward, [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(cam.up, [0, 0, 1], atol=1e-6)
    # vfov = 2*atan(2.025/(2*5.0))
    assert abs(np.degrees(cam.vfov) - 22.8952) < 1e-3


def test_cornell_material_inputs():
    sc = load_scene(CORNELL)
    light = sc.materials["/Root/Materials/Light"]
    node = light.nodes[light.surface_node]
    assert node.shader_id == "UsdPreviewSurface"
    assert node.inputs["emissiveColor"] == (8.5, 6, 4)


def test_mesh_transform_applied():
    sc = load_scene(CORNELL)
    box1 = next(m for m in sc.meshes if m.path.endswith("Box1"))
    # Box1 transform scales z by 0.7 and translates by (-0.35, 0.35, -0.3)
    assert abs(box1.transform[2, 2] - 0.7) < 1e-5
    assert abs(box1.transform[3, 0] + 0.35) < 1e-5


def test_triangulate_quad_and_pentagon():
    sel, fid = meshproc.triangulate_counts(np.array([4, 5]))
    assert sel.shape == (2 + 3, 3)
    assert list(fid) == [0, 0, 1, 1, 1]
    np.testing.assert_array_equal(sel[0], [0, 1, 2])
    np.testing.assert_array_equal(sel[1], [0, 2, 3])
    np.testing.assert_array_equal(sel[2], [4, 5, 6])


def test_smooth_normals_on_quad():
    # flat quad in xy plane -> all normals +z
    pts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    tri = meshproc.build_triangulated_mesh(pts, np.array([4]), np.array([0, 1, 2, 3]))
    np.testing.assert_allclose(tri.normals, [[0, 0, 1]] * 6, atol=1e-6)


def test_face_varying_normals():
    pts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    nrm = np.tile([[0.0, 0.0, 1.0]], (4, 1)).astype(np.float32)
    tri = meshproc.build_triangulated_mesh(
        pts, np.array([4]), np.array([0, 1, 2, 3]),
        normals=nrm, normals_interp=meshproc.Interpolation.FACE_VARYING)
    assert tri.num_triangles == 2
    np.testing.assert_allclose(tri.normals[:, 2], 1.0)


def test_tangents_orthogonal_to_normals():
    pts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    tri = meshproc.build_triangulated_mesh(
        pts, np.array([4]), np.array([0, 1, 2, 3]),
        uvs=uv, uvs_interp=meshproc.Interpolation.VERTEX)
    dots = (tri.tangents * tri.normals).sum(-1)
    assert np.abs(dots).max() < 1e-5
    # tangent should follow +u direction == +x
    np.testing.assert_allclose(tri.tangents, [[1, 0, 0]] * 6, atol=1e-5)


def test_left_handed_flips_winding():
    pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    right = meshproc.build_triangulated_mesh(pts, np.array([3]), np.array([0, 1, 2]))
    left = meshproc.build_triangulated_mesh(pts, np.array([3]), np.array([0, 1, 2]), left_handed=True)
    # geometric normal (from winding) flips; smooth normals follow
    assert right.normals[0, 2] * left.normals[0, 2] < 0


def test_xform_op_order():
    stage = parse_usda("""#usda 1.0
def Xform "A"
{
    double3 xformOp:translate = (1, 0, 0)
    float3 xformOp:scale = (2, 2, 2)
    uniform token[] xformOpOrder = ["xformOp:translate", "xformOp:scale"]
}
""")
    m = local_transform(stage.find("/A"))
    # scale applied first, then translate: p=(1,0,0) -> (2,0,0) -> (3,0,0)
    p = np.append([1.0, 0, 0], 1.0) @ m
    np.testing.assert_allclose(p[:3], [3, 0, 0])


def test_empty_variant_set_parses():
    # variant sets are supported now (test_usdc.py covers composition);
    # an empty set simply contributes nothing
    s = parse_usda('#usda 1.0\ndef Xform "A" { variantSet "x" = {} }')
    assert s.find("/A") is not None
    assert not s.find("/A").children


def test_references_compose(tmp_path):
    (tmp_path / "lib.usda").write_text("""#usda 1.0
(
    defaultPrim = "Cube"
)
def Mesh "Cube"
{
    point3f[] points = [(0,0,0), (1,0,0), (0,1,0)]
    int[] faceVertexCounts = [3]
    int[] faceVertexIndices = [0, 1, 2]
}
""")
    (tmp_path / "main.usda").write_text("""#usda 1.0
def "Instance" (
    references = @./lib.usda@
)
{
}
""")
    sc = load_scene(tmp_path / "main.usda")
    assert len(sc.meshes) == 1
    assert sc.meshes[0].mesh.num_triangles == 1


def test_c_style_light_api():
    """The full analytic-light C surface (Gi.h:223-257): create/setters
    flow into the packed light tables with the explicit frame (positions,
    tangents, radii given directly, not via a USD transform)."""
    import numpy as np

    from gatling_tpu import gi
    from gatling_tpu.render.lights import build_light_arrays

    scene = gi.giCreateScene()

    s = gi.giCreateSphereLight(scene)
    gi.giSetSphereLightPosition(s, (1.0, 2.0, 3.0))
    gi.giSetSphereLightBaseEmission(s, (2.0, 3.0, 4.0))
    gi.giSetSphereLightRadius(s, 0.5, 0.6, 0.7)
    gi.giSetSphereLightDiffuseSpecular(s, 0.8, 0.9)

    d = gi.giCreateDistantLight(scene)
    gi.giSetDistantLightDirection(d, (0.0, -1.0, 0.0))
    gi.giSetDistantLightAngle(d, 0.1)

    r = gi.giCreateRectLight(scene)
    gi.giSetRectLightOrigin(r, (0.0, 0.0, 5.0))
    gi.giSetRectLightTangents(r, (0.0, 1.0, 0.0), (1.0, 0.0, 0.0))
    gi.giSetRectLightDimensions(r, 2.0, 3.0)

    k = gi.giCreateDiskLight(scene)
    gi.giSetDiskLightRadius(k, 0.25, 0.5)

    arrays = build_light_arrays(scene.lights)
    assert int(arrays.sphere_count) == 1 and int(arrays.distant_count) == 1
    assert int(arrays.rect_count) == 1 and int(arrays.disk_count) == 1
    np.testing.assert_allclose(np.asarray(arrays.sphere_pos[0]), (1, 2, 3))
    np.testing.assert_allclose(np.asarray(arrays.sphere_emission[0]), (2, 3, 4))
    np.testing.assert_allclose(np.asarray(arrays.sphere_radius[0]), (0.5, 0.6, 0.7))
    np.testing.assert_allclose(np.asarray(arrays.sphere_diff_spec[0]), (0.8, 0.9))
    np.testing.assert_allclose(np.asarray(arrays.distant_dir[0]), (0, -1, 0))
    np.testing.assert_allclose(float(arrays.distant_angle[0]), 0.1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(arrays.rect_origin[0]), (0, 0, 5))
    np.testing.assert_allclose(np.asarray(arrays.rect_t0[0]), (0, 1, 0))
    np.testing.assert_allclose(np.asarray(arrays.rect_size[0]), (2, 3))
    np.testing.assert_allclose(np.asarray(arrays.disk_radius[0]), (0.25, 0.5))

    gi.giDestroySphereLight(scene, s)
    gi.giDestroyDistantLight(scene, d)
    gi.giDestroyRectLight(scene, r)
    gi.giDestroyDiskLight(scene, k)
    assert scene.lights == []

    dome = gi.giCreateDomeLight(scene, "/nonexistent.hdr")
    gi.giSetDomeLightRotation(dome, (0, 0, 0, 1))
    gi.giSetDomeLightBaseEmission(dome, (2.0, 2.0, 2.0))
    gi.giSetDomeLightDiffuseSpecular(dome, 0.5, 0.25)
    assert dome.diffuse == 0.5 and dome.specular == 0.25


def test_simple_light_approximated_as_sphere():
    """HdSimpleLight maps to a point-like sphere light (reference
    light.cpp: 'simple light approximated')."""
    import numpy as np

    from gatling_tpu.render.lights import build_light_arrays
    from gatling_tpu.scene.stage import LightDesc

    xf = np.eye(4)
    xf[3, :3] = [1.0, 2.0, 3.0]
    la = build_light_arrays([LightDesc(
        path="/s", light_type="simple", transform=xf,
        params=dict(intensity=2.0, exposure=0.0,
                    color=np.array([1.0, 1.0, 1.0], np.float32),
                    diffuse=1.0, specular=1.0,
                    enableColorTemperature=False, colorTemperature=6500.0))])
    assert int(la.sphere_count) == 1
    np.testing.assert_allclose(np.asarray(la.sphere_pos[0]), [1, 2, 3],
                               atol=1e-6)
