"""UsdSkel LBS at load (scene/skel.py — the extComputation-points analog,
reference hdGatling mesh.cpp:852-890)."""
import numpy as np
import pytest

from gatling_tpu.scene.stage import load_scene

S2 = 0.7071068

SKEL_USDA = """#usda 1.0
(
    defaultPrim = "Root"
    startTimeCode = 1
    endTimeCode = 2
)
def SkelRoot "Root"
{
    def Skeleton "Skel" (
        prepend apiSchemas = ["SkelBindingAPI"]
    )
    {
        uniform token[] joints = ["root", "root/tip"]
        uniform matrix4d[] bindTransforms = [
            ( (1,0,0,0), (0,1,0,0), (0,0,1,0), (0,0,0,1) ),
            ( (1,0,0,0), (0,1,0,0), (0,0,1,0), (0,0,0,1) ) ]
        uniform matrix4d[] restTransforms = [
            ( (1,0,0,0), (0,1,0,0), (0,0,1,0), (0,0,0,1) ),
            ( (1,0,0,0), (0,1,0,0), (0,0,1,0), (0,0,0,1) ) ]
        rel skel:animationSource = </Root/Skel/Anim>
        def SkelAnimation "Anim"
        {
            uniform token[] joints = ["root/tip"]
            float3[] translations.timeSamples = {
                1: [(0, 0, 0)],
                2: [(0, 0, 0)],
            }
            quatf[] rotations.timeSamples = {
                1: [(1, 0, 0, 0)],
                2: [(%(s2)s, 0, 0, %(s2)s)],
            }
            half3[] scales.timeSamples = {
                1: [(1, 1, 1)],
                2: [(1, 1, 1)],
            }
        }
    }
    def Mesh "Strip" (
        prepend apiSchemas = ["SkelBindingAPI"]
    )
    {
        rel skel:skeleton = </Root/Skel>
        point3f[] points = [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0)]
        int[] faceVertexCounts = [4]
        int[] faceVertexIndices = [0, 1, 2, 3]
        int[] primvars:skel:jointIndices = [0, 1, 1, 0] (
            elementSize = 1
            interpolation = "vertex"
        )
        float[] primvars:skel:jointWeights = [1, 1, 1, 1] (
            elementSize = 1
            interpolation = "vertex"
        )
    }
}
""" % {"s2": S2}


def _strip_points(scene):
    m = next(m for m in scene.meshes if m.path.endswith("Strip"))
    return np.asarray(m.mesh.points if hasattr(m.mesh, "points")
                      else m.mesh.positions)


def _loaded_vertices(scene):
    """Unique vertex positions of the (triangulated) strip mesh."""
    m = next(m for m in scene.meshes if m.path.endswith("Strip"))
    tri = m.mesh
    v = np.asarray(tri.positions if hasattr(tri, "positions")
                   else tri.points, np.float32).reshape(-1, 3)
    return np.unique(np.round(v, 4), axis=0)


def test_rest_pose_at_frame_1(tmp_path):
    f = tmp_path / "skel.usda"
    f.write_text(SKEL_USDA)
    scene = load_scene(str(f), frame=1.0)
    v = _loaded_vertices(scene)
    expect = np.unique(np.asarray(
        [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0)], np.float32), axis=0)
    np.testing.assert_allclose(v, expect, atol=1e-4)


def test_animated_pose_at_frame_2(tmp_path):
    """90-degree Z rotation on root/tip: its two bound points rotate,
    the root-bound points stay."""
    f = tmp_path / "skel.usda"
    f.write_text(SKEL_USDA)
    scene = load_scene(str(f), frame=2.0)
    v = _loaded_vertices(scene)
    expect = np.unique(np.round(np.asarray(
        [(0, 0, 0), (0, 1, 0), (-1, 1, 0), (0, 1, 0)], np.float32), 4),
        axis=0)
    np.testing.assert_allclose(v, expect, atol=1e-4)


def test_rigid_constant_binding(tmp_path):
    """elementSize-k constant-interp indices bind the WHOLE mesh rigidly."""
    text = SKEL_USDA.replace(
        'int[] primvars:skel:jointIndices = [0, 1, 1, 0] (\n'
        '            elementSize = 1\n'
        '            interpolation = "vertex"\n'
        '        )',
        'int[] primvars:skel:jointIndices = [1] (\n'
        '            elementSize = 1\n'
        '            interpolation = "constant"\n'
        '        )').replace(
        'float[] primvars:skel:jointWeights = [1, 1, 1, 1] (\n'
        '            elementSize = 1\n'
        '            interpolation = "vertex"\n'
        '        )',
        'float[] primvars:skel:jointWeights = [1] (\n'
        '            elementSize = 1\n'
        '            interpolation = "constant"\n'
        '        )')
    assert "= [1] (" in text
    f = tmp_path / "rigid.usda"
    f.write_text(text)
    scene = load_scene(str(f), frame=2.0)
    v = _loaded_vertices(scene)
    expect = np.unique(np.round(np.asarray(
        [(0, 0, 0), (0, 1, 0), (-1, 1, 0), (-1, 0, 0)], np.float32), 4),
        axis=0)
    np.testing.assert_allclose(v, expect, atol=1e-4)


def test_unbound_mesh_untouched(tmp_path):
    """A mesh without SkelBindingAPI data loads its authored points."""
    text = SKEL_USDA.replace("rel skel:skeleton = </Root/Skel>\n", "")
    f = tmp_path / "plain.usda"
    f.write_text(text)
    scene = load_scene(str(f), frame=2.0)
    v = _loaded_vertices(scene)
    expect = np.unique(np.asarray(
        [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0)], np.float32), axis=0)
    np.testing.assert_allclose(v, expect, atol=1e-4)


def test_skel_through_usdc_crate(tmp_path):
    """Skeleton/SkelAnimation attrs (matrix4d[] bind/restTransforms, quatf[]
    timeSamples, rels) survive the crate writer and skin identically."""
    from gatling_tpu.scene.crate import write_usdc
    from gatling_tpu.scene.usda import parse_usda

    stage = parse_usda(SKEL_USDA, compose=False)
    p = tmp_path / "skel.usdc"
    p.write_bytes(write_usdc(stage))
    scene = load_scene(str(p), frame=2.0)
    v = _loaded_vertices(scene)
    expect = np.unique(np.round(np.asarray(
        [(0, 0, 0), (0, 1, 0), (-1, 1, 0), (0, 1, 0)], np.float32), 4),
        axis=0)
    np.testing.assert_allclose(v, expect, atol=1e-4)


def test_blend_shape_offsets(tmp_path):
    """skel:blendShapes apply as pre-LBS point offsets weighted by the
    SkelAnimation's blendShapeWeights at the frame (UsdSkelImaging's
    skinning computation includes shapes — the reference renders them)."""
    text = SKEL_USDA.replace(
        'rel skel:skeleton = </Root/Skel>',
        '''rel skel:skeleton = </Root/Skel>
        uniform token[] skel:blendShapes = ["puff"]
        rel skel:blendShapeTargets = [</Root/Strip/Puff>]
        def BlendShape "Puff"
        {
            uniform vector3f[] offsets = [(0, 0, 2)]
            uniform int[] pointIndices = [0]
        }''').replace(
        'half3[] scales.timeSamples = {',
        '''uniform token[] blendShapes = ["puff"]
            float[] blendShapeWeights.timeSamples = {
                1: [0],
                2: [0.5],
            }
            half3[] scales.timeSamples = {''')
    f = tmp_path / "bs.usda"
    f.write_text(text)
    # frame 1: zero weight -> rest positions
    v1 = _loaded_vertices(load_scene(str(f), frame=1.0))
    assert (np.abs(v1[:, 2]) < 1e-4).all()
    # frame 2: point 0 (joint-0 bound, unrotated) lifts by 0.5 * 2 in z
    v2 = _loaded_vertices(load_scene(str(f), frame=2.0))
    lifted = v2[np.abs(v2[:, 2] - 1.0) < 1e-4]
    assert len(lifted) == 1
    np.testing.assert_allclose(lifted[0], [0, 0, 1], atol=1e-4)
