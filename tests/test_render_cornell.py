"""End-to-end integration tests: render the reference's in-tree Cornell box
scene (/root/reference/cornell.usda) on the CPU backend and validate image
statistics — the analog of the reference's lavapipe graphical tests
(SURVEY.md §4)."""

import numpy as np
import pytest

from gatling_tpu import gi
from gatling_tpu.cli import render_scene_file
from gatling_tpu.interface import AovId
from gatling_tpu.scene.stage import load_scene
from gatling_tpu.utils.config import default_settings

CORNELL = "/root/reference/cornell.usda"
W = H = 96


@pytest.fixture(scope="module")
def cornell_render():
    s = default_settings()
    s.update(spp=32, maxBounces=4)
    img, scene = render_scene_file(CORNELL, W, H, s)
    return img, scene


def test_no_nans_or_negatives(cornell_render):
    img, _ = cornell_render
    assert np.isfinite(img).all()
    assert (img >= 0).all()


def test_light_region_bright(cornell_render):
    img, _ = cornell_render
    # The emissive ceiling panel (z~0.98..1, emission (8.5,6,4)) must be the
    # brightest region, in the upper part of the image (row index grows
    # upward: pixel y follows the camera 'up' axis).
    lum = img[..., :3].mean(-1)
    iy, ix = np.unravel_index(lum.argmax(), lum.shape)
    assert iy > H * 0.6
    assert lum.max() > 5.0


def test_wall_colors(cornell_render):
    img, _ = cornell_render
    # the frustum is wider than the box opening: the outermost ~6% of
    # columns miss the scene entirely (black border, present in the
    # reference render too), so sample just inside it.
    mid = img[int(H * 0.4):int(H * 0.6)]
    left = mid[:, int(W * 0.07): int(W * 0.15), :3].mean(axis=(0, 1))
    right = mid[:, int(W * 0.85): int(W * 0.93), :3].mean(axis=(0, 1))
    # red wall on the left: r dominates; green wall on the right: g dominates
    assert left[0] > 2.0 * left[1] and left[0] > 2.0 * left[2]
    assert right[1] > 2.0 * right[0] and right[1] > 2.0 * right[2]


def test_interior_receives_light(cornell_render):
    img, _ = cornell_render
    center = img[int(H * 0.3):int(H * 0.7), int(W * 0.3):int(W * 0.7), :3]
    assert center.mean() > 0.05  # indirect lighting fills the box


def test_progressive_accumulation_reduces_noise():
    s = default_settings()
    s.update(spp=4, maxBounces=3)
    desc = load_scene(CORNELL)
    scene = gi.create_scene()
    for m in desc.meshes:
        scene.add_mesh(m)
    for mat in desc.materials.values():
        scene.add_material(mat)
    buf = gi.GiRenderBuffer(48, 48, 4)
    params = gi.GiRenderParams(
        scene=scene, camera=desc.first_camera(),
        aov_bindings=[gi.GiAovBinding(AovId.COLOR, buf)], render_settings=s)

    gi.render(params)
    img1 = buf.data.copy()
    assert scene.sample_offset == 4
    for _ in range(7):
        gi.render(params)  # progressive: accumulates, offset grows
    img8 = buf.data.copy()
    assert scene.sample_offset == 32
    # means agree (unbiased), variance shrinks
    assert abs(img1[..., :3].mean() - img8[..., :3].mean()) < 0.05
    # high-frequency noise metric: mean abs horizontal gradient
    g1 = np.abs(np.diff(img1[..., :3], axis=1)).mean()
    g8 = np.abs(np.diff(img8[..., :3], axis=1)).mean()
    assert g8 < g1 * 0.75


def test_camera_move_resets_accumulation():
    s = default_settings()
    s.update(spp=1, maxBounces=2)
    desc = load_scene(CORNELL)
    scene = gi.create_scene()
    for m in desc.meshes:
        scene.add_mesh(m)
    for mat in desc.materials.values():
        scene.add_material(mat)
    buf = gi.GiRenderBuffer(32, 32, 4)
    cam = desc.first_camera()
    params = gi.GiRenderParams(
        scene=scene, camera=cam,
        aov_bindings=[gi.GiAovBinding(AovId.COLOR, buf)], render_settings=s)
    gi.render(params)
    gi.render(params)
    assert scene.sample_offset == 2
    cam.position = cam.position + np.array([0.1, 0, 0], np.float32)
    gi.render(params)  # dirty framebuffer -> reset (Gi.cpp:1953-1956)
    assert scene.sample_offset == 1


def test_id_and_normal_aovs():
    s = default_settings()
    s.update(spp=1, maxBounces=2, jitteredSampling=False)
    desc = load_scene(CORNELL)
    scene = gi.create_scene()
    for m in desc.meshes:
        scene.add_mesh(m)
    for mat in desc.materials.values():
        scene.add_material(mat)
    col = gi.GiRenderBuffer(48, 48, 4)
    nrm = gi.GiRenderBuffer(48, 48, 3)
    oid = gi.GiRenderBuffer(48, 48, 1, is_int=True)
    depth = gi.GiRenderBuffer(48, 48, 1)
    params = gi.GiRenderParams(
        scene=scene, camera=desc.first_camera(),
        aov_bindings=[
            gi.GiAovBinding(AovId.COLOR, col),
            gi.GiAovBinding(AovId.NORMAL, nrm),
            gi.GiAovBinding(AovId.OBJECT_ID, oid, clear_value=-1),
            gi.GiAovBinding(AovId.DEPTH, depth),
        ],
        render_settings=s)
    gi.render(params)
    # interior pixels hit geometry; border pixels miss (frustum wider than
    # the box opening) and keep the clear value
    # 11px margin: the border band misses, and pixels right at the band edge
    # can graze wall seams (the reference tests tolerate error pixels too)
    interior = oid.data[11:-11, 11:-11]
    assert (interior >= 0).all()
    assert oid.data[0, 0] == -1 and oid.data[-1, -1] == -1
    assert interior.max() >= 5  # several distinct meshes visible
    # normals are encoded (n+1)/2 and normalized where hit
    n = (nrm.data * 2.0 - 1.0)[11:-11, 11:-11]
    lens = np.linalg.norm(n, axis=-1)
    assert np.abs(lens - 1.0).max() < 1e-3
    # back wall normal points towards camera (-y)
    center = n[10:16, 10:16]
    assert center[..., 1].mean() < -0.8
    assert np.isfinite(depth.data).all()


def test_animated_material_relowered_on_frame_change():
    """frame/time nodes: changing the `frame` render setting re-lowers the
    material table (traits.is_animated) and resets accumulation — the
    Materials.MtlxFrame behavior (reference: MtlxMdlCodeGen.cpp:116-144)."""
    from gatling_tpu.scene.stage import (CameraDesc, MaterialDesc, MeshDesc,
                                         ShaderNode)
    from gatling_tpu.scene.meshproc import build_triangulated_mesh

    pts = np.array([[-1, -1, 0], [1, -1, 0], [-1, 1, 0], [1, 1, 0]], np.float32)
    mesh = MeshDesc(
        path="/q",
        mesh=build_triangulated_mesh(pts, np.array([4]), np.array([0, 1, 3, 2])),
        transform=np.eye(4), material="/mat", double_sided=True, object_id=0)
    nodes = {
        "/mat/s": ShaderNode(
            path="/mat/s", shader_id="UsdPreviewSurface", inputs={},
            input_connections={"emissiveColor": ("/mat/mul", "out")}),
        "/mat/mul": ShaderNode(
            path="/mat/mul", shader_id="ND_multiply_color3",
            inputs={"in2": (0.01, 0.0, 0.0)},
            input_connections={"in1": ("/mat/f", "out")}),
        "/mat/f": ShaderNode(path="/mat/f", shader_id="ND_frame_float",
                             inputs={}, input_connections={}),
    }
    mat = MaterialDesc(path="/mat", surface_node="/mat/s", nodes=nodes)

    s = default_settings()
    s.update(spp=1, maxBounces=1, frame=0.0)
    scene = gi.create_scene()
    scene.add_mesh(mesh)
    scene.add_material(mat)
    cam = CameraDesc(position=np.array([0, 0, 2], np.float32),
                     forward=np.array([0, 0, -1], np.float32),
                     up=np.array([0, 1, 0], np.float32), vfov=1.2)
    buf = gi.GiRenderBuffer(16, 16, 4)
    params = gi.GiRenderParams(
        scene=scene, camera=cam,
        aov_bindings=[gi.GiAovBinding(AovId.COLOR, buf)], render_settings=s)

    gi.render(params)
    gi.render(params)
    assert scene.sample_offset == 2
    dark = buf.data[..., 0].mean()
    assert scene._lowered_frame == 0.0

    s["frame"] = 50.0
    gi.render(params)
    assert scene.sample_offset == 1  # frame change reset accumulation
    assert scene._lowered_frame == 50.0
    bright = buf.data[..., 0].mean()
    # emission = frame * 0.01: frame 50 must be distinctly brighter
    assert bright > dark + 0.2
