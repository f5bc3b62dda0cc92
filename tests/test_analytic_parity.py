"""Analytic image-parity harness.

The reference's graphical tests diff against renders committed from the
reference renderer (src/hdGatling/main.cpp:332-509 + testenv/ref*.png).
Those assets are git-lfs pointers in this offline checkout, so the ground
truth here is ANALYTIC instead: closed-form radiometry (furnace test,
sphere/disk/distant-light irradiance) and independent numpy projection math
for the geometric AOVs. None of the expected values below are produced by
the renderer under test — this is the non-circular complement to the
regression images in gatling_tpu/testing.py.
"""

import math

import numpy as np
import jax.numpy as jnp

from gatling_tpu.interface import AovId, aov_bit, empty_light_arrays
from gatling_tpu.ops.geometry import build_geometry
from gatling_tpu.render.camera import CameraUniforms
from gatling_tpu.render.integrator import (
    DomeLightData,
    RenderConfig,
    Uniforms,
    default_dome,
    render_pixels,
)
from gatling_tpu.render.lights import build_light_arrays
from gatling_tpu.render.material import (
    LoweredMaterial,
    MaterialTraits,
    _DEFAULTS,
    build_material_table,
    lower_material,
)
from gatling_tpu.scene.examples import _uv_sphere
from gatling_tpu.scene.meshproc import build_triangulated_mesh
from gatling_tpu.scene.stage import LightDesc, MeshDesc


def _uniforms(position, forward, vfov=0.35):
    fwd = np.asarray(forward, np.float64)
    fwd = fwd / np.linalg.norm(fwd)
    up = [0.0, 1.0, 0.0] if abs(fwd[1]) < 0.9 else [1.0, 0.0, 0.0]
    return Uniforms(
        camera=CameraUniforms(
            position=jnp.asarray(position, jnp.float32),
            forward=jnp.asarray(fwd, jnp.float32),
            up=jnp.asarray(up, jnp.float32),
            vfov=jnp.float32(vfov),
            lens_radius=jnp.float32(0), focus_distance=jnp.float32(0),
            sensor_exposure=jnp.float32(0),
            clip_start=jnp.float32(0.01), clip_end=jnp.float32(1000.0)),
        sample_offset=jnp.int32(0),
        inv_total_sample_count=jnp.float32(1.0),
        max_sample_value=jnp.float32(1000.0),
        rr_inv_min_term_prob=jnp.float32(0.95),
        light_intensity_multiplier=jnp.float32(1.0),
        meters_per_scene_unit=jnp.float32(1.0),
        max_volume_walk_length=jnp.int32(7),
        dome_rotation=jnp.asarray([0, 0, 0, 1.0], jnp.float32),
        dome_emission_multiplier=jnp.ones(3, jnp.float32),
        dome_diffuse_specular=jnp.ones(2, jnp.float32),
    )


def _diffuse(albedo) -> LoweredMaterial:
    m = LoweredMaterial(params=dict(_DEFAULTS), traits=MaterialTraits(), textures={})
    m.params.update(base_color=tuple(albedo), metallic=0.0, roughness=1.0)
    return m


def _plane_scene(albedo=(0.6, 0.6, 0.6)):
    """Lambertian plane z=0 spanning [-50,50]^2, normal +z. Lights sit on
    +z with their UsdLux DEFAULT orientation (forward -z): rotating lights
    would zero the reference's axis-component size extraction
    (light.cpp:240-244, mirrored in render/lights.py)."""
    pts = np.array([[-50, -50, 0], [50, -50, 0], [-50, 50, 0], [50, 50, 0]], np.float32)
    mesh = build_triangulated_mesh(pts, np.array([4]), np.array([0, 1, 3, 2]))
    meshes = [MeshDesc(path="/p", mesh=mesh, transform=np.eye(4),
                       material="m", double_sided=True, object_id=0)]
    geom = build_geometry(meshes, {"m": 0, None: 1})
    table = build_material_table([_diffuse(albedo), lower_material(None)])
    return geom, table


def _render(geom, table, uni, lights=None, dome=None, spp=128, nee=False,
            max_bounces=2, w=16, h=16):
    cfg = RenderConfig(width=w, height=h, spp=spp, max_bounces=max_bounces,
                       nee=nee, jittered=False, fis=False,
                       has_dome=dome is not None, rr_bounce_offset=100)
    pix = jnp.arange(w * h, dtype=jnp.int32)
    res = render_pixels(cfg, uni, geom, table,
                        lights if lights is not None else empty_light_arrays(),
                        dome if dome is not None else default_dome(),
                        pix, spp, jnp.int32(0))
    return np.asarray(res.color).reshape(h, w, 3)


def test_furnace_lambertian_sphere():
    """White-furnace theorem: a convex Lambertian body of albedo rho inside
    a uniform dome of radiance L reflects exactly rho*L — cosine-hemisphere
    sampling never re-hits a convex body, so the single-bounce value is
    closed-form. Checks BSDF energy normalization + dome integration."""
    rho, L = 0.6, 1.0
    pts, counts, idx = _uv_sphere(32, 32)
    mesh = build_triangulated_mesh(pts, counts, idx)
    meshes = [MeshDesc(path="/s", mesh=mesh, transform=np.eye(4),
                       material="m", double_sided=False, object_id=0)]
    geom = build_geometry(meshes, {"m": 0, None: 1})
    table = build_material_table([_diffuse((rho,) * 3), lower_material(None)])
    dome = DomeLightData(texture=jnp.full((1, 1, 3), L, jnp.float32),
                         fallback=jnp.zeros((1, 1, 3), jnp.float32))
    uni = _uniforms([0, 0, 4.0], [0, 0, -1], vfov=0.5)
    img = _render(geom, table, uni, dome=dome, spp=96, max_bounces=3)
    center = img[6:10, 6:10].mean(axis=(0, 1))
    np.testing.assert_allclose(center, [rho * L] * 3, rtol=0.04)
    # background pixels see the dome directly
    assert abs(img[0, 0].mean() - L) < 1e-3


def test_sphere_light_irradiance():
    """Closed form: a sphere of uniform radiance Le and radius r at height d
    above a Lambertian plane (albedo rho) gives, at the point directly
    underneath, reflected radiance rho * Le * (r/d)^2 — times an EXTRA
    factor rho: the reference weights NEE by the throughput AFTER this
    bounce's bsdf_over_pdf update (rp_main.chit:385 then :433), which for a
    cosine-sampled Lambertian equals the albedo. The quirk is reproduced
    bit-for-bit for parity (integrator.py module docstring)."""
    rho, Le, r, d = 0.5, 3.0, 0.5, 4.0
    geom, table = _plane_scene((rho,) * 3)
    xf = np.eye(4)
    xf[3, :3] = [0.0, 0.0, d]
    lights = build_light_arrays([LightDesc(
        path="/l", light_type="sphere", transform=xf,
        params=dict(intensity=Le, exposure=0.0,
                    color=np.array([1, 1, 1], np.float32), normalize=False,
                    diffuse=1.0, specular=1.0, enableColorTemperature=False,
                    colorTemperature=6500.0, radius=r, treatAsPoint=False))])
    # camera slightly above, looking straight down at the point under the light
    uni = _uniforms([0.0, 0.0, 1.0], [0, 0, -1], vfov=0.08)
    img = _render(geom, table, uni, lights=lights, spp=256, nee=True, max_bounces=1)
    expected = rho * (rho * Le * (r / d) ** 2)  # leading rho = NEE quirk
    center = img[6:10, 6:10].mean()
    np.testing.assert_allclose(center, expected, rtol=0.06)


def test_disk_light_irradiance():
    """Closed form: a disk of radius r and radiance Le at height d over the
    point: E = pi * Le * r^2 / (r^2 + d^2); reflected radiance rho*E/pi."""
    rho, Le, r, d = 0.5, 2.0, 1.0, 3.0
    geom, table = _plane_scene((rho,) * 3)
    xf = np.eye(4)  # UsdLux disk default forward is -Z: toward the plane
    xf[3, :3] = [0.0, 0.0, d]
    lights = build_light_arrays([LightDesc(
        path="/l", light_type="disk", transform=xf,
        params=dict(intensity=Le, exposure=0.0,
                    color=np.array([1, 1, 1], np.float32), normalize=False,
                    diffuse=1.0, specular=1.0, enableColorTemperature=False,
                    colorTemperature=6500.0, radius=r))])
    uni = _uniforms([0.0, 0.0, 1.0], [0, 0, -1], vfov=0.08)
    img = _render(geom, table, uni, lights=lights, spp=256, nee=True, max_bounces=1)
    expected = rho * (rho * Le * r * r / (r * r + d * d))  # NEE quirk factor
    center = img[6:10, 6:10].mean()
    np.testing.assert_allclose(center, expected, rtol=0.06)


def test_distant_light_radiance():
    """A distant light (angle 0, normalize off) of emission Le straight down
    onto a Lambertian plane: reflected radiance = rho * Le / pi (the
    reference's directional-light convention, light.cpp:168-186), times
    the NEE throughput-quirk factor rho."""
    rho, Le = 0.7, 2.0
    geom, table = _plane_scene((rho,) * 3)
    xf = np.eye(4)  # UsdLux distant default travels -Z: onto the plane
    lights = build_light_arrays([LightDesc(
        path="/l", light_type="distant", transform=xf,
        params=dict(intensity=Le, exposure=0.0,
                    color=np.array([1, 1, 1], np.float32), normalize=False,
                    diffuse=1.0, specular=1.0, enableColorTemperature=False,
                    colorTemperature=6500.0, angle=0.0))])
    uni = _uniforms([0.0, 0.0, 1.0], [0, 0, -1], vfov=0.08)
    img = _render(geom, table, uni, lights=lights, spp=64, nee=True, max_bounces=1)
    expected = rho * (rho * Le / math.pi)  # NEE quirk factor
    center = img[6:10, 6:10].mean()
    np.testing.assert_allclose(center, expected, rtol=0.05)


def test_geometric_aovs_against_projection_math():
    """Depth and texcoord AOVs of a screen-filling quad, checked against an
    INDEPENDENT numpy pinhole projection (not the renderer's camera code)."""
    z_wall = -5.0
    pts = np.array([[-20, -20, z_wall], [20, -20, z_wall],
                    [-20, 20, z_wall], [20, 20, z_wall]], np.float32)
    uv = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], np.float32)
    from gatling_tpu.scene.meshproc import Interpolation

    mesh = build_triangulated_mesh(pts, np.array([4]), np.array([0, 1, 3, 2]),
                                   uvs=uv, uvs_interp=Interpolation.VERTEX)
    meshes = [MeshDesc(path="/w", mesh=mesh, transform=np.eye(4),
                       material=None, double_sided=True, object_id=7)]
    geom = build_geometry(meshes, {None: 0})
    table = build_material_table([lower_material(None)])

    w = h = 16
    vfov = 0.6
    cfg = RenderConfig(
        width=w, height=h, spp=1, max_bounces=1, jittered=False, fis=False,
        rr_bounce_offset=100,
        aov_mask=(aov_bit(AovId.COLOR) | aov_bit(AovId.DEPTH)
                  | aov_bit(AovId.TEXCOORDS) | aov_bit(AovId.OBJECT_ID)))
    uni = _uniforms([0.0, 0.0, 0.0], [0, 0, -1], vfov=vfov)
    # clip_start 0 => DEPTH AOV is the raw hit distance (integrator:445-449)
    uni = uni._replace(camera=uni.camera._replace(clip_start=jnp.float32(0.0)))
    pix = jnp.arange(w * h, dtype=jnp.int32)
    from gatling_tpu.render.integrator import trace_sample

    res = trace_sample(cfg, uni, geom, table, empty_light_arrays(),
                       default_dome(), pix, jnp.int32(0))
    depth = np.asarray(res.first.depth).reshape(h, w)
    texc = np.asarray(res.first.texcoords).reshape(h, w, 3)
    obj = np.asarray(res.first.object_id).reshape(h, w)

    # independent projection: pixel (i,j) center -> NDC -> view ray -> plane
    tan_half = math.tan(vfov / 2)
    for (py, px) in [(3, 4), (8, 8), (12, 2), (1, 14)]:
        ndc_x = (2.0 * (px + 0.5) / w - 1.0) * tan_half * (w / h)
        # the integrator's pixel rows increase upward (the CLI flips on
        # write, mirroring the reference's flipped HioImage write)
        ndc_y = (2.0 * (py + 0.5) / h - 1.0) * tan_half
        ray = np.array([ndc_x, ndc_y, -1.0])
        t_hit = z_wall / ray[2]
        p = ray * t_hit
        exp_depth = np.linalg.norm(p)
        exp_u = (p[0] + 20.0) / 40.0
        exp_v = (p[1] + 20.0) / 40.0
        assert abs(depth[py, px] - exp_depth) < 2e-3 * exp_depth, (py, px)
        assert abs(texc[py, px, 0] - exp_u) < 2e-3, (py, px)
        assert abs(texc[py, px, 1] - exp_v) < 2e-3, (py, px)
        assert obj[py, px] == 7

def test_vertex_color_interpolation_against_barycentric_math():
    """displayColor vertex interpolation (Mesh.PrimvarInterpolation parity,
    reference: mesh.cpp:647-745 + testenv/Mesh.PrimvarInterpolation): the
    albedo AOV of a screen-filling vertex-colored quad must equal an
    INDEPENDENT numpy barycentric interpolation of the corner colors."""
    z_wall = -5.0
    pts = np.array([[-20, -20, z_wall], [20, -20, z_wall],
                    [-20, 20, z_wall], [20, 20, z_wall]], np.float32)
    colors = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0]], np.float32)
    from gatling_tpu.scene.meshproc import Interpolation

    mesh = build_triangulated_mesh(
        pts, np.array([4]), np.array([0, 1, 3, 2]),
        colors=colors, colors_interp=Interpolation.VERTEX)
    assert mesh.colors is not None and mesh.colors.shape == (6, 3)
    meshes = [MeshDesc(path="/w", mesh=mesh, transform=np.eye(4),
                       material="m", double_sided=True, object_id=0)]
    geom = build_geometry(meshes, {"m": 0, None: 1})
    # white diffuse so albedo == interpolated vertex color exactly; the
    # vcolor multiply is opt-in per material (MF_VCOLOR_MUL — only the
    # displayColor fallback sets it in production)
    white = _diffuse((1.0, 1.0, 1.0))
    white.params["vcolor_mul"] = 1.0
    table = build_material_table([white, lower_material(None)])

    w = h = 16
    vfov = 0.6
    cfg = RenderConfig(
        width=w, height=h, spp=1, max_bounces=1, jittered=False, fis=False,
        rr_bounce_offset=100,
        aov_mask=(aov_bit(AovId.COLOR) | aov_bit(AovId.ALBEDO)))
    uni = _uniforms([0.0, 0.0, 0.0], [0, 0, -1], vfov=vfov)
    pix = jnp.arange(w * h, dtype=jnp.int32)
    from gatling_tpu.render.integrator import trace_sample

    res = trace_sample(cfg, uni, geom, table, empty_light_arrays(),
                       default_dome(), pix, jnp.int32(0))
    albedo = np.asarray(res.first.albedo).reshape(h, w, 3)

    # independent projection + barycentric interpolation over the two fan
    # triangles (0,1,3) and (0,3,2) of faceVertexIndices [0, 1, 3, 2]
    tan_half = math.tan(vfov / 2)
    tris = [(0, 1, 3), (0, 3, 2)]
    for (py, px) in [(3, 4), (8, 8), (12, 2), (1, 14), (14, 14)]:
        ndc_x = (2.0 * (px + 0.5) / w - 1.0) * tan_half * (w / h)
        ndc_y = (2.0 * (py + 0.5) / h - 1.0) * tan_half
        ray = np.array([ndc_x, ndc_y, -1.0])
        p = ray * (z_wall / ray[2])
        expected = None
        for (a, b, c) in tris:
            v0, v1, v2 = pts[a][:2], pts[b][:2], pts[c][:2]
            m = np.array([v1 - v0, v2 - v0]).T
            uu, vv = np.linalg.solve(m, p[:2] - v0)
            if uu >= -1e-9 and vv >= -1e-9 and uu + vv <= 1 + 1e-9:
                expected = ((1 - uu - vv) * colors[a] + uu * colors[b]
                            + vv * colors[c])
                break
        assert expected is not None
        # the Albedo AOV adds the glossy Schlick term (rp_main.chit:268-290
        # analog): F = f0 + (1-f0)(1-cos)^5 with f0 = 0.04 at ior 1.5
        cos_o = -ray[2] / np.linalg.norm(ray)
        expected = expected + 0.04 + (1.0 - 0.04) * (1.0 - cos_o) ** 5
        assert np.allclose(albedo[py, px], expected, atol=3e-3), (
            (py, px), albedo[py, px], expected)


def test_view_direction_material_against_projection_math():
    """viewdirection-node materials (Materials.MtlxViewDirection analog):
    base_color = mix(A, B, abs(dot(viewdirection, normal))) on a screen-
    filling quad must equal the closed-form facing ratio cos(theta) of an
    INDEPENDENT numpy pinhole projection at every probed pixel."""
    from gatling_tpu.scene.stage import ShaderNode

    z_wall = -5.0
    pts = np.array([[-20, -20, z_wall], [20, -20, z_wall],
                    [-20, 20, z_wall], [20, 20, z_wall]], np.float32)
    mesh = build_triangulated_mesh(pts, np.array([4]), np.array([0, 1, 3, 2]))
    meshes = [MeshDesc(path="/w", mesh=mesh, transform=np.eye(4),
                       material="m", double_sided=True, object_id=0)]
    geom = build_geometry(meshes, {"m": 0, None: 1})

    # material network: mix(A, B, abs(dot(viewdirection, normal)))
    from gatling_tpu.scene.stage import MaterialDesc
    from gatling_tpu.render.material import lower_material as lm

    A = (0.9, 0.1, 0.1)
    B = (0.1, 0.1, 0.9)
    nodes = {
        "/m/s": ShaderNode(path="/m/s", shader_id="UsdPreviewSurface",
                           inputs={"metallic": 0.0, "roughness": 1.0},
                           input_connections={"diffuseColor": ("/m/mix", "out")}),
        "/m/mix": ShaderNode(path="/m/mix", shader_id="ND_mix_color3",
                             inputs={"fg": A, "bg": B},
                             input_connections={"mix": ("/m/abs", "out")}),
        "/m/abs": ShaderNode(path="/m/abs", shader_id="ND_absval_float",
                             inputs={},
                             input_connections={"in": ("/m/dot", "out")}),
        "/m/dot": ShaderNode(path="/m/dot", shader_id="ND_dotproduct_vector3",
                             inputs={},
                             input_connections={"in1": ("/m/vd", "out"),
                                                "in2": ("/m/n", "out")}),
        "/m/vd": ShaderNode(path="/m/vd", shader_id="ND_viewdirection_vector3",
                            inputs={}, input_connections={}),
        "/m/n": ShaderNode(path="/m/n", shader_id="ND_normal_vector3",
                           inputs={"space": "world"}, input_connections={}),
    }
    desc = MaterialDesc(path="/m", surface_node="/m/s", nodes=nodes)
    lowered = lm(desc)
    assert "base_color" in lowered.dynamic, "viewdirection chain not dynamic"
    table = build_material_table([lowered, lower_material(None)])

    w = h = 16
    vfov = 0.9
    cfg = RenderConfig(
        width=w, height=h, spp=1, max_bounces=1, jittered=False, fis=False,
        rr_bounce_offset=100,
        aov_mask=(aov_bit(AovId.COLOR) | aov_bit(AovId.ALBEDO)),
        dynamic_params=tuple((0, p, e) for p, e in sorted(lowered.dynamic.items())))
    uni = _uniforms([0.0, 0.0, 0.0], [0, 0, -1], vfov=vfov)
    pix = jnp.arange(w * h, dtype=jnp.int32)
    from gatling_tpu.render.integrator import trace_sample

    res = trace_sample(cfg, uni, geom, table, empty_light_arrays(),
                       default_dome(), pix, jnp.int32(0))
    albedo = np.asarray(res.first.albedo).reshape(h, w, 3)

    tan_half = math.tan(vfov / 2)
    for (py, px) in [(8, 8), (0, 0), (3, 12), (15, 2)]:
        ndc_x = (2.0 * (px + 0.5) / w - 1.0) * tan_half * (w / h)
        ndc_y = (2.0 * (py + 0.5) / h - 1.0) * tan_half
        ray = np.array([ndc_x, ndc_y, -1.0])
        cos_t = -ray[2] / np.linalg.norm(ray)  # |dot(viewdir, normal)|
        expected = cos_t * np.array(A) + (1.0 - cos_t) * np.array(B)
        expected = expected + 0.04 + (1.0 - 0.04) * (1.0 - cos_t) ** 5
        assert np.allclose(albedo[py, px], expected, atol=3e-3), (
            (py, px), albedo[py, px], expected, cos_t)
