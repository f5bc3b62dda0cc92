"""Fused bounce megakernel vs general integrator (interpret mode on CPU).

The fused path uses the same RNG streams but a Duff-ONB shading frame
(instead of mesh tangents), so individual samples differ by an azimuthal
rotation; the estimators agree in distribution. Tests compare image means
over many samples. The clustered (large-scene) mode must agree with the
resident mode near-exactly: same math, different triangle walk order.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from gatling_tpu.interface import LightArrays, empty_light_arrays
from gatling_tpu.ops.geometry import build_geometry
from gatling_tpu.ops.pallas_bounce import build_fused_scene
from gatling_tpu.render.fused import render_pixels_fused, supports_fused
from gatling_tpu.render.integrator import (
    DomeLightData,
    RenderConfig,
    default_dome,
    render_pixels,
)
from gatling_tpu.render.lights import build_light_arrays
from gatling_tpu.render.material import build_material_table, lower_material
from gatling_tpu.render.camera import CameraUniforms
from gatling_tpu.render.integrator import Uniforms
from gatling_tpu.scene.stage import LightDesc, load_scene

CORNELL = "/root/reference/cornell.usda"


def _cornell():
    desc = load_scene(CORNELL)
    mat_paths = sorted({m.material for m in desc.meshes if m.material})
    midx = {p: i for i, p in enumerate(mat_paths)}
    midx[None] = len(mat_paths)
    geom = build_geometry(desc.meshes, midx)
    rows = [None] * len(midx)
    for p, i in midx.items():
        rows[i] = lower_material(desc.materials.get(p) if p else None)
    table = build_material_table(rows)
    cam = desc.first_camera()
    uni = Uniforms(
        camera=CameraUniforms(
            jnp.asarray(cam.position), jnp.asarray(cam.forward), jnp.asarray(cam.up),
            jnp.float32(cam.vfov), jnp.float32(0), jnp.float32(0), jnp.float32(0),
            jnp.float32(cam.clip_start), jnp.float32(cam.clip_end)),
        sample_offset=jnp.int32(0), inv_total_sample_count=jnp.float32(1.0),
        max_sample_value=jnp.float32(10), rr_inv_min_term_prob=jnp.float32(0.95),
        light_intensity_multiplier=jnp.float32(1), meters_per_scene_unit=jnp.float32(1),
        max_volume_walk_length=jnp.int32(7),
        dome_rotation=jnp.asarray([0, 0, 0, 1.0], jnp.float32),
        dome_emission_multiplier=jnp.ones(3, jnp.float32),
        dome_diffuse_specular=jnp.ones(2, jnp.float32))
    return geom, table, uni


def _rect_light() -> LightDesc:
    """Rect light near the cornell ceiling (the room is [-1,1]^3, z up);
    the UsdLux default orientation already emits along -Z = down."""
    xf = np.eye(4)
    xf[3, :3] = [0.0, 0.0, 0.9]
    return LightDesc(
        path="/neelight", light_type="rect", transform=xf,
        params=dict(intensity=4.0, exposure=0.0,
                    color=np.array([1.0, 0.9, 0.8], np.float32),
                    normalize=False, diffuse=1.0, specular=1.0,
                    enableColorTemperature=False, colorTemperature=6500.0,
                    width=0.8, height=0.6))


def _compare(cfg, uni, geom, table, lights: LightArrays, dome, *, resident_max=4096,
             mean_tol=0.12, corr_min=0.95):
    scene, static = build_fused_scene(geom, table, lights, resident_max=resident_max)
    w, h, spp = cfg.width, cfg.height, cfg.spp
    n = w * h
    pix = jnp.arange(n, dtype=jnp.int32)

    with pltpu.force_tpu_interpret_mode():
        fused = np.asarray(render_pixels_fused(
            cfg, uni, scene, dome, pix, spp, jnp.int32(0), static=static))

    general = np.asarray(render_pixels(
        cfg, uni, geom, table, lights, dome, pix, spp, jnp.int32(0)).color)

    f = fused.reshape(h, w, 3)
    g = general.reshape(h, w, 3)
    assert np.isfinite(f).all() and (f >= 0).all()
    assert abs(f.mean() - g.mean()) / max(g.mean(), 1e-6) < mean_tol
    fd = f.reshape(h // 4, 4, w // 4, 4, 3).mean(axis=(1, 3)).ravel()
    gd = g.reshape(h // 4, 4, w // 4, 4, 3).mean(axis=(1, 3)).ravel()
    corr = np.corrcoef(fd, gd)[0, 1]
    assert corr > corr_min, corr
    return f, g


def test_supports_fused_gate():
    # round 2: NEE, dome, textures (split-bounce), normal maps,
    # absorption-only volumes and untextured cutout ARE supported;
    # scattering volumes / textured-opacity cutout are not
    assert supports_fused(RenderConfig(8, 8, has_dome=False), has_textures=False,
                          has_scattering_volumes=False)
    assert supports_fused(RenderConfig(8, 8, nee=True, has_dome=False), False,
                          has_scattering_volumes=False)
    assert supports_fused(RenderConfig(8, 8, has_dome=True), False,
                          has_scattering_volumes=False)
    assert supports_fused(RenderConfig(8, 8, has_dome=False), has_textures=True,
                          has_scattering_volumes=False)
    assert supports_fused(RenderConfig(8, 8, has_dome=False), False,
                          has_normal_maps=True,  # split-bounce tangent rows
                          has_scattering_volumes=False)
    # round 5: depth-1 scattering runs the fused scatter mode; only
    # NESTED media (stack >= 2) still route to the wavefront
    assert supports_fused(
        RenderConfig(8, 8, has_volumes=True, has_dome=False), False,
        has_scattering_volumes=True)
    assert supports_fused(
        RenderConfig(8, 8, has_volumes=True, medium_stack_size=1,
                     has_dome=False), False,
        has_scattering_volumes=True)
    assert not supports_fused(
        RenderConfig(8, 8, has_volumes=True, medium_stack_size=2,
                     has_dome=False), False,
        has_scattering_volumes=True)
    # untextured cutout resolves inside the fused walks
    assert supports_fused(RenderConfig(8, 8, has_cutout=True, has_dome=False),
                          False, has_scattering_volumes=False)
    # textured-opacity cutout runs the split-bounce re-trace stage for
    # camera paths; round 5: the NEE combination also stays fused (the
    # occlusion walk draws against per-material UV-mean opacity)
    assert supports_fused(
        RenderConfig(8, 8, has_cutout=True, has_dome=False), False,
        has_scattering_volumes=False, has_opacity_textures=True)
    assert supports_fused(
        RenderConfig(8, 8, has_cutout=True, nee=True, has_dome=False), False,
        has_scattering_volumes=False, has_opacity_textures=True)
    # advanced BSDF lobes (refraction/clearcoat/anisotropy) shade in the
    # fused kernels since round 5 (FusedStatic.advanced)


def test_fused_matches_general_statistics():
    geom, table, uni = _cornell()
    cfg = RenderConfig(width=24, height=24, spp=48, max_bounces=4,
                       has_dome=False, rr_bounce_offset=100)
    _compare(cfg, uni, geom, table, empty_light_arrays(), default_dome())


def test_fused_nee_matches_general():
    geom, table, uni = _cornell()
    lights = build_light_arrays([_rect_light()])
    cfg = RenderConfig(width=24, height=24, spp=48, max_bounces=3, nee=True,
                       has_dome=False, rr_bounce_offset=100)
    f, g = _compare(cfg, uni, geom, table, lights, default_dome())
    # the light must actually contribute (NEE path exercised, not vacuous)
    cfg_off = RenderConfig(width=24, height=24, spp=48, max_bounces=3, nee=False,
                           has_dome=False, rr_bounce_offset=100)
    scene, static = build_fused_scene(geom, table, lights)
    pix = jnp.arange(24 * 24, dtype=jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        dark = np.asarray(render_pixels_fused(
            cfg_off, uni, scene, default_dome(), pix, 48, jnp.int32(0), static=static))
    assert f.mean() > dark.reshape(24, 24, 3).mean() * 1.05


def test_fused_dome_matches_general():
    geom, table, uni = _cornell()
    # gradient dome so direction errors show up as brightness errors
    hgt, wd = 8, 16
    ty, tx = np.meshgrid(np.linspace(0, 1, hgt), np.linspace(0, 1, wd), indexing="ij")
    tex = np.stack([ty, 0.5 * np.ones_like(ty), 1.0 - ty], axis=-1).astype(np.float32)
    dome = DomeLightData(texture=jnp.asarray(tex),
                         fallback=jnp.zeros((1, 1, 3), jnp.float32))
    cfg = RenderConfig(width=24, height=24, spp=32, max_bounces=3,
                       has_dome=True, rr_bounce_offset=100)
    _compare(cfg, uni, geom, table, empty_light_arrays(), dome)


def test_fused_clustered_matches_resident():
    """The clustered (HBM+DMA, AABB-culled) walk is the same math as the
    resident SMEM walk — images must agree almost exactly. Kept tiny:
    interpret-mode ref reads are callback-based and scale with triangle-loop
    iterations."""
    geom, table, uni = _cornell()
    lights = build_light_arrays([_rect_light()])
    cfg = RenderConfig(width=8, height=8, spp=1, max_bounces=2, nee=True,
                       has_dome=False, rr_bounce_offset=100)
    n = 8 * 8
    pix = jnp.arange(n, dtype=jnp.int32)

    res_scene, res_static = build_fused_scene(geom, table, lights)
    clu_scene, clu_static = build_fused_scene(geom, table, lights, resident_max=0)
    assert res_static.n_clusters == 0
    assert clu_static.n_clusters >= 1

    with pltpu.force_tpu_interpret_mode():
        a = np.asarray(render_pixels_fused(
            cfg, uni, res_scene, default_dome(), pix, 1, jnp.int32(0),
            static=res_static))
        b = np.asarray(render_pixels_fused(
            cfg, uni, clu_scene, default_dome(), pix, 1, jnp.int32(0),
            static=clu_static))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_fused_clustered_multicluster_step():
    """Multi-cluster indexing (c = l1*FAN + l2, padded clusters, Morton
    reorder): one bounce step over a 3-sphere scene must match the resident
    walk state-for-state."""
    from gatling_tpu.ops.pallas_bounce import bounce_step, make_params, pack_state
    from gatling_tpu.scene.examples import _uv_sphere
    from gatling_tpu.scene.meshproc import build_triangulated_mesh
    from gatling_tpu.scene.stage import MeshDesc

    pts, counts, idx = _uv_sphere(8, 8)
    sphere = build_triangulated_mesh(pts, counts, idx)
    meshes = []
    for i, cx in enumerate((-3.0, 0.0, 3.0)):
        xf = np.eye(4)
        xf[3, :3] = [cx, 0.0, 0.0]
        meshes.append(MeshDesc(path=f"/s{i}", mesh=sphere, transform=xf,
                               material=None, double_sided=False, object_id=i))
    geom = build_geometry(meshes, {None: 0})
    table = build_material_table([lower_material(None)])
    _geom_unused, _table_unused, uni = _cornell()

    res_scene, res_static = build_fused_scene(geom, table, None)
    clu_scene, clu_static = build_fused_scene(geom, table, None, resident_max=0)
    assert clu_static.n_clusters >= 3

    n = 64
    gy, gz = np.meshgrid(np.linspace(-1, 1, 8), np.linspace(-1, 1, 8))
    origins = np.stack([np.full(n, -8.0), 3.0 * gy.ravel(), gz.ravel()], axis=1)
    dirs = np.tile(np.array([[1.0, 0.0, 0.0]]), (n, 1))
    state = pack_state(jnp.asarray(origins, jnp.float32),
                       jnp.asarray(dirs, jnp.float32),
                       jnp.arange(n, dtype=jnp.uint32), 1024)
    cfg = RenderConfig(width=8, height=8, spp=1, max_bounces=2,
                       has_dome=False, rr_bounce_offset=100)
    params = make_params(cfg, uni, jnp.int32(0))
    with pltpu.force_tpu_interpret_mode():
        a = np.asarray(bounce_step(params, res_scene, state,
                                   static=res_static, nee=False))
        b = np.asarray(bounce_step(params, clu_scene, state,
                                   static=clu_static, nee=False))
    # some rays hit, some miss: both conditions exercised
    assert a[13].sum() > 0 and a[13].sum() < n
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_fused_stats_counts_segments():
    geom, table, uni = _cornell()
    lights = build_light_arrays([_rect_light()])
    cfg = RenderConfig(width=8, height=8, spp=4, max_bounces=3, nee=True,
                       has_dome=False, rr_bounce_offset=100)
    scene, static = build_fused_scene(geom, table, lights)
    pix = jnp.arange(64, dtype=jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        color, segs = render_pixels_fused(
            cfg, uni, scene, default_dome(), pix, 4, jnp.int32(0),
            static=static, with_stats=True)
    segs = np.asarray(segs)
    # every cornell camera ray hits (>=1 path segment), NEE adds shadow rays
    assert (segs >= 1.0).all()
    assert segs.mean() > 1.5
    assert segs.max() <= 2.0 * cfg.max_bounces


def test_fused_clustered_multigroup_walk_mask():
    """Multiple L1 groups exercise the direction-aware group mask in the
    XLA walk plan (groups a block never crosses sort to distance 3e37 and
    the ordered walk must still find every hit): a 5x5 sphere grid spans
    >= 2 L1 groups; bounce-0 state parity vs the resident walk."""
    from gatling_tpu.ops.pallas_bounce import bounce_step, make_params, pack_state
    from gatling_tpu.scene.examples import _uv_sphere
    from gatling_tpu.scene.meshproc import build_triangulated_mesh
    from gatling_tpu.scene.stage import MeshDesc

    pts, counts, idx = _uv_sphere(8, 8)
    sphere = build_triangulated_mesh(pts, counts, idx)
    meshes = []
    for i in range(25):
        xf = np.eye(4)
        xf[3, :3] = [3.0 * (i % 5 - 2), 3.0 * (i // 5 - 2), 0.0]
        meshes.append(MeshDesc(path=f"/s{i}", mesh=sphere, transform=xf,
                               material=None, double_sided=False, object_id=i))
    geom = build_geometry(meshes, {None: 0})
    table = build_material_table([lower_material(None)])
    _geom_unused, _table_unused, uni = _cornell()

    res_scene, res_static = build_fused_scene(geom, table, None,
                                              resident_max=4096)
    clu_scene, clu_static = build_fused_scene(geom, table, None,
                                              resident_max=0)
    assert res_static.n_clusters == 0
    assert clu_static.n_l1 >= 2, clu_static

    # rays from several origins/directions: axis rows, diagonals, misses
    n = 64
    gy, gz = np.meshgrid(np.linspace(-7, 7, 8), np.linspace(-2, 2, 8))
    origins = np.stack([np.full(n, -12.0), gy.ravel(), gz.ravel()], axis=1)
    dirs = np.tile(np.array([[1.0, 0.2, 0.0]]), (n, 1))
    dirs[n // 2:] = [0.6, 0.6, 0.1]
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    state = pack_state(jnp.asarray(origins, jnp.float32),
                       jnp.asarray(dirs, jnp.float32),
                       jnp.arange(n, dtype=jnp.uint32), 1024)
    cfg = RenderConfig(width=8, height=8, spp=1, max_bounces=2,
                       has_dome=False, rr_bounce_offset=100)
    params = make_params(cfg, uni, jnp.int32(0))
    with pltpu.force_tpu_interpret_mode():
        a = np.asarray(bounce_step(params, res_scene, state,
                                   static=res_static, nee=False))
        b = np.asarray(bounce_step(params, clu_scene, state,
                                   static=clu_static, nee=False))
    assert a[13].sum() > 0 and a[13].sum() < n
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_fused_clustered_refit_matches_rebuild():
    """Transform edits refit the clustered tables under the CACHED Morton
    order (stable static shapes, no recompile); the result must match a
    from-scratch build with a fresh order."""
    from gatling_tpu.ops.pallas_bounce import (
        bounce_step, build_fused_scene_with_order, make_params, pack_state,
    )
    from gatling_tpu.scene.examples import _uv_sphere
    from gatling_tpu.scene.meshproc import build_triangulated_mesh
    from gatling_tpu.scene.stage import MeshDesc

    pts, counts, idx = _uv_sphere(8, 8)
    sphere = build_triangulated_mesh(pts, counts, idx)

    def meshes(mid_x):
        out = []
        for i, cx in enumerate((-3.0, mid_x, 3.0)):
            xf = np.eye(4)
            xf[3, :3] = [cx, 0.0, 0.0]
            out.append(MeshDesc(path=f"/s{i}", mesh=sphere, transform=xf,
                                material=None, double_sided=False, object_id=i))
        return out

    table = build_material_table([lower_material(None)])
    geom0 = build_geometry(meshes(0.0), {None: 0})
    _sc0, static0, order = build_fused_scene_with_order(
        geom0, table, None, resident_max=0)
    assert static0.n_clusters >= 3 and order is not None

    # "move" the middle sphere: rebuild geometry and REFIT with the old order
    geom1 = build_geometry(meshes(0.9), {None: 0})
    refit, static_r, _ = build_fused_scene_with_order(
        geom1, table, None, resident_max=0, reuse_order=order)
    fresh, static_f, _ = build_fused_scene_with_order(
        geom1, table, None, resident_max=0)
    assert static_r == static_f  # same static shapes -> no recompile

    _g, _t, uni = _cornell()
    n = 64
    gy, gz = np.meshgrid(np.linspace(-1, 1, 8), np.linspace(-1, 1, 8))
    origins = np.stack([np.full(n, -8.0), 3.0 * gy.ravel(), gz.ravel()], axis=1)
    dirs = np.tile(np.array([[1.0, 0.0, 0.0]]), (n, 1))
    state = pack_state(jnp.asarray(origins, jnp.float32),
                       jnp.asarray(dirs, jnp.float32),
                       jnp.arange(n, dtype=jnp.uint32), 1024)
    cfg = RenderConfig(width=8, height=8, spp=1, max_bounces=2,
                       has_dome=False, rr_bounce_offset=100)
    params = make_params(cfg, uni, jnp.int32(0))
    with pltpu.force_tpu_interpret_mode():
        a = np.asarray(bounce_step(params, refit, state, static=static_r, nee=False))
        b = np.asarray(bounce_step(params, fresh, state, static=static_f, nee=False))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_fused_textured_mode_matches_untextured_exactly():
    """Split-bounce (trace -> XLA params -> shade) on a constant-material
    scene must match the single-kernel path near-exactly: same math, the
    params just arrive through the buffer instead of the in-kernel select."""
    import dataclasses

    geom, table, uni = _cornell()
    lights = build_light_arrays([_rect_light()])
    scene, static = build_fused_scene(geom, table, lights)
    tex_static = dataclasses.replace(static, textured=True)
    cfg = RenderConfig(width=16, height=16, spp=2, max_bounces=3, nee=True,
                       has_dome=False, rr_bounce_offset=100)
    pix = jnp.arange(16 * 16, dtype=jnp.int32)

    from gatling_tpu.render.texture import empty_pool

    with pltpu.force_tpu_interpret_mode():
        a = np.asarray(render_pixels_fused(
            cfg, uni, scene, default_dome(), pix, 2, jnp.int32(0),
            static=static))
        b = np.asarray(render_pixels_fused(
            cfg, uni, scene, default_dome(), pix, 2, jnp.int32(0),
            static=tex_static, materials=table, textures=empty_pool()))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_fused_textured_matches_general(tmp_path):
    """A texture-driven base color renders the same through the fused
    split-bounce mode and the general integrator."""
    import dataclasses

    from gatling_tpu import imgio
    from gatling_tpu.render.material import build_materials
    from gatling_tpu.scene.stage import MaterialDesc, ShaderNode
    from gatling_tpu.scene.usda import parse_usda
    from gatling_tpu.scene.stage import build_scene

    # 2x2 checker texture on the cornell floor material
    img = np.array([[[255, 40, 40, 255], [40, 255, 40, 255]],
                    [[40, 40, 255, 255], [255, 255, 255, 255]]], np.uint8)
    tex_path = tmp_path / "checker.png"
    imgio.write_image_file(tex_path, img)

    desc = load_scene(CORNELL)
    mat_paths = sorted({m.material for m in desc.meshes if m.material})
    midx = {p: i for i, p in enumerate(mat_paths)}
    midx[None] = len(mat_paths)
    geom = build_geometry(desc.meshes, midx)
    rows = [None] * len(midx)
    for p, i in midx.items():
        rows[i] = lower_material(desc.materials.get(p) if p else None)
    # give the first material a textured base color
    from gatling_tpu.render.texture import TextureRef

    rows[0].textures["base_color"] = TextureRef(file_path=str(tex_path),
                                                is_srgb=False)
    table, pool = build_materials(rows)
    assert (int(pool.texels.shape[0]) > 1
            or int(pool.texels_u32.shape[0]) > 1)

    _g, _t, uni = _cornell()
    scene, static = build_fused_scene(geom, table, build_light_arrays([]))
    static = dataclasses.replace(static, textured=True,
                                 textured_params=("base_color",))
    cfg = RenderConfig(width=24, height=24, spp=32, max_bounces=3,
                       has_dome=False, rr_bounce_offset=100)
    pix = jnp.arange(24 * 24, dtype=jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        fused = np.asarray(render_pixels_fused(
            cfg, uni, scene, default_dome(), pix, 32, jnp.int32(0),
            static=static, materials=table, textures=pool))
    general = np.asarray(render_pixels(
        cfg, uni, geom, table, empty_light_arrays(), default_dome(),
        pix, 32, jnp.int32(0), pool).color)
    f = fused.reshape(24, 24, 3)
    g = general.reshape(24, 24, 3)
    assert np.isfinite(f).all()
    assert abs(f.mean() - g.mean()) / max(g.mean(), 1e-6) < 0.12
    fd = f.reshape(6, 4, 6, 4, 3).mean(axis=(1, 3)).ravel()
    gd = g.reshape(6, 4, 6, 4, 3).mean(axis=(1, 3)).ravel()
    assert np.corrcoef(fd, gd)[0, 1] > 0.95


@pytest.mark.parametrize("resident_max", [4096, 0])
def test_fused_normal_map_matches_general(tmp_path, resident_max):
    """A normal-mapped material routes through the split-bounce mode with
    tangent rows (static.tangents): the XLA stage perturbs the shading
    normal exactly like the general integrator's perturb_normal, and the
    images must agree statistically. Covers both the resident (SMEM
    tangent carries) and clustered (CLU_T* attr rows) tables."""
    import dataclasses

    from gatling_tpu import imgio
    from gatling_tpu.render.material import build_materials
    from gatling_tpu.render.texture import TextureRef

    # a strongly tilted constant normal map (tangent-space +x lean)
    nm = np.zeros((2, 2, 4), np.uint8)
    nm[..., 0] = 200  # x -> ~0.57 after the 2x-1 decode
    nm[..., 1] = 128
    nm[..., 2] = 230
    nm[..., 3] = 255
    nm_path = tmp_path / "lean.png"
    imgio.write_image_file(nm_path, nm)

    desc = load_scene(CORNELL)
    mat_paths = sorted({m.material for m in desc.meshes if m.material})
    midx = {p: i for i, p in enumerate(mat_paths)}
    midx[None] = len(mat_paths)
    geom = build_geometry(desc.meshes, midx)
    rows = [None] * len(midx)
    for p, i in midx.items():
        rows[i] = lower_material(desc.materials.get(p) if p else None)
    for r in rows:  # every material leans: all hits exercise the path
        r.textures["normal"] = TextureRef(
            file_path=str(nm_path), is_srgb=False,
            scale=(2.0, 2.0, 2.0, 1.0), bias=(-1.0, -1.0, -1.0, 0.0))
    table, pool = build_materials(rows)
    assert bool((np.asarray(table.normal_tex) >= 0).any())

    _g, _t, uni = _cornell()
    scene, static = build_fused_scene(geom, table, build_light_arrays([]),
                                      resident_max=resident_max)
    assert static.tangents
    assert static.clustered == (resident_max == 0)
    static = dataclasses.replace(static, textured=True)
    cfg = RenderConfig(width=24, height=24, spp=32, max_bounces=3,
                       has_dome=False, rr_bounce_offset=100)
    pix = jnp.arange(24 * 24, dtype=jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        fused = np.asarray(render_pixels_fused(
            cfg, uni, scene, default_dome(), pix, 32, jnp.int32(0),
            static=static, materials=table, textures=pool))
    general = np.asarray(render_pixels(
        cfg, uni, geom, table, empty_light_arrays(), default_dome(),
        pix, 32, jnp.int32(0), pool).color)
    f = fused.reshape(24, 24, 3)
    g = general.reshape(24, 24, 3)
    assert np.isfinite(f).all()
    assert abs(f.mean() - g.mean()) / max(g.mean(), 1e-6) < 0.12
    fd = f.reshape(6, 4, 6, 4, 3).mean(axis=(1, 3)).ravel()
    gd = g.reshape(6, 4, 6, 4, 3).mean(axis=(1, 3)).ravel()
    assert np.corrcoef(fd, gd)[0, 1] > 0.95
    # the lean must actually change the image vs an unmapped render
    plain_rows = [lower_material(desc.materials.get(p) if p else None)
                  for p, i in sorted(midx.items(), key=lambda kv: kv[1])]
    t2, p2 = build_materials(plain_rows)
    plain = np.asarray(render_pixels(
        cfg, uni, geom, t2, empty_light_arrays(), default_dome(),
        pix, 32, jnp.int32(0), p2).color)
    assert np.abs(general - plain).mean() > 1e-3


@pytest.mark.parametrize("resident_max", [4096, 0])
def test_fused_cutout_matches_general(tmp_path, resident_max):
    """Untextured stochastic cutout resolved INSIDE the fused walks: every
    candidate intersection draws an independent Bernoulli against the
    per-triangle pass probability (P(any accepted) = 1 - prod(1 - o_i),
    identical in distribution to the wavefront's sequential
    ignoreIntersection hops). Camera AND shadow (NEE) streams, both
    table layouts."""
    import dataclasses

    desc = load_scene(CORNELL)
    mat_paths = sorted({m.material for m in desc.meshes if m.material})
    midx = {p: i for i, p in enumerate(mat_paths)}
    midx[None] = len(mat_paths)
    geom = build_geometry(desc.meshes, midx)
    rows = [None] * len(midx)
    for p, i in midx.items():
        rows[i] = lower_material(desc.materials.get(p) if p else None)
    # every non-emissive material becomes 40% cutout
    for r in rows:
        if not any(c > 0 for c in r.params["emissive"]):
            r.params["opacity"] = 0.4
    table = build_material_table(rows)
    _g, _t, uni = _cornell()
    lights = build_light_arrays([_rect_light()])

    scene, static = build_fused_scene(geom, table, lights,
                                      resident_max=resident_max)
    assert static.cutout
    assert static.clustered == (resident_max == 0)
    cfg = RenderConfig(width=24, height=24, spp=48, max_bounces=4, nee=True,
                       has_dome=False, has_cutout=True, rr_bounce_offset=100)
    pix = jnp.arange(24 * 24, dtype=jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        fused = np.asarray(render_pixels_fused(
            cfg, uni, scene, default_dome(), pix, 48, jnp.int32(0),
            static=static))
    general = np.asarray(render_pixels(
        cfg, uni, geom, table, lights, default_dome(),
        pix, 48, jnp.int32(0)).color)
    f = fused.reshape(24, 24, 3)
    g = general.reshape(24, 24, 3)
    assert np.isfinite(f).all() and (f >= 0).all()
    assert abs(f.mean() - g.mean()) / max(g.mean(), 1e-6) < 0.12
    fd = f.reshape(6, 4, 6, 4, 3).mean(axis=(1, 3)).ravel()
    gd = g.reshape(6, 4, 6, 4, 3).mean(axis=(1, 3)).ravel()
    assert np.corrcoef(fd, gd)[0, 1] > 0.95
    # cutout must actually brighten vs opaque (light leaks through walls)
    opaque_rows = [lower_material(desc.materials.get(p) if p else None)
                   for p, i in sorted(midx.items(), key=lambda kv: kv[1])]
    t_op = build_material_table(opaque_rows)
    s_op, st_op = build_fused_scene(geom, t_op, lights,
                                    resident_max=resident_max)
    assert not st_op.cutout
    with pltpu.force_tpu_interpret_mode():
        op = np.asarray(render_pixels_fused(
            cfg, uni, s_op, default_dome(), pix, 48, jnp.int32(0),
            static=st_op))
    assert abs(f.mean() - op.reshape(24, 24, 3).mean()) > 1e-3


def test_fused_first_hit_aovs_match_general():
    """First-hit AOVs captured through the peeled trace_step must match the
    general integrator exactly for unjittered pixel centers."""
    from gatling_tpu.interface import AovId, aov_bit
    from gatling_tpu.render.texture import empty_pool

    geom, table, uni = _cornell()
    scene, static = build_fused_scene(geom, table, build_light_arrays([]))
    mask = (aov_bit(AovId.COLOR) | aov_bit(AovId.NORMAL) | aov_bit(AovId.ALBEDO)
            | aov_bit(AovId.DEPTH) | aov_bit(AovId.TEXCOORDS))
    cfg = RenderConfig(width=16, height=16, spp=2, max_bounces=2,
                       jittered=False, fis=False, has_dome=False,
                       rr_bounce_offset=100, aov_mask=mask)
    n = 16 * 16
    pix = jnp.arange(n, dtype=jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        color, segs, fh = render_pixels_fused(
            cfg, uni, scene, default_dome(), pix, 2, jnp.int32(0),
            static=static, materials=table, textures=empty_pool(),
            want_first_hit=True, with_stats=True)

    res = render_pixels(cfg, uni, geom, table, empty_light_arrays(),
                        default_dome(), pix, 2, jnp.int32(0))
    hit = np.asarray(fh["hit"])
    ghit = np.asarray(res.first.hit)
    # Baldwin-Weber vs Moller-Trumbore may disagree on triangle-EDGE rays
    assert (hit != ghit).mean() <= 0.01
    assert hit.sum() > 0.5 * hit.size  # most of the frame is the box interior
    both = hit & ghit
    np.testing.assert_allclose(np.asarray(fh["normal"])[both],
                               np.asarray(res.first.normal)[both], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fh["albedo"])[both],
                               np.asarray(res.first.albedo)[both], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fh["depth"])[both],
                               np.asarray(res.first.depth)[both], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fh["texcoords"])[both],
                               np.asarray(res.first.texcoords)[both], rtol=1e-4, atol=1e-5)


def test_fused_absorption_volumes_match_general():
    """Absorption-only volumes (mediumStackSize == 0): a tinted glass slab in
    front of an emissive wall must attenuate identically (in distribution)
    through the fused kernel and the general integrator."""
    import dataclasses

    from gatling_tpu.render.material import (
        LoweredMaterial, MaterialTraits, _DEFAULTS,
    )
    from gatling_tpu.scene.meshproc import build_triangulated_mesh
    from gatling_tpu.scene.stage import MeshDesc
    from tests.test_volumes import _quad, _uniforms

    meshes = [
        MeshDesc(path="/front", mesh=_quad(1.0), transform=np.eye(4),
                 material="glass", double_sided=True, object_id=0),
        MeshDesc(path="/back", mesh=_quad(-1.0, flip=True), transform=np.eye(4),
                 material="glass", double_sided=True, object_id=1),
        MeshDesc(path="/wall", mesh=_quad(-3.0), transform=np.eye(4),
                 material="wall", double_sided=True, object_id=2),
    ]
    geom = build_geometry(meshes, {"glass": 0, "wall": 1, None: 2})
    glass = LoweredMaterial(params=dict(_DEFAULTS), traits=MaterialTraits(), textures={})
    glass.params.update(transmission=1.0, base_color=(0, 0, 0),
                        volume_absorption=(0.8, 0.3, 0.05))
    wall = LoweredMaterial(params=dict(_DEFAULTS), traits=MaterialTraits(), textures={})
    wall.params.update(emissive=(1.0, 1.0, 1.0), base_color=(0, 0, 0))
    table = build_material_table([glass, wall, lower_material(None)])

    scene, static = build_fused_scene(geom, table, None)
    static = dataclasses.replace(static, volumes=True)
    cfg = RenderConfig(width=12, height=12, spp=24, max_bounces=6,
                       jittered=False, fis=False, has_dome=False,
                       has_volumes=True, medium_stack_size=0,
                       rr_bounce_offset=100)
    n = 12 * 12
    pix = jnp.arange(n, dtype=jnp.int32)
    uni = _uniforms()
    with pltpu.force_tpu_interpret_mode():
        fused = np.asarray(render_pixels_fused(
            cfg, uni, scene, default_dome(), pix, 24, jnp.int32(0), static=static))
    general = np.asarray(render_pixels(
        cfg, uni, geom, table, empty_light_arrays(), default_dome(),
        pix, 24, jnp.int32(0)).color)

    f = fused.reshape(12, 12, 3)[3:-3, 3:-3].mean(axis=(0, 1))
    g = general.reshape(12, 12, 3)[3:-3, 3:-3].mean(axis=(0, 1))
    # absorption is visible (blue >> red after exp(-sigma*2))...
    assert f[2] > 2.0 * f[0]
    # ...and matches the general integrator per channel
    np.testing.assert_allclose(f, g, rtol=0.15, atol=0.01)


def _instanced_scene(n_side=2, res=8, cutout_opacity=None):
    """Small instanced sphere field (non-uniform scales, rotation, two
    materials) for instanced-vs-flattened parity."""
    from gatling_tpu.render.material import (LoweredMaterial, MaterialTraits,
                                             _DEFAULTS, build_material_table)
    from gatling_tpu.scene.examples import _uv_sphere
    from gatling_tpu.scene.meshproc import build_triangulated_mesh
    from gatling_tpu.scene.stage import MeshDesc

    pts, counts, idx = _uv_sphere(res, res)
    sphere = build_triangulated_mesh(pts, counts, idx)
    gp = np.array([[-6, -6, 0], [6, -6, 0], [6, 6, 0], [-6, 6, 0]], np.float32)
    ground = build_triangulated_mesh(gp, np.array([4]), np.array([0, 1, 2, 3]))

    rng = np.random.default_rng(3)
    xfs = []
    for i in range(n_side):
        for j in range(n_side):
            s = rng.uniform(0.5, 1.2)
            th = rng.uniform(0, 2 * np.pi)
            rot = np.array([[np.cos(th), np.sin(th), 0],
                            [-np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
            xf = np.eye(4)
            xf[:3, :3] = rot * s
            xf[3, :3] = [i * 2.5 - 1.2, j * 2.5 - 1.2, s]
            xfs.append(xf)
    half = len(xfs) // 2
    meshes = [
        MeshDesc(path="/s0", mesh=sphere, transform=np.eye(4), material="m0",
                 double_sided=False, object_id=0,
                 instance_transforms=np.stack(xfs[:half])),
        MeshDesc(path="/s1", mesh=sphere, transform=np.eye(4), material="m1",
                 double_sided=False, object_id=1,
                 instance_transforms=np.stack(xfs[half:])),
        MeshDesc(path="/ground", mesh=ground, transform=np.eye(4),
                 material="mg", double_sided=True, object_id=2),
    ]
    midx = {"m0": 0, "m1": 1, "mg": 2, None: 3}
    m0 = LoweredMaterial(params=dict(_DEFAULTS), traits=MaterialTraits(), textures={})
    m0.params.update(base_color=(0.8, 0.2, 0.2), roughness=0.4)
    m1 = LoweredMaterial(params=dict(_DEFAULTS), traits=MaterialTraits(), textures={})
    m1.params.update(base_color=(0.2, 0.4, 0.8), metallic=1.0, roughness=0.2)
    if cutout_opacity is not None:
        m1.traits.has_cutout = True
        m1.params.update(opacity=cutout_opacity)
    mg = LoweredMaterial(params=dict(_DEFAULTS), traits=MaterialTraits(), textures={})
    mg.params.update(base_color=(0.7, 0.7, 0.7), roughness=0.9)
    from gatling_tpu.render.material import lower_material

    table = build_material_table([m0, m1, mg, lower_material(None)])
    return meshes, midx, table


def _instanced_uniforms():
    from gatling_tpu.render.camera import CameraUniforms
    from gatling_tpu.render.integrator import Uniforms

    fwd = np.array([0.2, 0.4, -0.6])
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0, 0, 1.0])
    up = up - fwd * (up @ fwd)
    up /= np.linalg.norm(up)
    return Uniforms(
        camera=CameraUniforms(
            jnp.asarray([-1.5, -4.0, 4.0], jnp.float32), jnp.asarray(fwd, jnp.float32),
            jnp.asarray(up, jnp.float32),
            jnp.float32(0.9), jnp.float32(0), jnp.float32(0), jnp.float32(0),
            jnp.float32(0.01), jnp.float32(1e5)),
        sample_offset=jnp.int32(0), inv_total_sample_count=jnp.float32(1.0),
        max_sample_value=jnp.float32(100), rr_inv_min_term_prob=jnp.float32(0.95),
        light_intensity_multiplier=jnp.float32(1), meters_per_scene_unit=jnp.float32(1),
        max_volume_walk_length=jnp.int32(7),
        dome_rotation=jnp.asarray([0, 0, 0, 1.0], jnp.float32),
        dome_emission_multiplier=jnp.ones(3, jnp.float32),
        dome_diffuse_specular=jnp.ones(2, jnp.float32))


def test_fused_instanced_matches_flattened():
    """The two-level INSTANCED walk (BLAS sharing: shared local clusters +
    per-instance ray transforms, the reference TLAS analog Gi.cpp:1188-1202)
    must reproduce the flattened clustered walk almost exactly — same math,
    different frames."""
    from gatling_tpu.ops.geometry import build_geometry
    from gatling_tpu.ops.pallas_bounce import build_fused_scene_instanced

    meshes, midx, table = _instanced_scene()
    uni = _instanced_uniforms()
    lights = build_light_arrays([_rect_light()])

    res = build_fused_scene_instanced(meshes, midx, table, lights,
                                      min_gain=1.5, min_flat=0)
    assert res is not None
    iscene, istatic = res
    assert istatic.instanced and istatic.clu_vmem
    assert istatic.n_instances == 5

    geom = build_geometry(meshes, midx)
    fscene, fstatic = build_fused_scene(geom, table, lights, resident_max=0)

    cfg = RenderConfig(width=8, height=8, spp=1, max_bounces=2, nee=True,
                       has_dome=False, rr_bounce_offset=100)
    pix = jnp.arange(64, dtype=jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        a = np.asarray(render_pixels_fused(
            cfg, uni, iscene, default_dome(), pix, 1, jnp.int32(0),
            static=istatic))
        b = np.asarray(render_pixels_fused(
            cfg, uni, fscene, default_dome(), pix, 1, jnp.int32(0),
            static=fstatic))
    assert np.isfinite(a).all()
    assert a.max() > 0.0
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_fused_instanced_cutout_statistics():
    """Instanced stochastic cutout draws against the PLACEMENT's material
    opacity; converged transparency must match the flattened walk."""
    from gatling_tpu.ops.geometry import build_geometry
    from gatling_tpu.ops.pallas_bounce import build_fused_scene_instanced

    meshes, midx, table = _instanced_scene(cutout_opacity=0.35)
    uni = _instanced_uniforms()

    res = build_fused_scene_instanced(meshes, midx, table, None,
                                      min_gain=1.5, min_flat=0)
    assert res is not None
    iscene, istatic = res
    assert istatic.cutout

    geom = build_geometry(meshes, midx)
    fscene, fstatic = build_fused_scene(geom, table, None, resident_max=0)
    assert fstatic.cutout

    cfg = RenderConfig(width=8, height=8, spp=8, max_bounces=2,
                       has_cutout=True, has_dome=False, rr_bounce_offset=100)
    pix = jnp.arange(64, dtype=jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        a = np.asarray(render_pixels_fused(
            cfg, uni, iscene, default_dome(), pix, 8, jnp.int32(0),
            static=istatic))
        b = np.asarray(render_pixels_fused(
            cfg, uni, fscene, default_dome(), pix, 8, jnp.int32(0),
            static=fstatic))
    # independent Bernoulli streams -> statistical agreement only
    assert abs(a.mean() - b.mean()) / max(b.mean(), 1e-6) < 0.15


def test_spp_batching_bit_equal(monkeypatch):
    """Round 5: spp batching (several samples per pixel in ONE ray wave)
    reproduces the sequential sample loop exactly — identical per-sample
    RNG streams, only the accumulation order may differ."""
    geom, table, uni = _cornell()
    scene, static = build_fused_scene(geom, table, None)
    cfg = RenderConfig(width=16, height=16, spp=4, max_bounces=3,
                       has_dome=False)
    pix = jnp.arange(256, dtype=jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        monkeypatch.setenv("GATLING_SPP_BATCH_RAYS", "1")
        seq = np.asarray(render_pixels_fused(
            cfg, uni, scene, default_dome(), pix, 4, jnp.int32(0),
            static=static))
        monkeypatch.setenv("GATLING_SPP_BATCH_RAYS", "4194304")
        bat = np.asarray(render_pixels_fused(
            cfg, uni, scene, default_dome(), pix, 4, jnp.int32(0),
            static=static))
    np.testing.assert_allclose(bat, seq, atol=1e-5)


def test_fused_clipping_planes_parity():
    """Round 5: camera clipping runs FUSED via a bounce-0 peel (origin
    advanced to the near plane + far-plane hit filter). Parity vs the
    wavefront on near-clip, far-clip and no-op ranges; the clip visibly
    changes the image."""
    geom, table, uni = _cornell()
    scene, static = build_fused_scene(geom, table, None)
    pix = jnp.arange(144, dtype=jnp.int32)

    def both(cs, ce):
        u2 = uni._replace(camera=uni.camera._replace(
            clip_start=jnp.float32(cs), clip_end=jnp.float32(ce)))
        cfg = RenderConfig(width=12, height=12, spp=8, max_bounces=3,
                           has_dome=False, clipping_planes=True)
        assert supports_fused(cfg, False, has_scattering_volumes=False)
        with pltpu.force_tpu_interpret_mode():
            f = np.asarray(render_pixels_fused(
                cfg, u2, scene, default_dome(), pix, 8, jnp.int32(0),
                static=static))
        g = np.asarray(render_pixels(
            cfg, u2, geom, table, empty_light_arrays(), default_dome(),
            pix, 8, jnp.int32(0)).color)
        assert np.isfinite(f).all() and (f >= 0).all()
        rel = abs(f.mean() - g.mean()) / max(g.mean(), 1e-6)
        assert rel < 0.12, (cs, ce, f.mean(), g.mean())
        return f.mean()

    m_open = both(0.1, 100.0)   # no-op clip (cornell sits 6-8 units out)
    m_near = both(6.5, 100.0)   # near plane cuts the front of the room
    m_far = both(0.1, 7.0)      # far plane cuts the back
    assert abs(m_near - m_open) > 0.005
    assert m_far < 0.6 * m_open


def test_trace_step_xla_p2_matches_kernel_pass2():
    """The XLA pass-2 relocation (GATLING_XLA_P2, _finalize_hits) must
    reproduce the in-kernel candidate-list pass 2 row-for-row, on both the
    flattened clustered and the instanced walks. The kernel fetch is a
    hi/mid/lo bf16 one-hot matmul (~2^-24); the XLA gather is exact f32, so
    tolerances are tight."""
    import gatling_tpu.ops.pallas_bounce as pb
    from gatling_tpu.ops.pallas_bounce import (build_fused_scene,
                                               build_fused_scene_instanced,
                                               make_params, pack_state,
                                               trace_step)

    def compare(scene, static, uni, center):
        cfg = RenderConfig(width=16, height=16, spp=1, max_bounces=2,
                           has_dome=False)
        params = make_params(cfg, uni, jnp.int32(0))
        k = np.random.default_rng(7)
        o = jnp.asarray(k.uniform(-2, 2, (1024, 3)) + np.asarray(center),
                        jnp.float32)
        d = jnp.asarray(k.normal(size=(1024, 3)), jnp.float32)
        d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
        state = pack_state(o, d, jnp.zeros((1024,), jnp.uint32), 1024)
        saved = pb._XLA_P2
        try:
            with pltpu.force_tpu_interpret_mode():
                pb._XLA_P2 = True
                a = np.asarray(trace_step(params, scene, state,
                                          static=static))
                pb._XLA_P2 = False
                b = np.asarray(trace_step(params, scene, state,
                                          static=static))
        finally:
            pb._XLA_P2 = saved
        assert a.shape == b.shape
        assert a[0].sum() > 0  # some rays hit
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    geom, table, uni = _cornell()
    lights = build_light_arrays([_rect_light()])
    scene, static = build_fused_scene(geom, table, lights, resident_max=0)
    assert static.clustered and not static.instanced
    compare(scene, static, uni, (0.0, 1.0, 2.5))

    meshes, midx, itable = _instanced_scene()
    iscene, istatic = build_fused_scene_instanced(
        meshes, midx, itable, lights, min_gain=1.5, min_flat=0)
    assert istatic.instanced
    compare(iscene, istatic, _instanced_uniforms(), (0.0, 0.0, 8.0))

    # clustered + tangents (normal-mapped): the finalize's CLU_T*/CLU_BS
    # interpolation + orthonormalization branch
    from gatling_tpu.render.material import build_materials
    from gatling_tpu.render.texture import TextureRef
    desc = load_scene(CORNELL)
    mat_paths = sorted({m.material for m in desc.meshes if m.material})
    midx2 = {p: i for i, p in enumerate(mat_paths)}
    midx2[None] = len(mat_paths)
    geom2 = build_geometry(desc.meshes, midx2)
    rows = [None] * len(midx2)
    for p, i in midx2.items():
        rows[i] = lower_material(desc.materials.get(p) if p else None)
    import numpy as _np
    from gatling_tpu import imgio as _imgio
    import tempfile, os as _os
    nm = _np.full((2, 2, 4), 128, _np.uint8)
    nm[..., 2] = 255
    with tempfile.TemporaryDirectory() as td:
        nm_path = _os.path.join(td, "flat.png")
        _imgio.write_image_file(nm_path, nm)
        for r2 in rows:
            r2.textures["normal"] = TextureRef(file_path=nm_path,
                                               is_srgb=False)
        ttable, _tpool = build_materials(rows)
    tscene, tstatic = build_fused_scene(geom2, ttable, lights,
                                        resident_max=0)
    assert tstatic.clustered and tstatic.tangents
    compare(tscene, tstatic, uni, (0.0, 1.0, 2.5))


def test_fused_instanced_normal_map_matches_flattened(tmp_path):
    """Normal-mapped INSTANCED walks: tangent rows ride the shared local
    clusters and the XLA pass-2 finalize transforms them to world per
    instance (vector transform, exact adjugate inverse). Images must match
    the flattened clustered build, whose world-space tangent path is
    independently validated against the general integrator."""
    import dataclasses

    from gatling_tpu import imgio
    from gatling_tpu.ops.geometry import build_geometry
    from gatling_tpu.ops.pallas_bounce import build_fused_scene_instanced
    from gatling_tpu.render.material import (LoweredMaterial, MaterialTraits,
                                             _DEFAULTS, build_materials)
    from gatling_tpu.render.texture import TextureRef

    meshes, midx, _ = _instanced_scene()
    nm = np.zeros((2, 2, 4), np.uint8)
    nm[..., 0] = 200  # strong +x tangent-space lean
    nm[..., 1] = 128
    nm[..., 2] = 230
    nm[..., 3] = 255
    nm_path = tmp_path / "lean.png"
    imgio.write_image_file(nm_path, nm)
    rows = []
    for base in ((0.8, 0.2, 0.2), (0.2, 0.4, 0.8), (0.7, 0.7, 0.7),
                 (0.8, 0.8, 0.8)):
        m = LoweredMaterial(params=dict(_DEFAULTS), traits=MaterialTraits(),
                            textures={})
        m.params.update(base_color=base, roughness=0.5)
        m.textures["normal"] = TextureRef(
            file_path=str(nm_path), is_srgb=False,
            scale=(2.0, 2.0, 2.0, 1.0), bias=(-1.0, -1.0, -1.0, 0.0))
        rows.append(m)
    table, pool = build_materials(rows)

    uni = _instanced_uniforms()
    lights = build_light_arrays([_rect_light()])
    res = build_fused_scene_instanced(meshes, midx, table, lights,
                                      min_gain=1.5, min_flat=0)
    assert res is not None
    iscene, istatic = res
    assert istatic.instanced and istatic.tangents

    geom = build_geometry(meshes, midx)
    fscene, fstatic = build_fused_scene(geom, table, lights, resident_max=0)
    assert fstatic.clustered and fstatic.tangents

    istatic = dataclasses.replace(istatic, textured=True)
    fstatic = dataclasses.replace(fstatic, textured=True)
    cfg = RenderConfig(width=12, height=12, spp=2, max_bounces=2, nee=True,
                       has_dome=False, rr_bounce_offset=100)
    pix = jnp.arange(144, dtype=jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        a = np.asarray(render_pixels_fused(
            cfg, uni, iscene, default_dome(), pix, 2, jnp.int32(0),
            static=istatic, materials=table, textures=pool))
        b = np.asarray(render_pixels_fused(
            cfg, uni, fscene, default_dome(), pix, 2, jnp.int32(0),
            static=fstatic, materials=table, textures=pool))
    assert np.isfinite(a).all()
    assert a.max() > 0.0
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_fused_instanced_aniso_matches_flattened():
    """Anisotropic GGX on INSTANCED walks: the advanced shade's mesh-tangent
    frame comes from the same per-instance world-transformed tangent rows;
    images must match the flattened clustered build."""
    import dataclasses

    from gatling_tpu.ops.geometry import build_geometry
    from gatling_tpu.ops.pallas_bounce import build_fused_scene_instanced
    from gatling_tpu.render.material import (LoweredMaterial, MaterialTraits,
                                             _DEFAULTS, build_materials)

    meshes, midx, _ = _instanced_scene()
    rows = []
    for base in ((0.8, 0.2, 0.2), (0.2, 0.4, 0.8), (0.7, 0.7, 0.7),
                 (0.8, 0.8, 0.8)):
        m = LoweredMaterial(params=dict(_DEFAULTS), traits=MaterialTraits(),
                            textures={})
        m.params.update(base_color=base, roughness=0.3, metallic=1.0,
                        anisotropy=0.8)
        rows.append(m)
    table, pool = build_materials(rows)

    uni = _instanced_uniforms()
    lights = build_light_arrays([_rect_light()])
    res = build_fused_scene_instanced(meshes, midx, table, lights,
                                      min_gain=1.5, min_flat=0)
    assert res is not None
    iscene, istatic = res
    assert istatic.instanced and istatic.tangents and istatic.advanced

    geom = build_geometry(meshes, midx)
    fscene, fstatic = build_fused_scene(geom, table, lights, resident_max=0)
    assert fstatic.tangents and fstatic.advanced

    istatic = dataclasses.replace(istatic, textured=True)
    fstatic = dataclasses.replace(fstatic, textured=True)
    cfg = RenderConfig(width=12, height=12, spp=2, max_bounces=2, nee=True,
                       has_dome=False, rr_bounce_offset=100)
    pix = jnp.arange(144, dtype=jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        a = np.asarray(render_pixels_fused(
            cfg, uni, iscene, default_dome(), pix, 2, jnp.int32(0),
            static=istatic, materials=table, textures=pool))
        b = np.asarray(render_pixels_fused(
            cfg, uni, fscene, default_dome(), pix, 2, jnp.int32(0),
            static=fstatic, materials=table, textures=pool))
    assert np.isfinite(a).all() and a.max() > 0.0
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
