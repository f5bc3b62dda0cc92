"""Volume rendering tests: Beer-Lambert absorption through a transmissive
slab (medium stack level 0 and full stack), reference behavior from
rp_main.chit:160-186 (transmittance) and :446-480 (medium stack)."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from gatling_tpu.interface import AovId, aov_bit, empty_light_arrays
from gatling_tpu.ops.geometry import build_geometry
from gatling_tpu.render.camera import CameraUniforms
from gatling_tpu.render.integrator import (
    RenderConfig,
    Uniforms,
    default_dome,
    trace_sample,
)
from gatling_tpu.render.material import build_material_table, lower_material, _DEFAULTS
from gatling_tpu.render.material import LoweredMaterial, MaterialTraits
from gatling_tpu.scene.meshproc import build_triangulated_mesh
from gatling_tpu.scene.stage import MeshDesc


def _quad(z: float, size: float = 5.0, flip: bool = False):
    pts = np.array([[-size, -size, z], [size, -size, z], [-size, size, z], [size, size, z]], np.float32)
    order = np.array([2, 3, 1, 0]) if flip else np.array([0, 1, 3, 2])
    return build_triangulated_mesh(pts, np.array([4]), order)


def _slab_scene(sigma_a=(0.5, 1.0, 2.0)):
    """Camera at z=+5 looking -z; absorbing slab faces at z=1 (front) and
    z=-1 (back); emissive wall at z=-3."""
    meshes = [
        MeshDesc(path="/slab_front", mesh=_quad(1.0), transform=np.eye(4),
                 material="glass", double_sided=True, object_id=0),
        # back face winds the other way: its outward normal points -z so a
        # ray exiting the slab sees a back face (medium stack pop)
        MeshDesc(path="/slab_back", mesh=_quad(-1.0, flip=True), transform=np.eye(4),
                 material="glass", double_sided=True, object_id=1),
        MeshDesc(path="/wall", mesh=_quad(-3.0), transform=np.eye(4),
                 material="wall", double_sided=True, object_id=2),
    ]
    midx = {"glass": 0, "wall": 1, None: 2}
    geom = build_geometry(meshes, midx)

    glass = LoweredMaterial(params=dict(_DEFAULTS), traits=MaterialTraits(), textures={})
    # ior=1 -> zero Fresnel reflection, so pass-through is exact and the
    # Beer-Lambert expectation has no reflection-loss term
    glass.params.update(transmission=1.0, volume_absorption=sigma_a,
                        roughness=0.1, ior=1.0)
    wall = LoweredMaterial(params=dict(_DEFAULTS), traits=MaterialTraits(), textures={})
    wall.params.update(emissive=(2.0, 2.0, 2.0), base_color=(0.0, 0.0, 0.0))
    table = build_material_table([glass, wall, lower_material(None)])
    return geom, table


def _uniforms():
    return Uniforms(
        camera=CameraUniforms(
            # x offset breaks the x==y symmetry: a centered camera would
            # shoot rays exactly along the quads' diagonal seam, where
            # Moller-Trumbore is not watertight under FMA contraction
            position=jnp.asarray([0.37, 0.11, 5.0]),
            forward=jnp.asarray([0.0, 0.0, -1.0]),
            up=jnp.asarray([0.0, 1.0, 0.0]),
            vfov=jnp.float32(0.2),  # narrow: rays nearly axis-aligned
            lens_radius=jnp.float32(0), focus_distance=jnp.float32(0),
            sensor_exposure=jnp.float32(0),
            clip_start=jnp.float32(0.01), clip_end=jnp.float32(100.0)),
        sample_offset=jnp.int32(0),
        inv_total_sample_count=jnp.float32(1.0),
        max_sample_value=jnp.float32(100.0),
        rr_inv_min_term_prob=jnp.float32(0.95),
        light_intensity_multiplier=jnp.float32(1.0),
        meters_per_scene_unit=jnp.float32(1.0),
        max_volume_walk_length=jnp.int32(7),
        dome_rotation=jnp.asarray([0, 0, 0, 1.0], jnp.float32),
        dome_emission_multiplier=jnp.zeros(3, jnp.float32),
        dome_diffuse_specular=jnp.ones(2, jnp.float32),
    )


def _render_center(config, geom, table):
    n = config.width * config.height
    pix = jnp.arange(n, dtype=jnp.int32)
    res = trace_sample(config, _uniforms(), geom, table, empty_light_arrays(),
                       default_dome(), pix, jnp.int32(0))
    img = np.asarray(res.color).reshape(config.height, config.width, 3)
    return img[config.height // 2, config.width // 2]


def test_absorption_beer_lambert_stack0():
    sigma = (0.5, 1.0, 2.0)
    geom, table = _slab_scene(sigma)
    config = RenderConfig(width=8, height=8, spp=1, max_bounces=6,
                          jittered=False, fis=False, has_volumes=True,
                          medium_stack_size=0, rr_bounce_offset=100)
    c = _render_center(config, geom, table)
    # slab thickness 2: expect emissive 2.0 * exp(-sigma * 2)
    expected = 2.0 * np.exp(-2.0 * np.asarray(sigma))
    np.testing.assert_allclose(c, expected, rtol=0.05)


def test_absorption_beer_lambert_stack2():
    sigma = (0.3, 0.6, 1.2)
    geom, table = _slab_scene(sigma)
    config = RenderConfig(width=8, height=8, spp=1, max_bounces=6,
                          jittered=False, fis=False, has_volumes=True,
                          medium_stack_size=2, rr_bounce_offset=100)
    c = _render_center(config, geom, table)
    expected = 2.0 * np.exp(-2.0 * np.asarray(sigma))
    np.testing.assert_allclose(c, expected, rtol=0.05)


def test_no_volume_passthrough():
    geom, table = _slab_scene((0.0, 0.0, 0.0))
    config = RenderConfig(width=8, height=8, spp=1, max_bounces=6,
                          jittered=False, fis=False, has_volumes=True,
                          medium_stack_size=0, rr_bounce_offset=100)
    c = _render_center(config, geom, table)
    np.testing.assert_allclose(c, [2.0, 2.0, 2.0], rtol=0.02)


def test_scattering_medium_conserves_energy_roughly():
    """Isotropic scattering with albedo 1: flux is redirected, not absorbed.
    Just assert the render is finite, non-negative, and darker in the direct
    channel than the no-medium case (light is scattered away)."""
    from gatling_tpu.render.material import _pack_material_table

    geom, table = _slab_scene((0.0, 0.0, 0.0))
    # inject scattering into the glass material row (repack the gather mirror)
    table = _pack_material_table(table._replace(
        volume_scattering=table.volume_scattering.at[0].set(jnp.asarray([1.0, 1.0, 1.0]))))
    config = RenderConfig(width=8, height=8, spp=8, max_bounces=12,
                          jittered=False, fis=False, has_volumes=True,
                          medium_stack_size=2, rr_bounce_offset=100)
    n = config.width * config.height
    pix = jnp.arange(n, dtype=jnp.int32)
    res = trace_sample(config, _uniforms(), geom, table, empty_light_arrays(),
                       default_dome(), pix, jnp.int32(0))
    img = np.asarray(res.color)
    assert np.isfinite(img).all()
    assert (img >= 0).all()
    center = img.reshape(8, 8, 3)[4, 4]
    assert center.mean() < 2.0  # some light scattered out of the path


# ---------------------------------------------------------------------------
# Fused scatter mode (VERDICT r4 item 6): depth-1 medium scattering inside
# the fused kernels (FusedStatic.scatter) vs the wavefront
# ---------------------------------------------------------------------------


def _fused_volume_render(geom, table, config, spp):
    import dataclasses

    from jax.experimental.pallas import tpu as pltpu

    from gatling_tpu.ops.pallas_bounce import build_fused_scene
    from gatling_tpu.render.fused import render_pixels_fused

    scene, static = build_fused_scene(geom, table, None)
    static = dataclasses.replace(
        static, volumes=True, scatter=config.medium_stack_size == 1)
    n = config.width * config.height
    pix = jnp.arange(n, dtype=jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        img = np.asarray(render_pixels_fused(
            config, _uniforms(), scene, default_dome(), pix, spp,
            jnp.int32(0), static=static))
    return img.reshape(config.height, config.width, 3)


def test_fused_scatter_absorption_parity():
    """Pure-absorption slab at stack 1: the fused scatter mode reproduces
    Beer-Lambert through the ENTERED medium's sigma exactly."""
    sigma = (0.5, 1.0, 2.0)
    geom, table = _slab_scene(sigma)
    config = RenderConfig(width=8, height=8, spp=1, max_bounces=6,
                          jittered=False, fis=False, has_volumes=True,
                          medium_stack_size=1, rr_bounce_offset=100,
                          has_dome=False)
    img = _fused_volume_render(geom, table, config, 1)
    expected = 2.0 * np.exp(-2.0 * np.asarray(sigma))
    np.testing.assert_allclose(img[4, 4], expected, rtol=0.05)


def test_fused_scatter_distribution_parity():
    """Fog slab (isotropic scattering, albedo ~0.7) in front of an
    emissive wall: fused scatter mode matches the wavefront's stack-1
    estimator in distribution."""
    import dataclasses as _dc

    from gatling_tpu.render.integrator import render_pixels
    from gatling_tpu.render.material import _pack_material_table

    geom, table = _slab_scene((0.3, 0.3, 0.3))
    table = _pack_material_table(table._replace(
        volume_scattering=table.volume_scattering.at[0].set(
            jnp.asarray([0.7, 0.7, 0.7]))))
    config = RenderConfig(width=8, height=8, spp=48, max_bounces=10,
                          jittered=False, fis=False, has_volumes=True,
                          medium_stack_size=1, rr_bounce_offset=100,
                          has_dome=False)
    fused = _fused_volume_render(geom, table, config, 48)
    pix = jnp.arange(64, dtype=jnp.int32)
    gen = np.asarray(render_pixels(
        config, _uniforms(), geom, table, empty_light_arrays(),
        default_dome(), pix, 48, jnp.int32(0)).color).reshape(8, 8, 3)
    assert np.isfinite(fused).all() and (fused >= 0).all()
    # scattering attenuates the direct wall view below the no-scatter case
    direct = 2.0 * np.exp(-2.0 * 0.3)
    assert fused[4, 4].mean() < direct + 0.05
    rel = abs(fused.mean() - gen.mean()) / max(gen.mean(), 1e-6)
    assert rel < 0.2, (fused.mean(), gen.mean())


def test_fused_scatter_walk_terminates():
    """A dense high-albedo medium must not loop forever: the walk cap
    (maxVolumeWalkLength) bounds scattering events and the render stays
    finite."""
    from gatling_tpu.render.material import _pack_material_table

    geom, table = _slab_scene((0.1, 0.1, 0.1))
    table = _pack_material_table(table._replace(
        volume_scattering=table.volume_scattering.at[0].set(
            jnp.asarray([5.0, 5.0, 5.0]))))
    config = RenderConfig(width=8, height=8, spp=4, max_bounces=12,
                          jittered=False, fis=False, has_volumes=True,
                          medium_stack_size=1, rr_bounce_offset=100,
                          has_dome=False)
    img = _fused_volume_render(geom, table, config, 4)
    assert np.isfinite(img).all() and (img >= 0).all()
