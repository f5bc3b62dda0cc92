"""Distinct MDL backface surfaces (reference: Backend.cpp DF_NAMES backface
scattering/emission/intensity, Frontend.cpp:104-121).

The front end lowers the `backface:` material_surface into its own param
dict; build_material_table appends a second material row; the wavefront
integrator shades back-facing hits with it (MaterialTable.backface_id)."""

import numpy as np
import jax.numpy as jnp

from gatling_tpu.ops.geometry import build_geometry
from gatling_tpu.render.integrator import (DomeLightData, RenderConfig,
                                           Uniforms, render_pixels)
from gatling_tpu.render.camera import CameraUniforms
from gatling_tpu.render.material import (MI_BACKFACE_ID, build_material_table,
                                         lower_material)
from gatling_tpu.render.mdl import load_mdl_material
from gatling_tpu.scene.meshproc import build_triangulated_mesh
from gatling_tpu.scene.stage import MeshDesc
from gatling_tpu.interface import empty_light_arrays

TWO_FACE_MDL = """
mdl 1.6;
import ::df::*;
export material two_face(color front_tint = color(0.7, 0.2, 0.1))
 = material(
    thin_walled: true,
    ior: color(1.0),
    surface: material_surface(
        scattering: df::diffuse_reflection_bsdf(tint: front_tint)
    ),
    backface: material_surface(
        scattering: df::diffuse_reflection_bsdf(tint: color(0.1, 0.3, 0.8))
    )
);
"""


def _two_face(tmp_path):
    p = tmp_path / "two_face.mdl"
    p.write_text(TWO_FACE_MDL)
    return lower_material(load_mdl_material(p, "two_face"))


def test_mdl_backface_lowering(tmp_path):
    m = _two_face(tmp_path)
    assert m.traits.has_backface_bsdf
    np.testing.assert_allclose(m.params["base_color"], (0.7, 0.2, 0.1), atol=1e-6)
    np.testing.assert_allclose(m.backface["base_color"], (0.1, 0.3, 0.8), atol=1e-6)


def test_backface_table_rows(tmp_path):
    m = _two_face(tmp_path)
    plain = lower_material(None)
    table = build_material_table([m, plain])
    # appended backface row at index 2
    assert table.count == 3
    bfid = np.asarray(table.packed_i[:, MI_BACKFACE_ID])
    assert list(bfid) == [2, 1, 2]
    np.testing.assert_allclose(np.asarray(table.base_color[2]),
                               (0.1, 0.3, 0.8), atol=1e-6)
    # backface row emission defaults to none (material_surface() default)
    np.testing.assert_allclose(np.asarray(table.emissive[2]), 0.0, atol=1e-6)


def _uniforms(pos, forward):
    return Uniforms(
        camera=CameraUniforms(
            position=jnp.asarray(pos, jnp.float32),
            forward=jnp.asarray(forward, jnp.float32),
            up=jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
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


def test_backface_render_furnace(tmp_path):
    """Furnace check from both sides of a double-sided Lambertian plane in
    a uniform dome: viewed from the front the reflectance is the FRONT
    albedo, from behind the BACKFACE albedo — the facing-dependent row
    selection in one render each."""
    m = _two_face(tmp_path)
    m.params["thin_walled"] = 0
    pts = np.array([[-50, -50, 0], [50, -50, 0], [-50, 50, 0], [50, 50, 0]],
                   np.float32)
    mesh = build_triangulated_mesh(pts, np.array([4]), np.array([0, 1, 3, 2]))
    meshes = [MeshDesc(path="/p", mesh=mesh, transform=np.eye(4),
                       material="m", double_sided=True, object_id=0)]
    geom = build_geometry(meshes, {"m": 0, None: 1})
    table = build_material_table([m, lower_material(None)])
    dome = DomeLightData(texture=jnp.full((1, 1, 3), 1.0, jnp.float32),
                         fallback=jnp.zeros((1, 1, 3), jnp.float32))
    cfg = RenderConfig(width=8, height=8, spp=64, max_bounces=2,
                       jittered=False, fis=False, has_dome=True,
                       rr_bounce_offset=100, has_backface=True)
    pix = jnp.arange(64, dtype=jnp.int32)

    front = np.asarray(render_pixels(
        cfg, _uniforms([0, 0, 4.0], [0, 0, -1]), geom, table,
        empty_light_arrays(), dome, pix, 64, jnp.int32(0)).color)
    back = np.asarray(render_pixels(
        cfg, _uniforms([0, 0, -4.0], [0, 0, 1]), geom, table,
        empty_light_arrays(), dome, pix, 64, jnp.int32(0)).color)

    np.testing.assert_allclose(front.reshape(8, 8, 3)[2:6, 2:6].mean(axis=(0, 1)),
                               (0.7, 0.2, 0.1), rtol=0.08)
    np.testing.assert_allclose(back.reshape(8, 8, 3)[2:6, 2:6].mean(axis=(0, 1)),
                               (0.1, 0.3, 0.8), rtol=0.08)
