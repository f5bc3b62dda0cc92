"""Fused bounce megakernel vs general integrator (interpret mode on CPU).

The fused path uses the same RNG streams but a Duff-ONB shading frame
(instead of mesh tangents), so individual samples differ by an azimuthal
rotation; the estimators agree in distribution. Tests compare image means
over many samples.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from gatling_tpu.interface import empty_light_arrays
from gatling_tpu.ops.geometry import build_geometry
from gatling_tpu.ops.pallas_bounce import build_fused_scene
from gatling_tpu.render.fused import render_pixels_fused, supports_fused
from gatling_tpu.render.integrator import RenderConfig, default_dome, render_pixels
from gatling_tpu.render.material import build_material_table, lower_material
from gatling_tpu.render.camera import CameraUniforms
from gatling_tpu.render.integrator import Uniforms
from gatling_tpu.scene.stage import load_scene

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


def test_supports_fused_gate():
    cfg = RenderConfig(8, 8, has_dome=False)
    assert supports_fused(cfg, has_textures=False)
    assert not supports_fused(cfg, has_textures=True)
    assert not supports_fused(RenderConfig(8, 8, nee=True, has_dome=False), False)
    assert not supports_fused(RenderConfig(8, 8), False)  # dome default on


def test_fused_matches_general_statistics():
    geom, table, uni = _cornell()
    scene = build_fused_scene(geom, table)
    w = h = 24
    spp = 48
    cfg = RenderConfig(width=w, height=h, spp=spp, max_bounces=4,
                       has_dome=False, rr_bounce_offset=100)
    n = w * h
    pix = jnp.arange(n, dtype=jnp.int32)

    with pltpu.force_tpu_interpret_mode():
        fused = np.asarray(render_pixels_fused(
            cfg, uni, scene, pix, spp, jnp.int32(0),
            n_tris=scene.n_tris, n_mats=int(scene.mats.shape[0])))

    general = np.asarray(render_pixels(
        cfg, uni, geom, table, empty_light_arrays(), default_dome(),
        pix, spp, jnp.int32(0)).color)

    f = fused.reshape(h, w, 3)
    g = general.reshape(h, w, 3)
    # overall brightness within MC noise
    assert abs(f.mean() - g.mean()) / max(g.mean(), 1e-6) < 0.12
    # spatial structure agrees: downsampled images correlate strongly
    fd = f.reshape(6, 4, 6, 4, 3).mean(axis=(1, 3)).ravel()
    gd = g.reshape(6, 4, 6, 4, 3).mean(axis=(1, 3)).ravel()
    corr = np.corrcoef(fd, gd)[0, 1]
    assert corr > 0.95
    assert np.isfinite(f).all() and (f >= 0).all()
