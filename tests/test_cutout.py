"""Cutout transparency tests (reference: rp_main.ahit stochastic cutout)."""

import numpy as np
import jax.numpy as jnp

from gatling_tpu.interface import empty_light_arrays
from gatling_tpu.ops.geometry import build_geometry
from gatling_tpu.render.integrator import RenderConfig, default_dome, trace_sample
from gatling_tpu.render.material import (
    LoweredMaterial,
    MaterialTraits,
    _DEFAULTS,
    build_material_table,
    lower_material,
)
from gatling_tpu.scene.meshproc import build_triangulated_mesh
from gatling_tpu.scene.stage import MeshDesc
from tests.test_volumes import _quad, _uniforms


def _cutout_scene(opacity: float, threshold: float = 0.0):
    """Half-transparent screen at z=1 in front of an emissive wall at z=-3."""
    meshes = [
        MeshDesc(path="/screen", mesh=_quad(1.0), transform=np.eye(4),
                 material="screen", double_sided=True, object_id=0),
        MeshDesc(path="/wall", mesh=_quad(-3.0), transform=np.eye(4),
                 material="wall", double_sided=True, object_id=1),
    ]
    midx = {"screen": 0, "wall": 1, None: 2}
    geom = build_geometry(meshes, midx)
    screen = LoweredMaterial(params=dict(_DEFAULTS), traits=MaterialTraits(has_cutout=True), textures={})
    screen.params.update(opacity=opacity, opacity_threshold=threshold,
                         base_color=(0.0, 0.0, 0.0))
    wall = LoweredMaterial(params=dict(_DEFAULTS), traits=MaterialTraits(), textures={})
    wall.params.update(emissive=(1.0, 1.0, 1.0), base_color=(0.0, 0.0, 0.0))
    table = build_material_table([screen, wall, lower_material(None)])
    return geom, table


def _render_mean(geom, table, spp=64):
    import functools
    import jax

    from gatling_tpu.render.integrator import render_pixels

    config = RenderConfig(width=8, height=8, spp=spp, max_bounces=3,
                          jittered=False, fis=False, has_cutout=True,
                          rr_bounce_offset=100)
    n = config.width * config.height
    pix = jnp.arange(n, dtype=jnp.int32)
    fn = jax.jit(functools.partial(
        render_pixels, config), static_argnames=("spp",))
    res = fn(_uniforms(), geom, table, empty_light_arrays(), default_dome(),
             pix, spp=spp, sample_offset=jnp.int32(0))
    img = np.asarray(res.color).reshape(config.height, config.width, 3)
    return img[2:-2, 2:-2].mean()


def test_cutout_pass_probability():
    # opacity 0.3 -> 70% of rays pass through and see the emissive wall (1.0);
    # the other 30% shade a black screen
    geom, table = _cutout_scene(opacity=0.3)
    mean = _render_mean(geom, table)
    assert abs(mean - 0.7) < 0.08


def test_cutout_threshold_binary():
    # threshold 0.5 with opacity 0.3 -> fully transparent (binary cutout)
    geom, table = _cutout_scene(opacity=0.3, threshold=0.5)
    mean = _render_mean(geom, table, spp=8)
    assert mean > 0.95
    # threshold 0.5 with opacity 0.8 -> fully opaque
    geom, table = _cutout_scene(opacity=0.8, threshold=0.5)
    mean = _render_mean(geom, table, spp=8)
    assert mean < 0.05
