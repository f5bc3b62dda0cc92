import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
"""Textured fused path vs wavefront integrator on REAL TPU: statistical
parity (mean/corr) + frame timing. Fast sanity for split-bounce changes
without the interpret-mode CPU cost."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from gatling_tpu.scene.stage import load_scene
from gatling_tpu.ops.geometry import build_geometry
from gatling_tpu.render.material import (build_materials, lower_material,
                                         textured_params)
from gatling_tpu.render.texture import TextureRef
from gatling_tpu.render.integrator import (RenderConfig, Uniforms,
                                           default_dome, render_pixels)
from gatling_tpu.render.camera import CameraUniforms
from gatling_tpu.render.fused import render_pixels_fused
from gatling_tpu.ops.pallas_bounce import build_fused_scene
from gatling_tpu.interface import AovId, aov_bit, empty_light_arrays
from gatling_tpu import imgio
import dataclasses

W = H = int(os.environ.get("CHECK_RES", "256"))
SPP = int(os.environ.get("CHECK_SPP", "16"))
NEE = os.environ.get("CHECK_NEE", "0") == "1"

desc = load_scene("/root/reference/cornell.usda")
mat_paths = sorted({m.material for m in desc.meshes if m.material})
midx = {p: i for i, p in enumerate(mat_paths)}
midx[None] = len(mat_paths)
geom = build_geometry(desc.meshes, midx)
rows = [None] * len(midx)
for p, i in midx.items():
    rows[i] = lower_material(desc.materials.get(p) if p else None)

img = np.zeros((64, 64, 4), np.uint8)
img[..., 3] = 255
c = ((np.arange(64)[:, None] // 8 + np.arange(64)[None, :] // 8) % 2)
img[..., 0] = np.where(c, 230, 90)
img[..., 1] = np.where(c, 200, 120)
img[..., 2] = np.where(c, 90, 220)
imgio.write_image_file("/tmp/gatling_bench_checker.png", img)
for r in rows:
    r.textures["base_color"] = TextureRef(
        file_path="/tmp/gatling_bench_checker.png", is_srgb=False)
table, pool = build_materials(rows)
lights = empty_light_arrays()
if NEE:
    from gatling_tpu.render.lights import build_light_arrays
    from tests.test_fused import _rect_light
    lights = build_light_arrays([_rect_light()])

cam = desc.first_camera()
config = RenderConfig(width=W, height=H, spp=SPP, max_bounces=8,
                      rr_bounce_offset=3, nee=NEE,
                      aov_mask=aov_bit(AovId.COLOR))
cu = CameraUniforms(
    position=jnp.asarray(cam.position, jnp.float32),
    forward=jnp.asarray(cam.forward, jnp.float32),
    up=jnp.asarray(cam.up, jnp.float32),
    vfov=jnp.float32(cam.vfov), lens_radius=jnp.float32(0),
    focus_distance=jnp.float32(0), sensor_exposure=jnp.float32(0),
    clip_start=jnp.float32(cam.clip_start), clip_end=jnp.float32(cam.clip_end))
uni = Uniforms(camera=cu, sample_offset=jnp.int32(0),
    inv_total_sample_count=jnp.float32(1.0), max_sample_value=jnp.float32(10.0),
    rr_inv_min_term_prob=jnp.float32(0.95),
    light_intensity_multiplier=jnp.float32(1.0),
    meters_per_scene_unit=jnp.float32(1.0), max_volume_walk_length=jnp.int32(7),
    dome_rotation=jnp.asarray([0, 0, 0, 1], jnp.float32),
    dome_emission_multiplier=jnp.ones(3, jnp.float32),
    dome_diffuse_specular=jnp.ones(2, jnp.float32))

scene, static = build_fused_scene(geom, table, lights)
static = dataclasses.replace(static, textured=True,
                             textured_params=textured_params(rows))
dome = default_dome()
n = W * H
pix = jnp.arange(n, dtype=jnp.int32)

t0 = time.perf_counter()
fused = np.asarray(render_pixels_fused(
    config, uni, scene, dome, pix, SPP, jnp.int32(0), static=static,
    materials=table, textures=pool))
t_compile = time.perf_counter() - t0
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    fused = np.asarray(render_pixels_fused(
        config, uni, scene, dome, pix, SPP, jnp.int32(0), static=static,
        materials=table, textures=pool))
    ts.append(time.perf_counter() - t0)
print(f"fused textured: compile+run {t_compile:.1f}s, min frame {min(ts)*1e3:.1f} ms")

general = np.asarray(render_pixels(
    config, uni, geom, table, lights, dome, pix, SPP, jnp.int32(0),
    textures=pool).color)

f = fused.reshape(H, W, 3)
g = general.reshape(H, W, 3)
assert np.isfinite(f).all() and (f >= 0).all()
rel = abs(f.mean() - g.mean()) / max(g.mean(), 1e-6)
fd = f.reshape(H // 4, 4, W // 4, 4, 3).mean(axis=(1, 3)).ravel()
gd = g.reshape(H // 4, 4, W // 4, 4, 3).mean(axis=(1, 3)).ravel()
corr = np.corrcoef(fd, gd)[0, 1]
print(f"mean fused={f.mean():.5f} general={g.mean():.5f} rel={rel:.4f} corr={corr:.4f}")
assert rel < 0.05 and corr > 0.97, (rel, corr)
print("PARITY OK")
