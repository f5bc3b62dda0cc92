import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
"""Fixed-vs-marginal per-spp cost of the textured fused path.

Times render_pixels_fused end-to-end at spp in {1,2,4,8,16} on the
GATLING_BENCH_TEXTURED cornell config, plus the per-spp XLA glue stages
(raygen+pack, final unsort+unpack+clamp+accumulate) in isolation, to
locate the ~50 ms/spp not explained by the measured bounce bodies.
"""
import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

from gatling_tpu.scene.stage import load_scene
from gatling_tpu.ops.geometry import build_geometry
from gatling_tpu.render.material import (build_materials, lower_material,
                                         textured_params)
from gatling_tpu.render.texture import TextureRef
from gatling_tpu.render.lights import build_light_arrays
from gatling_tpu.render.integrator import RenderConfig, Uniforms, default_dome
from gatling_tpu.render.camera import CameraUniforms, generate_primary_rays
from gatling_tpu.render.fused import render_pixels_fused, _sort_chunks
from gatling_tpu.ops.pallas_bounce import (build_fused_scene, pack_state,
                                           make_params, unpack_radiance,
                                           unpack_rows)
from gatling_tpu import imgio
from gatling_tpu.ops import sampling as smp
from gatling_tpu.interface import AovId, aov_bit

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
    r.textures["base_color"] = TextureRef(file_path="/tmp/gatling_bench_checker.png", is_srgb=False)
table, pool = build_materials(rows)
lights = build_light_arrays([])
cam = desc.first_camera()
W = H = 1200
config = RenderConfig(width=W, height=H, spp=16, max_bounces=8,
                      rr_bounce_offset=3, aov_mask=aov_bit(AovId.COLOR))
cu = CameraUniforms(
    position=jnp.asarray(cam.position, jnp.float32),
    forward=jnp.asarray(cam.forward, jnp.float32),
    up=jnp.asarray(cam.up, jnp.float32),
    vfov=jnp.float32(cam.vfov), lens_radius=jnp.float32(0),
    focus_distance=jnp.float32(0), sensor_exposure=jnp.float32(0),
    clip_start=jnp.float32(cam.clip_start), clip_end=jnp.float32(cam.clip_end))
uni = Uniforms(camera=cu, sample_offset=jnp.int32(0),
    inv_total_sample_count=jnp.float32(1.0 / 16), max_sample_value=jnp.float32(10.0),
    rr_inv_min_term_prob=jnp.float32(0.95),
    light_intensity_multiplier=jnp.float32(1.0),
    meters_per_scene_unit=jnp.float32(1.0), max_volume_walk_length=jnp.int32(7),
    dome_rotation=jnp.asarray([0,0,0,1], jnp.float32),
    dome_emission_multiplier=jnp.ones(3, jnp.float32),
    dome_diffuse_specular=jnp.ones(2, jnp.float32))

scene, static = build_fused_scene(geom, table, lights)
static_tex = dataclasses.replace(static, textured=True,
                                 textured_params=textured_params(rows))
dome = default_dome()

n = W * H
pix = jnp.arange(n, dtype=jnp.int32)
px, py = pix % W, pix // W

RTT = 0.028


def fence(x):
    leaves = jax.tree.leaves(x)
    float(jnp.sum(leaves[0][(0,) * leaves[0].ndim]))


def bench(name, f, *args, n_iter=4):
    out = f(*args)
    fence(out)
    ts = []
    for _ in range(n_iter):
        t0 = time.perf_counter()
        out = f(*args)
        fence(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} min {(min(ts)-RTT)*1e3:9.2f} ms")
    return min(ts) - RTT


print(f"backend={jax.default_backend()}")

for spp in (1, 2, 4, 8, 16):
    cfg = dataclasses.replace(config, spp=spp)
    t = bench(f"render_pixels_fused textured spp={spp}",
              lambda: render_pixels_fused(
                  cfg, uni, scene, dome, pix, spp, jnp.int32(0),
                  static=static_tex, with_stats=True,
                  materials=table, textures=pool))

# per-spp glue in isolation
K = 16


def bench_k(name, fn, x):
    f = jax.jit(lambda a: jax.lax.fori_loop(0, K, lambda i, c: fn(c), a))
    out = f(x)
    fence(out)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        out = f(x)
        fence(out)
        ts.append(time.perf_counter() - t0)
    per = (min(ts) - RTT) / K * 1e3
    print(f"{name:44s} {per:9.2f} ms/iter")


r_pad = -(-n // 1024) * 1024


def raygen_pack(seed_state):
    rng = smp.rng_init(pix.astype(jnp.uint32),
                       seed_state[0, 0, :1].astype(jnp.uint32)[0])
    o, d, rng = generate_primary_rays(cu, W, H, px, py, rng, True, True, False)
    return pack_state(o, d, rng, r_pad)


state0 = jax.jit(raygen_pack)(jnp.zeros((16, r_pad // 128, 128), jnp.float32))
bench_k("raygen + pack_state", raygen_pack, state0)


def post_loop(st):
    corig = jnp.arange(st.shape[1], dtype=jnp.int32)
    st2 = _sort_chunks(st, jnp.argsort(corig))
    radiance = unpack_radiance(st2, n)
    max_v = jnp.max(radiance, axis=-1)
    scale = jnp.where(max_v > 10.0, 10.0 / jnp.maximum(max_v, 1e-20), 1.0)
    acc = jnp.maximum(radiance * scale[:, None], 0.0) / 16.0
    segs = unpack_rows(st2, 15, 1, n)[:, 0] / 16.0
    return st + 0.0 * (jnp.sum(acc) + jnp.sum(segs))


bench_k("post-loop (unsort+unpack+clamp+acc)", post_loop, state0)
