import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
"""Per-bounce live-chunk counts + per-bounce wall time of the textured
fused body on the bench cornell config — validates whether the
_chunk_prefix_switch branches are actually taken."""
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
from gatling_tpu.render.integrator import RenderConfig, Uniforms
from gatling_tpu.render.camera import CameraUniforms, generate_primary_rays
from gatling_tpu.render.fused import (_chunk_prefix_switch, _material_rows,
                                      _sort_chunks)
from gatling_tpu.ops.pallas_bounce import (build_fused_scene, pack_state,
                                           make_params, trace_step,
                                           shade_step)
from gatling_tpu import imgio
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
img[..., 0] = 128
imgio.write_image_file("/tmp/gatling_alive_checker.png", img)
for r in rows:
    r.textures["base_color"] = TextureRef(file_path="/tmp/gatling_alive_checker.png", is_srgb=False)
table, pool = build_materials(rows)
lights = build_light_arrays([])
cam = desc.first_camera()
W = H = 1200
config = RenderConfig(width=W, height=H, spp=1, max_bounces=8,
                      rr_bounce_offset=3, aov_mask=aov_bit(AovId.COLOR))
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
    dome_rotation=jnp.asarray([0,0,0,1], jnp.float32),
    dome_emission_multiplier=jnp.ones(3, jnp.float32),
    dome_diffuse_specular=jnp.ones(2, jnp.float32))

scene, static0 = build_fused_scene(geom, table, lights)
static = dataclasses.replace(static0, textured=True,
                             textured_params=textured_params(rows))

n = W * H
pix = jnp.arange(n, dtype=jnp.int32)
px, py = pix % W, pix // W
rng = jnp.zeros((n,), jnp.uint32)
o, d, rng = generate_primary_rays(cu, W, H, px, py, rng, True, True, False)
n_pad = -(-n // 2048) * 2048
state = pack_state(o, d, rng, n_pad)
nb = state.shape[1]
print(f"chunks={nb}, backend={jax.default_backend()}")


@jax.jit
def partition(st):
    chunk_alive = jnp.max(st[13], axis=1) > 0.5
    corder = jnp.argsort(jnp.where(chunk_alive, 0, 1).astype(jnp.uint32),
                         stable=True)
    st = _sort_chunks(st, corder)
    return st, jnp.maximum(jnp.sum(chunk_alive.astype(jnp.int32)), 1)


@jax.jit
def body(st, live_chunks, bounce):
    params = make_params(config, uni, bounce)

    def chunk_body(head):
        hitbuf = trace_step(params, scene, head, static=static)
        parbuf = _material_rows(table, pool, hitbuf, static.textured_params)
        return shade_step(params, scene, head, hitbuf, parbuf,
                          static=static, nee=False)

    return _chunk_prefix_switch(chunk_body, st, live_chunks)


# warm up all switch branches by faking live_chunks values
st = state
for b in range(8):
    st, lc = partition(st)
    _ = body(st, lc, jnp.int32(b))
_ = float(jnp.sum(st[13]))

st = state
for b in range(8):
    t0 = time.perf_counter()
    st, lc = partition(st)
    lc_v = int(lc)
    t1 = time.perf_counter()
    st = body(st, lc, jnp.int32(b))
    alive = float(jnp.sum(st[13]))
    t2 = time.perf_counter()
    print(f"bounce {b}: live_chunks={lc_v:6d}/{nb} partition {1e3*(t1-t0):7.2f} ms"
          f" body {1e3*(t2-t1):7.2f} ms alive_after={alive:9.0f}")
