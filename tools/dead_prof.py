import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
"""How much does a DEAD block cost? Times the textured trace/shade kernels
and the untextured bounce kernel on a fully-dead state (alive row = 0) to
isolate the per-block fixed grid+DMA overhead that does not scale with
aliveness — the suspected source of the ~50 ms/spp gap (spp_prof.py).

Also times the kernels over SLICED live prefixes (1/2, 1/4, 1/8 of the
blocks) to validate the prefix-grid fix before implementing it.
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
from gatling_tpu.render.integrator import RenderConfig, Uniforms
from gatling_tpu.render.camera import CameraUniforms, generate_primary_rays
from gatling_tpu.ops.pallas_bounce import (build_fused_scene, pack_state,
                                           make_params, trace_step,
                                           shade_step, bounce_step,
                                           hit_row_count, slim_param_rows)
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
imgio.write_image_file("/tmp/gatling_dead_checker.png", img)
for r in rows:
    r.textures["base_color"] = TextureRef(file_path="/tmp/gatling_dead_checker.png", is_srgb=False)
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

scene, static = build_fused_scene(geom, table, lights)
static_tex = dataclasses.replace(static, textured=True,
                                 textured_params=textured_params(rows))

n = W * H
pix = jnp.arange(n, dtype=jnp.int32)
px, py = pix % W, pix // W
rng0 = jnp.zeros((n,), jnp.uint32)
o, d, rng0 = generate_primary_rays(cu, W, H, px, py, rng0, True, True, False)
n_pad = -(-n // 2048) * 2048
state = pack_state(o, d, rng0, n_pad)
dead_state = state.at[13].set(0.0)
params = make_params(config, uni, jnp.int32(0))

K = 16


def _fence(out):
    leaves = jax.tree.leaves(out)
    float(jnp.sum(leaves[0][(0,) * leaves[0].ndim]))


def bench_k(name, fn, x):
    def run(y):
        return jax.lax.fori_loop(0, K, lambda i, c: fn(c), y)
    f = jax.jit(run)
    out = f(x)
    _fence(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = f(x)
        _fence(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {min(ts)/K*1e3:7.2f} ms/iter")


print(f"rays={n}, blocks={n//1024}, backend={jax.default_backend()}")


def tex_body(st):
    hit = trace_step(params, scene, st, static=static_tex)
    par = jnp.zeros((slim_param_rows(static_tex.textured_params),) + st.shape[1:], jnp.float32)
    return shade_step(params, scene, st, hit, par, static=static_tex, nee=False)


def untex_body(st):
    return bounce_step(params, scene, st, static=static, nee=False)


bench_k("textured trace+shade ALL ALIVE", tex_body, state)
bench_k("textured trace+shade ALL DEAD", tex_body, dead_state)
bench_k("untextured bounce ALL ALIVE", untex_body, state)
bench_k("untextured bounce ALL DEAD", untex_body, dead_state)

# sliced prefixes: body over the first nb/f chunks, concat the rest
for f in (2, 4, 8):
    nb = state.shape[1]
    sz = nb // f

    def sliced(st, sz=sz):
        head = jax.lax.slice(st, (0, 0, 0), (st.shape[0], sz, 128))
        head = tex_body(head)
        return jnp.concatenate([head, st[:, sz:]], axis=1)

    bench_k(f"textured SLICED 1/{f} (alive head)", sliced, state)


# real chunk body (incl. material stage) at the measured live_chunks ladder
from gatling_tpu.render.fused import _material_rows, _chunk_prefix_switch

def real_body(st):
    hit = trace_step(params, scene, st, static=static_tex)
    par = _material_rows(table, pool, hit, static_tex.textured_params)
    return shade_step(params, scene, st, hit, par, static=static_tex, nee=False)

for lc in (11250, 8647, 6278, 2816, 704):
    def switched(st, lc=lc):
        return _chunk_prefix_switch(real_body, st, jnp.int32(lc))
    bench_k(f"real textured body lc={lc}", switched, state)


# partition + full per-bounce sequence, amortized (no per-step readback)
from gatling_tpu.render.fused import _sort_chunks

def partition_only(st):
    chunk_alive = jnp.max(st[13], axis=1) > 0.5
    corder = jnp.argsort(jnp.where(chunk_alive, 0, 1).astype(jnp.uint32),
                         stable=True)
    return _sort_chunks(st, corder)

bench_k("chunk partition (argsort+permute)", partition_only, state)

def full_bounce(st):
    chunk_alive = jnp.max(st[13], axis=1) > 0.5
    corder = jnp.argsort(jnp.where(chunk_alive, 0, 1).astype(jnp.uint32),
                         stable=True)
    st = _sort_chunks(st, corder)
    lc = jnp.maximum(jnp.sum(chunk_alive.astype(jnp.int32)), 1)
    return _chunk_prefix_switch(real_body, st, lc, 16)

bench_k("partition + switch(real body), all alive", full_bounce, state)
