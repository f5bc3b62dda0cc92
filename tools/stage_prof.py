"""Interior textured+NEE per-stage decomposition on TPU."""
import sys, os, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gatling_jax_cache")
import numpy as np, jax, jax.numpy as jnp, dataclasses
from functools import partial
from gatling_tpu.scene.examples import interior
from gatling_tpu.render.material import build_materials, lower_material, textured_params
from gatling_tpu.ops.pallas_bounce import (build_fused_scene_instanced, trace_step,
                                           shade_step, make_params, pack_state)
from gatling_tpu.render.lights import build_light_arrays
from gatling_tpu.render.fused import _tile_order, _material_rows, _coherence_keys, _sort_state
from gatling_tpu.render.integrator import RenderConfig, Uniforms
from gatling_tpu.render.camera import CameraUniforms, generate_primary_rays

desc = interior()
mat_paths = sorted({m.material for m in desc.meshes if m.material})
midx = {p: i for i, p in enumerate(mat_paths)}
midx[None] = len(mat_paths)
rows = [lower_material(desc.materials.get(p) if p else None) for p in list(midx)]
table, pool = build_materials(rows)
lights = build_light_arrays([l for l in desc.lights if l.light_type != "dome"])
fs, st_ = build_fused_scene_instanced(desc.meshes, midx, table, lights)
st_ = dataclasses.replace(st_, textured=True, textured_params=textured_params(rows))
cam = desc.first_camera()
W = H = 512
cu = CameraUniforms(jnp.asarray(cam.position, jnp.float32), jnp.asarray(cam.forward, jnp.float32),
    jnp.asarray(cam.up, jnp.float32), jnp.float32(cam.vfov), jnp.float32(0), jnp.float32(0),
    jnp.float32(0), jnp.float32(cam.clip_start), jnp.float32(cam.clip_end))
uni = Uniforms(camera=cu, sample_offset=jnp.int32(0), inv_total_sample_count=jnp.float32(1.0),
    max_sample_value=jnp.float32(10.0), rr_inv_min_term_prob=jnp.float32(0.95),
    light_intensity_multiplier=jnp.float32(1.0), meters_per_scene_unit=jnp.float32(1.0),
    max_volume_walk_length=jnp.int32(7), dome_rotation=jnp.asarray([0,0,0,1], jnp.float32),
    dome_emission_multiplier=jnp.ones(3, jnp.float32), dome_diffuse_specular=jnp.ones(2, jnp.float32))
pix = jnp.asarray(_tile_order(W, H))
px, py = pix % W, pix // W
rng = jnp.zeros((W*H,), jnp.uint32)
o, d, rng = generate_primary_rays(cu, W, H, px, py, rng, False, False, False)
state = pack_state(o, d, rng, W*H)
cfg = RenderConfig(width=W, height=H, spp=1, max_bounces=6, has_dome=False, nee=True)
params = make_params(cfg, uni, jnp.int32(0))
NB = W*H // 1024

def fence(x):
    return float(sum(jnp.sum(a) for a in jax.tree.leaves(x)))

def timeit(fn, *a, n=4):
    fence(fn(*a))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); fence(fn(*a)); ts.append(time.perf_counter() - t0)
    return min(ts)

tr = jax.jit(partial(trace_step, static=st_))
t_trace = timeit(tr, params, fs, state)
hitbuf = tr(params, fs, state)
stage = jax.jit(lambda hb: _material_rows(table, pool, hb, st_.textured_params))
t_stage = timeit(stage, hitbuf)
parbuf = stage(hitbuf)
sh_nee = jax.jit(partial(shade_step, static=st_, nee=True))
sh_no = jax.jit(partial(shade_step, static=st_, nee=False))
t_shade_nee = timeit(sh_nee, params, fs, state, hitbuf, parbuf)
t_shade_no = timeit(sh_no, params, fs, state, hitbuf, parbuf)
rtt = timeit(jax.jit(lambda x: x + 1.0), jnp.float32(1.0))  # pure fence RTT
print(f"RTT baseline: {rtt*1e6/NB:.1f} us/block-equiv ({rtt*1e3:.1f} ms)")
for name, t in (("trace", t_trace), ("tex stage", t_stage),
                ("shade+NEE", t_shade_nee), ("shade noNEE", t_shade_no)):
    print(f"{name:12s} {t*1e6/NB:7.1f} us/block   ({t*1e3:7.1f} ms total)")
