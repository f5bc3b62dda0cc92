"""Decompose the clustered bounce cost on TPU: XLA plan prelude vs kernel.

Times, for sphere_field primaries AND the coherence-sorted bounce-1 state
(flat and instanced builds):
  - _cluster_walk_plan alone (exact=True and exact=False), jitted
  - bounce_step total
The plan is recomputed inside bounce_step's jit, so `kernel ~ total - plan`
is an estimate (XLA may overlap), but a plan that costs a large fraction
of the total is the ADVICE-r4 warning made measurable.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time
import numpy as np, jax, jax.numpy as jnp
from functools import partial
from gatling_tpu.scene.examples import interior, sphere_field
from gatling_tpu.ops.geometry import build_geometry
from gatling_tpu.render.material import build_material_table, lower_material
from gatling_tpu.ops.pallas_bounce import (
    build_fused_scene, build_fused_scene_instanced, bounce_step, make_params,
    pack_state, _cluster_walk_plan)
from gatling_tpu.render.camera import CameraUniforms, generate_primary_rays
from gatling_tpu.render.fused import _tile_order, _coherence_keys, _sort_state
from gatling_tpu.render.integrator import RenderConfig, Uniforms

if os.environ.get("GATLING_PROF_SCENE") == "interior":
    desc = interior()
else:
    desc = sphere_field()
midx = {m.material: 0 for m in desc.meshes}
midx[None] = 0
geom = build_geometry(desc.meshes, midx)
table = build_material_table([lower_material(None)])
flat_scene, flat_static = build_fused_scene(geom, table, None)
inst = build_fused_scene_instanced(desc.meshes, midx, table, None,
                                   min_flat=0)
cam = desc.first_camera()
W = H = 512
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
pix = jnp.asarray(_tile_order(W, H))
px, py = pix % W, pix // W
rng = jnp.zeros((W*H,), jnp.uint32)
o, d, rng = generate_primary_rays(cu, W, H, px, py, rng, False, False, False)
state0 = pack_state(o, d, rng, W*H)
cfg = RenderConfig(width=W, height=H, spp=1, max_bounces=6, has_dome=False)
params = make_params(cfg, uni, jnp.int32(0))
NB = W*H // 1024


def fence(out):
    # reduce ON DEVICE and fetch one scalar: fetching whole outputs drags
    # tens of MB through the tunnel and swamps the kernel time
    return float(sum(jnp.sum(a) for a in jax.tree.leaves(out)))


def timeit(fn, *args, n=5):
    fence(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fence(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


for label, (scene, static) in (("flat", (flat_scene, flat_static)),
                               ("inst", inst)):
    plan_exact = jax.jit(partial(_cluster_walk_plan, exact=True))
    plan_heur = jax.jit(partial(_cluster_walk_plan, exact=False))
    # bounce-1 state from one flat step (cheap, reused)
    step = partial(bounce_step, static=static, nee=False)
    t_b0 = timeit(step, params, scene, state0)
    out = bounce_step(params, scene, state0, static=static, nee=False)
    scene_lo = jnp.min(scene.l1_aabbs[0:3], axis=1)
    scene_hi = jnp.max(scene.l1_aabbs[3:6], axis=1)
    inv = 1.0 / jnp.maximum(scene_hi - scene_lo, 1e-6)
    srt = jax.jit(lambda st: _sort_state(st, jnp.argsort(
        _coherence_keys(st, scene_lo, inv))))
    state1 = srt(out)
    t_b1 = timeit(step, make_params(cfg, uni, jnp.int32(1)), scene, state1)
    t_p0e = timeit(plan_exact, state0, scene.l1_aabbs, scene.l2_aabbs)
    t_p1e = timeit(plan_exact, state1, scene.l1_aabbs, scene.l2_aabbs)
    t_p0h = timeit(plan_heur, state0, scene.l1_aabbs, scene.l2_aabbs)
    t_p1h = timeit(plan_heur, state1, scene.l1_aabbs, scene.l2_aabbs)
    print(f"[{label}] n_l1={static.n_l1}  (us/block over {NB} blocks)")
    print(f"  bounce_step  b0 {t_b0*1e6/NB:7.1f}  b1 {t_b1*1e6/NB:7.1f}")
    print(f"  plan exact   b0 {t_p0e*1e6/NB:7.1f}  b1 {t_p1e*1e6/NB:7.1f}")
    print(f"  plan heur    b0 {t_p0h*1e6/NB:7.1f}  b1 {t_p1h*1e6/NB:7.1f}")
