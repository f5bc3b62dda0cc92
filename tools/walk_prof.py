import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
"""Time ONE clustered bounce_step on TPU: primary rays, sphere_field."""
import time
import numpy as np, jax, jax.numpy as jnp
from gatling_tpu.scene.examples import sphere_field
from gatling_tpu.ops.geometry import build_geometry
from gatling_tpu.render.material import build_material_table, lower_material
from gatling_tpu.ops.pallas_bounce import (build_fused_scene, bounce_step,
                                           make_params, pack_state)
from gatling_tpu.render.camera import CameraUniforms, generate_primary_rays
from gatling_tpu.render.fused import _tile_order
from gatling_tpu.render.integrator import RenderConfig, Uniforms

desc = sphere_field()
geom = build_geometry(desc.meshes, {None: 0})
table = build_material_table([lower_material(None)])
if os.environ.get("GATLING_PROF_INST", "") == "1":
    from gatling_tpu.ops.pallas_bounce import build_fused_scene_instanced
    scene, static = build_fused_scene_instanced(
        desc.meshes, {None: 0}, table, None, min_flat=0)
    print(f"instanced: {static.n_l1} entries, {static.n_clusters} uniq clusters")
else:
    scene, static = build_fused_scene(geom, table, None)
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
state = pack_state(o, d, rng, W*H)
cfg = RenderConfig(width=W, height=H, spp=1, max_bounces=6, has_dome=False)
params = make_params(cfg, uni, jnp.int32(0))

out = bounce_step(params, scene, state, static=static, nee=False)
float(jnp.sum(out))
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    out = bounce_step(params, scene, state, static=static, nee=False)
    float(jnp.sum(out))
    ts.append(time.perf_counter() - t0)
dt = min(ts)
nblocks = W*H // 1024
print(f"bounce0: {dt*1e3:.1f} ms total, {dt/nblocks*1e6:.1f} us/block ({nblocks} blocks)")
# a secondary-like bounce: advance once, APPLY THE PIPELINE'S COHERENCE
# SORT (octant + origin Morton), and measure bounce 1 as rendered
from gatling_tpu.render.fused import _coherence_keys, _sort_state
import numpy as _np
scene_lo = jnp.min(scene.l1_aabbs[0:3], axis=1)
scene_hi = jnp.max(scene.l1_aabbs[3:6], axis=1)
scene_inv = 1.0 / jnp.maximum(scene_hi - scene_lo, 1e-6)
@jax.jit
def _sorted(st):
    keys = _coherence_keys(st, scene_lo, scene_inv)
    return _sort_state(st, jnp.argsort(keys))
out = _sorted(out)
state1 = out
_np.save("/tmp/state1.npy", _np.asarray(state1))
params1 = make_params(cfg, uni, jnp.int32(1))
out1 = bounce_step(params1, scene, state1, static=static, nee=False)
float(jnp.sum(out1))
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    out1 = bounce_step(params1, scene, state1, static=static, nee=False)
    float(jnp.sum(out1))
    ts.append(time.perf_counter() - t0)
print(f"bounce1: {min(ts)*1e3:.1f} ms total, {min(ts)/nblocks*1e6:.1f} us/block")
