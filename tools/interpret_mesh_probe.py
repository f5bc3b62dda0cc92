import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
"""Probe: which (tiles, spp) interpret-mode shard_map meshes survive on this
host? jax 0.9.0's TPU-interpret shared-memory barrier deadlocks with 8
concurrent device threads on a 1-vCPU machine (see tests/test_multichip.py
round-3 notes). Each config runs in a fresh subprocess with a timeout."""
import subprocess

CHILD = r"""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from gatling_tpu.ops.geometry import build_geometry
from gatling_tpu.ops.pallas_bounce import build_fused_scene
from gatling_tpu.parallel.sharding import make_mesh, render_fused_sharded
from gatling_tpu.render.integrator import RenderConfig, Uniforms, default_dome
from gatling_tpu.render.material import build_material_table, lower_material
from gatling_tpu.render.camera import CameraUniforms
from gatling_tpu.scene.stage import load_scene
from gatling_tpu.interface import empty_light_arrays

tiles, spp_ax = int(sys.argv[1]), int(sys.argv[2])
desc = load_scene("/root/reference/cornell.usda")
midx = {None: 0}
geom = build_geometry(desc.meshes, {m.material: 0 for m in desc.meshes} | midx)
table = build_material_table([lower_material(None)])
scene, static = build_fused_scene(geom, table, None)
cam = desc.first_camera()
uniforms = Uniforms(
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
config = RenderConfig(width=32, height=32, spp=2, max_bounces=2,
                      has_dome=False, rr_bounce_offset=100)
mesh = make_mesh(n_tiles=tiles, n_spp=spp_ax)
with pltpu.force_tpu_interpret_mode():
    out, _segs = render_fused_sharded(config, uniforms, scene, static,
                                      default_dome(), mesh)
print("OK", float(jnp.sum(out)))
"""

for tiles, spp in ((2, 1), (4, 1), (8, 1), (2, 2), (4, 2)):
    try:
        r = subprocess.run(
            [sys.executable, "-c", CHILD, str(tiles), str(spp)],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True, timeout=420, text=True)
        ok = "OK" in r.stdout
        print(f"mesh ({tiles}x{spp}): {'OK' if ok else 'FAIL'}"
              + ("" if ok else f" rc={r.returncode} tail={r.stderr[-200:]}"))
    except subprocess.TimeoutExpired:
        print(f"mesh ({tiles}x{spp}): TIMEOUT (deadlock)")
