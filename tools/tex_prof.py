import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
"""Per-stage timing of the textured split-bounce path on TPU.

Builds the bench.py GATLING_BENCH_TEXTURED cornell config (1200sq), then
times each stage of one bounce iteration at full aliveness: trace_step,
the XLA texture stage (_material_rows), shade_step, the chunk partition,
and the whole jitted body — vs the untextured one-kernel bounce_step.
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
from gatling_tpu.render.fused import _material_rows, _material_rows_chunked, _sort_chunks
from gatling_tpu.ops.pallas_bounce import (build_fused_scene, bounce_step,
                                           make_params, pack_state,
                                           trace_step, shade_step)
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
rng = jnp.zeros((n,), jnp.uint32)
o, d, rng = generate_primary_rays(cu, W, H, px, py, rng, True, True, False)
n_pad = -(-n // 2048) * 2048
state = pack_state(o, d, rng, n_pad)
params = make_params(config, uni, jnp.int32(0))


def _fence(out):
    # readback ONE scalar (device-side reduce) — full-array device_get over
    # the tunnel costs seconds
    leaves = jax.tree.leaves(out)
    float(jnp.sum(leaves[0][(0,) * leaves[0].ndim]))


def bench(name, fn, *args, **kw):
    f = jax.jit(fn, **kw)
    out = f(*args)
    _fence(out)
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        out = f(*args)
        _fence(out)
        ts.append(time.perf_counter() - t0)
    # subtract ~nothing: readback of a scalar-ish slice dominates RTT ~30ms,
    # report min raw and note
    print(f"{name:34s} min {min(ts)*1e3:8.2f} ms  med {sorted(ts)[len(ts)//2]*1e3:8.2f} ms")
    return out


print(f"rays={n}, chunks={n//128}, backend={jax.default_backend()}")

K = 16  # iterations per timing — amortizes the ~30 ms tunnel RTT


def repeat(fn):
    """fn: state-like -> state-like of the SAME shape; iterate K times."""
    def run(x):
        return jax.lax.fori_loop(0, K, lambda i, c: fn(c), x)
    return run


def bench_k(name, fn, x):
    f = jax.jit(repeat(fn))
    out = f(x)
    _fence(out)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        out = f(x)
        _fence(out)
        ts.append(time.perf_counter() - t0)
    rtt = 0.028
    per = (min(ts) - rtt) / K * 1e3
    print(f"{name:34s} {per:8.2f} ms/iter   (total min {min(ts)*1e3:.1f} ms, K={K})")


# untextured one-kernel bounce
bench_k("bounce_step (untextured)",
        lambda st: bounce_step(params, scene, st, static=static, nee=False), state)

hitbuf0 = jax.jit(lambda st: trace_step(params, scene, st, static=static_tex))(state)

# trace: hitbuf isn't state-shaped; wrap so carry stays state-shaped
bench_k("trace_step",
        lambda st: st + 0.0 * trace_step(params, scene, st, static=static_tex)[0, 0, 0],
        state)

def _mr_padded(hb):
    par = _material_rows(table, pool, hb, static_tex.textured_params)
    return 0.0 * hb + jnp.pad(
        par, ((0, hb.shape[0] - par.shape[0]), (0, 0), (0, 0)))

bench_k("_material_rows (full)", _mr_padded, hitbuf0)

parbuf0 = jax.jit(lambda hb: _material_rows(table, pool, hb,
                                            static_tex.textured_params))(hitbuf0)

bench_k("shade_step",
        lambda st: shade_step(params, scene, st, hitbuf0, parbuf0,
                              static=static_tex, nee=False), state)


def chunk_partition(st):
    chunk_alive = jnp.max(st[13], axis=1) > 0.5
    corder = jnp.argsort(jnp.where(chunk_alive, 0, 1).astype(jnp.uint32), stable=True)
    return _sort_chunks(st, corder)

bench_k("chunk partition", chunk_partition, state)


def full_body(st):
    st2 = chunk_partition(st)
    hb = trace_step(params, scene, st2, static=static_tex)
    pb = _material_rows_chunked(table, pool, hb, static_tex.textured_params,
                                jnp.int32(n))
    return shade_step(params, scene, st2, hb, pb, static=static_tex, nee=False)

bench_k("full textured body (1 bounce)", full_body, state)

# --- drill into _material_rows ---
from gatling_tpu.render.material import gather_params, apply_textures, _gather_rows
from gatling_tpu.render.texture import sample_pool
from gatling_tpu.ops.pallas_bounce import H_MAT, H_UVX, H_UVY

flat = hitbuf0.reshape(hitbuf0.shape[0], -1)
mat = jnp.clip(jnp.round(flat[H_MAT]).astype(jnp.int32), 0, None)
uv = jnp.stack([flat[H_UVX], flat[H_UVY]], axis=-1)

bench_k("gather_params (one-hot)",
        lambda m: m + 0 * jnp.round(gather_params(table, m).metallic).astype(jnp.int32),
        mat)

slot = _gather_rows(table.packed_i, mat)[:, 0]

bench_k("sample_pool (q22 bilinear)",
        lambda u: u + 0.0 * sample_pool(pool, slot, u)[:, :2],
        uv)
