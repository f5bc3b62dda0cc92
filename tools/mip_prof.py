"""Measure whether a quarter-res texture pool changes bilinear-tap cost.

VERDICT r3 item 10 asks for a measured accept/reject on a 2-level mip
(bounce >= k taps a quarter-res q22 pool). Round-3 measurements
(PERF.md: tools/tap_prof.py) said XLA TPU gathers cost ~constant per
gathered ROW regardless of width — if that holds across POOL SIZES, a
mip level cannot help (same one row per tap) and the scheme is rejected
without building plumbing. This script times the same 1.44M-ray q22 tap
against pools of decreasing size (4096^2 .. 64^2 texels) with identical
uv distributions.

Run on the TPU: python tools/mip_prof.py
"""
import sys, os, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gatling_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from gatling_tpu.render.texture import TextureManager, TexturePool, WRAP_REPEAT, sample_pool

N_RAYS = 1_440_000
print("backend:", jax.default_backend())

rng = np.random.default_rng(0)
uv_np = rng.random((N_RAYS, 2), np.float32) * 8.0  # repeat-wrapped
uv = jnp.asarray(uv_np)
tid = jnp.zeros((N_RAYS,), jnp.int32)


def build_pool(side: int) -> TexturePool:
    img = (rng.random((side, side, 4)) * 255).astype(np.uint8)
    img[..., 3] = 255
    tm = TextureManager()
    from gatling_tpu.render.texture import TextureRef

    path = f"/tmp/mip_prof_{side}.png"
    from gatling_tpu import imgio

    imgio.write_image_file(path, img)
    return tm.build_pool([TextureRef(file_path=path, is_srgb=False)])


def time_tap(pool) -> float:
    # pool passed as an ARG: captured constants inline into the compile
    # request and blow the tunnel's upload limit at 4096^2
    f = jax.jit(lambda pl_, u: jnp.sum(sample_pool(pl_, tid, u)))
    float(f(pool, uv))  # compile + warm
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(pool, uv))
        times.append(time.perf_counter() - t0)
    return min(times)


for side in (2048, 1024, 256, 64):
    pool = build_pool(side)
    dt = time_tap(pool)
    print(f"pool {side}x{side}: q22={pool.bilinear_packed} "
          f"tap {dt*1e3:.2f} ms for {N_RAYS/1e6:.2f}M rays "
          f"({dt/N_RAYS*1e9:.2f} ns/tap)")
