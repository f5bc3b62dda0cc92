import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
"""Decompose the q22 bilinear tap cost on TPU: gather vs unpack vs sRGB pow
vs lerp. Informs whether a linear-f16/u16 q22 pool variant would pay."""
import time

import numpy as np
import jax
import jax.numpy as jnp

N = 1_440_000
POOL = 64 * 64

key = np.random.default_rng(0)
rows = jnp.asarray(key.integers(0, 2**32, size=(POOL, 4), dtype=np.uint64).astype(np.uint32))
# linear-f32x4 per corner packed as u16 fixed point: [POOL, 8] u32
rows16 = jnp.asarray(key.integers(0, 2**32, size=(POOL, 8), dtype=np.uint64).astype(np.uint32))
idx0 = jnp.asarray(key.integers(0, POOL, size=N).astype(np.int32))


def dyn_idx(u):
    return jnp.clip(idx0 + (u[:, 0] * 3.0).astype(jnp.int32), 0, POOL - 1)
uv = jnp.asarray(key.random((N, 2), np.float32))

K = 16


def _fence(out):
    leaves = jax.tree.leaves(out)
    float(jnp.sum(leaves[0][(0,) * leaves[0].ndim]))


def bench_k(name, fn, x):
    f = jax.jit(lambda x0: jax.lax.fori_loop(0, K, lambda i, c: fn(c), x0))
    out = f(x)
    _fence(out)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        out = f(x)
        _fence(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:40s} {(min(ts) - 0.028) / K * 1e3:8.2f} ms/iter")


def unpack(code, srgb=True):
    val = jnp.stack([
        (code & 0xFF).astype(jnp.float32),
        ((code >> 8) & 0xFF).astype(jnp.float32),
        ((code >> 16) & 0xFF).astype(jnp.float32),
        ((code >> 24) & 0xFF).astype(jnp.float32),
    ], axis=-1) * (1.0 / 255.0)
    c = val[:, :3]
    if srgb:
        lin = jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)
    else:
        lin = c * c
    return jnp.concatenate([lin, val[:, 3:]], axis=-1)


def full_tap(u, srgb=True):
    x = u[:, 0] * 64.0 - 0.5
    y = (1.0 - u[:, 1]) * 64.0 - 0.5
    x0f, y0f = jnp.floor(x), jnp.floor(y)
    fx, fy = (x - x0f)[:, None], (y - y0f)[:, None]
    rowq = rows[dyn_idx(u)]
    c00 = unpack(rowq[:, 0], srgb)
    c10 = unpack(rowq[:, 1], srgb)
    c01 = unpack(rowq[:, 2], srgb)
    c11 = unpack(rowq[:, 3], srgb)
    out = (c00 * (1 - fx) + c10 * fx) * (1 - fy) + (c01 * (1 - fx) + c11 * fx) * fy
    return u + 0.001 * out[:, :2]


def gather_only(u):
    rowq = rows[dyn_idx(u)]
    return u + 0.001 * jnp.stack(
        [rowq[:, 0].astype(jnp.float32), rowq[:, 3].astype(jnp.float32)], -1)


def gather16_only(u):
    rowq = rows16[dyn_idx(u)]
    return u + 0.001 * jnp.stack(
        [rowq[:, 0].astype(jnp.float32), rowq[:, 7].astype(jnp.float32)], -1)


def tap16(u):
    """linear u16-fixed-point q22 variant: [8] u32 row, cheap unpack."""
    x = u[:, 0] * 64.0 - 0.5
    y = (1.0 - u[:, 1]) * 64.0 - 0.5
    x0f, y0f = jnp.floor(x), jnp.floor(y)
    fx, fy = (x - x0f)[:, None], (y - y0f)[:, None]
    rowq = rows16[dyn_idx(u)]  # [N, 8] u32 = 4 corners x rgba u16
    s = 1.0 / 65535.0

    def corner(i):
        a = rowq[:, 2 * i]
        b = rowq[:, 2 * i + 1]
        return jnp.stack([
            (a & 0xFFFF).astype(jnp.float32),
            (a >> 16).astype(jnp.float32),
            (b & 0xFFFF).astype(jnp.float32),
            (b >> 16).astype(jnp.float32)], -1) * s

    c00, c10, c01, c11 = corner(0), corner(1), corner(2), corner(3)
    out = (c00 * (1 - fx) + c10 * fx) * (1 - fy) + (c01 * (1 - fx) + c11 * fx) * fy
    return u + 0.001 * out[:, :2]


def tap_bf16(u):
    """linear bf16 q22 variant: [8] u32 row, bitcast unpack."""
    x = u[:, 0] * 64.0 - 0.5
    y = (1.0 - u[:, 1]) * 64.0 - 0.5
    x0f, y0f = jnp.floor(x), jnp.floor(y)
    fx, fy = (x - x0f)[:, None], (y - y0f)[:, None]
    rowq = rows16[dyn_idx(u)]  # [N, 8] u32 = 4 corners x rgba bf16
    pairs = jax.lax.bitcast_convert_type(rowq, jnp.bfloat16)  # [N, 8, 2]
    c = pairs.reshape(rowq.shape[0], 4, 4).astype(jnp.float32)
    out = ((c[:, 0] * (1 - fx) + c[:, 1] * fx) * (1 - fy)
           + (c[:, 2] * (1 - fx) + c[:, 3] * fx) * fy)
    return u + 0.001 * out[:, :2]


print(f"N={N}, backend={jax.default_backend()}")
bench_k("full q22 tap (sRGB pow)", lambda u: full_tap(u, True), uv)
bench_k("full q22 tap (x*x fake decode)", lambda u: full_tap(u, False), uv)
bench_k("gather [4]row only", gather_only, uv)
bench_k("gather [8]row only", gather16_only, uv)
bench_k("tap16 (linear u16 fixed point)", tap16, uv)
bench_k("tap bf16 (bitcast)", tap_bf16, uv)
