"""Pallas TPU trace kernels: MXU-formulated ray-triangle intersection.

TPU-native replacement for the hardware RT core dispatch
(reference: CgpuVk.cpp:3577 vkCmdTraceRaysKHR). The key observation: all
four Möller-Trumbore quantities are TRILINEAR in (ray origin o, ray
direction d) once per-triangle coefficients are precomputed:

    det  = e1 . (d x e2)            =  <d,    D(tri)>
    tnum = e2 . ((o - v0) x e1)     =  <o,    T(tri)> + const(tri)
    unum = (o - v0) . (d x e2)      =  <o o d, U(tri)> + <d, U'(tri)>
    vnum = d . ((o - v0) x e1)      =  <o o d, V(tri)> + <d, V'(tri)>

so with a 16-wide ray feature vector f = [o, d, vec(o o d), 1] the whole
[rays x triangles] intersection grid is ONE matmul f[R,16] @ C[16,4T] —
exactly what the MXU systolic array is built for, at >100x the VPU
throughput the naive elementwise formulation gets. The kernel tiles rays
into VMEM blocks and loops triangle tiles, reducing to the closest hit in
registers, so no [R,T] intermediate ever touches HBM (the reason the pure
jnp version in ops/intersect.py is bandwidth-bound).

The same kernel doubles as the BVH leaf test; ops/intersect.py routes to it
when a TPU is available.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gatling_tpu.interface import BARY_EPS, FLOAT_MAX
from gatling_tpu.ops.geometry import SceneGeometry
from gatling_tpu.ops.intersect import Hit

RAY_BLOCK = 1024  # rays per grid step (1D f32 arrays must block at 1024 to
                  # match XLA's {0:T(1024)} layout for the in/out ray arrays)
TRI_TILE = 128  # triangles per inner tile (= lane width)
N_FEATURES = 16

_EPS_LC = np.zeros((3, 3, 3), np.float32)
for _i, _j, _k, _s in [(0, 1, 2, 1), (1, 2, 0, 1), (2, 0, 1, 1),
                       (0, 2, 1, -1), (2, 1, 0, -1), (1, 0, 2, -1)]:
    _EPS_LC[_i, _j, _k] = _s


class TraceTables(NamedTuple):
    """Per-triangle MT coefficient matrices, tiled for the kernel:
    coeffs[n_tiles, 16, 4*TRI_TILE] with column groups [det|tnum|unum|vnum].
    """

    coeffs: jnp.ndarray
    n_tris: int


def build_trace_tables(geom: SceneGeometry) -> TraceTables:
    """Precompute the [16, 4T] coefficient matrix from the triangle soup.

    Padded (degenerate) triangles produce all-zero coefficients -> det == 0
    -> never valid.
    """
    v0 = geom.v0
    e1 = geom.e1
    e2 = geom.e2
    t = v0.shape[0]
    assert t % TRI_TILE == 0
    eps = jnp.asarray(_EPS_LC)

    d_d = jnp.einsum("ijk,ti,tk->tj", eps, e1, e2)  # det coeff of d
    t_o = jnp.einsum("ijk,ti,tk->tj", eps, e2, e1)  # tnum coeff of o
    t_c = -jnp.einsum("ijk,ti,tj,tk->t", eps, e2, v0, e1)  # tnum const
    u_od = jnp.einsum("ijk,tk->tij", eps, e2)  # unum coeff of o_i d_j
    u_d = -jnp.einsum("ijk,ti,tk->tj", eps, v0, e2)  # unum coeff of d
    v_od = jnp.einsum("ijk,tk->tji", eps, e1)  # vnum coeff of o_j d_i
    v_d = -jnp.einsum("ijk,tj,tk->ti", eps, v0, e1)  # vnum coeff of d

    c = jnp.zeros((t, N_FEATURES, 4), jnp.float32)
    c = c.at[:, 3:6, 0].set(d_d)
    c = c.at[:, 0:3, 1].set(t_o)
    c = c.at[:, 15, 1].set(t_c)
    c = c.at[:, 6:15, 2].set(u_od.reshape(t, 9))
    c = c.at[:, 3:6, 2].set(u_d)
    c = c.at[:, 6:15, 3].set(v_od.reshape(t, 9))
    c = c.at[:, 3:6, 3].set(v_d)

    # [n_tiles, TRI_TILE, 16, 4] -> [n_tiles, 16, 4, TRI_TILE] -> [n_tiles, 16, 4*TRI_TILE]
    n_tiles = t // TRI_TILE
    c = c.reshape(n_tiles, TRI_TILE, N_FEATURES, 4)
    c = jnp.transpose(c, (0, 2, 3, 1)).reshape(n_tiles, N_FEATURES, 4 * TRI_TILE)
    return TraceTables(coeffs=c, n_tris=t)


def ray_features(origins: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """[R,16] feature vector [o, d, vec(o (x) d), 1]."""
    r = origins.shape[0]
    od = jnp.einsum("ri,rj->rij", origins, dirs).reshape(r, 9)
    return jnp.concatenate(
        [origins, dirs, od, jnp.ones((r, 1), jnp.float32)], axis=1)


def _closest_hit_kernel(feat_ref, tmin_ref, tmax_ref, coeffs_ref,
                        t_out, tri_out, u_out, v_out):
    feat = feat_ref[:]  # [RB, 16]
    tmin = tmin_ref[:].reshape(RAY_BLOCK, 1)
    tmax = tmax_ref[:].reshape(RAY_BLOCK, 1)
    n_tiles = coeffs_ref.shape[0]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (RAY_BLOCK, TRI_TILE), 1)

    def body(j, carry):
        best_t, best_tri, best_u, best_v = carry
        c = coeffs_ref[j]  # [16, 4*TRI_TILE]
        out = jax.lax.dot_general(
            feat, c, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)  # [RB, 4*TRI_TILE]
        det = out[:, 0 * TRI_TILE:1 * TRI_TILE]
        tn = out[:, 1 * TRI_TILE:2 * TRI_TILE]
        un = out[:, 2 * TRI_TILE:3 * TRI_TILE]
        vn = out[:, 3 * TRI_TILE:4 * TRI_TILE]
        ok_det = jnp.abs(det) > 1e-12
        inv = jnp.where(ok_det, 1.0 / jnp.where(ok_det, det, 1.0), 0.0)
        t = tn * inv
        u = un * inv
        v = vn * inv
        valid = (ok_det & (u >= -BARY_EPS) & (v >= -BARY_EPS) & (u + v <= 1.0 + BARY_EPS)
                 & (t > tmin) & (t < tmax) & (t < best_t))
        tm = jnp.where(valid, t, FLOAT_MAX)
        tile_min = jnp.min(tm, axis=1, keepdims=True)  # [RB,1]
        is_min = (tm <= tile_min) & (tile_min < FLOAT_MAX)
        lane_idx = jnp.min(jnp.where(is_min, lanes, TRI_TILE), axis=1, keepdims=True)
        pick = lanes == lane_idx
        sel = lambda x: jnp.sum(jnp.where(pick, x, 0.0), axis=1, keepdims=True)  # noqa: E731
        better = tile_min < best_t
        best_tri = jnp.where(better, j * TRI_TILE + lane_idx, best_tri)
        best_u = jnp.where(better, sel(u), best_u)
        best_v = jnp.where(better, sel(v), best_v)
        best_t = jnp.where(better, tile_min, best_t)
        return best_t, best_tri, best_u, best_v

    init = (
        jnp.full((RAY_BLOCK, 1), FLOAT_MAX, jnp.float32),
        jnp.full((RAY_BLOCK, 1), -1, jnp.int32),
        jnp.zeros((RAY_BLOCK, 1), jnp.float32),
        jnp.zeros((RAY_BLOCK, 1), jnp.float32),
    )
    best_t, best_tri, best_u, best_v = jax.lax.fori_loop(0, n_tiles, body, init)
    t_out[:] = best_t.reshape(RAY_BLOCK)
    tri_out[:] = best_tri.reshape(RAY_BLOCK)
    u_out[:] = best_u.reshape(RAY_BLOCK)
    v_out[:] = best_v.reshape(RAY_BLOCK)


def _occlusion_kernel(feat_ref, tmin_ref, tmax_ref, coeffs_ref, hit_out):
    feat = feat_ref[:]
    tmin = tmin_ref[:].reshape(RAY_BLOCK, 1)
    tmax = tmax_ref[:].reshape(RAY_BLOCK, 1)
    n_tiles = coeffs_ref.shape[0]

    def body(j, any_hit):
        c = coeffs_ref[j]
        out = jax.lax.dot_general(
            feat, c, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        det = out[:, 0 * TRI_TILE:1 * TRI_TILE]
        tn = out[:, 1 * TRI_TILE:2 * TRI_TILE]
        un = out[:, 2 * TRI_TILE:3 * TRI_TILE]
        vn = out[:, 3 * TRI_TILE:4 * TRI_TILE]
        ok_det = jnp.abs(det) > 1e-12
        inv = jnp.where(ok_det, 1.0 / jnp.where(ok_det, det, 1.0), 0.0)
        t = tn * inv
        u = un * inv
        v = vn * inv
        valid = (ok_det & (u >= -BARY_EPS) & (v >= -BARY_EPS) & (u + v <= 1.0 + BARY_EPS)
                 & (t > tmin) & (t < tmax))
        return any_hit | jnp.any(valid, axis=1, keepdims=True)

    any_hit = jax.lax.fori_loop(
        0, n_tiles, body, jnp.zeros((RAY_BLOCK, 1), jnp.bool_))
    hit_out[:] = any_hit.reshape(RAY_BLOCK).astype(jnp.int32)


def _pad_rays(arr, r_pad, fill=0.0):
    r = arr.shape[0]
    if r == r_pad:
        return arr
    pad_width = [(0, r_pad - r)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, pad_width, constant_values=fill)


@partial(jax.jit, static_argnames=())
def intersect_pallas(origins, dirs, tmin, tmax, tables: TraceTables) -> Hit:
    """Closest-hit trace through the MXU kernel."""
    r = origins.shape[0]
    r_pad = -(-r // RAY_BLOCK) * RAY_BLOCK
    feat = _pad_rays(ray_features(origins, dirs), r_pad)
    tmin_p = _pad_rays(tmin, r_pad)
    tmax_p = _pad_rays(tmax, r_pad)  # padded rays: tmax 0 -> nothing valid

    n_tiles = tables.coeffs.shape[0]
    grid = (r_pad // RAY_BLOCK,)
    t, tri, u, v = pl.pallas_call(
        _closest_hit_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((RAY_BLOCK, N_FEATURES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, N_FEATURES, 4 * TRI_TILE), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((RAY_BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r_pad,), jnp.float32),
            jax.ShapeDtypeStruct((r_pad,), jnp.int32),
            jax.ShapeDtypeStruct((r_pad,), jnp.float32),
            jax.ShapeDtypeStruct((r_pad,), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(feat, tmin_p, tmax_p, tables.coeffs)
    return Hit(t=t[:r], tri=tri[:r], u=u[:r], v=v[:r])


@partial(jax.jit, static_argnames=())
def occluded_pallas(origins, dirs, tmin, tmax, tables: TraceTables) -> jnp.ndarray:
    r = origins.shape[0]
    r_pad = -(-r // RAY_BLOCK) * RAY_BLOCK
    feat = _pad_rays(ray_features(origins, dirs), r_pad)
    tmin_p = _pad_rays(tmin, r_pad)
    tmax_p = _pad_rays(tmax, r_pad)

    n_tiles = tables.coeffs.shape[0]
    hit = pl.pallas_call(
        _occlusion_kernel,
        grid=(r_pad // RAY_BLOCK,),
        in_specs=[
            pl.BlockSpec((RAY_BLOCK, N_FEATURES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, N_FEATURES, 4 * TRI_TILE), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RAY_BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r_pad,), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(feat, tmin_p, tmax_p, tables.coeffs)
    return hit[:r] > 0


# ---------------------------------------------------------------------------
# VPU variant: classic elementwise Möller-Trumbore with VMEM blocking.
# Triangles are laid out [n_tiles, 9, TRI_TILE] (v0.xyz, e1.xyz, e2.xyz along
# dim 1) so each tile slice broadcasts [1, TRI_TILE] against ray components
# [RB, 1]. No [R, T] intermediate leaves VMEM. Useful comparison point /
# fallback when MXU passes cost more than VPU flops (K=16 underutilizes the
# systolic array).
# ---------------------------------------------------------------------------


class TriTiles(NamedTuple):
    tris: jnp.ndarray  # [n_tiles, 9, TRI_TILE]
    n_tris: int


def build_tri_tiles(geom: SceneGeometry) -> TriTiles:
    t = geom.v0.shape[0]
    assert t % TRI_TILE == 0
    data = jnp.concatenate([geom.v0, geom.e1, geom.e2], axis=1)  # [T, 9]
    data = data.reshape(t // TRI_TILE, TRI_TILE, 9)
    return TriTiles(tris=jnp.transpose(data, (0, 2, 1)), n_tris=t)


def _mt_tile(feat, tile, tmin, tmax):
    """Elementwise MT for [RB] rays x [TRI_TILE] tris. feat is the [RB,16]
    ray feature block (components sliced out); returns (t, u, v, valid)."""
    ox, oy, oz = feat[:, 0:1], feat[:, 1:2], feat[:, 2:3]
    dx, dy, dz = feat[:, 3:4], feat[:, 4:5], feat[:, 5:6]
    v0x, v0y, v0z = tile[0:1], tile[1:2], tile[2:3]
    e1x, e1y, e1z = tile[3:4], tile[4:5], tile[5:6]
    e2x, e2y, e2z = tile[6:7], tile[7:8], tile[8:9]

    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    ok = jnp.abs(det) > 1e-12
    inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv
    t = (e2x * qx + e2y * qy + e2z * qz) * inv
    valid = ok & (u >= -BARY_EPS) & (v >= -BARY_EPS) & (u + v <= 1.0 + BARY_EPS) & (t > tmin) & (t < tmax)
    return t, u, v, valid


def _closest_hit_kernel_vpu(feat_ref, tmin_ref, tmax_ref, tris_ref,
                            t_out, tri_out, u_out, v_out):
    feat = feat_ref[:]
    tmin = tmin_ref[:].reshape(RAY_BLOCK, 1)
    tmax = tmax_ref[:].reshape(RAY_BLOCK, 1)
    n_tiles = tris_ref.shape[0]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (RAY_BLOCK, TRI_TILE), 1)

    def body(j, carry):
        best_t, best_tri, best_u, best_v = carry
        t, u, v, valid = _mt_tile(feat, tris_ref[j], tmin, jnp.minimum(tmax, best_t))
        tm = jnp.where(valid, t, FLOAT_MAX)
        tile_min = jnp.min(tm, axis=1, keepdims=True)
        is_min = (tm <= tile_min) & (tile_min < FLOAT_MAX)
        lane_idx = jnp.min(jnp.where(is_min, lanes, TRI_TILE), axis=1, keepdims=True)
        pick = lanes == lane_idx
        sel = lambda x: jnp.sum(jnp.where(pick, x, 0.0), axis=1, keepdims=True)  # noqa: E731
        better = tile_min < best_t
        best_tri = jnp.where(better, j * TRI_TILE + lane_idx, best_tri)
        best_u = jnp.where(better, sel(u), best_u)
        best_v = jnp.where(better, sel(v), best_v)
        best_t = jnp.where(better, tile_min, best_t)
        return best_t, best_tri, best_u, best_v

    init = (
        jnp.full((RAY_BLOCK, 1), FLOAT_MAX, jnp.float32),
        jnp.full((RAY_BLOCK, 1), -1, jnp.int32),
        jnp.zeros((RAY_BLOCK, 1), jnp.float32),
        jnp.zeros((RAY_BLOCK, 1), jnp.float32),
    )
    best_t, best_tri, best_u, best_v = jax.lax.fori_loop(0, n_tiles, body, init)
    t_out[:] = best_t.reshape(RAY_BLOCK)
    tri_out[:] = best_tri.reshape(RAY_BLOCK)
    u_out[:] = best_u.reshape(RAY_BLOCK)
    v_out[:] = best_v.reshape(RAY_BLOCK)


def _occlusion_kernel_vpu(feat_ref, tmin_ref, tmax_ref, tris_ref, hit_out):
    feat = feat_ref[:]
    tmin = tmin_ref[:].reshape(RAY_BLOCK, 1)
    tmax = tmax_ref[:].reshape(RAY_BLOCK, 1)
    n_tiles = tris_ref.shape[0]

    def body(j, any_hit):
        _t, _u, _v, valid = _mt_tile(feat, tris_ref[j], tmin, tmax)
        return any_hit | jnp.any(valid, axis=1, keepdims=True)

    any_hit = jax.lax.fori_loop(0, n_tiles, body,
                                jnp.zeros((RAY_BLOCK, 1), jnp.bool_))
    hit_out[:] = any_hit.reshape(RAY_BLOCK).astype(jnp.int32)


@partial(jax.jit, static_argnames=())
def intersect_pallas_vpu(origins, dirs, tmin, tmax, tiles: TriTiles) -> Hit:
    r = origins.shape[0]
    r_pad = -(-r // RAY_BLOCK) * RAY_BLOCK
    feat = _pad_rays(ray_features(origins, dirs), r_pad)
    tmin_p = _pad_rays(tmin, r_pad)
    tmax_p = _pad_rays(tmax, r_pad)
    n_tiles = tiles.tris.shape[0]
    t, tri, u, v = pl.pallas_call(
        _closest_hit_kernel_vpu,
        grid=(r_pad // RAY_BLOCK,),
        in_specs=[
            pl.BlockSpec((RAY_BLOCK, N_FEATURES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, 9, TRI_TILE), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((RAY_BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r_pad,), jnp.float32),
            jax.ShapeDtypeStruct((r_pad,), jnp.int32),
            jax.ShapeDtypeStruct((r_pad,), jnp.float32),
            jax.ShapeDtypeStruct((r_pad,), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(feat, tmin_p, tmax_p, tiles.tris)
    return Hit(t=t[:r], tri=tri[:r], u=u[:r], v=v[:r])


@partial(jax.jit, static_argnames=())
def occluded_pallas_vpu(origins, dirs, tmin, tmax, tiles: TriTiles) -> jnp.ndarray:
    r = origins.shape[0]
    r_pad = -(-r // RAY_BLOCK) * RAY_BLOCK
    feat = _pad_rays(ray_features(origins, dirs), r_pad)
    tmin_p = _pad_rays(tmin, r_pad)
    tmax_p = _pad_rays(tmax, r_pad)
    n_tiles = tiles.tris.shape[0]
    hit = pl.pallas_call(
        _occlusion_kernel_vpu,
        grid=(r_pad // RAY_BLOCK,),
        in_specs=[
            pl.BlockSpec((RAY_BLOCK, N_FEATURES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, 9, TRI_TILE), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RAY_BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r_pad,), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(feat, tmin_p, tmax_p, tiles.tris)
    return hit[:r] > 0


# ---------------------------------------------------------------------------
# jnp reference of the feature/coefficient formulation (used by unit tests to
# validate the math independent of the Pallas lowering)
# ---------------------------------------------------------------------------

def intersect_features_jnp(origins, dirs, tmin, tmax, tables: TraceTables) -> Hit:
    feat = ray_features(origins, dirs)  # [R,16]
    n_tiles = tables.coeffs.shape[0]
    c = tables.coeffs.reshape(n_tiles * N_FEATURES, 4 * TRI_TILE)

    best = None
    for j in range(n_tiles):
        cj = tables.coeffs[j]
        out = feat @ cj
        det = out[:, 0 * TRI_TILE:1 * TRI_TILE]
        tn = out[:, 1 * TRI_TILE:2 * TRI_TILE]
        un = out[:, 2 * TRI_TILE:3 * TRI_TILE]
        vn = out[:, 3 * TRI_TILE:4 * TRI_TILE]
        ok = jnp.abs(det) > 1e-12
        inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
        t = tn * inv
        u = un * inv
        v = vn * inv
        valid = ok & (u >= -BARY_EPS) & (v >= -BARY_EPS) & (u + v <= 1 + BARY_EPS) & (t > tmin[:, None]) & (t < tmax[:, None])
        tm = jnp.where(valid, t, FLOAT_MAX)
        idx = jnp.argmin(tm, axis=1)
        rows = jnp.arange(tm.shape[0])
        cand = (tm[rows, idx], j * TRI_TILE + idx, u[rows, idx], v[rows, idx])
        if best is None:
            best = cand
        else:
            better = cand[0] < best[0]
            best = tuple(jnp.where(better, c_, b_) for c_, b_ in zip(cand, best))
    t, tri, u, v = best
    tri = jnp.where(t < FLOAT_MAX, tri, -1)
    return Hit(t=t, tri=tri.astype(jnp.int32), u=u, v=v)
