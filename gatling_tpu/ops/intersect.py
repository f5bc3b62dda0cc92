"""Ray-triangle intersection: batched Möller-Trumbore over the triangle soup.

TPU-native replacement for `vkCmdTraceRaysKHR` hardware traversal
(reference: CgpuVk.cpp:3577, dispatched from Gi.cpp:2437). Rays and
triangles meet in a [ray_block, tri_block] broadcast, pure VPU work with
fp32 math, scanned over triangle blocks so VMEM pressure stays bounded.
For scenes beyond a few thousand triangles the BVH in ops/bvh.py culls the
triangle blocks; this module provides the leaf test and the brute-force
reference oracle.

No backface culling is done here: like the reference, facing is resolved at
shading time (mdl_shading_state.glsl:37-44) and anyhit-style cutouts are
applied by re-tracing (integrator).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gatling_tpu.interface import BARY_EPS, FLOAT_MAX
from gatling_tpu.ops.geometry import SceneGeometry


class Hit(NamedTuple):
    t: jnp.ndarray  # [R] f32 hit distance (FLOAT_MAX when missed)
    tri: jnp.ndarray  # [R] i32 triangle index (-1 when missed)
    u: jnp.ndarray  # [R] f32 barycentric u
    v: jnp.ndarray  # [R] f32 barycentric v

    @property
    def missed(self) -> jnp.ndarray:
        return self.tri < 0


def _mt_block(org, dirn, v0, e1, e2, tmin, tmax):
    """Möller-Trumbore for a [R, ...] ray block vs [T, ...] triangle block.

    Returns (t[R,T], u[R,T], v[R,T], valid[R,T]).
    """
    # [R,1,3] x [1,T,3]
    pvec = jnp.cross(dirn[:, None, :], e2[None, :, :])  # [R,T,3]
    det = jnp.sum(pvec * e1[None, :, :], axis=-1)  # [R,T]
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
    tvec = org[:, None, :] - v0[None, :, :]  # [R,T,3]
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1[None, :, :])  # [R,T,3]
    v = jnp.sum(dirn[:, None, :] * qvec, axis=-1) * inv_det
    t = jnp.sum(e2[None, :, :] * qvec, axis=-1) * inv_det
    valid = (
        (jnp.abs(det) > 1e-12)
        & (u >= -BARY_EPS) & (v >= -BARY_EPS) & (u + v <= 1.0 + BARY_EPS)
        & (t > tmin[:, None]) & (t < tmax[:, None])
    )
    return t, u, v, valid


@partial(jax.jit, static_argnames=("tri_block",))
def intersect_brute(
    origins: jnp.ndarray,  # [R,3]
    dirs: jnp.ndarray,  # [R,3]
    tmin: jnp.ndarray,  # [R]
    tmax: jnp.ndarray,  # [R]
    geom: SceneGeometry,
    tri_block: int = 2048,
) -> Hit:
    """Closest hit over all triangles. O(R*T) but perfectly regular."""
    n_tris = geom.num_triangles
    tri_block = min(tri_block, n_tris)
    n_blocks = -(-n_tris // tri_block)

    def body(carry, block_idx):
        best_t, best_tri, best_u, best_v = carry
        start = block_idx * tri_block
        v0 = jax.lax.dynamic_slice_in_dim(geom.v0, start, tri_block)
        e1 = jax.lax.dynamic_slice_in_dim(geom.e1, start, tri_block)
        e2 = jax.lax.dynamic_slice_in_dim(geom.e2, start, tri_block)
        t, u, v, valid = _mt_block(origins, dirs, v0, e1, e2, tmin, jnp.minimum(tmax, best_t))
        t = jnp.where(valid, t, FLOAT_MAX)
        j = jnp.argmin(t, axis=1)  # [R]
        rows = jnp.arange(t.shape[0])
        cand_t = t[rows, j]
        better = cand_t < best_t
        best_tri = jnp.where(better, start + j, best_tri)
        best_u = jnp.where(better, u[rows, j], best_u)
        best_v = jnp.where(better, v[rows, j], best_v)
        best_t = jnp.where(better, cand_t, best_t)
        return (best_t, best_tri, best_u, best_v), None

    r = origins.shape[0]
    init = (
        jnp.full((r,), FLOAT_MAX, jnp.float32),
        jnp.full((r,), -1, jnp.int32),
        jnp.zeros((r,), jnp.float32),
        jnp.zeros((r,), jnp.float32),
    )
    (t, tri, u, v), _ = jax.lax.scan(body, init, jnp.arange(n_blocks))
    return Hit(t=t, tri=tri, u=u, v=v)


@partial(jax.jit, static_argnames=("tri_block",))
def occluded_brute(
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    geom: SceneGeometry,
    tri_block: int = 2048,
) -> jnp.ndarray:
    """Any-hit occlusion test ([R] bool), the shadow-ray stream
    (reference: rp_main.rgen:397-438 terminate-on-first-hit trace)."""
    n_tris = geom.num_triangles
    tri_block = min(tri_block, n_tris)
    n_blocks = -(-n_tris // tri_block)

    def body(shadowed, block_idx):
        start = block_idx * tri_block
        v0 = jax.lax.dynamic_slice_in_dim(geom.v0, start, tri_block)
        e1 = jax.lax.dynamic_slice_in_dim(geom.e1, start, tri_block)
        e2 = jax.lax.dynamic_slice_in_dim(geom.e2, start, tri_block)
        _, _, _, valid = _mt_block(origins, dirs, v0, e1, e2, tmin, tmax)
        return shadowed | jnp.any(valid, axis=1), None

    init = jnp.zeros((origins.shape[0],), bool)
    out, _ = jax.lax.scan(body, init, jnp.arange(n_blocks))
    return out
