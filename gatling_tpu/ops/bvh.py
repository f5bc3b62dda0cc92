"""Bounding volume hierarchy: host-side build + batched stackless traversal.

TPU-native replacement for the reference's hardware acceleration structures
(reference: CgpuVk.cpp:2695-2854 cgpuCreateBlas/Tlas building
VK_KHR_acceleration_structure objects on device). Design:

* geometry is pre-flattened to one world-space triangle soup
  (ops/geometry.py), so a single-level BVH suffices (the reference's
  TLAS/BLAS split exists to support per-instance transforms + SBT offsets,
  both of which are baked into the soup here),
* build: Morton-code ordering of triangle centroids (LBVH-style spatial
  clustering) followed by median splits over the sorted order; triangles are
  REORDERED so every leaf is a contiguous range — gathers at leaves become
  short coalesced windows,
* layout: depth-first preorder with skip links, so traversal is stackless:
  on AABB hit descend to node+1, on miss jump to the precomputed skip node
  (classic threaded BVH). The whole ray batch walks in lockstep inside one
  `lax.while_loop`; per-step work is a [R]-wide gather + slab test + a
  fixed-width masked leaf intersection.

The build runs on host in NumPy at scene-build time (the analog of the
reference's synchronous device BLAS build, Gi.cpp:1105-1118); a native C++
builder can replace it transparently for very large scenes.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gatling_tpu.interface import BARY_EPS, FLOAT_MAX
from gatling_tpu.ops.geometry import SceneGeometry
from gatling_tpu.ops.intersect import Hit

LEAF_SIZE = 4


class BvhArrays(NamedTuple):
    """Flattened threaded BVH (device arrays)."""

    bbox_min: jnp.ndarray  # [N,3] f32
    bbox_max: jnp.ndarray  # [N,3] f32
    skip: jnp.ndarray  # [N] i32: node to visit when this subtree is done/missed
    leaf_start: jnp.ndarray  # [N] i32 triangle range start (reordered soup)
    leaf_count: jnp.ndarray  # [N] i32 (0 for interior nodes)

    @property
    def num_nodes(self) -> int:
        return self.skip.shape[0]


def _morton3(x: np.ndarray) -> np.ndarray:
    """Interleave 10 bits per axis -> 30-bit Morton codes. x in [0,1)^3."""
    q = np.clip((x * 1024.0).astype(np.uint64), 0, 1023)

    def spread(v):
        v = (v | (v << 16)) & np.uint64(0x030000FF)
        v = (v | (v << 8)) & np.uint64(0x0300F00F)
        v = (v | (v << 4)) & np.uint64(0x030C30C3)
        v = (v | (v << 2)) & np.uint64(0x09249249)
        return v

    return (spread(q[:, 0]) << np.uint64(2)) | (spread(q[:, 1]) << np.uint64(1)) | spread(q[:, 2])


def build_bvh(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray,
              leaf_size: int = LEAF_SIZE) -> tuple[BvhArrays, np.ndarray]:
    """Build the threaded BVH. Returns (arrays, triangle_order) where
    triangle_order reorders the original soup so leaves are contiguous.

    Uses the native C++ builder (gatling_tpu/native.py) when available —
    same output contract — and falls back to the NumPy implementation."""
    v0 = np.asarray(v0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    t = len(v0)
    p1 = v0 + e1
    p2 = v0 + e2
    tri_min = np.minimum(np.minimum(v0, p1), p2)
    tri_max = np.maximum(np.maximum(v0, p1), p2)

    from gatling_tpu.native import native_build_bvh

    native = native_build_bvh(tri_min, tri_max, leaf_size)
    if native is not None:
        bbox_min_n, bbox_max_n, skip_n, leaf_start_n, leaf_count_n, order_n = native
        arrays = BvhArrays(
            bbox_min=jnp.asarray(bbox_min_n), bbox_max=jnp.asarray(bbox_max_n),
            skip=jnp.asarray(skip_n), leaf_start=jnp.asarray(leaf_start_n),
            leaf_count=jnp.asarray(leaf_count_n))
        return arrays, order_n

    centroid = (tri_min + tri_max) * 0.5

    lo = centroid.min(axis=0)
    hi = centroid.max(axis=0)
    extent = np.maximum(hi - lo, 1e-12)
    order = np.argsort(_morton3((centroid - lo) / extent), kind="stable").astype(np.int64)

    tri_min = tri_min[order]
    tri_max = tri_max[order]

    # Pass 1: median-split build in preorder (append-before-recurse makes the
    # node list preorder by construction); record each interior node's right
    # child index for skip-link assignment.
    bbox_min: list[np.ndarray] = []
    bbox_max: list[np.ndarray] = []
    leaf_start: list[int] = []
    leaf_count: list[int] = []
    right_child: list[int] = []

    # iterative DFS with an explicit stack (preorder): frames are
    # (start, count, patch_slot) where patch_slot is the parent's
    # right_child entry to fill with this node's index
    stack: list[tuple[int, int, int]] = [(0, t, -1)]
    while stack:
        start, count, patch_slot = stack.pop()
        idx = len(right_child)
        if patch_slot >= 0:
            right_child[patch_slot] = idx
        bbox_min.append(tri_min[start:start + count].min(axis=0))
        bbox_max.append(tri_max[start:start + count].max(axis=0))
        if count <= leaf_size:
            leaf_start.append(start)
            leaf_count.append(count)
            right_child.append(-1)
        else:
            leaf_start.append(0)
            leaf_count.append(0)
            right_child.append(0)  # patched when the right child is emitted
            half = count // 2
            # push right first so the left subtree is emitted first (preorder)
            stack.append((start + half, count - half, idx))
            stack.append((start, half, -1))

    n = len(right_child)
    # Pass 2: skip links. Preorder: interior node's left child is idx+1 with
    # skip = right_child[idx]; right child inherits the node's own skip.
    skip_arr = np.full(n, n, np.int32)

    def assign(idx: int, skip_to: int) -> None:
        frames = [(idx, skip_to)]
        while frames:
            i, s = frames.pop()
            skip_arr[i] = s
            if leaf_count[i] == 0:  # interior
                rc = right_child[i]
                frames.append((i + 1, rc))
                frames.append((rc, s))

    assign(0, n)

    arrays = BvhArrays(
        bbox_min=jnp.asarray(np.stack(bbox_min)),
        bbox_max=jnp.asarray(np.stack(bbox_max)),
        skip=jnp.asarray(skip_arr),
        leaf_start=jnp.asarray(np.array(leaf_start, np.int32)),
        leaf_count=jnp.asarray(np.array(leaf_count, np.int32)),
    )
    return arrays, order


def reorder_geometry(geom: SceneGeometry, order: np.ndarray) -> SceneGeometry:
    """Apply the BVH triangle order to the soup (host-side)."""
    order = jnp.asarray(order)
    return SceneGeometry(*[arr[order] for arr in geom])  # packed rows reorder too


def _slab_test(o, inv_d, tmin, tmax, bmin, bmax):
    """Ray-AABB slab test, batched [R]."""
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tnear = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tfar = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return (tnear <= tfar) & (tfar >= tmin) & (tnear <= tmax)


def _leaf_intersect(geom: SceneGeometry, tri_idx, o, d, tmin, tmax):
    """Möller-Trumbore for one gathered triangle per ray."""
    v0 = geom.v0[tri_idx]
    e1 = geom.e1[tri_idx]
    e2 = geom.e2[tri_idx]
    pvec = jnp.cross(d, e2)
    det = jnp.sum(pvec * e1, axis=-1)
    ok = jnp.abs(det) > 1e-12
    inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv
    t = jnp.sum(e2 * qvec, axis=-1) * inv
    valid = (ok & (u >= -BARY_EPS) & (v >= -BARY_EPS)
             & (u + v <= 1 + BARY_EPS) & (t > tmin) & (t < tmax))
    return t, u, v, valid


@partial(jax.jit, static_argnames=("any_hit",))
def traverse(origins, dirs, tmin, tmax, bvh: BvhArrays, geom: SceneGeometry,
             any_hit: bool = False):
    """Batched stackless traversal. Returns Hit (closest) or bool[R] (any)."""
    r = origins.shape[0]
    n = bvh.num_nodes
    inv_d = 1.0 / dirs  # dirs have no exact zeros (camera adds FLOAT_MIN)

    state = dict(
        node=jnp.zeros((r,), jnp.int32),
        t=jnp.full((r,), FLOAT_MAX, jnp.float32),
        tri=jnp.full((r,), -1, jnp.int32),
        u=jnp.zeros((r,), jnp.float32),
        v=jnp.zeros((r,), jnp.float32),
        shadowed=jnp.zeros((r,), bool),
    )

    def cond(s):
        return jnp.any(s["node"] < n)

    def body(s):
        node = jnp.minimum(s["node"], n - 1)
        active = s["node"] < n
        if any_hit:
            active = active & ~s["shadowed"]
        bmin = bvh.bbox_min[node]
        bmax = bvh.bbox_max[node]
        cur_tmax = jnp.minimum(tmax, s["t"])
        hit_box = _slab_test(origins, inv_d, tmin, cur_tmax, bmin, bmax) & active
        count = bvh.leaf_count[node]
        start = bvh.leaf_start[node]
        is_leaf = count > 0

        t_best, tri_best, u_best, v_best = s["t"], s["tri"], s["u"], s["v"]
        shadowed = s["shadowed"]
        do_leaf = hit_box & is_leaf
        for k in range(LEAF_SIZE):
            tri_idx = jnp.minimum(start + k, geom.num_triangles - 1)
            in_range = do_leaf & (k < count)
            t, u, v, valid = _leaf_intersect(
                geom, tri_idx, origins, dirs, tmin, jnp.minimum(tmax, t_best))
            valid = valid & in_range
            if any_hit:
                shadowed = shadowed | valid
            else:
                better = valid & (t < t_best)
                tri_best = jnp.where(better, tri_idx, tri_best)
                u_best = jnp.where(better, u, u_best)
                v_best = jnp.where(better, v, v_best)
                t_best = jnp.where(better, t, t_best)

        descend = hit_box & ~is_leaf
        next_node = jnp.where(descend, node + 1, bvh.skip[node])
        next_node = jnp.where(active, next_node, s["node"])
        if any_hit:
            next_node = jnp.where(shadowed, n, next_node)
        return dict(node=next_node, t=t_best, tri=tri_best, u=u_best,
                    v=v_best, shadowed=shadowed)

    out = jax.lax.while_loop(cond, body, state)
    if any_hit:
        return out["shadowed"]
    return Hit(t=out["t"], tri=out["tri"], u=out["u"], v=out["v"])


def traverse_closest(origins, dirs, tmin, tmax, bvh, geom) -> Hit:
    return traverse(origins, dirs, tmin, tmax, bvh, geom, any_hit=False)


def traverse_occluded(origins, dirs, tmin, tmax, bvh, geom) -> jnp.ndarray:
    return traverse(origins, dirs, tmin, tmax, bvh, geom, any_hit=True)
