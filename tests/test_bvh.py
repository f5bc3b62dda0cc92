"""BVH build + traversal correctness: must agree with brute force."""

import numpy as np
import jax.numpy as jnp

from gatling_tpu.interface import FLOAT_MAX
from gatling_tpu.ops import bvh as bvh_mod
from gatling_tpu.ops.geometry import build_geometry
from gatling_tpu.ops.intersect import intersect_brute, occluded_brute
from gatling_tpu.scene.stage import load_scene
from tests.test_pallas_trace import _random_geom, _random_rays


def _reordered(geom):
    bvh, order = bvh_mod.build_bvh(geom.v0, geom.e1, geom.e2)
    return bvh, bvh_mod.reorder_geometry(geom, order)


def test_bvh_structure_valid():
    geom = _random_geom(n_tris=333, seed=11)
    bvh, order = bvh_mod.build_bvh(geom.v0, geom.e1, geom.e2)
    n = bvh.num_nodes
    skip = np.asarray(bvh.skip)
    counts = np.asarray(bvh.leaf_count)
    starts = np.asarray(bvh.leaf_start)
    assert (skip > np.arange(n)).all()  # skips always advance -> termination
    assert skip.max() == n
    # leaves cover all triangles exactly once
    leaf_tris = []
    for s, c in zip(starts[counts > 0], counts[counts > 0]):
        leaf_tris.extend(range(s, s + c))
    assert sorted(leaf_tris) == list(range(333))
    assert counts.max() <= bvh_mod.LEAF_SIZE


def test_bvh_matches_brute_random():
    geom = _random_geom(n_tris=700, seed=12)
    bvh, rgeom = _reordered(geom)
    o, d = _random_rays(n_rays=1024, seed=13)
    tmin = jnp.zeros(o.shape[0])
    tmax = jnp.full((o.shape[0],), FLOAT_MAX)

    brute = intersect_brute(o, d, tmin, tmax, rgeom)
    tr = bvh_mod.traverse_closest(o, d, tmin, tmax, bvh, rgeom)

    agree = np.asarray(brute.tri) == np.asarray(tr.tri)
    assert agree.mean() > 0.995  # rare edge-grazing fp disagreements allowed
    both = agree & (np.asarray(brute.tri) >= 0)
    np.testing.assert_allclose(np.asarray(brute.t)[both], np.asarray(tr.t)[both], rtol=1e-5)


def test_bvh_occlusion_matches_brute():
    geom = _random_geom(n_tris=300, seed=14)
    bvh, rgeom = _reordered(geom)
    o, d = _random_rays(n_rays=512, seed=15)
    tmin = jnp.full((o.shape[0],), 0.01)
    tmax = jnp.full((o.shape[0],), 3.0)

    brute = occluded_brute(o, d, tmin, tmax, rgeom)
    tr = bvh_mod.traverse_occluded(o, d, tmin, tmax, bvh, rgeom)
    assert (np.asarray(brute) == np.asarray(tr)).mean() > 0.995


def test_bvh_cornell():
    desc = load_scene("/root/reference/cornell.usda")
    midx = {m.material: i for i, m in enumerate(desc.meshes)}
    geom = build_geometry(desc.meshes, midx)
    bvh, rgeom = _reordered(geom)
    o, d = _random_rays(n_rays=512, seed=16)
    o = o * 0.3
    tmin = jnp.zeros(o.shape[0])
    tmax = jnp.full((o.shape[0],), FLOAT_MAX)
    brute = intersect_brute(o, d, tmin, tmax, rgeom)
    tr = bvh_mod.traverse_closest(o, d, tmin, tmax, bvh, rgeom)
    assert (np.asarray(brute.tri) == np.asarray(tr.tri)).mean() > 0.995
    # hit rates must match exactly (the box front is open, so not all rays hit)
    assert (np.asarray(tr.tri) >= 0).mean() == (np.asarray(brute.tri) >= 0).mean()


def test_shared_edge_watertight():
    """Rays through the exact shared edge of a fan-triangulated quad must
    hit one of the adjacent triangles in every tracer (the Vulkan RT
    traversal the reference dispatches is watertight by spec; BARY_EPS)."""
    import numpy as np
    import jax.numpy as jnp

    from gatling_tpu.interface import FLOAT_MAX
    from gatling_tpu.ops.geometry import build_geometry
    from gatling_tpu.ops.intersect import intersect_brute
    from gatling_tpu.ops import pallas_trace as ptr
    from gatling_tpu.scene.meshproc import build_triangulated_mesh
    from gatling_tpu.scene.stage import MeshDesc

    pts = np.array([[-1.4, -1.4, 0], [1.4, -1.4, 0],
                    [-1.4, 1.4, 0], [1.4, 1.4, 0]], np.float32)
    mesh = build_triangulated_mesh(pts, np.array([4]), np.array([0, 1, 3, 2]))
    geom = build_geometry(
        [MeshDesc(path="/q", mesh=mesh, transform=np.eye(4), material=None,
                  double_sided=True, object_id=0)], {None: 0})

    # origins exactly on the diagonal x == y (the shared edge), z = 5
    xs = np.linspace(-1.3, 1.3, 41, dtype=np.float32)
    o = jnp.asarray(np.stack([xs, xs, np.full_like(xs, 5.0)], axis=1))
    d = jnp.asarray(np.tile(np.array([[0, 0, -1]], np.float32), (len(xs), 1)))
    tmin = jnp.zeros(len(xs))
    tmax = jnp.full((len(xs),), FLOAT_MAX)

    hit = intersect_brute(o, d, tmin, tmax, geom)
    assert bool((np.asarray(hit.tri) >= 0).all()), "brute misses shared edge"

    tables = ptr.build_trace_tables(geom)
    feat = ptr.intersect_features_jnp(o, d, tmin, tmax, tables)
    assert bool((np.asarray(feat.tri) >= 0).all()), "feature tracer misses shared edge"

    from gatling_tpu.ops import bvh as bvh_mod
    from gatling_tpu.ops.geometry import pack_geometry

    bvh, order = bvh_mod.build_bvh(geom.v0, geom.e1, geom.e2)
    rgeom = pack_geometry(bvh_mod.reorder_geometry(geom, order))
    bh = bvh_mod.traverse_closest(o, d, tmin, tmax, bvh, rgeom)
    assert bool((np.asarray(bh.tri) >= 0).all()), "bvh walk misses shared edge"
