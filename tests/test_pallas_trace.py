"""Validate the MXU-matmul Möller-Trumbore formulation against the classic
elementwise implementation, and the Pallas kernel (interpret mode on CPU)
against both."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gatling_tpu.interface import FLOAT_MAX
from gatling_tpu.ops import pallas_trace as ptr
from gatling_tpu.ops.geometry import SceneGeometry, build_geometry
from gatling_tpu.ops.intersect import intersect_brute, occluded_brute
from gatling_tpu.scene.stage import load_scene


def _random_geom(n_tris=128, seed=0):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-2, 2, (n_tris, 3)).astype(np.float32)
    e1 = rng.uniform(-1, 1, (n_tris, 3)).astype(np.float32)
    e2 = rng.uniform(-1, 1, (n_tris, 3)).astype(np.float32)
    from gatling_tpu.ops.geometry import pack_geometry

    z3 = jnp.zeros((n_tris, 3), jnp.float32)
    z2 = jnp.zeros((n_tris, 2), jnp.float32)
    zi = jnp.zeros((n_tris,), jnp.int32)
    return pack_geometry(SceneGeometry(
        v0=jnp.asarray(v0), e1=jnp.asarray(e1), e2=jnp.asarray(e2),
        n0=z3, n1=z3, n2=z3, t0=z3, t1=z3, t2=z3, bsign=z3,
        uv0=z2, uv1=z2, uv2=z2,
        c0=jnp.ones((n_tris, 3), jnp.float32),
        c1=jnp.ones((n_tris, 3), jnp.float32),
        c2=jnp.ones((n_tris, 3), jnp.float32),
        material_id=zi, object_id=zi, face_id=zi, instance_id=zi, flags=zi,
        packed_f=jnp.zeros((n_tris, 45), jnp.float32),
        packed_i=jnp.zeros((n_tris, 5), jnp.int32)))


def _random_rays(n_rays=256, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-4, 4, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_feature_formulation_matches_classic():
    geom = _random_geom()
    o, d = _random_rays()
    tmin = jnp.zeros(o.shape[0])
    tmax = jnp.full((o.shape[0],), FLOAT_MAX)

    classic = intersect_brute(o, d, tmin, tmax, geom)
    tables = ptr.build_trace_tables(geom)
    feat = ptr.intersect_features_jnp(o, d, tmin, tmax, tables)

    c_hit = np.asarray(classic.tri)
    f_hit = np.asarray(feat.tri)
    agree = c_hit == f_hit
    # allow a tiny fraction of edge-grazing disagreements from fp reassociation
    assert agree.mean() > 0.99
    both = agree & (c_hit >= 0)
    np.testing.assert_allclose(np.asarray(classic.t)[both], np.asarray(feat.t)[both], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(classic.u)[both], np.asarray(feat.u)[both], atol=2e-3)
    np.testing.assert_allclose(np.asarray(classic.v)[both], np.asarray(feat.v)[both], atol=2e-3)


def test_pallas_kernel_interpret_matches_reference():
    geom = _random_geom(n_tris=256, seed=3)
    o, d = _random_rays(n_rays=512, seed=4)
    tmin = jnp.zeros(o.shape[0])
    tmax = jnp.full((o.shape[0],), FLOAT_MAX)
    tables = ptr.build_trace_tables(geom)

    ref = ptr.intersect_features_jnp(o, d, tmin, tmax, tables)

    import jax.experimental.pallas as pl  # noqa: F401
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        out = ptr.intersect_pallas(o, d, tmin, tmax, tables)

    agree = np.asarray(ref.tri) == np.asarray(out.tri)
    assert agree.mean() > 0.995
    both = agree & (np.asarray(ref.tri) >= 0)
    np.testing.assert_allclose(np.asarray(ref.t)[both], np.asarray(out.t)[both], rtol=1e-4, atol=1e-4)


def test_pallas_occlusion_interpret():
    geom = _random_geom(n_tris=128, seed=5)
    o, d = _random_rays(n_rays=512, seed=6)
    tmin = jnp.zeros(o.shape[0])
    tmax = jnp.full((o.shape[0],), FLOAT_MAX)
    tables = ptr.build_trace_tables(geom)

    ref = occluded_brute(o, d, tmin, tmax, geom)
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        out = ptr.occluded_pallas(o, d, tmin, tmax, tables)
    assert (np.asarray(ref) == np.asarray(out)).mean() > 0.995


def test_cornell_feature_parity():
    desc = load_scene("/root/reference/cornell.usda")
    midx = {m.material: i for i, m in enumerate(desc.meshes)}
    geom = build_geometry(desc.meshes, midx)
    o, d = _random_rays(n_rays=512, seed=7)
    o = o * 0.3  # keep origins inside the box
    tmin = jnp.zeros(o.shape[0])
    tmax = jnp.full((o.shape[0],), FLOAT_MAX)

    classic = intersect_brute(o, d, tmin, tmax, geom)
    tables = ptr.build_trace_tables(geom)
    feat = ptr.intersect_features_jnp(o, d, tmin, tmax, tables)
    agree = np.asarray(classic.tri) == np.asarray(feat.tri)
    assert agree.mean() > 0.99
