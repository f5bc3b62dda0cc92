"""Multi-chip sharding tests on the 8-virtual-device CPU mesh
(the TPU-mesh stand-in, conftest.py)."""

import jax
import numpy as np
import pytest

import __graft_entry__ as graft
from gatling_tpu.parallel.sharding import make_mesh, render_frame_sharded_jit
from gatling_tpu.render.integrator import render_frame


requires_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


@requires_8
def test_dryrun_multichip():
    graft.dryrun_multichip(8)


def test_entry_compiles():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert np.isfinite(np.asarray(out["color"])).all()


@requires_8
def test_sharded_matches_single_chip():
    """Tile sharding must be bit-compatible with the single-chip render:
    identical pixels, identical RNG streams, no collectives on the tile axis."""
    config, uniforms, geom, table, lights, dome, aovs = graft._build_cornell_state(
        width=16, height=32, spp=2, max_bounces=3)

    single = render_frame(config, uniforms, geom, table, lights, dome, aovs)

    mesh = make_mesh(n_tiles=8, n_spp=1)
    sharded = render_frame_sharded_jit(
        config, uniforms, geom, table, lights, dome, aovs, mesh)

    a = np.asarray(single["color"])
    b = np.asarray(sharded["color"])
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


@requires_8
def test_spp_sharding_statistics():
    """spp sharding (psum mean over the spp axis) must agree with the
    single-chip estimate in expectation."""
    config, uniforms, geom, table, lights, dome, aovs = graft._build_cornell_state(
        width=16, height=16, spp=8, max_bounces=3)

    single = render_frame(config, uniforms, geom, table, lights, dome, aovs)

    mesh = make_mesh(n_tiles=2, n_spp=4)
    sharded = render_frame_sharded_jit(
        config, uniforms, geom, table, lights, dome, aovs, mesh)

    a = np.asarray(single["color"])[:, :3]
    b = np.asarray(sharded["color"])[:, :3]
    # same sample set, same RNG streams -> identical module accumulation order
    # differs only by the psum tree, so allow loose float tolerance
    np.testing.assert_allclose(a.mean(), b.mean(), rtol=0.02)
    assert np.isfinite(b).all()
