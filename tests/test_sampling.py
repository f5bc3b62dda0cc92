"""Tests for RNG / codec / sampling parity with the reference shader math
(reference: src/gi/shaders/common.glsl)."""

import numpy as np
import jax
import jax.numpy as jnp

from gatling_tpu.ops import sampling as smp


def _np_pcg32(state: np.uint32):
    """Straight NumPy port of common.glsl hash_pcg32 used as an independent oracle."""
    with np.errstate(over="ignore"):
        state = np.uint32(state * np.uint32(747796405) + np.uint32(2891336453))
        shift = np.uint32((state >> np.uint32(28)) + np.uint32(4))
        word = np.uint32(((state >> shift) ^ state) * np.uint32(277803737))
        word = np.uint32((word >> np.uint32(22)) ^ word)
    return state, word


def _np_theironborn(x: np.uint32):
    with np.errstate(over="ignore"):
        x = np.uint32(x)
        x ^= x >> np.uint32(16)
        x = np.uint32(x * np.uint32(0x21F0AAAD))
        x ^= x >> np.uint32(15)
        x = np.uint32(x * np.uint32(0xD35A2D97))
        x ^= x >> np.uint32(15)
    return x


def test_pcg32_matches_numpy_oracle():
    seeds = np.array([0, 1, 42, 0xDEADBEEF, 0xFFFFFFFF], dtype=np.uint32)
    for s in seeds:
        st_np, w_np = _np_pcg32(s)
        st_j, w_j = smp.pcg32_step(jnp.uint32(s))
        assert np.uint32(st_j) == st_np
        assert np.uint32(w_j) == w_np


def test_theironborn_matches_numpy_oracle():
    for s in [0, 1, 7, 123456789, 0xFFFFFFFF]:
        assert np.uint32(smp.hash_theironborn(jnp.uint32(s))) == _np_theironborn(np.uint32(s))


def test_uint_as_float_range_and_value():
    # uintAsFloat(v) = bitcast(0x3f800000 | (v >> 9)) - 1 in [0, 1)
    vals = smp.uint_as_float(jnp.array([0, 1 << 9, 0xFFFFFFFF], dtype=jnp.uint32))
    assert float(vals[0]) == 0.0
    assert np.allclose(float(vals[1]), np.float32(2.0 ** -23))
    assert 0.0 <= float(vals[2]) < 1.0


def test_rng_stream_uniformity():
    n = 4096
    state = smp.rng_init(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(0))
    state, x = smp.rng_next1f(state)
    x = np.asarray(x)
    assert (x >= 0).all() and (x < 1).all()
    assert abs(x.mean() - 0.5) < 0.02
    assert abs(np.cov(x[:-1], x[1:])[0, 1]) < 0.01  # decorrelated across pixels


def test_rng_init_seed_zero_pixel():
    # pixelIndex 0 must still vary with sampleIndex (init multiplies by sample+1).
    s0 = smp.rng_init(jnp.uint32(0), jnp.uint32(0))
    s1 = smp.rng_init(jnp.uint32(0), jnp.uint32(1))
    assert np.uint32(s0) == np.uint32(s1)  # 0 * anything == 0 -> same hash, like reference
    # but pixel 1 differs per sample
    p0 = smp.rng_init(jnp.uint32(1), jnp.uint32(0))
    p1 = smp.rng_init(jnp.uint32(1), jnp.uint32(1))
    assert np.uint32(p0) != np.uint32(p1)


def test_octahedral_roundtrip():
    rng = np.random.default_rng(0)
    d = rng.normal(size=(1024, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dec = np.asarray(smp.decode_octahedral(smp.encode_octahedral(jnp.asarray(d))))
    dots = (dec * d).sum(-1)
    assert dots.min() > 0.99999

    # packed u32 roundtrip (16-bit quantization)
    dec16 = np.asarray(smp.decode_direction(smp.encode_direction(jnp.asarray(d))))
    dots16 = (dec16 * d).sum(-1)
    assert dots16.min() > 0.9999


def test_orthonormal_basis():
    rng = np.random.default_rng(1)
    n = rng.normal(size=(512, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    b1, b2 = smp.orthonormal_basis(jnp.asarray(n))
    b1, b2 = np.asarray(b1), np.asarray(b2)
    assert np.abs((b1 * n).sum(-1)).max() < 1e-5
    assert np.abs((b2 * n).sum(-1)).max() < 1e-5
    assert np.abs((b1 * b2).sum(-1)).max() < 1e-5
    assert np.abs(np.linalg.norm(b1, axis=-1) - 1).max() < 1e-5


def test_sample_hemisphere_cosine_weighted():
    rng = np.random.default_rng(2)
    xi = jnp.asarray(rng.random((8192, 2), dtype=np.float32))
    d = np.asarray(smp.sample_hemisphere(xi))
    assert (d[:, 2] >= 0).all()
    assert np.abs(np.linalg.norm(d, axis=-1) - 1).max() < 1e-5
    # E[cos theta] = 2/3 for cosine-weighted distribution
    assert abs(d[:, 2].mean() - 2.0 / 3.0) < 0.01


def test_sample_disk_in_bounds():
    rng = np.random.default_rng(3)
    xi = jnp.asarray(rng.random((4096, 2), dtype=np.float32))
    r = jnp.asarray(np.array([2.0, 3.0], dtype=np.float32))
    p = np.asarray(smp.sample_disk(xi, r))
    assert ((p[:, 0] / 2.0) ** 2 + (p[:, 1] / 3.0) ** 2).max() <= 1.0 + 1e-5


def test_offset_ray_origin_moves_forward():
    p = jnp.asarray(np.array([[1.0, -2.0, 0.0001], [100.0, 0.5, -50.0]], dtype=np.float32))
    n = jnp.asarray(np.array([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0]], dtype=np.float32))
    q = np.asarray(smp.offset_ray_origin(p, n))
    # offset must move the point along the normal, never backwards
    assert ((q - np.asarray(p)) * np.asarray(n)).sum(-1).min() > 0.0


def test_safe_div():
    a = jnp.asarray(np.array([1.0, 2.0], np.float32))
    b = jnp.asarray(np.array([0.0, 4.0], np.float32))
    out = np.asarray(smp.safe_div(a, b))
    assert out[0] == 0.0 and out[1] == 0.5


def test_fis_gauss_distribution():
    rng = np.random.default_rng(4)
    xi = jnp.asarray(rng.random((16384, 2), dtype=np.float32))
    o = np.asarray(smp.fis_gauss(xi))
    assert abs(o[:, 0].std() - 0.375) < 0.01
    assert abs(o.mean()) < 0.01


def test_all_jittable():
    @jax.jit
    def chain(seed):
        st = smp.rng_init(seed, jnp.uint32(3))
        st, xi = smp.rng_next4f(st)
        d = smp.sample_hemisphere(xi[..., :2])
        return smp.encode_direction(d)

    out = chain(jnp.uint32(12345))
    assert out.dtype == jnp.uint32
