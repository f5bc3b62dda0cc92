"""RNG, direction codecs and sampling transformations.

Bit-exact JAX ports of the reference's shader helpers
(reference: src/gi/shaders/common.glsl). Keeping the PCG hash chain and the
uint->unit-float mapping identical means our per-pixel sample sequences are
decorrelated exactly like the reference's, so convergence statistics match
even though dispatch order differs (SURVEY.md §7 hard part 4).

All functions are shape-polymorphic: scalars or batched arrays of uint32 /
float32 work alike, and everything is jit/vmap-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PI = 3.1415926535897932384626433832795

_U32 = jnp.uint32


def _u32(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=_U32)


def uint_as_float(v: jnp.ndarray) -> jnp.ndarray:
    """Map uint32 -> [0,1) float (reference: common.glsl uintAsFloat:44-47)."""
    bits = jnp.bitwise_or(_u32(0x3F800000), jnp.right_shift(_u32(v), _u32(9)))
    return jax.lax.bitcast_convert_type(bits, jnp.float32) - jnp.float32(1.0)


def hash_theironborn(x: jnp.ndarray) -> jnp.ndarray:
    """Hash-prospector parametrization (reference: common.glsl:79-88)."""
    x = _u32(x)
    x = jnp.bitwise_xor(x, jnp.right_shift(x, _u32(16)))
    x = x * _u32(0x21F0AAAD)
    x = jnp.bitwise_xor(x, jnp.right_shift(x, _u32(15)))
    x = x * _u32(0xD35A2D97)
    x = jnp.bitwise_xor(x, jnp.right_shift(x, _u32(15)))
    return x


def pcg32_step(state: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One PCG step returning (new_state, word) (reference: common.glsl:91-97)."""
    state = _u32(state)
    new_state = state * _u32(747796405) + _u32(2891336453)
    shift = jnp.right_shift(new_state, _u32(28)) + _u32(4)
    word = jnp.bitwise_xor(jnp.right_shift(new_state, shift), new_state) * _u32(277803737)
    word = jnp.bitwise_xor(jnp.right_shift(word, _u32(22)), word)
    return new_state, word


def rng_init(pixel_index: jnp.ndarray, sample_index: jnp.ndarray) -> jnp.ndarray:
    """Per-(pixel,sample) decorrelated seed (reference: common.glsl rng1d_init:119-122)."""
    return hash_theironborn(_u32(pixel_index) * (_u32(sample_index) + _u32(1)))


def rng_next1f(state: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Draw one float in [0,1) (reference: common.glsl rng1d_next1f:100-104)."""
    state, word = pcg32_step(state)
    return state, uint_as_float(word)


def rng_next2f(state: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    state, a = rng_next1f(state)
    state, b = rng_next1f(state)
    return state, jnp.stack([a, b], axis=-1)


def rng_next4f(state: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    state, a = rng_next1f(state)
    state, b = rng_next1f(state)
    state, c = rng_next1f(state)
    state, d = rng_next1f(state)
    return state, jnp.stack([a, b, c, d], axis=-1)


# ---------------------------------------------------------------------------
# Orthonormal basis (Duff et al. 2017; reference: common.glsl:127-137)
# ---------------------------------------------------------------------------

def orthonormal_basis(n: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Build tangent/bitangent for unit normals n[..., 3]."""
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    nsign = jnp.where(nz >= 0.0, 1.0, -1.0).astype(n.dtype)
    a = -1.0 / (nsign + nz)
    b = nx * ny * a
    b1 = jnp.stack([1.0 + nsign * nx * nx * a, nsign * b, -nsign * nx], axis=-1)
    b2 = jnp.stack([b, nsign + ny * ny * a, -ny], axis=-1)
    return b1, b2


# ---------------------------------------------------------------------------
# Octahedral direction codec (reference: common.glsl:171-207)
# ---------------------------------------------------------------------------

def _sign_non_zero(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(v >= 0.0, 1.0, -1.0).astype(v.dtype)


def encode_octahedral(v: jnp.ndarray) -> jnp.ndarray:
    """Unit direction [...,3] -> octahedral uv in [0,1]^2."""
    denom = jnp.abs(v[..., 0]) + jnp.abs(v[..., 1]) + jnp.abs(v[..., 2])
    v = v / denom[..., None]
    xy = v[..., :2]
    # fold lower hemisphere: (1 - |v.yx|) * signNonZero(v.xy)
    folded = (1.0 - jnp.abs(jnp.stack([v[..., 1], v[..., 0]], axis=-1))) * _sign_non_zero(xy)
    e = jnp.where((v[..., 2] < 0.0)[..., None], folded, xy)
    return e * 0.5 + 0.5


def decode_octahedral(e: jnp.ndarray) -> jnp.ndarray:
    """Octahedral uv in [0,1]^2 -> unit direction [...,3]."""
    e = e * 2.0 - 1.0
    z = 1.0 - jnp.abs(e[..., 0]) - jnp.abs(e[..., 1])
    t = jnp.maximum(-z, 0.0)
    x = e[..., 0] + jnp.where(e[..., 0] >= 0.0, -t, t)
    y = e[..., 1] + jnp.where(e[..., 1] >= 0.0, -t, t)
    v = jnp.stack([x, y, z], axis=-1)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def _pack_unorm16(x: jnp.ndarray) -> jnp.ndarray:
    return _u32(jnp.round(jnp.clip(x, 0.0, 1.0) * 65535.0).astype(jnp.uint32))


def encode_direction(d: jnp.ndarray) -> jnp.ndarray:
    """Unit direction -> packed 2x16 unorm octahedral uint32 (common.glsl:199-203)."""
    o = encode_octahedral(d)
    return _pack_unorm16(o[..., 0]) | jnp.left_shift(_pack_unorm16(o[..., 1]), _u32(16))


def decode_direction(e: jnp.ndarray) -> jnp.ndarray:
    e = _u32(e)
    u = (e & _u32(0xFFFF)).astype(jnp.float32) / 65535.0
    v = jnp.right_shift(e, _u32(16)).astype(jnp.float32) / 65535.0
    return decode_octahedral(jnp.stack([u, v], axis=-1))


# ---------------------------------------------------------------------------
# Sampling zoo (RT Gems / Shirley ch. 16; reference: common.glsl:209-252)
# ---------------------------------------------------------------------------

def sample_hemisphere(xi: jnp.ndarray) -> jnp.ndarray:
    """Cosine-weighted hemisphere sample from xi[...,2] (common.glsl:210-219)."""
    a = jnp.sqrt(xi[..., 0])
    b = PI * 2.0 * xi[..., 1]
    return jnp.stack([a * jnp.cos(b), a * jnp.sin(b), jnp.sqrt(1.0 - xi[..., 0])], axis=-1)


def sample_sphere(xi: jnp.ndarray, radius: jnp.ndarray) -> jnp.ndarray:
    """Sphere-surface sample scaled by per-axis radius (common.glsl:222-229)."""
    a = 1.0 - 2.0 * xi[..., 0]
    b = jnp.sqrt(jnp.maximum(0.0, 1.0 - a * a))
    phi = 2.0 * PI * xi[..., 1]
    return jnp.stack([b * jnp.cos(phi), b * jnp.sin(phi), a], axis=-1) * radius


def sample_disk(xi: jnp.ndarray, radius: jnp.ndarray) -> jnp.ndarray:
    """Concentric disk sample scaled by radius[...,2] (common.glsl:232-252)."""
    a = 2.0 * xi[..., 0] - 1.0
    b = 2.0 * xi[..., 1] - 1.0
    use_a = (a * a) > (b * b)
    r = jnp.where(use_a[..., None], radius * a[..., None], radius * b[..., None])
    phi = jnp.where(
        use_a,
        (PI / 4.0) * safe_div(b, a),
        (PI / 2.0) - (PI / 4.0) * safe_div(a, b),
    )
    return r * jnp.stack([jnp.cos(phi), jnp.sin(phi)], axis=-1)


def safe_div(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """0-on-0 division (reference: common.glsl safe_div:18-35)."""
    return jnp.where(b == 0.0, jnp.zeros_like(a * b), a / jnp.where(b == 0.0, 1.0, b))


def luminance(rgb: jnp.ndarray) -> jnp.ndarray:
    """Rec.709 luminance (common.glsl:254-257)."""
    return rgb[..., 0] * 0.2126 + rgb[..., 1] * 0.7152 + rgb[..., 2] * 0.0722


# ---------------------------------------------------------------------------
# Self-intersection-safe ray origin offset
# (Wächter & Binder, RT Gems I ch. 6; reference: common.glsl:139-162 with the
#  reference's empirically tuned intScale = 64)
# ---------------------------------------------------------------------------

def offset_ray_origin(p: jnp.ndarray, geom_normal: jnp.ndarray) -> jnp.ndarray:
    """Scale-adaptive offset along the geometric normal.

    Numerically equivalent in effect to the reference's integer-ulp version
    (64 ulps at magnitude |p|), but expressed in pure f32 arithmetic: the
    int32 bitcast formulation costs ~30 ms per 1.4M rays on TPU (bitcasts
    block fusion), while this costs <1 ms. 64 ulps of a float with exponent
    e is 64 * 2^(e-23) = |p| * 2^-17 * (1..2)."""
    ulp_scale = jnp.float32(2.0 ** -16)  # ~64-128 ulps, matches intScale=64
    float_scale = jnp.float32(1.0 / 65536.0)
    mag = jnp.abs(p)
    off = geom_normal * jnp.maximum(mag * ulp_scale, float_scale)
    return p + off


# ---------------------------------------------------------------------------
# Filter importance sampling of a Gauss kernel (reference: rp_main.rgen:118-130)
# ---------------------------------------------------------------------------

def fis_gauss(xi: jnp.ndarray) -> jnp.ndarray:
    """Box-Muller sample of a sigma=0.375 Gaussian pixel filter.

    The lower clamp must be a NORMAL f32 (the reference's 1e-38 is subnormal
    and gets flushed to zero on TPU/CPU, turning log() into -inf)."""
    u1 = jnp.maximum(jnp.float32(1.1754944e-38), xi[..., 0])
    u2 = xi[..., 1]
    sigma = 0.375
    r = sigma * jnp.sqrt(-2.0 * jnp.log(u1))
    phi = 2.0 * PI * u2
    return jnp.stack([jnp.cos(phi), jnp.sin(phi)], axis=-1) * r[..., None]
