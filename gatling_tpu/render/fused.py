"""Fused-megakernel render path (fast path driver).

Drives ops/pallas_bounce.py: camera rays are generated in XLA once per
sample, packed into the [16, R/128, 128] component-major state, then the
fused bounce kernel advances ALL rays per bounce with no intermediate HBM
traffic. Falls within the general integrator's contract (same RNG seeding
per pixel/sample, same accumulation) for configs it supports:
no NEE, no textures, no volumes, no cutout, no dome texture.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from gatling_tpu.ops import sampling as smp
from gatling_tpu.ops.pallas_bounce import (
    FusedScene,
    bounce_step,
    make_params,
    pack_state,
    unpack_radiance,
)
from gatling_tpu.render.camera import generate_primary_rays
from gatling_tpu.render.integrator import RenderConfig, Uniforms


def supports_fused(config: RenderConfig, has_textures: bool) -> bool:
    return (
        not config.nee
        and not config.has_volumes
        and not config.has_cutout
        and not config.has_dome
        and not config.clipping_planes
        and not has_textures
        and config.aov_mask in (1,)  # COLOR only
    )


@partial(jax.jit, static_argnames=("config", "n_tris", "n_mats", "spp"))
def render_pixels_fused(
    config: RenderConfig,
    uniforms: Uniforms,
    scene: FusedScene,
    pixel_index: jnp.ndarray,
    spp: int,
    sample_offset: jnp.ndarray,
    *,
    n_tris: int,
    n_mats: int,
):
    """Returns mean color [R,3] over spp samples."""
    r = pixel_index.shape[0]
    r_pad = -(-r // 1024) * 1024
    px = pixel_index % config.width
    py = pixel_index // config.width

    def sample_body(s, acc):
        rng = smp.rng_init(pixel_index.astype(jnp.uint32),
                           (sample_offset + s).astype(jnp.uint32))
        origins, dirs, rng = generate_primary_rays(
            uniforms.camera, config.width, config.height, px, py, rng,
            config.jittered, config.fis, config.depth_of_field)
        state = pack_state(origins, dirs, rng, r_pad)

        def cond(carry):
            bounce, state = carry
            return (bounce < config.max_bounces) & (jnp.max(state[13]) > 0.5)

        def body(carry):
            bounce, state = carry
            params = make_params(config, uniforms, bounce)
            state = bounce_step(params, scene, state, n_tris=n_tris, n_mats=n_mats)
            return bounce + 1, state

        _, state = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
        radiance = unpack_radiance(state, r)
        # radiance clamp (rgen:488-494)
        max_v = jnp.max(radiance, axis=-1)
        scale = jnp.where(max_v > uniforms.max_sample_value,
                          uniforms.max_sample_value / jnp.maximum(max_v, 1e-20), 1.0)
        return acc + jnp.maximum(radiance * scale[:, None], 0.0) / spp

    return jax.lax.fori_loop(0, spp, sample_body, jnp.zeros((r, 3), jnp.float32))
