"""Primary ray generation.

Port of the reference's raygen camera model (reference:
src/gi/shaders/rp_main.rgen:185-267): pinhole projection built from
position/forward/up + vfov, jittered or filter-importance-sampled pixel
offsets, and thin-lens depth of field sampled on the aperture.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gatling_tpu.interface import FLOAT_MIN
from gatling_tpu.ops import sampling as smp


class CameraUniforms(NamedTuple):
    """Traced camera values (part of the UniformData analog, rp_main.h)."""

    position: jnp.ndarray  # [3]
    forward: jnp.ndarray  # [3]
    up: jnp.ndarray  # [3]
    vfov: jnp.ndarray  # []
    lens_radius: jnp.ndarray  # [] (0 disables DoF; Gi.cpp:2378-2381)
    focus_distance: jnp.ndarray  # []
    sensor_exposure: jnp.ndarray  # []
    clip_start: jnp.ndarray  # []
    clip_end: jnp.ndarray  # []


def generate_primary_rays(
    cam: CameraUniforms,
    width: int,
    height: int,
    pixel_x: jnp.ndarray,  # [R] i32
    pixel_y: jnp.ndarray,  # [R] i32
    rng_state: jnp.ndarray,  # [R] u32
    jittered: bool,
    fis: bool,
    depth_of_field: bool,
):
    """Returns (origins[R,3], dirs[R,3], rng_state[R]).

    Math follows rp_main.rgen:204-281 exactly, including the RNG draw order
    (2 floats for the pixel offset, then 2 for the lens sample if DoF)."""
    camera_right = jnp.cross(cam.forward, cam.up)
    aspect = width / height

    h = 1.0
    w = h * aspect
    d = h / (2.0 * jnp.tan(cam.vfov * 0.5))

    wx = w / width
    hy = h / height

    c = cam.position + cam.forward * d
    left = c - camera_right * (w * 0.5) - cam.up * (h * 0.5)

    rng_state, rand2 = smp.rng_next2f(rng_state)
    if jittered and fis:
        offset = 0.5 + smp.fis_gauss(rand2)
    elif jittered:
        offset = rand2
    else:
        offset = jnp.full_like(rand2, 0.5)

    p = (
        left
        + (pixel_x.astype(jnp.float32) + offset[:, 0])[:, None] * camera_right * wx
        + (pixel_y.astype(jnp.float32) + offset[:, 1])[:, None] * cam.up * hy
    )
    origins = jnp.broadcast_to(cam.position, p.shape)
    dirs = p - origins
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    if depth_of_field:
        rng_state, rand_zw = smp.rng_next2f(rng_state)
        focal_point = origins + dirs * cam.focus_distance
        aperture = smp.sample_hemisphere(rand_zw)[:, :2] * cam.lens_radius
        shifted = (
            origins
            + aperture[:, 0:1] * camera_right
            + aperture[:, 1:2] * cam.up
        )
        dof_dirs = focal_point - shifted
        dof_dirs = dof_dirs / jnp.linalg.norm(dof_dirs, axis=-1, keepdims=True)
        use = cam.lens_radius > 0.0
        origins = jnp.where(use, shifted, origins)
        dirs = jnp.where(use, dof_dirs, dirs)

    # avoid zero components: inverses of the direction are taken downstream
    # (rp_main.rgen:279-281)
    dirs = dirs + jnp.where(dirs == 0.0, FLOAT_MIN, 0.0)
    return origins, dirs, rng_state
