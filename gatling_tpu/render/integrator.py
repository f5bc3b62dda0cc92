"""Wavefront path-tracing integrator.

The TPU-native reformulation of the reference's ray-tracing megakernel
(reference: src/gi/shaders/rp_main.rgen main:185-521, rp_main.chit
main:132-493, rp_main.miss:55-87). The per-pixel divergent `while(true)`
bounce loop becomes a batched `lax.while_loop` over a fixed ray array:
every bounce traces all rays (masked), shades them with the parameter-table
uber-BSDF (one fused vectorized evaluation instead of per-material SBT hit
shaders), runs the NEE shadow stream, and applies russian roulette. Early
exit happens when every ray has terminated.

RNG draw order matches the reference shader exactly (pixel jitter -> DoF ->
bsdf xi4 -> NEE k4 -> russian roulette), so per-pixel sample statistics are
comparable.

Note on NEE weighting: the reference multiplies the NEE contribution by the
path throughput *after* the current bounce's bsdf_over_pdf update
(rp_main.chit:360-389 then :393-444). We reproduce that behavior bit-for-bit
for image parity.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gatling_tpu.interface import (
    AovId,
    BSDF_EVENT_ABSORB,
    BSDF_EVENT_DIFFUSE,
    BSDF_EVENT_GLOSSY,
    BSDF_EVENT_TRANSMISSION,
    FLOAT_MAX,
    LightArrays,
    MESH_FLAG_DOUBLE_SIDED,
    MESH_FLAG_FLIP_FACING,
    aov_bit,
)
from gatling_tpu.ops import sampling as smp
from gatling_tpu.ops.geometry import SceneGeometry
from gatling_tpu.ops.bvh import BvhArrays, traverse_closest, traverse_occluded
from gatling_tpu.ops.intersect import intersect_brute, occluded_brute
from gatling_tpu.ops.pallas_trace import TraceTables, intersect_pallas, occluded_pallas
from gatling_tpu.render import bsdf as bsdf_mod
from gatling_tpu.render.camera import CameraUniforms, generate_primary_rays
from gatling_tpu.render.lights import sample_light
from gatling_tpu.render.material import (
    MaterialTable,
    apply_textures,
    gather_params,
    perturb_normal,
)
from gatling_tpu.render.texture import TexturePool, empty_pool


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static (compile-time) render configuration. Mirrors the structural
    #defines the reference stitches into its shaders (GlslShaderGen.cpp:79-91:
    AOV_MASK, NEE, DoF, FIS, jitter, clipping, progressive accumulation)."""

    width: int
    height: int
    spp: int = 1
    max_bounces: int = 13
    rr_bounce_offset: int = 3
    jittered: bool = True
    fis: bool = True
    nee: bool = False
    depth_of_field: bool = False
    clipping_planes: bool = False
    progressive: bool = True
    dome_light_camera_visible: bool = True
    aov_mask: int = aov_bit(AovId.COLOR)
    medium_stack_size: int = 0
    # dome-light texture present? (False skips the equirect transcendentals
    # entirely — the miss shader's analog of not binding a dome texture)
    has_dome: bool = True
    # ray-tracing backend: 'brute' (tiled jnp MT), 'pallas' (MXU matmul
    # kernel, ops/pallas_trace.py), 'bvh' (stackless threaded BVH)
    tracer: str = "brute"
    # volumes: compiled in only when some material has volume coefficients
    # (the reference compiles volume code per-material via MDL codegen)
    has_volumes: bool = False
    # cutout transparency: compiled in only when some material has cutout
    # (the reference compiles any-hit shaders per cutout material,
    # Gi.cpp:1110 opaque flag)
    has_cutout: bool = False
    # view/normal-dependent material inputs: STATIC (mat_index, param_name,
    # shadergraph.Expr) triples substituted per hit — the wavefront analog
    # of the reference's per-material generated code reading
    # state::direction (Materials.MtlxViewDirection)
    dynamic_params: tuple = ()
    # some material has a distinct MDL backface surface: remap the material
    # row by facing before shading (MaterialTable.backface_id; reference:
    # Backend.cpp DF_NAMES backface scattering/emission)
    has_backface: bool = False
    # texture LOD: bounces >= k shade with each texture's MEAN value (the
    # "top mip" — path-tracing texture filtering: the ray footprint after k
    # vertices spans many texels). 0 = off (exact taps every bounce, the
    # reference's behavior). On the fused path, LOD bounces run the plain
    # untextured kernel against a mean-substituted SMEM table
    # (material.substitute_texture_means) — the per-bounce XLA texture
    # stage vanishes entirely for bounces >= k.
    tex_lod_bounces: int = 0


class Accel(NamedTuple):
    """Acceleration-structure arrays for the configured tracer (the
    BLAS/TLAS handle analog, Gi.cpp GiBvh). Unused members are None."""

    tables: TraceTables | None = None
    bvh: BvhArrays | None = None


def _trace_closest(config, accel, geom, origins, dirs, tmin, tmax):
    if config.tracer == "pallas":
        return intersect_pallas(origins, dirs, tmin, tmax, accel.tables)
    if config.tracer == "bvh":
        return traverse_closest(origins, dirs, tmin, tmax, accel.bvh, geom)
    return intersect_brute(origins, dirs, tmin, tmax, geom)


def _trace_occluded(config, accel, geom, origins, dirs, tmin, tmax):
    if config.tracer == "pallas":
        return occluded_pallas(origins, dirs, tmin, tmax, accel.tables)
    if config.tracer == "bvh":
        return traverse_occluded(origins, dirs, tmin, tmax, accel.bvh, geom)
    return occluded_brute(origins, dirs, tmin, tmax, geom)


MAX_SHADOW_CUTOUT_HOPS = 8


def _trace_occluded_cutout(config, accel, geom, materials, textures,
                           origins, dirs, tmin, tmax, rng):
    """Occlusion with stochastic cutout transparency: the wavefront analog
    of the reference's SHADOW_TEST any-hit shader (rp_main.ahit:27-61 —
    `if (cutout_opacity < rng) ignoreIntersectionEXT`). Closest hits are
    walked iteratively: an accepted hit occludes, a stochastically ignored
    one advances the interval past the surface. Returns (occluded, rng)."""
    n = origins.shape[0]

    def cond(carry):
        _tmin_c, unresolved, _occl, _rng, hops = carry
        return jnp.any(unresolved) & (hops < MAX_SHADOW_CUTOUT_HOPS)

    def body(carry):
        tmin_c, unresolved, occl, rng, hops = carry
        seg_tmax = jnp.where(unresolved, tmax, 0.0)
        hit = _trace_closest(config, accel, geom, origins, dirs, tmin_c, seg_tmax)
        is_hit = unresolved & ~hit.missed

        st = _shading_state(geom, hit, dirs)
        params = gather_params(materials, st["material_id"])
        params = apply_textures(materials, textures, params,
                                st["material_id"], st["uv"])
        opacity = bsdf_mod.cutout_opacity(params)
        rng_after, xi = smp.rng_next1f(rng)
        rng = jnp.where(is_hit, rng_after, rng)
        accepted = is_hit & (xi < opacity)

        occl = occl | accepted
        # misses resolve as unoccluded; ignored hits continue past the surface
        unresolved = unresolved & is_hit & ~accepted
        tmin_c = jnp.where(unresolved, hit.t * (1.0 + 1e-4) + 1e-5, tmin_c)
        return tmin_c, unresolved, occl, rng, hops + 1

    unresolved0 = tmax > tmin
    carry = (tmin, unresolved0, jnp.zeros((n,), bool), rng, jnp.int32(0))
    _tmin_c, unresolved, occl, rng, _hops = jax.lax.while_loop(cond, body, carry)
    # rays still unresolved after the hop limit count as occluded (the
    # conservative choice; the reference enumerates all any-hit candidates)
    return occl | unresolved, rng


class Uniforms(NamedTuple):
    """Traced per-frame values (UniformData analog, rp_main.h:25-55)."""

    camera: CameraUniforms
    sample_offset: jnp.ndarray  # [] i32
    inv_total_sample_count: jnp.ndarray  # [] f32
    max_sample_value: jnp.ndarray  # [] f32
    rr_inv_min_term_prob: jnp.ndarray  # [] f32
    light_intensity_multiplier: jnp.ndarray  # [] f32
    meters_per_scene_unit: jnp.ndarray  # [] f32
    max_volume_walk_length: jnp.ndarray  # [] i32
    dome_rotation: jnp.ndarray  # [4] quat (x,y,z,w)
    dome_emission_multiplier: jnp.ndarray  # [3]
    # plumbed for parity but INTENTIONALLY unread: the reference packs
    # domeLightDiffuseSpecularPacked into its UBO (Gi.cpp:2386,2396) and no
    # shader ever reads it (verified: the only unpackHalf2x16 call sites are
    # clipRange and the per-analytic-light diffuseSpecular, rp_main.chit:431)
    dome_diffuse_specular: jnp.ndarray  # [2]


class DomeLightData(NamedTuple):
    """Equirectangular dome texture + 1x1 fallback
    (reference: Gi.cpp:2183-2238, rp_main.miss:46-53)."""

    texture: jnp.ndarray  # [H,W,3] f32 (1x1 black when absent)
    fallback: jnp.ndarray  # [1,1,3] f32 background when dome invisible to camera


def default_dome() -> DomeLightData:
    return DomeLightData(
        texture=jnp.zeros((1, 1, 3), jnp.float32),
        fallback=jnp.zeros((1, 1, 3), jnp.float32),
    )


def _quat_rotate(q: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """GLM-style quaternion rotate (reference: rp_main.miss:38-44)."""
    qv = q[:3]
    a = jnp.cross(jnp.broadcast_to(qv, d.shape), d)
    b = jnp.cross(jnp.broadcast_to(qv, a.shape), a)
    return d + (a * q[3] + b) * 2.0


def _sample_equirect(tex: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Bilinear equirect lookup (reference: rp_main.miss sampleDomeLight:46-53,
    GL repeat-wrap sampling of u = (atan(z,x)+pi/2)/2pi, v = 1 - acos(y)/pi)."""
    h, w = tex.shape[0], tex.shape[1]
    u = (jnp.arctan2(d[:, 2], d[:, 0]) + 0.5 * jnp.pi) / (2.0 * jnp.pi)
    v = 1.0 - jnp.arccos(jnp.clip(d[:, 1], -1.0, 1.0)) / jnp.pi
    x = u * w - 0.5
    y = (1.0 - v) * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    xi0 = jnp.mod(x0.astype(jnp.int32), w)
    xi1 = jnp.mod(xi0 + 1, w)
    yi0 = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    yi1 = jnp.clip(yi0 + 1, 0, h - 1)
    c00 = tex[yi0, xi0]
    c01 = tex[yi0, xi1]
    c10 = tex[yi1, xi0]
    c11 = tex[yi1, xi1]
    return (c00 * (1 - fx) + c01 * fx) * (1 - fy) + (c10 * (1 - fx) + c11 * fx) * fy


class FirstHitInfo(NamedTuple):
    """Per-pixel first-bounce data for debug/auxiliary AOVs
    (written where bounce == 0, rp_main.chit:191-290)."""

    normal: jnp.ndarray  # [N,3]
    albedo: jnp.ndarray  # [N,3]
    barycentrics: jnp.ndarray  # [N,3]
    texcoords: jnp.ndarray  # [N,3]
    tangents: jnp.ndarray  # [N,3]
    bitangents: jnp.ndarray  # [N,3]
    depth: jnp.ndarray  # [N]
    object_id: jnp.ndarray  # [N] i32
    face_id: jnp.ndarray  # [N] i32
    instance_id: jnp.ndarray  # [N] i32
    thin_walled: jnp.ndarray  # [N,3]
    double_sided: jnp.ndarray  # [N,3]
    opacity: jnp.ndarray  # [N,3]
    nee: jnp.ndarray  # [N,3]
    hit: jnp.ndarray  # [N] bool


class SampleResult(NamedTuple):
    color: jnp.ndarray  # [N,3]
    bounces: jnp.ndarray  # [N] i32
    first: FirstHitInfo


def _shading_state(geom: SceneGeometry, hit, ray_dir):
    """Interpolate hit attributes (mdl_shading_state.glsl:4-98, but on the
    pre-transformed world-space soup — no object-to-world transforms left).

    All per-triangle data comes from TWO contiguous row gathers of the packed
    mirrors (ops/geometry.py) — XLA TPU gathers pay per gather op, so this is
    ~15x cheaper than gathering each attribute column separately."""
    from gatling_tpu.ops.geometry import (
        PF_BSIGN, PF_C0, PF_C1, PF_C2, PF_E1, PF_E2, PF_N0, PF_N1, PF_N2,
        PF_T0, PF_T1, PF_T2, PF_UV0, PF_UV1, PF_UV2, PF_V0,
    )

    tri = jnp.maximum(hit.tri, 0)
    u, v = hit.u, hit.v
    w = 1.0 - u - v
    bc = jnp.stack([w, u, v], axis=-1)

    pf = geom.packed_f[tri]  # [R, PF_WIDTH]
    pi = geom.packed_i[tri]  # [R, 5]
    c3 = lambda off: jax.lax.dynamic_slice_in_dim(pf, off, 3, axis=1)  # noqa: E731
    c2 = lambda off: jax.lax.dynamic_slice_in_dim(pf, off, 2, axis=1)  # noqa: E731

    e1 = c3(PF_E1)
    e2 = c3(PF_E2)
    pos = c3(PF_V0) + u[:, None] * e1 + v[:, None] * e2

    geom_n = jnp.cross(e1, e2)
    geom_n = geom_n / jnp.maximum(jnp.linalg.norm(geom_n, axis=-1, keepdims=True), 1e-20)
    flags = pi[:, 4]
    flip = (flags & MESH_FLAG_FLIP_FACING) != 0
    geom_n = jnp.where(flip[:, None], -geom_n, geom_n)

    nrm = bc[:, 0:1] * c3(PF_N0) + bc[:, 1:2] * c3(PF_N1) + bc[:, 2:3] * c3(PF_N2)
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-20)

    front = jnp.sum(geom_n * (-ray_dir), axis=-1) >= 0.0
    geom_n = jnp.where(front[:, None], geom_n, -geom_n)
    nrm = jnp.where(front[:, None], nrm, -nrm)

    tan = bc[:, 0:1] * c3(PF_T0) + bc[:, 1:2] * c3(PF_T1) + bc[:, 2:3] * c3(PF_T2)
    tan = tan - nrm * jnp.sum(tan * nrm, axis=-1, keepdims=True)
    tan = tan / jnp.maximum(jnp.linalg.norm(tan, axis=-1, keepdims=True), 1e-20)
    bsign = jnp.sum(bc * c3(PF_BSIGN), axis=-1)
    bitan = jnp.cross(nrm, tan) * bsign[:, None]

    uv = bc[:, 0:1] * c2(PF_UV0) + bc[:, 1:2] * c2(PF_UV1) + bc[:, 2:3] * c2(PF_UV2)

    # interpolated displayColor primvar (all-ones without vertex colors;
    # multiplies base_color — the reference's displayColor-driven default
    # material with per-vertex interpolation, mesh.cpp:647-745)
    vcolor = bc[:, 0:1] * c3(PF_C0) + bc[:, 1:2] * c3(PF_C1) + bc[:, 2:3] * c3(PF_C2)

    double_sided = (flags & MESH_FLAG_DOUBLE_SIDED) != 0
    return dict(
        pos=pos, geom_normal=geom_n, normal=nrm, tangent=tan, bitangent=bitan,
        uv=uv, bc=bc, front=front, double_sided=double_sided, vcolor=vcolor,
        material_id=pi[:, 0], object_id=pi[:, 1],
        face_id=pi[:, 2], instance_id=pi[:, 3],
    )


def trace_sample(
    config: RenderConfig,
    uniforms: Uniforms,
    geom: SceneGeometry,
    materials: MaterialTable,
    lights: LightArrays,
    dome: DomeLightData,
    pixel_index: jnp.ndarray,  # [N] i32
    sample_index: jnp.ndarray,  # [] i32
    textures: TexturePool | None = None,
    accel: Accel | None = None,
    instance_primvars: dict[str, jnp.ndarray] | None = None,
) -> SampleResult:
    """Trace one sample per pixel through the full bounce loop.

    instance_primvars maps primvar name -> [num_instances, 3] per-instance
    values (ops/geometry.py build_instance_primvar_tables); material
    primvar leaves of those names resolve per hit through the hit's
    instance id — the scene-data route of the reference's instancer
    primvars (instancer.cpp:138-189 -> mdl_interface.glsl
    scene_data_lookup_*)."""
    if textures is None:
        textures = empty_pool()
    if accel is None:
        accel = Accel()
    n = pixel_index.shape[0]
    px = pixel_index % config.width
    py = pixel_index // config.width

    rng = smp.rng_init(pixel_index.astype(jnp.uint32), sample_index.astype(jnp.uint32))
    origins, dirs, rng = generate_primary_rays(
        uniforms.camera, config.width, config.height, px, py, rng,
        config.jittered, config.fis, config.depth_of_field)

    # clip-plane correction (rp_main.rgen:283-285)
    cos_cone = jnp.maximum(1e-5, jnp.sum(dirs * uniforms.camera.forward, axis=-1))
    clip_lo = uniforms.camera.clip_start / cos_cone
    clip_hi = uniforms.camera.clip_end / cos_cone

    zero3 = jnp.zeros((n, 3), jnp.float32)
    first = FirstHitInfo(
        normal=zero3, albedo=zero3, barycentrics=zero3, texcoords=zero3,
        tangents=zero3, bitangents=zero3,
        depth=jnp.full((n,), 1.0, jnp.float32),
        object_id=jnp.full((n,), -1, jnp.int32),
        face_id=jnp.full((n,), -1, jnp.int32),
        instance_id=jnp.full((n,), -1, jnp.int32),
        thin_walled=zero3, double_sided=zero3, opacity=zero3, nee=zero3,
        hit=jnp.zeros((n,), bool),
    )

    state = dict(
        bounce=jnp.int32(0),
        origin=origins,
        direction=dirs,
        throughput=jnp.ones((n, 3), jnp.float32),
        radiance=jnp.zeros((n, 3), jnp.float32),
        rng=rng,
        alive=jnp.ones((n,), bool),
        bounces=jnp.zeros((n,), jnp.int32),
        first=first,
    )
    stack = config.medium_stack_size
    if config.has_volumes:
        # medium stack state (rp_main_payload.glsl Medium / mediumIdx bits)
        state["medium_idx"] = jnp.zeros((n,), jnp.int32)
        if stack > 0:
            state["med_sigma_s"] = jnp.zeros((n, stack, 3), jnp.float32)
            state["med_sigma_t"] = jnp.zeros((n, stack, 3), jnp.float32)
            state["med_bias"] = jnp.zeros((n, stack), jnp.float32)
            state["walk"] = jnp.zeros((n,), jnp.int32)

    def cond(s):
        return (s["bounce"] < config.max_bounces) & jnp.any(s["alive"])

    def body(s):
        bounce = s["bounce"]
        alive = s["alive"]
        rng = s["rng"]
        throughput = s["throughput"]
        radiance = s["radiance"]

        if config.clipping_planes:
            tmin = jnp.where(bounce == 0, clip_lo, jnp.zeros((n,), jnp.float32))
            tmax = jnp.where(bounce == 0, clip_hi, jnp.full((n,), FLOAT_MAX, jnp.float32))
        else:
            tmin = jnp.zeros((n,), jnp.float32)
            tmax = jnp.full((n,), FLOAT_MAX, jnp.float32)
        tmax = jnp.where(alive, tmax, 0.0)  # dead rays do no work

        # ---- volume free-flight distance sampling (rgen:317-346) ----
        in_medium = None
        walk_pdf = jnp.ones((n, 3), jnp.float32)
        if config.has_volumes:
            m_idx = s["medium_idx"]
            in_medium = m_idx > 0
            if stack > 0:
                cur = jnp.clip(m_idx - 1, 0, stack - 1)
                rows = jnp.arange(n)
                sigma_s_c = s["med_sigma_s"][rows, cur]
                sigma_t_c = s["med_sigma_t"][rows, cur]
                has_scat = jnp.any(sigma_s_c > 0.0, axis=-1)
                do_dist = alive & in_medium & has_scat & (
                    s["walk"] <= uniforms.max_volume_walk_length)
                rng_after, xi2 = smp.rng_next2f(rng)
                rng = jnp.where(do_dist, rng_after, rng)
                # spectral single-channel MIS select (rgen sampleDistance:49-69)
                albedo = smp.safe_div(sigma_s_c, sigma_t_c)
                weights = throughput * albedo
                wsum = jnp.sum(weights, axis=-1)
                pdf3 = jnp.where((wsum > 1e-9)[:, None],
                                 weights / jnp.maximum(wsum, 1e-9)[:, None],
                                 jnp.full_like(weights, 1.0 / 3.0))
                x0 = xi2[:, 0]
                chan = jnp.where(x0 < pdf3[:, 0], 0,
                                 jnp.where(x0 < pdf3[:, 0] + pdf3[:, 1], 1, 2))
                sel_sigma = jnp.take_along_axis(sigma_t_c, chan[:, None], axis=1)[:, 0]
                s_coef = jnp.maximum(sel_sigma * uniforms.meters_per_scene_unit, 1e-20)
                t_sample = -jnp.log(jnp.maximum(1.0 - xi2[:, 1], 1e-20)) / s_coef
                tmax = jnp.where(do_dist, t_sample, tmax)
                walk_pdf = jnp.where(do_dist[:, None], pdf3, walk_pdf)

        hit = _trace_closest(config, accel, geom, s["origin"], s["direction"], tmin, tmax)
        is_hit = (~hit.missed) & alive
        is_miss = hit.missed & alive

        # volume walk: misses inside a scattering medium step the walk
        # instead of hitting the background (rp_main.miss:16-34)
        vol_miss = jnp.zeros((n,), bool)
        if config.has_volumes and stack > 0:
            vol_miss = is_miss & in_medium
            is_miss = is_miss & ~in_medium

        # ---- miss: dome light (rp_main.miss:55-87) ----
        if config.has_dome:
            sample_dir = _quat_rotate(uniforms.dome_rotation, s["direction"])
            sample_dir = sample_dir / jnp.maximum(jnp.linalg.norm(sample_dir, axis=-1, keepdims=True), 1e-20)
            dome_radiance = _sample_equirect(dome.texture, sample_dir) * uniforms.dome_emission_multiplier
            if not config.dome_light_camera_visible:
                primary = bounce == 0
                fallback = jnp.broadcast_to(dome.fallback[0, 0], dome_radiance.shape)
                dome_radiance = jnp.where(primary, fallback, dome_radiance)
            radiance = radiance + jnp.where(is_miss[:, None], throughput * dome_radiance, 0.0)

        # ---- hit shading (rp_main.chit) ----
        st = _shading_state(geom, hit, s["direction"])
        if config.has_backface:
            # distinct backface surfaces: shade back-facing hits with the
            # material's appended backface row (MDL `backface:` field;
            # reference: Backend.cpp DF_NAMES backface scattering/emission)
            from gatling_tpu.render.material import MI_BACKFACE_ID, _gather_rows

            bfid = _gather_rows(materials.packed_i,
                                st["material_id"])[:, MI_BACKFACE_ID]
            st["material_id"] = jnp.where(st["front"], st["material_id"], bfid)
        params = gather_params(materials, st["material_id"])
        params = apply_textures(materials, textures, params, st["material_id"], st["uv"])
        # vcolor multiply is gated per material (MF_VCOLOR_MUL=1 only on the
        # displayColor fallback material); bound materials reach the rows
        # through geompropvalue primvar reads instead
        from gatling_tpu.render.material import MF_VCOLOR_MUL, _gather_rows

        vmul = _gather_rows(materials.packed_f,
                            st["material_id"])[:, MF_VCOLOR_MUL]
        params = params._replace(base_color=params.base_color * (
            1.0 + (st["vcolor"] - 1.0) * vmul[:, None]))
        if config.dynamic_params:
            # view/normal-dependent inputs (viewdirection/normal node
            # chains): evaluate each material's expr over the batch and
            # substitute where the hit's material matches
            from gatling_tpu.render.shadergraph import eval_dynamic_expr

            pv = {"displayColor": st["vcolor"]}
            for pv_name, table in (instance_primvars or {}).items():
                idx = jnp.clip(st["instance_id"], 0, table.shape[0] - 1)
                pv[pv_name] = table[idx]
            rgb_params = ("base_color", "emissive", "specular_color")
            for mat_idx, pname, expr in config.dynamic_params:
                val = eval_dynamic_expr(expr, s["direction"], st["normal"],
                                        primvars=pv)
                sel = st["material_id"] == mat_idx
                cur = getattr(params, pname)
                if pname in rgb_params:
                    params = params._replace(
                        **{pname: jnp.where(sel[:, None], val[:, :3], cur)})
                else:
                    params = params._replace(
                        **{pname: jnp.where(sel, val[:, 0], cur)})
        st["normal"] = perturb_normal(
            materials, textures, st["material_id"], st["uv"],
            st["normal"], st["tangent"], st["bitangent"])
        st["bitangent"] = jnp.cross(st["normal"], st["tangent"]) * jnp.sign(
            jnp.sum(jnp.cross(st["normal"], st["tangent"]) * st["bitangent"], axis=-1, keepdims=True) + 1e-20)

        # ---- stochastic cutout (rp_main.ahit:35-61) ----
        # the reference ignores cutout intersections during traversal; the
        # wavefront analog passes the ray straight through the surface and
        # skips shading for this hit
        cut = jnp.zeros((n,), bool)
        if config.has_cutout:
            rng_after, xi_c = smp.rng_next1f(rng)
            rng = jnp.where(is_hit, rng_after, rng)
            cut = is_hit & (xi_c >= bsdf_mod.cutout_opacity(params))
            is_hit = is_hit & ~cut

        # ---- volume transmittance on surface hit (chit:160-186) ----
        if config.has_volumes:
            dist_m = hit.t * uniforms.meters_per_scene_unit
            if stack > 0:
                transmittance = jnp.exp(-sigma_t_c * dist_m[:, None])
            else:
                # MEDIUM_STACK_SIZE == 0: absorption-only using the hit
                # material's sigma_a
                transmittance = jnp.exp(-params.volume_absorption * dist_m[:, None])
            throughput = jnp.where((is_hit & in_medium)[:, None],
                                   throughput * transmittance, throughput)

        # emission (chit:292-343): front face, or the back face of
        # SINGLE-sided geometry (chit:304 `isFrontFace || !isDoubleSided`);
        # double-sided back faces emit only for thin-walled materials with a
        # backface EDF (MDL spec quote at chit:309)
        emission_ok = st["front"] | ~st["double_sided"] | (
            params.thin_walled & (params.backface_edf > 0.5))
        radiance = radiance + jnp.where(
            (is_hit & emission_ok)[:, None],
            throughput * bsdf_mod.edf_emission(params)
            * jnp.exp2(uniforms.camera.sensor_exposure), 0.0)

        # first-bounce AOVs (chit:191-290)
        if _needs_first_hit(config.aov_mask):
            fh = s["first"]
            wr = (bounce == 0) & is_hit  # write mask
            albedo = bsdf_mod.auxiliary(params, -s["direction"], st["normal"])
            log_depth = jnp.where(
                uniforms.camera.clip_start > 0.0,
                2.0 * jnp.log(jnp.maximum(hit.t, 1e-20) / uniforms.camera.clip_start)
                / jnp.log(jnp.maximum(uniforms.camera.clip_end / uniforms.camera.clip_start, 1.0 + 1e-6)) - 1.0,
                hit.t)
            red = jnp.array([1.0, 0.0, 0.0], jnp.float32)
            green = jnp.array([0.0, 1.0, 0.0], jnp.float32)
            fh = FirstHitInfo(
                normal=jnp.where(wr[:, None], st["normal"], fh.normal),
                albedo=jnp.where(wr[:, None], albedo, fh.albedo),
                barycentrics=jnp.where(wr[:, None], st["bc"], fh.barycentrics),
                texcoords=jnp.where(wr[:, None], jnp.pad(st["uv"], ((0, 0), (0, 1))), fh.texcoords),
                tangents=jnp.where(wr[:, None], (st["tangent"] + 1.0) * 0.5, fh.tangents),
                bitangents=jnp.where(wr[:, None], (st["bitangent"] + 1.0) * 0.5, fh.bitangents),
                depth=jnp.where(wr, log_depth, fh.depth),
                object_id=jnp.where(wr, st["object_id"], fh.object_id),
                face_id=jnp.where(wr, st["face_id"], fh.face_id),
                instance_id=jnp.where(wr, st["instance_id"], fh.instance_id),
                thin_walled=jnp.where(wr[:, None],
                                      jnp.where(params.thin_walled[:, None], red, green), fh.thin_walled),
                double_sided=jnp.where(wr[:, None],
                                       jnp.where(st["double_sided"][:, None], green, red), fh.double_sided),
                opacity=jnp.where(wr[:, None],
                                  bsdf_mod.cutout_opacity(params)[:, None] * jnp.ones((1, 3)), fh.opacity),
                nee=fh.nee,
                hit=fh.hit | wr,
            )
        else:
            fh = s["first"]

        # BSDF importance sampling (chit:345-389)
        rng_after, xi4 = smp.rng_next4f(rng)
        rng = jnp.where(is_hit, rng_after, rng)
        k2, bsdf_over_pdf, event, _pdf = bsdf_mod.sample(
            params, -s["direction"], st["normal"], st["tangent"],
            st["bitangent"], xi4, front=st["front"])
        new_throughput = throughput * bsdf_over_pdf
        throughput = jnp.where(is_hit[:, None], new_throughput, throughput)
        new_dir = jnp.where(is_hit[:, None], k2, s["direction"])

        is_transmission = (event & BSDF_EVENT_TRANSMISSION) != 0
        offset_n = jnp.where(is_transmission[:, None], -st["geom_normal"], st["geom_normal"])
        new_origin = jnp.where(
            is_hit[:, None], smp.offset_ray_origin(st["pos"], offset_n), s["origin"])
        if config.has_cutout:
            # cutout pass-through: continue from just past the surface
            new_origin = jnp.where(
                cut[:, None], smp.offset_ray_origin(st["pos"], -st["geom_normal"]),
                new_origin)

        # ---- medium stack update on transmission (chit:446-480) ----
        med_updates = {}
        if config.has_volumes:
            med_change = is_hit & is_transmission & ~params.thin_walled
            if stack == 0:
                new_m_idx = jnp.where(med_change, 1 - s["medium_idx"], s["medium_idx"])
                med_updates["medium_idx"] = new_m_idx
            else:
                push = med_change & st["front"]
                pop = med_change & ~st["front"] & (s["medium_idx"] > 0)
                new_m_idx = s["medium_idx"] + push.astype(jnp.int32) - pop.astype(jnp.int32)
                slot = jnp.clip(new_m_idx - 1, 0, stack - 1)
                can_store = push & (new_m_idx <= stack)
                sigma_t_mat = params.volume_absorption + params.volume_scattering
                rows = jnp.arange(n)
                one_hot = (jax.lax.broadcasted_iota(jnp.int32, (n, stack), 1)
                           == slot[:, None]) & can_store[:, None]
                med_updates["med_sigma_s"] = jnp.where(
                    one_hot[:, :, None],
                    jnp.broadcast_to(params.volume_scattering[:, None, :], (n, stack, 3)),
                    s["med_sigma_s"])
                med_updates["med_sigma_t"] = jnp.where(
                    one_hot[:, :, None],
                    jnp.broadcast_to(sigma_t_mat[:, None, :], (n, stack, 3)),
                    s["med_sigma_t"])
                med_updates["med_bias"] = jnp.where(
                    one_hot, jnp.broadcast_to(params.volume_bias[:, None], (n, stack)),
                    s["med_bias"])
                med_updates["medium_idx"] = new_m_idx
                # medium change resets the walk (chit:478)
                med_updates["walk"] = jnp.where(med_change, 0, s["walk"])

            # volume walk step on miss inside medium (rp_main.miss stepVolume)
            if stack > 0:
                dist_m2 = tmax * uniforms.meters_per_scene_unit
                trans = jnp.exp(-sigma_t_c * dist_m2[:, None])
                density = sigma_t_c * trans
                pdf_w = jnp.maximum(jnp.sum(walk_pdf * density, axis=-1), 1e-20)
                vol_tp = sigma_s_c * trans / pdf_w[:, None]
                throughput = jnp.where(vol_miss[:, None], throughput * vol_tp, throughput)
                new_origin = jnp.where(
                    vol_miss[:, None],
                    s["origin"] + s["direction"] * tmax[:, None], new_origin)
                med_updates["walk"] = jnp.where(
                    vol_miss, s["walk"] + 1, med_updates.get("walk", s["walk"]))

        # ---- NEE (chit:393-444 + rgen:397-438) ----
        if config.nee:
            nee_able = is_hit & ((event & (BSDF_EVENT_DIFFUSE | BSDF_EVENT_GLOSSY)) != 0)
            rng_after, k4 = smp.rng_next4f(rng)
            rng = jnp.where(nee_able, rng_after, rng)
            dir_to_light, light_dist, light_power, inv_pdf, diff_spec = sample_light(
                lights, k4, st["pos"],
                uniforms.light_intensity_multiplier, uniforms.camera.sensor_exposure)
            nee_valid = nee_able & (light_dist > 0.0) & (
                jnp.sum(dir_to_light * st["geom_normal"], axis=-1) > 0.0)
            f_diff, f_glossy, eval_pdf = bsdf_mod.evaluate(
                params, -s["direction"], dir_to_light,
                st["normal"], st["tangent"], st["bitangent"])
            nee_valid = nee_valid & (eval_pdf > 0.0)
            nee_radiance = light_power * inv_pdf[:, None]
            # reference quirk: throughput here includes this bounce's
            # bsdf_over_pdf (see module docstring)
            weight = throughput * nee_radiance
            contrib = weight * (f_diff * diff_spec[:, 0:1] + f_glossy * diff_spec[:, 1:2])
            contrib = jnp.where(nee_valid[:, None], contrib, 0.0)

            do_trace = (smp.luminance(contrib) > 1e-6) & (light_dist > 1e-9)
            sh_tmin = jnp.where(do_trace, 0.01, 0.0)
            sh_tmax = jnp.where(do_trace, light_dist, 0.0)
            if config.has_cutout:
                # stochastic cutout on the shadow stream (rp_main.ahit
                # SHADOW_TEST variant)
                shadowed, rng = _trace_occluded_cutout(
                    config, accel, geom, materials, textures,
                    new_origin, dir_to_light, sh_tmin, sh_tmax, rng)
            else:
                shadowed = _trace_occluded(config, accel, geom, new_origin,
                                           dir_to_light, sh_tmin, sh_tmax)
            add = do_trace & ~shadowed
            radiance = radiance + jnp.where(add[:, None], contrib, 0.0)
            if config.aov_mask & aov_bit(AovId.NEE):
                wr0 = (bounce == 0) & is_hit
                nee_color = jnp.where(shadowed[:, None],
                                      jnp.array([[1.0, 0.0, 0.0]]), jnp.array([[0.0, 1.0, 0.0]]))
                fh = fh._replace(nee=jnp.where(wr0[:, None], nee_color, fh.nee))

        # termination (chit:482-486, rgen:440-459); volume-walk misses
        # continue scattering instead of terminating
        terminate = is_miss | (is_hit & (event == BSDF_EVENT_ABSORB))
        terminate = terminate | (alive & (jnp.linalg.norm(throughput, axis=-1) < 1e-9))

        if config.max_bounces > config.rr_bounce_offset:
            do_rr = alive & (bounce > config.rr_bounce_offset)
            rng_after, k1 = smp.rng_next1f(rng)
            rng = jnp.where(do_rr, rng_after, rng)
            max_tp = jnp.max(throughput, axis=-1)
            p = jnp.minimum(max_tp, uniforms.rr_inv_min_term_prob)
            rr_kill = do_rr & (k1 > p)
            throughput = jnp.where((do_rr & ~rr_kill)[:, None],
                                   throughput / jnp.maximum(p, 1e-20)[:, None], throughput)
            terminate = terminate | rr_kill

        # volume scattering direction (rgen:461-477: HG phase around the
        # current direction)
        if config.has_volumes and stack > 0:
            rng_after, xi_hg = smp.rng_next2f(rng)
            rng = jnp.where(vol_miss, rng_after, rng)
            rows = jnp.arange(n)
            cur_b = jnp.clip(s["medium_idx"] - 1, 0, stack - 1)
            g = s["med_bias"][rows, cur_b]
            # sampleHenyeyGreensteinCos (rgen:71-82)
            iso = jnp.abs(g) < 1e-3
            sq = (1.0 - g * g) / jnp.maximum(1.0 - g + 2.0 * g * xi_hg[:, 0], 1e-9)
            cos_hg = jnp.where(iso, 1.0 - 2.0 * xi_hg[:, 0],
                               (1.0 + g * g - sq * sq) / jnp.where(iso, 1.0, 2.0 * jnp.where(jnp.abs(g) < 1e-9, 1.0, g)))
            sin_hg = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_hg * cos_hg))
            phi = 2.0 * jnp.pi * xi_hg[:, 1]
            t_b, b_b = smp.orthonormal_basis(new_dir)
            scattered = (t_b * (sin_hg * jnp.cos(phi))[:, None]
                         + b_b * (sin_hg * jnp.sin(phi))[:, None]
                         + new_dir * cos_hg[:, None])
            new_dir = jnp.where(vol_miss[:, None], scattered, new_dir)

        new_alive = alive & ~terminate
        out = dict(
            bounce=bounce + 1,
            origin=new_origin,
            direction=new_dir,
            throughput=throughput,
            radiance=radiance,
            rng=rng,
            alive=new_alive,
            bounces=s["bounces"] + new_alive.astype(jnp.int32) + (alive & terminate).astype(jnp.int32),
            first=fh,
        )
        if config.has_volumes:
            out["medium_idx"] = med_updates.get("medium_idx", s["medium_idx"])
            if stack > 0:
                for k in ("med_sigma_s", "med_sigma_t", "med_bias", "walk"):
                    out[k] = med_updates.get(k, s[k])
        return out

    state = jax.lax.while_loop(cond, body, state)

    # radiance clamp (rgen:488-494)
    radiance = state["radiance"]
    max_v = jnp.max(radiance, axis=-1)
    scale = jnp.where(max_v > uniforms.max_sample_value,
                      uniforms.max_sample_value / jnp.maximum(max_v, 1e-20), 1.0)
    color = jnp.maximum(radiance * scale[:, None], 0.0)
    return SampleResult(color=color, bounces=state["bounces"], first=state["first"])


_FIRST_HIT_AOVS = (
    AovId.NORMAL, AovId.ALBEDO, AovId.BARYCENTRICS, AovId.TEXCOORDS,
    AovId.TANGENTS, AovId.BITANGENTS, AovId.DEPTH, AovId.OBJECT_ID,
    AovId.FACE_ID, AovId.INSTANCE_ID, AovId.THIN_WALLED, AovId.DOUBLE_SIDED,
    AovId.OPACITY, AovId.NEE,
)


def _needs_first_hit(aov_mask: int) -> bool:
    return any(aov_mask & aov_bit(a) for a in _FIRST_HIT_AOVS)


def render_pixels(
    config: RenderConfig,
    uniforms: Uniforms,
    geom: SceneGeometry,
    materials: MaterialTable,
    lights: LightArrays,
    dome: DomeLightData,
    pixel_index: jnp.ndarray,
    spp: int,
    sample_offset: jnp.ndarray,
    textures: TexturePool | None = None,
    accel: Accel | None = None,
    instance_primvars: dict[str, jnp.ndarray] | None = None,
) -> SampleResult:
    """Render `spp` samples for the given pixels, returning the mean color,
    max path length and averaged first-hit info. The reusable core shared by
    the single-chip path and the shard_map multi-chip path."""
    n = pixel_index.shape[0]
    inv_spp = 1.0 / spp

    def sample_body(s, carry):
        color_acc, bounce_acc, first_acc = carry
        res = trace_sample(config, uniforms, geom, materials, lights, dome,
                           pixel_index, sample_offset + s, textures, accel,
                           instance_primvars)
        color_acc = color_acc + res.color * inv_spp
        bounce_acc = jnp.maximum(bounce_acc, res.bounces)
        # average accumulating first-hit channels over samples; keep ids
        # and flags from the latest sample
        f = res.first._replace(
            normal=first_acc.normal + res.first.normal * inv_spp,
            albedo=first_acc.albedo + res.first.albedo * inv_spp,
        )
        return color_acc, bounce_acc, f

    zero3 = jnp.zeros((n, 3), jnp.float32)
    first0 = FirstHitInfo(
        normal=zero3, albedo=zero3, barycentrics=zero3, texcoords=zero3,
        tangents=zero3, bitangents=zero3,
        depth=jnp.full((n,), 1.0, jnp.float32),
        object_id=jnp.full((n,), -1, jnp.int32),
        face_id=jnp.full((n,), -1, jnp.int32),
        instance_id=jnp.full((n,), -1, jnp.int32),
        thin_walled=zero3, double_sided=zero3, opacity=zero3, nee=zero3,
        hit=jnp.zeros((n,), bool),
    )
    pixel_color, bounces, first = jax.lax.fori_loop(
        0, spp, sample_body, (zero3, jnp.zeros((n,), jnp.int32), first0))
    return SampleResult(color=pixel_color, bounces=bounces, first=first)


def blend_aovs(
    config: RenderConfig,
    uniforms: Uniforms,
    aovs: dict[str, jnp.ndarray],
    result: SampleResult,
) -> dict[str, jnp.ndarray]:
    """Blend one frame's result into the AOV buffers with progressive
    accumulation (reference: rp_main.rgen:506-515)."""
    pixel_color, bounces, first = result.color, result.bounces, result.first
    n = pixel_color.shape[0]
    out = dict(aovs)
    offset = uniforms.sample_offset.astype(jnp.float32)
    spp = jnp.float32(config.spp)
    inv_total = uniforms.inv_total_sample_count

    def accum(prev, new):
        """Progressive blend (rgen:506-515)."""
        if config.progressive:
            prev_used = jnp.where(offset > 0.0, prev, new)
        else:
            prev_used = new
        return (prev_used * offset + new * spp) * inv_total

    mask = config.aov_mask
    if mask & aov_bit(AovId.COLOR):
        rgba = jnp.concatenate([pixel_color, jnp.ones((n, 1), jnp.float32)], axis=-1)
        out["color"] = accum(aovs["color"], rgba)
    if mask & aov_bit(AovId.NORMAL):
        pos_n = (first.normal + 1.0) * 0.5
        blended = accum(aovs["normal"], pos_n)
        # renormalize like rgen:517-520
        ren = blended * 2.0 - 1.0
        ren = ren / jnp.maximum(jnp.linalg.norm(ren, axis=-1, keepdims=True), 1e-20)
        out["normal"] = jnp.where(first.hit[:, None], (ren + 1.0) * 0.5, blended)
    if mask & aov_bit(AovId.ALBEDO):
        out["albedo"] = accum(aovs["albedo"], first.albedo)
    if mask & aov_bit(AovId.BARYCENTRICS):
        out["barycentrics"] = jnp.where(first.hit[:, None], first.barycentrics, aovs["barycentrics"])
    if mask & aov_bit(AovId.TEXCOORDS):
        out["texcoords"] = jnp.where(first.hit[:, None], first.texcoords, aovs["texcoords"])
    if mask & aov_bit(AovId.TANGENTS):
        out["tangents"] = jnp.where(first.hit[:, None], first.tangents, aovs["tangents"])
    if mask & aov_bit(AovId.BITANGENTS):
        out["bitangents"] = jnp.where(first.hit[:, None], first.bitangents, aovs["bitangents"])
    if mask & aov_bit(AovId.DEPTH):
        out["depth"] = jnp.where(first.hit, first.depth, aovs["depth"])
    if mask & aov_bit(AovId.OBJECT_ID):
        out["object_id"] = jnp.where(first.hit, first.object_id, aovs["object_id"])
    if mask & aov_bit(AovId.FACE_ID):
        out["face_id"] = jnp.where(first.hit, first.face_id, aovs["face_id"])
    if mask & aov_bit(AovId.INSTANCE_ID):
        out["instance_id"] = jnp.where(first.hit, first.instance_id, aovs["instance_id"])
    if mask & aov_bit(AovId.THIN_WALLED):
        out["thin_walled"] = jnp.where(first.hit[:, None], first.thin_walled, aovs["thin_walled"])
    if mask & aov_bit(AovId.DOUBLE_SIDED):
        out["double_sided"] = jnp.where(first.hit[:, None], first.double_sided, aovs["double_sided"])
    if mask & aov_bit(AovId.OPACITY):
        out["opacity"] = jnp.where(first.hit[:, None], first.opacity, aovs["opacity"])
    if mask & aov_bit(AovId.NEE):
        out["nee"] = jnp.where(first.hit[:, None], first.nee, aovs["nee"])
    if mask & aov_bit(AovId.BOUNCES):
        out["bounces"] = _inferno(bounces.astype(jnp.float32) / config.max_bounces)
    if mask & aov_bit(AovId.CLOCK_CYCLES):
        # no clockARB on TPU: per-pixel path length is the cost proxy
        # (reference heatmap: rp_main.rgen:187-189, Gi.cpp:327-343)
        out["clock_cycles"] = bounces
    return out


@partial(jax.jit, static_argnames=("config",))
def render_frame(
    config: RenderConfig,
    uniforms: Uniforms,
    geom: SceneGeometry,
    materials: MaterialTable,
    lights: LightArrays,
    dome: DomeLightData,
    aovs: dict[str, jnp.ndarray],
    textures: TexturePool | None = None,
    accel: Accel | None = None,
    instance_primvars: dict[str, jnp.ndarray] | None = None,
) -> dict[str, jnp.ndarray]:
    """Single-chip frame: the full giRender dispatch analog
    (reference: Gi.cpp:2437 cgpuCmdTraceRays + progressive accumulation)."""
    n = config.width * config.height
    pixel_index = jnp.arange(n, dtype=jnp.int32)
    res = render_pixels(config, uniforms, geom, materials, lights, dome,
                        pixel_index, config.spp, uniforms.sample_offset,
                        textures, accel, instance_primvars)
    return blend_aovs(config, uniforms, aovs, res)


def _inferno(t: jnp.ndarray) -> jnp.ndarray:
    """Polynomial fit of the matplotlib inferno colormap
    (reference: colormap.glsl colormap_inferno)."""
    t = jnp.clip(t, 0.0, 1.0)[:, None]
    c0 = jnp.array([0.0002189403, 0.001651004, -0.01948089])
    c1 = jnp.array([0.1065134, 0.5639564, 3.932712])
    c2 = jnp.array([11.60249, -3.972853, -15.9424])
    c3 = jnp.array([-41.70399, 17.43639, 44.35414])
    c4 = jnp.array([77.162935, -33.40235, -81.80731])
    c5 = jnp.array([-71.31942, 32.62606, 73.20951])
    c6 = jnp.array([25.13112, -12.24266, -23.07032])
    return c0 + t * (c1 + t * (c2 + t * (c3 + t * (c4 + t * (c5 + t * c6)))))
