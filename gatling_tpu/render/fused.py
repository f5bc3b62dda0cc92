"""Fused-megakernel render path (fast path driver).

Drives ops/pallas_bounce.py: camera rays are generated in XLA once per
sample, packed into the [16, R/128, 128] component-major state, then the
fused bounce kernel advances ALL rays per bounce with no intermediate HBM
traffic — including in-kernel NEE shadow occlusion. Dome lighting runs as a
vectorized XLA post-pass over the kernel's miss records (a path misses at
most once, so one equirect lookup per sample is exact). Falls within the
general integrator's contract (same RNG seeding and draw order per
pixel/sample, same accumulation) for configs it supports — including NEE,
dome lighting, textures and normal maps (split-bounce kernels + the XLA
texture stage), absorption-only volumes, and arbitrary triangle counts
(clustered walk); scattering volumes / cutout / clipping still route to
the general integrator (see supports_fused).
"""

from __future__ import annotations

from functools import partial

import os

import jax
import jax.numpy as jnp

from gatling_tpu.ops import sampling as smp
from gatling_tpu.ops.pallas_bounce import (
    H_MAT,
    H_UVX,
    H_UVY,
    FusedScene,
    FusedStatic,
    bounce_step,
    make_params,
    pack_state,
    shade_step,
    trace_step,
    unpack_radiance,
    unpack_rows,
)
from gatling_tpu.render.camera import generate_primary_rays
from gatling_tpu.render.integrator import (
    DomeLightData,
    RenderConfig,
    Uniforms,
    _quat_rotate,
    _sample_equirect,
)


def _coherence_keys(state, scene_lo, scene_inv_span):
    """Per-ray sort key: dead rays last, alive rays grouped by direction
    octant then origin Morton cell. Re-packing rays by this key between
    bounces is the wavefront-compaction analog for the fused kernel: the
    cluster walk is per 1024-ray block, so block coherence directly bounds
    how many clusters are DMA'd + looped (PERF.md round-2)."""
    dx, dy, dz = state[3], state[4], state[5]
    ox, oy, oz = state[0], state[1], state[2]
    alive = state[13] > 0.5

    octant = ((dx >= 0).astype(jnp.uint32)
              + 2 * (dy >= 0).astype(jnp.uint32)
              + 4 * (dz >= 0).astype(jnp.uint32))

    def q5(o, lo, inv):
        t = jnp.clip((o - lo) * inv, 0.0, 1.0)
        return (t * 31.0).astype(jnp.uint32)

    qx = q5(ox, scene_lo[0], scene_inv_span[0])
    qy = q5(oy, scene_lo[1], scene_inv_span[1])
    qz = q5(oz, scene_lo[2], scene_inv_span[2])

    def spread(x):
        x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
        x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
        x = (x | (x << 2)) & jnp.uint32(0x09249249)
        return x

    morton = spread(qx) | (spread(qy) << 1) | (spread(qz) << 2)
    key = (octant << jnp.uint32(15)) | morton
    return jnp.where(alive, key, jnp.uint32(0xFFFFFFFF)).reshape(-1)


def _sort_state(state, order):
    """Permute the ray axis of [16, R/128, 128] state by `order` [R]."""
    rows, nb, _ = state.shape
    flat = state.reshape(rows, nb * 128)
    return flat[:, order].reshape(rows, nb, 128)


def _sort_chunks(state, chunk_order):
    """Permute whole 128-ray lane chunks (axis 1). Measured on v5e: moving
    aligned [16, 1, 128] tiles costs ~2 ms at 1.44M rays where the per-ray
    _sort_state gather costs ~18 ms — chunk-granularity permutations are
    effectively free, so the textured alive-partition runs every bounce."""
    return state[:, chunk_order, :]


def _tile_order(width: int, height: int) -> "np.ndarray":
    """Pixel permutation putting 32x32 image tiles contiguous: one 1024-ray
    kernel block then covers a 32x32-px footprint instead of an 8x128-row
    strip — a ~4x tighter primary frustum for the cluster walk."""
    import numpy as np

    idx = np.arange(width * height, dtype=np.int64)
    iy, ix = idx // width, idx % width
    tiles_x = -(-width // 32)
    key = (((iy >> 5) * tiles_x + (ix >> 5)) << 10) | ((iy & 31) << 5) | (ix & 31)
    return np.argsort(key, kind="stable").astype(np.int32)


# AOVs the fused path can produce: COLOR plus the first-hit channels the
# trace kernel's hit buffer carries (captured at bounce 0 via trace_step)
from gatling_tpu.interface import AovId, aov_bit  # noqa: E402

FUSED_AOV_MASK = (aov_bit(AovId.COLOR) | aov_bit(AovId.NORMAL)
                  | aov_bit(AovId.ALBEDO) | aov_bit(AovId.DEPTH)
                  | aov_bit(AovId.TEXCOORDS))


def supports_fused(config: RenderConfig, has_textures: bool,
                   has_normal_maps: bool = False,
                   has_scattering_volumes: bool = True,
                   has_opacity_textures: bool = False) -> bool:
    """Configs the fused megakernel reproduces exactly (in distribution).

    NEE, dome lighting, arbitrary triangle counts, textures and normal
    maps (split-bounce kernels with tangent rows), UNTEXTURED stochastic
    cutout (in-walk Bernoulli accepts), absorption-only volumes
    (mediumStackSize == 0), the full advanced lobe set (thick refraction +
    TIR + Beer-Lambert, clearcoat, mesh-tangent anisotropy —
    FusedStatic.advanced) and the first-hit AOVs in FUSED_AOV_MASK are
    supported; scattering volumes / textured-opacity cutout + NEE /
    clipping still route to the general integrator.
    """
    del has_textures, has_normal_maps  # both use the split-bounce mode
    # stack 0: absorption-only (scattering coefficients are inert at
    # stack 0 in the wavefront too); stack 1: the fused scatter mode
    # (FusedStatic.scatter) carries the full depth-1 medium semantics
    # incl. HG walks; nested media (stack >= 2) stay on the wavefront
    del has_scattering_volumes
    volumes_ok = (not config.has_volumes
                  or config.medium_stack_size <= 1)
    del has_opacity_textures
    # textured-opacity cutout runs the split-bounce re-trace stage for
    # CAMERA paths; the in-kernel NEE occlusion walk draws against the
    # texture's UV-mean opacity per material (gi._shadow_cutout_pass) —
    # shadow rays through leaf textures carry the right AVERAGE
    # transmission (round 5; the reference taps the texture per anyhit)
    # clipping planes run a bounce-0 peel through the split kernels
    # (origin advanced to the near plane, far-plane hit filter) — fused
    # since round 5
    return (
        volumes_ok
        and (config.aov_mask & ~FUSED_AOV_MASK) == 0
    )


def _chunk_prefix_switch(body_fn, state, live_chunks, block_rows=8):
    """Run `body_fn` (state[16, sz, 128] -> same shape) over a lax.switch of
    halving STATIC chunk-prefix sizes; the all-dead tail passes through
    unchanged (the kernels leave dead rays untouched, so this is exact).

    Measured motivation (tools/dead_prof.py, v5e, 1406 blocks): an ALL-DEAD
    full-grid textured trace+shade costs 3.26 ms vs 4.95 ms all-alive — 66%
    of a late bounce is fixed per-block grid+DMA overhead that the in-kernel
    dead-block early-out cannot remove. Slicing the grid to the live prefix
    removes it: 1/8-alive body measured 2.09 ms including the tail concat."""
    rows, nb, lanes = state.shape
    br = block_rows
    sizes = [nb]
    while len(sizes) < 6 and sizes[-1] > br:
        half = max(br, -(-sizes[-1] // 2 // br) * br)
        if half == sizes[-1]:
            break
        sizes.append(half)
    sizes = sorted(set(sizes))  # ascending chunk counts
    if len(sizes) <= 1:
        return body_fn(state)

    def branch(sz):
        def f(st):
            head = jax.lax.slice(st, (0, 0, 0), (rows, sz, lanes))
            head = body_fn(head)
            if sz == nb:
                return head
            return jnp.concatenate([head, st[:, sz:]], axis=1)
        return f

    idx = jnp.int32(0)
    for sz in sizes[:-1]:
        idx = idx + (live_chunks > sz).astype(jnp.int32)
    return jax.lax.switch(idx, [branch(sz) for sz in sizes], state)


def _material_rows_chunked(materials, textures, hitbuf, active, live_prefix):
    """Alive-prefix texture stage: rays are kept sorted alive-first between
    bounces, so the per-bounce XLA stage only runs over a prefix covering
    the live set — the stage cost shrinks with aliveness instead of paying
    full-frame gathers on every bounce x spp iteration (the measured
    round-2 textured bottleneck, PERF.md). live_prefix is an index bound
    covering every live ray (== the live count when sorted).

    Implemented as a lax.switch over halving STATIC prefix sizes (each
    branch slices, computes, zero-pads): a chunked lax.scan measured a
    ~25 ms fixed overhead at 1200sq from the cond'd chunk writes + output
    restacking, which the switch avoids entirely."""
    rows_h, nb, lanes = hitbuf.shape
    sizes = [nb]
    while len(sizes) < 5 and sizes[-1] > 8:
        half = max(8, -(-sizes[-1] // 2 // 8) * 8)
        if half == sizes[-1]:
            break
        sizes.append(half)
    sizes = sorted(set(sizes))  # ascending row counts
    if len(sizes) <= 1:
        return _material_rows(materials, textures, hitbuf, active)
    # (tuple-aware: with tangent rows each branch returns (par, hit'))

    def branch(sz):
        def f(hb):
            chunk = jax.lax.slice(hb, (0, 0, 0), (rows_h, sz, lanes))
            out = _material_rows(materials, textures, chunk, active)
            par, hit = out if isinstance(out, tuple) else (out, None)
            if sz != nb:
                par = jnp.pad(par, ((0, 0), (0, nb - sz), (0, 0)))
                if hit is not None:
                    # rays beyond the prefix are all dead; keep their
                    # original rows so the buffer stays well-formed
                    hit = jnp.concatenate([hit, hb[:, sz:]], axis=1)
            return (par, hit) if hit is not None else par
        return f

    live_rows = (live_prefix + lanes - 1) // lanes
    idx = jnp.int32(0)
    for sz in sizes[:-1]:
        idx = idx + (live_rows > sz).astype(jnp.int32)
    return jax.lax.switch(idx, [branch(sz) for sz in sizes], hitbuf)


def _material_rows(materials, textures, hitbuf, active=None,
                   return_params=False):
    """The XLA stage between trace_step and shade_step: per-ray material
    rows with texture lookups applied — the one thing a Mosaic kernel cannot
    do (no per-lane dynamic gathers). One gather row per parameter class;
    padded/missed rays read slot 0 harmlessly (shade masks them out).

    When the hit buffer carries tangent rows (static.tangents scenes), the
    stage ALSO applies normal mapping — perturbing the H_N shading-normal
    rows in tangent space — and returns the updated hit buffer after the
    material rows."""
    from gatling_tpu.render.material import (apply_textures, gather_params,
                                             perturb_normal)
    from gatling_tpu.ops.pallas_bounce import (
        H_BS, H_N, H_TAN, HIT_ROWS, slim_param_layout, slim_param_rows)

    if active is None:
        active = ("base_color", "emissive", "metallic", "roughness")
    active = tuple(active)
    rows, nb, lanes = hitbuf.shape
    flat = hitbuf.reshape(rows, nb * lanes)
    mat = jnp.clip(jnp.round(flat[H_MAT]).astype(jnp.int32), 0, None)
    uv = jnp.stack([flat[H_UVX], flat[H_UVY]], axis=-1)
    p = gather_params(materials, mat)
    p = apply_textures(materials, textures, p, mat, uv, active)
    # SLIM parbuf: only the textured params get per-ray rows; the shade
    # kernel resolves everything else from the SMEM material table
    # (pallas_bounce.slim_param_layout is the shared row map)
    out_rows: list = []
    for name, _row in slim_param_layout(active):
        if name == "base_color":
            out_rows += [p.base_color[:, 0], p.base_color[:, 1],
                         p.base_color[:, 2]]
        elif name == "emissive":
            out_rows += [p.emissive[:, 0], p.emissive[:, 1],
                         p.emissive[:, 2]]
        elif name == "metallic":
            out_rows.append(p.metallic)
        elif name == "roughness":
            out_rows.append(p.roughness)
    n_rows = slim_param_rows(active)
    zero = jnp.zeros_like(p.metallic)
    out_rows += [zero] * (n_rows - len(out_rows))
    out = jnp.stack(out_rows, axis=0)
    rowsbuf = out.reshape(n_rows, nb, lanes)
    result = [rowsbuf]
    if rows > HIT_ROWS:
        n = flat[H_N:H_N + 3].T
        t = flat[H_TAN:H_TAN + 3].T
        b = jnp.cross(n, t) * flat[H_BS][:, None]
        n_new = perturb_normal(materials, textures, mat, uv, n, t, b)
        result.append(hitbuf.at[H_N:H_N + 3].set(
            n_new.T.reshape(3, nb, lanes)))
    if return_params:
        result.append(p)
    return tuple(result) if len(result) > 1 else rowsbuf


_TEX_CUTOUT_ROUNDS = 4  # re-trace rounds before force-accepting a hit


def _textured_cutout_retrace(params, scene, state, hitbuf, *, static,
                             materials, textures):
    """Stochastic TEXTURED-opacity cutout for the split-bounce path
    (rp_main.ahit:35-61 analog). The in-kernel walk cannot tap textures,
    so opacity-textured materials trace as opaque; this XLA stage then
    draws an accept per hit against the texture-sampled pass probability
    and RE-TRACES rejected rays from just past the surface — up to
    _TEX_CUTOUT_ROUNDS surfaces per bounce (the reference's anyhit loop is
    unbounded; 4 rounds cover leaf/fence-class content, after which the
    hit is force-accepted). Returns (hitbuf, state): rejected rays' state
    origins advance so volume segments and later rounds stay consistent.

    Untextured cutout stays resolved INSIDE the walk (static.cutout); only
    materials with an opacity texture slot re-draw here, so the two
    mechanisms compose without double jeopardy (_cutout_pass_prob forces
    their in-walk pass probability to 1)."""
    from gatling_tpu.ops.pallas_bounce import (H_GN, H_HIT, H_MAT, H_POS,
                                               H_UVX, H_UVY)
    from gatling_tpu.render import bsdf as bsdf_mod
    from gatling_tpu.render.material import apply_textures, gather_params

    rows, nb, lanes = hitbuf.shape
    n = nb * lanes

    def pass_prob_of(hb):
        flat = hb.reshape(rows, n)
        mat = jnp.clip(jnp.round(flat[H_MAT]).astype(jnp.int32), 0, None)
        uv = jnp.stack([flat[H_UVX], flat[H_UVY]], axis=-1)
        p = gather_params(materials, mat)
        p = apply_textures(materials, textures, p, mat, uv, ("opacity",))
        has_otex = materials.opacity_tex[mat] >= 0
        return bsdf_mod.cutout_opacity(p), has_otex, flat

    rng_salt = jax.lax.bitcast_convert_type(
        state[12], jnp.uint32).reshape(n)
    for rd in range(_TEX_CUTOUT_ROUNDS - 1):
        pass_prob, has_otex, flat = pass_prob_of(hitbuf)
        alive = state[13].reshape(n) > 0.5
        hit = flat[H_HIT] > 0.5
        # independent per-(ray, round) draw decorrelated from the path RNG
        h = rng_salt ^ jnp.uint32(0x9E3779B9 + 0x85EB * rd)
        h = (h ^ (h >> jnp.uint32(16))) * jnp.uint32(0x21F0AAAD)
        h = (h ^ (h >> jnp.uint32(15))) * jnp.uint32(0x735A2D97)
        xi = ((h ^ (h >> jnp.uint32(15))) >> jnp.uint32(8)).astype(
            jnp.float32) * jnp.float32(1.0 / (1 << 24))
        reject = alive & hit & has_otex & (xi >= pass_prob)

        pos = flat[H_POS:H_POS + 3].T
        gn = flat[H_GN:H_GN + 3].T
        new_o = smp.offset_ray_origin(pos, -gn)  # continue past the surface
        o_rows = jnp.where(reject, new_o.T, state[0:3].reshape(3, n))
        state = state.at[0:3].set(o_rows.reshape(3, nb, lanes))
        # trace ONLY the rejected rays (dead blocks early-out in kernel)
        masked = state.at[13].set(
            jnp.where(reject.reshape(nb, lanes), state[13], 0.0))
        hb2 = trace_step(params, scene, masked, static=static)
        hitbuf = jnp.where(reject.reshape(1, nb, lanes), hb2, hitbuf)
    return hitbuf, state


@partial(jax.jit, static_argnames=("config", "static", "spp", "with_stats", "want_first_hit"))
def render_pixels_fused(
    config: RenderConfig,
    uniforms: Uniforms,
    scene: FusedScene,
    dome: DomeLightData,
    pixel_index: jnp.ndarray,
    spp: int,
    sample_offset: jnp.ndarray,
    *,
    static: FusedStatic,
    with_stats: bool = False,
    materials=None,
    textures=None,
    want_first_hit: bool = False,
):
    """Returns mean color [R,3] over spp samples; with_stats additionally
    returns the mean traced-segment count per sample [R] (path segments +
    NEE shadow rays — the Mray/s accounting source)."""
    r = pixel_index.shape[0]
    # spp batching: trace several samples per pixel in ONE wave so the
    # per-bounce fixed costs (walk-plan prelude, coherence sort, kernel
    # grid launches, dead-block tails) amortize across samples instead of
    # repeating per sequential spp iteration. Capped so the ray state
    # stays within a ~4M-ray footprint (16 rows f32 = 256 MB); per-sample
    # RNG streams are IDENTICAL to the sequential path (sample index =
    # offset + s*batch + replica), only the float accumulation order
    # differs. First-hit AOV peeling stays sequential.
    spp_batch = 1
    if not want_first_hit and spp > 1 and r >= 128:
        cap = max(1, int(os.environ.get("GATLING_SPP_BATCH_RAYS",
                                        "4194304")) // r)
        spp_batch = max(d for d in range(1, min(spp, cap) + 1)
                        if spp % d == 0)
    rb = r * spp_batch
    blk = static.block_rows * 128
    r_pad = -(-rb // blk) * blk
    px = pixel_index % config.width
    py = pixel_index // config.width
    nee = bool(config.nee)
    # ray compaction/sorting pays off when the cluster walk exists
    # (coherence bounds cluster DMAs); everywhere else an alive-first CHUNK
    # partition (~0.2 ms at 1.44M rays) keeps the live set a prefix so the
    # per-bounce kernels run on a sliced grid (_chunk_prefix_switch) instead
    # of paying fixed per-block overhead for every dead block
    sort_rays = static.clustered
    sort_alive = not static.clustered
    if sort_rays:
        scene_lo = jnp.min(scene.l1_aabbs[0:3], axis=1)
        scene_hi = jnp.max(scene.l1_aabbs[3:6], axis=1)
        scene_inv = 1.0 / jnp.maximum(scene_hi - scene_lo, 1e-12)
        if r == config.width * config.height:
            # full-frame render: swizzle pixels into 32x32 tiles so primary
            # blocks have tight frusta; unswizzled on return
            tile_perm = jnp.asarray(_tile_order(config.width, config.height))
            pixel_index = pixel_index[tile_perm]
            px = pixel_index % config.width
            py = pixel_index // config.width
        else:
            tile_perm = None
    else:
        tile_perm = None
    if spp_batch > 1:
        # replica-major tiling AFTER the tile swizzle: each replica keeps
        # its tight primary frusta; replica index selects the sample
        pixel_index = jnp.tile(pixel_index, spp_batch)
        px = jnp.tile(px, spp_batch)
        py = jnp.tile(py, spp_batch)
        replica = jnp.repeat(jnp.arange(spp_batch, dtype=jnp.int32), r)

    def sample_body(s, carry):
        if want_first_hit:
            acc, segs, fh_acc = carry
        else:
            acc, segs = carry
        if spp_batch > 1:
            sidx = sample_offset + s * spp_batch + replica
        else:
            sidx = sample_offset + s
        rng = smp.rng_init(pixel_index.astype(jnp.uint32),
                           jnp.asarray(sidx).astype(jnp.uint32))
        origins, dirs, rng = generate_primary_rays(
            uniforms.camera, config.width, config.height, px, py, rng,
            config.jittered, config.fis, config.depth_of_field)
        if config.clipping_planes:
            # camera clipping (rp_main.rgen:283-285): advance the origin to
            # the near plane (hits in front become behind the new origin)
            # and record the far cap for the bounce-0 peel's hit filter
            cosc = jnp.maximum(
                jnp.sum(dirs * uniforms.camera.forward, axis=-1), 1e-5)
            c_lo = uniforms.camera.clip_start / cosc
            clip_rem = uniforms.camera.clip_end / cosc - c_lo
            origins = origins + dirs * c_lo[:, None]
        state = pack_state(origins, dirs, rng, r_pad)
        orig = jnp.arange(r_pad, dtype=jnp.int32)
        start_bounce = 0

        if want_first_hit or config.clipping_planes:
            # peel bounce 0 through the split-bounce kernels: the hit
            # buffer doubles as the first-hit AOV source (chit:191-290)
            # and carries the far-clip hit filter
            from gatling_tpu.ops.pallas_bounce import (
                H_HIT, H_N, H_T, H_UVX, H_UVY, slim_param_rows,
            )
            from gatling_tpu.render import bsdf as bsdf_mod

            params0 = make_params(config, uniforms, jnp.int32(0))
            hitbuf = trace_step(params0, scene, state, static=static)
            if config.clipping_planes:
                # hits beyond the far plane become bounce-0 misses
                rem_p = jnp.full((r_pad,), 3e37, jnp.float32)
                rem_p = rem_p.at[:clip_rem.shape[0]].set(clip_rem)
                rem_p = rem_p.reshape(-1, 128)
                hitbuf = hitbuf.at[H_HIT].set(jnp.where(
                    hitbuf[H_T] <= rem_p, hitbuf[H_HIT], 0.0))
            if static.cutout_textured:
                hitbuf, state = _textured_cutout_retrace(
                    params0, scene, state, hitbuf, static=static,
                    materials=materials, textures=textures)
            if materials is not None:
                if static.tangents:
                    parbuf, hitbuf, p = _material_rows(
                        materials, textures, hitbuf,
                        static.textured_params, return_params=True)
                else:
                    parbuf, p = _material_rows(materials, textures, hitbuf,
                                               static.textured_params,
                                               return_params=True)
            else:
                # clip-only peel of an untextured scene: the shade kernel
                # resolves every parameter from the SMEM material table
                parbuf = jnp.zeros(
                    (slim_param_rows(static.textured_params),)
                    + state.shape[1:], jnp.float32)
                p = None
            if want_first_hit:
                flat = hitbuf.reshape(hitbuf.shape[0], -1)[:, :r]
                fh_hit = flat[H_HIT] > 0.5
                fh_normal = flat[H_N:H_N + 3].T
                fh_uv = jnp.stack(
                    [flat[H_UVX], flat[H_UVY], jnp.zeros_like(flat[H_UVX])],
                    axis=-1)
                p_r = jax.tree.map(
                    lambda a: a[:r] if a.ndim == 1 else a[:r, :], p)
                fh_albedo = bsdf_mod.auxiliary(p_r, -dirs, fh_normal)
                t_hit = flat[H_T]
                cs = uniforms.camera.clip_start
                ce = uniforms.camera.clip_end
                log_depth = jnp.where(
                    cs > 0.0,
                    2.0 * jnp.log(jnp.maximum(t_hit, 1e-20) / cs)
                    / jnp.log(jnp.maximum(ce / cs, 1.0 + 1e-6)) - 1.0,
                    t_hit)
                fh_new = dict(
                    normal=fh_acc["normal"]
                    + jnp.where(fh_hit[:, None], fh_normal, 0.0) / spp,
                    albedo=fh_acc["albedo"]
                    + jnp.where(fh_hit[:, None], fh_albedo, 0.0) / spp,
                    depth=jnp.where(fh_hit, log_depth, fh_acc["depth"]),
                    texcoords=jnp.where(fh_hit[:, None], fh_uv,
                                        fh_acc["texcoords"]),
                    hit=fh_acc["hit"] | fh_hit,
                )
            state = shade_step(params0, scene, state, hitbuf, parbuf,
                               static=static, nee=nee)
            start_bounce = 1

        def cond(carry2):
            bounce, st, _orig, _perm = carry2
            return (bounce < config.max_bounces) & (jnp.max(st[13]) > 0.5)

        def body(carry2, use_taps=True):
            bounce, st, orig_, perm_ = carry2
            params = make_params(config, uniforms, bounce)
            if sort_alive:
                # chunk-granularity alive-first partition: permuting whole
                # 128-ray lane chunks is ~free (_sort_chunks), so
                # re-partition EVERY bounce; the live prefix is the number
                # of chunks containing any alive ray. The stable partition
                # permutation comes from a cumsum + inverse-scatter, NOT a
                # sort — a stable argsort over the chunk keys measured
                # 1.29 ms/bounce on v5e (hlo_stats compare_select fusion),
                # ~13% of the whole bounce
                chunk_alive = jnp.max(st[13], axis=1) > 0.5  # [NB]
                nb_ = st.shape[1]
                af = chunk_alive.astype(jnp.int32)
                n_alive = jnp.sum(af)
                pos_alive = jnp.cumsum(af) - 1            # rank among alive
                pos_dead = jnp.cumsum(1 - af) - 1         # rank among dead
                dest = jnp.where(chunk_alive, pos_alive, n_alive + pos_dead)
                corder = jnp.zeros((nb_,), jnp.int32).at[dest].set(
                    jnp.arange(nb_, dtype=jnp.int32))
                st = _sort_chunks(st, corder)
                orig_ = orig_.reshape(nb_, 128)[corder].reshape(-1)
                live_chunks = jnp.maximum(n_alive, 1)
                perm_ = perm_ | (live_chunks < nb_)
            else:
                # clustered: the coherence sort below keeps dead rays last,
                # making the live set a prefix — but the first iteration
                # (or the one after the first-hit peel) enters unsorted, so
                # bound the prefix by the LAST alive chunk, not the count
                chunk_alive = jnp.max(st[13], axis=1) > 0.5
                iota_c = jnp.arange(chunk_alive.shape[0], dtype=jnp.int32)
                live_chunks = jnp.maximum(
                    jnp.max(jnp.where(chunk_alive, iota_c, -1)) + 1, 1)

            def chunk_body(head):
                if static.textured:
                    def split(h):
                        hitbuf = trace_step(params, scene, h, static=static)
                        if static.cutout_textured:
                            hitbuf, h = _textured_cutout_retrace(
                                params, scene, h, hitbuf, static=static,
                                materials=materials, textures=textures)
                        stage = _material_rows(materials, textures, hitbuf,
                                               static.textured_params)
                        if static.tangents:
                            parbuf, hb = stage  # normal-mapped H_N rows
                        else:
                            parbuf, hb = stage, hitbuf
                        return shade_step(params, scene, h, hb, parbuf,
                                          static=static, nee=nee)

                    if not use_taps:
                        # texture-LOD top-mip phase (bounces >= k): zero
                        # taps — scene.mats holds the texture MEANS
                        # (substitute_texture_means), shaded from SMEM in
                        # the one-kernel bounce. Statically selected by
                        # the two-phase loop below; both a per-bounce
                        # lax.cond (interior 5.19) and a split-pipeline
                        # means-parbuf phase (5.02; clustered 61.7 vs
                        # 102.9 on cornell) measured worse — the top-mip
                        # phase is an untextured workload, where the
                        # megakernel wins (PERF.md force-split result).
                        return bounce_step(params, scene, head,
                                           static=static, nee=nee)
                    return split(head)
                if (static.clustered and not static.scatter
                        and os.environ.get("GATLING_FORCE_SPLIT", "") == "1"):
                    # experiment knob: run UNTEXTURED clustered scenes
                    # through the split kernels — with the XLA pass-2
                    # relocation the split trace skips the in-kernel
                    # winner-attribute scan, which may beat the megakernel
                    # on incoherent-bounce-heavy scenes (PERF.md)
                    from gatling_tpu.ops.pallas_bounce import slim_param_rows
                    hitbuf = trace_step(params, scene, head, static=static)
                    parbuf = jnp.zeros(
                        (slim_param_rows(static.textured_params),)
                        + head.shape[1:], jnp.float32)
                    return shade_step(params, scene, head, hitbuf, parbuf,
                                      static=static, nee=nee)
                return bounce_step(params, scene, head, static=static, nee=nee)

            st = _chunk_prefix_switch(chunk_body, st, live_chunks,
                                      static.block_rows)
            if sort_rays:
                keys = _coherence_keys(st, scene_lo, scene_inv)
                if os.environ.get("GATLING_CLU_SORT", "ray") == "chunk":
                    # chunk-granularity coherence permute: the per-ray
                    # _sort_state gather costs ~2.6 ns/row-element
                    # (~40 us/1024-ray block/bounce); permuting whole
                    # 128-ray chunks by their median key is ~20x cheaper
                    # at modestly worse walk unions (sim: +28% bounce-1).
                    # Env-gated for measurement; per-ray stays default.
                    nb_ = st.shape[1]
                    ckey = jnp.median(
                        keys.reshape(nb_, 128).astype(jnp.float32), axis=1)
                    corder = jnp.argsort(ckey)
                    st = _sort_chunks(st, corder)
                    orig_ = orig_.reshape(nb_, 128)[corder].reshape(-1)
                else:
                    order = jnp.argsort(keys)
                    st = _sort_state(st, order)
                    orig_ = orig_[order]
                perm_ = jnp.bool_(True)
            return bounce + 1, st, orig_, perm_

        carry0 = (jnp.int32(start_bounce), state, orig, jnp.bool_(False))
        lod_k = (config.tex_lod_bounces
                 if (static.textured and config.tex_lod_bounces > 0
                     and not static.cutout_textured) else 0)
        if lod_k > 0:
            # two-phase loop: taps while bounce < k, then the top-mip body
            # — each phase is its own while_loop with a statically chosen
            # body, so no per-bounce cond dispatch
            carry0 = jax.lax.while_loop(
                lambda c: cond(c) & (c[0] < lod_k),
                partial(body, use_taps=True), carry0)
            carry0 = jax.lax.while_loop(
                cond, partial(body, use_taps=False), carry0)
        else:
            carry0 = jax.lax.while_loop(cond, body, carry0)
        _, state, orig, permuted = carry0
        if sort_rays:
            state = jax.lax.cond(
                permuted,
                lambda s, o: _sort_state(s, jnp.argsort(o)),
                lambda s, o: s, state, orig)
        elif sort_alive:
            # all permutations were chunk-aligned: unsort whole chunks
            corig = orig.reshape(-1, 128)[:, 0]
            state = _sort_chunks(state, jnp.argsort(corig))
        radiance = unpack_radiance(state, rb)

        if config.has_dome:
            # dome post-pass over the kernel's miss records
            # (reference: rp_main.miss:55-87)
            miss_rec = unpack_rows(state, 14, 1, rb)[:, 0]
            tp = unpack_rows(state, 6, 3, rb)
            miss_dir = unpack_rows(state, 3, 3, rb)
            sample_dir = _quat_rotate(uniforms.dome_rotation, miss_dir)
            sample_dir = sample_dir / jnp.maximum(
                jnp.linalg.norm(sample_dir, axis=-1, keepdims=True), 1e-20)
            dome_rad = _sample_equirect(dome.texture, sample_dir) \
                * uniforms.dome_emission_multiplier
            if not config.dome_light_camera_visible:
                fallback = jnp.broadcast_to(dome.fallback[0, 0], dome_rad.shape)
                dome_rad = jnp.where((miss_rec == 1.0)[:, None], fallback, dome_rad)
            radiance = radiance + jnp.where(
                (miss_rec > 0.0)[:, None], tp * dome_rad, 0.0)

        # radiance clamp (rgen:488-494) — per SAMPLE, before the replica sum
        max_v = jnp.max(radiance, axis=-1)
        scale = jnp.where(max_v > uniforms.max_sample_value,
                          uniforms.max_sample_value / jnp.maximum(max_v, 1e-20), 1.0)
        contrib = jnp.maximum(radiance * scale[:, None], 0.0)
        seg_rows = unpack_rows(state, 15, 1, rb)[:, 0]
        if spp_batch > 1:
            contrib = contrib.reshape(spp_batch, r, 3).sum(0)
            seg_rows = seg_rows.reshape(spp_batch, r).sum(0)
        acc = acc + contrib / spp
        segs = segs + seg_rows / spp
        if want_first_hit:
            return acc, segs, fh_new
        return acc, segs

    zero3 = jnp.zeros((r, 3), jnp.float32)
    init = (zero3, jnp.zeros((r,), jnp.float32))
    if want_first_hit:
        init = init + (dict(normal=zero3, albedo=zero3,
                            depth=jnp.ones((r,), jnp.float32),
                            texcoords=zero3,
                            hit=jnp.zeros((r,), bool)),)
        color, segs, fh = jax.lax.fori_loop(0, spp, sample_body, init)
    else:
        color, segs = jax.lax.fori_loop(0, spp // spp_batch, sample_body,
                                        init)
        fh = None
    if tile_perm is not None:
        # undo the tile swizzle: row i holds pixel_index[tile_perm[i]]
        color = jnp.zeros_like(color).at[tile_perm].set(color)
        segs = jnp.zeros_like(segs).at[tile_perm].set(segs)
        if fh is not None:
            fh = {k: jnp.zeros_like(v).at[tile_perm].set(v) for k, v in fh.items()}
    if want_first_hit:
        return color, segs, fh
    if with_stats:
        return color, segs
    return color
