"""Fused Pallas bounce megakernel.

Why this exists: the XLA wavefront integrator moves ~86 KB of HBM traffic
per ray per frame (measured via compiled cost analysis, see PERF.md) because
every intermediate between fusion islands is a [N,*] HBM buffer. This kernel
fuses an ENTIRE path-tracing bounce — closest-hit search, shading-state
interpolation, emission, uber-BSDF importance sampling, RNG advance, russian
roulette — into one Pallas program whose only HBM traffic is the packed ray
state (16 f32 per ray, aliased in/out) plus tiny scene tables resident in
VMEM. It is the true TPU analog of the reference's ray-tracing megakernel
(rp_main.rgen + rp_main.chit + rp_main.miss in one dispatch).

Layouts (the whole point):
* ray state: [16, R/128, 128] — component-major, so every per-ray quantity
  is a fully-packed [8,128] vreg tile inside the kernel (rays on sublanes x
  lanes); no [N,3] minor-dim hazards exist anywhere,
* triangles: [12, T] scalar-broadcast tables (v0,e1,e2, precomputed geometric
  normal) walked by a fori loop — each triangle tests against all 1024 rays
  of the block in ~50 vreg ops,
* shading attributes: [11, T] (corner normals, material id, flags) selected
  during the same loop when a triangle becomes the closest hit,
* materials: [M,24] packed rows resolved by a small select loop.

Fast-path scope (round 1): constant-parameter materials (no textures), no
NEE, no volumes, no cutout; selected automatically for qualifying configs.
The RNG stream matches the general integrator (pcg32, same draw order), but
the shading frame uses the Duff ONB of the shading normal instead of mesh
tangents, so individual samples differ by an azimuthal rotation while the
estimator's distribution is identical.

State rows: 0-2 origin, 3-5 dir, 6-8 throughput, 9-11 radiance,
12 rng (bitcast u32), 13 alive flag, 14-15 unused.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gatling_tpu.interface import (
    FLOAT_MAX,
    MESH_FLAG_DOUBLE_SIDED,
    MESH_FLAG_FLIP_FACING,
)
from gatling_tpu.ops.geometry import SceneGeometry
from gatling_tpu.render.material import MaterialTable

RAY_BLOCK = 1024
BLOCK_ROWS = RAY_BLOCK // 128  # 8
STATE_ROWS = 16
PI = 3.14159265358979
MIN_ALPHA = 1e-3

# params vector (SMEM) indices
P_BG_R, P_BG_G, P_BG_B = 0, 1, 2
P_RR_INV_MIN = 3
P_RR_OFFSET = 4
P_BOUNCE = 5
P_EXP2_EXPOSURE = 6
P_TMIN = 7
PARAMS_LEN = 8


class FusedScene(NamedTuple):
    """VMEM-resident scene tables for the bounce kernel."""

    tris: jnp.ndarray  # [12, T]: v0(3) e1(3) e2(3) gn(3) (gn = normalized cross, flip applied)
    attrs: jnp.ndarray  # [11, T]: n0(3) n1(3) n2(3) mat_id double_sided
    mats: jnp.ndarray  # [M, 24] packed material rows (MaterialTable.packed_f)
    n_tris: int


def build_fused_scene(geom: SceneGeometry, table: MaterialTable) -> FusedScene:
    # drop lane-padding triangles: the serial loop needs no 128-alignment,
    # and e.g. the Cornell box is 46 real tris inside a 128 pad
    e1_all = np.asarray(geom.e1)
    e2_all = np.asarray(geom.e2)
    real = (np.abs(e1_all).sum(axis=1) > 0) | (np.abs(e2_all).sum(axis=1) > 0)
    n_real = int(np.max(np.nonzero(real)[0])) + 1 if real.any() else 0
    geom = SceneGeometry(*[arr[:n_real] for arr in geom])

    v0 = np.asarray(geom.v0).T
    e1 = np.asarray(geom.e1).T
    e2 = np.asarray(geom.e2).T
    gn = np.cross(np.asarray(geom.e1), np.asarray(geom.e2))
    lens = np.maximum(np.linalg.norm(gn, axis=1, keepdims=True), 1e-20)
    gn = gn / lens
    flags = np.asarray(geom.flags)
    flip = (flags & MESH_FLAG_FLIP_FACING) != 0
    gn = np.where(flip[:, None], -gn, gn).T.astype(np.float32)
    tris = np.concatenate([v0, e1, e2, gn], axis=0).astype(np.float32)

    attrs = np.concatenate([
        np.asarray(geom.n0).T, np.asarray(geom.n1).T, np.asarray(geom.n2).T,
        np.asarray(geom.material_id)[None].astype(np.float32),
        ((flags & MESH_FLAG_DOUBLE_SIDED) != 0)[None].astype(np.float32),
    ], axis=0).astype(np.float32)

    return FusedScene(
        tris=jnp.asarray(tris),
        attrs=jnp.asarray(attrs),
        mats=jnp.asarray(table.packed_f),
        n_tris=v0.shape[1],
    )


def _pcg_next(state_u32):
    """[8,128] pcg32 step -> (new_state, float in [0,1))."""
    ns = state_u32 * jnp.uint32(747796405) + jnp.uint32(2891336453)
    shift = jnp.right_shift(ns, jnp.uint32(28)) + jnp.uint32(4)
    word = jnp.bitwise_xor(jnp.right_shift(ns, shift), ns) * jnp.uint32(277803737)
    word = jnp.bitwise_xor(jnp.right_shift(word, jnp.uint32(22)), word)
    bits = jnp.bitwise_or(jnp.uint32(0x3F800000), jnp.right_shift(word, jnp.uint32(9)))
    return ns, jax.lax.bitcast_convert_type(bits, jnp.float32) - 1.0


def _bounce_kernel(params_ref, tri_ref, attr_ref, mat_ref, state_ref, out_ref,
                   *, n_tris: int, n_mats: int):
    # dead-block early out: later bounces have mostly-terminated blocks and
    # skip the whole triangle loop (the SIMT analog: warp-level exit)
    any_alive = jnp.max(state_ref[13]) > 0.5

    @pl.when(jnp.logical_not(any_alive))
    def _():
        out_ref[...] = state_ref[...]

    @pl.when(any_alive)
    def _():
        _bounce_body(params_ref, tri_ref, attr_ref, mat_ref, state_ref, out_ref,
                     n_tris=n_tris, n_mats=n_mats)


def _bounce_body(params_ref, tri_ref, attr_ref, mat_ref, state_ref, out_ref,
                 *, n_tris: int, n_mats: int):
    s = lambda c: state_ref[c]  # [8,128]  # noqa: E731

    ox, oy, oz = s(0), s(1), s(2)
    dx, dy, dz = s(3), s(4), s(5)
    tpx, tpy, tpz = s(6), s(7), s(8)
    radx, rady, radz = s(9), s(10), s(11)
    rng = jax.lax.bitcast_convert_type(s(12), jnp.uint32)
    alive = s(13) > 0.5

    tmin = params_ref[P_TMIN]

    # ---- closest-hit search: serial triangle loop, all rays per step ----
    def tri_body(t, carry):
        (best_t, bu, bv,
         a_n0x, a_n0y, a_n0z, a_n1x, a_n1y, a_n1z, a_n2x, a_n2y, a_n2z,
         a_gnx, a_gny, a_gnz, a_mat, a_ds) = carry
        v0x = tri_ref[0, t]; v0y = tri_ref[1, t]; v0z = tri_ref[2, t]
        e1x = tri_ref[3, t]; e1y = tri_ref[4, t]; e1z = tri_ref[5, t]
        e2x = tri_ref[6, t]; e2y = tri_ref[7, t]; e2z = tri_ref[8, t]

        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        ok = jnp.abs(det) > 1e-12
        inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
        tx = ox - v0x
        ty = oy - v0y
        tz = oz - v0z
        u = (tx * px + ty * py + tz * pz) * inv
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv
        tt = (e2x * qx + e2y * qy + e2z * qz) * inv
        better = (ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                  & (tt > tmin) & (tt < best_t))

        def sel(cur, ref, row):
            return jnp.where(better, ref[row, t], cur)

        return (
            jnp.where(better, tt, best_t),
            jnp.where(better, u, bu), jnp.where(better, v, bv),
            sel(a_n0x, attr_ref, 0), sel(a_n0y, attr_ref, 1), sel(a_n0z, attr_ref, 2),
            sel(a_n1x, attr_ref, 3), sel(a_n1y, attr_ref, 4), sel(a_n1z, attr_ref, 5),
            sel(a_n2x, attr_ref, 6), sel(a_n2y, attr_ref, 7), sel(a_n2z, attr_ref, 8),
            sel(a_gnx, tri_ref, 9), sel(a_gny, tri_ref, 10), sel(a_gnz, tri_ref, 11),
            sel(a_mat, attr_ref, 9), sel(a_ds, attr_ref, 10),
        )

    z = jnp.zeros((BLOCK_ROWS, 128), jnp.float32)
    init = (jnp.full((BLOCK_ROWS, 128), FLOAT_MAX, jnp.float32), z, z,
            z, z, z, z, z, z, z, z, z, z, z, z, z, z)
    (best_t, u, v,
     n0x, n0y, n0z, n1x, n1y, n1z, n2x, n2y, n2z,
     gnx, gny, gnz, mat_f, dsided) = jax.lax.fori_loop(0, n_tris, tri_body, init)

    hit = alive & (best_t < FLOAT_MAX)
    miss = alive & ~hit

    # ---- miss: constant background (fast path has no dome texture) ----
    radx = radx + jnp.where(miss, tpx * params_ref[P_BG_R], 0.0)
    rady = rady + jnp.where(miss, tpy * params_ref[P_BG_G], 0.0)
    radz = radz + jnp.where(miss, tpz * params_ref[P_BG_B], 0.0)

    # ---- shading state ----
    posx = ox + best_t * dx
    posy = oy + best_t * dy
    posz = oz + best_t * dz
    w = 1.0 - u - v
    nx = w * n0x + u * n1x + v * n2x
    ny = w * n0y + u * n1y + v * n2y
    nz = w * n0z + u * n1z + v * n2z
    nlen = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-20))
    nx, ny, nz = nx * nlen, ny * nlen, nz * nlen

    front = (gnx * -dx + gny * -dy + gnz * -dz) >= 0.0
    fsign = jnp.where(front, 1.0, -1.0)
    gnx, gny, gnz = gnx * fsign, gny * fsign, gnz * fsign
    nx, ny, nz = nx * fsign, ny * fsign, nz * fsign

    # ---- material row resolve ----
    m_id = mat_f.astype(jnp.int32)
    mp = [jnp.zeros((BLOCK_ROWS, 128), jnp.float32) for _ in range(11)]
    # columns of MaterialTable.packed_f used here
    # 0-2 base_color, 3 metallic, 4 roughness, 5 ior, 7-9 emissive, 14 transmission
    cols = (0, 1, 2, 3, 4, 5, 7, 8, 9, 14, 15)
    for mm in range(n_mats):
        is_m = m_id == mm
        for k, col in enumerate(cols):
            mp[k] = jnp.where(is_m, mat_ref[mm, col], mp[k])
    base_r, base_g, base_b, metallic, roughness, ior, em_r, em_g, em_b, transm, thinw = mp

    # ---- emission (front face or double-sided) ----
    em_ok = hit & (front | (dsided > 0.5))
    em_scale = params_ref[P_EXP2_EXPOSURE]
    radx = radx + jnp.where(em_ok, tpx * em_r * em_scale, 0.0)
    rady = rady + jnp.where(em_ok, tpy * em_g * em_scale, 0.0)
    radz = radz + jnp.where(em_ok, tpz * em_b * em_scale, 0.0)

    # ---- RNG draws (xi4, same order as the general integrator) ----
    rng1, xi0 = _pcg_next(rng)
    rng2, xi1 = _pcg_next(rng1)
    rng3, xi2 = _pcg_next(rng2)
    rng4, xi3 = _pcg_next(rng3)
    rng = jnp.where(hit, rng4, rng)

    # ---- Duff ONB around the shading normal ----
    nsign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a_onb = -1.0 / (nsign + nz)
    b_onb = nx * ny * a_onb
    t1x = 1.0 + nsign * nx * nx * a_onb
    t1y = nsign * b_onb
    t1z = -nsign * nx
    t2x = b_onb
    t2y = nsign + ny * ny * a_onb
    t2z = -ny

    # wo in local frame
    wox = -(dx * t1x + dy * t1y + dz * t1z)
    woy = -(dx * t2x + dy * t2y + dz * t2z)
    woz = -(dx * nx + dy * ny + dz * nz)

    # ---- lobe weights (render/bsdf.py _lobe_weights) ----
    f0d = ((ior - 1.0) / (ior + 1.0)) ** 2
    f0r = f0d * (1.0 - metallic) + base_r * metallic
    f0g = f0d * (1.0 - metallic) + base_g * metallic
    f0b = f0d * (1.0 - metallic) + base_b * metallic
    lum_base = 0.2126 * base_r + 0.7152 * base_g + 0.0722 * base_b
    lum_f0 = 0.2126 * f0r + 0.7152 * f0g + 0.0722 * f0b
    w_d = lum_base * (1.0 - metallic) * (1.0 - transm)
    w_g = jnp.where(lum_f0 > 0.0, jnp.maximum(lum_f0, 0.04), 0.0)
    w_t = transm
    w_sum = jnp.maximum(w_d + w_g + w_t, 1e-20)
    p_d = w_d / w_sum
    p_g = w_g / w_sum
    p_t = w_t / w_sum

    pick_d = xi0 < p_d
    pick_g = (~pick_d) & (xi0 < p_d + p_g)
    pick_t = (~pick_d) & (~pick_g)

    # diffuse: cosine hemisphere
    ra = jnp.sqrt(jnp.clip(xi1, 0.0, 1.0))
    phi_d = 2.0 * PI * xi2
    wdx = ra * jnp.cos(phi_d)
    wdy = ra * jnp.sin(phi_d)
    wdz = jnp.sqrt(jnp.maximum(0.0, 1.0 - xi1))

    # glossy: GGX NDF half-vector sample + reflect
    alpha = jnp.maximum(roughness * roughness, MIN_ALPHA)
    alpha2 = alpha * alpha
    c2h = (1.0 - xi1) / jnp.maximum(1.0 + (alpha2 - 1.0) * xi1, 1e-12)
    ch = jnp.sqrt(jnp.clip(c2h, 0.0, 1.0))
    sh = jnp.sqrt(jnp.maximum(0.0, 1.0 - c2h))
    hx = sh * jnp.cos(phi_d)
    hy = sh * jnp.sin(phi_d)
    hz = ch
    odoth = wox * hx + woy * hy + woz * hz
    wgx = 2.0 * odoth * hx - wox
    wgy = 2.0 * odoth * hy - woy
    wgz = 2.0 * odoth * hz - woz

    wix = jnp.where(pick_d, wdx, wgx)
    wiy = jnp.where(pick_d, wdy, wgy)
    wiz = jnp.where(pick_d, wdz, wgz)
    wix = jnp.where(pick_t, -wox, wix)
    wiy = jnp.where(pick_t, -woy, wiy)
    wiz = jnp.where(pick_t, -woz, wiz)

    # ---- evaluate reflection lobes at wi (render/bsdf.py _eval_lobes) ----
    cos_o = woz
    cos_i = wiz
    refl = (cos_o > 0.0) & (cos_i > 0.0)
    cos_i_c = jnp.maximum(cos_i, 0.0)
    hxs = wox + wix
    hys = woy + wiy
    hzs = woz + wiz
    hinv = jax.lax.rsqrt(jnp.maximum(hxs * hxs + hys * hys + hzs * hzs, 1e-24))
    hxs, hys, hzs = hxs * hinv, hys * hinv, hzs * hinv
    nh = jnp.abs(hzs)
    oh = jnp.maximum(wox * hxs + woy * hys + woz * hzs, 1e-6)

    dd = nh * nh * (alpha2 - 1.0) + 1.0
    ggx_d = alpha2 / jnp.maximum(PI * dd * dd, 1e-12)
    nvo = jnp.maximum(cos_o, 1e-6)
    nvi = jnp.maximum(cos_i_c, 1e-6)
    g1o = 2.0 * nvo / (nvo + jnp.sqrt(alpha2 + (1.0 - alpha2) * nvo * nvo))
    g1i = 2.0 * nvi / (nvi + jnp.sqrt(alpha2 + (1.0 - alpha2) * nvi * nvi))
    gg = g1o * g1i
    mfres = jnp.clip(1.0 - oh, 0.0, 1.0)
    fres5 = (mfres * mfres) ** 2 * mfres
    fr_r = f0r + (1.0 - f0r) * fres5
    fr_g = f0g + (1.0 - f0g) * fres5
    fr_b = f0b + (1.0 - f0b) * fres5

    spec_core = ggx_d * gg / jnp.maximum(4.0 * cos_o * cos_i_c, 1e-9) * cos_i_c
    diff_core = (1.0 - metallic) * (1.0 - transm) * cos_i_c / PI
    f_r = jnp.where(refl, fr_r * spec_core + base_r * diff_core, 0.0)
    f_g = jnp.where(refl, fr_g * spec_core + base_g * diff_core, 0.0)
    f_b = jnp.where(refl, fr_b * spec_core + base_b * diff_core, 0.0)

    pdf_diff = cos_i_c / PI
    pdf_spec = ggx_d * nh / jnp.maximum(4.0 * oh, 1e-9)
    pdf = jnp.where(refl, p_d * pdf_diff + p_g * pdf_spec, 0.0)
    inv_pdf = jnp.where(pdf > 1e-12, 1.0 / jnp.maximum(pdf, 1e-12), 0.0)
    bop_r = f_r * inv_pdf
    bop_g = f_g * inv_pdf
    bop_b = f_b * inv_pdf

    # transmission: straight through, Fresnel-weighted (render/bsdf.py)
    cos_o_c = jnp.maximum(cos_o, 0.0)
    mtr = jnp.clip(1.0 - cos_o_c, 0.0, 1.0)
    tr5 = (mtr * mtr) ** 2 * mtr
    inv_pt = jnp.where(p_t > 1e-12, 1.0 / jnp.maximum(p_t, 1e-12), 0.0)
    bop_r = jnp.where(pick_t, transm * (1.0 - (f0r + (1.0 - f0r) * tr5)) * inv_pt, bop_r)
    bop_g = jnp.where(pick_t, transm * (1.0 - (f0g + (1.0 - f0g) * tr5)) * inv_pt, bop_g)
    bop_b = jnp.where(pick_t, transm * (1.0 - (f0b + (1.0 - f0b) * tr5)) * inv_pt, bop_b)

    # (no jnp.where on booleans: Mosaic lacks i1 select)
    valid = (pick_t & (p_t > 0.0)) | (
        ~pick_t & (pdf > 1e-12) & (cos_i > 0.0) & (cos_o > 0.0))
    bop_r = jnp.where(valid, bop_r, 0.0)
    bop_g = jnp.where(valid, bop_g, 0.0)
    bop_b = jnp.where(valid, bop_b, 0.0)

    # world-space wi
    k2x = wix * t1x + wiy * t2x + wiz * nx
    k2y = wix * t1y + wiy * t2y + wiz * ny
    k2z = wix * t1z + wiy * t2z + wiz * nz

    tpx = jnp.where(hit, tpx * bop_r, tpx)
    tpy = jnp.where(hit, tpy * bop_g, tpy)
    tpz = jnp.where(hit, tpz * bop_b, tpz)

    # new origin with scale-adaptive offset along the (signed) geom normal
    osign = jnp.where(pick_t, -1.0, 1.0)
    ulp = jnp.float32(2.0 ** -16)
    feps = jnp.float32(1.0 / 65536.0)
    offx = gnx * osign * jnp.maximum(jnp.abs(posx) * ulp, feps)
    offy = gny * osign * jnp.maximum(jnp.abs(posy) * ulp, feps)
    offz = gnz * osign * jnp.maximum(jnp.abs(posz) * ulp, feps)
    ox = jnp.where(hit, posx + offx, ox)
    oy = jnp.where(hit, posy + offy, oy)
    oz = jnp.where(hit, posz + offz, oz)
    dx = jnp.where(hit, k2x, dx)
    dy = jnp.where(hit, k2y, dy)
    dz = jnp.where(hit, k2z, dz)

    # ---- termination: miss, absorb, throughput cutoff, russian roulette ----
    terminate = miss | (hit & ~valid)
    tp_len2 = tpx * tpx + tpy * tpy + tpz * tpz
    terminate = terminate | (alive & (tp_len2 < 1e-18))

    bounce = params_ref[P_BOUNCE]
    do_rr = alive & (bounce > params_ref[P_RR_OFFSET])
    rng_rr, k1 = _pcg_next(rng)
    rng = jnp.where(do_rr, rng_rr, rng)
    max_tp = jnp.maximum(tpx, jnp.maximum(tpy, tpz))
    p_rr = jnp.minimum(max_tp, params_ref[P_RR_INV_MIN])
    rr_kill = do_rr & (k1 > p_rr)
    rr_scale = jnp.where(do_rr & ~rr_kill, 1.0 / jnp.maximum(p_rr, 1e-20), 1.0)
    tpx, tpy, tpz = tpx * rr_scale, tpy * rr_scale, tpz * rr_scale
    terminate = terminate | rr_kill

    new_alive = alive & ~terminate

    out_ref[0] = ox
    out_ref[1] = oy
    out_ref[2] = oz
    out_ref[3] = dx
    out_ref[4] = dy
    out_ref[5] = dz
    out_ref[6] = tpx
    out_ref[7] = tpy
    out_ref[8] = tpz
    out_ref[9] = radx
    out_ref[10] = rady
    out_ref[11] = radz
    out_ref[12] = jax.lax.bitcast_convert_type(rng, jnp.float32)
    out_ref[13] = new_alive.astype(jnp.float32)
    out_ref[14] = state_ref[14]
    out_ref[15] = state_ref[15]


def pack_state(origins, dirs, rng, r_pad: int):
    """[R,3]x2 + [R] u32 -> [16, r_pad/128, 128] kernel state."""
    r = origins.shape[0]

    def comp(x, fill=0.0):
        x = jnp.pad(x, (0, r_pad - r), constant_values=fill)
        return x.reshape(r_pad // 128, 128)

    rows = [
        comp(origins[:, 0]), comp(origins[:, 1]), comp(origins[:, 2]),
        comp(dirs[:, 0]), comp(dirs[:, 1]), comp(dirs[:, 2]),
        comp(jnp.ones((r,), jnp.float32)), comp(jnp.ones((r,), jnp.float32)),
        comp(jnp.ones((r,), jnp.float32)),
        comp(jnp.zeros((r,), jnp.float32)), comp(jnp.zeros((r,), jnp.float32)),
        comp(jnp.zeros((r,), jnp.float32)),
        comp(jax.lax.bitcast_convert_type(rng, jnp.float32)),
        comp(jnp.ones((r,), jnp.float32)),  # alive (padding stays 0 = dead)
        comp(jnp.zeros((r,), jnp.float32)), comp(jnp.zeros((r,), jnp.float32)),
    ]
    return jnp.stack(rows, axis=0)


def unpack_radiance(state, r: int):
    rad = state[9:12]  # [3, r_pad/128, 128]
    flat = rad.reshape(3, -1)[:, :r]
    return flat.T  # [r, 3]


@partial(jax.jit, static_argnames=("n_tris", "n_mats"))
def bounce_step(params, scene: FusedScene, state, *, n_tris: int, n_mats: int):
    """One fused bounce over the whole ray state [16, R/128, 128]."""
    n_blocks = state.shape[1] // BLOCK_ROWS
    kernel = partial(_bounce_kernel, n_tris=n_tris, n_mats=n_mats)
    m, mc = scene.mats.shape
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            # triangle/attribute/material tables live in SMEM: the kernel
            # reads them as per-triangle SCALARS broadcast against the whole
            # ray block, and only SMEM supports dynamic scalar indexing
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((STATE_ROWS, BLOCK_ROWS, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((STATE_ROWS, BLOCK_ROWS, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(state.shape, jnp.float32),
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(params, scene.tris, scene.attrs, scene.mats, state)


def make_params(config, uniforms, bounce) -> jnp.ndarray:
    """Pack the per-bounce scalar parameters (SMEM vector)."""
    dome_mult = uniforms.dome_emission_multiplier
    return jnp.stack([
        dome_mult[0] * 0.0, dome_mult[1] * 0.0, dome_mult[2] * 0.0,  # bg (black)
        uniforms.rr_inv_min_term_prob,
        jnp.float32(config.rr_bounce_offset),
        bounce.astype(jnp.float32),
        jnp.exp2(uniforms.camera.sensor_exposure),
        jnp.float32(0.0),  # tmin
    ])
