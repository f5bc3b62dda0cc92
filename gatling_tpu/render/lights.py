"""Analytic light sampling for next event estimation.

Port of the reference's NEE light sampling (reference:
src/gi/shaders/rp_main.chit sampleLight:30-129): uniform pick among the four
analytic light types by global index, per-type area sampling with
area-measure inverse pdfs, identical math — but fully vectorized over the
ray batch, with all four type branches computed and selected (uniform
control flow beats divergence on the VPU).

Host-side light table construction mirrors hdGatling's light sync
(light.cpp:100-330): emission = color * intensity * 2^exposure /
normalizeFactor, transforms applied to radii/tangent frames.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from gatling_tpu.interface import LightArrays, empty_light_arrays
from gatling_tpu.ops.sampling import (
    PI,
    orthonormal_basis,
    safe_div,
    sample_disk,
    sample_sphere,
)
from gatling_tpu.scene.stage import LightDesc, transform_dir, transform_point


# ---------------------------------------------------------------------------
# host-side table construction (hdGatling light.cpp analog)
# ---------------------------------------------------------------------------

def _area_ellipsoid(rx: float, ry: float, rz: float) -> float:
    """Thomsen approximation (reference: light.cpp:36-45)."""
    p = 1.6
    ab, ac, bc = (rx * ry) ** p, (rx * rz) ** p, (ry * rz) ** p
    return ((ab + ac + bc) / 3.0) ** (1.0 / p) * 4.0 * math.pi


def _blackbody_rgb(t: float) -> np.ndarray:
    """UsdLuxBlackbodyTemperatureAsRgb analog: Planckian locus approximation,
    normalized to luminance 1 (same contract as pxr's implementation)."""
    # Krystek 1985 CIE 1960 UCS approximation
    t = float(np.clip(t, 1000.0, 15000.0))
    t2 = t * t
    u = (0.860117757 + 1.54118254e-4 * t + 1.28641212e-7 * t2) / (
        1.0 + 8.42420235e-4 * t + 7.08145163e-7 * t2)
    v = (0.317398726 + 4.22806245e-5 * t + 4.20481691e-8 * t2) / (
        1.0 - 2.89741816e-5 * t + 1.61456053e-7 * t2)
    # CIE 1960 -> xy -> XYZ (Y=1) -> linear sRGB
    x = 3.0 * u / (2.0 * u - 8.0 * v + 4.0)
    y = 2.0 * v / (2.0 * u - 8.0 * v + 4.0)
    X = x / y
    Z = (1.0 - x - y) / y
    xyz = np.array([X, 1.0, Z])
    m = np.array([
        [3.2409699419, -1.5373831776, -0.4986107603],
        [-0.9692436363, 1.8759675015, 0.0415550574],
        [0.0556300797, -0.2039769589, 1.0569715142],
    ])
    rgb = np.maximum(m @ xyz, 0.0)
    lum = 0.2126 * rgb[0] + 0.7152 * rgb[1] + 0.0722 * rgb[2]
    return (rgb / max(lum, 1e-9)).astype(np.float32)


def _base_emission(params: dict, normalize_factor: float) -> np.ndarray:
    """Reference: light.cpp:59-90 _CalcBaseEmission."""
    e = params["intensity"] * (2.0 ** params["exposure"]) / max(normalize_factor, 1e-20)
    emission = np.asarray(params["color"], np.float32) * e
    if params.get("enableColorTemperature"):
        emission = emission * _blackbody_rgb(params["colorTemperature"])
    return emission.astype(np.float32)


def build_light_arrays(lights: list[LightDesc], capacity: int = 8) -> LightArrays:
    """Pack LightDescs into the four dense light tables."""
    by_type: dict[str, list[LightDesc]] = {"sphere": [], "distant": [], "rect": [], "disk": []}
    for l in lights:
        if l.light_type == "simple":
            # HdSimpleLight approximation (reference light.cpp: "simple
            # light approximated"): a point-like sphere light at the prim
            # transform
            p = dict(l.params)
            p.setdefault("radius", 0.01)
            p.setdefault("normalize", True)
            l = type(l)(path=l.path, light_type="sphere",
                        transform=l.transform, params=p)
            by_type["sphere"].append(l)
        elif l.light_type in by_type:
            by_type[l.light_type].append(l)
    cap = max(capacity, *(len(v) for v in by_type.values()), 1)
    arrs = empty_light_arrays(cap)._asdict()

    for i, l in enumerate(by_type["sphere"]):
        m, p = l.transform, l.params
        pos = transform_point(m, [0, 0, 0])
        if p.get("explicit_frame"):
            # C-style API route (giSetSphereLightRadius): radii are given
            # directly, not extracted from an axis-aligned transform
            rx, ry, rz = (float(v) for v in p["radius_xyz"])
        else:
            r = p["radius"]
            rx = float(transform_dir(m, [r, 0, 0])[0])
            ry = float(transform_dir(m, [0, r, 0])[1])
            rz = float(transform_dir(m, [0, 0, r])[2])
        area = _area_ellipsoid(rx, ry, rz)
        norm = area if (p["normalize"] and area > 0) else 1.0
        if p.get("treatAsPoint"):
            rx = ry = rz = 0.0
            area = 0.0
        arrs["sphere_pos"] = arrs["sphere_pos"].at[i].set(jnp.asarray(pos, jnp.float32))
        arrs["sphere_radius"] = arrs["sphere_radius"].at[i].set(jnp.array([rx, ry, rz], jnp.float32))
        arrs["sphere_emission"] = arrs["sphere_emission"].at[i].set(jnp.asarray(_base_emission(p, norm)))
        arrs["sphere_area"] = arrs["sphere_area"].at[i].set(area)
        arrs["sphere_diff_spec"] = arrs["sphere_diff_spec"].at[i].set(jnp.array([p["diffuse"], p["specular"]], jnp.float32))
    arrs["sphere_count"] = jnp.int32(len(by_type["sphere"]))

    for i, l in enumerate(by_type["distant"]):
        m, p = l.transform, l.params
        if p.get("explicit_frame"):
            d = np.asarray(p["direction"], np.float64)
        else:
            # direction light travels: -Z through inverse-transpose (light.cpp:168-175)
            nrm_m = np.linalg.inv(m[:3, :3]).T
            d = np.asarray([0.0, 0.0, -1.0]) @ nrm_m
        d = d / np.linalg.norm(d)
        angle = math.radians(p["angle"])
        sin_half = math.sin(angle * 0.5)
        norm = (sin_half * sin_half * math.pi) if (sin_half > 1e-6 and p["normalize"]) else 1.0
        arrs["distant_dir"] = arrs["distant_dir"].at[i].set(jnp.asarray(d, jnp.float32))
        arrs["distant_angle"] = arrs["distant_angle"].at[i].set(angle)
        arrs["distant_emission"] = arrs["distant_emission"].at[i].set(jnp.asarray(_base_emission(p, norm)))
        arrs["distant_inv_pdf"] = arrs["distant_inv_pdf"].at[i].set(1.0)
        arrs["distant_diff_spec"] = arrs["distant_diff_spec"].at[i].set(jnp.array([p["diffuse"], p["specular"]], jnp.float32))
    arrs["distant_count"] = jnp.int32(len(by_type["distant"]))

    for i, l in enumerate(by_type["rect"]):
        m, p = l.transform, l.params
        origin = transform_point(m, [0, 0, 0])
        if p.get("explicit_frame"):
            # C-style API route (giSetRectLightTangents/Dimensions): the
            # frame is given directly, no axis-component extraction
            t0 = np.asarray(p["t0"], np.float64); t0 = t0 / np.linalg.norm(t0)
            t1 = np.asarray(p["t1"], np.float64); t1 = t1 / np.linalg.norm(t1)
            width = float(p["width"])
            height = float(p["height"])
        else:
            t0 = transform_dir(m, [1, 0, 0]); t0 = t0 / np.linalg.norm(t0)
            t1 = transform_dir(m, [0, 1, 0]); t1 = t1 / np.linalg.norm(t1)
            width = float(transform_dir(m, [p["width"], 0, 0])[0])
            height = float(transform_dir(m, [0, p["height"], 0])[1])
        area = width * height
        norm = area if (p["normalize"] and area > 0) else 1.0
        arrs["rect_origin"] = arrs["rect_origin"].at[i].set(jnp.asarray(origin, jnp.float32))
        arrs["rect_t0"] = arrs["rect_t0"].at[i].set(jnp.asarray(t0, jnp.float32))
        arrs["rect_t1"] = arrs["rect_t1"].at[i].set(jnp.asarray(t1, jnp.float32))
        arrs["rect_size"] = arrs["rect_size"].at[i].set(jnp.array([width, height], jnp.float32))
        arrs["rect_emission"] = arrs["rect_emission"].at[i].set(jnp.asarray(_base_emission(p, norm)))
        arrs["rect_diff_spec"] = arrs["rect_diff_spec"].at[i].set(jnp.array([p["diffuse"], p["specular"]], jnp.float32))
    arrs["rect_count"] = jnp.int32(len(by_type["rect"]))

    for i, l in enumerate(by_type["disk"]):
        m, p = l.transform, l.params
        origin = transform_point(m, [0, 0, 0])
        if p.get("explicit_frame"):
            t0 = np.asarray(p["t0"], np.float64); t0 = t0 / np.linalg.norm(t0)
            t1 = np.asarray(p["t1"], np.float64); t1 = t1 / np.linalg.norm(t1)
            rx, ry = (float(v) for v in p["radius_xy"])
        else:
            t0 = transform_dir(m, [1, 0, 0]); t0 = t0 / np.linalg.norm(t0)
            t1 = transform_dir(m, [0, 1, 0]); t1 = t1 / np.linalg.norm(t1)
            r = p["radius"]
            rx = float(transform_dir(m, [r, 0, 0])[0])
            ry = float(transform_dir(m, [0, r, 0])[1])
        area = rx * ry * math.pi
        norm = area if (p["normalize"] and area > 0) else 1.0
        arrs["disk_origin"] = arrs["disk_origin"].at[i].set(jnp.asarray(origin, jnp.float32))
        arrs["disk_t0"] = arrs["disk_t0"].at[i].set(jnp.asarray(t0, jnp.float32))
        arrs["disk_t1"] = arrs["disk_t1"].at[i].set(jnp.asarray(t1, jnp.float32))
        arrs["disk_radius"] = arrs["disk_radius"].at[i].set(jnp.array([rx, ry], jnp.float32))
        arrs["disk_emission"] = arrs["disk_emission"].at[i].set(jnp.asarray(_base_emission(p, norm)))
        arrs["disk_diff_spec"] = arrs["disk_diff_spec"].at[i].set(jnp.array([p["diffuse"], p["specular"]], jnp.float32))
    arrs["disk_count"] = jnp.int32(len(by_type["disk"]))

    return LightArrays(**arrs)


def total_light_count(lights: LightArrays) -> jnp.ndarray:
    return lights.sphere_count + lights.distant_count + lights.rect_count + lights.disk_count


# ---------------------------------------------------------------------------
# device-side NEE sampling (rp_main.chit sampleLight:30-129, vectorized)
# ---------------------------------------------------------------------------

def sample_light(
    lights: LightArrays,
    k4: jnp.ndarray,  # [R,4] uniforms
    surface_pos: jnp.ndarray,  # [R,3]
    light_intensity_multiplier: jnp.ndarray,  # scalar
    sensor_exposure: jnp.ndarray,  # scalar
):
    """Uniformly pick one light per ray and sample it.

    Returns (dir_to_light[R,3], dist[R], power[R,3], inv_pdf[R],
    diffuse_spec[R,2]). All four type branches are evaluated and selected.
    """
    s = lights.sphere_count.astype(jnp.float32)
    d = lights.distant_count.astype(jnp.float32)
    r = lights.rect_count.astype(jnp.float32)
    total = total_light_count(lights).astype(jnp.float32)

    pick = k4[:, 0] * total
    is_sphere = pick <= s
    is_distant = (~is_sphere) & (pick <= s + d)
    is_rect = (~is_sphere) & (~is_distant) & (pick <= s + d + r)
    # else disk

    def idx(count, cap):
        count_f = count.astype(jnp.float32)
        i = jnp.minimum((k4[:, 1] * count_f).astype(jnp.int32), count - 1)
        return jnp.clip(i, 0, cap - 1)

    # --- sphere (chit:33-53): area-measure invPdf with cos on the light
    si = idx(lights.sphere_count, lights.sphere_pos.shape[0])
    sp_pos = lights.sphere_pos[si]
    sp_sample = sp_pos + sample_sphere(k4[:, 2:4], lights.sphere_radius[si])
    sp_vec = sp_sample - surface_pos
    sp_dist = jnp.linalg.norm(sp_vec, axis=-1)
    sp_dir = safe_div(sp_vec, sp_dist[:, None])
    sp_nrm_len = jnp.linalg.norm(sp_sample - sp_pos, axis=-1)
    sp_nrm = safe_div(sp_sample - sp_pos, sp_nrm_len[:, None])
    sp_cos = jnp.maximum(0.0, -jnp.sum(sp_dir * sp_nrm, axis=-1))
    sp_area = lights.sphere_area[si]
    sp_inv_pdf = safe_div(jnp.where(sp_area > 0.0, sp_area * sp_cos, 1.0), sp_dist * sp_dist)
    sp_power = lights.sphere_emission[si]
    sp_ds = lights.sphere_diff_spec[si]

    # --- distant (chit:55-78): cone-perturbed fixed direction
    di = idx(lights.distant_count, lights.distant_dir.shape[0])
    dl_dir0 = -lights.distant_dir[di]
    phi = (k4[:, 2] * 2.0 * PI) - PI
    theta = k4[:, 3] * lights.distant_angle[di]
    t1b, t2b = orthonormal_basis(dl_dir0)
    perturbed = (
        jnp.sin(theta)[:, None] * (jnp.cos(phi)[:, None] * t1b + jnp.sin(phi)[:, None] * t2b)
        + jnp.cos(theta)[:, None] * dl_dir0)
    perturbed = perturbed / jnp.maximum(jnp.linalg.norm(perturbed, axis=-1, keepdims=True), 1e-20)
    dl_dir = jnp.where((lights.distant_angle[di] > 0.0)[:, None], perturbed, dl_dir0)
    dl_dist = jnp.full_like(sp_dist, 100000.0)
    dl_inv_pdf = lights.distant_inv_pdf[di]
    dl_power = lights.distant_emission[di]
    dl_ds = lights.distant_diff_spec[di]

    # --- rect (chit:80-105)
    ri = idx(lights.rect_count, lights.rect_origin.shape[0])
    r_size = lights.rect_size[ri]
    on_rect = (k4[:, 2:4] - 0.5) * r_size
    rt0 = lights.rect_t0[ri]
    rt1 = lights.rect_t1[ri]
    r_sample = lights.rect_origin[ri] + on_rect[:, 0:1] * rt0 + on_rect[:, 1:2] * rt1
    r_vec = r_sample - surface_pos
    r_dist = jnp.linalg.norm(r_vec, axis=-1)
    r_dir = safe_div(r_vec, r_dist[:, None])
    r_nrm = jnp.cross(rt1, rt0)  # light forward is -Z like UsdLux
    r_cos = jnp.maximum(0.0, -jnp.sum(r_dir * r_nrm, axis=-1))
    r_area = r_size[:, 0] * r_size[:, 1]
    r_inv_pdf = safe_div(jnp.where(r_area > 0.0, r_area * r_cos, 1.0), r_dist * r_dist)
    r_power = lights.rect_emission[ri]
    r_ds = lights.rect_diff_spec[ri]

    # --- disk (chit:107-127)
    ki = idx(lights.disk_count, lights.disk_origin.shape[0])
    k_rad = lights.disk_radius[ki]
    on_disk = sample_disk(k4[:, 2:4], k_rad)
    kt0 = lights.disk_t0[ki]
    kt1 = lights.disk_t1[ki]
    k_sample = lights.disk_origin[ki] + on_disk[:, 0:1] * kt0 + on_disk[:, 1:2] * kt1
    k_vec = k_sample - surface_pos
    k_dist = jnp.linalg.norm(k_vec, axis=-1)
    k_dir = safe_div(k_vec, k_dist[:, None])
    k_nrm = jnp.cross(kt1, kt0)
    k_cos = jnp.maximum(0.0, -jnp.sum(k_dir * k_nrm, axis=-1))
    k_area = k_rad[:, 0] * k_rad[:, 1] * PI
    k_inv_pdf = safe_div(jnp.where(k_area > 0.0, k_area * k_cos, 1.0), k_dist * k_dist)
    k_power = lights.disk_emission[ki]
    k_ds = lights.disk_diff_spec[ki]

    def sel(a, b, c, dd):
        m_s, m_d, m_r = is_sphere, is_distant, is_rect
        if a.ndim > 1:
            m_s, m_d, m_r = m_s[:, None], m_d[:, None], m_r[:, None]
        return jnp.where(m_s, a, jnp.where(m_d, b, jnp.where(m_r, c, dd)))

    dir_to_light = sel(sp_dir, dl_dir, r_dir, k_dir)
    dist = sel(sp_dist, dl_dist, r_dist, k_dist)
    power = sel(sp_power, dl_power, r_power, k_power) * light_intensity_multiplier
    inv_pdf = sel(sp_inv_pdf, dl_inv_pdf, r_inv_pdf, k_inv_pdf)
    diff_spec = sel(sp_ds, dl_ds, r_ds, k_ds)

    # chit:128-129: exposure + uniform type/count compensation
    power = power * jnp.exp2(sensor_exposure)
    inv_pdf = inv_pdf * total
    # no lights at all -> zero contribution
    none = total <= 0.0
    power = jnp.where(none, 0.0, power)
    return dir_to_light, dist, power, inv_pdf, diff_spec
