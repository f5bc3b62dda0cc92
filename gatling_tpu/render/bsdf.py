"""JAX-traceable BSDF evaluators behind the distilled MDL df interface.

The reference compiles each material through the MDL SDK into GLSL functions
(mdl_bsdf_scattering_{init,sample,evaluate,auxiliary}, mdl_edf_*,
mdl_cutout_opacity, ... — reference: src/mc/impl/Backend.cpp:38-50 DF_NAMES
and src/gi/impl/GlslShaderGen.cpp:181-193). Here the same interface is
provided by a single parameter-driven uber-BSDF covering the
UsdPreviewSurface/OpenPBR feature set: every ray gathers its material's
parameter record and all rays evaluate one fused vectorized shader — the
wavefront analog of the reference's per-material SBT hit groups.

Conventions (matching MDL semantics used by rp_main.chit):
* evaluate() returns bsdf_diffuse / bsdf_glossy with the projection cosine
  folded in, plus the sample pdf.
* sample() returns (k2, bsdf_over_pdf, event_type, pdf).
* auxiliary() returns diffuse+glossy albedo for the Albedo AOV.

Model: metallic-workflow microfacet BRDF — Lambert diffuse +
GGX/Smith specular with Schlick Fresnel, dielectric specular scaled by
ior-derived F0, plus straight-transmission "coverage" opacity like the
UsdPreviewSurface MaterialX mapping.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gatling_tpu.interface import (
    BSDF_EVENT_ABSORB,
    BSDF_EVENT_DIFFUSE_REFLECTION,
    BSDF_EVENT_GLOSSY_REFLECTION,
    BSDF_EVENT_SPECULAR_TRANSMISSION,
)
from gatling_tpu.ops.sampling import PI, luminance, safe_div


class BsdfParams(NamedTuple):
    """Per-ray resolved material parameters (post texture lookup)."""

    base_color: jnp.ndarray  # [...,3]
    metallic: jnp.ndarray  # [...]
    roughness: jnp.ndarray  # [...]
    ior: jnp.ndarray  # [...]
    opacity: jnp.ndarray  # [...] coverage
    opacity_threshold: jnp.ndarray  # [...] cutout threshold (0 = blend)
    emissive: jnp.ndarray  # [...,3] emitted radiance
    # specular workflow (UsdPreviewSurface useSpecularWorkflow=1)
    use_specular_workflow: jnp.ndarray  # [...] 0/1
    specular_color: jnp.ndarray  # [...,3]
    # transmission for glass-like OpenPBR materials
    transmission: jnp.ndarray  # [...]
    thin_walled: jnp.ndarray  # [...] bool
    # volume coefficients (mdl_volume_absorption/scattering_coefficient)
    volume_absorption: jnp.ndarray  # [...,3] sigma_a
    volume_scattering: jnp.ndarray  # [...,3] sigma_s
    volume_bias: jnp.ndarray  # [...] Henyey-Greenstein g (directional bias)
    # backface EDF trait (reference: Frontend.cpp _HasCompiledMaterialBackfaceEdf;
    # the evaluator reuses the front EDF values — distinct backface expressions
    # would need per-material MDL compilation)
    backface_edf: jnp.ndarray  # [...] 0/1


MIN_ALPHA = 1e-3  # roughness^2 floor to keep GGX sampleable in fp32


def _f0(p: BsdfParams) -> jnp.ndarray:
    """Normal-incidence reflectance."""
    dielectric = ((p.ior - 1.0) / (p.ior + 1.0)) ** 2
    f0_metal_workflow = (
        dielectric[..., None] * (1.0 - p.metallic[..., None])
        + p.base_color * p.metallic[..., None]
    )
    return jnp.where(p.use_specular_workflow[..., None] > 0.5, p.specular_color, f0_metal_workflow)


def _schlick(f0: jnp.ndarray, cos_theta: jnp.ndarray) -> jnp.ndarray:
    m = jnp.clip(1.0 - cos_theta, 0.0, 1.0)
    return f0 + (1.0 - f0) * (m * m) ** 2 * m


def _ggx_d(alpha2: jnp.ndarray, nh: jnp.ndarray) -> jnp.ndarray:
    d = nh * nh * (alpha2 - 1.0) + 1.0
    return alpha2 / jnp.maximum(PI * d * d, 1e-12)


def _smith_g1(alpha2: jnp.ndarray, nv: jnp.ndarray) -> jnp.ndarray:
    nv = jnp.maximum(nv, 1e-6)
    return 2.0 * nv / (nv + jnp.sqrt(alpha2 + (1.0 - alpha2) * nv * nv))


def _lobe_weights(p: BsdfParams, f0: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One-sample-MIS lobe selection probabilities (diffuse, glossy, transmission)."""
    w_d = luminance(p.base_color) * (1.0 - p.metallic) * (1.0 - p.transmission)
    w_g_raw = luminance(f0)
    w_g = jnp.where(w_g_raw > 0.0, jnp.maximum(w_g_raw, 0.04), 0.0)
    w_t = p.transmission
    total = w_d + w_g + w_t
    return safe_div(w_d, total), safe_div(w_g, total), safe_div(w_t, total)


def _to_local(v: jnp.ndarray, t: jnp.ndarray, b: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([
        jnp.sum(v * t, axis=-1), jnp.sum(v * b, axis=-1), jnp.sum(v * n, axis=-1)
    ], axis=-1)


def _from_local(v: jnp.ndarray, t: jnp.ndarray, b: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    return v[..., 0:1] * t + v[..., 1:2] * b + v[..., 2:3] * n


def _eval_lobes(p: BsdfParams, wo_l: jnp.ndarray, wi_l: jnp.ndarray):
    """Evaluate diffuse+glossy reflection lobes in local (tangent) space.

    Returns (f_diffuse*cos, f_glossy*cos, pdf) for the reflection hemisphere.
    """
    f0 = _f0(p)
    alpha = jnp.maximum(p.roughness * p.roughness, MIN_ALPHA)
    alpha2 = alpha * alpha

    cos_o = wo_l[..., 2]
    cos_i = wi_l[..., 2]
    refl = (cos_o > 0.0) & (cos_i > 0.0)
    cos_i_c = jnp.maximum(cos_i, 0.0)

    h = wo_l + wi_l
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
    nh = jnp.abs(h[..., 2])
    oh = jnp.maximum(jnp.sum(wo_l * h, axis=-1), 1e-6)

    d = _ggx_d(alpha2, nh)
    g = _smith_g1(alpha2, cos_o) * _smith_g1(alpha2, cos_i_c)
    fr = _schlick(f0, oh[..., None])

    spec = fr * (d * g / jnp.maximum(4.0 * cos_o * cos_i_c, 1e-9))[..., None]
    f_glossy = jnp.where(refl[..., None], spec * cos_i_c[..., None], 0.0)

    diff_albedo = p.base_color * ((1.0 - p.metallic) * (1.0 - p.transmission))[..., None]
    f_diffuse = jnp.where(refl[..., None], diff_albedo * (cos_i_c / PI)[..., None], 0.0)

    pdf_diff = cos_i_c / PI
    pdf_spec = d * nh / jnp.maximum(4.0 * oh, 1e-9)
    p_d, p_g, _ = _lobe_weights(p, f0)
    pdf = jnp.where(refl, p_d * pdf_diff + p_g * pdf_spec, 0.0)
    return f_diffuse, f_glossy, pdf


def evaluate(p: BsdfParams, wo: jnp.ndarray, wi: jnp.ndarray,
             n: jnp.ndarray, t: jnp.ndarray, b: jnp.ndarray):
    """mdl_bsdf_scattering_evaluate analog: (bsdf_diffuse, bsdf_glossy, pdf)."""
    wo_l = _to_local(wo, t, b, n)
    wi_l = _to_local(wi, t, b, n)
    return _eval_lobes(p, wo_l, wi_l)


def sample(p: BsdfParams, wo: jnp.ndarray, n: jnp.ndarray, t: jnp.ndarray,
           b: jnp.ndarray, xi: jnp.ndarray):
    """mdl_bsdf_scattering_sample analog.

    Returns (k2[...,3], bsdf_over_pdf[...,3], event_type[...] int32, pdf[...]).
    """
    wo_l = _to_local(wo, t, b, n)
    f0 = _f0(p)
    p_d, p_g, p_t = _lobe_weights(p, f0)
    alpha = jnp.maximum(p.roughness * p.roughness, MIN_ALPHA)
    alpha2 = alpha * alpha

    sel = xi[..., 0]
    pick_d = sel < p_d
    pick_g = (~pick_d) & (sel < p_d + p_g)
    pick_t = (~pick_d) & (~pick_g)

    # diffuse: cosine hemisphere
    a = jnp.sqrt(jnp.clip(xi[..., 1], 0.0, 1.0))
    phi_d = 2.0 * PI * xi[..., 2]
    wi_diff = jnp.stack([
        a * jnp.cos(phi_d), a * jnp.sin(phi_d),
        jnp.sqrt(jnp.maximum(0.0, 1.0 - xi[..., 1]))], axis=-1)

    # glossy: GGX NDF half-vector sample, reflect
    u = xi[..., 1]
    cos2h = (1.0 - u) / jnp.maximum(1.0 + (alpha2 - 1.0) * u, 1e-12)
    cos_h = jnp.sqrt(jnp.clip(cos2h, 0.0, 1.0))
    sin_h = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos2h))
    phi_g = 2.0 * PI * xi[..., 2]
    h = jnp.stack([sin_h * jnp.cos(phi_g), sin_h * jnp.sin(phi_g), cos_h], axis=-1)
    wi_spec = 2.0 * jnp.sum(wo_l * h, axis=-1, keepdims=True) * h - wo_l

    wi_l = jnp.where(pick_d[..., None], wi_diff, wi_spec)
    # transmission: straight through (coverage/glass-thin model)
    wi_l = jnp.where(pick_t[..., None], -wo_l, wi_l)

    f_diffuse, f_glossy, pdf = _eval_lobes(p, wo_l, wi_l)
    f_total = f_diffuse + f_glossy
    bsdf_over_pdf = safe_div(f_total, pdf[..., None])

    # transmission lobe is a delta: straight pass-through weighted by the
    # transmitted Fresnel fraction (energy conservation with the glossy lobe)
    cos_o_c = jnp.maximum(wo_l[..., 2], 0.0)
    trans_weight = p.transmission[..., None] * (1.0 - _schlick(f0, cos_o_c[..., None]))
    bsdf_over_pdf = jnp.where(
        pick_t[..., None], safe_div(trans_weight, p_t[..., None]), bsdf_over_pdf
    )

    valid = jnp.where(pick_t, p_t > 0.0, (pdf > 1e-12) & (wi_l[..., 2] > 0.0) & (wo_l[..., 2] > 0.0))
    event = jnp.where(
        pick_d, BSDF_EVENT_DIFFUSE_REFLECTION,
        jnp.where(pick_g, BSDF_EVENT_GLOSSY_REFLECTION, BSDF_EVENT_SPECULAR_TRANSMISSION))
    event = jnp.where(valid, event, BSDF_EVENT_ABSORB).astype(jnp.int32)
    bsdf_over_pdf = jnp.where(valid[..., None], bsdf_over_pdf, 0.0)

    k2 = _from_local(wi_l, t, b, n)
    return k2, bsdf_over_pdf, event, pdf


def auxiliary(p: BsdfParams, wo: jnp.ndarray, n: jnp.ndarray):
    """mdl_bsdf_scattering_auxiliary analog: albedo_diffuse + albedo_glossy
    (used by the Albedo AOV, rp_main.chit:268-290)."""
    f0 = _f0(p)
    cos_o = jnp.maximum(jnp.sum(wo * n, axis=-1), 0.0)
    albedo_diffuse = p.base_color * ((1.0 - p.metallic) * (1.0 - p.transmission))[..., None]
    albedo_glossy = _schlick(f0, cos_o[..., None])
    return albedo_diffuse + albedo_glossy


def edf_emission(p: BsdfParams) -> jnp.ndarray:
    """mdl_edf_emission_evaluate * intensity analog: emitted radiance."""
    return p.emissive


def cutout_opacity(p: BsdfParams) -> jnp.ndarray:
    """mdl_cutout_opacity analog. With a positive opacityThreshold the
    cutout is binary (UsdPreviewSurface spec); otherwise the opacity value
    itself is the stochastic pass probability (rp_main.ahit:35-61)."""
    binary = (p.opacity >= p.opacity_threshold).astype(jnp.float32)
    return jnp.where(p.opacity_threshold > 0.0, binary, p.opacity)
