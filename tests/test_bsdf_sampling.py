"""BSDF sampler correctness, pinned hard (round-3 tightening of the loose
statistical fused checks flagged by the round-1 review):

1. importance-sampling identities — for ANY sampler that agrees with its
   reported pdf, E[g(wi)/pdf(wi)] over samples equals the hemisphere
   integral of g; g=1 and g=cos pin both the distribution and the pdf
   normalization to closed forms (2*pi and pi).
2. the fused shade kernel's BSDF sampling must reproduce render/bsdf.py
   EXACTLY (same RNG stream, same Duff ONB): shade_step in interpret mode
   vs bsdf.sample on identical inputs, compared elementwise.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from gatling_tpu.ops import sampling as smp
from gatling_tpu.render import bsdf as bsdf_mod
from gatling_tpu.render.material import build_material_table, lower_material


def _params(n, **over):
    m = lower_material(None)
    m.params.update(over)
    table = build_material_table([m])
    from gatling_tpu.render.material import gather_params

    return gather_params(table, jnp.zeros((n,), jnp.int32))


def _sample_cloud(p, wo, n_vec, n_samples, seed=3):
    rng = smp.rng_init(jnp.arange(n_samples, dtype=jnp.uint32),
                       jnp.uint32(seed))
    rng, x0 = smp.rng_next1f(rng)
    rng, x1 = smp.rng_next1f(rng)
    rng, x2 = smp.rng_next1f(rng)
    rng, x3 = smp.rng_next1f(rng)
    xi = jnp.stack([x0, x1, x2, x3], axis=-1)
    t, b = smp.orthonormal_basis(n_vec)
    return bsdf_mod.sample(p, wo, n_vec, t, b, xi)


def test_sampler_pdf_identities():
    """E[1/pdf] = 2*pi and E[cos/pdf] = pi over the upper hemisphere, for
    diffuse-heavy, glossy and mixed parameter sets. A sampler whose draws
    do not follow its reported pdf fails these identities."""
    n = 1 << 18
    wo = jnp.broadcast_to(
        jnp.asarray([0.3, -0.2, 0.95]) / np.linalg.norm([0.3, -0.2, 0.95]),
        (n, 3)).astype(jnp.float32)
    nv = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 3))

    for over in (
        dict(base_color=(0.8, 0.8, 0.8), roughness=1.0, metallic=0.0, ior=1.0),
        dict(base_color=(0.9, 0.7, 0.3), roughness=0.35, metallic=1.0),
        dict(base_color=(0.5, 0.5, 0.5), roughness=0.5, metallic=0.4),
        # clearcoat over diffuse (VERDICT r3 item 3)
        dict(base_color=(0.6, 0.6, 0.6), roughness=0.6, metallic=0.0,
             clearcoat=1.0, clearcoat_roughness=0.2),
        # anisotropic metal, rotated tangent frame (the absorbed-sample
        # clipping bias grows with below-horizon lobe mass, so moderate
        # anisotropy here — the identity itself is exact for valid draws)
        dict(base_color=(0.9, 0.8, 0.6), roughness=0.3, metallic=1.0,
             anisotropy=0.5, anisotropy_rotation=0.15),
    ):
        p = _params(n, **over)
        k2, _bop, event, pdf = _sample_cloud(p, wo, nv, n)
        valid = np.asarray(event) != bsdf_mod.BSDF_EVENT_ABSORB
        pdf = np.asarray(pdf)
        assert valid.mean() > 0.95  # reflection-only params rarely absorb
        inv = np.where(valid, 1.0 / np.maximum(pdf, 1e-12), 0.0)
        cosw = np.where(valid, np.asarray(k2)[:, 2], 0.0)
        # E[g/pdf] over ALL draws (absorbed contribute 0, biasing DOWN both
        # integrals by the same small fraction; compare against the valid
        # fraction times the closed form)
        frac = valid.mean()
        np.testing.assert_allclose(inv.mean(), 2 * np.pi * frac, rtol=0.05)
        np.testing.assert_allclose((inv * cosw).mean(), np.pi * frac,
                                   rtol=0.05)


def test_shade_kernel_matches_bsdf_py():
    """shade_step's in-kernel BSDF sampling vs bsdf.sample: same RNG
    stream, same Duff ONB -> identical directions and throughputs (to f32
    arithmetic-order noise). This is the exact-consistency check the
    mean/corr image tests cannot provide."""
    from gatling_tpu.ops.pallas_bounce import (
        FusedScene, FusedStatic, H_DS, H_FRONT, H_GN, H_HIT, H_MAT, H_N,
        H_POS, H_T, HIT_ROWS, TRI_ROWS, shade_step, slim_param_rows,
        make_params,
    )
    from gatling_tpu.render.integrator import RenderConfig, Uniforms
    from gatling_tpu.render.camera import CameraUniforms
    from gatling_tpu.interface import AovId, aov_bit

    rng0 = np.random.default_rng(11)
    n = 1024  # one 8-row block
    nb = 8

    # crafted hits: random unit normals (z>0.2 in world), random incoming dirs
    nrm = rng0.standard_normal((n, 3))
    nrm[:, 2] = np.abs(nrm[:, 2]) + 0.4
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    din = rng0.standard_normal((n, 3))
    # incoming toward the surface: make dot(d, n) < 0
    flip = (din * nrm).sum(1) > 0
    din[flip] = -din[flip]
    din /= np.linalg.norm(din, axis=1, keepdims=True)
    pos = rng0.standard_normal((n, 3)).astype(np.float32)
    org = (pos - din * 2.0).astype(np.float32)
    seeds = rng0.integers(1, 2**31, size=n, dtype=np.int64).astype(np.uint32)

    mats = [lower_material(None) for _ in range(3)]
    mats[0].params.update(base_color=(0.7, 0.3, 0.2), roughness=0.8)
    mats[1].params.update(base_color=(0.9, 0.8, 0.6), roughness=0.25,
                          metallic=1.0)
    mats[2].params.update(base_color=(0.2, 0.5, 0.9), roughness=0.5,
                          metallic=0.3)
    table = build_material_table(mats)
    mat_id = rng0.integers(0, 3, size=n)

    state = np.zeros((16, nb, 128), np.float32)
    state[0:3] = org.T.reshape(3, nb, 128)
    state[3:6] = din.T.reshape(3, nb, 128)
    state[6:9] = 1.0  # throughput
    state[12] = seeds.view(np.float32).reshape(nb, 128)
    state[13] = 1.0  # alive

    hit = np.zeros((HIT_ROWS, nb, 128), np.float32)
    hit[H_HIT] = 1.0
    hit[H_T] = 2.0
    hit[H_MAT] = mat_id.reshape(nb, 128)
    hit[H_GN:H_GN + 3] = nrm.T.reshape(3, nb, 128)
    hit[H_N:H_N + 3] = nrm.T.reshape(3, nb, 128)
    hit[H_FRONT] = 1.0
    hit[H_DS] = 1.0
    hit[H_POS:H_POS + 3] = pos.T.reshape(3, nb, 128)

    static = FusedStatic(n_tris=4, n_mats=3, n_clusters=0, n_l1=1,
                         light_types=(), block_rows=nb)
    scene = FusedScene(
        tris=jnp.zeros((TRI_ROWS, 4), jnp.float32),
        mats=jnp.asarray(table.packed_f),
        lights=jnp.zeros((1, 20), jnp.float32),
        l1_aabbs=jnp.zeros((8, 1), jnp.float32),
        l2_aabbs=jnp.zeros((8, 1), jnp.float32))
    parbuf = jnp.zeros((slim_param_rows(()), nb, 128), jnp.float32)

    config = RenderConfig(width=32, height=32, spp=1, max_bounces=8,
                          rr_bounce_offset=3, aov_mask=aov_bit(AovId.COLOR))
    uni = Uniforms(
        camera=CameraUniforms(
            position=jnp.zeros(3), forward=jnp.asarray([0., 0., -1.]),
            up=jnp.asarray([0., 1., 0.]), vfov=jnp.float32(1.0),
            lens_radius=jnp.float32(0), focus_distance=jnp.float32(0),
            sensor_exposure=jnp.float32(0), clip_start=jnp.float32(0.01),
            clip_end=jnp.float32(100.0)),
        sample_offset=jnp.int32(0), inv_total_sample_count=jnp.float32(1),
        max_sample_value=jnp.float32(10),
        rr_inv_min_term_prob=jnp.float32(0.95),
        light_intensity_multiplier=jnp.float32(1),
        meters_per_scene_unit=jnp.float32(1),
        max_volume_walk_length=jnp.int32(7),
        dome_rotation=jnp.asarray([0, 0, 0, 1.0], jnp.float32),
        dome_emission_multiplier=jnp.ones(3, jnp.float32),
        dome_diffuse_specular=jnp.ones(2, jnp.float32))
    params = make_params(config, uni, jnp.int32(0))  # bounce 0: no RR

    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(shade_step(params, scene, jnp.asarray(state),
                                    jnp.asarray(hit), parbuf,
                                    static=static, nee=False))

    # expected via render/bsdf.py with the same stream and Duff frame
    from gatling_tpu.render.material import gather_params

    rng = jnp.asarray(seeds)
    rng, x0 = smp.rng_next1f(rng)
    rng, x1 = smp.rng_next1f(rng)
    rng, x2 = smp.rng_next1f(rng)
    rng, _x3 = smp.rng_next1f(rng)
    xi = jnp.stack([x0, x1, x2], axis=-1)
    p = gather_params(table, jnp.asarray(mat_id, jnp.int32))
    nv = jnp.asarray(nrm, jnp.float32)
    t, b = smp.orthonormal_basis(nv)
    wo = -jnp.asarray(din, jnp.float32)
    k2, bop, event, _pdf = bsdf_mod.sample(p, wo, nv, t, b, xi)

    valid = np.asarray(event) != bsdf_mod.BSDF_EVENT_ABSORB
    out_dir = out[3:6].reshape(3, -1).T
    out_tp = out[6:9].reshape(3, -1).T
    out_alive = out[13].reshape(-1) > 0.5

    assert valid.mean() > 0.9
    # absorbed rays must terminate; valid rays survive with matching
    # direction and throughput
    np.testing.assert_array_equal(out_alive, valid)
    np.testing.assert_allclose(out_dir[valid], np.asarray(k2)[valid],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(out_tp[valid], np.asarray(bop)[valid],
                               rtol=2e-4, atol=2e-5)


def test_refraction_snell_and_tir():
    """Thick-dielectric transmission bends by Snell's law; beyond the
    critical angle from the dense side, TIR reflects every sample
    (reference: OmniGlass lowers to df::specular_bsdf scatter_transmit,
    Backend.cpp DF set)."""
    n = 1 << 14
    nv = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 3))
    # smooth glass, entering at 45 degrees
    p = _params(n, transmission=1.0, ior=1.5, roughness=0.0,
                base_color=(0.0, 0.0, 0.0))
    wo = jnp.broadcast_to(jnp.asarray(
        [np.sin(np.pi / 4), 0.0, np.cos(np.pi / 4)], jnp.float32), (n, 3))
    k2, bop, event, _ = _sample_cloud(p, wo, nv, n)
    k2 = np.asarray(k2)
    ev = np.asarray(event)
    refr = (ev & bsdf_mod.BSDF_EVENT_TRANSMISSION if False else
            ev == 10)  # BSDF_EVENT_SPECULAR_TRANSMISSION value resolved below
    from gatling_tpu.interface import (BSDF_EVENT_GLOSSY_REFLECTION,
                                       BSDF_EVENT_SPECULAR_TRANSMISSION)

    refr = ev == BSDF_EVENT_SPECULAR_TRANSMISSION
    assert refr.mean() > 0.7  # F(45deg, 1.5) ~ 0.05 -> mostly refraction
    # Snell: sin(theta_t) = sin(45)/1.5
    sin_t = np.sqrt(np.clip(k2[refr, 0] ** 2 + k2[refr, 1] ** 2, 0, 1))
    # MIN_ALPHA floors the smooth interface at alpha=1e-3: the half-vector
    # tail tilts a small fraction of samples, so pin the median + mean
    expect = np.sin(np.pi / 4) / 1.5
    assert abs(np.median(sin_t) - expect) < 1e-3
    assert np.abs(sin_t - expect).mean() < 5e-3
    assert (k2[refr, 2] < 0).all()  # transmitted below the surface

    # dense side beyond the critical angle: sin(c) = 1/1.5 -> c ~ 41.8 deg;
    # leave at 60 degrees from inside -> TIR (all reflect)
    wo60 = jnp.broadcast_to(jnp.asarray(
        [np.sin(np.pi / 3), 0.0, np.cos(np.pi / 3)], jnp.float32), (n, 3))
    k2b, _, ev_b, _ = _sample_cloud(p, wo60, nv, n, seed=5)
    # front=False: exiting the medium
    t, b = smp.orthonormal_basis(nv)
    rng = smp.rng_init(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(7))
    xs = []
    for _ in range(4):
        rng, x = smp.rng_next1f(rng)
        xs.append(x)
    xi = jnp.stack(xs, axis=-1)
    k2c, bopc, evc, _ = bsdf_mod.sample(
        p, wo60, nv, t, b, xi, front=jnp.zeros((n,), bool))
    evc = np.asarray(evc)
    picked_t = evc != bsdf_mod.BSDF_EVENT_ABSORB
    # every transmission pick must have become a (total internal) reflection
    assert (evc[picked_t] == BSDF_EVENT_GLOSSY_REFLECTION).all()
    assert (np.asarray(k2c)[picked_t, 2] > 0).all()


def test_refraction_energy_conservation():
    """White smooth glass in a furnace: mean weight of the transmission
    lobe (reflect + refract branches) stays within a few percent of 1."""
    n = 1 << 16
    nv = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 3))
    p = _params(n, transmission=1.0, ior=1.5, roughness=0.05)
    # cosine-distributed view directions
    rng = smp.rng_init(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(11))
    rng, u1 = smp.rng_next1f(rng)
    rng, u2 = smp.rng_next1f(rng)
    r = jnp.sqrt(u1)
    phi = 2 * np.pi * u2
    wo = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi),
                    jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))], axis=-1)
    k2, bop, event, _ = _sample_cloud(p, wo, nv, n, seed=13)
    valid = np.asarray(event) != bsdf_mod.BSDF_EVENT_ABSORB
    w = np.asarray(bop)[:, 0]
    assert valid.mean() > 0.98
    mean_w = w[valid].mean()
    assert 0.9 < mean_w <= 1.02, mean_w


def test_clearcoat_darkens_base_and_adds_highlight():
    """Coat Fresnel attenuates the base diffuse; the coat lobe adds a white
    specular highlight (evaluate-level check, drives NEE correctness)."""
    n = 4
    p0 = _params(n, base_color=(0.8, 0.2, 0.2), roughness=0.8)
    pc = _params(n, base_color=(0.8, 0.2, 0.2), roughness=0.8,
                 clearcoat=1.0, clearcoat_roughness=0.1)
    nv = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 3))
    t, b = smp.orthonormal_basis(nv)
    wo = jnp.broadcast_to(jnp.asarray([0.4, 0.0, 0.9165151], jnp.float32), (n, 3))
    # mirror direction: strong coat highlight
    wi_mirror = jnp.broadcast_to(jnp.asarray([-0.4, 0.0, 0.9165151], jnp.float32), (n, 3))
    d0, g0, _ = bsdf_mod.evaluate(p0, wo, wi_mirror, nv, t, b)
    dc, gc, _ = bsdf_mod.evaluate(pc, wo, wi_mirror, nv, t, b)
    assert float(dc[0, 0]) < float(d0[0, 0])  # coat attenuates diffuse
    assert float(gc[0, 2]) > float(g0[0, 2]) + 1e-3  # white highlight (blue up)


def test_anisotropy_stretches_highlight():
    """Anisotropic GGX: the NDF value at a half-vector tilted along x vs y
    differs; rotation by a quarter turn swaps the axes."""
    n = 1
    pa = _params(n, roughness=0.4, metallic=1.0, base_color=(1.0, 1.0, 1.0),
                 anisotropy=0.9)
    nv = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    t, b = smp.orthonormal_basis(nv)
    wo = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    tilt = 0.3
    wi_x = jnp.asarray([[np.sin(2 * tilt), 0.0, np.cos(2 * tilt)]], jnp.float32)
    wi_y = jnp.asarray([[0.0, np.sin(2 * tilt), np.cos(2 * tilt)]], jnp.float32)
    _, gx, _ = bsdf_mod.evaluate(pa, wo, wi_x, nv, t, b)
    _, gy, _ = bsdf_mod.evaluate(pa, wo, wi_y, nv, t, b)
    # ax > ay: rough along local x -> broader (dimmer peak? at tilt away
    # from specular the x-axis lobe keeps more energy)
    assert not np.allclose(float(gx[0, 0]), float(gy[0, 0]), rtol=0.05)
    # quarter-turn rotation swaps the axes
    pr = _params(n, roughness=0.4, metallic=1.0, base_color=(1.0, 1.0, 1.0),
                 anisotropy=0.9, anisotropy_rotation=0.25)
    _, gxr, _ = bsdf_mod.evaluate(pr, wo, wi_x, nv, t, b)
    _, gyr, _ = bsdf_mod.evaluate(pr, wo, wi_y, nv, t, b)
    np.testing.assert_allclose(float(gxr[0, 0]), float(gy[0, 0]), rtol=1e-4)
    np.testing.assert_allclose(float(gyr[0, 0]), float(gx[0, 0]), rtol=1e-4)


def test_omniglass_refracts_and_tints_via_volume():
    """OmniGlass (bundled MDL) lowers onto the refractive lobe: a thick
    glass slab in front of an emissive wall bends light and tints it by
    Beer-Lambert absorption; the wall stays visible (VERDICT r3 item 3)."""
    import numpy as np

    from gatling_tpu.interface import empty_light_arrays
    from gatling_tpu.render.integrator import (RenderConfig, default_dome,
                                               render_pixels)
    from gatling_tpu.render.material import (build_material_table,
                                             lower_material)
    from gatling_tpu.render.mdl import load_mdl_material
    from gatling_tpu.ops.geometry import build_geometry
    from gatling_tpu.scene.stage import MeshDesc
    from tests.test_volumes import _quad, _uniforms
    import functools
    import jax

    glass = lower_material(load_mdl_material(
        "OmniGlass.mdl", "OmniGlass",
        {"glass_color": (0.4, 0.8, 0.9), "glass_ior": 1.5}))
    assert glass.params["transmission"] == 1.0
    assert not glass.params["thin_walled"]

    wall = lower_material(None)
    wall.params.update(emissive=(1.0, 1.0, 1.0), base_color=(0, 0, 0))
    meshes = [
        # glass pane: front + back quads form a slab (enter + exit)
        MeshDesc(path="/g0", mesh=_quad(1.0), transform=np.eye(4),
                 material="glass", double_sided=True, object_id=0),
        MeshDesc(path="/g1", mesh=_quad(0.8), transform=np.eye(4),
                 material="glass", double_sided=True, object_id=1),
        MeshDesc(path="/wall", mesh=_quad(-3.0), transform=np.eye(4),
                 material="wall", double_sided=True, object_id=2),
    ]
    midx = {"glass": 0, "wall": 1, None: 2}
    geom = build_geometry(meshes, midx)
    table = build_material_table([glass, wall, lower_material(None)])
    cfg = RenderConfig(width=8, height=8, spp=16, max_bounces=6,
                       jittered=False, fis=False, has_volumes=True,
                       rr_bounce_offset=100)
    n = 64
    pix = jnp.arange(n, dtype=jnp.int32)
    fn = jax.jit(functools.partial(render_pixels, cfg), static_argnames=("spp",))
    res = fn(_uniforms(), geom, table, empty_light_arrays(), default_dome(),
             pix, spp=16, sample_offset=jnp.int32(0))
    img = np.asarray(res.color).reshape(8, 8, 3)
    center = img[2:-2, 2:-2].mean(axis=(0, 1))
    # wall visible through the glass; blue-green absorption tint (r < b)
    assert center.mean() > 0.3
    assert center[0] < center[2] - 0.02
