"""Cutout transparency tests (reference: rp_main.ahit stochastic cutout)."""

import numpy as np
import jax.numpy as jnp

from gatling_tpu.interface import empty_light_arrays
from gatling_tpu.ops.geometry import build_geometry
from gatling_tpu.render.integrator import RenderConfig, default_dome, trace_sample
from gatling_tpu.render.material import (
    LoweredMaterial,
    MaterialTraits,
    _DEFAULTS,
    build_material_table,
    lower_material,
)
from gatling_tpu.scene.meshproc import build_triangulated_mesh
from gatling_tpu.scene.stage import MeshDesc
from tests.test_volumes import _quad, _uniforms


def _cutout_scene(opacity: float, threshold: float = 0.0):
    """Half-transparent screen at z=1 in front of an emissive wall at z=-3."""
    meshes = [
        MeshDesc(path="/screen", mesh=_quad(1.0), transform=np.eye(4),
                 material="screen", double_sided=True, object_id=0),
        MeshDesc(path="/wall", mesh=_quad(-3.0), transform=np.eye(4),
                 material="wall", double_sided=True, object_id=1),
    ]
    midx = {"screen": 0, "wall": 1, None: 2}
    geom = build_geometry(meshes, midx)
    screen = LoweredMaterial(params=dict(_DEFAULTS), traits=MaterialTraits(has_cutout=True), textures={})
    screen.params.update(opacity=opacity, opacity_threshold=threshold,
                         base_color=(0.0, 0.0, 0.0))
    wall = LoweredMaterial(params=dict(_DEFAULTS), traits=MaterialTraits(), textures={})
    wall.params.update(emissive=(1.0, 1.0, 1.0), base_color=(0.0, 0.0, 0.0))
    table = build_material_table([screen, wall, lower_material(None)])
    return geom, table


def _render_mean(geom, table, spp=64):
    import functools
    import jax

    from gatling_tpu.render.integrator import render_pixels

    config = RenderConfig(width=8, height=8, spp=spp, max_bounces=3,
                          jittered=False, fis=False, has_cutout=True,
                          rr_bounce_offset=100)
    n = config.width * config.height
    pix = jnp.arange(n, dtype=jnp.int32)
    fn = jax.jit(functools.partial(
        render_pixels, config), static_argnames=("spp",))
    res = fn(_uniforms(), geom, table, empty_light_arrays(), default_dome(),
             pix, spp=spp, sample_offset=jnp.int32(0))
    img = np.asarray(res.color).reshape(config.height, config.width, 3)
    return img[2:-2, 2:-2].mean()


def test_cutout_pass_probability():
    # opacity 0.3 -> 70% of rays pass through and see the emissive wall (1.0);
    # the other 30% shade a black screen
    geom, table = _cutout_scene(opacity=0.3)
    mean = _render_mean(geom, table)
    assert abs(mean - 0.7) < 0.08


def test_cutout_threshold_binary():
    # threshold 0.5 with opacity 0.3 -> fully transparent (binary cutout)
    geom, table = _cutout_scene(opacity=0.3, threshold=0.5)
    mean = _render_mean(geom, table, spp=8)
    assert mean > 0.95
    # threshold 0.5 with opacity 0.8 -> fully opaque
    geom, table = _cutout_scene(opacity=0.8, threshold=0.5)
    mean = _render_mean(geom, table, spp=8)
    assert mean < 0.05


def _shadow_cutout_scene(opacity: float | None, threshold: float = 0.0):
    """Diffuse wall at z=-3, rect light at z=+3 facing it, cutout screen at
    z=0 crossing only the SHADOW rays (the camera sits at z=-1.4, between
    screen and wall). opacity=None omits the screen entirely."""
    meshes = [
        MeshDesc(path="/wall", mesh=_quad(-3.0), transform=np.eye(4),
                 material="wall", double_sided=True, object_id=1),
    ]
    midx = {"screen": 0, "wall": 1, None: 2}
    if opacity is not None:
        meshes.insert(0, MeshDesc(
            path="/screen", mesh=_quad(0.0), transform=np.eye(4),
            material="screen", double_sided=True, object_id=0))
    geom = build_geometry(meshes, midx)
    screen = LoweredMaterial(params=dict(_DEFAULTS),
                             traits=MaterialTraits(has_cutout=True), textures={})
    screen.params.update(opacity=0.0 if opacity is None else opacity,
                         opacity_threshold=threshold, base_color=(0.0, 0.0, 0.0))
    wall = LoweredMaterial(params=dict(_DEFAULTS), traits=MaterialTraits(), textures={})
    wall.params.update(base_color=(0.8, 0.8, 0.8))
    table = build_material_table([screen, wall, lower_material(None)])

    from gatling_tpu.render.lights import build_light_arrays
    from gatling_tpu.scene.stage import LightDesc

    xf = np.eye(4)
    xf[3, :3] = [0.0, 0.0, 3.0]  # UsdLux rect default forward is -Z
    lights = build_light_arrays([LightDesc(
        path="/l", light_type="rect", transform=xf,
        params=dict(intensity=6.0, exposure=0.0,
                    color=np.array([1.0, 1.0, 1.0], np.float32),
                    normalize=False, diffuse=1.0, specular=1.0,
                    enableColorTemperature=False, colorTemperature=6500.0,
                    width=1.0, height=1.0))])
    return geom, table, lights


def _render_nee_mean(geom, table, lights, spp=64):
    import functools
    import jax

    from gatling_tpu.render.camera import CameraUniforms
    from gatling_tpu.render.integrator import Uniforms, render_pixels

    uni = _uniforms()._replace(camera=CameraUniforms(
        position=jnp.asarray([0.37, 0.11, -1.4]),
        forward=jnp.asarray([0.0, 0.0, -1.0]),
        up=jnp.asarray([0.0, 1.0, 0.0]),
        vfov=jnp.float32(0.2),
        lens_radius=jnp.float32(0), focus_distance=jnp.float32(0),
        sensor_exposure=jnp.float32(0),
        clip_start=jnp.float32(0.01), clip_end=jnp.float32(100.0)))
    config = RenderConfig(width=8, height=8, spp=spp, max_bounces=1,
                          nee=True, jittered=False, fis=False, has_cutout=True,
                          rr_bounce_offset=100)
    n = config.width * config.height
    pix = jnp.arange(n, dtype=jnp.int32)
    import functools as _ft
    import jax as _jax

    fn = _jax.jit(_ft.partial(render_pixels, config), static_argnames=("spp",))
    res = fn(uni, geom, table, lights, default_dome(), pix, spp=spp,
             sample_offset=jnp.int32(0))
    img = np.asarray(res.color).reshape(config.height, config.width, 3)
    return img[2:-2, 2:-2].mean()


def test_shadow_cutout_transparent_passes():
    """rp_main.ahit SHADOW_TEST: a fully transparent cutout screen must not
    block NEE shadow rays."""
    open_mean = _render_nee_mean(*_shadow_cutout_scene(None))
    thru_mean = _render_nee_mean(*_shadow_cutout_scene(0.3, threshold=0.5))
    assert open_mean > 0.02  # the light actually contributes
    assert abs(thru_mean - open_mean) / open_mean < 0.05


def test_shadow_cutout_opaque_blocks():
    open_mean = _render_nee_mean(*_shadow_cutout_scene(None))
    blocked = _render_nee_mean(*_shadow_cutout_scene(0.9, threshold=0.5))
    assert blocked < 0.1 * open_mean


def test_shadow_cutout_stochastic_half():
    open_mean = _render_nee_mean(*_shadow_cutout_scene(None), spp=256)
    half = _render_nee_mean(*_shadow_cutout_scene(0.5), spp=256)
    ratio = half / open_mean
    assert 0.38 < ratio < 0.62, ratio


def _backface_emission_scene(double_sided: bool, thin_walled: bool = False,
                             backface_edf: bool = False):
    """An emissive quad at z=-3 whose geometric normal points AWAY from the
    camera (flip=True): the camera always sees its back face."""
    meshes = [MeshDesc(path="/wall", mesh=_quad(-3.0, flip=True),
                       transform=np.eye(4), material="wall",
                       double_sided=double_sided, object_id=0)]
    midx = {"wall": 0, None: 1}
    geom = build_geometry(meshes, midx)
    wall = LoweredMaterial(
        params=dict(_DEFAULTS),
        traits=MaterialTraits(is_emissive=True, is_thin_walled=thin_walled,
                              has_backface_edf=backface_edf),
        textures={})
    wall.params.update(emissive=(1.0, 1.0, 1.0), base_color=(0.0, 0.0, 0.0),
                       thin_walled=int(thin_walled))
    table = build_material_table([wall, lower_material(None)])
    return geom, table


def test_backface_emission_semantics():
    """rp_main.chit:304-315 / MDL spec: no emission on the back side of
    double-sided geometry unless thin-walled with a backface EDF; the back
    side of SINGLE-sided geometry does emit."""
    def mean(geom, table):
        return _render_mean(geom, table, spp=4)

    # double-sided backface, plain material: dark
    assert mean(*_backface_emission_scene(True)) < 0.05
    # double-sided backface, thin-walled + backface EDF: emits
    assert mean(*_backface_emission_scene(True, True, True)) > 0.9
    # single-sided backface: emits (isFrontFace || !isDoubleSided)
    assert mean(*_backface_emission_scene(False)) > 0.9


def test_blend_opacity_lowering_semantics():
    """VERDICT r3 weak #7: a semi-transparent UsdPreviewSurface (opacity 0.5,
    opacityThreshold 0) must lower to CONTINUOUS coverage blending (the MDL
    cutout_opacity expression is continuous; rp_main.ahit applies it as a
    stochastic Bernoulli pass), NOT to a binary threshold cut. Converged
    image = lerp(through-path, surface, opacity)."""
    from gatling_tpu.scene.stage import MaterialDesc, ShaderNode

    node = ShaderNode(path="/mat/s", shader_id="UsdPreviewSurface",
                      inputs={"opacity": 0.5, "opacityThreshold": 0.0,
                              "diffuseColor": (0.0, 0.0, 0.0)},
                      input_connections={})
    desc = MaterialDesc(path="/mat", surface_node="/mat/s", nodes={node.path: node})
    screen = lower_material(desc)
    # routing: continuous blend still uses the cutout machinery (stochastic
    # coverage), with threshold 0 preserved so cutout_opacity stays continuous
    assert screen.traits.has_cutout
    assert screen.params["opacity_threshold"] == 0.0

    meshes = [
        MeshDesc(path="/screen", mesh=_quad(1.0), transform=np.eye(4),
                 material="screen", double_sided=True, object_id=0),
        MeshDesc(path="/wall", mesh=_quad(-3.0), transform=np.eye(4),
                 material="wall", double_sided=True, object_id=1),
    ]
    midx = {"screen": 0, "wall": 1, None: 2}
    geom = build_geometry(meshes, midx)
    wall = LoweredMaterial(params=dict(_DEFAULTS), traits=MaterialTraits(), textures={})
    wall.params.update(emissive=(1.0, 1.0, 1.0), base_color=(0.0, 0.0, 0.0))
    table = build_material_table([screen, wall, lower_material(None)])
    mean = _render_mean(geom, table)
    # 50% of rays pass (see the 1.0 emissive wall), 50% shade black screen
    assert abs(mean - 0.5) < 0.08


def test_textured_cutout_fused_retrace():
    """VERDICT r3 item 6: textured-opacity cutout on the FUSED split-bounce
    path. A checkerboard opacity texture (half 0, half 1) on a screen in
    front of an emissive wall: the converged mean must match the wavefront
    integrator's distribution (~50% pass)."""
    import dataclasses

    import jax
    from jax.experimental.pallas import tpu as pltpu

    from gatling_tpu import imgio
    from gatling_tpu.ops.pallas_bounce import build_fused_scene
    from gatling_tpu.render.fused import render_pixels_fused, supports_fused
    from gatling_tpu.render.material import build_materials, textured_params
    from gatling_tpu.render.texture import TextureRef

    # checkerboard alpha texture: 0 / 255 squares
    img = np.zeros((8, 8, 4), np.uint8)
    img[..., :3] = 255
    c = ((np.arange(8)[:, None] // 2 + np.arange(8)[None, :] // 2) % 2)
    img[..., 3] = np.where(c, 255, 0)
    path = "/tmp/gatling_cutout_checker.png"
    imgio.write_image_file(path, img)

    # screen quad WITH uvs so the opacity texture actually varies
    size = 5.0
    pts = np.array([[-size, -size, 1.0], [size, -size, 1.0],
                    [-size, size, 1.0], [size, size, 1.0]], np.float32)
    uvs = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], np.float32)
    from gatling_tpu.scene.meshproc import Interpolation
    screen_mesh = build_triangulated_mesh(
        pts, np.array([4]), np.array([0, 1, 3, 2]),
        uvs=uvs, uvs_interp=Interpolation.VERTEX)
    meshes = [
        MeshDesc(path="/screen", mesh=screen_mesh, transform=np.eye(4),
                 material="screen", double_sided=True, object_id=0),
        MeshDesc(path="/wall", mesh=_quad(-3.0), transform=np.eye(4),
                 material="wall", double_sided=True, object_id=1),
    ]
    midx = {"screen": 0, "wall": 1, None: 2}
    geom = build_geometry(meshes, midx)
    screen = LoweredMaterial(params=dict(_DEFAULTS),
                             traits=MaterialTraits(has_cutout=True),
                             textures={"opacity": TextureRef(
                                 file_path=path, is_srgb=False, channel="a")})
    screen.params.update(base_color=(0.0, 0.0, 0.0), opacity_threshold=0.5)
    wall = LoweredMaterial(params=dict(_DEFAULTS), traits=MaterialTraits(), textures={})
    wall.params.update(emissive=(1.0, 1.0, 1.0), base_color=(0.0, 0.0, 0.0))
    from gatling_tpu.render.material import lower_material

    table, pool = build_materials([screen, wall, lower_material(None)])

    config = RenderConfig(width=16, height=16, spp=4, max_bounces=3,
                          jittered=False, fis=False, has_cutout=True,
                          has_dome=False, rr_bounce_offset=100)
    # fused supports this combo with AND without NEE (round 5: the
    # occlusion walk draws against per-material UV-mean opacity)
    assert supports_fused(config, True, has_opacity_textures=True)
    assert supports_fused(dataclasses.replace(config, nee=True), True,
                          has_opacity_textures=True)

    scene, static = build_fused_scene(geom, table, None)
    static = dataclasses.replace(
        static, textured=True, cutout_textured=True,
        textured_params=textured_params([screen, wall]))
    n = 16 * 16
    pix = jnp.arange(n, dtype=jnp.int32)
    from tests.test_volumes import _uniforms as vol_uniforms

    with pltpu.force_tpu_interpret_mode():
        fused = np.asarray(render_pixels_fused(
            config, vol_uniforms(), scene, default_dome(), pix, 4,
            jnp.int32(0), static=static, materials=table, textures=pool))

    # wavefront reference distribution
    from gatling_tpu.render.integrator import render_pixels

    import functools

    fn = jax.jit(functools.partial(render_pixels, config),
                 static_argnames=("spp",))
    wave = np.asarray(fn(vol_uniforms(), geom, table, empty_light_arrays(),
                         default_dome(), pix, spp=4,
                         sample_offset=jnp.int32(0), textures=pool).color)
    f = fused.reshape(16, 16, 3)[3:-3, 3:-3].mean()
    w = wave.reshape(16, 16, 3)[3:-3, 3:-3].mean()
    # binary checker at threshold 0.5: both paths converge to the same
    # pass fraction (independent draws -> statistical tolerance)
    assert abs(f - w) < 0.12, (f, w)
    assert 0.2 < f < 0.8


def test_textured_cutout_nee_fused_mean_opacity_shadow():
    """VERDICT r4 item 6: NEE + textured-opacity cutout on the FUSED
    path. The in-kernel occlusion walk draws against the texture's
    UV-MEAN opacity (here a 50% checker): NEE through the leaf screen
    must land near the wavefront's exact per-texel shadow estimate."""
    import dataclasses

    from jax.experimental.pallas import tpu as pltpu

    from gatling_tpu import imgio
    from gatling_tpu.ops.pallas_bounce import build_fused_scene
    from gatling_tpu.render.fused import render_pixels_fused
    from gatling_tpu.render.lights import build_light_arrays
    from gatling_tpu.render.material import (build_materials, lower_material,
                                             textured_params)
    from gatling_tpu.render.texture import TextureRef
    from gatling_tpu.scene.meshproc import Interpolation
    from gatling_tpu.scene.stage import LightDesc

    img = np.zeros((8, 8, 4), np.uint8)
    img[..., :3] = 255
    c = ((np.arange(8)[:, None] // 2 + np.arange(8)[None, :] // 2) % 2)
    img[..., 3] = np.where(c, 255, 0)
    path = "/tmp/gatling_cutout_checker_nee.png"
    imgio.write_image_file(path, img)

    # floor at z=-1 lit by a rect light ABOVE a leaf screen at z=1
    size = 5.0
    pts = np.array([[-size, -size, 1.0], [size, -size, 1.0],
                    [-size, size, 1.0], [size, size, 1.0]], np.float32)
    uvs = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], np.float32)
    screen_mesh = build_triangulated_mesh(
        pts, np.array([4]), np.array([0, 1, 3, 2]),
        uvs=uvs, uvs_interp=Interpolation.VERTEX)
    meshes = [
        MeshDesc(path="/screen", mesh=screen_mesh, transform=np.eye(4),
                 material="screen", double_sided=True, object_id=0),
        MeshDesc(path="/floor", mesh=_quad(-1.0), transform=np.eye(4),
                 material="floor", double_sided=True, object_id=1),
    ]
    midx = {"screen": 0, "floor": 1, None: 2}
    geom = build_geometry(meshes, midx)
    screen = LoweredMaterial(params=dict(_DEFAULTS),
                             traits=MaterialTraits(has_cutout=True),
                             textures={"opacity": TextureRef(
                                 file_path=path, is_srgb=False, channel="a")})
    screen.params.update(base_color=(0.0, 0.0, 0.0), opacity_threshold=0.5)
    floor = LoweredMaterial(params=dict(_DEFAULTS), traits=MaterialTraits(),
                            textures={})
    floor.params.update(base_color=(0.8, 0.8, 0.8), ior=1.0)
    rows = [screen, floor, lower_material(None)]
    table, pool = build_materials(rows)

    xf = np.eye(4)
    xf[3, :3] = [0.0, 0.0, 3.0]
    lights = build_light_arrays([LightDesc(
        path="/L", light_type="rect", transform=xf,
        params=dict(intensity=6.0, exposure=0.0,
                    color=np.array([1.0, 1.0, 1.0], np.float32),
                    normalize=False, diffuse=1.0, specular=1.0,
                    enableColorTemperature=False, colorTemperature=6500.0,
                    width=2.0, height=2.0))])

    # shadow pass prob for the screen = the checker's mean pass (0.5)
    shadow_pass = np.array([0.5, 1.0, 1.0], np.float32)
    scene, static = build_fused_scene(geom, table, lights,
                                      shadow_pass=shadow_pass)
    assert static.cutout
    static = dataclasses.replace(
        static, textured=True, cutout_textured=True,
        textured_params=textured_params(rows))
    config = RenderConfig(width=16, height=16, spp=48, max_bounces=3,
                          jittered=False, fis=False, has_cutout=True,
                          nee=True, has_dome=False, rr_bounce_offset=100)
    from gatling_tpu.render.integrator import render_pixels

    pix = jnp.arange(256, dtype=jnp.int32)
    uni = _uniforms()
    with pltpu.force_tpu_interpret_mode():
        fused = np.asarray(render_pixels_fused(
            config, uni, scene, default_dome(), pix, 48, jnp.int32(0),
            static=static, materials=table, textures=pool))
    gen = np.asarray(render_pixels(
        config, uni, geom, table, lights, default_dome(), pix, 48,
        jnp.int32(0), pool).color)
    f = fused.reshape(16, 16, 3)
    g = gen.reshape(16, 16, 3)
    assert np.isfinite(f).all() and (f >= 0).all()
    # the mean-opacity shadow is an approximation of the exact per-texel
    # anyhit; tolerance is looser than the exact-parity tests
    rel = abs(f.mean() - g.mean()) / max(g.mean(), 1e-6)
    assert rel < 0.25, (f.mean(), g.mean())
    # and the mean-opacity really gates shadows: pass prob 0 (candidate
    # intersections never register -> shadow rays sail through) must be
    # BRIGHTER than the 0.5-mean screen
    scene2, static2 = build_fused_scene(geom, table, lights,
                                        shadow_pass=np.array(
                                            [0.0, 1.0, 1.0], np.float32))
    static2 = dataclasses.replace(
        static2, textured=True, cutout_textured=True,
        textured_params=textured_params(rows))
    with pltpu.force_tpu_interpret_mode():
        unshadowed = np.asarray(render_pixels_fused(
            config, uni, scene2, default_dome(), pix, 48, jnp.int32(0),
            static=static2, materials=table, textures=pool))
    assert unshadowed.mean() > f.mean()
