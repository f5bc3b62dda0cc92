"""Texture pipeline tests: pool packing, wrap modes, UsdUVTexture semantics,
and an end-to-end textured-quad render."""

import numpy as np
import jax.numpy as jnp
import pytest

from gatling_tpu import imgio
from gatling_tpu.render.texture import (
    TextureManager,
    TextureRef,
    sample_pool,
)


@pytest.fixture()
def checker_file(tmp_path):
    # 2x2 checker: red, green / blue, white (row 0 is image top)
    img = np.array([[[255, 0, 0, 255], [0, 255, 0, 255]],
                    [[0, 0, 255, 255], [255, 255, 255, 255]]], np.uint8)
    p = tmp_path / "checker.png"
    imgio.write_image_file(p, img)
    return str(p)


def _pool(refs):
    return TextureManager().build_pool(refs)


def test_pool_packing_and_lookup(checker_file):
    pool = _pool([TextureRef(file_path=checker_file)])
    # nearest-texel lookups at texel centers (v=1 top row)
    uv = jnp.asarray([[0.25, 0.75], [0.75, 0.75], [0.25, 0.25], [0.75, 0.25]], jnp.float32)
    out = np.asarray(sample_pool(pool, jnp.zeros(4, jnp.int32), uv))
    np.testing.assert_allclose(out[0, :3], [1, 0, 0], atol=1e-5)
    np.testing.assert_allclose(out[1, :3], [0, 1, 0], atol=1e-5)
    np.testing.assert_allclose(out[2, :3], [0, 0, 1], atol=1e-5)
    np.testing.assert_allclose(out[3, :3], [1, 1, 1], atol=1e-5)


def test_srgb_conversion(checker_file):
    gray = np.full((1, 1, 4), 128, np.uint8)
    import os
    p = os.path.join(os.path.dirname(checker_file), "gray.png")
    imgio.write_image_file(p, gray)
    raw = _pool([TextureRef(file_path=p, is_srgb=False)])
    lin = _pool([TextureRef(file_path=p, is_srgb=True)])
    uv = jnp.asarray([[0.5, 0.5]], jnp.float32)
    v_raw = float(np.asarray(sample_pool(raw, jnp.zeros(1, jnp.int32), uv))[0, 0])
    v_lin = float(np.asarray(sample_pool(lin, jnp.zeros(1, jnp.int32), uv))[0, 0])
    assert abs(v_raw - 128 / 255) < 1e-3
    assert abs(v_lin - ((128 / 255 + 0.055) / 1.055) ** 2.4) < 1e-3


def test_wrap_modes(checker_file):
    refs = [
        TextureRef(file_path=checker_file, wrap_s="repeat", wrap_t="repeat"),
        TextureRef(file_path=checker_file, wrap_s="clamp", wrap_t="clamp"),
        TextureRef(file_path=checker_file, wrap_s="black", wrap_t="black"),
    ]
    pool = _pool(refs)
    uv = jnp.asarray([[1.25, 0.75]], jnp.float32)  # u out of range
    rep = np.asarray(sample_pool(pool, jnp.asarray([0], jnp.int32), uv))
    np.testing.assert_allclose(rep[0, :3], [1, 0, 0], atol=1e-5)  # wraps to u=0.25
    clamp = np.asarray(sample_pool(pool, jnp.asarray([1], jnp.int32), uv))
    np.testing.assert_allclose(clamp[0, :3], [0, 1, 0], atol=1e-5)  # clamps to right texel
    black = np.asarray(sample_pool(pool, jnp.asarray([2], jnp.int32), uv))
    np.testing.assert_allclose(black[0], [0, 0, 0, 0], atol=1e-5)


def test_scale_bias(checker_file):
    pool = _pool([TextureRef(file_path=checker_file, scale=(2, 2, 2, 1), bias=(-1, -1, -1, 0))])
    uv = jnp.asarray([[0.75, 0.25]], jnp.float32)  # white texel
    out = np.asarray(sample_pool(pool, jnp.zeros(1, jnp.int32), uv))
    np.testing.assert_allclose(out[0, :3], [1, 1, 1], atol=1e-5)  # 1*2-1


def test_param_rows_chunked_matches_material_rows(checker_file):
    """The chunked alive-prefix texture stage must reproduce _material_rows
    exactly over the alive prefix (rays beyond it are dead and masked by the
    shade kernel)."""
    import jax

    from gatling_tpu.ops.pallas_bounce import (
        H_MAT, H_UVX, H_UVY, HIT_ROWS, slim_param_rows,
    )
    from gatling_tpu.render.fused import _material_rows, _material_rows_chunked
    from gatling_tpu.render.material import (
        LoweredMaterial, MaterialTraits, build_materials, lower_material,
    )

    rows = [lower_material(None) for _ in range(3)]
    rows[0].textures["base_color"] = TextureRef(file_path=checker_file)
    rows[1].textures["roughness"] = TextureRef(file_path=checker_file,
                                               channel="g")
    rows[2].params["base_color"] = (0.9, 0.2, 0.1)
    table, pool = build_materials(rows)

    rng = np.random.default_rng(3)
    nb, lanes = 24, 128
    n = nb * lanes
    hit = np.zeros((HIT_ROWS, nb, lanes), np.float32)
    hit[H_MAT] = rng.integers(0, 3, size=(nb, lanes))
    hit[H_UVX] = rng.uniform(-1, 2, size=(nb, lanes))
    hit[H_UVY] = rng.uniform(-1, 2, size=(nb, lanes))
    hitbuf = jnp.asarray(hit)

    ref = np.asarray(_material_rows(table, pool, hitbuf))
    for alive in (n, 1000, 1):
        got = np.asarray(jax.jit(
            lambda h, a: _material_rows_chunked(table, pool, h, None, a)
        )(hitbuf, jnp.int32(alive)))
        n_par = slim_param_rows(("base_color", "emissive", "metallic", "roughness"))
        assert got.shape == (n_par, nb, lanes)
        flat_ref = ref.reshape(n_par, -1)[:, :alive]
        flat_got = got.reshape(n_par, -1)[:, :alive]
        # same math; XLA FMA contraction may differ at the last ulp
        np.testing.assert_allclose(flat_got, flat_ref, rtol=2e-7, atol=1e-7)


def test_texture_dedup(checker_file):
    from gatling_tpu.render.material import LoweredMaterial, MaterialTraits, build_materials

    ref = TextureRef(file_path=checker_file, is_srgb=False)
    m1 = LoweredMaterial(params=_default_params(), traits=MaterialTraits(),
                         textures={"base_color": ref})
    m2 = LoweredMaterial(params=_default_params(), traits=MaterialTraits(),
                         textures={"base_color": ref, "emissive": ref})
    table, pool = build_materials([m1, m2])
    # identical refs share one slot
    assert pool.count == 1
    assert int(table.base_color_tex[0]) == 0
    assert int(table.base_color_tex[1]) == 0
    assert int(table.emissive_tex[1]) == 0
    assert int(table.emissive_tex[0]) == -1


def _default_params():
    from gatling_tpu.render.material import _DEFAULTS

    return dict(_DEFAULTS)


_QUAD_USDA = '''#usda 1.0
(
    defaultPrim = "Root"
)
def Xform "Root"
{{
    def Xform "CamX"
    {{
        matrix4d xformOp:transform = ( (1,0,0,0), (0,1,0,0), (0,0,1,0), (0,0,2,1) )
        uniform token[] xformOpOrder = ["xformOp:transform"]
        def Camera "Cam"
        {{
            float focalLength = 35
            float verticalAperture = 20.955
            float horizontalAperture = 20.955
        }}
    }}
    def Mesh "Quad" (
        prepend apiSchemas = ["MaterialBindingAPI"]
    )
    {{
        int[] faceVertexCounts = [4]
        int[] faceVertexIndices = [0, 1, 3, 2]
        rel material:binding = </Root/Mat>
        point3f[] points = [(-1,-1,0), (1,-1,0), (-1,1,0), (1,1,0)]
        texCoord2f[] primvars:st = [(0,0), (1,0), (0,1), (1,1)] (
            interpolation = "vertex"
        )
        normal3f[] normals = [(0,0,1), (0,0,1), (0,0,1), (0,0,1)] (
            interpolation = "vertex"
        )
    }}
    def Material "Mat"
    {{
        token outputs:surface.connect = </Root/Mat/Shader.outputs:surface>
        def Shader "Shader"
        {{
            uniform token info:id = "UsdPreviewSurface"
            color3f inputs:diffuseColor.connect = </Root/Mat/Tex.outputs:rgb>
            color3f inputs:emissiveColor.connect = </Root/Mat/Tex.outputs:rgb>
            token outputs:surface
        }}
        def Shader "Tex"
        {{
            uniform token info:id = "UsdUVTexture"
            asset inputs:file = @{checker_file}@
            token inputs:sourceColorSpace = "raw"
            float2 inputs:st.connect = </Root/Mat/Reader.outputs:result>
            color3f outputs:rgb
        }}
        def Shader "Reader"
        {{
            uniform token info:id = "UsdPrimvarReader_float2"
            token inputs:varname = "st"
            float2 outputs:result
        }}
    }}
}}
'''


def test_textured_quad_render(tmp_path, checker_file):
    """End-to-end: UsdPreviewSurface with a UsdUVTexture-driven diffuseColor."""
    usda = _QUAD_USDA.format(checker_file=checker_file)
    scene_file = tmp_path / "quad.usda"
    scene_file.write_text(usda)

    from gatling_tpu.cli import render_scene_file
    from gatling_tpu.utils.config import default_settings

    s = default_settings()
    s.update(spp=4, maxBounces=1, jitteredSampling=False)
    img, _ = render_scene_file(str(scene_file), 32, 32, s)
    # emissive checker makes quadrant colors directly observable:
    # quad covers most of the view; sample quadrant centers.
    # image row index grows with +y (up), so top-left quadrant = red
    # bilinear filtering on the 2x2 texture bleeds ~25% of the neighbor
    # color at these sample points; thresholds account for that
    tl = img[24, 8, :3]
    tr = img[24, 24, :3]
    bl = img[8, 8, :3]
    br = img[8, 24, :3]
    assert tl[0] > 0.5 and tl[0] > 2 * tl[1]  # red dominates
    assert tr[1] > 0.5 and tr[1] > 2 * tr[0]  # green dominates
    assert bl[2] > 0.5 and bl[2] > 2 * bl[0]  # blue dominates
    assert br.min() > 0.4  # white-ish


def test_texture_lod_mean_fallback(tmp_path, checker_file):
    """textureLodBounces: bounces >= k shade from the texture MEANS via the
    split_mean pipeline (gathered parbuf, zero taps — fused.py). The camera
    bounce still taps the real texture, so quadrant colors must survive,
    and the indirect bounces must stay finite and non-black."""
    usda = _QUAD_USDA.format(checker_file=checker_file)
    scene_file = tmp_path / "quad_lod.usda"
    scene_file.write_text(usda)

    from gatling_tpu.cli import render_scene_file
    from gatling_tpu.utils.config import default_settings

    s = default_settings()
    s.update(spp=4, maxBounces=3, jitteredSampling=False,
             textureLodBounces=1)
    img, _ = render_scene_file(str(scene_file), 32, 32, s)
    assert np.isfinite(img).all()
    tl = img[24, 8, :3]
    assert tl[0] > 0.4 and tl[0] > 1.5 * tl[1]  # camera taps intact

    s0 = default_settings()
    s0.update(spp=4, maxBounces=3, jitteredSampling=False)
    img0, _ = render_scene_file(str(scene_file), 32, 32, s0)
    # means-based indirect shading approximates full-tap shading
    assert abs(float(img.mean()) - float(img0.mean())) < 0.2 * max(
        float(img0.mean()), 1e-3)
