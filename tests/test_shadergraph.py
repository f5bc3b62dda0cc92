"""Shader node-graph lowering tests (render/shadergraph.py).

The round-1 folding took the first constant operand of multiply/mix/add —
a multiply(texture, color) chain silently dropped the texture. These tests
pin the replacement: affine chains over one texture fold exactly into the
pool-level scale/bias, constants fold arithmetically, and non-representable
graphs degrade with an explicit warning instead of silently.
"""

import logging

import numpy as np
import jax.numpy as jnp
import pytest

from gatling_tpu import imgio
from gatling_tpu.render.material import lower_material
from gatling_tpu.render.shadergraph import GraphLowering, GraphValue
from gatling_tpu.render.texture import TextureManager, TextureRef, sample_pool
from gatling_tpu.scene.stage import MaterialDesc, ShaderNode


def _mat(nodes: list[ShaderNode], surface: str) -> MaterialDesc:
    return MaterialDesc(path="/m", surface_node=surface,
                        nodes={n.path: n for n in nodes})


def _node(path, sid, inputs=None, conns=None) -> ShaderNode:
    return ShaderNode(path=path, shader_id=sid, inputs=inputs or {},
                      input_connections=conns or {})


def _eval(desc, input_name="in", default=(0.0, 0.0, 0.0), color=False):
    surf = desc.nodes[desc.surface_node]
    return GraphLowering(desc).eval_input(surf, input_name, default, color)


def _tex_node(path="/t", fid="/tmp/does_not_matter.png"):
    return _node(path, "image", {"file": fid, "default": (0.5, 0.5, 0.5)})


def test_constant_math_folds():
    # 0.25 * (0.5 + 0.3) = 0.2
    nodes = [
        _node("/s", "surf", conns={"in": ("/mul", "out")}),
        _node("/mul", "multiply", {"in2": 0.25}, {"in1": ("/add", "out")}),
        _node("/add", "add", {"in1": 0.5, "in2": 0.3}),
    ]
    gv = _eval(_mat(nodes, "/s"))
    assert gv.texture is None
    np.testing.assert_allclose(gv.constant[:3], [0.2] * 3, atol=1e-6)


def test_multiply_image_by_color_folds_into_scale():
    # THE VERDICT case: multiply(image, color) must keep the texture and
    # put the color in the affine scale
    nodes = [
        _node("/s", "surf", conns={"in": ("/mul", "out")}),
        _node("/mul", "multiply", {"in2": (0.5, 0.25, 1.0)},
              {"in1": ("/t", "out")}),
        _tex_node(),
    ]
    gv = _eval(_mat(nodes, "/s"), color=True)
    assert gv.texture is not None
    np.testing.assert_allclose(gv.texture.scale[:3], [0.5, 0.25, 1.0])
    np.testing.assert_allclose(gv.texture.bias[:3], [0.0, 0.0, 0.0])
    # fallback constant also scaled: 0.5 * (0.5, 0.25, 1.0)
    np.testing.assert_allclose(gv.constant[:3], [0.25, 0.125, 0.5])


def test_nested_affine_chain():
    # (image * 2 + 0.1) folds to scale=2, bias=0.1
    nodes = [
        _node("/s", "surf", conns={"in": ("/add", "out")}),
        _node("/add", "add", {"in2": (0.1, 0.1, 0.1)}, {"in1": ("/mul", "out")}),
        _node("/mul", "multiply", {"in2": 2.0}, {"in1": ("/t", "out")}),
        _tex_node(),
    ]
    gv = _eval(_mat(nodes, "/s"))
    np.testing.assert_allclose(gv.texture.scale[:3], [2.0] * 3)
    np.testing.assert_allclose(gv.texture.bias[:3], [0.1] * 3)


def test_subtract_orders():
    nodes = [
        _node("/s", "surf", conns={"in": ("/sub", "out")}),
        _node("/sub", "subtract", {"in1": 1.0}, {"in2": ("/t", "out")}),
        _tex_node(),
    ]
    gv = _eval(_mat(nodes, "/s"))
    # 1 - T = -1*T + 1
    np.testing.assert_allclose(gv.texture.scale[:3], [-1.0] * 3)
    np.testing.assert_allclose(gv.texture.bias[:3], [1.0] * 3)


def test_mix_constant_factor():
    # mix(fg=T, bg=0.2, mix=0.75) = 0.75*T + 0.05
    nodes = [
        _node("/s", "surf", conns={"in": ("/mix", "out")}),
        _node("/mix", "mix", {"bg": (0.2, 0.2, 0.2), "mix": 0.75},
              {"fg": ("/t", "out")}),
        _tex_node(),
    ]
    gv = _eval(_mat(nodes, "/s"))
    np.testing.assert_allclose(gv.texture.scale[:3], [0.75] * 3)
    np.testing.assert_allclose(gv.texture.bias[:3], [0.05] * 3, atol=1e-7)


def test_two_textures_records_exact_expr():
    """multiply(texA, texB) is non-affine: the affine approximation keeps
    texA scaled by texB's fallback AND the exact subtree rides along as an
    Expr for composite baking."""
    nodes = [
        _node("/s", "surf", conns={"in": ("/mul", "out")}),
        _node("/mul", "multiply", {}, {"in1": ("/t", "out"), "in2": ("/t2", "out")}),
        _tex_node(),
        _tex_node("/t2", "/tmp/other.png"),
    ]
    gv = _eval(_mat(nodes, "/s"))
    assert gv.texture is not None
    assert gv.texture.file_path.endswith("does_not_matter.png")
    # second texture approximated by its fallback 0.5 -> scale
    np.testing.assert_allclose(gv.texture.scale[:3], [0.5] * 3)
    assert gv.expr is not None and gv.expr.op == "multiply"
    assert gv.expr.args[0].tex.file_path.endswith("does_not_matter.png")
    assert gv.expr.args[1].tex.file_path.endswith("other.png")


def test_two_texture_multiply_bakes_exact_composite(tmp_path):
    """End to end: a multiply of two real images lowers to a baked pool
    slot whose samples equal the per-texel product (exact at texel centers,
    within the 8-bit sRGB quantization of the baked store)."""
    rng = np.random.default_rng(7)
    paths = []
    for i in range(2):
        img = np.zeros((4, 4, 4), np.uint8)
        img[..., :3] = rng.integers(0, 256, size=(4, 4, 3))
        img[..., 3] = 255
        p = str(tmp_path / f"bake_{i}.png")
        imgio.write_image_file(p, img)
        paths.append(p)

    nodes = [
        _node("/s", "UsdPreviewSurface", {},
              {"diffuseColor": ("/mul", "out")}),
        _node("/mul", "multiply", {},
              {"in1": ("/t", "out"), "in2": ("/t2", "out")}),
        _node("/t", "image", {"file": paths[0]}),
        _node("/t2", "image", {"file": paths[1]}),
    ]
    mat = lower_material(_mat(nodes, "/s"))
    ref = mat.textures["base_color"]
    assert ref.bake is not None and ref.file_path.startswith("baked://")

    tm = TextureManager()
    pool = tm.build_pool([ref])
    # sample every texel center and compare against the numpy product
    # (both sources are raw non-sRGB here: is_srgb defaults come from the
    # 'auto' colorspace inference with color_hint, images stay linear codes)
    xs, ys = np.meshgrid(np.arange(4), np.arange(4))
    uv = jnp.asarray(np.stack([(xs.ravel() + 0.5) / 4,
                               1.0 - (ys.ravel() + 0.5) / 4], axis=-1),
                     jnp.float32)
    got = np.asarray(sample_pool(pool, jnp.zeros(16, jnp.int32), uv))[:, :3]
    # leaves keep their inferred colorspaces: in1 inherits the color hint
    # (sRGB), in2 stays raw — mirror exactly what the bake evaluates
    a = tm._load(ref.bake.args[0].tex)
    b = tm._load(ref.bake.args[1].tex)
    want = (a * b).reshape(-1, 4)[:, :3]
    np.testing.assert_allclose(got, want, atol=2.5 / 255.0)


def test_extract_channel():
    nodes = [
        _node("/s", "surf", conns={"in": ("/ex", "out")}),
        _node("/ex", "extract", {"channels": "g"}, {"in": ("/t", "out")}),
        _tex_node(),
    ]
    gv = _eval(_mat(nodes, "/s"), default=0.0)
    assert gv.texture.channel == "g"


def test_normalmap_decode():
    nodes = [
        _node("/s", "surf", conns={"in": ("/nm", "out")}),
        _node("/nm", "normalmap", {}, {"in": ("/t", "out")}),
        _tex_node(),
    ]
    gv = _eval(_mat(nodes, "/s"))
    np.testing.assert_allclose(gv.texture.scale, [2.0, 2.0, 2.0, 1.0])
    np.testing.assert_allclose(gv.texture.bias, [-1.0, -1.0, -1.0, 0.0])


def test_usduvtexture_scale_bias_composes():
    # author scale on the texture node AND a multiply above it
    nodes = [
        _node("/s", "surf", conns={"in": ("/mul", "out")}),
        _node("/mul", "multiply", {"in2": 0.5}, {"in1": ("/t", "rgb")}),
        _node("/t", "UsdUVTexture",
              {"file": "/tmp/x.png", "scale": (2.0, 2.0, 2.0, 1.0),
               "bias": (0.1, 0.1, 0.1, 0.0), "fallback": (1.0, 1.0, 1.0)}),
    ]
    gv = _eval(_mat(nodes, "/s"), color=True)
    np.testing.assert_allclose(gv.texture.scale[:3], [1.0] * 3)
    np.testing.assert_allclose(gv.texture.bias[:3], [0.05] * 3)
    assert gv.texture.is_srgb  # color hint + auto colorspace


def test_lower_material_multiply_texture(tmp_path):
    """End-to-end through lower_material + the texture pool: a
    multiply(image, 0.5)->diffuseColor network samples at half brightness."""
    img = np.full((1, 1, 4), 255, np.uint8)
    p = tmp_path / "white.png"
    imgio.write_image_file(p, img)
    nodes = [
        _node("/surf", "UsdPreviewSurface", {}, {"diffuseColor": ("/mul", "out")}),
        _node("/mul", "multiply", {"in2": (0.5, 0.5, 0.5)}, {"in1": ("/t", "rgb")}),
        _node("/t", "UsdUVTexture",
              {"file": str(p), "sourceColorSpace": "raw",
               "fallback": (1.0, 1.0, 1.0)}),
    ]
    desc = _mat(nodes, "/surf")
    lowered = lower_material(desc)
    ref = lowered.textures["base_color"]
    pool = TextureManager().build_pool([ref])
    out = np.asarray(sample_pool(pool, jnp.zeros(1, jnp.int32),
                                 jnp.asarray([[0.5, 0.5]], jnp.float32)))
    np.testing.assert_allclose(out[0, :3], [0.5] * 3, atol=1e-3)


def test_nd_nodedef_name_normalization():
    """USD-authored MaterialX nodes carry ND_ nodedef ids; they must hit
    the same handlers as mtlx XML tags (normalize_shader_id)."""
    from gatling_tpu.render.shadergraph import normalize_shader_id

    assert normalize_shader_id("ND_multiply_color3") == "multiply"
    assert normalize_shader_id("ND_image_color3") == "image"
    assert normalize_shader_id("ND_convert_float_color3") == "convert"
    assert normalize_shader_id("ND_swizzle_color3_float") == "swizzle"
    assert normalize_shader_id("ND_frame_float") == "frame"
    assert normalize_shader_id("ND_standard_surface_surfaceshader") == "standard_surface"
    assert normalize_shader_id("UsdUVTexture") == "UsdUVTexture"

    # a multiply chain authored with ND_ ids folds like the tag route
    nodes = [
        _node("/s", "surf", conns={"in": ("/mul", "out")}),
        _node("/mul", "ND_multiply_color3", {"in2": 0.25},
              {"in1": ("/add", "out")}),
        _node("/add", "ND_add_color3", {"in1": 0.5, "in2": 0.3}),
    ]
    gv = _eval(_mat(nodes, "/s"))
    assert gv.texture is None
    np.testing.assert_allclose(gv.constant[:3], [0.2] * 3, atol=1e-6)


def test_frame_and_time_nodes(caplog):
    """frame/time nodes fold to the lowering-time frame value and mark the
    material animated (Materials.MtlxFrame analog; reference time-node
    detection MtlxMdlCodeGen.cpp:116-144)."""
    nodes = [
        _node("/s", "UsdPreviewSurface",
              conns={"diffuseColor": ("/mix", "out")}),
        _node("/mix", "multiply", {"in2": (0.01, 0.02, 0.0)},
              {"in1": ("/f", "out")}),
        _node("/f", "ND_frame_float"),
    ]
    desc = _mat(nodes, "/s")
    m0 = lower_material(desc, frame=0.0)
    m10 = lower_material(desc, frame=10.0)
    assert m0.traits.is_animated and m10.traits.is_animated
    np.testing.assert_allclose(m0.params["base_color"], [0.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(m10.params["base_color"], [0.1, 0.2, 0.0], atol=1e-6)

    # time = frame / fps
    nodes_t = [
        _node("/s", "UsdPreviewSurface", conns={"metallic": ("/t", "out")}),
        _node("/t", "time", {"fps": 10.0}),
    ]
    mt = lower_material(_mat(nodes_t, "/s"), frame=5.0)
    assert mt.traits.is_animated
    assert abs(mt.params["metallic"] - 0.5) < 1e-6

    # a static material is not animated
    m_static = lower_material(_mat([_node("/s", "UsdPreviewSurface")], "/s"))
    assert not m_static.traits.is_animated


def test_primvar_reader_becomes_dynamic_leaf():
    """geompropvalue / UsdPrimvarReader on an interpolated channel lowers to
    a DYNAMIC primvar leaf (the scene-data lookup analog,
    mdl_interface.glsl scene_data_lookup_*); the wavefront integrator
    substitutes the per-hit interpolated value."""
    from gatling_tpu.render.shadergraph import (Expr, eval_dynamic_expr,
                                                expr_is_dynamic)

    nodes = [
        _node("/s", "surf", conns={"in": ("/pv", "out")}),
        _node("/pv", "UsdPrimvarReader_float3",
              {"varname": "displayColor", "fallback": (0.2, 0.3, 0.4)}),
    ]
    gv = _eval(_mat(nodes, "/s"), color=True)
    assert gv.expr is not None and gv.expr.op == "primvar"
    assert gv.expr.channel == "displayColor"
    assert expr_is_dynamic(gv.expr)
    np.testing.assert_allclose(gv.constant[:3], [0.2, 0.3, 0.4], atol=1e-6)

    vc = jnp.asarray(np.array([[0.9, 0.1, 0.5], [0.2, 0.8, 0.3]], np.float32))
    zeros = jnp.zeros((2, 3), jnp.float32)
    out = np.asarray(eval_dynamic_expr(gv.expr, zeros, zeros,
                                       primvars={"displayColor": vc}))
    np.testing.assert_allclose(out[:, :3], np.asarray(vc), atol=1e-6)
    # without the channel, the reader fallback applies
    out2 = np.asarray(eval_dynamic_expr(gv.expr, zeros, zeros, primvars={}))
    np.testing.assert_allclose(out2[0, :3], [0.2, 0.3, 0.4], atol=1e-6)


def test_primvar_reader_unknown_name_falls_back():
    """Round 5: EVERY named primvar becomes a dynamic leaf (instance-rate
    primvars resolve through the scene-data tables). A name the renderer
    cannot resolve evaluates to the reader fallback at eval time, and gi
    drops unresolvable-only exprs so they never demote the scene."""
    import jax.numpy as jnp

    from gatling_tpu.render.shadergraph import (eval_dynamic_expr,
                                                expr_dynamic_beyond)

    nodes = [
        _node("/s", "surf", conns={"in": ("/pv", "out")}),
        _node("/pv", "geompropvalue",
              {"geomprop": "myCustomData", "default": (0.7, 0.7, 0.7)}),
    ]
    gv = _eval(_mat(nodes, "/s"))
    assert gv.expr is not None and gv.expr.op == "primvar"
    assert gv.expr.channel == "myCustomData"
    np.testing.assert_allclose(gv.constant[:3], [0.7] * 3, atol=1e-6)
    # unresolvable -> fallback constant at eval time
    v = np.asarray(eval_dynamic_expr(
        gv.expr, jnp.zeros((4, 3)), jnp.zeros((4, 3)), primvars=None))
    np.testing.assert_allclose(v[:, :3], 0.7, atol=1e-6)
    # gi's demotion filter: dropped unless some renderer channel resolves it
    assert not expr_dynamic_beyond(gv.expr, {"displayColor"})
    assert expr_dynamic_beyond(gv.expr, {"displayColor", "myCustomData"})


def test_lower_material_primvar_base_color():
    """A UsdPreviewSurface with diffuseColor <- UsdPrimvarReader(displayColor)
    carries the primvar expr as a dynamic param (material.py lowering)."""
    nodes = [
        _node("/s", "UsdPreviewSurface", {},
              {"diffuseColor": ("/pv", "out")}),
        _node("/pv", "UsdPrimvarReader_float3",
              {"varname": "displayColor", "fallback": (0.5, 0.5, 0.5)}),
    ]
    lowered = lower_material(_mat(nodes, "/s"))
    assert "base_color" in lowered.dynamic
    assert lowered.dynamic["base_color"].op == "primvar"


# ---------------------------------------------------------------------------
# procedural generator nodes (VERDICT r3 item 5)
# ---------------------------------------------------------------------------

def _lower_mtlx_textures(doc: str):
    from gatling_tpu.render.material import lower_material
    from gatling_tpu.render.mtlx import parse_mtlx

    return lower_material(parse_mtlx(doc, name="proc"))


def test_checkerboard_bakes_exact():
    """checkerboard lowers to a baked Expr whose image matches the trivial
    oracle at every texel center (reference compiles the graph through MDL,
    MtlxMdlCodeGen.cpp:217-287)."""
    import numpy as np

    from gatling_tpu.render.texture import TextureManager

    doc = """<?xml version="1.0"?>
<materialx version="1.38">
  <checkerboard name="ch" type="color3">
    <input name="in1" type="color3" value="1.0, 0.0, 0.0" />
    <input name="in2" type="color3" value="0.0, 0.0, 1.0" />
    <input name="uvtiling" type="vector2" value="4, 4" />
  </checkerboard>
  <standard_surface name="SR" type="surfaceshader">
    <input name="base_color" type="color3" nodename="ch" />
  </standard_surface>
</materialx>"""
    m = _lower_mtlx_textures(doc)
    ref = m.textures["base_color"]
    assert ref.bake is not None and ref.bake.op == "checkerboard"

    img, is_hdr = TextureManager()._load_raw(ref)
    h, w = img.shape[:2]
    # oracle: texel centers, v=0 at the bottom row
    u = (np.arange(w) + 0.5) / w
    v = 1.0 - (np.arange(h) + 0.5) / h
    mask = ((np.floor(u[None, :] * 4) + np.floor(v[:, None] * 4)) % 2 == 0)
    # color3 values carry alpha 0 through the graph (_vec4 pad convention)
    expect = np.where(mask[..., None],
                      np.asarray([1.0, 0, 0, 0]), np.asarray([0, 0, 1.0, 0]))
    # LDR bakes store sRGB codes quantized to 8 bits; 0/1 are exact
    np.testing.assert_allclose(img, expect.astype(np.float32), atol=1e-6)


def test_noise_driven_roughness_matches_oracle():
    """noise2d feeding a scalar parameter bakes exactly: the pool image at
    texel centers equals the NumPy generator evaluated on the same grid
    (negative noise values force the exact float path, no quantization)."""
    import numpy as np

    from gatling_tpu.render import procedural
    from gatling_tpu.render.texture import TextureManager

    doc = """<?xml version="1.0"?>
<materialx version="1.38">
  <noise2d name="nz" type="float">
    <input name="amplitude" type="float" value="1.0" />
    <input name="pivot" type="float" value="0.0" />
  </noise2d>
  <standard_surface name="SR" type="surfaceshader">
    <input name="specular_roughness" type="float" nodename="nz" />
  </standard_surface>
</materialx>"""
    m = _lower_mtlx_textures(doc)
    ref = m.textures["roughness"]
    assert ref.bake is not None and ref.bake.op == "noise2d"

    img, is_hdr = TextureManager()._load_raw(ref)
    assert is_hdr, "noise in [-1,1] must take the exact float path"
    h, w = img.shape[:2]
    u = ((np.arange(w) + 0.5) / w)[None, :] * np.ones((h, 1))
    v = (1.0 - (np.arange(h) + 0.5) / h)[:, None] * np.ones((1, w))
    oracle = procedural.perlin2(u, v)
    np.testing.assert_allclose(img[..., 0], oracle, atol=1e-6)
    # determinism: a second manager bakes the identical image
    img2, _ = TextureManager()._load_raw(ref)
    np.testing.assert_array_equal(img, img2)
    # the noise is actually noise
    assert img[..., 0].std() > 0.05


def test_ramp_and_cellnoise_bake():
    import numpy as np

    from gatling_tpu.render.shadergraph import Expr
    from gatling_tpu.render.texture import TextureManager, baked_ref

    ramp = Expr(op="ramplr", args=(
        Expr(op="const", const=(0.0, 0.0, 0.0, 1.0)),
        Expr(op="const", const=(1.0, 1.0, 1.0, 1.0))))
    img, _ = TextureManager()._load_raw(baked_ref(ramp))
    w = img.shape[1]
    # left edge ~0, right edge ~1, monotonic in u (sRGB-encoded is still
    # monotonic)
    row = img[0, :, 0]
    assert row[0] < 0.05 and row[-1] > 0.95
    assert np.all(np.diff(row) >= 0)

    # cellnoise over [0,1) uv is one cell: exact-vs-oracle, and the
    # generator itself varies across cells
    import numpy as np
    from gatling_tpu.render import procedural

    cell = Expr(op="cellnoise2d")
    cimg, c_hdr = TextureManager()._load_raw(baked_ref(cell))
    h, w = cimg.shape[:2]
    u = ((np.arange(w) + 0.5) / w)[None, :] * np.ones((h, 1))
    v = (1.0 - (np.arange(h) + 0.5) / h)[:, None] * np.ones((1, w))
    oracle = procedural.cellnoise2(u, v)
    if not c_hdr:  # LDR path stores quantized sRGB codes
        oracle = np.round(np.clip(np.where(
            oracle <= 0.0031308, oracle * 12.92,
            1.055 * np.maximum(oracle, 1e-12) ** (1 / 2.4) - 0.055),
            0.0, 1.0) * 255.0) / 255.0
    np.testing.assert_allclose(cimg[..., 0], oracle.astype(np.float32), atol=1e-6)
    grid = np.mgrid[0:8, 0:8].astype(np.float64)
    assert procedural.cellnoise2(grid[0], grid[1]).std() > 0.1
    assert procedural.worley2(grid[0] / 2, grid[1] / 2).std() > 0.05


def test_custom_nodedef_expansion():
    """A document-defined nodedef + functional nodegraph expands inline at
    its instantiation site (interfacename bindings)."""
    import numpy as np

    doc = """<?xml version="1.0"?>
<materialx version="1.38">
  <nodedef name="ND_double_color3" node="double">
    <input name="in" type="color3" value="0.0, 0.0, 0.0" />
    <output name="out" type="color3" />
  </nodedef>
  <nodegraph name="NG_double_color3" nodedef="ND_double_color3">
    <multiply name="m1" type="color3">
      <input name="in1" type="color3" interfacename="in" />
      <input name="in2" type="color3" value="2.0, 2.0, 2.0" />
    </multiply>
    <output name="out" type="color3" nodename="m1" />
  </nodegraph>
  <double name="d1" type="color3">
    <input name="in" type="color3" value="0.1, 0.2, 0.3" />
  </double>
  <standard_surface name="SR" type="surfaceshader">
    <input name="base_color" type="color3" nodename="d1" />
  </standard_surface>
</materialx>"""
    m = _lower_mtlx_textures(doc)
    np.testing.assert_allclose(m.params["base_color"], (0.2, 0.4, 0.6), atol=1e-6)


def test_open_pbr_nodedef_defaults():
    """Unbound open_pbr_surface inputs take the bundled nodedef's spec
    defaults (specular_roughness 0.3), not the uber fallback."""
    doc = """<?xml version="1.0"?>
<materialx version="1.38">
  <open_pbr_surface name="SR" type="surfaceshader">
    <input name="base_color" type="color3" value="0.5, 0.5, 0.5" />
  </open_pbr_surface>
</materialx>"""
    m = _lower_mtlx_textures(doc)
    assert abs(m.params["roughness"] - 0.3) < 1e-6
    assert abs(m.params["ior"] - 1.6) < 1e-6
