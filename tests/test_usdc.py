"""Binary USD (crate) + usdz + variantSet composition tests
(VERDICT r3 item 2; reference opens all of these via UsdStage::Open,
src/gatling/main.cpp:132)."""

import os
import zipfile

import numpy as np
import pytest

from gatling_tpu.scene.crate import read_usdc, save_usdc, write_usdc
from gatling_tpu.scene.usda import load_usd, load_usda, parse_usda

CORNELL = "/root/reference/cornell.usda"


def test_crate_round_trip_structure():
    s = load_usda(CORNELL)
    s2 = read_usdc(write_usdc(s), path="mem")
    orig = {p.path: (p.type_name, sorted(p.attrs), sorted(p.rels))
            for p in s.walk()}
    rt = {p.path: (p.type_name, sorted(p.attrs), sorted(p.rels))
          for p in s2.walk()}
    assert orig == rt
    assert s2.meta["defaultPrim"] == "Root"
    # values survive up to the f32 quantization inherent to crate vecs
    for p in s.walk():
        p2 = s2.find(p.path)
        for an, a in p.attrs.items():
            b = p2.attrs[an]
            if isinstance(a.value, (int, float)):
                assert abs(a.value - b.value) < 1e-5
            assert str(a.connect or "") == str(b.connect or "")


def test_usdc_renders_identical_to_usda(tmp_path):
    """A .usdc export of cornell renders the same image as the .usda."""
    from gatling_tpu.cli import render_scene_file
    from gatling_tpu.utils.config import default_settings

    p = tmp_path / "cornell.usdc"
    save_usdc(load_usda(CORNELL), p)
    s = default_settings()
    s.update(spp=2, maxBounces=2)
    img_a, _ = render_scene_file(CORNELL, 64, 64, s)
    img_c, _ = render_scene_file(str(p), 64, 64, s)
    # f32 vec quantization in the crate container is the only difference
    np.testing.assert_allclose(img_c, img_a, rtol=1e-4, atol=1e-5)


def test_usdz_package(tmp_path):
    """A .usdz (zip) package loads through its first usd layer."""
    from gatling_tpu.scene.stage import load_scene

    inner = tmp_path / "cornell.usdc"
    save_usdc(load_usda(CORNELL), inner)
    z = tmp_path / "scene.usdz"
    with zipfile.ZipFile(z, "w", zipfile.ZIP_STORED) as zf:
        zf.write(inner, "cornell.usdc")
    desc = load_scene(str(z))
    assert len(desc.meshes) >= 5
    assert desc.first_camera() is not None


VARIANT_DOC = """#usda 1.0
(
    defaultPrim = "Root"
)
def Xform "Root"
{
    def Sphere "Ball" (
        variants = {
            string shading = "red"
        }
        prepend variantSets = "shading"
    )
    {
        double radius = 1
        variantSet "shading" = {
            "red" {
                color3f[] primvars:displayColor = [(1, 0, 0)]
                double radius = 2
            }
            "blue" {
                color3f[] primvars:displayColor = [(0, 0, 1)]
            }
        }
    }
}
"""


def test_variant_selection_text():
    s = parse_usda(VARIANT_DOC)
    ball = s.find("/Root/Ball")
    assert ball is not None
    dc = ball.attrs["primvars:displayColor"].value
    np.testing.assert_allclose(np.asarray(dc, np.float64)[0], (1, 0, 0))
    # local opinion (radius 1) beats the variant's (2): L over V
    assert float(ball.attrs["radius"].value) == 1.0
    # no leftover variant children
    assert not [n for n in ball.children if n.startswith("{")]


def test_variant_selection_switch():
    doc = VARIANT_DOC.replace('string shading = "red"',
                              'string shading = "blue"')
    s = parse_usda(doc)
    dc = s.find("/Root/Ball").attrs["primvars:displayColor"].value
    np.testing.assert_allclose(np.asarray(dc, np.float64)[0], (0, 0, 1))


def test_variant_round_trip_through_crate(tmp_path):
    """Variants survive crate serialization: write the UNCOMPOSED stage,
    read it back, compose, and the authored selection applies."""
    raw = parse_usda(VARIANT_DOC, compose=False)
    p = tmp_path / "var.usdc"
    save_usdc(raw, p)
    s = load_usd(str(p))
    ball = s.find("/Root/Ball")
    dc = ball.attrs["primvars:displayColor"].value
    np.testing.assert_allclose(np.asarray(dc, np.float64)[0], (1, 0, 0))


def test_reference_with_variant_override(tmp_path):
    """A referencing prim's variant selection overrides the referenced
    layer's authored default (V over R)."""
    (tmp_path / "asset.usda").write_text(VARIANT_DOC)
    (tmp_path / "main.usda").write_text("""#usda 1.0
def Xform "World"
{
    def "Thing" (
        references = @./asset.usda@
        variants = {
            string shading = "blue"
        }
    )
    {
    }
}
""")
    s = load_usd(str(tmp_path / "main.usda"))
    ball = s.find("/World/Thing/Ball")
    assert ball is not None
    dc = ball.attrs["primvars:displayColor"].value
    np.testing.assert_allclose(np.asarray(dc, np.float64)[0], (0, 0, 1))


def test_crate_rejects_garbage():
    with pytest.raises(ValueError):
        read_usdc(b"NOT-USDC" + b"\0" * 100)


def test_crate_compressed_int_arrays():
    """Compressed int/float array decode paths (the layout modern
    exporters emit for faceVertexIndices)."""
    import struct

    from gatling_tpu.scene import crate as C

    # build a file whose int array uses the compressed representation
    w = C._CrateWriter()
    vals = list(range(100))

    # hand-roll a compressed int-array rep
    enc = C._chunked_compress(C._encode_ints(np.asarray(vals, np.int64)))
    payload = struct.pack("<Q", len(vals)) + struct.pack("<Q", len(enc)) + enc
    off = w._append(payload)
    rep = (C.T_INT << 48) | C._REP_ARRAY | C._REP_COMPRESSED | off
    w.spec("/", C.SPEC_PSEUDO_ROOT, {})
    w.spec("/P", C.SPEC_PRIM, {"typeName": w.rep("Mesh")})
    w.spec("/P.faceVertexIndices", C.SPEC_ATTRIBUTE,
           {"typeName": w.rep("int[]"), "default": rep})
    s = read_usdc(w.tobytes())
    got = s.find("/P").attrs["faceVertexIndices"].value
    assert got == vals


def test_reference_across_binary_layer(tmp_path):
    """Composition arcs cross container formats: a text layer referencing a
    BINARY (.usdc) layer composes identically to text-over-text."""
    lib = """#usda 1.0
(
    defaultPrim = "Cube"
)
def Mesh "Cube"
{
    point3f[] points = [(0,0,0), (1,0,0), (0,1,0)]
    int[] faceVertexCounts = [3]
    int[] faceVertexIndices = [0, 1, 2]
}
"""
    (tmp_path / "lib.usda").write_text(lib)
    save_usdc(parse_usda(lib, compose=False), tmp_path / "lib.usdc")
    main = """#usda 1.0
def "Instance" (
    references = @./lib.usdc@
)
{
}
"""
    (tmp_path / "main.usda").write_text(main)
    from gatling_tpu.scene.stage import load_scene

    sc = load_scene(tmp_path / "main.usda")
    assert len(sc.meshes) == 1
    assert sc.meshes[0].mesh.num_triangles == 1


# ---------------------------------------------------------------------------
# TimeSamples at the render frame (VERDICT r4 item 3; the reference reads
# values at the frame through UsdStage — src/gatling/main.cpp:132, frame
# plumbed at src/hdGatling/renderPass.cpp:131-168)
# ---------------------------------------------------------------------------

ANIMATED = """#usda 1.0
(
    defaultPrim = "Root"
    startTimeCode = 1
)

def Xform "Root"
{
    def Mesh "Tri"
    {
        matrix4d xformOp:transform.timeSamples = {
            1: ( (1,0,0,0), (0,1,0,0), (0,0,1,0), (0,0,0,1) ),
            10: ( (1,0,0,0), (0,1,0,0), (0,0,1,0), (5,0,0,1) ),
        }
        uniform token[] xformOpOrder = ["xformOp:transform"]
        point3f[] points.timeSamples = {
            1: [(0,0,0), (1,0,0), (0,1,0)],
            10: [(0,0,0), (2,0,0), (0,2,0)],
        }
        int[] faceVertexCounts = [3]
        int[] faceVertexIndices = [0, 1, 2]
    }
}
"""


def _tri_world(desc):
    m = desc.meshes[0]
    pts = np.asarray(m.mesh.positions, np.float32).reshape(-1, 3)
    xf = np.asarray(m.transform, np.float32)
    return pts @ xf[:3, :3] + xf[3, :3]


def test_timesamples_frame_resolution(tmp_path):
    """Transform + points authored ONLY as timeSamples: .usda and .usdc
    resolve identically at frame 1, and frame 10 moves/scales the mesh."""
    from gatling_tpu.scene.stage import load_scene

    pa = tmp_path / "anim.usda"
    pa.write_text(ANIMATED)
    pc = tmp_path / "anim.usdc"
    save_usdc(parse_usda(ANIMATED, compose=False), pc)

    for f, expect in ((1.0, np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]])),
                      (10.0, np.array([[5, 0, 0], [7, 0, 0], [5, 2, 0]]))):
        wa = _tri_world(load_scene(pa, frame=f))
        wc = _tri_world(load_scene(pc, frame=f))
        np.testing.assert_allclose(wa, expect, atol=1e-5)
        np.testing.assert_allclose(wc, expect, atol=1e-5)
    # no frame requested -> startTimeCode (= 1) drives resolution
    np.testing.assert_allclose(
        _tri_world(load_scene(pa)),
        np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]]), atol=1e-5)


def test_timesamples_nearest_sample():
    """Held (nearest) interpolation between authored samples."""
    from gatling_tpu.scene.usda import resolve_frame

    s = parse_usda(ANIMATED)
    a = s.find("/Root/Tri").attrs["points"]
    resolve_frame(s, 4.0)   # nearer 1 than 10
    assert tuple(a.value[1]) == (1, 0, 0)
    resolve_frame(s, 8.0)   # nearer 10
    assert tuple(a.value[1]) == (2, 0, 0)


def test_timesamples_beat_default_at_frame():
    """USD value resolution: within a layer, timeSamples are stronger
    than the default at a queried time."""
    from gatling_tpu.scene.usda import resolve_frame

    txt = """#usda 1.0
def Mesh "M"
{
    float r = 0.5
    float r.timeSamples = { 1: 0.1, 2: 0.9 }
}
"""
    s = parse_usda(txt)
    a = s.find("/M").attrs["r"]
    assert a.value == 0.5  # unresolved: the authored default
    resolve_frame(s, 2.0)
    assert a.value == 0.9


# ---------------------------------------------------------------------------
# Adversarial crate layouts (VERDICT r4 item 4): the reader must survive
# what real exporters write, not just the easy fixture subset. Every test
# here consumes write_usdc(adversarial=True) output or hand-crafted bytes —
# never the default writer.
# ---------------------------------------------------------------------------


def _stages_equal(a, b, atol=1e-5):
    pa = {p.path: p for p in a.walk()}
    pb = {p.path: p for p in b.walk()}
    assert sorted(pa) == sorted(pb)
    for path, prim in pa.items():
        other = pb[path]
        assert sorted(prim.attrs) == sorted(other.attrs), path
        for an, attr in prim.attrs.items():
            v1, v2 = attr.value, other.attrs[an].value
            if isinstance(v1, (int, float)) and isinstance(v2, (int, float)):
                assert abs(v1 - v2) <= atol, (path, an)
            elif isinstance(v1, list) and v1 and isinstance(
                    v1[0], (int, float)) and not isinstance(v1[0], bool):
                np.testing.assert_allclose(np.asarray(v1, np.float64),
                                           np.asarray(v2, np.float64),
                                           atol=atol, err_msg=f"{path}.{an}")


def test_adversarial_roundtrip_cornell():
    """Minimal-width delta codes + multi-chunk match-bearing lz4 +
    compressed int/float arrays decode to the same stage."""
    s = load_usda(CORNELL)
    data = write_usdc(s, adversarial=True)
    # the adversarial container must actually differ from the easy one
    assert data != write_usdc(s)
    _stages_equal(s, read_usdc(data, path="adv"))


def test_adversarial_python_lz4_fallback(monkeypatch):
    """Match-bearing blocks through the PURE-PYTHON lz4 decoder (the
    native decoder disabled) — the fallback's match-copy path."""
    import gatling_tpu.native as gn

    s = load_usda(CORNELL)
    data = write_usdc(s, adversarial=True)
    monkeypatch.setattr(gn, "native_lz4_decompress", lambda *a: None)
    _stages_equal(s, read_usdc(data, path="adv-py"))


def test_adversarial_float_lut_and_integral():
    """Float arrays through the 't' (lookup-table) and 'i' (integral)
    compression codes."""
    txt = """#usda 1.0
def Mesh "M"
{
    float[] widths = [0.25, 0.5, 0.25, 0.5, 0.25, 0.5, 0.25, 0.25]
    float[] counts = [1, 2, 3, 4, 5, 6, 7, 8]
}
"""
    s = parse_usda(txt)
    data = write_usdc(s, adversarial=True)
    s2 = read_usdc(data)
    got_w = s2.find("/M").attrs["widths"].value
    got_c = s2.find("/M").attrs["counts"].value
    np.testing.assert_allclose(got_w, [0.25, 0.5] * 3 + [0.25, 0.25])
    np.testing.assert_allclose(got_c, [1, 2, 3, 4, 5, 6, 7, 8])


def test_listop_deleted_ordered_flags():
    """ListOps with deleted (32) / ordered (64) sections parse and the
    deleted/ordered items stay out of the composed item list."""
    from gatling_tpu.scene import crate as C

    w = C._CrateWriter()
    import struct

    # TokenListOp: explicit items [a, b] + deleted [c] + ordered [a]
    payload = bytearray([2 | 32 | 64])
    payload += struct.pack("<Q", 2)
    payload += struct.pack("<I", w.token("a"))
    payload += struct.pack("<I", w.token("b"))
    payload += struct.pack("<Q", 1)
    payload += struct.pack("<I", w.token("c"))
    payload += struct.pack("<Q", 1)
    payload += struct.pack("<I", w.token("a"))
    off = w._append(bytes(payload))
    rep = (C.T_TOKEN_LISTOP << 48) | off
    w.spec("/", C.SPEC_PSEUDO_ROOT, {})
    w.spec("/P", C.SPEC_PRIM, {"typeName": w.rep("Scope"),
                               "apiSchemas": rep})
    s = read_usdc(w.tobytes())
    assert s.find("/P").meta["apiSchemas"] == ["a", "b"]


def test_truncation_fuzz():
    """Truncated crate bytes must raise, never hang or silently
    mis-parse into a different scene."""
    s = parse_usda("""#usda 1.0
def Mesh "M"
{
    point3f[] points = [(0,0,0), (1,0,0), (0,1,0)]
    int[] faceVertexCounts = [3]
    int[] faceVertexIndices = [0, 1, 2]
}
""")
    data = write_usdc(s, adversarial=True)
    full = read_usdc(data)
    n_attrs = sum(len(p.attrs) for p in full.walk())
    for cut in list(range(0, 200, 7)) + list(
            range(200, len(data), max(1, len(data) // 40))):
        trunc = data[:cut]
        try:
            st = read_usdc(trunc)
        except Exception:
            continue  # raising is the expected outcome
        # tolerated alternative: structurally identical prims with
        # dropped-value warnings — never a silently DIFFERENT scene
        assert sorted(p.path for p in st.walk()) == sorted(
            p.path for p in full.walk()), cut
        assert sum(len(p.attrs) for p in st.walk()) == n_attrs, cut


def test_adversarial_timesamples():
    """TimeSamples survive the adversarial container."""
    from gatling_tpu.scene.usda import resolve_frame

    s = parse_usda(ANIMATED)
    s2 = read_usdc(write_usdc(s, adversarial=True), path="adv-ts")
    a = s2.find("/Root/Tri").attrs["points"]
    assert sorted(a.time_samples) == [1.0, 10.0]
    resolve_frame(s2, 10)
    np.testing.assert_allclose(
        np.asarray(a.value, np.float64)[1], (2, 0, 0), atol=1e-6)


def test_crate_roundtrip_property_fuzz():
    """Seeded property fuzz: random typed values (scalars, vecs, matrices,
    arrays, token lists, timeSamples, rels) through write_usdc/read_usdc in
    both plain and adversarial layouts must survive numerically (f32
    storage tolerance; matrix arrays come back as flat 16-tuples per pxr's
    array-of-Matrix4d convention). The matrix4d[] writer bug (mangled to a
    2-float array) would have been caught here."""
    import random

    rng = random.Random(7)

    def rand_value():
        kind = rng.choice(["int", "float", "str", "bool", "vec2", "vec3",
                           "vec4", "mat4", "int_arr", "float_arr",
                           "vec3_arr", "tok_arr", "mat4_arr"])
        if kind == "int":
            return rng.randint(-2 ** 30, 2 ** 30)
        if kind == "float":
            return round(rng.uniform(-1e3, 1e3), 4)
        if kind == "str":
            return "tok%d" % rng.randint(0, 99)
        if kind == "bool":
            return rng.random() < 0.5
        if kind in ("vec2", "vec3", "vec4"):
            k = int(kind[3])
            return tuple(round(rng.uniform(-9, 9), 3) for _ in range(k))
        if kind == "mat4":
            return tuple(tuple(round(rng.uniform(-9, 9), 3)
                               for _ in range(4)) for _ in range(4))
        n = rng.randint(0, 9)
        if kind == "int_arr":
            return [rng.randint(-1000, 1000) for _ in range(n)]
        if kind == "float_arr":
            return [round(rng.uniform(-99, 99), 3) for _ in range(n)]
        if kind == "vec3_arr":
            return [tuple(round(rng.uniform(-9, 9), 3) for _ in range(3))
                    for _ in range(max(n, 1))]
        if kind == "tok_arr":
            return ["t%d" % rng.randint(0, 50) for _ in range(n)]
        return [tuple(tuple(round(rng.uniform(-9, 9), 3) for _ in range(4))
                      for _ in range(4)) for _ in range(max(n, 1))]

    def equal(sent, got):
        def is_num(v):
            if isinstance(v, (bool, int, float, np.generic)):
                return True
            return isinstance(v, (list, tuple)) and all(is_num(x) for x in v)
        if is_num(sent) and is_num(got):
            a = np.asarray(sent, np.float64).reshape(-1)
            b = np.asarray(got, np.float64).reshape(-1)
            return a.shape == b.shape and np.allclose(a, b, rtol=1e-5,
                                                      atol=1e-3)
        return sent == got or list(sent) == list(got)

    from gatling_tpu.scene.crate import read_usdc, write_usdc
    from gatling_tpu.scene.usda import Attr, Prim, Stage

    for trial in range(100):
        root = Prim(name="", type_name="", path="")
        stage = Stage(root=root, meta={})
        p = Prim(name="P", type_name="Xform", path="/P")
        root.children["P"] = p
        sent = {}
        for i in range(rng.randint(1, 6)):
            v = rand_value()
            sent[f"a{i}"] = v
            a = Attr(type_name="float", value=v)
            if rng.random() < 0.3:
                a.time_samples = {1.0: v, 2.0: rand_value()}
            p.attrs[f"a{i}"] = a
        if rng.random() < 0.5:
            p.rels["relx"] = ["/P"]
        st2 = read_usdc(write_usdc(stage, adversarial=(trial % 2 == 1)))
        q = st2.find("/P")
        assert q is not None, f"trial {trial}: prim lost"
        for name, v in sent.items():
            got = q.attrs.get(name)
            assert got is not None, f"trial {trial}: {name} missing"
            assert equal(v, got.value), \
                f"trial {trial}: {name} sent {v!r} got {got.value!r}"
            ts = p.attrs[name].time_samples
            if ts:
                gts = got.time_samples
                assert gts and all(equal(ts[k], gts.get(k)) for k in ts), \
                    f"trial {trial}: {name} timeSamples mismatch"
        if p.rels:
            assert q.rels.get("relx") == ["/P"], f"trial {trial}: rel lost"
