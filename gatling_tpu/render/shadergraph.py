"""Shader node-graph lowering: network chains -> affine-over-texture values.

The mc-layer graph compiler analog (reference: src/mc/impl/
MtlxMdlCodeGen.cpp:217-287 compiles arbitrary MaterialX node graphs through
the MDL backend). The TPU build's uber-BSDF consumes per-material constants
plus at most one texture per parameter, where the texture pool applies a
per-slot affine `sample * scale + bias` at lookup time
(render/texture.py sample_pool). This module folds node-graph chains into
exactly that representation:

    GraphValue = constant rgba            (no texture in the subtree)
               | affine(texture): s*T + b (one texture + folded math)

Supported nodes: UsdUVTexture / image / tiledimage leaves, constant,
multiply, divide, add, subtract, mix, clamp, normalmap, convert,
swizzle/extract, UsdPrimvarReader*/texcoord/geompropvalue (fallback
constants). Chains of any depth fold as long as they stay affine in a
single texture; anything beyond (two textures in one binary op, a textured
mix factor, clamp or divide over a texture) carries the EXACT subtree as an
Expr, which the texture manager BAKES into a composite texture at
pool-build time (render/texture.py TextureManager._eval_bake) — exact at
texel centers, one pool slot at render time, no per-ray procedural cost.
Only genuinely unknown nodes fall back to constants (logged).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any

from gatling_tpu.render.texture import TextureRef
from gatling_tpu.utils.log import get_logger

_CH = {"r": 0, "g": 1, "b": 2, "a": 3}


def _vec4(v: Any, default=(0.0, 0.0, 0.0, 1.0)) -> tuple[float, float, float, float]:
    if v is None:
        return tuple(default)
    if isinstance(v, (int, float, bool)):
        f = float(v)
        return (f, f, f, f)
    v = tuple(float(x) for x in v)
    return (v + (0.0, 0.0, 0.0, 1.0))[:4]


@dataclasses.dataclass(frozen=True)
class Expr:
    """Exact (non-affine) shader-graph subtree, kept alongside the affine
    approximation so the texture manager can BAKE it into a composite
    texture at pool-build time (render/texture.py _eval_bake): per-ray
    procedural evaluation would pay the measured ~8-cycles-per-gathered-row
    XLA cost per texture node, while a baked composite costs the same one
    gather as any other texture — exact at texel centers (all leaves are
    sampled with the same uv in this material model)."""

    # const | tex | multiply | divide | add | subtract | mix | clamp |
    # extract | dot | abs | power | viewdir | normalvec | primvar
    # (viewdir/normalvec/primvar are DYNAMIC leaves — per-ray values the
    # wavefront integrator substitutes at shading time; expr_is_dynamic
    # detects them. primvar carries the primvar name in `channel` — the
    # scene-data lookup analog, mdl_interface.glsl scene_data_lookup_* /
    # rp_main.h scene-data infos)
    op: str
    const: tuple[float, float, float, float] | None = None
    tex: TextureRef | None = None
    args: tuple["Expr", ...] = ()
    channel: str = ""


def _const_expr(c) -> Expr:
    return Expr(op="const", const=_vec4(c))


_DYNAMIC_LEAVES = ("viewdir", "normalvec", "primvar")

# per-corner primvar channels the geometry pipeline interpolates; other
# names fall back to the reader's fallback constant (logged). The reference
# packs up to 6 arbitrary scene-data infos per mesh (rp_main.h:125-145);
# here displayColor rides the packed c0/c1/c2 rows (ops/geometry.py).
_INTERPOLATED_PRIMVARS = ("displayColor",)


def expr_is_dynamic(e: Expr | None) -> bool:
    """True when the subtree reads per-ray state (view direction / shading
    normal) — such exprs cannot be baked into textures; the wavefront
    integrator evaluates them per hit (eval_dynamic_expr)."""
    if e is None:
        return False
    if e.op in _DYNAMIC_LEAVES:
        return True
    return any(expr_is_dynamic(a) for a in e.args)


def expr_reads_primvar(e: Expr | None) -> bool:
    """True when the subtree contains a scene-data (primvar) leaf."""
    if e is None:
        return False
    if e.op == "primvar":
        return True
    return any(expr_reads_primvar(a) for a in e.args)


def expr_primvar_channels(e: Expr | None) -> set:
    """Names of all primvar leaves in the subtree."""
    if e is None:
        return set()
    out = {e.channel} if e.op == "primvar" else set()
    for a in e.args:
        out |= expr_primvar_channels(a)
    return out


def expr_dynamic_beyond(e: Expr | None, resolvable: set) -> bool:
    """True when the expr genuinely needs per-hit evaluation: it reads
    view/normal state or a primvar the renderer can resolve. Exprs whose
    only dynamic leaves are UNRESOLVABLE primvars evaluate to their
    fallback constants — keeping them static avoids demoting the whole
    scene to the wavefront for nothing."""
    if e is None:
        return False
    if e.op in ("viewdir", "normalvec"):
        return True
    if e.op == "primvar":
        return e.channel in resolvable
    return any(expr_dynamic_beyond(a, resolvable) for a in e.args)


def expr_has_texture(e: Expr | None) -> bool:
    if e is None:
        return False
    if e.op == "tex":
        return True
    return any(expr_has_texture(a) for a in e.args)


def eval_dynamic_expr(e: Expr, view_dir, normal, primvars=None):
    """Evaluate a dynamic expr per ray: view_dir/normal are [N,3] jnp
    arrays (view_dir points camera -> surface, the MDL state::direction
    convention the reference's generated code reads). `primvars` maps
    primvar name -> [N,3] interpolated values (the scene-data renderer
    state, mdl_interface.glsl scene_data_lookup_*). Returns [N,4].

    Vector-aware ops: dot reduces the first 3 components; everything else
    is elementwise over rgba. Texture leaves are excluded at lowering
    (material.py falls back to the affine approximation for tex+dynamic
    mixes), so this evaluator touches no memory beyond the hit state."""
    import jax.numpy as jnp

    n = view_dir.shape[0]

    def pad4(v3):
        return jnp.concatenate([v3, jnp.zeros((n, 1), v3.dtype)], axis=1)

    def ev(x: Expr):
        if x.op == "const":
            return jnp.broadcast_to(jnp.asarray(x.const, jnp.float32), (n, 4))
        if x.op == "viewdir":
            return pad4(view_dir)
        if x.op == "normalvec":
            return pad4(normal)
        if x.op == "primvar":
            if primvars and x.channel in primvars:
                return pad4(primvars[x.channel])
            return jnp.broadcast_to(
                jnp.asarray(_vec4(x.const), jnp.float32), (n, 4))
        if x.op == "dot":
            a, b = ev(x.args[0]), ev(x.args[1])
            d = jnp.sum(a[:, :3] * b[:, :3], axis=1, keepdims=True)
            return jnp.broadcast_to(d, (n, 4))
        if x.op == "multiply":
            return ev(x.args[0]) * ev(x.args[1])
        if x.op == "divide":
            b = ev(x.args[1])
            return jnp.where(b != 0.0, ev(x.args[0]) / jnp.where(b == 0.0, 1.0, b), 0.0)
        if x.op == "add":
            return ev(x.args[0]) + ev(x.args[1])
        if x.op == "subtract":
            return ev(x.args[0]) - ev(x.args[1])
        if x.op == "mix":
            fg, bg, m = ev(x.args[0]), ev(x.args[1]), ev(x.args[2])
            return fg * m + bg * (1.0 - m)
        if x.op == "clamp":
            return jnp.clip(ev(x.args[0]), ev(x.args[1]), ev(x.args[2]))
        if x.op == "abs":
            return jnp.abs(ev(x.args[0]))
        if x.op == "power":
            a, b = ev(x.args[0]), ev(x.args[1])
            return jnp.power(jnp.maximum(a, 0.0), b)
        if x.op == "extract":
            v = ev(x.args[0])
            i = _CH.get(x.channel, 0)
            return jnp.broadcast_to(v[:, i:i + 1], (n, 4))
        # tex (excluded at lowering) and unknown ops: constant fallback
        return jnp.broadcast_to(jnp.asarray(_vec4(None), jnp.float32), (n, 4))

    return ev(e)


@dataclasses.dataclass(frozen=True)
class GraphValue:
    """A lowered shader-graph subtree: rgba constant, optionally modulating
    one texture via the pool-level affine (value = sample*scale + bias,
    with `constant` as the connection's fallback value). When the subtree
    is NOT affine in a single texture, `expr` carries the exact program
    (constant/texture then hold the affine approximation)."""

    constant: tuple[float, float, float, float]
    texture: TextureRef | None = None
    expr: Expr | None = None

    @property
    def exact(self) -> Expr:
        """The exact subtree as an Expr (for baking)."""
        if self.expr is not None:
            return self.expr
        if self.texture is not None:
            return Expr(op="tex", tex=self.texture)
        return _const_expr(self.constant)

    def with_affine(self, scale=(1, 1, 1, 1), bias=(0, 0, 0, 0)) -> "GraphValue":
        """Compose value -> value*scale + bias."""
        s = _vec4(scale, (1, 1, 1, 1))
        b = _vec4(bias, (0, 0, 0, 0))
        const = tuple(c * sc + bc for c, sc, bc in zip(self.constant, s, b))
        expr = None
        if self.expr is not None:
            expr = Expr(op="add", args=(
                Expr(op="multiply", args=(self.expr, _const_expr(s))),
                _const_expr(b)))
        if self.texture is None:
            return GraphValue(constant=const, expr=expr)
        ts = tuple(a * b2 for a, b2 in zip(self.texture.scale, s))
        tb = tuple(a * s2 + b2 for a, s2, b2 in zip(self.texture.bias, s, b))
        return GraphValue(
            constant=const,
            texture=dataclasses.replace(self.texture, scale=ts, bias=tb),
            expr=expr)


def _binary(op: str, a: GraphValue, b: GraphValue, node_id: str) -> GraphValue:
    """Fold a binary node. Affine-preserving combinations fold exactly into
    the pool-level scale/bias; anything beyond (a texture on both sides, a
    division by a texture, an already-non-affine operand) records the exact
    Expr for composite baking and keeps the affine form as the fallback."""
    nonaffine = (a.expr is not None or b.expr is not None
                 or (a.texture is not None and b.texture is not None)
                 or (op == "divide" and b.texture is not None))
    if nonaffine:
        get_logger().info(
            "shader graph: %s is not affine in one texture; baking a "
            "composite texture", node_id)
        expr = Expr(op=op, args=(a.exact, b.exact))
        approx = _binary(op,
                         GraphValue(constant=a.constant, texture=a.texture),
                         GraphValue(constant=b.constant), node_id)
        return dataclasses.replace(approx, expr=expr)

    if op == "multiply":
        if b.texture is not None:
            a, b = b, a
        return a.with_affine(scale=b.constant)
    if op == "divide":
        inv = tuple(1.0 / c if c != 0.0 else 0.0 for c in b.constant)
        return a.with_affine(scale=inv)
    if op == "add":
        if b.texture is not None:
            a, b = b, a
        return a.with_affine(bias=b.constant)
    if op == "subtract":
        if b.texture is not None:
            # a - (s*T + t_b) = -1*(s*T + t_b) + a
            return b.with_affine(scale=(-1, -1, -1, -1), bias=a.constant)
        return a.with_affine(bias=tuple(-c for c in b.constant))
    raise ValueError(op)


def _mix(fg: GraphValue, bg: GraphValue, mix: GraphValue, node_id: str) -> GraphValue:
    """MaterialX mix: out = fg*mix + bg*(1-mix). Affine when at most one
    operand carries a texture and the factor is constant; anything beyond
    bakes a composite texture."""
    n_tex = sum(v.texture is not None for v in (fg, bg, mix))
    if (fg.expr is not None or bg.expr is not None or mix.expr is not None
            or n_tex > 1 or mix.texture is not None):
        get_logger().info(
            "shader graph: %s is not affine in one texture; baking a "
            "composite texture", node_id)
        expr = Expr(op="mix", args=(fg.exact, bg.exact, mix.exact))
        approx = _mix(GraphValue(constant=fg.constant, texture=fg.texture),
                      GraphValue(constant=bg.constant),
                      GraphValue(constant=mix.constant), node_id)
        return dataclasses.replace(approx, expr=expr)
    m = mix.constant
    one_m = tuple(1.0 - c for c in m)
    if bg.texture is not None:
        return bg.with_affine(
            scale=one_m, bias=tuple(f * c for f, c in zip(fg.constant, m)))
    return fg.with_affine(
        scale=m, bias=tuple(b * c for b, c in zip(bg.constant, one_m)))


_WRAP_MAP = {"periodic": "repeat", "clamp": "clamp", "mirror": "mirror",
             "constant": "black"}

# MaterialX nodedef-name type suffixes (ND_<node>_<outtype>[_<intype>])
_ND_TYPE_TOKENS = {
    "float", "color3", "color4", "vector2", "vector3", "vector4", "integer",
    "boolean", "string", "filename", "surfaceshader", "displacementshader",
    "matrix33", "matrix44", "color3FA", "color4FA", "vector2FA", "vector3FA",
    "vector4FA",
}


# procedural generator nodes: uv-space functions baked through the texture
# manager's composite path (_eval_bake) — exact at texel centers, one pool
# slot at render time. 3D variants evaluate at position=(u,v,0): the
# documented approximation for baking a position-domain generator into the
# uv-indexed pool (the reference compiles these to per-hit MDL code,
# MtlxMdlCodeGen.cpp:217-287).
_PROC_GENERATORS = (
    "checkerboard", "ramplr", "ramptb", "ramp4", "noise2d", "noise3d",
    "fractal3d", "cellnoise2d", "cellnoise3d", "worleynoise2d",
    "worleynoise3d",
)


def normalize_shader_id(sid: str) -> str:
    """USD-authored MaterialX nodes carry nodedef names (`ND_multiply_color3`,
    `ND_image_color3`, `ND_frame_float`); strip the prefix and type suffixes
    so both authoring routes (mtlx XML tags and USD info:id) hit the same
    node handlers."""
    if not sid.startswith("ND_"):
        return sid
    parts = sid[3:].split("_")
    while len(parts) > 1 and parts[-1] in _ND_TYPE_TOKENS:
        parts.pop()
    return "_".join(parts)


class GraphLowering:
    """Recursive evaluator over one material's node dict."""

    def __init__(self, desc, frame: float = 0.0) -> None:
        self.desc = desc
        self.frame = float(frame)
        self._stack: list[str] = []  # cycle guard

    def _resolve_path(self, path: str) -> str:
        if self.desc.base_dir and not os.path.isabs(path):
            return os.path.join(self.desc.base_dir, path)
        return path

    def eval_input(self, node, name: str, default, color_hint: bool) -> GraphValue:
        """Evaluate one shader input: a constant, or the lowered subtree of
        its connected node."""
        if name in node.input_connections:
            target_path, out_name = node.input_connections[name]
            target = self.desc.nodes.get(target_path)
            if target is None:
                return GraphValue(constant=_vec4(default))
            return self.eval_node(target, out_name, default, color_hint)
        if name in node.inputs:
            return GraphValue(constant=_vec4(node.inputs[name]))
        return GraphValue(constant=_vec4(default))

    def eval_node(self, node, out_name: str, default, color_hint: bool) -> GraphValue:
        if node.path in self._stack:
            get_logger().warning("shader graph: cycle at %s", node.path)
            return GraphValue(constant=_vec4(default))
        self._stack.append(node.path)
        try:
            return self._eval_node(node, out_name, default, color_hint)
        finally:
            self._stack.pop()

    def _leaf_texture(self, node, out_name: str, default, color_hint: bool,
                      usd: bool) -> GraphValue:
        tex_file = node.inputs.get("file")
        if usd:
            fallback = node.inputs.get("fallback", default)
            cs = str(node.inputs.get("sourceColorSpace", "auto"))
            # 'auto': color inputs default to sRGB, data inputs to raw
            # (UsdUVTexture colorspace inference, MtlxDocumentPatcher.cpp:201+)
            is_srgb = cs == "sRGB" or (cs == "auto" and color_hint)
        else:
            fallback = node.inputs.get("default", default)
            cs = str(node.inputs.get("colorspace", ""))
            is_srgb = cs in ("srgb_texture", "sRGB") or (not cs and color_hint)
        if not tex_file:
            return GraphValue(constant=_vec4(fallback))
        if usd:
            ref = TextureRef(
                file_path=self._resolve_path(str(tex_file)),
                is_srgb=is_srgb,
                wrap_s=str(node.inputs.get("wrapS", "useMetadata")),
                wrap_t=str(node.inputs.get("wrapT", "useMetadata")),
                scale=_vec4(node.inputs.get("scale"), (1, 1, 1, 1)),
                bias=_vec4(node.inputs.get("bias"), (0, 0, 0, 0)),
                channel=out_name if out_name in _CH else "rgb",
            )
        else:
            ref = TextureRef(
                file_path=self._resolve_path(str(tex_file)),
                is_srgb=is_srgb,
                wrap_s=_WRAP_MAP.get(str(node.inputs.get("uaddressmode", "periodic")), "repeat"),
                wrap_t=_WRAP_MAP.get(str(node.inputs.get("vaddressmode", "periodic")), "repeat"),
                channel=out_name if out_name in _CH else "rgb",
            )
        return GraphValue(constant=_vec4(fallback), texture=ref)

    def _eval_node(self, node, out_name: str, default, color_hint: bool) -> GraphValue:
        sid = normalize_shader_id(node.shader_id)
        ev = lambda name, d=(0.0, 0.0, 0.0, 1.0), hint=False: self.eval_input(  # noqa: E731
            node, name, d, hint)

        if sid == "UsdUVTexture":
            return self._leaf_texture(node, out_name, default, color_hint, usd=True)
        if sid in ("image", "tiledimage"):
            return self._leaf_texture(node, out_name, default, color_hint, usd=False)
        if sid == "constant":
            return GraphValue(constant=_vec4(node.inputs.get("value", default)))
        if sid in ("multiply", "divide", "add", "subtract"):
            a = ev("in1", hint=color_hint)
            b = ev("in2", (1.0, 1.0, 1.0, 1.0) if sid in ("multiply", "divide")
                   else (0.0, 0.0, 0.0, 0.0))
            return _binary(sid, a, b, f"{sid}@{node.path}")
        if sid == "mix":
            fg = ev("fg", hint=color_hint)
            bg = ev("bg", hint=color_hint)
            mx = ev("mix", (0.0, 0.0, 0.0, 0.0))
            return _mix(fg, bg, mx, f"mix@{node.path}")
        if sid == "clamp":
            v = ev("in", hint=color_hint)
            lo = ev("low", (0.0, 0.0, 0.0, 0.0)).constant
            hi = ev("high", (1.0, 1.0, 1.0, 1.0)).constant
            const = tuple(min(max(c, l), h) for c, l, h in zip(v.constant, lo, hi))
            if v.texture is not None or v.expr is not None:
                # clamp is not affine: bake the exact composite
                expr = Expr(op="clamp",
                            args=(v.exact, _const_expr(lo), _const_expr(hi)))
                return GraphValue(constant=const, texture=v.texture, expr=expr)
            return GraphValue(constant=const)
        if sid == "convert":
            return ev("in", default, color_hint)
        if sid in ("swizzle", "extract", "separate2", "separate3", "separate4"):
            v = ev("in", default, color_hint)
            ch = str(node.inputs.get("channels", out_name or "r")).lower()
            if len(ch) == 1 and ch in _CH:
                i = _CH[ch]
                const = (v.constant[i],) * 4
                if v.expr is not None:
                    return GraphValue(constant=const, texture=v.texture, expr=Expr(
                        op="extract", channel=ch, args=(v.expr,)))
                if v.texture is not None:
                    return GraphValue(constant=const, texture=dataclasses.replace(
                        v.texture, channel=ch))
                return GraphValue(constant=const)
            return v
        if sid == "normalmap":
            v = ev("in", (0.5, 0.5, 1.0), False)
            # tangent-space decode: map [0,1] -> [-1,1] (the reference's
            # normal-map scale/bias patch, previewSurfaceNetworkPatcher.cpp)
            return v.with_affine(scale=(2.0, 2.0, 2.0, 1.0), bias=(-1.0, -1.0, -1.0, 0.0))
        if sid == "viewdirection":
            # per-ray dynamic leaf (world space, camera -> surface — the
            # MDL state::direction convention the reference's generated
            # code reads; Materials.MtlxViewDirection analog)
            return GraphValue(constant=(0.0, 0.0, 1.0, 0.0),
                              expr=Expr(op="viewdir"))
        if sid == "normal" and not node.input_connections:
            # world-space shading normal as a value node
            return GraphValue(constant=(0.0, 0.0, 1.0, 0.0),
                              expr=Expr(op="normalvec"))
        if sid == "dotproduct":
            a = ev("in1")
            b = ev("in2")
            d = sum(x * y for x, y in zip(a.constant[:3], b.constant[:3]))
            return GraphValue(constant=(d, d, d, d),
                              expr=Expr(op="dot", args=(a.exact, b.exact)))
        if sid == "absval":
            v = ev("in", default, color_hint)
            const = tuple(abs(c) for c in v.constant)
            if v.texture is None and v.expr is None:
                return GraphValue(constant=const)
            return GraphValue(constant=const, texture=v.texture,
                              expr=Expr(op="abs", args=(v.exact,)))
        if sid == "power":
            a = ev("in1", default, color_hint)
            b = ev("in2", (1.0, 1.0, 1.0, 1.0))
            const = tuple(max(x, 0.0) ** y for x, y in zip(a.constant, b.constant))
            if (a.texture is None and a.expr is None
                    and b.texture is None and b.expr is None):
                return GraphValue(constant=const)
            return GraphValue(constant=const, texture=a.texture,
                              expr=Expr(op="power", args=(a.exact, b.exact)))
        if sid in ("frame", "time"):
            # current frame folds to a constant at lowering time; materials
            # containing these nodes carry the is_animated trait and are
            # re-lowered whenever the frame render setting changes (the
            # reference's time-node detection, MtlxMdlCodeGen.cpp:116-144)
            val = self.frame
            if sid == "time":
                fps = float(node.inputs.get("fps", 24.0) or 24.0)
                val = val / fps
            return GraphValue(constant=(val, val, val, val))
        if sid.startswith("UsdPrimvarReader") or sid == "geompropvalue":
            # scene-data (primvar) lookup: interpolated channels become
            # DYNAMIC leaves the wavefront integrator substitutes per hit
            # (the reference reads packed scene-data infos from the BLAS
            # payload, mdl_interface.glsl scene_data_lookup_* /
            # Frontend.cpp scene-data names); names the geometry pipeline
            # does not interpolate fall back to the reader's constant
            var = str(node.inputs.get("varname",
                                      node.inputs.get("geomprop", "")))
            fallback = _vec4(node.inputs.get("fallback",
                                             node.inputs.get("default", default)))
            if var:
                # every named primvar becomes a dynamic leaf: displayColor
                # resolves from the interpolated vertex-color rows,
                # instance-rate names from the instance tables
                # (build_instance_primvar_tables), anything unresolvable
                # evaluates to the reader's fallback constant — gi drops
                # exprs with only-unresolvable leaves before they can
                # demote the scene to the wavefront
                return GraphValue(constant=fallback,
                                  expr=Expr(op="primvar", channel=var,
                                            const=fallback))
            return GraphValue(constant=fallback)
        if sid == "texcoord":
            # bakeable uv leaf: math over texcoord bakes over the texel grid
            # (the reference reads state::texture_coordinate in MDL code)
            return GraphValue(constant=_vec4(node.inputs.get("fallback", default)),
                              expr=Expr(op="texcoord"))
        if sid in _PROC_GENERATORS:
            return self._eval_proc_node(node, sid, ev, color_hint)
        get_logger().debug("shader graph: unhandled node %s (%s)", sid, node.path)
        return GraphValue(constant=_vec4(default))

    def _eval_proc_node(self, node, sid: str, ev, color_hint: bool) -> GraphValue:
        """Procedural generator -> Expr leaf for the texture baker.
        Value-like inputs (colors, amplitude, pivot) stay Exprs so textured
        parameters compose; shape scalars (tiling, octaves, jitter) fold
        into the Expr's const quad."""
        def c4(name, d):
            return _vec4(ev(name, _vec4(d)).constant, _vec4(d))

        if sid == "checkerboard":
            a = ev("in1", (1.0, 1.0, 1.0, 1.0), color_hint)
            b = ev("in2", (0.0, 0.0, 0.0, 1.0), color_hint)
            tile = c4("uvtiling", (8.0, 8.0, 0.0, 0.0))
            off = c4("uvoffset", (0.0, 0.0, 0.0, 0.0))
            mean = tuple((x + y) / 2 for x, y in zip(a.constant, b.constant))
            return GraphValue(constant=mean, expr=Expr(
                op=sid, const=(tile[0], tile[1], off[0], off[1]),
                args=(a.exact, b.exact)))
        if sid in ("ramplr", "ramptb"):
            a_name, b_name = (("valuel", "valuer") if sid == "ramplr"
                              else ("valuet", "valueb"))
            a = ev(a_name, (0.0, 0.0, 0.0, 1.0), color_hint)
            b = ev(b_name, (1.0, 1.0, 1.0, 1.0), color_hint)
            mean = tuple((x + y) / 2 for x, y in zip(a.constant, b.constant))
            return GraphValue(constant=mean,
                              expr=Expr(op=sid, args=(a.exact, b.exact)))
        if sid == "ramp4":
            vs = [ev(n, (0.0, 0.0, 0.0, 1.0), color_hint)
                  for n in ("valuetl", "valuetr", "valuebl", "valuebr")]
            mean = tuple(sum(v.constant[i] for v in vs) / 4 for i in range(4))
            return GraphValue(constant=mean, expr=Expr(
                op=sid, args=tuple(v.exact for v in vs)))
        if sid in ("noise2d", "noise3d"):
            amp = ev("amplitude", (1.0, 1.0, 1.0, 1.0))
            piv = ev("pivot", (0.0, 0.0, 0.0, 0.0))
            return GraphValue(constant=piv.constant, expr=Expr(
                op=sid, args=(amp.exact, piv.exact)))
        if sid == "fractal3d":
            amp = ev("amplitude", (1.0, 1.0, 1.0, 1.0))
            octaves = float(c4("octaves", (3.0,) * 4)[0])
            lac = float(c4("lacunarity", (2.0,) * 4)[0])
            dim = float(c4("diminish", (0.5,) * 4)[0])
            return GraphValue(constant=(0.0, 0.0, 0.0, 0.0), expr=Expr(
                op=sid, const=(octaves, lac, dim, 0.0), args=(amp.exact,)))
        if sid in ("cellnoise2d", "cellnoise3d"):
            return GraphValue(constant=(0.5, 0.5, 0.5, 0.5), expr=Expr(op=sid))
        # worleynoise2d / worleynoise3d
        jitter = float(c4("jitter", (1.0,) * 4)[0])
        return GraphValue(constant=(0.5, 0.5, 0.5, 0.5), expr=Expr(
            op=sid, const=(jitter, 0.0, 0.0, 0.0)))
