"""Multi-chip rendering: tile + spp sharding over a jax device mesh.

This subsystem has NO reference counterpart — the reference is strictly
single-GPU (SURVEY.md §2.10); its scaling axes (image size, spp, bounce
depth) all live inside one vkCmdTraceRays dispatch. The TPU-native design:

* a 2D mesh ("tiles", "spp"): the framebuffer pixel dimension is sharded
  across the "tiles" axis (each chip owns a contiguous row-block and traces
  it independently — zero communication), and samples-per-pixel are sharded
  across the "spp" axis (each chip renders the full tile slice with a
  disjoint sample_offset window, merged by a psum mean over ICI),
* the scene (triangle soup, material table, light tables, dome texture) is
  replicated — it is small relative to HBM and read-only,
* progressive-accumulation state (the AOV buffers) stays sharded over
  "tiles" so no gather is ever needed; only the spp-axis reduction crosses
  chips.

RNG decorrelation across the spp axis falls out of the reference's
rng_init(pixel, sample) hashing — each chip uses a disjoint sample range.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from gatling_tpu.interface import LightArrays
from gatling_tpu.ops.geometry import SceneGeometry
from gatling_tpu.render.integrator import (
    DomeLightData,
    RenderConfig,
    SampleResult,
    Uniforms,
    blend_aovs,
    render_pixels,
)
from gatling_tpu.render.material import MaterialTable
from gatling_tpu.render.texture import TexturePool, empty_pool


def make_mesh(n_tiles: int | None = None, n_spp: int = 1, devices=None) -> Mesh:
    """Build a ("tiles", "spp") mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_tiles is None:
        n_tiles = len(devices) // n_spp
    if n_tiles * n_spp != len(devices):
        devices = devices[: n_tiles * n_spp]
    arr = np.asarray(devices).reshape(n_tiles, n_spp)
    return Mesh(arr, axis_names=("tiles", "spp"))


def _merge_spp_axis(res: SampleResult, spp_size: int) -> SampleResult:
    """Combine per-spp-shard results over the "spp" mesh axis.

    Accumulating channels (color, normal, albedo, ...) pmean; depth pmin.
    The id/flag channels are only well-defined when every spp shard sees the
    SAME first hit — true for unjittered pixel centers, and true in
    expectation under jitter (ids of the dominant surface win the AOV).
    pmin on ids keeps the merge deterministic rather than semantically
    meaningful across shards; the single-chip path is authoritative for
    id AOVs (the reference never shards them at all — SURVEY §2.10)."""
    if spp_size == 1:
        return res
    color = jax.lax.pmean(res.color, "spp")
    bounces = jax.lax.pmax(res.bounces, "spp")
    f = res.first
    first = f._replace(
        normal=jax.lax.pmean(f.normal, "spp"),
        albedo=jax.lax.pmean(f.albedo, "spp"),
        barycentrics=jax.lax.pmean(f.barycentrics, "spp"),
        texcoords=jax.lax.pmean(f.texcoords, "spp"),
        tangents=jax.lax.pmean(f.tangents, "spp"),
        bitangents=jax.lax.pmean(f.bitangents, "spp"),
        depth=jax.lax.pmin(f.depth, "spp"),
        object_id=jax.lax.pmin(f.object_id, "spp"),
        face_id=jax.lax.pmin(f.face_id, "spp"),
        instance_id=jax.lax.pmin(f.instance_id, "spp"),
        thin_walled=jax.lax.pmean(f.thin_walled, "spp"),
        double_sided=jax.lax.pmean(f.double_sided, "spp"),
        opacity=jax.lax.pmean(f.opacity, "spp"),
        nee=jax.lax.pmean(f.nee, "spp"),
        hit=jax.lax.pmax(f.hit.astype(jnp.int32), "spp") > 0,
    )
    return SampleResult(color=color, bounces=bounces, first=first)


def render_frame_sharded(
    config: RenderConfig,
    uniforms: Uniforms,
    geom: SceneGeometry,
    materials: MaterialTable,
    lights: LightArrays,
    dome: DomeLightData,
    aovs: dict[str, jnp.ndarray],
    mesh: Mesh,
    textures: TexturePool | None = None,
) -> dict[str, jnp.ndarray]:
    """Multi-chip render step: tiles x spp sharded, psum-merged over ICI.

    config.spp is the GLOBAL sample count; it must divide by the spp-axis
    size. The total pixel count must divide by the tiles-axis size.
    """
    n_tiles = mesh.shape["tiles"]
    n_spp_shards = mesh.shape["spp"]
    n = config.width * config.height
    if n % n_tiles != 0:
        raise ValueError(f"pixel count {n} not divisible by tile axis {n_tiles}")
    if config.spp % n_spp_shards != 0:
        raise ValueError(f"spp {config.spp} not divisible by spp axis {n_spp_shards}")
    local_spp = config.spp // n_spp_shards
    if textures is None:
        textures = empty_pool()

    pixel_index = jnp.arange(n, dtype=jnp.int32)

    def shard_fn(pixel_idx, uniforms, geom, materials, lights, dome, textures, aovs):
        spp_rank = jax.lax.axis_index("spp")
        # disjoint sample window per spp shard keeps PCG streams decorrelated
        sample_offset = uniforms.sample_offset + spp_rank * local_spp
        res = render_pixels(config, uniforms, geom, materials, lights, dome,
                            pixel_idx, local_spp, sample_offset, textures)
        res = _merge_spp_axis(res, n_spp_shards)
        return blend_aovs(config, uniforms, aovs, res)

    aov_spec = {k: P("tiles") for k in aovs}
    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("tiles"), P(), P(), P(), P(), P(), P(), aov_spec),
        out_specs=aov_spec,
        check_vma=False,
    )
    return fn(pixel_index, uniforms, geom, materials, lights, dome, textures, aovs)


@partial(jax.jit, static_argnames=("config", "mesh"))
def render_frame_sharded_jit(config, uniforms, geom, materials, lights, dome, aovs,
                             mesh, textures=None):
    return render_frame_sharded(config, uniforms, geom, materials, lights, dome,
                                aovs, mesh, textures)


def render_fused_sharded(
    config: RenderConfig,
    uniforms: Uniforms,
    scene,          # ops.pallas_bounce.FusedScene (replicated)
    static,         # ops.pallas_bounce.FusedStatic (compile-time)
    dome: DomeLightData,
    mesh: Mesh,
    materials=None,  # MaterialTable (replicated; textured split-bounce)
    textures=None,   # TexturePool (replicated; textured split-bounce)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Multi-chip FUSED render: the [16, R/128, 128] bounce-kernel state is
    embarrassingly parallel over the "tiles" axis (PERF.md round-2 #6) —
    each chip runs the fused megakernel on its row-block of the framebuffer;
    samples shard over "spp" with a psum mean. Returns (color [N,3],
    traced-segments [N]) in framebuffer order.

    The scene tables (triangles or HBM clusters, materials, lights, AABBs,
    texture pool) are replicated: they are read-only and small relative to
    HBM, so no collective ever touches them — only the spp reduction crosses
    ICI. The textured split-bounce mode (static.textured) shards the same
    way: its XLA texture stage gathers from the replicated pool per shard.
    """
    from gatling_tpu.render.fused import render_pixels_fused

    n_tiles = mesh.shape["tiles"]
    n_spp_shards = mesh.shape["spp"]
    n = config.width * config.height
    # each shard must receive whole 128-ray chunks; render_pixels_fused
    # pads its shard up to a kernel-block multiple internally
    if n % (n_tiles * 128) != 0:
        raise ValueError(
            f"pixel count {n} must divide into 128-ray chunks per tile shard")
    if config.spp % n_spp_shards != 0:
        raise ValueError(f"spp {config.spp} not divisible by spp axis {n_spp_shards}")
    local_spp = config.spp // n_spp_shards
    pixel_index = jnp.arange(n, dtype=jnp.int32)
    textured = materials is not None

    def shard_fn(pixel_idx, uniforms, scene, dome, *mat_tex):
        spp_rank = jax.lax.axis_index("spp")
        sample_offset = uniforms.sample_offset + spp_rank * local_spp
        color, segs = render_pixels_fused(
            config, uniforms, scene, dome, pixel_idx, local_spp,
            sample_offset, static=static, with_stats=True,
            materials=mat_tex[0] if textured else None,
            textures=mat_tex[1] if textured else None)
        if n_spp_shards > 1:
            color = jax.lax.pmean(color, "spp")
            segs = jax.lax.pmean(segs, "spp")
        return color, segs

    extra = (materials, textures) if textured else ()
    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("tiles"), P(), P(), P()) + (P(),) * len(extra),
        out_specs=(P("tiles"), P("tiles")),
        check_vma=False,
    )
    return fn(pixel_index, uniforms, scene, dome, *extra)
