"""Benchmark harness: Mrays/sec/chip on the Cornell smoke scene.

Run on real TPU hardware by the driver; prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The north-star metric (BASELINE.json) is Mrays/sec/chip (trace+shade).
Ray count = width*height*spp*mean_path_length, measured from the Bounces
accounting of the integrator; we report primary+secondary+shadow rays like
GPU path-tracer convention (each traced segment counts as one ray).

The reference publishes no numbers (BASELINE.md), so vs_baseline is measured
against the driver-assigned target of 100 Mray/s/chip.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gatling_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def measure(scene_path: str, width=None, spp=None, max_bounces=None,
            use_nee=None, use_textured=False, use_normalmap=False,
            lod_bounces=0, runs=4) -> dict:
    """Measure one ladder config; returns the result dict."""
    from gatling_tpu.scene.stage import load_scene
    from gatling_tpu.ops.geometry import build_geometry
    from gatling_tpu.render.material import build_material_table, lower_material
    from gatling_tpu.render.lights import build_light_arrays
    from gatling_tpu.render.integrator import (
        RenderConfig, Uniforms, default_dome, render_frame)
    from gatling_tpu.render.camera import CameraUniforms
    from gatling_tpu.interface import AovId, aov_bit

    # sphere_field (290k tris) and interior default to a smaller config:
    # a 1200sq/16spp frame is a single multi-second XLA execution, which the
    # shared TPU worker's watchdog can kill (PERF.md "Known issues")
    big_scene = scene_path in ("sphere_field", "interior")
    width = width or int(os.environ.get("GATLING_BENCH_RES", "512" if big_scene else "1200"))
    height = width
    spp = spp or int(os.environ.get("GATLING_BENCH_SPP", "4" if big_scene else "16"))
    max_bounces = max_bounces or int(os.environ.get(
        "GATLING_BENCH_BOUNCES", "6" if big_scene else "8"))

    from gatling_tpu.gi import _build_accel, _choose_tracer

    if scene_path == "interior" and use_nee is None:
        use_nee = True  # the ladder's Evermotion-class config includes NEE
    use_nee = bool(use_nee)

    if scene_path == "sphere_field":
        # Junk-Shop-class procedural stand-in (~290k triangles, BVH tracer)
        from gatling_tpu.scene.examples import sphere_field

        desc = sphere_field()
    elif scene_path == "interior":
        # Evermotion-Kitchen-class stand-in (ladder config 5): enclosed
        # textured room, ~92k tris, clustered tracer + split-bounce textures
        from gatling_tpu.scene.examples import interior

        desc = interior()
    else:
        desc = load_scene(scene_path)
    mat_paths = sorted({m.material for m in desc.meshes if m.material})
    midx = {p: i for i, p in enumerate(mat_paths)}
    midx[None] = len(mat_paths)
    geom = build_geometry(desc.meshes, midx)
    # tracer choice is cheap; the accel build (threaded host BVH) is
    # deferred — the fused path never needs it
    tracer = _choose_tracer(geom)
    accel = None
    rows = [None] * len(midx)
    for p, i in midx.items():
        rows[i] = lower_material(desc.materials.get(p) if p else None)
    pool = None
    if use_normalmap:
        # a leaning tangent-space normal map on every material: exercises
        # the split-bounce tangent rows + XLA perturb stage
        import numpy as _np

        from gatling_tpu import imgio as _imgio
        from gatling_tpu.render.material import build_materials
        from gatling_tpu.render.texture import TextureRef

        _img = _np.zeros((2, 2, 4), _np.uint8)
        _img[..., 0] = 200
        _img[..., 1] = 128
        _img[..., 2] = 230
        _img[..., 3] = 255
        _tex = "/tmp/gatling_bench_lean.png"
        _imgio.write_image_file(_tex, _img)
        for r in rows:
            r.textures["normal"] = TextureRef(
                file_path=_tex, is_srgb=False,
                scale=(2.0, 2.0, 2.0, 1.0), bias=(-1.0, -1.0, -1.0, 0.0))
        table, pool = build_materials(rows)
        use_textured = True  # routes through the split-bounce kernels
    elif use_textured:
        # checker-textured base color on every material: exercises the
        # split-bounce trace -> XLA texture stage -> shade pipeline
        import numpy as _np

        from gatling_tpu import imgio as _imgio
        from gatling_tpu.render.material import build_materials
        from gatling_tpu.render.texture import TextureRef

        _img = _np.zeros((64, 64, 4), _np.uint8)
        _img[..., 3] = 255
        _c = ((_np.arange(64)[:, None] // 8 + _np.arange(64)[None, :] // 8) % 2)
        _img[..., 0] = _np.where(_c, 230, 90)
        _img[..., 1] = _np.where(_c, 200, 120)
        _img[..., 2] = _np.where(_c, 90, 220)
        _tex = "/tmp/gatling_bench_checker.png"
        _imgio.write_image_file(_tex, _img)
        for r in rows:
            r.textures["base_color"] = TextureRef(file_path=_tex, is_srgb=False)
        table, pool = build_materials(rows)
    elif any(r.textures for r in rows):
        # scene-authored textures (e.g. the interior's UsdUVTexture set):
        # build the texture pool and route through the split-bounce kernels
        from gatling_tpu.render.material import build_materials

        table, pool = build_materials(rows)
        use_textured = True
    else:
        table = build_material_table(rows)
    scene_lights = [l for l in desc.lights if l.light_type != "dome"]
    if use_nee and not scene_lights:
        # NEE bench config: a ceiling rect light (UsdLux default -Z emission;
        # the cornell room is [-1,1]^3 z-up)
        import numpy as _np

        from gatling_tpu.scene.stage import LightDesc

        xf = _np.eye(4)
        xf[3, :3] = [0.0, 0.0, 0.9]
        scene_lights = [LightDesc(
            path="/benchlight", light_type="rect", transform=xf,
            params=dict(intensity=4.0, exposure=0.0,
                        color=_np.array([1.0, 0.9, 0.8], _np.float32),
                        normalize=False, diffuse=1.0, specular=1.0,
                        enableColorTemperature=False, colorTemperature=6500.0,
                        width=0.8, height=0.6))]
    lights = build_light_arrays(scene_lights)
    cam = desc.first_camera()

    has_volumes = any(
        any(c > 0.0 for c in r.params.get("volume_absorption", ()))
        or any(c > 0.0 for c in r.params.get("volume_scattering", ()))
        for r in rows)
    config = RenderConfig(
        width=width, height=height, spp=spp, max_bounces=max_bounces,
        rr_bounce_offset=3, aov_mask=aov_bit(AovId.COLOR),
        tracer=tracer, nee=use_nee, has_volumes=has_volumes,
        has_dome=any(l.light_type == "dome" for l in desc.lights),
        tex_lod_bounces=lod_bounces)
    uniforms = Uniforms(
        camera=CameraUniforms(
            position=jnp.asarray(cam.position, jnp.float32),
            forward=jnp.asarray(cam.forward, jnp.float32),
            up=jnp.asarray(cam.up, jnp.float32),
            vfov=jnp.float32(cam.vfov),
            lens_radius=jnp.float32(0), focus_distance=jnp.float32(0),
            sensor_exposure=jnp.float32(0),
            clip_start=jnp.float32(cam.clip_start), clip_end=jnp.float32(cam.clip_end)),
        sample_offset=jnp.int32(0),
        inv_total_sample_count=jnp.float32(1.0 / spp),
        max_sample_value=jnp.float32(10.0),
        rr_inv_min_term_prob=jnp.float32(0.95),
        light_intensity_multiplier=jnp.float32(1.0),
        meters_per_scene_unit=jnp.float32(1.0),
        max_volume_walk_length=jnp.int32(7),
        dome_rotation=jnp.asarray([0, 0, 0, 1], jnp.float32),
        dome_emission_multiplier=jnp.ones(3, jnp.float32),
        dome_diffuse_specular=jnp.ones(2, jnp.float32),
    )
    n = width * height
    aovs = {
        "color": jnp.zeros((n, 4), jnp.float32),
        "bounces": jnp.zeros((n, 3), jnp.float32),
    }

    # fused megakernel fast path when the config allows it (PERF.md)
    from gatling_tpu.render.fused import render_pixels_fused, supports_fused

    use_fused = (jax.default_backend() == "tpu" and supports_fused(config, False)
                 and os.environ.get("GATLING_FUSED", "1") != "0")
    if use_fused:
        from gatling_tpu.ops.pallas_bounce import (build_fused_scene,
                                                   build_fused_scene_instanced)

        kt = table
        if lod_bounces > 0 and use_textured:
            from gatling_tpu.render.material import substitute_texture_means

            kt = substitute_texture_means(table, pool)
        # normal-mapped scenes ride the instanced walk too: tangent rows on
        # the shared local clusters, world-transformed by the XLA pass-2
        # finalize (the builder declines under GATLING_XLA_P2=0)
        res = build_fused_scene_instanced(desc.meshes, midx, kt, lights)
        if res is not None:
            fs, fstatic = res
        else:
            kernel_table = table
            if lod_bounces > 0 and use_textured:
                # texture-LOD bounces shade from the SMEM table: it must
                # hold the texture MEANS (gi._fused_mat_table arrangement)
                from gatling_tpu.render.material import substitute_texture_means

                kernel_table = substitute_texture_means(table, pool)
            fs, fstatic = build_fused_scene(geom, kernel_table, lights)
        if has_volumes:
            import dataclasses as _dcv

            fstatic = _dcv.replace(fstatic, volumes=True)
        if use_textured:
            import dataclasses as _dc

            from gatling_tpu.render.material import textured_params

            fstatic = _dc.replace(fstatic, textured=True,
                                  textured_params=textured_params(rows))
        pix = jnp.arange(n, dtype=jnp.int32)

        def render_once():
            color, segs = render_pixels_fused(
                config, uniforms, fs, default_dome(), pix, spp, jnp.int32(0),
                static=fstatic, with_stats=True,
                materials=table if use_textured else None,
                textures=pool if use_textured else None)
            return {"color": color, "segments": segs}
    else:
        import dataclasses as _dc2

        tracer, accel, geom = _build_accel(geom, tracer)
        config = _dc2.replace(config, tracer=tracer)

        def render_once():
            return render_frame(config, uniforms, geom, table, lights,
                                default_dome(), aovs, accel=accel)

    # warmup / compile. NOTE: a host readback (not just block_until_ready) is
    # used to fence timing — the tunneled TPU backend's block_until_ready
    # returns before remote execution finishes.
    out = render_once()
    _fence = float(jnp.sum(out["color"]))

    # min-of-N: the tunneled TPU pool is shared, so per-run contention
    # noise is large; the minimum is the honest throughput estimate
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = render_once()
        _fence = float(jnp.sum(out["color"]))
        times.append(time.perf_counter() - t0)
    dt = min(times)

    # traced segments per sample (path segments + NEE shadow rays)
    if use_fused:
        mean_path_len = float(jnp.mean(out["segments"]))
    else:
        mean_path_len = estimate_mean_path_length(
            config, uniforms, geom, table, lights, accel)
    rays = n * spp * mean_path_len
    mrays_per_sec = rays / dt / 1e6

    target = 100.0  # Mray/s/chip (BASELINE.json north star)
    tracer_name = "fused" if use_fused else tracer
    if use_fused and fstatic.instanced:
        tracer_name = "fused_instanced"
    return {
        "metric": (("cornell_1200sq_trace_shade" if "cornell" in scene_path
                    else f"{os.path.basename(scene_path)}_trace_shade")
                   + ("_nee" if use_nee else "")
                   + ("_normalmapped" if use_normalmap else
                      "_textured" if use_textured else "")
                   + (f"_lod{lod_bounces}" if lod_bounces else "")),
        "value": round(mrays_per_sec, 2),
        "unit": "Mray/s/chip",
        "vs_baseline": round(mrays_per_sec / target, 3),
        "detail": {
            "resolution": [width, height], "spp": spp,
            "max_bounces": max_bounces,
            "mean_path_length": round(float(mean_path_len), 3),
            "frame_seconds": round(dt, 4),
            "tracer": tracer_name,
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
        },
    }


def measure_time_to_spp(scene_path: str, width=1200, total_spp=1024,
                        max_bounces=8, chunk_spp=None,
                        measured_spp=None) -> dict:
    """North-star wall-clock metric (BASELINE.md): seconds to accumulate
    `total_spp` samples at width^2, rendered in host-level spp chunks so no
    single XLA execution trips the shared worker's ~30 s watchdog (the same
    chunking the checkpoint/progressive path uses). When `measured_spp` is
    set below total_spp, that many samples are timed and the total is the
    LINEAR extrapolation over identical chunks (each chunk is the same
    compiled executable at a different sample_offset) — reported honestly
    in detail.measured_spp."""
    chunk = chunk_spp or (16 if scene_path.endswith("cornell.usda") else 4)
    meas = measured_spp or total_spp
    n_chunks = -(-meas // chunk)
    t_total = 0.0
    r = None
    for _ in range(n_chunks):
        # each call's warmup render hits the in-process jit cache after the
        # first chunk; only the timed frame contributes to t_total
        r = measure(scene_path, width=width, spp=chunk,
                    max_bounces=max_bounces,
                    use_nee=(scene_path == "interior"), runs=1)
        t_total += r["detail"]["frame_seconds"]
    scale = total_spp / (n_chunks * chunk)
    secs = t_total * scale
    return {
        "metric": f"{os.path.basename(scene_path).split('.')[0]}"
                  f"_{width}sq_{total_spp}spp_seconds",
        "value": round(secs, 2),
        "unit": "seconds",
        "vs_baseline": None,
        "detail": {
            "resolution": [width, width], "total_spp": total_spp,
            "chunk_spp": chunk, "measured_spp": n_chunks * chunk,
            "extrapolated": bool(scale > 1.0),
            "max_bounces": max_bounces,
            "tracer": r["detail"]["tracer"] if r else "?",
        },
    }


# BASELINE.md measurement ladder: every config measured on every bench run
# (VERDICT r3 item 4 — a perf table with TBDs silently regresses). Each
# entry: (label, measure kwargs).
LADDER = [
    ("cornell", dict(scene_path="/root/reference/cornell.usda")),
    ("cornell_nee", dict(scene_path="/root/reference/cornell.usda",
                         use_nee=True)),
    ("cornell_textured", dict(scene_path="/root/reference/cornell.usda",
                              use_textured=True)),
    # measured recommended texture-LOD setting (tools/lod_prof.py, PERF.md):
    # bounces >= 2 shade from exact texture means, FLIP 0.00018 vs exact
    ("cornell_textured_lod2", dict(scene_path="/root/reference/cornell.usda",
                                   use_textured=True, lod_bounces=2)),
    ("cornell_normalmapped", dict(scene_path="/root/reference/cornell.usda",
                                  use_normalmap=True)),
    ("sphere_field", dict(scene_path="sphere_field")),
    ("interior_nee_textured", dict(scene_path="interior", use_nee=True)),
    # the measured production texture setting (textureLodBounces=2,
    # PERF.md): indirect bounces shade from exact texture means
    ("interior_nee_textured_lod2", dict(scene_path="interior", use_nee=True,
                                        lod_bounces=2)),
    # normal-mapped object walk (round 5: tangent rows on the shared local
    # clusters, world-transformed by the XLA pass-2 finalize) — measured
    # 3.25 flat vs 4.62 instanced (+42%)
    ("interior_nee_normalmapped", dict(scene_path="interior", use_nee=True,
                                       use_normalmap=True)),
    # advanced lobe set (glass + clearcoat) in the FUSED shade — VERDICT r4
    # item 2's criterion: within ~2x of cornell throughput, not the
    # 3.7-5.6 Mray/s wavefront it used to demote to
    ("glass_coated", dict(
        scene_path="tests/graphical/Materials.GlassCoated/scene.usda")),
]


def main() -> None:
    scene_env = os.environ.get("GATLING_BENCH_SCENE")
    if scene_env or os.environ.get("GATLING_BENCH_SINGLE"):
        # single-config mode (manual profiling / env-driven overrides)
        result = measure(
            scene_env or "/root/reference/cornell.usda",
            use_nee=os.environ.get(
                "GATLING_BENCH_NEE", "1" if scene_env == "interior" else "0") == "1",
            use_textured=os.environ.get("GATLING_BENCH_TEXTURED", "0") == "1",
            use_normalmap=os.environ.get("GATLING_BENCH_NORMALMAP", "0") == "1")
        print(json.dumps(result))
        return
    extra = {}
    head = None
    for label, kw in LADDER:
        try:
            r = measure(**kw)
        except Exception as e:  # noqa: BLE001 — one config must not kill the run
            extra[label] = {"error": f"{e.__class__.__name__}: {e}"}
            print(f"# {label} FAILED: {e}", file=sys.stderr)
            continue
        print(f"# {label}: {r['value']} Mray/s/chip "
              f"({r['detail']['tracer']}, {r['detail']['frame_seconds']} s)",
              file=sys.stderr)
        if label == "cornell":
            head = r
        else:
            extra[label] = {"value": r["value"], "unit": r["unit"],
                            "vs_baseline": r["vs_baseline"],
                            "detail": r["detail"]}
    if head is None:
        raise SystemExit("cornell ladder config failed")

    # north-star wall-clock configs (BASELINE.md): time-to-1024spp at 1200^2
    # via host-level spp chunking (VERDICT r4 item 5). Interior measures 16
    # real spp and extrapolates over identical chunks; detail says so.
    for label, kw in (
        ("cornell_1200sq_1024spp_seconds",
         dict(scene_path="/root/reference/cornell.usda", chunk_spp=16,
              measured_spp=256)),
        ("interior_1200sq_1024spp_seconds",
         dict(scene_path="interior", chunk_spp=4, measured_spp=16)),
    ):
        try:
            r = measure_time_to_spp(**kw)
        except Exception as e:  # noqa: BLE001
            extra[label] = {"error": f"{e.__class__.__name__}: {e}"}
            print(f"# {label} FAILED: {e}", file=sys.stderr)
            continue
        print(f"# {label}: {r['value']} s (measured {r['detail']['measured_spp']} spp)",
              file=sys.stderr)
        extra[label] = {"value": r["value"], "unit": r["unit"],
                        "vs_baseline": r["vs_baseline"],
                        "detail": r["detail"]}
    head["detail"]["extra_configs"] = extra
    print(json.dumps(head))


def estimate_mean_path_length(config, uniforms, geom, table, lights, accel=None) -> float:
    """Re-trace a subsample grid with the bounce counter to get the mean
    number of traced segments per path."""
    from gatling_tpu.render.integrator import trace_sample, default_dome
    import dataclasses

    small = dataclasses.replace(config, width=min(config.width, 128),
                                height=min(config.height, 128), spp=1)
    n = small.width * small.height
    pix = jnp.arange(n, dtype=jnp.int32)
    res = trace_sample(small, uniforms, geom, table, lights, default_dome(),
                       pix, jnp.int32(0), None, accel)
    return float(jnp.mean(res.bounces.astype(jnp.float32)))


if __name__ == "__main__":
    sys.exit(main())
