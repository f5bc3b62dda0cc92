"""textureLodBounces measurement (VERDICT r3 weak #2 / PERF r4 pending item).

Renders the bench ladder's textured cornell (checker base_color on every
material, 1200sq/16spp/8 bounces) at textureLodBounces k in {0, 1, 2} on the
real chip and reports, per k:
  * min-of-4 frame time + Mray/s (bench.py conventions: host-readback fence),
  * mean FLIP vs the exact-tap (k=0) image, tonemapped the way the CLI does.

k semantics (render/fused.py): bounces >= k run the plain one-kernel bounce
whose SMEM material table holds the texture MEANS (substitute_texture_means),
i.e. exact top-mip substitution with ZERO taps; bounces < k take the full
split-bounce exact-bilinear stage. k=0 means LOD off (all bounces exact).

Usage: python tools/lod_prof.py   (needs the tunneled TPU)
"""

import dataclasses
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gatling_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import bench
    from gatling_tpu.flip import mean_flip

    # Build the textured-cornell fused setup once by reusing bench.measure's
    # construction path up to render_once via a tiny shim: we re-create the
    # same objects here (bench.measure doesn't expose config overrides).
    from gatling_tpu.interface import AovId, aov_bit
    from gatling_tpu.ops.geometry import build_geometry
    from gatling_tpu.ops.pallas_bounce import build_fused_scene
    from gatling_tpu.render.camera import CameraUniforms
    from gatling_tpu.render.fused import render_pixels_fused
    from gatling_tpu.render.integrator import RenderConfig, Uniforms, default_dome
    from gatling_tpu.render.lights import build_light_arrays
    from gatling_tpu.render.material import (build_materials, lower_material,
                                             substitute_texture_means,
                                             textured_params)
    from gatling_tpu.render.texture import TextureRef
    from gatling_tpu import imgio
    from gatling_tpu.scene.stage import load_scene

    width = height = int(os.environ.get("GATLING_BENCH_RES", "1200"))
    spp = int(os.environ.get("GATLING_BENCH_SPP", "16"))
    max_bounces = int(os.environ.get("GATLING_BENCH_BOUNCES", "8"))

    desc = load_scene("/root/reference/cornell.usda")
    mat_paths = sorted({m.material for m in desc.meshes if m.material})
    midx = {p: i for i, p in enumerate(mat_paths)}
    midx[None] = len(mat_paths)
    geom = build_geometry(desc.meshes, midx)
    rows = [None] * len(midx)
    for p, i in midx.items():
        rows[i] = lower_material(desc.materials.get(p) if p else None)
    img = np.zeros((64, 64, 4), np.uint8)
    img[..., 3] = 255
    c = ((np.arange(64)[:, None] // 8 + np.arange(64)[None, :] // 8) % 2)
    img[..., 0] = np.where(c, 230, 90)
    img[..., 1] = np.where(c, 200, 120)
    img[..., 2] = np.where(c, 90, 220)
    tex = "/tmp/gatling_lod_checker.png"
    imgio.write_image_file(tex, img)
    for r in rows:
        r.textures["base_color"] = TextureRef(file_path=tex, is_srgb=False)
    table, pool = build_materials(rows)
    lights = build_light_arrays([l for l in desc.lights
                                 if l.light_type != "dome"])
    cam = desc.first_camera()

    # the fused scene's SMEM table carries the texture means (the top mip)
    # exactly the way gi._fused_mat_table arranges it
    fs, fstatic = build_fused_scene(geom, substitute_texture_means(table, pool),
                                    lights)
    fstatic = dataclasses.replace(fstatic, textured=True,
                                  textured_params=textured_params(rows))

    base = RenderConfig(
        width=width, height=height, spp=spp, max_bounces=max_bounces,
        rr_bounce_offset=3, aov_mask=aov_bit(AovId.COLOR), tracer="brute",
        nee=False, has_dome=False)
    uniforms = Uniforms(
        camera=CameraUniforms(
            position=jnp.asarray(cam.position, jnp.float32),
            forward=jnp.asarray(cam.forward, jnp.float32),
            up=jnp.asarray(cam.up, jnp.float32),
            vfov=jnp.float32(cam.vfov),
            lens_radius=jnp.float32(0), focus_distance=jnp.float32(0),
            sensor_exposure=jnp.float32(0),
            clip_start=jnp.float32(cam.clip_start),
            clip_end=jnp.float32(cam.clip_end)),
        sample_offset=jnp.int32(0),
        inv_total_sample_count=jnp.float32(1.0 / spp),
        max_sample_value=jnp.float32(10.0),
        rr_inv_min_term_prob=jnp.float32(0.95),
        light_intensity_multiplier=jnp.float32(1.0),
        meters_per_scene_unit=jnp.float32(1.0),
        max_volume_walk_length=jnp.int32(7),
        dome_rotation=jnp.asarray([0, 0, 0, 1], jnp.float32),
        dome_emission_multiplier=jnp.ones(3, jnp.float32),
        dome_diffuse_specular=jnp.ones(2, jnp.float32))
    n = width * height
    pix = jnp.arange(n, dtype=jnp.int32)

    def tonemap(color):
        # CLI display transform: clamp + sRGB encode (what FLIP expects)
        c = np.clip(np.asarray(color[:, :3], np.float32), 0.0, 1.0)
        srgb = np.where(c <= 0.0031308, 12.92 * c,
                        1.055 * np.power(c, 1 / 2.4) - 0.055)
        return srgb.reshape(height, width, 3)

    results = {}
    ref_img = None
    for k in (0, 1, 2, 3):
        config = dataclasses.replace(base, tex_lod_bounces=k)

        def render_once():
            color, segs = render_pixels_fused(
                config, uniforms, fs, default_dome(), pix, spp, jnp.int32(0),
                static=fstatic, with_stats=True,
                materials=table, textures=pool)
            return color, segs

        color, segs = render_once()
        _ = float(jnp.sum(color))  # fence (compile + warmup)
        times = []
        for _i in range(4):
            t0 = time.perf_counter()
            color, segs = render_once()
            _ = float(jnp.sum(color))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        mpl = float(jnp.mean(segs))
        mrays = n * spp * mpl / dt / 1e6
        imgk = tonemap(color)
        if k == 0:
            ref_img = imgk
            err = 0.0
        else:
            err = float(mean_flip(ref_img, imgk))
        results[k] = dict(frame_s=round(dt, 4), mrays=round(mrays, 1),
                          mean_flip_vs_exact=round(err, 5),
                          mean_path_length=round(mpl, 3))
        print(f"# k={k}: {results[k]}", file=sys.stderr)
    print(json.dumps({"probe": "textureLodBounces", "config":
                      [width, spp, max_bounces], "results": results}))


if __name__ == "__main__":
    main()
