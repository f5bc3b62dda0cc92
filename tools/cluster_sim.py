import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
"""Clustering-quality simulation: clusters RUN per ray block under the
ordered walk, Morton slicing vs median-split leaves (VERDICT r3 item 1).

Scene: interior() — the 92k-tri flat-clustered ladder config (sphere_field
now takes the instanced path, so the flat walk's quality matters for
unique-geometry scenes). Mirrors walk_sim.py's exact block walk.

Usage: JAX_PLATFORMS=cpu python tools/cluster_sim.py
"""
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np, jax.numpy as jnp
from gatling_tpu.scene.examples import interior
from gatling_tpu.ops.geometry import build_geometry
from gatling_tpu.render.material import build_material_table, lower_material
from gatling_tpu.ops.pallas_bounce import (
    build_fused_scene_with_order, L1_FAN, CLUSTER_SIZE)
from gatling_tpu.render.camera import CameraUniforms, generate_primary_rays
from gatling_tpu.render.fused import _tile_order

desc = interior()
mat_paths = sorted({m.material for m in desc.meshes if m.material})
midx = {p: i for i, p in enumerate(mat_paths)}
midx[None] = len(mat_paths)
geom = build_geometry(desc.meshes, midx)
rows = [None] * len(midx)
for p, i in midx.items():
    rows[i] = lower_material(desc.materials.get(p) if p else None)
table = build_material_table(rows)

cam = desc.first_camera()
W = H = 256
cu = CameraUniforms(
    position=jnp.asarray(cam.position, jnp.float32),
    forward=jnp.asarray(cam.forward, jnp.float32),
    up=jnp.asarray(cam.up, jnp.float32),
    vfov=jnp.float32(cam.vfov), lens_radius=jnp.float32(0),
    focus_distance=jnp.float32(0), sensor_exposure=jnp.float32(0),
    clip_start=jnp.float32(cam.clip_start), clip_end=jnp.float32(cam.clip_end))
pix = jnp.asarray(_tile_order(W, H))
px, py = pix % W, pix // W
rng0 = jnp.zeros((W * H,), jnp.uint32)
o, d, _ = generate_primary_rays(cu, W, H, px, py, rng0, False, False, False)
o = np.asarray(o, np.float64)
d = np.asarray(d, np.float64)
R, BLK = o.shape[0], 1024
inv = 1.0 / np.where(np.abs(d) < 1e-20, np.where(d >= 0, 1e-20, -1e-20), d)


def walk_counts(scene, static):
    l1 = np.asarray(scene.l1_aabbs, np.float64)
    l2 = np.asarray(scene.l2_aabbs, np.float64)
    tris = np.asarray(scene.tris, np.float64)
    n_l1 = static.n_l1
    g_lo = np.where(l1[0:3] <= 1e30, l1[0:3], 1e30).min(1)
    g_hi = np.where(l1[3:6] >= -1e30, l1[3:6], -1e30).max(1)
    ex = np.maximum((g_lo - o) * inv, (g_hi - o) * inv)
    cap0 = np.maximum(ex.min(1), 0.0) * 1.0001 + 1e-3

    def slab(lo, hi, o_, inv_, tcap):
        t0 = (lo - o_) * inv_
        t1 = (hi - o_) * inv_
        ten = np.maximum(np.minimum(t0, t1).max(1), 0.0)
        tex = np.minimum(np.maximum(t0, t1).min(1), tcap)
        return ten <= tex

    iters_l, taken_l, clus_l = [], [], []
    for b0 in range(0, R, BLK):
        ob, db, ib = o[b0:b0 + BLK], d[b0:b0 + BLK], inv[b0:b0 + BLK]
        cap = cap0[b0:b0 + BLK].copy()
        blo, bhi = ob.min(0), ob.max(0)
        gap = np.maximum(0.0, np.maximum(l1[0:3] - bhi[:, None],
                                         blo[:, None] - l1[3:6]))
        dist = np.sqrt((np.minimum(gap, 1e18) ** 2).sum(0))
        order = np.argsort(dist)
        dsort = dist[order]
        iters = taken = clus = 0
        best = np.full(BLK, 1e30)
        for k in range(n_l1):
            if dsort[k] > max(cap.max(), 0.0):
                break
            iters += 1
            g = order[k]
            h1 = slab(l1[0:3, g], l1[3:6, g], ob, ib, cap)
            if not h1.any():
                continue
            taken += 1
            ran = False
            for bb in range(L1_FAN):
                c = g * L1_FAN + bb
                h2 = slab(l2[0:3, c], l2[3:6, c], ob, ib, cap)
                if not h2.any():
                    continue
                clus += 1
                ran = True
                n = tris[c, 0:3]
                d0 = tris[c, 3]
                nd = db @ n
                po = ob @ n + d0
                r1 = tris[c, 8:12]
                r2 = tris[c, 16:20]
                with np.errstate(divide="ignore", invalid="ignore"):
                    tt = -po / np.where(np.abs(nd) > 1e-12, nd, np.nan)
                u = (ob @ r1[0:3]) + tt * (db @ r1[0:3]) + r1[3]
                v = (ob @ r2[0:3]) + tt * (db @ r2[0:3]) + r2[3]
                ok = (np.isfinite(tt) & (u >= 0) & (v >= 0) & (u + v <= 1)
                      & (tt > 0) & (tt < cap[:, None]))
                tt = np.where(ok, tt, 1e30)
                best = np.minimum(best, tt.min(1))
            if ran:
                cap = np.minimum(cap, best)
        iters_l.append(iters)
        taken_l.append(taken)
        clus_l.append(clus)
    return (np.mean(iters_l), np.mean(taken_l), np.mean(clus_l))


for mode in ("morton", "median"):
    os.environ["GATLING_CLUSTER_ORDER"] = mode
    scene, static, _ = build_fused_scene_with_order(geom, table, None)
    it, tk, cl = walk_counts(scene, static)
    print(f"{mode}: n_l1={static.n_l1} clusters={static.n_clusters} | "
          f"L1 iters {it:.1f}  groups taken {tk:.1f}  clusters RUN {cl:.1f} "
          f"per 1024-ray block")
