import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
"""Numpy simulation of the ordered clustered walk on bounce-0 rays:
exact per-block counts of (a) while-loop iterations until early exit,
(b) groups whose L1 slab passed (body taken), (c) clusters whose L2 slab
passed (dots ran). Mirrors _trace_clustered_matrix / _cluster_walk_plan."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np, jax.numpy as jnp
from gatling_tpu.scene.examples import sphere_field
from gatling_tpu.ops.geometry import build_geometry
from gatling_tpu.render.material import build_material_table, lower_material
from gatling_tpu.ops.pallas_bounce import build_fused_scene, L1_FAN, CLUSTER_SIZE
from gatling_tpu.render.camera import CameraUniforms, generate_primary_rays
from gatling_tpu.render.fused import _tile_order

desc = sphere_field()
geom = build_geometry(desc.meshes, {None: 0})
table = build_material_table([lower_material(None)])
scene, static = build_fused_scene(geom, table, None)
cam = desc.first_camera()
W = H = 512
cu = CameraUniforms(
    position=jnp.asarray(cam.position, jnp.float32),
    forward=jnp.asarray(cam.forward, jnp.float32),
    up=jnp.asarray(cam.up, jnp.float32),
    vfov=jnp.float32(cam.vfov), lens_radius=jnp.float32(0),
    focus_distance=jnp.float32(0), sensor_exposure=jnp.float32(0),
    clip_start=jnp.float32(cam.clip_start), clip_end=jnp.float32(cam.clip_end))
pix = jnp.asarray(_tile_order(W, H))
px, py = pix % W, pix // W
rng = jnp.zeros((W*H,), jnp.uint32)
o, d, _ = generate_primary_rays(cu, W, H, px, py, rng, False, False, False)
o = np.asarray(o, np.float64); d = np.asarray(d, np.float64)
if os.environ.get("SIM_STATE"):
    st = np.load(os.environ["SIM_STATE"]).astype(np.float64)
    alive_m = st[13].reshape(-1) > 0.5
    o = st[0:3].reshape(3, -1).T
    d = st[3:6].reshape(3, -1).T
    print(f"loaded state: {alive_m.sum()} alive of {alive_m.size}")

l1 = np.asarray(scene.l1_aabbs, np.float64)   # [8, n_l1]
l2 = np.asarray(scene.l2_aabbs, np.float64)   # [8, C]
tris = np.asarray(scene.tris, np.float64)     # [C, 40, 128]
n_l1 = static.n_l1
R = o.shape[0]
BLK = 1024

# scene box + per-ray exit cap
g_lo = np.where(l1[0:3] <= 1e30, l1[0:3], 1e30).min(1)
g_hi = np.where(l1[3:6] >= -1e30, l1[3:6], -1e30).max(1)
inv = 1.0 / np.where(np.abs(d) < 1e-20, np.where(d >= 0, 1e-20, -1e-20), d)
ex = np.maximum((g_lo - o) * inv, (g_hi - o) * inv)
cap0 = np.maximum(ex.min(1), 0.0) * 1.0001 + 1e-3

def slab(lo, hi, o_, inv_, tmin, tcap):
    t0 = (lo - o_) * inv_
    t1 = (hi - o_) * inv_
    ten = np.maximum(np.minimum(t0, t1).max(1), 0.0)
    tex = np.minimum(np.maximum(t0, t1).min(1), tcap)
    return (ten <= tex) & (ten >= 0) & (tex >= tmin)

iters_l, taken_l, clus_l, hitfrac = [], [], [], []
alive_all = np.ones(R, bool) if not os.environ.get("SIM_STATE") else alive_m
for b0 in range(0, R, BLK):
    am = alive_all[b0:b0+BLK]
    if not am.any():
        iters_l.append(0); taken_l.append(0); clus_l.append(0); hitfrac.append(0)
        continue
    ob, db, ib = o[b0:b0+BLK][am], d[b0:b0+BLK][am], inv[b0:b0+BLK][am]
    cap = cap0[b0:b0+BLK][am].copy()
    # plan: group order by distance from block origin box
    blo, bhi = ob.min(0), ob.max(0)
    gap = np.maximum(0.0, np.maximum(l1[0:3] - bhi[:, None], blo[:, None] - l1[3:6]))
    dist = np.sqrt((np.minimum(gap, 1e18) ** 2).sum(0))
    order = np.argsort(dist)
    dsort = dist[order]
    iters = taken = clus = 0
    best = np.full(am.sum(), 1e30)
    for k in range(n_l1):
        if dsort[k] > max(cap.max(), 0.0):
            break
        iters += 1
        g = order[k]
        h1 = slab(l1[0:3, g], l1[3:6, g], ob, ib, 0.0, cap)
        if not h1.any():
            continue
        taken += 1
        ran = False
        for bb in range(L1_FAN):
            c = g * L1_FAN + bb
            h2 = slab(l2[0:3, c], l2[3:6, c], ob, ib, 0.0, cap)
            if not h2.any():
                continue
            clus += 1
            ran = True
            # Baldwin-Weber plane rows: n (0-2), d0 (3)
            n = tris[c, 0:3]          # [3,128]
            d0 = tris[c, 3]           # [128]
            nd = db @ n               # [BLK,128]
            po = ob @ n + d0
            r1 = tris[c, 8:12]; r2 = tris[c, 16:20]
            with np.errstate(divide="ignore", invalid="ignore"):
                tt = -po / np.where(np.abs(nd) > 1e-12, nd, np.nan)
            u = (ob @ r1[0:3]) + tt * (db @ r1[0:3]) + r1[3]
            v = (ob @ r2[0:3]) + tt * (db @ r2[0:3]) + r2[3]
            ok = np.isfinite(tt) & (u >= 0) & (v >= 0) & (u + v <= 1) & (tt > 0) & (tt < cap[:, None])
            tt = np.where(ok, tt, 1e30)
            best = np.minimum(best, tt.min(1))
        if ran:
            cap = np.minimum(cap, best)
    iters_l.append(iters); taken_l.append(taken); clus_l.append(clus)
    hitfrac.append((best < 1e29).mean())

for name, a in (("iters", iters_l), ("groups_taken", taken_l), ("clusters_run", clus_l)):
    a = np.array(a)
    print(f"{name}: mean {a.mean():.1f} p50 {np.percentile(a,50):.0f} p95 {np.percentile(a,95):.0f} max {a.max()}")
print(f"hit fraction: {np.mean(hitfrac):.3f}")
