"""Per-RAY traversal ceiling simulation (numpy, CPU).

GATLING_SIM_SCENE=interior runs the cluster-level analysis on the
Evermotion-class interior (flat clustered mode — no instance level);
default is sphere_field with both levels. GATLING_SIM_BLOCKS sweeps
block sizes for the union stats (default "1024", e.g. "256,512,1024").

Answers, for primary rays and (if /tmp/state1.npy exists, from
tools/walk_prof.py) the coherence-sorted bounce-1 rays:

  A. cluster level (the flat walk's 2305 median-split clusters):
     - per-ray candidate clusters (slab passes vs scene-exit cap)
     - per-ray visits under IDEAL entry-ordered traversal with per-ray
       termination (visit while entry_t <= running best hit t)
     - per-1024-ray-block union of the terminated visit sets — the
       lower bound for ANY block-synchronous walk with per-ray caps
  B. instance level (one AABB per placement, from the scene desc):
     the same three numbers against 258-ish instance boxes, with exact
     per-instance hit t from Moller-Trumbore over the placement's tris.

These are the numbers that decide whether the 15 Mray/s target is
reachable by scan/visit elimination (block unions small) or needs a
per-visit cost revolution (unions large).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax.numpy as jnp

from gatling_tpu.scene.examples import sphere_field
from gatling_tpu.ops.geometry import build_geometry
from gatling_tpu.render.material import build_material_table, lower_material
from gatling_tpu.ops.pallas_bounce import build_fused_scene
from gatling_tpu.render.camera import CameraUniforms, generate_primary_rays
from gatling_tpu.render.fused import _tile_order

BLK = 1024


def ray_sets():
    if os.environ.get("GATLING_SIM_SCENE") == "interior":
        from gatling_tpu.scene.examples import interior

        desc = interior()
    else:
        desc = sphere_field()
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
    rng = jnp.zeros((W * H,), jnp.uint32)
    o, d, _ = generate_primary_rays(cu, W, H, px, py, rng, False, False, False)
    sets = [("primary", np.asarray(o, np.float32), np.asarray(d, np.float32),
             np.ones(W * H, bool))]
    if os.path.exists("/tmp/state1.npy"):
        st = np.load("/tmp/state1.npy").astype(np.float32)
        o1 = st[0:3].reshape(3, -1).T
        d1 = st[3:6].reshape(3, -1).T
        a1 = st[13].reshape(-1) > 0.5
        sets.append(("bounce1", o1, d1, a1))
    return desc, sets


def binned_union(entry, tbest, alive, label, chunk=None):
    """Re-sort rays by (first-candidate id, entry t) — the proposed
    binning key — and report block unions of the terminated visit sets.
    chunk=N sorts whole N-ray chunks by their majority key instead
    (the cheap chunk-granularity permutation)."""
    R, K = entry.shape
    first = np.argmin(entry, axis=1)          # first candidate id (by entry)
    e0 = entry[np.arange(R), first]
    first = np.where(np.isfinite(e0), first, K)  # no candidates -> last
    key = first.astype(np.float64) * 1e6 + np.minimum(e0, 9e5)
    key = np.where(alive, key, np.inf)
    if chunk:
        ck = key.reshape(-1, chunk)
        ckey = np.median(np.where(np.isfinite(ck), ck, 1e12), axis=1)
        order = (np.argsort(ckey, kind="stable")[:, None] * chunk
                 + np.arange(chunk)).reshape(-1)
    else:
        order = np.argsort(key, kind="stable")
    ent_s, t_s, al_s = entry[order], tbest[order], alive[order]
    vis = terminated_stats(ent_s, t_s, al_s, label)
    return vis


def terminated_stats(entry, tbest, alive, label):
    """entry/tbest: [R, K] padded with inf. Per-ray ordered walk:
    visit k iff entry[k] <= cummin(t of visits before k)."""
    R, K = entry.shape
    srt = np.argsort(entry, axis=1)
    e_s = np.take_along_axis(entry, srt, axis=1)
    t_s = np.take_along_axis(tbest, srt, axis=1)
    # sequential dependency: visited-only cummin. A candidate skipped by
    # termination contributes no t (its t >= entry > best anyway when
    # entry ordering holds: entry <= t always, and if entry > best then
    # t > best too) => plain cummin of t_s is EXACT for the running best.
    best_before = np.concatenate(
        [np.full((R, 1), np.inf, np.float32),
         np.minimum.accumulate(t_s, axis=1)[:, :-1]], axis=1)
    visited = (e_s <= best_before) & np.isfinite(e_s)
    nvis = visited.sum(1)
    ncand = np.isfinite(entry).sum(1)
    hit = np.isfinite(tbest).any(1)
    a = alive
    print(f"[{label}] rays alive {a.sum()}  hit-frac {hit[a].mean():.3f}")
    for name, v in (("candidates", ncand), ("terminated-visits", nvis)):
        print(f"  {name}: mean {v[a].mean():.2f}  p50 {np.percentile(v[a],50):.0f} "
              f"p95 {np.percentile(v[a],95):.0f}  hit-mean {v[a & hit].mean():.2f} "
              f"miss-mean {v[a & ~hit].mean() if (a & ~hit).any() else 0:.2f}")
    # block union of terminated visit sets, per requested block size
    idx_s = np.take_along_axis(
        np.broadcast_to(np.arange(K, dtype=np.int32), (R, K)), srt, axis=1)
    for blk in [int(x) for x in os.environ.get(
            "GATLING_SIM_BLOCKS", str(BLK)).split(",")]:
        nb = R // blk
        uni, unic = [], []
        for b in range(nb):
            sl = slice(b * blk, (b + 1) * blk)
            if not alive[sl].any():
                continue
            vis_ids = idx_s[sl][visited[sl] & alive[sl, None]]
            cand_ids = np.nonzero(np.isfinite(entry[sl]) & alive[sl, None])[1]
            uni.append(np.unique(vis_ids).size)
            unic.append(np.unique(cand_ids).size)
        uni, unic = np.array(uni), np.array(unic)
        print(f"  block[{blk}] union candidates: mean {unic.mean():.1f} "
              f"p95 {np.percentile(unic,95):.0f}  "
              f"terminated: mean {uni.mean():.1f} "
              f"p95 {np.percentile(uni,95):.0f}  "
              f"visit-time-proxy {unic.mean() * (R // blk):.0f}")
    return visited


def slab_entry(lo, hi, o, inv, cap):
    """Vectorized slab: lo/hi [3, K], o/inv [R, 3] -> entry [R, K] (inf when
    missed)."""
    t0 = (lo[None, :, :] - o[:, :, None]) * inv[:, :, None]
    t1 = (hi[None, :, :] - o[:, :, None]) * inv[:, :, None]
    ten = np.maximum(np.minimum(t0, t1).max(1), 0.0)
    tex = np.minimum(np.maximum(t0, t1).min(1), cap[:, None])
    return np.where(ten <= tex, ten, np.inf).astype(np.float32)


def main():
    desc, sets = ray_sets()
    midx = {m.material: 0 for m in desc.meshes}
    midx[None] = 0
    geom = build_geometry(desc.meshes, midx)
    table = build_material_table([lower_material(None)])
    scene, static = build_fused_scene(geom, table, None)
    l2 = np.asarray(scene.l2_aabbs, np.float32)
    tris = np.asarray(scene.tris, np.float32)
    C = tris.shape[0]

    # instance boxes + tri lists straight from the desc
    inst_tris = []  # [(v0, e1, e2)] world space per placement
    for m in desc.meshes:
        pts = m.mesh.positions.reshape(-1, 3, 3)  # [T, corner, 3]
        xfs = (m.instance_transforms if m.instance_transforms is not None
               else m.transform[None])
        for xf in xfs:
            w = pts @ xf[:3, :3] + xf[3, :3]
            v0 = w[:, 0]
            inst_tris.append((v0.astype(np.float32),
                              (w[:, 1] - v0).astype(np.float32),
                              (w[:, 2] - v0).astype(np.float32)))
    n_inst = len(inst_tris)
    ilo = np.stack([np.minimum.reduce([v0, v0 + e1, v0 + e2]).min(0)
                    for v0, e1, e2 in inst_tris], axis=1)
    ihi = np.stack([np.maximum.reduce([v0, v0 + e1, v0 + e2]).max(0)
                    for v0, e1, e2 in inst_tris], axis=1)
    print(f"scene: {C} clusters, {n_inst} instances")

    g_lo = ilo.min(1); g_hi = ihi.max(1)

    stride = int(os.environ.get("SIM_BLOCK_STRIDE", "4"))
    for label, o, d, alive in sets:
        # subsample whole 1024-ray blocks (block-union stats need intact
        # blocks; every stride-th block keeps scene coverage)
        keep = np.zeros(o.shape[0], bool)
        for b in range(0, o.shape[0] // BLK, stride):
            keep[b * BLK:(b + 1) * BLK] = True
        o, d, alive = o[keep], d[keep], alive[keep]
        R = o.shape[0]
        inv = 1.0 / np.where(np.abs(d) < 1e-20,
                             np.where(d >= 0, 1e-20, -1e-20), d)
        ex = np.maximum((g_lo - o) * inv, (g_hi - o) * inv)
        cap0 = np.maximum(ex.min(1), 0.0) * 1.0001 + 1e-3

        if os.environ.get("SIM_SKIP_INSTANCES"):
            entry_c = np.full((R, C), np.inf, np.float32)
            for c0 in range(0, R, 16384):
                sl = slice(c0, c0 + 16384)
                entry_c[sl] = slab_entry(l2[0:3], l2[3:6], o[sl], inv[sl],
                                         cap0[sl])
            entry_c[~alive] = np.inf
            tbest_c = np.full((R, C), np.inf, np.float32)
            n = tris[:, 0:3]
            d0 = tris[:, 3]
            r1 = tris[:, 8:12]
            r2 = tris[:, 16:20]
            for c in range(C):
                cand = np.isfinite(entry_c[:, c])
                if not cand.any():
                    continue
                rs = np.nonzero(cand)[0]
                oo, dd = o[rs], d[rs]
                nd = dd @ n[c]
                po = oo @ n[c] + d0[c]
                with np.errstate(divide="ignore", invalid="ignore"):
                    tt = -po / np.where(np.abs(nd) > 1e-12, nd, np.nan)
                u = (oo @ r1[c, 0:3]) + tt * (dd @ r1[c, 0:3]) + r1[c, 3]
                v = (oo @ r2[c, 0:3]) + tt * (dd @ r2[c, 0:3]) + r2[c, 3]
                ok = (np.isfinite(tt) & (u >= 0) & (v >= 0)
                      & (u + v <= 1) & (tt > 1e-4))
                tbest_c[rs, c] = np.where(ok, tt, np.inf).min(1)
            terminated_stats(entry_c, tbest_c, alive, f"{label} / clusters")
            binned_union(entry_c, tbest_c, alive,
                         f"{label} / clusters BINNED per-ray")
            continue

        # ---- instance level ----
        entry_i = slab_entry(ilo, ihi, o, inv, cap0)   # [R, n_inst]
        entry_i[~alive] = np.inf
        tbest_i = np.full((R, n_inst), np.inf, np.float32)
        for i in range(n_inst):
            cand = np.isfinite(entry_i[:, i])
            if not cand.any():
                continue
            ri = np.nonzero(cand)[0]
            v0, e1, e2 = inst_tris[i]
            # Moller-Trumbore, chunked over rays
            for c0 in range(0, ri.size, 8192):
                rs = ri[c0:c0 + 8192]
                oo, dd = o[rs], d[rs]
                p = np.cross(dd[:, None, :], e2[None])         # [r, T, 3]
                det = (p * e1[None]).sum(-1)
                okd = np.abs(det) > 1e-12
                idet = 1.0 / np.where(okd, det, 1.0)
                tv = oo[:, None, :] - v0[None]
                u = (tv * p).sum(-1) * idet
                q = np.cross(tv, e1[None])
                v = (q * dd[:, None, :]).sum(-1) * idet
                t = (q * e2[None]).sum(-1) * idet
                ok = okd & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-4)
                t = np.where(ok, t, np.inf).min(1)
                tbest_i[rs, i] = t
        print()
        vis_i = terminated_stats(entry_i, tbest_i, alive, f"{label} / instances")
        binned_union(entry_i, tbest_i, alive,
                     f"{label} / instances BINNED per-ray")
        binned_union(entry_i, tbest_i, alive,
                     f"{label} / instances BINNED chunk128", chunk=128)
        if os.environ.get("SIM_SKIP_CLUSTERS"):
            continue

        # ---- cluster level ----
        entry_c = np.full((R, C), np.inf, np.float32)
        for c0 in range(0, R, 16384):
            sl = slice(c0, c0 + 16384)
            entry_c[sl] = slab_entry(l2[0:3], l2[3:6], o[sl], inv[sl], cap0[sl])
        entry_c[~alive] = np.inf
        tbest_c = np.full((R, C), np.inf, np.float32)
        n = tris[:, 0:3]; d0 = tris[:, 3]
        r1 = tris[:, 8:12]; r2 = tris[:, 16:20]
        for c in range(C):
            cand = np.isfinite(entry_c[:, c])
            if not cand.any():
                continue
            rs = np.nonzero(cand)[0]
            oo, dd = o[rs], d[rs]
            nd = dd @ n[c]
            po = oo @ n[c] + d0[c]
            with np.errstate(divide="ignore", invalid="ignore"):
                tt = -po / np.where(np.abs(nd) > 1e-12, nd, np.nan)
            u = (oo @ r1[c, 0:3]) + tt * (dd @ r1[c, 0:3]) + r1[c, 3]
            v = (oo @ r2[c, 0:3]) + tt * (dd @ r2[c, 0:3]) + r2[c, 3]
            ok = np.isfinite(tt) & (u >= 0) & (v >= 0) & (u + v <= 1) & (tt > 1e-4)
            tbest_c[rs, c] = np.where(ok, tt, np.inf).min(1)
        terminated_stats(entry_c, tbest_c, alive, f"{label} / clusters")


if __name__ == "__main__":
    main()
