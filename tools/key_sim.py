import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
"""Compare ray-sort key schemes by simulated cluster visits on the real
sorted bounce-1 state (alive rays only, repacked into 1024-ray blocks the
way _sort_state would)."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np, jax.numpy as jnp
from gatling_tpu.scene.examples import sphere_field
from gatling_tpu.ops.geometry import build_geometry
from gatling_tpu.render.material import build_material_table, lower_material
from gatling_tpu.ops.pallas_bounce import build_fused_scene, L1_FAN

desc = sphere_field()
geom = build_geometry(desc.meshes, {None: 0})
table = build_material_table([lower_material(None)])
scene, static = build_fused_scene(geom, table, None)
l1 = np.asarray(scene.l1_aabbs, np.float64)
l2 = np.asarray(scene.l2_aabbs, np.float64)
n_l1 = static.n_l1

st = np.load("/tmp/state1.npy").astype(np.float64)
alive = st[13].reshape(-1) > 0.5
o_all = st[0:3].reshape(3, -1).T
d_all = st[3:6].reshape(3, -1).T

g_lo = np.where(l1[0:3] <= 1e30, l1[0:3], 1e30).min(1)
g_hi = np.where(l1[3:6] >= -1e30, l1[3:6], -1e30).max(1)
span = np.maximum(g_hi - g_lo, 1e-6)

def spread3(x):
    x = x.astype(np.uint32)
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x

def keys_scheme(o, d, dir_bits, mor_bits_per_axis, dir_major=True):
    # direction bin: octant (3b) or octahedral grid
    if dir_bits == 3:
        db = ((d[:, 0] >= 0).astype(np.uint32)
              | ((d[:, 1] >= 0).astype(np.uint32) << 1)
              | ((d[:, 2] >= 0).astype(np.uint32) << 2))
    else:
        s = np.abs(d).sum(1)
        px, py, pz = d[:, 0] / s, d[:, 1] / s, d[:, 2] / s
        fold = pz < 0
        ox = np.where(fold, (1 - np.abs(py)) * np.sign(px), px)
        oy = np.where(fold, (1 - np.abs(px)) * np.sign(py), py)
        g = 1 << ((dir_bits) // 2)
        qx = np.clip(((ox + 1) * 0.5 * g).astype(np.int64), 0, g - 1)
        qy = np.clip(((oy + 1) * 0.5 * g).astype(np.int64), 0, g - 1)
        db = (qx * g + qy).astype(np.uint32)
    q = []
    n_cells = 1 << mor_bits_per_axis
    for ax in range(3):
        t = np.clip(((o[:, ax] - g_lo[ax]) / span[ax] * n_cells).astype(np.int64),
                    0, n_cells - 1)
        q.append(t.astype(np.uint32))
    mor = spread3(q[0]) | (spread3(q[1]) << 1) | (spread3(q[2]) << 2)
    if dir_major:
        return (db.astype(np.uint64) << np.uint64(3 * mor_bits_per_axis)) | mor.astype(np.uint64)
    return (mor.astype(np.uint64) << np.uint64(dir_bits)) | db.astype(np.uint64)

def visits(o, d):
    """mean L2-slab-passing clusters per 1024-block (untightened caps:
    uniform overestimate, fine for RANKING key schemes)."""
    BLK = 1024
    inv = 1.0 / np.where(np.abs(d) < 1e-20, np.where(d >= 0, 1e-20, -1e-20), d)
    ex = np.maximum((g_lo - o) * inv, (g_hi - o) * inv)
    cap0 = np.maximum(ex.min(1), 0.0) * 1.0001 + 1e-3
    tot_cl, tot_gr, nb = 0, 0, 0
    for b0 in range(0, len(o), BLK):
        ob, ib = o[b0:b0+BLK], inv[b0:b0+BLK]
        if len(ob) < BLK:
            break
        cap = cap0[b0:b0+BLK]
        # L2 slabs for all clusters at once: [BLK, C]
        t0 = (l2[None, 0:3, :] - ob[:, :, None]) * ib[:, :, None]
        t1 = (l2[None, 3:6, :] - ob[:, :, None]) * ib[:, :, None]
        ten = np.maximum(np.minimum(t0, t1).max(1), 0.0)
        tex = np.minimum(np.maximum(t0, t1).min(1), cap[:, None])
        passed = (ten <= tex).any(0)          # [C]
        tot_cl += passed.sum()
        tot_gr += passed.reshape(n_l1, L1_FAN).any(1).sum()
        nb += 1
    return tot_cl / nb, tot_gr / nb

oa, da = o_all[alive], d_all[alive]
schemes = [
    ("current oct3+mor5/axis (as loaded)", None),
    ("oct3 + mor5", (3, 5, True)),
    ("octa6 + mor4", (6, 4, True)),
    ("octa8 + mor4", (8, 4, True)),
    ("octa6 + mor6", (6, 6, True)),
    ("mor5-major + oct3", (3, 5, False)),
    ("mor6-major + octa6", (6, 6, False)),
]
for name, cfgk in schemes:
    if cfgk is None:
        ov, dv = oa, da
    else:
        k = keys_scheme(oa, da, *cfgk)
        idx = np.argsort(k, kind="stable")
        ov, dv = oa[idx], da[idx]
    cl, gr = visits(ov, dv)
    print(f"{name}: clusters/block {cl:.1f}, groups/block {gr:.1f}")
