"""Device geometry buffers: flattened world-space triangle soup.

This is the TPU-native replacement for the reference's BLAS/TLAS + per-mesh
payload buffers (reference: Gi.cpp:784-1204 _giBuildGeometryStructures,
CgpuVk.cpp:2695 cgpuCreateBlas): instead of hardware acceleration structures
with per-instance SBT offsets, every mesh instance is pre-transformed into a
single struct-of-arrays triangle soup (positions baked to world space,
per-triangle material/object/face/instance ids). Flat static-shape arrays
gather-free along the hot path is what XLA tiles best; the hierarchy for
large scenes lives in ops/bvh.py on top of the same buffers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from gatling_tpu.interface import MESH_FLAG_DOUBLE_SIDED, MESH_FLAG_FLIP_FACING

PAD_MULTIPLE = 128  # lane width; padded triangles are degenerate and never hit


class SceneGeometry(NamedTuple):
    """World-space triangle soup, SoA, padded to a multiple of PAD_MULTIPLE.

    Intersection uses (v0, e1, e2); shading uses the per-corner attributes.
    Equivalent information to the reference's FVertex + BlasPayload preamble
    (rp_main.h:62-145) but laid out for vectorized access.
    """

    # intersection data
    v0: jnp.ndarray  # [T,3] f32 first vertex
    e1: jnp.ndarray  # [T,3] f32 v1 - v0
    e2: jnp.ndarray  # [T,3] f32 v2 - v0

    # shading data (world space)
    n0: jnp.ndarray  # [T,3] f32 shading normals per corner
    n1: jnp.ndarray
    n2: jnp.ndarray
    t0: jnp.ndarray  # [T,3] f32 tangents per corner
    t1: jnp.ndarray
    t2: jnp.ndarray
    bsign: jnp.ndarray  # [T,3] f32 bitangent signs per corner
    uv0: jnp.ndarray  # [T,2] f32
    uv1: jnp.ndarray
    uv2: jnp.ndarray
    c0: jnp.ndarray  # [T,3] f32 vertex colors per corner (displayColor
    c1: jnp.ndarray  # primvar; all-ones when the mesh has none — shading
    c2: jnp.ndarray  # multiplies base_color by the interpolated value)

    # per-triangle ids
    material_id: jnp.ndarray  # [T] i32
    object_id: jnp.ndarray  # [T] i32 (AOV_ID_OBJECT_ID source)
    face_id: jnp.ndarray  # [T] i32 source polygon index (AOV_ID_FACE_ID)
    instance_id: jnp.ndarray  # [T] i32 (AOV_ID_INSTANCE_ID)
    flags: jnp.ndarray  # [T] i32 MESH_FLAG_* bits

    # packed row-gather mirrors: one [T, C] matrix per dtype so the shading
    # stage does TWO contiguous row gathers per hit instead of ~30 scattered
    # column gathers (XLA TPU gathers pay per-op, not per-byte; widening a
    # row is free, so vertex colors ride the same gather)
    packed_f: jnp.ndarray  # [T, 45] f32: v0 e1 e2 n0 n1 n2 t0 t1 t2 bsign uv0 uv1 uv2 c0 c1 c2
    packed_i: jnp.ndarray  # [T, 5] i32: material object face instance flags

    @property
    def num_triangles(self) -> int:
        return self.v0.shape[0]


# column offsets into packed_f
PF_V0, PF_E1, PF_E2 = 0, 3, 6
PF_N0, PF_N1, PF_N2 = 9, 12, 15
PF_T0, PF_T1, PF_T2 = 18, 21, 24
PF_BSIGN = 27
PF_UV0, PF_UV1, PF_UV2 = 30, 32, 34
PF_C0, PF_C1, PF_C2 = 36, 39, 42
PF_WIDTH = 45


def pack_geometry(g: "SceneGeometry") -> "SceneGeometry":
    """(Re)build the packed gather mirrors from the component arrays."""
    packed_f = jnp.concatenate([
        g.v0, g.e1, g.e2, g.n0, g.n1, g.n2, g.t0, g.t1, g.t2,
        g.bsign, g.uv0, g.uv1, g.uv2, g.c0, g.c1, g.c2,
    ], axis=1)
    packed_i = jnp.stack(
        [g.material_id, g.object_id, g.face_id, g.instance_id, g.flags], axis=1)
    return g._replace(packed_f=packed_f, packed_i=packed_i)


def _pad(arr: np.ndarray, t_pad: int) -> np.ndarray:
    pad = t_pad - arr.shape[0]
    if pad == 0:
        return arr
    return np.concatenate([arr, np.zeros((pad,) + arr.shape[1:], arr.dtype)], axis=0)


class GeomCache:
    """Host-side soup mirror for incremental updates: the padded numpy
    component arrays plus per-instance slice ranges. The reference's analog
    is the BLAS/TLAS split — transform edits re-build only the instance
    array (Gi.cpp:1188-1202); here they re-transform only the instance's
    world-space slice of the soup."""

    def __init__(self, arrays: dict[str, np.ndarray],
                 instances: list[tuple[object, int, int, int]]) -> None:
        self.arrays = arrays  # padded world-space components, np
        # (mesh_desc, instance index within the desc, start, count)
        self.instances = instances

    def instances_of(self, mesh_desc) -> list[tuple[int, int, int]]:
        return [(i, s, c) for (m, i, s, c) in self.instances if m is mesh_desc]


def _instance_rows(tm, xform, mesh_desc, material_row: int, object_id: int,
                   instance_id: int) -> dict[str, np.ndarray]:
    """World-space component rows for one mesh instance."""
    m = np.asarray(xform, np.float64)
    lin = m[:3, :3]
    # normals transform by inverse-transpose of the linear part
    try:
        nrm_m = np.linalg.inv(lin).T
    except np.linalg.LinAlgError:
        nrm_m = lin
    det = np.linalg.det(lin)

    pos = tm.positions @ lin + m[3, :3]
    p = pos.reshape(-1, 3, 3)
    # row-vector normal transform: n' = n @ inv(lin)^T
    nrm = tm.normals @ nrm_m
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-20)
    tan = tm.tangents @ lin
    tan /= np.maximum(np.linalg.norm(tan, axis=1, keepdims=True), 1e-20)
    n = nrm.reshape(-1, 3, 3)
    t = tan.reshape(-1, 3, 3)
    uv = tm.uvs.reshape(-1, 3, 2)
    bs = tm.bitangent_signs.reshape(-1, 3)
    n_tris = tm.num_triangles
    if getattr(tm, "colors", None) is not None:
        col = tm.colors.reshape(-1, 3, 3)
    else:
        col = np.ones((n_tris, 3, 3), np.float32)

    flags = (MESH_FLAG_DOUBLE_SIDED if mesh_desc.double_sided else 0)
    # negative determinant flips facing (reference: isLeftHanded flag,
    # Gi.cpp BLAS_PAYLOAD_BITFLAG_FLIP_FACING)
    if det < 0:
        flags |= MESH_FLAG_FLIP_FACING

    return {
        "p0": p[:, 0], "p1": p[:, 1], "p2": p[:, 2],
        "n0": n[:, 0], "n1": n[:, 1], "n2": n[:, 2],
        "t0": t[:, 0], "t1": t[:, 1], "t2": t[:, 2],
        "bs": bs,
        "uv0": uv[:, 0], "uv1": uv[:, 1], "uv2": uv[:, 2],
        "c0": col[:, 0], "c1": col[:, 1], "c2": col[:, 2],
        "mat": np.full(n_tris, material_row, np.int32),
        "obj": np.full(n_tris, object_id, np.int32),
        "face": tm.face_ids.astype(np.int32),
        "inst": np.full(n_tris, instance_id, np.int32),
        "flags": np.full(n_tris, flags, np.int32),
    }


_CHUNK_KEYS = ("p0", "p1", "p2", "n0", "n1", "n2", "t0", "t1", "t2",
               "bs", "uv0", "uv1", "uv2", "c0", "c1", "c2",
               "mat", "obj", "face", "inst", "flags")


def _geom_from_arrays(cat: dict[str, np.ndarray]) -> SceneGeometry:
    f32 = lambda k: jnp.asarray(cat[k].astype(np.float32, copy=False))  # noqa: E731
    i32 = lambda k: jnp.asarray(cat[k].astype(np.int32, copy=False))  # noqa: E731
    t_pad = len(cat["p0"])
    geom = SceneGeometry(
        v0=f32("p0"),
        e1=jnp.asarray((cat["p1"] - cat["p0"]).astype(np.float32)),
        e2=jnp.asarray((cat["p2"] - cat["p0"]).astype(np.float32)),
        n0=f32("n0"), n1=f32("n1"), n2=f32("n2"),
        t0=f32("t0"), t1=f32("t1"), t2=f32("t2"),
        bsign=f32("bs"),
        uv0=f32("uv0"), uv1=f32("uv1"), uv2=f32("uv2"),
        c0=f32("c0"), c1=f32("c1"), c2=f32("c2"),
        material_id=i32("mat"), object_id=i32("obj"),
        face_id=i32("face"), instance_id=i32("inst"), flags=i32("flags"),
        packed_f=jnp.zeros((t_pad, PF_WIDTH), jnp.float32),
        packed_i=jnp.zeros((t_pad, 5), jnp.int32),
    )
    return pack_geometry(geom)


def build_geometry_cached(
    mesh_descs, material_index: dict[str | None, int],
) -> tuple[SceneGeometry, GeomCache]:
    """build_geometry + the host-side cache for incremental transform
    updates (update_instance_transforms)."""
    chunks: dict[str, list[np.ndarray]] = {k: [] for k in _CHUNK_KEYS}
    instances: list[tuple[object, int, int, int]] = []

    instance_counter = 0
    cursor = 0
    from gatling_tpu.scene.meshproc import materialize_mesh

    for mesh_desc in mesh_descs:
        # lazy decompression of compressed mesh payloads (the reference
        # decompresses at BLAS-build time, MeshProcessing.cpp:214-236)
        tm = materialize_mesh(mesh_desc.mesh)
        transforms = mesh_desc.instance_transforms
        if transforms is None:
            transforms = mesh_desc.transform[None]
        for local_i, xform in enumerate(transforms):
            rows = _instance_rows(
                tm, xform, mesh_desc,
                material_index.get(mesh_desc.material, 0),
                mesh_desc.object_id, instance_counter)
            for k in _CHUNK_KEYS:
                chunks[k].append(rows[k])
            instances.append((mesh_desc, local_i, cursor, tm.num_triangles))
            cursor += tm.num_triangles
            instance_counter += 1

    cat = {k: np.concatenate(v, axis=0) if v else np.zeros(
        (0, 3) if k in ("p0", "p1", "p2", "n0", "n1", "n2", "t0", "t1", "t2",
                        "bs", "c0", "c1", "c2")
        else ((0, 2) if k.startswith("uv") else (0,)), np.float32)
        for k, v in chunks.items()}
    t_count = len(cat["p0"])
    t_pad = max(PAD_MULTIPLE, -(-t_count // PAD_MULTIPLE) * PAD_MULTIPLE)
    cat = {k: _pad(np.ascontiguousarray(v), t_pad) for k, v in cat.items()}
    cache = GeomCache(cat, instances)
    return _geom_from_arrays(cat), cache


def build_geometry(mesh_descs, material_index: dict[str | None, int]) -> SceneGeometry:
    """Flatten MeshDescs (scene.stage) into one world-space SceneGeometry.

    `material_index` maps material prim path (or None) -> material table row,
    the wavefront analog of the reference's SBT hitGroupIndex = matIdx * 2
    (Gi.cpp:1195).
    """
    geom, _cache = build_geometry_cached(mesh_descs, material_index)
    return geom


def update_instance_transforms(
    cache: GeomCache, mesh_descs, material_index: dict[str | None, int],
) -> SceneGeometry:
    """Re-transform ONLY the given meshes' slices of the cached soup and
    rebuild the device arrays — no topology work, no triangle reordering:
    the analog of the reference's instance-array-only TLAS rebuild
    (Gi.cpp:1188-1202). Returns the refreshed SceneGeometry."""
    changed = set(id(m) for m in mesh_descs)
    for (mesh_desc, local_i, start, count) in cache.instances:
        if id(mesh_desc) not in changed:
            continue
        transforms = mesh_desc.instance_transforms
        xform = mesh_desc.transform if transforms is None else transforms[local_i]
        from gatling_tpu.scene.meshproc import materialize_mesh

        rows = _instance_rows(
            materialize_mesh(mesh_desc.mesh), xform, mesh_desc,
            material_index.get(mesh_desc.material, 0),
            mesh_desc.object_id,
            int(cache.arrays["inst"][start]))
        for k in _CHUNK_KEYS:
            cache.arrays[k][start:start + count] = rows[k]
    return _geom_from_arrays(cache.arrays)


def build_instance_primvar_tables(mesh_descs) -> dict:
    """Per-instance primvar tables indexed by the SAME sequential instance
    id build_geometry_cached assigns (one id per (mesh, transform) pair, in
    mesh_descs order). MeshDesc.instance_primvars carries {name: [K, <=3]}
    values aligned with the mesh's instance_transforms — the instancer
    primvar scene-data route (reference: instancer.cpp:138-189 forwards any
    instancer primvar into BLAS scene-data reads). Missing names default to
    zeros; scalar primvars broadcast into .x with y=z=0."""
    names: set[str] = set()
    total = 0
    for md in mesh_descs:
        k = (len(md.instance_transforms)
             if md.instance_transforms is not None else 1)
        total += k
        pv = getattr(md, "instance_primvars", None)
        if pv:
            names.update(pv)
    if not names:
        return {}
    out = {n: np.zeros((max(total, 1), 3), np.float32) for n in sorted(names)}
    i = 0
    for md in mesh_descs:
        k = (len(md.instance_transforms)
             if md.instance_transforms is not None else 1)
        pv = getattr(md, "instance_primvars", None) or {}
        for n in names:
            if n in pv:
                v = np.asarray(pv[n], np.float32).reshape(k, -1)
                w = min(v.shape[1], 3)
                out[n][i:i + k, :w] = v[:, :w]
        i += k
    return {n: jnp.asarray(v) for n, v in out.items()}
