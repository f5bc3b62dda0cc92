"""Fused Pallas bounce megakernel (round 2).

Why this exists: the XLA wavefront integrator moves ~86 KB of HBM traffic
per ray per frame (measured via compiled cost analysis, see PERF.md) because
every intermediate between fusion islands is a [N,*] HBM buffer. This kernel
fuses an ENTIRE path-tracing bounce — closest-hit search, shading-state
interpolation, emission, uber-BSDF importance sampling, NEE light sampling +
shadow occlusion, RNG advance, russian roulette — into one Pallas program
whose only HBM traffic is the packed ray state (16 f32 per ray, aliased
in/out) plus scene tables resident in SMEM. It is the true TPU analog of the
reference's ray-tracing megakernel (rp_main.rgen + rp_main.chit +
rp_main.ahit + rp_main.miss in one dispatch, including the NEE shadow
traceRayEXT of rp_main.rgen:397-438).

Layouts (the whole point):
* ray state: [16, R/128, 128] — component-major, so every per-ray quantity
  is a fully-packed [8,128] vreg tile inside the kernel (rays on sublanes x
  lanes); no [N,3] minor-dim hazards exist anywhere,
* triangles: [32, T] scalar-broadcast tables (Baldwin-Weber precomputed
  plane + barycentric rows — ~20% fewer ops than Moller-Trumbore) walked by
  a fori loop — each triangle tests against all 1024 rays of the block,
* materials: [M,24] packed rows resolved by a small select loop,
* lights: [L,20] packed rows; NEE code is generated per static light list
  (the analog of the reference's per-scene shader specialization),
* large scenes (clustered mode): triangles live in HBM as [C,32,128]
  Morton-ordered clusters; two-level cluster AABBs in SMEM cull the walk
  per ray block, intersected clusters are DMA'd HBM->SMEM on demand. This
  replaces the reference's hardware BVH (CgpuVk.cpp:2695-2854) with a
  TPU-native bounded-depth hierarchy: AABB slab tests are uniform vector
  work, and only surviving clusters pay DMA + triangle loops.

Dome lighting: the kernel records the bounce at which a ray missed
(state row 14); the equirect dome lookup runs as a vectorized XLA pass after
the bounce loop (render/fused.py) — per-ray texture gathers are impossible
inside a Mosaic kernel, and a path can miss at most once so the post-pass is
exact, not an approximation.

Fast-path scope (round 2): constant-parameter materials (no textures), no
volumes, no cutout; NEE, dome and arbitrary triangle counts ARE supported.
The RNG stream matches the general integrator (pcg32, same draw order), but
the shading frame uses the Duff ONB of the shading normal instead of mesh
tangents, so individual samples differ by an azimuthal rotation while the
estimator's distribution is identical.

State rows: 0-2 origin, 3-5 dir, 6-8 throughput, 9-11 radiance,
12 rng (bitcast u32), 13 alive flag, 14 miss record (0 = none, else
1 + bounce index at which the ray missed), 15 traced-segment counter
(path segments + NEE shadow rays; the Mray/s accounting source).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gatling_tpu.interface import (
    BARY_EPS,
    FLOAT_MAX,
    LightArrays,
    MESH_FLAG_DOUBLE_SIDED,
    MESH_FLAG_FLIP_FACING,
)
from gatling_tpu.ops.geometry import SceneGeometry
from gatling_tpu.render.material import MaterialTable

# Clustered-mode block size: the matrix walk's transposed-ray matmuls and
# scratch are shaped around 1024-ray blocks, and 32x32-px tiles map to one
# block (tight primary frusta). The RESIDENT (SMEM-table) path instead uses
# static.block_rows = 16 (2048-ray blocks): measured on v5e (tools/
# dead_prof.py), the per-block fixed grid+DMA overhead is ~2.6 us, and
# halving the block count cut the all-alive bounce 4.9 -> 3.6 ms/iter with
# no downside (8192-ray blocks were slightly worse).
# GATLING_RAY_BLOCK widens the clustered walk block (e.g. 2048): the
# per-ray-union sim (PERF.md block-size sweep) measured total visit work
# shrinking 1.3-1.6x at 2048-4096 because block unions grow sublinearly.
# Every kernel shape derives from these two constants (import-time env).
import os as _os0  # noqa: E402

RAY_BLOCK = int(_os0.environ.get("GATLING_RAY_BLOCK", "1024"))
BLOCK_ROWS = RAY_BLOCK // 128  # 8 at the 1024 default
STATE_ROWS = 16
PI = 3.14159265358979
MIN_ALPHA = 1e-3

# triangle table rows (resident: [TRI_ROWS, T] SMEM; clustered: [C, TRI_ROWS, 128]
# HBM, DMA'd per cluster). TRI_ROWS must be a multiple of 8: the TPU DMA engine
# faults on non-8-multiple sublane extents (measured; see memory notes).
TR_N = 0      # 0-2: plane normal = cross(e1,e2), unnormalized, no flip
TR_D0 = 3     # plane offset: -dot(n, v0)
TR_R1 = 4     # 4-7: barycentric u row: r1.xyz, c1  (u = dot(r1,p)+c1)
TR_R2 = 8     # 8-11: barycentric v row
TR_GN = 12    # 12-14: geometric normal (normalized, flip-facing applied)
TR_N0 = 15    # 15-17, 18-20, 21-23: shading normals per corner
TR_N1 = 18
TR_N2 = 21
TR_MAT = 24
TR_DS = 25
TR_UV = 26    # 26-31: uv0.xy uv1.xy uv2.xy (reserved for the textured path)
TRI_ROWS = 32
# tangent extension (static.tangents — normal-mapped scenes only):
# per-corner tangents + bitangent signs for the textured split-bounce path
TR_T0 = 32    # 32-34, 35-37, 38-40: tangents per corner
TR_T1 = 35
TR_T2 = 38
TR_BS = 41    # 41-43: bitangent signs per corner
TRI_ROWS_TAN = 48  # padded to a multiple of 8 (DMA sublane rule)

CLUSTER_SIZE = 128
L1_FAN = 16  # clusters per level-1 AABB group

# Clustered-mode row layout [CLU_TRI_ROWS, 128] — a permutation of the
# canonical TR_* rows that puts each Baldwin-Weber quad at an 8-ALIGNED
# sublane offset (Mosaic vreg tiles are (8,128); lane-concatenating
# sublane-misaligned slices does not legalize). The matrix walk contracts
# rows q..q+7 per quad against a LHS whose columns 4-7 are zero, so the
# attr rows parked in each quad's upper half contribute exactly 0.
CLU_N = 0     # 0-2 n, 3 d0  | 4-6 gn, 7 mat
CLU_GN = 4
CLU_MAT = 7
CLU_R1 = 8    # 8-10 r1, 11 c1 | 12-14 n0, 15 dsided
CLU_N0 = 12
CLU_DS = 15
CLU_R2 = 16   # 16-18 r2, 19 c2 | 20-22 n1
CLU_N1 = 20
CLU_N2 = 24   # 24-26 n2
CLU_UV = 28   # 28-33 uv0.xy uv1.xy uv2.xy
CLU_OPAC = 34  # stochastic-cutout pass probability (1.0 = opaque)
CLU_OPAC_SH = 35  # SHADOW-walk pass probability (textured: UV-mean opacity)
CLU_TRI_ROWS = 40
# tangent extension rows (static.tangents only)
CLU_T0 = 40   # 40-42, 43-45, 46-48: tangents per corner
CLU_T1 = 43
CLU_T2 = 46
CLU_BS = 49   # 49-51: bitangent signs per corner
CLU_TRI_ROWS_TAN = 56
# canonical row -> clustered row (BW quads + attrs)
CLU_ROW_MAP = (
    (TR_N, CLU_N), (TR_N + 1, CLU_N + 1), (TR_N + 2, CLU_N + 2),
    (TR_D0, CLU_N + 3),
    (TR_R1, CLU_R1), (TR_R1 + 1, CLU_R1 + 1), (TR_R1 + 2, CLU_R1 + 2),
    (TR_R1 + 3, CLU_R1 + 3),
    (TR_R2, CLU_R2), (TR_R2 + 1, CLU_R2 + 1), (TR_R2 + 2, CLU_R2 + 2),
    (TR_R2 + 3, CLU_R2 + 3),
    (TR_GN, CLU_GN), (TR_GN + 1, CLU_GN + 1), (TR_GN + 2, CLU_GN + 2),
    (TR_MAT, CLU_MAT),
    (TR_N0, CLU_N0), (TR_N0 + 1, CLU_N0 + 1), (TR_N0 + 2, CLU_N0 + 2),
    (TR_DS, CLU_DS),
    (TR_N1, CLU_N1), (TR_N1 + 1, CLU_N1 + 1), (TR_N1 + 2, CLU_N1 + 2),
    (TR_N2, CLU_N2), (TR_N2 + 1, CLU_N2 + 1), (TR_N2 + 2, CLU_N2 + 2),
    (TR_UV, CLU_UV), (TR_UV + 1, CLU_UV + 1), (TR_UV + 2, CLU_UV + 2),
    (TR_UV + 3, CLU_UV + 3), (TR_UV + 4, CLU_UV + 4), (TR_UV + 5, CLU_UV + 5),
)
CLU_ROW_MAP_TAN = CLU_ROW_MAP + tuple(
    (TR_T0 + i, CLU_T0 + i) for i in range(12))


def tri_row_count(tangents: bool, cutout: bool = False) -> int:
    """Resident-table row count (TR_* layout). Cutout appends TWO
    pass-probability rows at tr_opac_row / tr_opac_sh_row: the camera
    walk's value (textured-opacity materials stay opaque there — the
    split-bounce re-trace resolves them exactly) and the SHADOW walk's
    value (textured materials carry their UV-mean opacity, the in-kernel
    occlusion approximation). SMEM tables have no DMA row alignment
    constraint."""
    base = TRI_ROWS_TAN if tangents else TRI_ROWS
    return base + (2 if cutout else 0)


def tr_opac_row(tangents: bool) -> int:
    return TRI_ROWS_TAN if tangents else TRI_ROWS


def tr_opac_sh_row(tangents: bool) -> int:
    return tr_opac_row(tangents) + 1


def clu_row_count(tangents: bool) -> int:
    """Clustered-table row count (CLU_* layout)."""
    return CLU_TRI_ROWS_TAN if tangents else CLU_TRI_ROWS

# VMEM group cache: every DMA costs ~13 us FIXED on v5e (measured,
# size-independent), so cluster groups are cached across the sequential
# grid programs of one bounce — Morton-sorted ray blocks visit
# overlapping group sets, and the whole group space is only n_l1 entries.
# Direct-mapped, prime slot count to avoid stride collisions.
CACHE_SLOTS = 23

# cluster tables at or below this size live wholly in VMEM (v5e has
# 128 MiB physical VMEM; leave room for state blocks + dot temporaries)
CLU_VMEM_MAX_BYTES = 56 * 1024 * 1024

# profiling switches (timing surgery only; wrong images when set)
import os as _os  # noqa: E402
_PROF_NODMA = _os.environ.get("GATLING_WALK_NODMA", "") == "1"
# fan-level cap tightening experiment (exact either way): update per-ray
# caps after every cluster visit instead of once per entry
_FAN_TIGHTEN = _os.environ.get("GATLING_FAN_TIGHTEN", "") == "1"
# per-object fan ordering (PERF.md interior lever): the plan appends a
# per-entry cluster order sorted by the conservative per-cluster entry
# bound, and the camera walk visits each entry's fan near-to-far behind an
# early-exit while with per-visit cap tightening (near clusters prune far
# ones). Exact either way — order never affects the argmin winner.
_FAN_SORT = _os.environ.get("GATLING_FAN_SORT", "") == "1"
# split-kernel pass-2 relocation: trace_step's kernel emits only the winner
# triangle id and the XLA stage fetches/transforms the attribute rows with
# dense per-ray gathers (the same gather family as the texture stage),
# replacing the kernel's serial candidate-list scan + one-hot matmuls.
# Measured motivation (tools/plan_prof.py NOP2): pass 2 is ~5 us/block at
# bounce 0 but 33-64 us/block (half to two-thirds of the real trace cost)
# on incoherent secondary blocks whose winners span many entries.
_XLA_P2 = _os.environ.get("GATLING_XLA_P2", "1") == "1"
# pair-visit experiment: intersect TWO clusters per MXU pass
# ([2048,24]x[24,768] instead of two x[24,384] dots) behind a pair-OR
# gate — halves dot-issue + fan-loop iterations at slightly coarser
# gating (a passing partner drags its pair in)
_FAN_PAIR = _os.environ.get("GATLING_FAN_PAIR", "") == "1"
_PROF_NOMXU = _os.environ.get("GATLING_WALK_NOMXU", "") == "1"
_PROF_NOP2 = _os.environ.get("GATLING_WALK_NOP2", "") == "1"

# light table columns ([L, LIGHT_COLS] SMEM; layout per type, see builder)
LIGHT_COLS = 20
LT_SPHERE, LT_DISTANT, LT_RECT, LT_DISK = 0, 1, 2, 3

# params vector (SMEM) indices
P_BG_R, P_BG_G, P_BG_B = 0, 1, 2
P_RR_INV_MIN = 3
P_RR_OFFSET = 4
P_BOUNCE = 5
P_EXP2_EXPOSURE = 6
P_TMIN = 7
P_LIGHT_MULT = 8
P_METERS = 9
P_MAX_WALK = 10  # maxVolumeWalkLength (scatter mode)
PARAMS_LEN = 10

SHADOW_TMIN = 0.01  # reference: rgen:397-438 shadow ray tMin

# split-bounce hit buffer rows ([16, R/128, 128], written by trace_step)
H_HIT, H_T, H_UVX, H_UVY, H_MAT = 0, 1, 2, 3, 4
H_GN, H_N, H_FRONT, H_DS, H_POS = 5, 8, 11, 12, 13
HIT_ROWS = 16
# tangent extension (static.tangents): orthonormalized shading tangent +
# interpolated bitangent sign, for the XLA normal-mapping stage
H_TAN, H_BS = 16, 19
HIT_ROWS_TAN = 24


def hit_row_count(tangents: bool) -> int:
    return HIT_ROWS_TAN if tangents else HIT_ROWS

# split-bounce per-ray material rows (written by the XLA texture stage).
# SLIM layout (round 3): only parameters that actually have textures in the
# scene get per-ray rows — everything else is resolved in-kernel from the
# SMEM material table by the same select loop the one-kernel bounce uses.
# Measured motivation (tools/tex_prof.py, v5e, 1.44M rays): building +
# writing the full 16-row parbuf cost ~2 ms/bounce on top of the ~4 ms
# gather floor of the texture taps themselves.
PR_WIDTHS = {"base_color": 3, "emissive": 3, "metallic": 1, "roughness": 1}
PARAM_ROWS = 16  # legacy full layout (kept for the row-width upper bound)


def slim_param_layout(textured_params: tuple[str, ...]) -> tuple[tuple[str, int], ...]:
    """Static (name, first_row) layout of the slim parbuf, in the fixed
    name order below. 'opacity' never reaches the fused path (gi gates
    textured-opacity cutout to the wavefront integrator)."""
    layout = []
    row = 0
    for name in ("base_color", "emissive", "metallic", "roughness"):
        if name in textured_params:
            layout.append((name, row))
            row += PR_WIDTHS[name]
    return tuple(layout)


def slim_param_rows(textured_params: tuple[str, ...]) -> int:
    """Row count of the slim parbuf, padded to a multiple of 8 (vreg
    sublane tile; also keeps DMA extents 8-aligned)."""
    used = sum(PR_WIDTHS[n] for n, _ in slim_param_layout(textured_params))
    return max(8, -(-used // 8) * 8)


class FusedScene(NamedTuple):
    """Device-resident scene tables for the bounce kernel (arrays only —
    static shape info lives in FusedStatic)."""

    tris: jnp.ndarray    # resident: [TRI_ROWS, T]; clustered: [C_pad, TRI_ROWS, 128]
    mats: jnp.ndarray    # [M, 24] packed material rows (MaterialTable.packed_f)
    lights: jnp.ndarray  # [max(L,1), LIGHT_COLS]
    l1_aabbs: jnp.ndarray  # [8, n_l1] (rows 0-5: min xyz / max xyz); dummy in resident
    l2_aabbs: jnp.ndarray  # [8, n_l1 * L1_FAN]
    # instanced mode (build_fused_scene_instanced; None elsewhere):
    inst_smem: jnp.ndarray | None = None  # [n_l1, 16] f32 SMEM: A3 9, a_t 3, pass_prob, fan
    inst_map: jnp.ndarray | None = None   # [n_l1 * L1_FAN] i32 -> unique cluster
    inst_attr: jnp.ndarray | None = None  # [lanes, 24] f32 VMEM pass-2 gather rows
    # per-entry world->local transform as a bf16 hi/lo-split [24, 8] right
    # operand ([M_hi; M_lo; M_hi] rows at entry*24): the walks transform the
    # block's hi/lo-split ray matrix into instance space with ONE MXU pass
    # (lhs24 @ m24 = hi@hi + hi@lo + lo@hi, ~2^-16 relative) instead of ~21
    # lane-skinny VPU madds per visited instance
    inst_m24: jnp.ndarray | None = None   # [n_l1 * 24, 8] bf16 VMEM
    # gather-friendly transpose of the cluster table ([C_pad, 128, TRI_ROWS]:
    # one ray's winner rows are CONTIGUOUS) for the XLA pass-2 relocation
    # (_finalize_hits); HBM-only — never bound into a kernel. None in
    # resident mode.
    tris_g: jnp.ndarray | None = None


@dataclasses.dataclass(frozen=True)
class FusedStatic:
    """Compile-time scene shape info (jit static argument)."""

    n_tris: int
    n_mats: int
    n_clusters: int  # 0 => resident (all tris in SMEM)
    n_l1: int
    light_types: tuple[int, ...]  # per-slot LT_* ids, type-major order
    # split-bounce textured mode: trace and shade run as separate kernels
    # with an XLA texture-sampling stage in between (render/fused.py)
    textured: bool = False
    # which uber-BSDF params have textures anywhere (prunes the XLA stage)
    textured_params: tuple[str, ...] = ()
    # absorption-only volumes (mediumStackSize == 0 semantics): the medium
    # flag rides the alive row (1 = outside, 2 = inside a medium)
    volumes: bool = False
    # scattering volumes (depth-1 medium stack): the alive row encodes
    # (2 + medium material id + 64 * walk count); each bounce distance-
    # samples free flight against sigma_t, caps the trace at t_sample,
    # and un-hit rays inside the medium take a Henyey-Greenstein walk
    # step instead of shading (rp_main.rgen:317-346 + miss stepVolume).
    # Requires volumes=True and n_mats <= 63 (id fits the encoding).
    scatter: bool = False
    # clustered mode with the WHOLE cluster table resident in VMEM (fits
    # under CLU_VMEM_MAX_BYTES): no per-group DMA/cache at all — Mosaic
    # fetches the unchanging input block once per pallas_call. Measured:
    # DMA was 61% of an unsorted secondary bounce (PERF.md attribution).
    clu_vmem: bool = False
    # per-corner tangent rows in the triangle tables + tangent/bitangent
    # hit-buffer rows, for normal mapping in the textured split-bounce
    # stage (set when any material binds a normal texture)
    tangents: bool = False
    # textured-opacity cutout: the split-bounce XLA stage re-traces
    # rejected hits (render/fused.py _textured_cutout_retrace); the walks
    # treat opacity-textured materials as opaque
    cutout_textured: bool = False
    # stochastic cutout transparency resolved INSIDE the walks: every
    # candidate intersection draws an independent hash-based Bernoulli
    # against the per-triangle pass probability (CLU_OPAC row / the mats
    # table on the resident path). P(any accepted) = 1 - prod(1 - o_i) —
    # identical to the reference's sequential ignoreIntersection draws
    # (rp_main.ahit:35-61) but with no re-trace loop and no bounce
    # consumption. Untextured opacity only (gi gates textured opacity to
    # the wavefront integrator).
    cutout: bool = False
    # rays-per-kernel-block / 128. Clustered mode is pinned to 8 (the
    # matrix walk + plan are shaped around 1024-ray blocks); the resident
    # path uses 16 — see the RAY_BLOCK comment for the measurement.
    block_rows: int = BLOCK_ROWS
    # two-level instanced mode (build_fused_scene_instanced): L1 entries
    # are instance placements whose transforms live in the inst tables;
    # n_clusters counts UNIQUE local clusters (always clu_vmem)
    n_instances: int = 0
    # full uber-BSDF lobe set in the fused shade: clearcoat + anisotropic
    # GGX + thick refractive microfacet transmission (exact dielectric
    # Fresnel / TIR, Beer-Lambert via the volumes medium flag) — the
    # render/bsdf.py semantics inside the kernel (reference shades all of
    # this in one dispatch, rp_main.chit:360-389,446-480). Set when any
    # scene material carries those params; plain scenes keep the cheaper
    # 3-lobe codegen.
    advanced: bool = False

    @property
    def clustered(self) -> bool:
        return self.n_clusters > 0

    @property
    def instanced(self) -> bool:
        return self.n_instances > 0


# ---------------------------------------------------------------------------
# host-side builders
# ---------------------------------------------------------------------------

def _duff_onb_np(n: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Duff et al. ONB, numpy mirror of ops.sampling.orthonormal_basis."""
    x, y, z = float(n[0]), float(n[1]), float(n[2])
    s = 1.0 if z >= 0.0 else -1.0
    a = -1.0 / (s + z)
    b = x * y * a
    b1 = np.array([1.0 + s * x * x * a, s * b, -s * x], np.float32)
    b2 = np.array([b, s + y * y * a, -y], np.float32)
    return b1, b2


def build_fused_lights(arrays: LightArrays) -> tuple[np.ndarray, tuple[int, ...]]:
    """Pack LightArrays into the kernel light table + static type list.

    Slot order is type-major (spheres, distants, rects, disks) to match the
    pick arithmetic of render/lights.py sample_light — the fused NEE must
    consume the SAME rng mapping as the general integrator.

    Unified columns: emission 14-16, diffuse/specular 17-18. Per type:
    sphere: pos 0-2, radii 3-5, area 9. distant: -dir 0-2, onb_t1 3-5,
    onb_t2 6-8, angle 9, inv_pdf 10. rect: origin 0-2, t0 3-5, t1 6-8,
    size 9-10, normal 11-13. disk: origin 0-2, t0 3-5, t1 6-8,
    radii 9-10, normal 11-13.
    """
    rows: list[np.ndarray] = []
    types: list[int] = []

    def emit(t: int) -> np.ndarray:
        row = np.zeros(LIGHT_COLS, np.float32)
        rows.append(row)
        types.append(t)
        return row

    for i in range(int(arrays.sphere_count)):
        r = emit(LT_SPHERE)
        r[0:3] = np.asarray(arrays.sphere_pos[i])
        r[3:6] = np.asarray(arrays.sphere_radius[i])
        r[9] = float(arrays.sphere_area[i])
        r[14:17] = np.asarray(arrays.sphere_emission[i])
        r[17:19] = np.asarray(arrays.sphere_diff_spec[i])
    for i in range(int(arrays.distant_count)):
        r = emit(LT_DISTANT)
        dir0 = -np.asarray(arrays.distant_dir[i], np.float32)
        t1b, t2b = _duff_onb_np(dir0)
        r[0:3] = dir0
        r[3:6] = t1b
        r[6:9] = t2b
        r[9] = float(arrays.distant_angle[i])
        r[10] = float(arrays.distant_inv_pdf[i])
        r[14:17] = np.asarray(arrays.distant_emission[i])
        r[17:19] = np.asarray(arrays.distant_diff_spec[i])
    for i in range(int(arrays.rect_count)):
        r = emit(LT_RECT)
        t0 = np.asarray(arrays.rect_t0[i], np.float32)
        t1 = np.asarray(arrays.rect_t1[i], np.float32)
        r[0:3] = np.asarray(arrays.rect_origin[i])
        r[3:6] = t0
        r[6:9] = t1
        r[9:11] = np.asarray(arrays.rect_size[i])
        r[11:14] = np.cross(t1, t0)  # UsdLux forward is -Z (lights.py:239)
        r[14:17] = np.asarray(arrays.rect_emission[i])
        r[17:19] = np.asarray(arrays.rect_diff_spec[i])
    for i in range(int(arrays.disk_count)):
        r = emit(LT_DISK)
        t0 = np.asarray(arrays.disk_t0[i], np.float32)
        t1 = np.asarray(arrays.disk_t1[i], np.float32)
        r[0:3] = np.asarray(arrays.disk_origin[i])
        r[3:6] = t0
        r[6:9] = t1
        r[9:11] = np.asarray(arrays.disk_radius[i])
        r[11:14] = np.cross(t1, t0)
        r[14:17] = np.asarray(arrays.disk_emission[i])
        r[17:19] = np.asarray(arrays.disk_diff_spec[i])

    table = np.stack(rows) if rows else np.zeros((1, LIGHT_COLS), np.float32)
    return table.astype(np.float32), tuple(types)


def _advanced_from_table(table: MaterialTable) -> bool:
    """True when any material needs the full lobe set (thick refractive
    transmission, clearcoat, anisotropy) — selects the advanced shade
    codegen (packed_f cols per render/material.py MF_*)."""
    pf = np.asarray(table.packed_f)
    thick = (pf[:, 14] > 0.0) & (pf[:, 15] < 0.5)
    return bool(thick.any() or (pf[:, 26] > 0.0).any()
                or (pf[:, 28] != 0.0).any())


def _aniso_from_table(table: MaterialTable) -> bool:
    return bool((np.asarray(table.packed_f)[:, 28] != 0.0).any())


def _cutout_pass_prob(geom: SceneGeometry, table: MaterialTable) -> np.ndarray:
    """[T] per-triangle stochastic-cutout PASS probability from the
    (untextured) material opacity — binary when opacityThreshold > 0
    (render/bsdf.py cutout_opacity; rp_main.ahit:35-61). 1.0 = opaque."""
    from gatling_tpu.render.material import MF_OPACITY, MF_OPACITY_THRESH

    pf = np.asarray(table.packed_f)
    op = pf[:, MF_OPACITY]
    th = pf[:, MF_OPACITY_THRESH]
    per_mat = np.where(th > 0.0, (op >= th).astype(np.float32), op)
    # opacity-TEXTURED materials resolve in the split-bounce re-trace stage
    # (fused.py _textured_cutout_retrace): the walk must treat them opaque
    per_mat = np.where(np.asarray(table.opacity_tex) >= 0, 1.0, per_mat)
    mid = np.clip(np.asarray(geom.material_id), 0, pf.shape[0] - 1)
    return per_mat[mid].astype(np.float32)


def _tri_rows(geom: SceneGeometry, tangents: bool = False,
              cutout_prob: "np.ndarray | None" = None,
              shadow_prob: "np.ndarray | None" = None) -> np.ndarray:
    """Per-triangle kernel rows [T, tri_row_count(...)] (Baldwin-Weber
    precompute; per-corner tangents appended for normal-mapped scenes;
    camera + shadow cutout pass-probability rows appended for cutout
    scenes — shadow defaults to the camera value)."""
    v0 = np.asarray(geom.v0, np.float64)
    e1 = np.asarray(geom.e1, np.float64)
    e2 = np.asarray(geom.e2, np.float64)
    n = np.cross(e1, e2)
    nn = np.maximum((n * n).sum(axis=1, keepdims=True), 1e-30)
    d0 = -(n * v0).sum(axis=1)
    r1 = np.cross(e2, n) / nn
    c1 = -(r1 * v0).sum(axis=1)
    r2 = np.cross(n, e1) / nn
    c2 = -(r2 * v0).sum(axis=1)

    gn = n / np.sqrt(nn)
    flags = np.asarray(geom.flags)
    flip = (flags & MESH_FLAG_FLIP_FACING) != 0
    gn = np.where(flip[:, None], -gn, gn)

    # fully degenerate (padding) triangles must never hit: n == 0 => ndotd == 0
    degen = (np.abs(n).sum(axis=1) == 0.0)
    n = np.where(degen[:, None], 0.0, n)

    t = v0.shape[0]
    rows = np.zeros((t, tri_row_count(tangents, cutout_prob is not None)),
                    np.float32)
    rows[:, TR_N:TR_N + 3] = n
    rows[:, TR_D0] = d0
    rows[:, TR_R1:TR_R1 + 3] = r1
    rows[:, TR_R1 + 3] = c1
    rows[:, TR_R2:TR_R2 + 3] = r2
    rows[:, TR_R2 + 3] = c2
    rows[:, TR_GN:TR_GN + 3] = gn
    rows[:, TR_N0:TR_N0 + 3] = np.asarray(geom.n0)
    rows[:, TR_N1:TR_N1 + 3] = np.asarray(geom.n1)
    rows[:, TR_N2:TR_N2 + 3] = np.asarray(geom.n2)
    rows[:, TR_MAT] = np.asarray(geom.material_id).astype(np.float32)
    rows[:, TR_DS] = ((flags & MESH_FLAG_DOUBLE_SIDED) != 0).astype(np.float32)
    rows[:, TR_UV:TR_UV + 2] = np.asarray(geom.uv0)
    rows[:, TR_UV + 2:TR_UV + 4] = np.asarray(geom.uv1)
    rows[:, TR_UV + 4:TR_UV + 6] = np.asarray(geom.uv2)
    if tangents:
        rows[:, TR_T0:TR_T0 + 3] = np.asarray(geom.t0)
        rows[:, TR_T1:TR_T1 + 3] = np.asarray(geom.t1)
        rows[:, TR_T2:TR_T2 + 3] = np.asarray(geom.t2)
        rows[:, TR_BS:TR_BS + 3] = np.asarray(geom.bsign)
    if cutout_prob is not None:
        rows[:, tr_opac_row(tangents)] = cutout_prob
        rows[:, tr_opac_sh_row(tangents)] = (
            cutout_prob if shadow_prob is None else shadow_prob)
    return rows


def _median_split_order(geom, n_real: int,
                        leaf: int = CLUSTER_SIZE) -> np.ndarray:
    """Recursive longest-axis median split to `leaf`-sized runs — the
    SAH-lite alternative to raw Morton slicing (VERDICT r3 item 1): every
    CLUSTER_SIZE-aligned run of the returned order is a spatially COMPACT
    leaf (each split halves the longest extent), where Morton slices can
    straddle curve discontinuities and produce elongated cluster AABBs.
    Groups of L1_FAN consecutive leaves inherit the same compactness one
    level up. Runs are sized to multiples of `leaf` so the kernel's
    128-tri cluster blocks map 1:1 onto leaves (no padding waste)."""
    v0 = np.asarray(geom.v0[:n_real], np.float64)
    e1 = np.asarray(geom.e1[:n_real], np.float64)
    e2 = np.asarray(geom.e2[:n_real], np.float64)
    cent = v0 + (e1 + e2) / 3.0
    order = np.empty(n_real, np.int64)
    pos = 0
    stack = [np.arange(n_real)]
    while stack:
        idx = stack.pop()
        if len(idx) <= leaf:
            order[pos:pos + len(idx)] = idx
            pos += len(idx)
            continue
        c = cent[idx]
        ext = c.max(axis=0) - c.min(axis=0)
        ax = int(np.argmax(ext))
        # split at a multiple of `leaf` nearest the median so every leaf
        # except the global tail stays exactly leaf-aligned
        half = ((len(idx) // 2 + leaf - 1) // leaf) * leaf
        half = min(max(half, leaf), len(idx) - 1)
        part = np.argpartition(c[:, ax], half)
        stack.append(idx[part[half:]])   # right emitted after left (LIFO)
        stack.append(idx[part[:half]])
    return order


def _morton_order(geom: SceneGeometry, n_real: int) -> np.ndarray:
    """Spatial (Morton) triangle order over centroids."""
    v0 = np.asarray(geom.v0[:n_real], np.float64)
    e1 = np.asarray(geom.e1[:n_real], np.float64)
    e2 = np.asarray(geom.e2[:n_real], np.float64)
    c = v0 + (e1 + e2) / 3.0
    lo = c.min(axis=0)
    span = np.maximum(c.max(axis=0) - lo, 1e-12)
    q = np.clip(((c - lo) / span * 1023.0), 0, 1023).astype(np.uint64)

    def spread(x):
        x = (x | (x << 16)) & np.uint64(0x030000FF)
        x = (x | (x << 8)) & np.uint64(0x0300F00F)
        x = (x | (x << 4)) & np.uint64(0x030C30C3)
        x = (x | (x << 2)) & np.uint64(0x09249249)
        return x

    code = spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1)) | (spread(q[:, 2]) << np.uint64(2))
    return np.argsort(code, kind="stable")


def build_fused_scene(
    geom: SceneGeometry,
    table: MaterialTable,
    light_arrays: LightArrays | None = None,
    resident_max: int = 4096,
    shadow_pass: "np.ndarray | None" = None,
) -> tuple[FusedScene, FusedStatic]:
    """Build kernel scene tables. Scenes up to resident_max real triangles
    keep the whole table in SMEM; larger scenes get Morton-ordered 128-tri
    clusters in HBM with two-level SMEM AABBs."""
    scene, static, _order = build_fused_scene_with_order(
        geom, table, light_arrays, resident_max, shadow_pass=shadow_pass)
    return scene, static


def build_fused_scene_with_order(
    geom: SceneGeometry,
    table: MaterialTable,
    light_arrays: LightArrays | None = None,
    resident_max: int = 4096,
    reuse_order: "np.ndarray | None" = None,
    shadow_pass: "np.ndarray | None" = None,
) -> tuple[FusedScene, FusedStatic, "np.ndarray | None"]:
    """build_fused_scene variant exposing the Morton triangle order so
    transform edits can REFIT (recompute rows + cluster AABBs under the
    same order — stable static shapes, no kernel recompile, the TLAS-refit
    quality/speed tradeoff of Gi.cpp:1188-1202) instead of rebuilding."""
    # drop lane-padding triangles: the serial loop needs no 128-alignment
    e1_all = np.asarray(geom.e1)
    e2_all = np.asarray(geom.e2)
    real = (np.abs(e1_all).sum(axis=1) > 0) | (np.abs(e2_all).sum(axis=1) > 0)
    n_real = int(np.max(np.nonzero(real)[0])) + 1 if real.any() else 0
    geom = SceneGeometry(*[arr[:n_real] for arr in geom])
    # resident/clustered crossover: the resident path walks triangles in a
    # SERIAL ~110-cycle/tri SMEM loop, the clustered path intersects 128 at
    # a time on the MXU — the crossover sits far below 4096
    # (GATLING_RESIDENT_MAX to measure/override)
    resident_max = int(_os.environ.get("GATLING_RESIDENT_MAX",
                                       str(resident_max)))

    if light_arrays is not None:
        light_table, light_types = build_fused_lights(light_arrays)
    else:
        light_table = np.zeros((1, LIGHT_COLS), np.float32)
        light_types = ()

    advanced = _advanced_from_table(table)
    # anisotropy is mesh-tangent anchored: carry tangent rows so the shade
    # frame matches the wavefront integrator's shading state
    tangents = bool((np.asarray(table.normal_tex) >= 0).any()
                    or _aniso_from_table(table))
    pass_prob = _cutout_pass_prob(geom, table)
    if shadow_pass is not None:
        mid = np.clip(np.asarray(geom.material_id), 0,
                      len(shadow_pass) - 1)
        shadow_prob = np.asarray(shadow_pass, np.float32)[mid]
    else:
        shadow_prob = pass_prob
    cutout = bool((pass_prob < 1.0).any() or (shadow_prob < 1.0).any())
    if n_real <= resident_max:
        rows = _tri_rows(geom, tangents,
                         pass_prob if cutout else None,
                         shadow_prob if cutout else None)
        static = FusedStatic(n_tris=n_real, n_mats=int(table.packed_f.shape[0]),
                             n_clusters=0, n_l1=1, light_types=light_types,
                             tangents=tangents, cutout=cutout,
                             advanced=advanced,
                             block_rows=int(_os.environ.get(
                                 "GATLING_BLOCK_ROWS", "16")))
        scene = FusedScene(
            tris=jnp.asarray(rows.T.copy()),  # [TRI_ROWS, T]
            mats=jnp.asarray(table.packed_f),
            lights=jnp.asarray(light_table),
            l1_aabbs=jnp.zeros((8, 1), jnp.float32),
            l2_aabbs=jnp.zeros((8, 1), jnp.float32),
        )
        return scene, static, None

    # ---- clustered mode ----
    if reuse_order is not None:
        order = reuse_order
    elif _os.environ.get("GATLING_CLUSTER_ORDER", "median") == "median":
        order = _median_split_order(geom, n_real)
    else:
        order = _morton_order(geom, n_real)
    geom = SceneGeometry(*[np.asarray(arr)[order] for arr in geom])
    rows = _tri_rows(geom, tangents)  # [T, TRI_ROWS[_TAN]]

    n_clusters = -(-n_real // CLUSTER_SIZE)
    n_l1 = -(-n_clusters // L1_FAN)
    c_pad = n_l1 * L1_FAN
    t_pad = c_pad * CLUSTER_SIZE
    # remap canonical rows into the quad-aligned clustered layout (CLU_*)
    n_rows = clu_row_count(tangents)
    row_map = CLU_ROW_MAP_TAN if tangents else CLU_ROW_MAP
    rows_p = np.zeros((t_pad, n_rows), np.float32)
    src_rows = [src for src, _ in row_map]
    dst_rows = [dst for _, dst in row_map]
    rows_p[:n_real, dst_rows] = rows[:, src_rows]
    rows_p[:n_real, CLU_OPAC] = pass_prob[order]  # Morton-reordered
    rows_p[:n_real, CLU_OPAC_SH] = shadow_prob[order]
    tris = rows_p.reshape(c_pad, CLUSTER_SIZE, n_rows).transpose(0, 2, 1).copy()

    # cluster AABBs (vectorized; padding triangles carry empty boxes)
    v0 = np.asarray(geom.v0, np.float64)
    v1 = v0 + np.asarray(geom.e1, np.float64)
    v2 = v0 + np.asarray(geom.e2, np.float64)
    tmin_p = np.full((t_pad, 3), FLOAT_MAX, np.float64)
    tmax_p = np.full((t_pad, 3), -FLOAT_MAX, np.float64)
    tmin_p[:n_real] = np.minimum(np.minimum(v0, v1), v2)
    tmax_p[:n_real] = np.maximum(np.maximum(v0, v1), v2)

    l2min = tmin_p.reshape(c_pad, CLUSTER_SIZE, 3).min(axis=1)  # [c_pad, 3]
    l2max = tmax_p.reshape(c_pad, CLUSTER_SIZE, 3).max(axis=1)
    l2 = np.zeros((8, c_pad), np.float32)
    l2[0:3] = l2min.T
    l2[3:6] = l2max.T
    l1 = np.zeros((8, n_l1), np.float32)
    l1[0:3] = l2min.reshape(n_l1, L1_FAN, 3).min(axis=1).T
    l1[3:6] = l2max.reshape(n_l1, L1_FAN, 3).max(axis=1).T

    clu_vmem = tris.nbytes <= CLU_VMEM_MAX_BYTES
    if _os.environ.get("GATLING_CLU_VMEM", "") in ("0", "1"):
        clu_vmem = _os.environ["GATLING_CLU_VMEM"] == "1"
    static = FusedStatic(n_tris=n_real, n_mats=int(table.packed_f.shape[0]),
                         n_clusters=n_clusters, n_l1=n_l1,
                         light_types=light_types, clu_vmem=clu_vmem,
                         tangents=tangents, cutout=cutout,
                         advanced=advanced)
    scene = FusedScene(
        tris=jnp.asarray(tris),
        mats=jnp.asarray(table.packed_f),
        lights=jnp.asarray(light_table),
        l1_aabbs=jnp.asarray(l1),
        l2_aabbs=jnp.asarray(l2),
        tris_g=jnp.asarray(tris.transpose(0, 2, 1).copy()),
    )
    return scene, static, order


def build_fused_scene_instanced(
    mesh_descs,
    material_index: dict,
    table: MaterialTable,
    light_arrays: LightArrays | None = None,
    min_gain: float = 4.0,
    min_flat: int = 4096,
    shadow_pass: "np.ndarray | None" = None,
) -> "tuple[FusedScene, FusedStatic] | None":
    """Two-level INSTANCED fused scene — the BLAS-sharing analog of the
    reference's TLAS (one BLAS per unique mesh, one TLAS instance per
    placement, CgpuVk.cpp:2764-2854 / Gi.cpp:1188-1202).

    Unique meshes keep their triangles in LOCAL space as VMEM-resident
    128-tri clusters; each instance contributes an L1 walk entry carrying
    its world AABB + world->local transform, with its mesh's local
    clusters (world-boxed per instance) as the L2 fan. The kernel
    transforms the ray block into instance space per visit and intersects
    the SHARED local rows — a 290k-triangle field of 256 instanced
    spheres walks ~1.1k unique resident triangles instead of a 2.3k-
    cluster HBM table.

    Returns None when the scene does not profit (low instancing gain,
    unique set too large, non-invertible transforms) — callers fall back
    to the flattened builder. Per-instance material/object ids ride the
    instance table (the hitGroupIndex analog, Gi.cpp:1195), so instances
    of one mesh may bind different materials; per-face (GeomSubset)
    materials within one instanced mesh are not supported here (the
    flattened path handles those scenes).
    """
    from types import SimpleNamespace

    from gatling_tpu.scene.meshproc import materialize_mesh

    if _os.environ.get("GATLING_INSTANCED", "1") == "0":
        return None

    if light_arrays is not None:
        light_table, light_types = build_fused_lights(light_arrays)
    else:
        light_table = np.zeros((1, LIGHT_COLS), np.float32)
        light_types = ()

    pf = np.asarray(table.packed_f)
    from gatling_tpu.render.material import MF_OPACITY, MF_OPACITY_THRESH

    op = pf[:, MF_OPACITY]
    th = pf[:, MF_OPACITY_THRESH]
    mat_pass = np.where(th > 0.0, (op >= th).astype(np.float32), op)
    # camera walks treat opacity-TEXTURED materials as opaque — the
    # split-bounce re-trace stage resolves them exactly (same override as
    # _cutout_pass_prob); the SHADOW walk uses their UV-mean opacity
    mat_pass = np.where(np.asarray(table.opacity_tex) >= 0, 1.0, mat_pass)
    mat_pass_sh = (np.asarray(shadow_pass, np.float32)
                   if shadow_pass is not None else mat_pass)

    # NORMAL-MAPPED instanced scenes carry tangent rows on the shared
    # local clusters; the XLA pass-2 finalize transforms them to world
    # per instance (the in-kernel pass 2 has no instanced tangent path,
    # so these scenes require GATLING_XLA_P2 — on by default). Anisotropy
    # stays on the flattened tables (gi routing): its shade-side frames
    # come from the same rows but were only validated flat.
    tangents = bool((np.asarray(table.normal_tex) >= 0).any()
                    or _aniso_from_table(table))
    if tangents and not _XLA_P2:
        return None

    # ---- unique meshes -> local clustered rows ----
    uniq: dict[int, dict] = {}  # id(mesh) -> info
    flat_tris = 0
    insts: list[dict] = []
    for md in mesh_descs:
        tm = materialize_mesh(md.mesh)
        key = id(md.mesh)
        if key not in uniq:
            nt = tm.num_triangles
            p = tm.positions.reshape(-1, 3, 3)
            g = SimpleNamespace(
                v0=p[:, 0], e1=p[:, 1] - p[:, 0], e2=p[:, 2] - p[:, 0],
                n0=tm.normals.reshape(-1, 3, 3)[:, 0],
                n1=tm.normals.reshape(-1, 3, 3)[:, 1],
                n2=tm.normals.reshape(-1, 3, 3)[:, 2],
                uv0=tm.uvs.reshape(-1, 3, 2)[:, 0],
                uv1=tm.uvs.reshape(-1, 3, 2)[:, 1],
                uv2=tm.uvs.reshape(-1, 3, 2)[:, 2],
                t0=tm.tangents.reshape(-1, 3, 3)[:, 0],
                t1=tm.tangents.reshape(-1, 3, 3)[:, 1],
                t2=tm.tangents.reshape(-1, 3, 3)[:, 2],
                bsign=tm.bitangent_signs.reshape(-1, 3),
                material_id=np.zeros(nt, np.int32),
                flags=np.zeros(nt, np.int32),
            )
            # median-split local leaves: compact cluster AABBs measured
            # +12-13% over raw Morton slicing on the flat path (PERF.md);
            # the same leaf former now shapes the shared local clusters
            order = (_median_split_order(g, nt) if nt > CLUSTER_SIZE
                     else np.arange(nt))
            uniq[key] = {"geom": g, "order": order, "n": nt,
                         "n_clusters": -(-nt // CLUSTER_SIZE)}
        info = uniq[key]
        transforms = md.instance_transforms
        if transforms is None:
            transforms = np.asarray(md.transform)[None]
        mat_row = material_index.get(md.material, 0)
        for xf in np.asarray(transforms, np.float64):
            m3 = xf[:3, :3]
            det = np.linalg.det(m3)
            if abs(det) < 1e-30:
                return None  # non-invertible placement
            a3 = np.linalg.inv(m3)
            a_t = -xf[3, :3] @ a3
            insts.append({"key": key, "m3": m3, "m_t": xf[3, :3],
                          "a3": a3, "a_t": a_t,
                          "mat": mat_row, "obj": md.object_id,
                          "ds": 1.0 if md.double_sided else 0.0,
                          "pass": float(mat_pass[min(mat_row,
                                                     len(mat_pass) - 1)]),
                          "pass_sh": float(mat_pass_sh[min(
                              mat_row, len(mat_pass_sh) - 1)])})
        flat_tris += tm.num_triangles * len(transforms)

    unique_tris = sum(i["n"] for i in uniq.values())
    if flat_tris <= min_flat or unique_tris == 0:
        return None
    gain = flat_tris / max(unique_tris, 1)
    # round-5 OBJECT-WALK extension: the two-level walk engages not only
    # for BLAS-sharing gain, but for ANY multi-object clustered scene
    # whose unique tables stay VMEM-resident — measured motivation
    # (tools/perray_sim.py, Evermotion-class interior): flat-cluster
    # block-1024 unions are 26.9 (primaries) while OBJECT-level unions
    # are 1.7, so walking per-object local clusters behind object-entry
    # culling visits a fraction of the flat walk's clusters. A
    # single-object scene gains nothing (the L1 level degenerates) and
    # stays flat.
    uniq_rows = clu_row_count(tangents)
    uniq_bytes = sum(-(-i["n"] // CLUSTER_SIZE) for i in uniq.values()) \
        * CLUSTER_SIZE * uniq_rows * 4
    object_walk = (len(insts) >= 2
                   and uniq_bytes <= CLU_VMEM_MAX_BYTES)
    if gain < min_gain and not object_walk:
        return None
    if uniq_bytes > CLU_VMEM_MAX_BYTES:
        return None  # instanced mode requires VMEM-resident local tables
    # round-4 rework (exact per-ray-union plan + candidate-list pass 2 +
    # MXU instance transforms + real fan bounds) brought the instanced
    # walk to parity with the flattened clu_vmem walk on sphere_field
    # (94/176 vs 97/182 us/block, tools/walk_prof.py GATLING_PROF_INST=1
    # protocol), so instancing engages whenever the BLAS-sharing gain
    # exists — it wins the memory axis outright (0.25 MB resident vs a
    # 47 MB flattened table) and keeps transform edits table-only refits.

    # local cluster tables (CLU layout, shared across instances)
    n_rows = clu_row_count(tangents)
    blocks: list[np.ndarray] = []
    c2min: list[np.ndarray] = []
    c2max: list[np.ndarray] = []
    for info in uniq.values():
        g, order, nt = info["geom"], info["order"], info["n"]
        go = SimpleNamespace(**{k: np.asarray(v)[order] if hasattr(
            v, "__len__") and len(v) == nt else v
            for k, v in vars(g).items()})
        rows = _tri_rows(go, tangents=tangents)
        c_pad = info["n_clusters"]
        t_pad = c_pad * CLUSTER_SIZE
        rows_p = np.zeros((t_pad, n_rows), np.float32)
        row_map = CLU_ROW_MAP_TAN if tangents else CLU_ROW_MAP
        src_rows = [src for src, _ in row_map]
        dst_rows = [dst for _, dst in row_map]
        rows_p[:nt, dst_rows] = rows[:, src_rows]
        rows_p[:nt, CLU_OPAC] = 1.0
        info["cluster_base"] = len(blocks)
        blocks.extend(rows_p.reshape(c_pad, CLUSTER_SIZE, n_rows)
                      .transpose(0, 2, 1))
        v0 = np.asarray(go.v0, np.float64)
        v1 = v0 + np.asarray(go.e1, np.float64)
        v2 = v0 + np.asarray(go.e2, np.float64)
        tmin_p = np.full((t_pad, 3), FLOAT_MAX, np.float64)
        tmax_p = np.full((t_pad, 3), -FLOAT_MAX, np.float64)
        tmin_p[:nt] = np.minimum(np.minimum(v0, v1), v2)
        tmax_p[:nt] = np.maximum(np.maximum(v0, v1), v2)
        lmin = tmin_p.reshape(c_pad, CLUSTER_SIZE, 3).min(axis=1)
        lmax = tmax_p.reshape(c_pad, CLUSTER_SIZE, 3).max(axis=1)
        info["c_lo"], info["c_hi"] = lmin, lmax
        c2min.append(lmin)
        c2max.append(lmax)

    # dedicated all-degenerate cluster for pad fan slots: the occlusion
    # walk has no ten2 pre-gate, so pads must intersect NOTHING (zero
    # plane normals never pass the |n.d| test)
    uc = len(blocks)
    blocks.append(np.zeros((n_rows, CLUSTER_SIZE), np.float32))
    tris = np.stack(blocks)  # [UC + 1, n_rows, 128]
    if tris.nbytes > CLU_VMEM_MAX_BYTES:
        return None

    # ---- instance (sub-)entries: each covers <= L1_FAN local clusters ----
    entries: list[tuple[dict, int, int]] = []  # (inst, c0, nc)
    for inst in insts:
        info = uniq[inst["key"]]
        nc = info["n_clusters"]
        for c0 in range(0, nc, L1_FAN):
            entries.append((inst, c0, min(L1_FAN, nc - c0)))
    # spatial (Morton) entry order: pass 2's winner-attribute loop scans
    # the [min, max] range of winning entry ids per ray block — build-order
    # ids scatter winners across the whole range (measured 5x the walk
    # cost on sphere_field); Morton-ordered entries keep a block's winners
    # id-local the same way the flat path's cluster order does
    centers = np.array([(e[0]["m_t"]) for e in entries], np.float64)
    lo_c = centers.min(axis=0)
    span_c = np.maximum(centers.max(axis=0) - lo_c, 1e-12)
    q = np.clip(((centers - lo_c) / span_c) * 1023.0, 0, 1023).astype(np.uint64)

    def _expand10(v: np.ndarray) -> np.ndarray:
        v = (v | (v << 16)) & np.uint64(0x030000FF)
        v = (v | (v << 8)) & np.uint64(0x0300F00F)
        v = (v | (v << 4)) & np.uint64(0x030C30C3)
        v = (v | (v << 2)) & np.uint64(0x09249249)
        return v

    code = (_expand10(q[:, 0]) | (_expand10(q[:, 1]) << np.uint64(1))
            | (_expand10(q[:, 2]) << np.uint64(2)))
    entries = [entries[i] for i in np.argsort(code, kind="stable")]
    n_l1 = len(entries)
    i_pad = n_l1  # L1 count needs no padding (plan/specs take it as-is)
    c_pad = n_l1 * L1_FAN
    i_lanes = max(128, -(-n_l1 // 128) * 128)

    l1 = np.zeros((8, n_l1), np.float32)
    l2 = np.zeros((8, c_pad), np.float32)
    l2[0:3] = FLOAT_MAX
    l2[3:6] = -FLOAT_MAX
    inst_map = np.full((c_pad,), uc, np.int32)  # pads -> degenerate cluster
    inst_smem = np.zeros((n_l1, 16), np.float32)
    inst_attr = np.zeros((i_lanes, 24), np.float32)

    for e, (inst, c0, nc) in enumerate(entries):
        info = uniq[inst["key"]]
        base = info["cluster_base"]
        lo = info["c_lo"][c0:c0 + nc]
        hi = info["c_hi"][c0:c0 + nc]
        # world cluster boxes: transform the 8 local corners
        bits = np.array([[(b >> k) & 1 for k in range(3)]
                         for b in range(8)], bool)  # [8, 3]
        corners = np.where(bits[None], hi[:, None, :],
                           lo[:, None, :])  # [nc, 8, 3]
        wc = corners @ inst["m3"] + inst["m_t"]
        wlo = wc.min(axis=1)
        whi = wc.max(axis=1)
        # degenerate (all-padding) local clusters keep empty world boxes
        empty = lo[:, 0] > hi[:, 0]
        wlo = np.where(empty[:, None], FLOAT_MAX, wlo)
        whi = np.where(empty[:, None], -FLOAT_MAX, whi)
        l2[0:3, e * L1_FAN:e * L1_FAN + nc] = wlo.T
        l2[3:6, e * L1_FAN:e * L1_FAN + nc] = whi.T
        l1[0:3, e] = wlo.min(axis=0)
        l1[3:6, e] = whi.max(axis=0)
        inst_map[e * L1_FAN:e * L1_FAN + nc] = base + c0 + np.arange(nc)
        a3 = inst["a3"].astype(np.float32)
        inst_smem[e, 0:9] = a3.reshape(-1)   # A3[j, i] at 3j+i
        inst_smem[e, 9:12] = inst["a_t"]
        inst_smem[e, 12] = inst["pass"]
        inst_smem[e, 13] = float(nc)  # real fan count (walk loop bound)
        inst_smem[e, 14] = inst["pass_sh"]  # shadow-walk pass prob
        inst_attr[e, 0:9] = a3.reshape(-1)
        inst_attr[e, 9:12] = inst["a_t"]
        inst_attr[e, 12] = float(inst["mat"])
        inst_attr[e, 13] = float(inst["obj"])
        inst_attr[e, 14] = float(e)
        inst_attr[e, 15] = inst["ds"]

    cutout = bool((inst_smem[:, 12] < 1.0).any()
                  or (inst_smem[:, 14] < 1.0).any())

    # per-entry world->local [8, 8] right operand M (row vector v @ M):
    # M[0:3, 0:3] = A3, M[3, 0:3] = a_t (origins carry w=1, directions
    # w=0, so the translation lands only on origins), M[3, 3] = 1 keeps w.
    # Stored pre-split as the bf16 [M_hi; M_lo; M_hi] stack the kernels'
    # hi/lo lhs expects (see FusedScene.inst_m24).
    m8 = np.zeros((n_l1, 8, 8), np.float32)
    for e, (inst, c0, nc) in enumerate(entries):
        m8[e, 0:3, 0:3] = inst["a3"]
        m8[e, 3, 0:3] = inst["a_t"]
        m8[e, 3, 3] = 1.0
    import ml_dtypes
    m8_hi = m8.astype(ml_dtypes.bfloat16)
    m8_lo = (m8 - m8_hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    m24 = np.concatenate([m8_hi, m8_lo, m8_hi], axis=1).reshape(-1, 8)

    static = FusedStatic(
        n_tris=flat_tris, n_mats=int(pf.shape[0]), n_clusters=uc,
        n_l1=n_l1, light_types=light_types, clu_vmem=True,
        cutout=cutout, n_instances=len(insts), tangents=tangents,
        advanced=_advanced_from_table(table))
    scene = FusedScene(
        tris=jnp.asarray(tris),
        mats=jnp.asarray(pf),
        lights=jnp.asarray(light_table),
        l1_aabbs=jnp.asarray(l1),
        l2_aabbs=jnp.asarray(l2),
        inst_smem=jnp.asarray(inst_smem),
        inst_map=jnp.asarray(inst_map),
        inst_attr=jnp.asarray(inst_attr),
        inst_m24=jnp.asarray(m24, dtype=jnp.bfloat16),
        tris_g=jnp.asarray(tris.transpose(0, 2, 1).copy()),
    )
    return scene, static


# ---------------------------------------------------------------------------
# kernel helpers
# ---------------------------------------------------------------------------

def _pcg_next(state_u32):
    """[8,128] pcg32 step -> (new_state, float in [0,1))."""
    ns = state_u32 * jnp.uint32(747796405) + jnp.uint32(2891336453)
    shift = jnp.right_shift(ns, jnp.uint32(28)) + jnp.uint32(4)
    word = jnp.bitwise_xor(jnp.right_shift(ns, shift), ns) * jnp.uint32(277803737)
    word = jnp.bitwise_xor(jnp.right_shift(word, jnp.uint32(22)), word)
    bits = jnp.bitwise_or(jnp.uint32(0x3F800000), jnp.right_shift(word, jnp.uint32(9)))
    return ns, jax.lax.bitcast_convert_type(bits, jnp.float32) - 1.0


def _tri_hit_test(tread, t, ox, oy, oz, dx, dy, dz, tmin):
    """Baldwin-Weber plane + barycentric test of triangle `t` against the
    whole ray block. tread(row, t) reads a per-triangle scalar. Returns
    (valid_hit_closer_than(tt_cap) predicate factory pieces): (tt, u, v, ok)."""
    nx = tread(TR_N + 0, t)
    ny = tread(TR_N + 1, t)
    nz = tread(TR_N + 2, t)
    d0 = tread(TR_D0, t)
    ndotd = nx * dx + ny * dy + nz * dz
    ok = jnp.abs(ndotd) > 1e-12
    inv = jnp.where(ok, 1.0 / jnp.where(ok, ndotd, 1.0), 0.0)
    tt = -(nx * ox + ny * oy + nz * oz + d0) * inv
    px = ox + tt * dx
    py = oy + tt * dy
    pz = oz + tt * dz
    u = tread(TR_R1 + 0, t) * px + tread(TR_R1 + 1, t) * py + tread(TR_R1 + 2, t) * pz + tread(TR_R1 + 3, t)
    v = tread(TR_R2 + 0, t) * px + tread(TR_R2 + 1, t) * py + tread(TR_R2 + 2, t) * pz + tread(TR_R2 + 3, t)
    ok = ok & (u >= -BARY_EPS) & (v >= -BARY_EPS) & (u + v <= 1.0 + BARY_EPS) & (tt > tmin)
    return tt, u, v, ok


# closest-hit carry: best_t, u, v, gn(3), n0(3), n1(3), n2(3), mat, dsided
HIT_CARRY = 17
# clustered-mode accumulator: best_t, u, v, win_idx + the 14 attrs above
# clustered-mode accumulator rows; 18/19 carry the interpolated uv in
# textured mode (fetched by the pass-2 attribute walk)
CLU_ACC_ROWS = 20
# +3 interpolated tangent, +1 interpolated bitangent sign (static.tangents)
CLU_ACC_ROWS_TAN = 24


def _closest_body_factory(tread, ox, oy, oz, dx, dy, dz, tmin,
                          want_uv=False, want_tan=False, cutout=None):
    """cutout: None, or (key_u32 [8,128], opac_row_index) — candidate hits
    then draw an independent hash Bernoulli against the per-triangle pass
    probability (the in-walk ignoreIntersection analog)."""
    def body(t, carry):
        (best_t, bu, bv,
         gnx, gny, gnz, n0x, n0y, n0z, n1x, n1y, n1z, n2x, n2y, n2z,
         mat, ds) = carry[:17]
        tt, u, v, ok = _tri_hit_test(tread, t, ox, oy, oz, dx, dy, dz, tmin)
        if cutout is not None:
            key, opac_row = cutout
            xi = _cutout_xi8(key, t.astype(jnp.uint32))
            ok = ok & (xi < tread(opac_row, t))
        better = ok & (tt < best_t)

        def sel(cur, row):
            return jnp.where(better, tread(row, t), cur)

        out = (
            jnp.where(better, tt, best_t),
            jnp.where(better, u, bu), jnp.where(better, v, bv),
            sel(gnx, TR_GN + 0), sel(gny, TR_GN + 1), sel(gnz, TR_GN + 2),
            sel(n0x, TR_N0 + 0), sel(n0y, TR_N0 + 1), sel(n0z, TR_N0 + 2),
            sel(n1x, TR_N1 + 0), sel(n1y, TR_N1 + 1), sel(n1z, TR_N1 + 2),
            sel(n2x, TR_N2 + 0), sel(n2y, TR_N2 + 1), sel(n2z, TR_N2 + 2),
            sel(mat, TR_MAT), sel(ds, TR_DS),
        )
        if want_uv:
            w = 1.0 - u - v
            uvx = (w * tread(TR_UV + 0, t) + u * tread(TR_UV + 2, t)
                   + v * tread(TR_UV + 4, t))
            uvy = (w * tread(TR_UV + 1, t) + u * tread(TR_UV + 3, t)
                   + v * tread(TR_UV + 5, t))
            out = out + (jnp.where(better, uvx, carry[17]),
                         jnp.where(better, uvy, carry[18]))
        if want_tan:
            w = 1.0 - u - v
            tanv = [w * tread(TR_T0 + ax, t) + u * tread(TR_T1 + ax, t)
                    + v * tread(TR_T2 + ax, t) for ax in range(3)]
            bs = (w * tread(TR_BS, t) + u * tread(TR_BS + 1, t)
                  + v * tread(TR_BS + 2, t))
            out = out + tuple(
                jnp.where(better, val, carry[19 + i])
                for i, val in enumerate(tanv + [bs]))
        return out
    return body


def _hit_carry_init(shape, want_uv=False, want_tan=False):
    z = jnp.zeros(shape, jnp.float32)
    base = (jnp.full(shape, FLOAT_MAX, jnp.float32), z, z,
            z, z, z, z, z, z, z, z, z, z, z, z, z, z)
    if want_uv:
        base = base + (z, z)
    if want_tan:
        base = base + (z, z, z, z)
    return base


def _slab_test(aabb_ref, idx, ox, oy, oz, ivx, ivy, ivz, tmin, tcap):
    """Ray/AABB slab test of one SMEM box against the whole block."""
    bx0 = aabb_ref[0, idx]; by0 = aabb_ref[1, idx]; bz0 = aabb_ref[2, idx]
    bx1 = aabb_ref[3, idx]; by1 = aabb_ref[4, idx]; bz1 = aabb_ref[5, idx]
    tx0 = (bx0 - ox) * ivx; tx1 = (bx1 - ox) * ivx
    ty0 = (by0 - oy) * ivy; ty1 = (by1 - oy) * ivy
    tz0 = (bz0 - oz) * ivz; tz1 = (bz1 - oz) * ivz
    tenter = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                         jnp.maximum(jnp.minimum(tz0, tz1), tmin))
    texit = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                        jnp.minimum(jnp.maximum(tz0, tz1), tcap))
    return tenter <= texit


def _safe_inv(d):
    tiny = jnp.abs(d) < 1e-20
    return 1.0 / jnp.where(tiny, jnp.where(d >= 0.0, 1e-20, -1e-20), d)


def _cluster_walk_plan(state, l1_aabbs, l2_aabbs, exact: bool = True):
    """XLA prelude for the clustered walk: per ray block, the L1 entries
    (flat: cluster groups; instanced: placements) sorted by a conservative
    per-block lower bound on any hit t inside the entry, the sorted bounds,
    and the global scene box.

    The kernel walks entries in this order while `dist[k] <= max over alive
    rays of best_t`: every hit in entry g is at least dist[k] along its ray,
    so once the nearest remaining entry is beyond every ray's current cap,
    ALL remaining entries are too — the walk stops. This is the TPU-block
    analog of ordered BVH traversal with early termination (hardware
    traversal, CgpuVk.cpp:2695-2854); correctness never depends on the
    order, only pruning efficiency does.

    exact=True computes dist as the EXACT per-ray slab union: an entry's
    dist is min over alive rays of the ray's slab entry-t (3e37 when no ray
    crosses it at all). Measured motivation (tools/perray_sim.py,
    sphere_field): the block-frustum interval heuristic leaves the kernel
    scanning 88-148 L1 entries/block while the exact per-ray union is 4.2
    (primaries) / 31 (sorted secondaries) entries — the scan, not the
    triangle tests, dominated the walk. The [B, 1024, n_l1] slab product is
    reduced over rays inside one fused XLA op (never materialized in HBM).
    """
    n_blocks = state.shape[1] // BLOCK_ROWS
    o = state[0:3].reshape(3, n_blocks, BLOCK_ROWS * 128)
    d = state[3:6].reshape(3, n_blocks, BLOCK_ROWS * 128)
    alive = (state[13] > 0.5).reshape(1, n_blocks, BLOCK_ROWS * 128)
    big = jnp.float32(FLOAT_MAX)
    b_lo = jnp.min(jnp.where(alive, o, big), axis=2)  # [3, B]
    b_hi = jnp.max(jnp.where(alive, o, -big), axis=2)
    g_lo = l1_aabbs[0:3]  # [3, n_l1]
    g_hi = l1_aabbs[3:6]
    gap = jnp.maximum(0.0, jnp.maximum(
        g_lo[:, None, :] - b_hi[:, :, None],
        b_lo[:, :, None] - g_hi[:, None, :]))  # [3, B, n_l1]
    # clamp before squaring: FLOAT_MAX gaps (empty boxes / dead blocks)
    # must order last without overflowing to nan via inf-inf downstream
    dist = jnp.sqrt(jnp.sum(jnp.minimum(gap, 1e18) ** 2, axis=0))  # [B, n_l1]

    # direction-aware group mask (interval arithmetic): the origin-box
    # distance alone sorts groups BEHIND the rays early and lets the walk
    # scan every group along the scene diagonal whenever one miss ray keeps
    # its cap at scene exit (measured: 88 of 145 L1 iterations/block on
    # sphere_field primaries, ~40% of the walk time in loop+slab overhead).
    # A conservative block-frustum slab test — origins in [b_lo,b_hi],
    # directions in [d_lo,d_hi], interval-safe reciprocals, axes whose
    # direction interval straddles 0 contribute (-inf, +inf) — masks
    # never-crossed groups to distance 3e37 so they sort last and the
    # while-loop's `dist <= max_best` exit never reaches them.
    d_lo = jnp.min(jnp.where(alive, d, big), axis=2)  # [3, B]
    d_hi = jnp.max(jnp.where(alive, d, -big), axis=2)
    pos = d_lo > 0.0
    neg = d_hi < 0.0
    mono = pos | neg  # direction sign fixed across the block on this axis
    safe_lo = jnp.where(mono, d_lo, 1.0)
    safe_hi = jnp.where(mono, d_hi, 1.0)
    iv_a = 1.0 / safe_lo  # interval endpoints of 1/d (order unknown)
    iv_b = 1.0 / safe_hi
    iv_lo = jnp.minimum(iv_a, iv_b)[:, :, None]  # [3, B, 1]
    iv_hi = jnp.maximum(iv_a, iv_b)[:, :, None]

    def _imul(s_lo, s_hi):
        # interval product (s_lo..s_hi) * (iv_lo..iv_hi), endpointwise
        p1, p2 = s_lo * iv_lo, s_lo * iv_hi
        p3, p4 = s_hi * iv_lo, s_hi * iv_hi
        return (jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
                jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)))

    def _interval_slab(box_lo, box_hi):
        """Conservative block-frustum slab vs boxes [3, K]: (entry lower
        bound, crossed) per [B, K]."""
        s0_lo = box_lo[:, None, :] - b_hi[:, :, None]
        s0_hi = box_lo[:, None, :] - b_lo[:, :, None]
        s1_lo = box_hi[:, None, :] - b_hi[:, :, None]
        s1_hi = box_hi[:, None, :] - b_lo[:, :, None]
        t0_lo, t0_hi = _imul(s0_lo, s0_hi)
        t1_lo, t1_hi = _imul(s1_lo, s1_hi)
        ent = jnp.minimum(t0_lo, t1_lo)  # [3, B, K] entry lower bound
        ext = jnp.maximum(t0_hi, t1_hi)  # exit upper bound
        mono_b = mono[:, :, None]
        ent = jnp.where(mono_b, ent, -big)
        ext = jnp.where(mono_b, ext, big)
        ten = jnp.maximum(jnp.max(ent, axis=0), 0.0)  # [B, K]
        tex = jnp.min(ext, axis=0)
        return ten, (ten <= tex) & (tex >= 0.0)

    # per-CLUSTER conservative entry bound, 3e37 when never crossed: the
    # kernel gates each cluster on ONE SMEM scalar compare against the
    # walk's tightening cap instead of a per-ray [8,128] slab test + reduce
    ten2, crossed2 = _interval_slab(l2_aabbs[0:3], l2_aabbs[3:6])
    # inverted (empty/pad) boxes come out of the interval slab as garbage
    # (FLOAT_MAX slab offsets overflow the products) — force them to the
    # never-crossed bound so they order LAST in the per-fan sort and the
    # sorted walk's fan_g-bounded loop still reaches every real cluster
    empty2 = jnp.any(l2_aabbs[0:3] > l2_aabbs[3:6], axis=0)[None, :]
    ten2 = jnp.where(crossed2 & ~empty2, ten2, 3e37)
    gbox = jnp.concatenate([
        jnp.min(jnp.where(g_lo <= 1e30, g_lo, big), axis=1),
        jnp.max(jnp.where(g_hi >= -1e30, g_hi, -big), axis=1),
        jnp.zeros(2, jnp.float32)])

    # transposed ray matrix for the in-kernel MXU intersection:
    # [B, 1024, LHS_COLS] with (o,1 | d,0 | scene-exit cap | spare).
    # Dead rays get cap -1 so no triangle test can register for them.
    o_flat = state[0:3].reshape(3, n_blocks, BLOCK_ROWS * 128)
    d_flat = state[3:6].reshape(3, n_blocks, BLOCK_ROWS * 128)
    a_flat = alive[0]
    inv = jnp.where(jnp.abs(d_flat) < 1e-20,
                    jnp.where(d_flat >= 0.0, 1e-20, -1e-20), d_flat)
    ex = jnp.maximum((gbox[0:3][:, None, None] - o_flat) / inv,
                     (gbox[3:6][:, None, None] - o_flat) / inv)
    cap = jnp.maximum(jnp.min(ex, axis=0), 0.0) * 1.0001 + 1e-3
    cap = jnp.where(a_flat, cap, -1.0)

    # ADVICE-r4 gate, measured (tools/plan_prof.py, v5e): at n_l1 = 145
    # (flat) / 258 (instanced) the exact per-ray union costs only ~8
    # us/block more than the interval heuristic while cutting kernel scan
    # iterations 3-30x — exact stays the default. The O(rays x n_l1)
    # prelude grows linearly in n_l1, so pathological entry counts fall
    # back to the conservative interval bounds.
    if exact and g_lo.shape[1] > 1024:
        exact = False
    if exact:
        # exact per-ray slab union: dist[b, g] = min over block b's alive
        # rays of the ray/box entry t (3e37 when no ray crosses box g).
        # Chunked over entries via lax.map so the [B, 1024, K] slab
        # temporaries stay bounded whether or not XLA fuses the reduce.
        inv_r = 1.0 / inv  # [3, B, R]; safe (inv is clamped away from 0)
        n_l1 = g_lo.shape[1]
        K = min(128, n_l1)
        n_pad = -(-n_l1 // K) * K
        lo_p = jnp.pad(g_lo, ((0, 0), (0, n_pad - n_l1)),
                       constant_values=FLOAT_MAX)
        hi_p = jnp.pad(g_hi, ((0, 0), (0, n_pad - n_l1)),
                       constant_values=-FLOAT_MAX)
        lo_c = lo_p.reshape(3, n_pad // K, K).transpose(1, 0, 2)
        hi_c = hi_p.reshape(3, n_pad // K, K).transpose(1, 0, 2)

        def _chunk(boxes):
            blo, bhi = boxes  # [3, K] each
            t0 = (blo[:, None, None, :] - o_flat[..., None]) * inv_r[..., None]
            t1 = (bhi[:, None, None, :] - o_flat[..., None]) * inv_r[..., None]
            ten_ = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=0), 0.0)
            tex_ = jnp.minimum(jnp.min(jnp.maximum(t0, t1), axis=0),
                               cap[..., None])  # [B, R, K]
            return jnp.min(jnp.where(ten_ <= tex_, ten_, 3e37), axis=1)

        dist = jax.lax.map(_chunk, (lo_c, hi_c))  # [n_chunks, B, K]
        dist = dist.transpose(1, 0, 2).reshape(n_blocks, n_pad)[:, :n_l1]
        dist = jnp.minimum(dist, 3e37)
    else:
        ten, crossed = _interval_slab(g_lo, g_hi)
        dist = jnp.where(crossed, dist, 3e37)
    order = jnp.argsort(dist, axis=1).astype(jnp.int32)
    dist_sorted = jnp.take_along_axis(dist, order, axis=1)
    ones = jnp.ones_like(cap)
    zeros = jnp.zeros_like(cap)
    # the per-ray PCG state rides the cap row's column 1 (as raw bits) —
    # the walks' stochastic-cutout draws key off it
    key_f = state[12].reshape(n_blocks, BLOCK_ROWS * 128)
    lhs = jnp.stack([
        jnp.stack([o_flat[0], o_flat[1], o_flat[2], ones,
                   zeros, zeros, zeros, zeros], axis=-1),
        jnp.stack([d_flat[0], d_flat[1], d_flat[2], zeros,
                   zeros, zeros, zeros, zeros], axis=-1),
        jnp.stack([cap, key_f, zeros, zeros,
                   zeros, zeros, zeros, zeros], axis=-1),
    ], axis=1)  # [B, 3, 1024, 8]

    # ONE merged per-block SMEM row [B, 1, 2*n_l1 + c_pad]: order (as f32 —
    # exact for ids < 2^24), sorted dists, per-cluster entry bounds. Every
    # per-block SMEM input costs a fixed ~13 us DMA per grid program
    # (PERF.md); merging the three plan inputs into one spec recovers
    # ~26 us/block of pure overhead. The per-block axis leads because
    # Mosaic SMEM blocks need the last two dims full-size.
    parts = [order.astype(jnp.float32), dist_sorted, ten2]
    if _FAN_SORT:
        # per-entry fan order by the cluster entry bounds (pads/never-
        # crossed clusters carry 3e37 so they sort last and the walk's
        # dist-based fan exit never reaches them). The kernel reads this
        # at offset 2*n_l1 + n_clusters; builders guarantee n_clusters ==
        # n_l1 * L1_FAN.
        fan_ord = jnp.argsort(
            ten2.reshape(n_blocks, -1, L1_FAN), axis=2)
        parts.append(fan_ord.astype(jnp.float32).reshape(n_blocks, -1))
    plan_row = jnp.concatenate(parts, axis=1)
    return (plan_row[:, None, :], gbox, lhs)


def _cluster_reader(tri_ref, cache, *, init_tags):
    """(fetch_group, cluster_rows) over either the VMEM-resident cluster
    table (cache None) or the DMA'd group cache. init_tags must be True
    for exactly ONE walk per kernel (the first), so later walks in the same
    program reuse warm cache entries."""
    if cache is None:
        def fetch_group(g):
            return g

        def cluster_rows(handle, b):
            return tri_ref[handle * L1_FAN + b]

        return fetch_group, cluster_rows

    groups, gsem, tags = cache
    if init_tags:
        @pl.when(pl.program_id(0) == 0)
        def _():
            for slot_i in range(CACHE_SLOTS):
                tags[slot_i] = -1

    def fetch_group(g):
        slot = jax.lax.rem(g, CACHE_SLOTS)
        if _PROF_NODMA:
            return slot

        @pl.when(tags[slot] != g)
        def _():
            cp = pltpu.make_async_copy(
                tri_ref.at[pl.ds(g * L1_FAN, L1_FAN)], groups.at[slot], gsem)
            cp.start()
            cp.wait()
            tags[slot] = g

        return slot

    def cluster_rows(handle, b):
        return groups[handle, b]

    return fetch_group, cluster_rows


def _split_lhs24(lhs2):
    """[2048, 8] f32 ray matrix -> [2048, 24] bf16 (hi | hi | lo) for the
    fused hi/lo product (see _bw_products)."""
    lhs_hi = lhs2.astype(jnp.bfloat16)
    lhs_lo = (lhs2 - lhs_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([lhs_hi, lhs_hi, lhs_lo], axis=1)


def _inst_local_lhs24(lhs24_w, m24_ref, g):
    """Transform the hi/lo-split world ray matrix [2048, 24] into instance
    g's LOCAL frame with ONE MXU pass and re-split it for _bw_products.

    lhs24_w is [hi | hi | lo] columns and m24 is the entry's [M_hi; M_lo;
    M_hi] row stack, so the contraction computes hi@hi + hi@lo + lo@hi —
    the same bf16x3 emulation as the triangle products (~2^-16 relative).
    Pass-1 precision only decides WHICH triangle wins; pass 2 recomputes
    the winner's t/u/v from exact f32 transforms. The hit t parameter is
    invariant under the affine reparametrization (x(t) = o + t d ⇒
    x_l(t) = o_l + t d_l), so local intersections compare directly
    against the world-space caps. Replaces a ~21-op lane-skinny VPU
    version that measured ~5 us per visited instance."""
    m24 = m24_ref[pl.ds(g * 24, 24)]  # [24, 8] bf16
    lhs_l = jax.lax.dot_general(
        lhs24_w, m24, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [2048, 8] f32
    return _split_lhs24(lhs_l)


def _cutout_xi(key_col, tri_base, lane_i):
    """Per-(ray, triangle) uniform in [0,1): murmur-style integer mix of
    the ray's PCG state column [1024, 1] with the global triangle id
    (tri_base + lane). Independent of the path's PCG stream by
    construction; decorrelated across rays, triangles and bounces (the
    key advances with the ray state every bounce)."""
    tid = (tri_base + lane_i) * jnp.uint32(2654435761)
    h = key_col ^ tid  # [1024, 128] via broadcast
    h = (h ^ (h >> jnp.uint32(16))) * jnp.uint32(0x21F0AAAD)
    h = (h ^ (h >> jnp.uint32(15))) * jnp.uint32(0x735A2D97)
    h = h ^ (h >> jnp.uint32(15))
    return (h >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def _cutout_xi8(key8, tid_scalar):
    """_cutout_xi for the resident scalar walk: key in ray layout
    [8,128] u32, one scalar triangle id."""
    h = key8 ^ (tid_scalar * jnp.uint32(2654435761))
    h = (h ^ (h >> jnp.uint32(16))) * jnp.uint32(0x21F0AAAD)
    h = (h ^ (h >> jnp.uint32(15))) * jnp.uint32(0x735A2D97)
    h = h ^ (h >> jnp.uint32(15))
    return (h >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def _bw_products(lhs24, tri):
    """Baldwin-Weber products for one cluster: stacked (o|d) x the three
    8-aligned quads. The bf16x3 emulation (hi*hi + hi*lo + lo*hi, ~2^-16
    relative) runs as ONE K=24 MXU pass — the three partial products ride
    the contraction dimension ((hi|hi|lo) x (hi;lo;hi)) instead of three
    separate K=8 passes, so the systolic array's K capacity absorbs them
    for free. Returns (po, pd), each [RAY_BLOCK, 384] f32."""
    ro = jnp.concatenate(
        [tri[CLU_N:CLU_N + 8], tri[CLU_R1:CLU_R1 + 8],
         tri[CLU_R2:CLU_R2 + 8]], axis=1)  # [8, 384]

    if _PROF_NOMXU:
        # keep a (1,1)-shaped slice: Mosaic cannot squeeze a bf16 scalar
        p = jnp.broadcast_to(
            ro[0:1, :] + lhs24[0:1, 0:1].astype(jnp.float32),
            (2 * RAY_BLOCK, 384))
    else:
        ro_hi = ro.astype(jnp.bfloat16)
        ro_lo = (ro - ro_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        ro24 = jnp.concatenate([ro_hi, ro_lo, ro_hi], axis=0)  # [24, 384]
        p = jax.lax.dot_general(
            lhs24, ro24, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [2048, 384]
    return p[0:RAY_BLOCK], p[RAY_BLOCK:2 * RAY_BLOCK]


def _bw_products_pair(lhs24, tri_a, tri_b):
    """_bw_products over TWO clusters in one K=24 MXU pass: the pair's
    quads ride the N dimension ([24, 768]); returns (po, pd) [RAY_BLOCK,
    768] with cluster A's quads at columns 0:384 and B's at 384:768."""
    ro = jnp.concatenate(
        [tri_a[CLU_N:CLU_N + 8], tri_a[CLU_R1:CLU_R1 + 8],
         tri_a[CLU_R2:CLU_R2 + 8],
         tri_b[CLU_N:CLU_N + 8], tri_b[CLU_R1:CLU_R1 + 8],
         tri_b[CLU_R2:CLU_R2 + 8]], axis=1)  # [8, 768]
    ro_hi = ro.astype(jnp.bfloat16)
    ro_lo = (ro - ro_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    ro24 = jnp.concatenate([ro_hi, ro_lo, ro_hi], axis=0)  # [24, 768]
    p = jax.lax.dot_general(
        lhs24, ro24, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [2048, 768]
    return p[0:RAY_BLOCK], p[RAY_BLOCK:2 * RAY_BLOCK]


def _trace_clustered_matrix(tri_ref, l1_ref, l2_ref, plan_ref,
                            gbox_ref, lhs_ref, cache, best128,
                            clus128, attrs_acc, acc,
                            ox, oy, oz, dx, dy, dz, tmin, alive_f, *, n_l1,
                            want_uv=False, tangents=False, cutout=False,
                            inst=None, skip_p2=False):
    """Matrix-form ordered closest-hit walk (round-3 clustered tracer).

    Measured on v5e (PERF.md): every DMA costs ~13 us FIXED regardless of
    size, and the scalar 128-triangle loop costs ~110 cycles/triangle
    (serialized dynamic SMEM scalar reads). This version therefore
    (a) keeps the whole cluster table VMEM-resident when it fits
        (cache is None, tri_ref is a VMEM input fetched once per
        pallas_call); otherwise DMAs whole L1 GROUPS of 16 clusters
        (one fixed cost for 256 KB instead of 16) behind a direct-mapped
        group cache that persists across grid programs,
    (b) intersects each surviving cluster on the MXU: Baldwin-Weber
        plane/u/v products for all (1024 rays x 128 tris) at once as
        bf16 hi/lo split matmuls — three one-pass bf16 products
        reproduce the f32 result to ~2^-16 relative (the bf16x3
        emulation XLA calls HIGH, which Mosaic does not expose) at a
        quarter of the HIGHEST (bf16x6 per operand pair) MXU passes,
    (c) keeps per-(ray,lane) running best/cluster arrays across the walk and
        resolves the argmin once at the end,
    (d) fetches the winner's attribute rows with ONE one-hot matmul per
        winning cluster ([1024,128] x [128,40]) in pass 2, then recomputes
        the winner's t/u/v EXACTLY from the f32 rows — the bf16 split
        decides only WHICH triangle wins, never the shading-state math.

    The transposed ray matrix (lhs_ref [1024, 16]: o,1 | d,0 | cap) comes
    from the XLA prelude (_cluster_walk_plan); the group walk keeps the
    near-to-far order + global early exit of the ordered walk. Results land
    in `acc` in ray layout: 0 best_t, 1 u, 2 v, 3 win tri index (-1 = miss),
    4-17 attrs, 18-19 uv (want_uv).
    """
    for i in range(1, acc.shape[0]):
        acc[i] = jnp.zeros((BLOCK_ROWS, 128), jnp.float32)
    acc[3] = jnp.full((BLOCK_ROWS, 128), -1.0, jnp.float32)
    ivx, ivy, ivz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
    alive = alive_f > 0.5
    tmin_r = jnp.where(alive, tmin, FLOAT_MAX)

    # per-ray scene-exit cap (slab exit vs the global box) for slab tests
    ex = jnp.maximum((gbox_ref[0] - ox) * ivx, (gbox_ref[3] - ox) * ivx)
    ey = jnp.maximum((gbox_ref[1] - oy) * ivy, (gbox_ref[4] - oy) * ivy)
    ez = jnp.maximum((gbox_ref[2] - oz) * ivz, (gbox_ref[5] - oz) * ivz)
    t_exit = jnp.minimum(jnp.minimum(ex, ey), ez)
    cap = jnp.maximum(t_exit, 0.0) * 1.0001 + 1e-3
    acc[0] = jnp.where(alive, cap, 0.0)

    best128[...] = jnp.full((RAY_BLOCK, 128), FLOAT_MAX, jnp.float32)
    clus128[...] = jnp.full((RAY_BLOCK, 128), -1.0, jnp.float32)
    lhs_o = lhs_ref[0, 0]  # [1024, 8]: (o, 1, 0, 0, 0, 0)
    lhs_d = lhs_ref[0, 1]  # [1024, 8]: (d, 0, 0, 0, 0, 0)
    cap_t = lhs_ref[0, 2, :, 0:1]  # [1024, 1]; -1 for dead rays
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (RAY_BLOCK, 128), 1)
    lane_f = lane_i.astype(jnp.float32)
    if cutout:
        key_col = jax.lax.bitcast_convert_type(
            lhs_ref[0, 2, :, 1:2], jnp.uint32)  # [1024, 1] PCG state

    # hi/lo bf16 split of the stacked (origins | directions) ray matrix,
    # done once per block (instanced mode re-projects it per visited
    # instance into that instance's local frame with one MXU pass)
    lhs24 = _split_lhs24(jnp.concatenate([lhs_o, lhs_d], axis=0))

    if inst is not None:
        inst_smem_ref, inst_map_ref, inst_attr_ref, inst_m24_ref = inst

        def fetch_group(g):
            return g

        def cluster_rows(handle, b):
            # entry -> shared unique local cluster
            return tri_ref[inst_map_ref[handle * L1_FAN + b]]
    else:
        # group cache (non-resident mode): scratch persists across the
        # sequential grid programs of one pallas_call, so Morton-adjacent
        # ray blocks reuse each other's group fetches (every DMA is ~13 us
        # fixed cost — the secondary-bounce bottleneck). Tags are
        # invalidated once by the first program; the NEE occlusion walk
        # reuses the warm cache.
        fetch_group, cluster_rows = _cluster_reader(tri_ref, cache,
                                                    init_tags=True)

    # ---- pass 1: per-(ray, lane) best t + cluster over ordered groups ----
    def l1_cond(carry):
        k, max_best = carry
        return (k < n_l1) & (plan_ref[0, 0, n_l1 + jnp.minimum(k, n_l1 - 1)]
                             <= max_best)

    def l1_body(carry):
        k, max_best = carry
        g = plan_ref[0, 0, k].astype(jnp.int32)
        # per-ray slab tests remain load-bearing for INCOHERENT blocks
        # (removing them doubled the secondary-bounce cost: the plan's
        # block-interval bounds go slack when a block's direction interval
        # straddles zero); the precomputed per-cluster entry bound adds a
        # FREE scalar pre-gate in front of each [8,128] slab + reduce,
        # which skips clusters behind every ray's tightened cap
        hit1 = _slab_test(l1_ref, g, ox, oy, oz, ivx, ivy, ivz, tmin_r, acc[0])
        any1 = jnp.max(hit1.astype(jnp.float32)) > 0.5

        @pl.when(any1)
        def _():
            handle = fetch_group(g)
            # instanced: rays enter instance g's local frame (the
            # rigid/affine BLAS transform of the reference's TLAS walk);
            # the entry's REAL fan count bounds the cluster loop (pad
            # slots carry empty boxes but still cost a gate iteration)
            if inst is not None:
                lhs24_g = _inst_local_lhs24(lhs24, inst_m24_ref, g)
                fan_g = inst_smem_ref[g, 13].astype(jnp.int32)
            else:
                lhs24_g = lhs24
                fan_g = L1_FAN

            def _visit_cluster(b):
                # b: within-group cluster index (build order, or the
                # plan's per-fan near-to-far order under _FAN_SORT)
                c = g * L1_FAN + b
                hit2 = _slab_test(l2_ref, c, ox, oy, oz, ivx, ivy, ivz,
                                  tmin_r, acc[0])
                any2 = jnp.max(hit2.astype(jnp.float32)) > 0.5

                @pl.when(any2)
                def _():
                    # ONE stacked (o|d) x rows product covers all three
                    # Baldwin-Weber quads: the quads sit at 8-aligned
                    # sublanes (CLU layout) so the lane-concat
                    # legalizes, and lhs columns 4-7 are zero so the
                    # attr rows parked in each quad's upper half
                    # contribute nothing (selection only; the winner's
                    # t/u/v are recomputed exactly in pass 2).
                    tri = cluster_rows(handle, b)
                    po, pd = _bw_products(lhs24_g, tri)
                    nd = pd[:, 0:128]
                    okm = jnp.abs(nd) > 1e-12
                    inv = jnp.where(okm, 1.0 / jnp.where(okm, nd, 1.0), 0.0)
                    tt = -po[:, 0:128] * inv
                    u = po[:, 128:256] + tt * pd[:, 128:256]
                    v = po[:, 256:384] + tt * pd[:, 256:384]
                    okm = (okm & (u >= -BARY_EPS) & (v >= -BARY_EPS) & (u + v <= 1.0 + BARY_EPS)
                           & (tt > tmin) & (tt < cap_t))
                    if cutout:
                        xi = _cutout_xi(
                            key_col,
                            (c * CLUSTER_SIZE).astype(jnp.uint32),
                            lane_i.astype(jnp.uint32))
                        if inst is not None:
                            # per-instance pass probability (the mesh
                            # rows are shared; opacity is a material
                            # property of the PLACEMENT)
                            okm = okm & (xi < inst_smem_ref[g, 12])
                        else:
                            okm = okm & (xi < tri[CLU_OPAC:CLU_OPAC + 1, :])
                    cur = best128[...]
                    bet = okm & (tt < cur)
                    best128[...] = jnp.where(bet, tt, cur)
                    clus128[...] = jnp.where(bet, c.astype(jnp.float32),
                                             clus128[...])
                    if _FAN_TIGHTEN:
                        # tighten per-ray caps after EVERY cluster so
                        # later clusters in this fan prune on their
                        # slab test (costs one lane-reduce per visit)
                        btf = jnp.min(best128[...], axis=1)
                        acc[0] = jnp.minimum(
                            acc[0], btf.reshape(BLOCK_ROWS, 128))

            if _FAN_SORT:
                # near-to-far fan walk: visit clusters in the plan's
                # per-entry sorted order behind a while whose exit bound
                # tightens after every visit — once the nearest remaining
                # cluster's entry bound clears every alive ray's running
                # best, the rest of the fan (pads included: bound 3e37)
                # is skipped
                fan_off = 2 * n_l1 + n_l1 * L1_FAN

                def l2_cond(carry):
                    b, mb = carry
                    bs = plan_ref[0, 0, fan_off + g * L1_FAN + jnp.minimum(
                        b, L1_FAN - 1)].astype(jnp.int32)
                    return (b < fan_g) & (
                        plan_ref[0, 0, 2 * n_l1 + g * L1_FAN + bs] <= mb)

                def l2_sorted(carry):
                    b, mb = carry
                    bs = plan_ref[0, 0,
                                  fan_off + g * L1_FAN + b].astype(jnp.int32)
                    _visit_cluster(bs)
                    # scalar exit-bound tighten (conservative: max-of-best
                    # over alive rays bounds max-of-min(cap, best))
                    btf = jnp.min(best128[...], axis=1)
                    mb = jnp.minimum(mb, jnp.max(jnp.where(
                        alive, btf.reshape(BLOCK_ROWS, 128), 0.0)))
                    return b + 1, mb

                jax.lax.while_loop(l2_cond, l2_sorted,
                                   (jnp.int32(0), max_best))
            elif _FAN_PAIR:
                def l2_pair(b2, __):
                    b0 = b2 * 2
                    c0 = g * L1_FAN + b0
                    c1 = c0 + 1  # odd tails land on a pad slot (no hits)
                    gate = ((plan_ref[0, 0, 2 * n_l1 + c0] <= max_best)
                            | (plan_ref[0, 0, 2 * n_l1 + c1] <= max_best))

                    @pl.when(gate)
                    def _():
                        h_a = _slab_test(l2_ref, c0, ox, oy, oz,
                                         ivx, ivy, ivz, tmin_r, acc[0])
                        h_b = _slab_test(l2_ref, c1, ox, oy, oz,
                                         ivx, ivy, ivz, tmin_r, acc[0])
                        any2 = jnp.max(h_a.astype(jnp.float32)
                                       + h_b.astype(jnp.float32)) > 0.5

                        @pl.when(any2)
                        def _():
                            tri_a = cluster_rows(handle, b0)
                            tri_b = cluster_rows(handle, b0 + 1)
                            po, pd = _bw_products_pair(lhs24_g, tri_a, tri_b)
                            for half, (c, tri) in enumerate(
                                    ((c0, tri_a), (c1, tri_b))):
                                o0 = half * 384
                                nd = pd[:, o0:o0 + 128]
                                okm = jnp.abs(nd) > 1e-12
                                inv = jnp.where(
                                    okm, 1.0 / jnp.where(okm, nd, 1.0), 0.0)
                                tt = -po[:, o0:o0 + 128] * inv
                                u = (po[:, o0 + 128:o0 + 256]
                                     + tt * pd[:, o0 + 128:o0 + 256])
                                v = (po[:, o0 + 256:o0 + 384]
                                     + tt * pd[:, o0 + 256:o0 + 384])
                                okm = (okm & (u >= -BARY_EPS)
                                       & (v >= -BARY_EPS)
                                       & (u + v <= 1.0 + BARY_EPS)
                                       & (tt > tmin) & (tt < cap_t))
                                if cutout:
                                    xi = _cutout_xi(
                                        key_col,
                                        (c * CLUSTER_SIZE).astype(
                                            jnp.uint32),
                                        lane_i.astype(jnp.uint32))
                                    if inst is not None:
                                        okm = okm & (xi < inst_smem_ref[g, 12])
                                    else:
                                        okm = okm & (
                                            xi < tri[CLU_OPAC:CLU_OPAC + 1, :])
                                cur = best128[...]
                                bet = okm & (tt < cur)
                                best128[...] = jnp.where(bet, tt, cur)
                                clus128[...] = jnp.where(
                                    bet, c.astype(jnp.float32), clus128[...])
                    return 0

                jax.lax.fori_loop(0, (fan_g + 1) // 2, l2_pair, 0)
            else:
                def l2_body(b, __):
                    @pl.when(plan_ref[0, 0, 2 * n_l1 + g * L1_FAN + b]
                             <= max_best)
                    def _():
                        _visit_cluster(b)
                    return 0

                jax.lax.fori_loop(0, fan_g, l2_body, 0)

            # per-ray cap tighten (prunes later clusters + drives the exit)
            bt = jnp.min(best128[...], axis=1)  # [1024]
            acc[0] = jnp.minimum(acc[0], bt.reshape(BLOCK_ROWS, 128))

        return k + 1, jnp.max(jnp.where(alive, acc[0], 0.0))

    jax.lax.while_loop(
        l1_cond, l1_body,
        (jnp.int32(0), jnp.max(jnp.where(alive, acc[0], 0.0))))

    # ---- winner resolve: argmin over lanes, then back to ray layout ----
    bfin = best128[...]
    cfin = clus128[...]
    bt = jnp.min(bfin, axis=1)  # [1024]
    ismin = (bfin == bt[:, None]) & (cfin >= 0.0)
    wt = jnp.min(jnp.where(ismin, cfin * 128.0 + lane_f, FLOAT_MAX), axis=1)
    win_t = jnp.where(wt < 1e30, wt, -1.0)  # [1024] global tri id or -1
    acc[0] = bt.reshape(BLOCK_ROWS, 128)
    acc[3] = win_t.reshape(BLOCK_ROWS, 128)

    if skip_p2:
        # XLA pass-2 relocation (trace_step + _finalize_hits): the winner
        # id + pass-1 t in acc[0]/acc[3] are the kernel's whole output
        return

    # ---- pass 2: one-hot matmul attribute fetch from winning clusters ----
    # walks the PLAN's candidate list (same distance exit as pass 1), not
    # the [g_min, g_max] id span: winners of an incoherent block span the
    # whole entry range, and the span loop's per-entry gates measured 314
    # (primaries) to 512 (sorted secondaries) us/block on the instanced
    # sphere_field — 80-90% of the whole walk. A winner's hit t is >= its
    # entry's dist (per-ray slab entry bound), so every winning entry
    # satisfies dist <= max over hit rays of best_t — the same prefix pass
    # 1 visited.
    win8 = acc[3]
    hit_any = win8 >= 0.0
    win_cluster = jnp.floor(win8 * (1.0 / CLUSTER_SIZE))
    win_group = jnp.floor(win_cluster * (1.0 / L1_FAN))
    max_best_hit = jnp.max(jnp.where(hit_any, acc[0], 0.0))
    attrs_acc[...] = jnp.zeros(attrs_acc.shape, jnp.float32)
    win_col = win_t[:, None]  # [1024, 1]

    def a1_cond(k):
        return (k < n_l1) & (plan_ref[0, 0, n_l1 + jnp.minimum(k, n_l1 - 1)]
                             <= max_best_hit)

    def a1_body(k):
        g = plan_ref[0, 0, k].astype(jnp.int32)
        in_g = hit_any & (win_group == g.astype(jnp.float32))
        any1 = jnp.max(in_g.astype(jnp.float32)) > 0.5

        @pl.when(any1)
        def _():
            handle = fetch_group(g)
            # only the fan slots that actually hold winners (gated by any1,
            # so in_g is nonempty): typically 1-2 of L1_FAN
            base_c = g.astype(jnp.float32) * L1_FAN
            b_min = (jnp.min(jnp.where(in_g, win_cluster, 3e37))
                     - base_c).astype(jnp.int32)
            b_max = (jnp.max(jnp.where(in_g, win_cluster, -1.0))
                     - base_c).astype(jnp.int32)

            def a2_body(b, __):
                c = g * L1_FAN + b
                in_c = hit_any & (win_cluster == c)
                any2 = jnp.max(in_c.astype(jnp.float32)) > 0.5

                @pl.when(any2)
                def _():
                    base = (c * CLUSTER_SIZE).astype(jnp.float32)
                    # DEFAULT-precision f32 matmuls truncate operands to
                    # bf16 on the MXU (measured 2e-3 relative on hardware);
                    # the one-hot side is 0/1 (bf16-exact), so three passes
                    # against the value side's hi/mid/lo split reproduce
                    # the f32 rows to ~2^-24 — attrs feed normals and the
                    # exact t/u/v recompute, where truncation is visible
                    onehot = (win_col == base + lane_f).astype(jnp.bfloat16)
                    tri = cluster_rows(handle, b)
                    tri_hi = tri.astype(jnp.bfloat16)
                    r1_ = tri - tri_hi.astype(jnp.float32)
                    tri_mid = r1_.astype(jnp.bfloat16)
                    tri_lo = (r1_ - tri_mid.astype(jnp.float32)).astype(
                        jnp.bfloat16)

                    def adot(vals):
                        return jax.lax.dot_general(
                            onehot, vals, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)

                    attrs_acc[...] = (attrs_acc[...] + adot(tri_hi)
                                      + adot(tri_mid) + adot(tri_lo))
                return 0

            jax.lax.fori_loop(b_min, b_max + 1, a2_body, 0)
        return k + 1

    if not _PROF_NOP2:
        jax.lax.while_loop(a1_cond, a1_body, jnp.int32(0))

    # attrs to ray layout: [1024, rows] -> [rows, 8, 128]
    rows40 = jnp.transpose(attrs_acc[...], (1, 0)).reshape(
        attrs_acc.shape[1], BLOCK_ROWS, 128)

    if inst is not None:
        # ---- instanced pass 2: per-ray instance transform ----
        # gather the winning instance's rows per ray (exact hi/mid/lo
        # one-hot products, same trick as the attr fetch)
        i_lanes = inst_attr_ref.shape[0]
        win_g_col = jnp.floor(
            win_t * (1.0 / (CLUSTER_SIZE * L1_FAN)))[:, None]  # [1024, 1]
        lane_il = jax.lax.broadcasted_iota(
            jnp.int32, (RAY_BLOCK, i_lanes), 1).astype(jnp.float32)
        oh_i = (win_g_col == lane_il).astype(jnp.bfloat16)
        ia = inst_attr_ref[...]
        ia_hi = ia.astype(jnp.bfloat16)
        ra = ia - ia_hi.astype(jnp.float32)
        ia_mid = ra.astype(jnp.bfloat16)
        ia_lo = (ra - ia_mid.astype(jnp.float32)).astype(jnp.bfloat16)

        def idot(vals):
            return jax.lax.dot_general(
                oh_i, vals, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        irows = idot(ia_hi) + idot(ia_mid) + idot(ia_lo)  # [1024, 24]
        ir = jnp.transpose(irows, (1, 0)).reshape(
            irows.shape[1], BLOCK_ROWS, 128)
        A = lambda j, i: ir[3 * j + i]  # noqa: E731 — A3[j, i]

        # local rays (exact f32); t is the same parameter in both frames
        olx = ox * A(0, 0) + oy * A(1, 0) + oz * A(2, 0) + ir[9]
        oly = ox * A(0, 1) + oy * A(1, 1) + oz * A(2, 1) + ir[10]
        olz = ox * A(0, 2) + oy * A(1, 2) + oz * A(2, 2) + ir[11]
        dlx = dx * A(0, 0) + dy * A(1, 0) + dz * A(2, 0)
        dly = dx * A(0, 1) + dy * A(1, 1) + dz * A(2, 1)
        dlz = dx * A(0, 2) + dy * A(1, 2) + dz * A(2, 2)

        ndw = (rows40[CLU_N] * dlx + rows40[CLU_N + 1] * dly
               + rows40[CLU_N + 2] * dlz)
        pow_ = (rows40[CLU_N] * olx + rows40[CLU_N + 1] * oly
                + rows40[CLU_N + 2] * olz + rows40[CLU_N + 3])
        nd_safe = jnp.where(jnp.abs(ndw) > 1e-20,
                            ndw, jnp.where(ndw >= 0.0, 1e-20, -1e-20))
        acc[0] = jnp.where(hit_any, -pow_ / nd_safe, acc[0])
        pxl = olx + acc[0] * dlx
        pyl = oly + acc[0] * dly
        pzl = olz + acc[0] * dlz
        u = (rows40[CLU_R1] * pxl + rows40[CLU_R1 + 1] * pyl
             + rows40[CLU_R1 + 2] * pzl + rows40[CLU_R1 + 3])
        v = (rows40[CLU_R2] * pxl + rows40[CLU_R2 + 1] * pyl
             + rows40[CLU_R2 + 2] * pzl + rows40[CLU_R2 + 3])
        acc[1] = jnp.where(hit_any, u, 0.0)
        acc[2] = jnp.where(hit_any, v, 0.0)

        # normals are covectors: n_w = n_l @ A3ᵀ (the inverse-transpose
        # transform; the winding-flip sign cancels against det as in the
        # flattened builder's FLIP_FACING handling)
        def covec(r0):
            nlx, nly, nlz = rows40[r0], rows40[r0 + 1], rows40[r0 + 2]
            return (nlx * A(0, 0) + nly * A(0, 1) + nlz * A(0, 2),
                    nlx * A(1, 0) + nly * A(1, 1) + nlz * A(1, 2),
                    nlx * A(2, 0) + nly * A(2, 1) + nlz * A(2, 2))

        gx, gy, gz = covec(CLU_GN)
        glen = jax.lax.rsqrt(jnp.maximum(gx * gx + gy * gy + gz * gz, 1e-20))
        acc[4], acc[5], acc[6] = gx * glen, gy * glen, gz * glen
        for k, r0 in enumerate((CLU_N0, CLU_N1, CLU_N2)):
            wx, wy, wz = covec(r0)
            # unnormalized is fine: the transform is linear, so shade's
            # interpolate-then-normalize equals transform(interp(n))
            acc[7 + 3 * k] = wx
            acc[8 + 3 * k] = wy
            acc[9 + 3 * k] = wz
        acc[16] = ir[12]  # per-instance material row
        acc[17] = ir[15]  # per-instance double-sided flag
    else:
        attr_rows = (CLU_GN, CLU_GN + 1, CLU_GN + 2,
                     CLU_N0, CLU_N0 + 1, CLU_N0 + 2,
                     CLU_N1, CLU_N1 + 1, CLU_N1 + 2,
                     CLU_N2, CLU_N2 + 1, CLU_N2 + 2,
                     CLU_MAT, CLU_DS)
        for i, row in enumerate(attr_rows):
            acc[4 + i] = rows40[row]

        # t, u, v recomputed EXACTLY (f32) from the winner's Baldwin-Weber
        # rows: the bf16-split pass-1 products only pick the winner; all
        # shading-state math downstream is full precision
        ndw = (rows40[CLU_N] * dx + rows40[CLU_N + 1] * dy
               + rows40[CLU_N + 2] * dz)
        pow_ = (rows40[CLU_N] * ox + rows40[CLU_N + 1] * oy
                + rows40[CLU_N + 2] * oz + rows40[CLU_N + 3])
        nd_safe = jnp.where(jnp.abs(ndw) > 1e-20,
                            ndw, jnp.where(ndw >= 0.0, 1e-20, -1e-20))
        acc[0] = jnp.where(hit_any, -pow_ / nd_safe, acc[0])

        px = ox + acc[0] * dx
        py = oy + acc[0] * dy
        pz = oz + acc[0] * dz
        u = (rows40[CLU_R1] * px + rows40[CLU_R1 + 1] * py
             + rows40[CLU_R1 + 2] * pz + rows40[CLU_R1 + 3])
        v = (rows40[CLU_R2] * px + rows40[CLU_R2 + 1] * py
             + rows40[CLU_R2 + 2] * pz + rows40[CLU_R2 + 3])
        acc[1] = jnp.where(hit_any, u, 0.0)
        acc[2] = jnp.where(hit_any, v, 0.0)
    if want_uv:
        w = 1.0 - acc[1] - acc[2]
        acc[18] = (w * rows40[CLU_UV] + acc[1] * rows40[CLU_UV + 2]
                   + acc[2] * rows40[CLU_UV + 4])
        acc[19] = (w * rows40[CLU_UV + 1] + acc[1] * rows40[CLU_UV + 3]
                   + acc[2] * rows40[CLU_UV + 5])
    if tangents:
        # interpolated per-corner tangent + bitangent sign (normal mapping;
        # orthonormalization happens in the trace kernel after the facing
        # flip, mirroring the wavefront integrator's shading state)
        w = 1.0 - acc[1] - acc[2]
        for ax in range(3):
            acc[20 + ax] = (w * rows40[CLU_T0 + ax]
                            + acc[1] * rows40[CLU_T1 + ax]
                            + acc[2] * rows40[CLU_T2 + ax])
        acc[23] = (w * rows40[CLU_BS] + acc[1] * rows40[CLU_BS + 1]
                   + acc[2] * rows40[CLU_BS + 2])


def _trace_clustered_occluded(tri_ref, l1_ref, l2_ref, cache, occ128, acc,
                              ox, oy, oz, dx, dy, dz, dist, active, rng,
                              *, n_l1, cutout=False, inst=None):
    """Occlusion walk (matrix form): acc[0] accumulates the occluded flag
    (f32 0/1).

    Shadow origins are this bounce's hit points, so the XLA walk plan
    (computed from the pre-trace origins) does not apply; instead the walk
    computes the shadow-origin box IN KERNEL and skips groups whose
    conservative distance exceeds every unresolved ray's light distance —
    plus a while-loop exit once every shadow ray is resolved (the
    terminate-on-first-hit dispatch of rgen:397-438). Each surviving
    cluster runs the same bf16 hi/lo split MXU products as the closest-hit
    walk, with any-hit semantics: no argmin, no attribute pass, and the
    ~2^-16 relative t error only perturbs edge-grazing shadow rays. In
    cached (non-resident) mode the group cache stays warm from the
    closest-hit walk of the same bounce."""
    acc[0] = jnp.zeros((BLOCK_ROWS, 128), jnp.float32)
    occ128[...] = jnp.zeros((RAY_BLOCK, 128), jnp.float32)
    ivx, ivy, ivz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
    tmin_r = jnp.where(active, SHADOW_TMIN, FLOAT_MAX)
    tcap = jnp.where(active, dist, -FLOAT_MAX)

    # shadow-origin box over active rays (squared-distance comparisons)
    big = jnp.float32(FLOAT_MAX)
    sb_lo = [jnp.min(jnp.where(active, c, big)) for c in (ox, oy, oz)]
    sb_hi = [jnp.max(jnp.where(active, c, -big)) for c in (ox, oy, oz)]
    max_d0 = jnp.max(jnp.where(active, dist, 0.0))

    # stacked (o | d) ray matrix built in kernel ([8,128] rows flatten to
    # the same ray order as the XLA plan's), split hi/lo once
    def flat(v):
        return v.reshape(RAY_BLOCK)

    one = jnp.ones((RAY_BLOCK,), jnp.float32)
    zero = jnp.zeros((RAY_BLOCK,), jnp.float32)
    zero2 = jnp.zeros((2 * RAY_BLOCK,), jnp.float32)
    # component-major stack + transpose: Mosaic legalizes the (8, 2048)
    # -> (2048, 8) transpose but NOT a lane-minor stack of 1D vectors
    lhs2 = jnp.transpose(jnp.stack(
        [jnp.concatenate([flat(ox), flat(dx)]),
         jnp.concatenate([flat(oy), flat(dy)]),
         jnp.concatenate([flat(oz), flat(dz)]),
         jnp.concatenate([one, zero]),
         zero2, zero2, zero2, zero2], axis=0))  # [2048, 8]
    lhs24 = _split_lhs24(lhs2)
    # [1024, 1] light distances via the same transpose (the direct
    # flat[:, None] broadcast is an unsupported Mosaic shape cast here);
    # the second row carries the ray's PCG bits for the cutout draws,
    # salted so shadow draws decorrelate from the camera walk's
    key_row = jax.lax.bitcast_convert_type(
        rng ^ jnp.uint32(0x5BD1E995), jnp.float32)  # rng: [8,128] u32
    aux = jnp.transpose(jnp.stack(
        [jnp.concatenate([flat(tcap), zero]),
         jnp.concatenate([flat(key_row), zero])], axis=0))  # [2048, 2]
    dist_col = aux[0:RAY_BLOCK, 0:1]
    if cutout:
        key_col = jax.lax.bitcast_convert_type(
            aux[0:RAY_BLOCK, 1:2], jnp.uint32)
        lane_i = jax.lax.broadcasted_iota(
            jnp.uint32, (RAY_BLOCK, 128), 1)

    if inst is not None:
        inst_smem_ref, inst_map_ref, _inst_attr_ref, inst_m24_ref = inst

        def fetch_group(g):
            return g

        def cluster_rows(handle, b):
            return tri_ref[inst_map_ref[handle * L1_FAN + b]]
    else:
        fetch_group, cluster_rows = _cluster_reader(tri_ref, cache,
                                                    init_tags=False)

    def occl_cond(carry):
        g, n_open, _max_d = carry
        return (g < n_l1) & (n_open > 0.0)

    def occl_body(carry):
        g, _n_open, max_d = carry
        # conservative group distance from the shadow-origin box
        d2 = jnp.float32(0.0)
        for ax in range(3):
            gap = jnp.maximum(
                0.0, jnp.maximum(l1_ref[ax, g] - sb_hi[ax],
                                 sb_lo[ax] - l1_ref[3 + ax, g]))
            gap = jnp.minimum(gap, 1e18)
            d2 = d2 + gap * gap

        @pl.when(d2 <= max_d * max_d)
        def _():
            # unresolved = active & not occluded; resolved rays prune the walk
            open_r = active & (acc[0] < 0.5)
            tmin_w = jnp.where(open_r, tmin_r, FLOAT_MAX)
            hit1 = _slab_test(l1_ref, g, ox, oy, oz, ivx, ivy, ivz, tmin_w, tcap)
            any1 = jnp.max(hit1.astype(jnp.float32)) > 0.5

            @pl.when(any1)
            def _():
                handle = fetch_group(g)
                if inst is not None:
                    lhs24_g = _inst_local_lhs24(lhs24, inst_m24_ref, g)
                    fan_g = inst_smem_ref[g, 13].astype(jnp.int32)
                else:
                    lhs24_g = lhs24
                    fan_g = L1_FAN

                def l2_body(b, __):
                    c = g * L1_FAN + b
                    hit2 = _slab_test(l2_ref, c, ox, oy, oz, ivx, ivy, ivz,
                                      tmin_w, tcap)
                    any2 = jnp.max(hit2.astype(jnp.float32)) > 0.5

                    @pl.when(any2)
                    def _():
                        tri = cluster_rows(handle, b)
                        po, pd = _bw_products(lhs24_g, tri)
                        nd = pd[:, 0:128]
                        okm = jnp.abs(nd) > 1e-12
                        inv = jnp.where(okm, 1.0 / jnp.where(okm, nd, 1.0), 0.0)
                        tt = -po[:, 0:128] * inv
                        u = po[:, 128:256] + tt * pd[:, 128:256]
                        v = po[:, 256:384] + tt * pd[:, 256:384]
                        okm = (okm & (u >= -BARY_EPS) & (v >= -BARY_EPS) & (u + v <= 1.0 + BARY_EPS)
                               & (tt > SHADOW_TMIN) & (tt < dist_col))
                        if cutout:
                            xi = _cutout_xi(
                                key_col,
                                (c * CLUSTER_SIZE).astype(jnp.uint32),
                                lane_i)
                            if inst is not None:
                                # shadow pass prob (col 14: textured
                                # materials carry their UV-mean opacity)
                                okm = okm & (xi < inst_smem_ref[g, 14])
                            else:
                                okm = okm & (
                                    xi < tri[CLU_OPAC_SH:CLU_OPAC_SH + 1, :])
                        occ128[...] = jnp.maximum(occ128[...],
                                                  okm.astype(jnp.float32))
                    return 0

                jax.lax.fori_loop(0, fan_g, l2_body, 0)
                # fold lanes into the per-ray flag once per group (drives
                # the slab pruning + early exit)
                occ_r = jnp.max(occ128[...], axis=1)  # [1024]
                acc[0] = jnp.maximum(acc[0], occ_r.reshape(BLOCK_ROWS, 128))

        open_n = active & (acc[0] < 0.5)
        return (g + 1, jnp.max(open_n.astype(jnp.float32)),
                jnp.max(jnp.where(open_n, dist, 0.0)))

    jax.lax.while_loop(
        occl_cond, occl_body,
        (jnp.int32(0), jnp.max(active.astype(jnp.float32)), max_d0))


# ---------------------------------------------------------------------------
# the bounce kernel
# ---------------------------------------------------------------------------

def _bounce_kernel(params_ref, tri_ref, mat_ref, light_ref, l1_ref, l2_ref,
                   *rest, static: FusedStatic, nee: bool):
    inst = None
    if static.instanced:
        inst_smem_ref, inst_map_ref, inst_attr_ref, inst_m24_ref, *rest = rest
        inst = (inst_smem_ref, inst_map_ref, inst_attr_ref, inst_m24_ref)
    if static.clustered:
        (plan_ref, gbox_ref, lhs_ref,
         state_ref, out_ref, *scratch) = rest
        plan = (plan_ref, gbox_ref, lhs_ref)
    else:
        state_ref, out_ref, *scratch = rest
        plan = None
    # dead-block early out: later bounces have mostly-terminated blocks and
    # skip the whole triangle loop (the SIMT analog: warp-level exit)
    any_alive = jnp.max(state_ref[13]) > 0.5

    @pl.when(jnp.logical_not(any_alive))
    def _():
        out_ref[...] = state_ref[...]

    @pl.when(any_alive)
    def _():
        _bounce_body(params_ref, tri_ref, mat_ref, light_ref, l1_ref, l2_ref,
                     plan, state_ref, out_ref, scratch, static=static,
                     nee=nee, inst=inst)


def _resolve_material_rows(mat_ref, mat_f, n_mats: int, volumes: bool,
                           advanced: bool = False):
    """Select-loop resolve of per-ray material params from the SMEM table
    (shared by the one-kernel bounce and the split-bounce shade kernel).

    Columns of MaterialTable.packed_f used: 0-2 base_color, 3 metallic,
    4 roughness, 5 ior, 7-9 emissive, 14 transmission, 15 thin_walled,
    24 backface_edf, 16-18 sigma_a, and (advanced) 26-29 clearcoat /
    clearcoat_roughness / anisotropy / anisotropy_rotation. Returns the
    12 shading params plus (va_r, va_g, va_b) plus the 4 advanced params,
    Nones where not resolved.

    m_id by round, not truncate: clustered attrs arrive via the hi/lo
    matmul fetch (~2^-16 relative), so ids sit next to integers."""
    m_id = jnp.round(mat_f).astype(jnp.int32)
    cols = (0, 1, 2, 3, 4, 5, 7, 8, 9, 14, 15, 24)
    if volumes:
        cols = cols + (16, 17, 18)
    n_base = len(cols)
    if advanced:
        cols = cols + (26, 27, 28, 29)
    mp = [jnp.zeros_like(mat_f) for _ in range(len(cols))]
    for mm in range(n_mats):
        is_m = m_id == mm
        for k, col in enumerate(cols):
            mp[k] = jnp.where(is_m, mat_ref[mm, col], mp[k])
    adv = mp[n_base:] if advanced else [None] * 4
    mp = mp[:n_base]
    if not volumes:
        mp = mp + [None, None, None]
    return tuple(mp) + tuple(adv)


def _resolve_medium_rows(mat_ref, mid_f, n_mats: int):
    """Scatter mode: resolve the CURRENT medium's sigma_s (cols 19-21),
    sigma_t (= sigma_a 16-18 + sigma_s) and HG bias (col 22) by the medium
    material id riding the alive-row encoding."""
    m_id = jnp.round(mid_f).astype(jnp.int32)
    out = [jnp.zeros_like(mid_f) for _ in range(7)]
    for mm in range(n_mats):
        is_m = m_id == mm
        sa = [mat_ref[mm, 16 + k] for k in range(3)]
        ss = [mat_ref[mm, 19 + k] for k in range(3)]
        for k in range(3):
            out[k] = jnp.where(is_m, ss[k], out[k])
            out[3 + k] = jnp.where(is_m, sa[k] + ss[k], out[3 + k])
        out[6] = jnp.where(is_m, mat_ref[mm, 22], out[6])
    return tuple(out)


def _bounce_body(params_ref, tri_ref, mat_ref, light_ref, l1_ref, l2_ref,
                 plan, state_ref, out_ref, scratch, *, static: FusedStatic,
                 nee: bool, inst=None):
    s = lambda c: state_ref[c]  # [8,128]  # noqa: E731

    ox, oy, oz = s(0), s(1), s(2)
    dx, dy, dz = s(3), s(4), s(5)
    tpx, tpy, tpz = s(6), s(7), s(8)
    radx, rady, radz = s(9), s(10), s(11)
    rng = jax.lax.bitcast_convert_type(s(12), jnp.uint32)
    alive = s(13) > 0.5
    alive_f = s(13)

    tmin = params_ref[P_TMIN]

    # ---- volume free-flight distance sampling (rgen:317-346) ----
    vol = None
    if static.scatter:
        inside = alive_f >= 1.5
        enc = jnp.maximum(alive_f - 2.0, 0.0)
        walk_f = jnp.floor(enc * (1.0 / 64.0))
        mid_f = enc - walk_f * 64.0
        (ms_r, ms_g, ms_b, mt_r, mt_g, mt_b, gbias) = _resolve_medium_rows(
            mat_ref, mid_f, static.n_mats)
        has_scat = (ms_r + ms_g + ms_b) > 0.0
        do_dist = (alive & inside & has_scat
                   & (walk_f <= params_ref[P_MAX_WALK]))
        rng_v1, xv0 = _pcg_next(rng)
        rng_v2, xv1 = _pcg_next(rng_v1)
        rng = jnp.where(do_dist, rng_v2, rng)
        # spectral single-channel MIS select (rgen sampleDistance:49-69)
        al_r = jnp.where(mt_r > 0.0, ms_r / jnp.maximum(mt_r, 1e-20), 0.0)
        al_g = jnp.where(mt_g > 0.0, ms_g / jnp.maximum(mt_g, 1e-20), 0.0)
        al_b = jnp.where(mt_b > 0.0, ms_b / jnp.maximum(mt_b, 1e-20), 0.0)
        w_r = tpx * al_r
        w_g = tpy * al_g
        w_b = tpz * al_b
        wsum = w_r + w_g + w_b
        big_w = wsum > 1e-9
        p3_r = jnp.where(big_w, w_r / jnp.maximum(wsum, 1e-9), 1.0 / 3.0)
        p3_g = jnp.where(big_w, w_g / jnp.maximum(wsum, 1e-9), 1.0 / 3.0)
        p3_b = jnp.where(big_w, w_b / jnp.maximum(wsum, 1e-9), 1.0 / 3.0)
        pick1 = xv0 < p3_r
        pick2 = (~pick1) & (xv0 < p3_r + p3_g)
        sel_sigma = jnp.where(pick1, mt_r, jnp.where(pick2, mt_g, mt_b))
        s_coef = jnp.maximum(sel_sigma * params_ref[P_METERS], 1e-20)
        t_sample = -jnp.log(jnp.maximum(1.0 - xv1, 1e-20)) / s_coef
        vol = dict(inside=inside, mid_f=mid_f, walk_f=walk_f,
                   do_dist=do_dist, t_sample=t_sample,
                   ms=(ms_r, ms_g, ms_b), mt=(mt_r, mt_g, mt_b),
                   p3=(p3_r, p3_g, p3_b), gbias=gbias)

    # ---- closest-hit search ----
    if static.clustered:
        plan_ref, gbox_ref, lhs_ref = plan
        acc, cache, best128, clus128, attrs_acc = _clu_scratch_views(
            scratch, static)
        _trace_clustered_matrix(
            tri_ref, l1_ref, l2_ref, plan_ref,
            gbox_ref, lhs_ref, cache, best128, clus128, attrs_acc, acc,
            ox, oy, oz, dx, dy, dz, tmin, alive_f, n_l1=static.n_l1,
            cutout=static.cutout, inst=inst)
        best_t, u, v = acc[0], acc[1], acc[2]
        (gnx, gny, gnz, n0x, n0y, n0z,
         n1x, n1y, n1z, n2x, n2y, n2z, mat_f, dsided) = tuple(
            acc[4 + i] for i in range(14))
        # best_t caps at the scene-box exit; the hit flag is the win index
        hit = alive & (acc[3] >= 0.0)
    else:
        def tread(row, t):
            return tri_ref[row, t]

        cut_arg = ((rng, tr_opac_row(static.tangents))
                   if static.cutout else None)
        body = _closest_body_factory(tread, ox, oy, oz, dx, dy, dz, tmin,
                                     cutout=cut_arg)
        (best_t, u, v, gnx, gny, gnz, n0x, n0y, n0z,
         n1x, n1y, n1z, n2x, n2y, n2z, mat_f, dsided) = jax.lax.fori_loop(
            0, static.n_tris, body, _hit_carry_init(ox.shape))
        hit = alive & (best_t < FLOAT_MAX)

    if vol is not None:
        # distance sampling caps the segment at t_sample: a hit beyond it
        # (or no hit at all) is a VOLUME WALK STEP, not a surface hit and
        # not a background miss (rp_main.miss stepVolume)
        vol_step = vol["do_dist"] & (~hit | (best_t > vol["t_sample"]))
        hit = hit & ~vol_step
        vol["step"] = vol_step
        miss = alive & ~hit & ~vol_step
    else:
        miss = alive & ~hit

    # ---- miss: constant background; dome radiance is applied by the XLA
    # post-pass from the row-14 miss record (see module docstring) ----
    radx = radx + jnp.where(miss, tpx * params_ref[P_BG_R], 0.0)
    rady = rady + jnp.where(miss, tpy * params_ref[P_BG_G], 0.0)
    radz = radz + jnp.where(miss, tpz * params_ref[P_BG_B], 0.0)
    bounce = params_ref[P_BOUNCE]
    miss_rec = jnp.where(miss, bounce + 1.0, s(14))

    # ---- shading state ----
    posx = ox + best_t * dx
    posy = oy + best_t * dy
    posz = oz + best_t * dz
    w = 1.0 - u - v
    nx = w * n0x + u * n1x + v * n2x
    ny = w * n0y + u * n1y + v * n2y
    nz = w * n0z + u * n1z + v * n2z
    nlen = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-20))
    nx, ny, nz = nx * nlen, ny * nlen, nz * nlen

    front = (gnx * -dx + gny * -dy + gnz * -dz) >= 0.0
    fsign = jnp.where(front, 1.0, -1.0)
    gnx, gny, gnz = gnx * fsign, gny * fsign, gnz * fsign
    nx, ny, nz = nx * fsign, ny * fsign, nz * fsign

    # ---- material row resolve ----
    (base_r, base_g, base_b, metallic, roughness, ior,
     em_r, em_g, em_b, transm, thinw, bf_edf,
     va_r, va_g, va_b, coat, coat_rough, aniso, aniso_rot) = \
        _resolve_material_rows(
            mat_ref, mat_f, static.n_mats, static.volumes, static.advanced)

    _shade_core(
        params_ref, tri_ref, light_ref, l1_ref, l2_ref, out_ref, scratch,
        static, nee, inst=inst,
        s15=s(15), ox=ox, oy=oy, oz=oz, dx=dx, dy=dy, dz=dz,
        tpx=tpx, tpy=tpy, tpz=tpz, radx=radx, rady=rady, radz=radz,
        rng=rng, alive=alive, alive_f=alive_f, hit=hit, miss=miss,
        miss_rec=miss_rec, posx=posx, posy=posy, posz=posz,
        gnx=gnx, gny=gny, gnz=gnz, nx=nx, ny=ny, nz=nz,
        front=front, dsided=dsided,
        base_r=base_r, base_g=base_g, base_b=base_b, metallic=metallic,
        roughness=roughness, ior=ior, em_r=em_r, em_g=em_g, em_b=em_b,
        transm=transm, thinw=thinw, bf_edf=bf_edf,
        va_r=va_r, va_g=va_g, va_b=va_b,
        coat=coat, coat_rough=coat_rough, aniso=aniso, aniso_rot=aniso_rot,
        vol=vol, hit_mat_f=mat_f, hit_t=best_t)



def _shade_core(params_ref, tri_ref, light_ref, l1_ref, l2_ref, out_ref,
                scratch, static: FusedStatic, nee: bool, *, inst=None,
                s15, ox, oy, oz, dx, dy, dz, tpx, tpy, tpz,
                radx, rady, radz, rng, alive, alive_f, hit, miss, miss_rec,
                posx, posy, posz, gnx, gny, gnz, nx, ny, nz, front, dsided,
                base_r, base_g, base_b, metallic, roughness, ior,
                em_r, em_g, em_b, transm, thinw, bf_edf,
                va_r=None, va_g=None, va_b=None,
                coat=None, coat_rough=None, aniso=None, aniso_rot=None,
                tanx=None, tany=None, tanz=None, tbs=None,
                vol=None, hit_mat_f=None, hit_t=None):
    """Emission + BSDF sampling + NEE shadow walk + RR + state writeback:
    shared by the single-kernel bounce and the textured split-bounce shade
    kernel (material params arrive as per-ray values in the latter).

    static.advanced adds the full render/bsdf.py lobe set in-kernel:
    clearcoat, anisotropic GGX (mesh-tangent frame when tan*/tbs rows are
    provided), and thick refractive microfacet transmission with the exact
    dielectric Fresnel + TIR (reference: one megakernel shades everything,
    rp_main.chit:360-389,446-480)."""
    bounce = params_ref[P_BOUNCE]
    adv = static.advanced

    if static.volumes and vol is not None:
        # scatter mode (depth-1 stack): surface-hit transmittance uses the
        # CURRENT medium's sigma_t (integrator chit:160-186 / :540-550)
        inside = vol["inside"]
        dist_m = jnp.where(hit, hit_t, 0.0) * params_ref[P_METERS]
        att = inside & hit
        mt_r, mt_g, mt_b = vol["mt"]
        tpx = jnp.where(att, tpx * jnp.exp(-mt_r * dist_m), tpx)
        tpy = jnp.where(att, tpy * jnp.exp(-mt_g * dist_m), tpy)
        tpz = jnp.where(att, tpz * jnp.exp(-mt_b * dist_m), tpz)
    elif static.volumes:
        # absorption-only volumes (mediumStackSize == 0, integrator:427-431):
        # the medium flag rides the alive row (2.0 = inside). Transmittance
        # applies on the segment INTO this hit, with the HIT material's
        # sigma_a (the reference's stackless approximation).
        inside = alive_f > 1.5
        dist_m = jnp.where(hit, jnp.minimum(
            jnp.sqrt((posx - ox) ** 2 + (posy - oy) ** 2 + (posz - oz) ** 2),
            1e30), 0.0) * params_ref[P_METERS]
        att = inside & hit
        tpx = jnp.where(att, tpx * jnp.exp(-va_r * dist_m), tpx)
        tpy = jnp.where(att, tpy * jnp.exp(-va_g * dist_m), tpy)
        tpz = jnp.where(att, tpz * jnp.exp(-va_b * dist_m), tpz)
    # ---- emission: front face, or backface of single-sided geometry, or
    # thin-walled backface EDF (rp_main.chit:304-315) ----
    em_ok = hit & (front | (dsided <= 0.5)
                   | ((thinw > 0.5) & (bf_edf > 0.5)))
    em_scale = params_ref[P_EXP2_EXPOSURE]
    radx = radx + jnp.where(em_ok, tpx * em_r * em_scale, 0.0)
    rady = rady + jnp.where(em_ok, tpy * em_g * em_scale, 0.0)
    radz = radz + jnp.where(em_ok, tpz * em_b * em_scale, 0.0)

    # ---- RNG draws (xi4, same order as the general integrator) ----
    rng1, xi0 = _pcg_next(rng)
    rng2, xi1 = _pcg_next(rng1)
    rng3, xi2 = _pcg_next(rng2)
    rng4, xi3 = _pcg_next(rng3)
    rng = jnp.where(hit, rng4, rng)

    # ---- Duff ONB around the shading normal ----
    nsign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a_onb = -1.0 / (nsign + nz)
    b_onb = nx * ny * a_onb
    t1x = 1.0 + nsign * nx * nx * a_onb
    t1y = nsign * b_onb
    t1z = -nsign * nx
    t2x = b_onb
    t2y = nsign + ny * ny * a_onb
    t2z = -ny
    if adv and tanx is not None:
        # advanced scenes anchor the frame to the MESH tangent (anisotropy
        # rotation is mesh-relative): re-orthonormalize against the
        # (possibly normal-mapped) shading normal, bitangent as
        # cross(n, t) * sign. Degenerate tangents (uv-less meshes, tangent
        # parallel to the perturbed normal) keep the Duff ONB.
        tdn = tanx * nx + tany * ny + tanz * nz
        mtx = tanx - nx * tdn
        mty = tany - ny * tdn
        mtz = tanz - nz * tdn
        tlen2 = mtx * mtx + mty * mty + mtz * mtz
        tok = tlen2 > 1e-12
        tl = jax.lax.rsqrt(jnp.maximum(tlen2, 1e-20))
        mtx, mty, mtz = mtx * tl, mty * tl, mtz * tl
        bsgn = jnp.where(tbs >= 0.0, 1.0, -1.0)
        t1x = jnp.where(tok, mtx, t1x)
        t1y = jnp.where(tok, mty, t1y)
        t1z = jnp.where(tok, mtz, t1z)
        t2x = jnp.where(tok, (ny * mtz - nz * mty) * bsgn, t2x)
        t2y = jnp.where(tok, (nz * mtx - nx * mtz) * bsgn, t2y)
        t2z = jnp.where(tok, (nx * mty - ny * mtx) * bsgn, t2z)

    # wo in local frame
    wox = -(dx * t1x + dy * t1y + dz * t1z)
    woy = -(dx * t2x + dy * t2y + dz * t2z)
    woz = -(dx * nx + dy * ny + dz * nz)

    # ---- lobe weights (render/bsdf.py _lobe_weights) ----
    f0d = ((ior - 1.0) / (ior + 1.0)) ** 2
    f0r = f0d * (1.0 - metallic) + base_r * metallic
    f0g = f0d * (1.0 - metallic) + base_g * metallic
    f0b = f0d * (1.0 - metallic) + base_b * metallic
    lum_base = 0.2126 * base_r + 0.7152 * base_g + 0.0722 * base_b
    lum_f0 = 0.2126 * f0r + 0.7152 * f0g + 0.0722 * f0b
    w_d = lum_base * (1.0 - metallic) * (1.0 - transm)
    w_g = jnp.where(lum_f0 > 0.0, jnp.maximum(lum_f0, 0.04), 0.0)
    w_t = transm
    if adv:
        # thick-glass fraction handled by the self-contained interface
        # lobe; the base glossy lobe must not model that reflection again
        thin_f = jnp.where(thinw > 0.5, 1.0, 0.0)
        thick = transm * (1.0 - thin_f)
        w_g = w_g * (1.0 - thick)
        w_c = 0.25 * coat
    else:
        w_c = 0.0
    w_sum = jnp.maximum(w_d + w_g + w_t + w_c, 1e-20)
    p_d = w_d / w_sum
    p_g = w_g / w_sum
    p_t = w_t / w_sum

    pick_d = xi0 < p_d
    pick_g = (~pick_d) & (xi0 < p_d + p_g)
    if adv:
        p_c = w_c / w_sum
        pick_t = (~pick_d) & (~pick_g) & (xi0 < p_d + p_g + p_t)
        pick_c = (~pick_d) & (~pick_g) & (~pick_t)
    else:
        pick_t = (~pick_d) & (~pick_g)

    alpha = jnp.maximum(roughness * roughness, MIN_ALPHA)
    alpha2 = alpha * alpha
    if adv:
        # anisotropic GGX roughnesses (Disney aspect) + rotation frame
        aspect = jnp.sqrt(1.0 - 0.9 * jnp.clip(aniso, 0.0, 1.0))
        ax = jnp.maximum(alpha / aspect, MIN_ALPHA)
        ay = jnp.maximum(alpha * aspect, MIN_ALPHA)
        rtheta = (2.0 * PI) * aniso_rot
        cos_r = jnp.cos(rtheta)
        sin_r = jnp.sin(rtheta)

    # diffuse: cosine hemisphere
    ra = jnp.sqrt(jnp.clip(xi1, 0.0, 1.0))
    phi_d = 2.0 * PI * xi2
    wdx = ra * jnp.cos(phi_d)
    wdy = ra * jnp.sin(phi_d)
    wdz = jnp.sqrt(jnp.maximum(0.0, 1.0 - xi1))

    if adv:
        # glossy: anisotropic GGX half vector in slope space (identical to
        # the isotropic c2h mapping when ax == ay), sampled in the rotated
        # frame and rotated back (render/bsdf.py sample)
        u_c = jnp.clip(xi1, 0.0, 1.0 - 1e-7)
        r_slope = jnp.sqrt(u_c / (1.0 - u_c))
        hxr = ax * r_slope * jnp.cos(phi_d)
        hyr = ay * r_slope * jnp.sin(phi_d)
        hinv_s = jax.lax.rsqrt(jnp.maximum(hxr * hxr + hyr * hyr + 1.0,
                                           1e-24))
        hxr, hyr, hzr = hxr * hinv_s, hyr * hinv_s, hinv_s
        hx = hxr * cos_r - hyr * sin_r  # rotate back (-theta)
        hy = hxr * sin_r + hyr * cos_r
        hz = hzr
    else:
        # glossy: GGX NDF half-vector sample + reflect
        c2h = (1.0 - xi1) / jnp.maximum(1.0 + (alpha2 - 1.0) * xi1, 1e-12)
        ch = jnp.sqrt(jnp.clip(c2h, 0.0, 1.0))
        sh = jnp.sqrt(jnp.maximum(0.0, 1.0 - c2h))
        hx = sh * jnp.cos(phi_d)
        hy = sh * jnp.sin(phi_d)
        hz = ch
    odoth = wox * hx + woy * hy + woz * hz
    wgx = 2.0 * odoth * hx - wox
    wgy = 2.0 * odoth * hy - woy
    wgz = 2.0 * odoth * hz - woz

    wix = jnp.where(pick_d, wdx, wgx)
    wiy = jnp.where(pick_d, wdy, wgy)
    wiz = jnp.where(pick_d, wdz, wgz)
    if adv:
        # clearcoat: isotropic GGX reflect with the coat roughness
        ac = jnp.maximum(coat_rough * coat_rough, MIN_ALPHA)
        ac2 = ac * ac
        u_cc = jnp.clip(xi1, 0.0, 1.0 - 1e-7)
        c2hc = (1.0 - u_cc) / jnp.maximum(1.0 + (ac2 - 1.0) * u_cc, 1e-12)
        chc = jnp.sqrt(jnp.clip(c2hc, 0.0, 1.0))
        shc = jnp.sqrt(jnp.maximum(0.0, 1.0 - c2hc))
        hcx = shc * jnp.cos(phi_d)
        hcy = shc * jnp.sin(phi_d)
        hcz = chc
        odothc = wox * hcx + woy * hcy + woz * hcz
        wix = jnp.where(pick_c, 2.0 * odothc * hcx - wox, wix)
        wiy = jnp.where(pick_c, 2.0 * odothc * hcy - woy, wiy)
        wiz = jnp.where(pick_c, 2.0 * odothc * hcz - woz, wiz)

        # thick transmission: microfacet dielectric interface — exact
        # Fresnel decides reflect-vs-refract per sample, TIR falls out as
        # F -> 1 (render/bsdf.py sample; OmniGlass df::specular_bsdf)
        c2ht = (1.0 - u_cc) / jnp.maximum(1.0 + (alpha2 - 1.0) * u_cc,
                                          1e-12)
        cht = jnp.sqrt(jnp.clip(c2ht, 0.0, 1.0))
        sht = jnp.sqrt(jnp.maximum(0.0, 1.0 - c2ht))
        htx = sht * jnp.cos(phi_d)
        hty = sht * jnp.sin(phi_d)
        htz = cht
        eta_rel = jnp.where(front, ior, 1.0 / jnp.maximum(ior, 1e-6))
        c_oh = jnp.maximum(wox * htx + woy * hty + woz * htz, 0.0)
        # exact unpolarized dielectric Fresnel (TIR -> 1)
        sin2_t = (1.0 - c_oh * c_oh) / jnp.maximum(eta_rel * eta_rel,
                                                   1e-12)
        tir = sin2_t >= 1.0
        cos_tf = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
        rs_f = ((c_oh - eta_rel * cos_tf)
                / jnp.maximum(c_oh + eta_rel * cos_tf, 1e-12))
        rp_f = ((eta_rel * c_oh - cos_tf)
                / jnp.maximum(eta_rel * c_oh + cos_tf, 1e-12))
        f_t = jnp.where(tir, 1.0,
                        jnp.clip(0.5 * (rs_f * rs_f + rp_f * rp_f),
                                 0.0, 1.0))
        eta_inv = 1.0 / jnp.maximum(eta_rel, 1e-6)
        k_t = 1.0 - eta_inv * eta_inv * (1.0 - c_oh * c_oh)
        cos_t = jnp.sqrt(jnp.maximum(k_t, 0.0))
        scale_h = eta_inv * c_oh - cos_t
        wrx = -eta_inv * wox + scale_h * htx
        wry = -eta_inv * woy + scale_h * hty
        wrz = -eta_inv * woz + scale_h * htz
        refl_pick = xi3 < f_t
        thin_b = thinw > 0.5
        wtx = jnp.where(thin_b, -wox,
                        jnp.where(refl_pick, 2.0 * c_oh * htx - wox, wrx))
        wty = jnp.where(thin_b, -woy,
                        jnp.where(refl_pick, 2.0 * c_oh * hty - woy, wry))
        wtz = jnp.where(thin_b, -woz,
                        jnp.where(refl_pick, 2.0 * c_oh * htz - woz, wrz))
        wix = jnp.where(pick_t, wtx, wix)
        wiy = jnp.where(pick_t, wty, wiy)
        wiz = jnp.where(pick_t, wtz, wiz)
    else:
        wix = jnp.where(pick_t, -wox, wix)
        wiy = jnp.where(pick_t, -woy, wiy)
        wiz = jnp.where(pick_t, -woz, wiz)

    def eval_lobes(wix_, wiy_, wiz_):
        """Diffuse/glossy(+clearcoat, aniso when adv) reflection lobes at
        local wi (render/bsdf.py _eval_lobes). Returns per-channel diffuse,
        glossy, and the pdf."""
        cos_i_ = wiz_
        refl_ = (woz > 0.0) & (cos_i_ > 0.0)
        cos_i_c_ = jnp.maximum(cos_i_, 0.0)
        hxs = wox + wix_
        hys = woy + wiy_
        hzs = woz + wiz_
        hinv = jax.lax.rsqrt(jnp.maximum(hxs * hxs + hys * hys + hzs * hzs, 1e-24))
        hxs, hys, hzs = hxs * hinv, hys * hinv, hzs * hinv
        nh = jnp.abs(hzs)
        oh = jnp.maximum(wox * hxs + woy * hys + woz * hzs, 1e-6)
        nvo = jnp.maximum(woz, 1e-6)
        nvi = jnp.maximum(cos_i_c_, 1e-6)
        if adv:
            # anisotropic D/G in the rotated tangent frame
            hxr_ = hxs * cos_r + hys * sin_r
            hyr_ = -hxs * sin_r + hys * cos_r
            woxr = wox * cos_r + woy * sin_r
            woyr = -wox * sin_r + woy * cos_r
            wixr = wix_ * cos_r + wiy_ * sin_r
            wiyr = -wix_ * sin_r + wiy_ * cos_r
            q_ = ((hxr_ / ax) ** 2 + (hyr_ / ay) ** 2 + hzs * hzs)
            ggx_d = 1.0 / jnp.maximum(PI * ax * ay * q_ * q_, 1e-12)

            def _ag1(vx, vy, vz):
                vza = jnp.maximum(jnp.abs(vz), 1e-6)
                lam = 0.5 * (-1.0 + jnp.sqrt(
                    1.0 + ((ax * vx) ** 2 + (ay * vy) ** 2) / (vza * vza)))
                return 1.0 / (1.0 + lam)

            gg = _ag1(woxr, woyr, woz) * _ag1(wixr, wiyr, wiz_)
        else:
            dd = nh * nh * (alpha2 - 1.0) + 1.0
            ggx_d = alpha2 / jnp.maximum(PI * dd * dd, 1e-12)
            g1o = 2.0 * nvo / (nvo + jnp.sqrt(alpha2 + (1.0 - alpha2) * nvo * nvo))
            g1i = 2.0 * nvi / (nvi + jnp.sqrt(alpha2 + (1.0 - alpha2) * nvi * nvi))
            gg = g1o * g1i
        mfres = jnp.clip(1.0 - oh, 0.0, 1.0)
        fres5 = (mfres * mfres) ** 2 * mfres
        fr_r = f0r + (1.0 - f0r) * fres5
        fr_g = f0g + (1.0 - f0g) * fres5
        fr_b = f0b + (1.0 - f0b) * fres5
        spec_core = ggx_d * gg / jnp.maximum(4.0 * woz * cos_i_c_, 1e-9) * cos_i_c_
        diff_core = (1.0 - metallic) * (1.0 - transm) * cos_i_c_ / PI
        if adv:
            # clearcoat lobe + base attenuation under the coat (both
            # directions, standard-surface convention); the thick-glass
            # fraction is removed from the base glossy lobe
            dc_ = ac2 / jnp.maximum(
                PI * (nh * nh * (ac2 - 1.0) + 1.0) ** 2, 1e-12)
            g1oc = 2.0 * nvo / (nvo + jnp.sqrt(ac2 + (1.0 - ac2) * nvo * nvo))
            g1ic = 2.0 * nvi / (nvi + jnp.sqrt(ac2 + (1.0 - ac2) * nvi * nvi))
            fc_ = 0.04 + 0.96 * fres5
            coat_core = (coat * fc_ * dc_ * g1oc * g1ic
                         / jnp.maximum(4.0 * woz * cos_i_c_, 1e-9)
                         * cos_i_c_)
            m_o = jnp.clip(1.0 - nvo, 0.0, 1.0)
            m_i = jnp.clip(1.0 - nvi, 0.0, 1.0)
            att = ((1.0 - coat * (0.04 + 0.96 * (m_o * m_o) ** 2 * m_o))
                   * (1.0 - coat * (0.04 + 0.96 * (m_i * m_i) ** 2 * m_i)))
            spec_core = spec_core * ((1.0 - thick) * att)
            diff_core = diff_core * att
        else:
            coat_core = 0.0
        zero = jnp.zeros_like(spec_core)
        fd_r = jnp.where(refl_, base_r * diff_core, zero)
        fd_g = jnp.where(refl_, base_g * diff_core, zero)
        fd_b = jnp.where(refl_, base_b * diff_core, zero)
        fg_r = jnp.where(refl_, fr_r * spec_core + coat_core, zero)
        fg_g = jnp.where(refl_, fr_g * spec_core + coat_core, zero)
        fg_b = jnp.where(refl_, fr_b * spec_core + coat_core, zero)
        pdf_ = p_d * cos_i_c_ / PI + p_g * ggx_d * nh / jnp.maximum(4.0 * oh, 1e-9)
        if adv:
            pdf_ = pdf_ + p_c * dc_ * nh / jnp.maximum(4.0 * oh, 1e-9)
        pdf_ = jnp.where(refl_, pdf_, zero)
        return fd_r, fd_g, fd_b, fg_r, fg_g, fg_b, pdf_

    fd_r, fd_g, fd_b, fg_r, fg_g, fg_b, pdf = eval_lobes(wix, wiy, wiz)
    f_r = fd_r + fg_r
    f_g = fd_g + fg_g
    f_b = fd_b + fg_b
    cos_i = wiz

    inv_pdf = jnp.where(pdf > 1e-12, 1.0 / jnp.maximum(pdf, 1e-12), 0.0)
    bop_r = f_r * inv_pdf
    bop_g = f_g * inv_pdf
    bop_b = f_b * inv_pdf

    # transmission: straight through, Fresnel-weighted (render/bsdf.py);
    # adv thick surfaces use the self-contained interface lobe's white
    # weight (G2/G1 Smith shadowing; tint rides Beer-Lambert absorption)
    cos_o_c = jnp.maximum(woz, 0.0)
    mtr = jnp.clip(1.0 - cos_o_c, 0.0, 1.0)
    tr5 = (mtr * mtr) ** 2 * mtr
    inv_pt = jnp.where(p_t > 1e-12, 1.0 / jnp.maximum(p_t, 1e-12), 0.0)
    thin_w_r = transm * (1.0 - (f0r + (1.0 - f0r) * tr5)) * inv_pt
    thin_w_g = transm * (1.0 - (f0g + (1.0 - f0g) * tr5)) * inv_pt
    thin_w_b = transm * (1.0 - (f0b + (1.0 - f0b) * tr5)) * inv_pt
    if adv:
        awz = jnp.maximum(jnp.abs(wiz), 1e-6)
        g1_wi = 2.0 * awz / (awz + jnp.sqrt(alpha2 + (1.0 - alpha2)
                                            * awz * awz))
        thick_w = transm * g1_wi * inv_pt
        thin_sel = thinw > 0.5
        bop_r = jnp.where(pick_t,
                          jnp.where(thin_sel, thin_w_r, thick_w), bop_r)
        bop_g = jnp.where(pick_t,
                          jnp.where(thin_sel, thin_w_g, thick_w), bop_g)
        bop_b = jnp.where(pick_t,
                          jnp.where(thin_sel, thin_w_b, thick_w), bop_b)
        valid_t = (p_t > 0.0) & (thin_sel | refl_pick | (k_t > 0.0))
    else:
        bop_r = jnp.where(pick_t, thin_w_r, bop_r)
        bop_g = jnp.where(pick_t, thin_w_g, bop_g)
        bop_b = jnp.where(pick_t, thin_w_b, bop_b)
        valid_t = p_t > 0.0

    # (no jnp.where on booleans: Mosaic lacks i1 select)
    valid = (pick_t & valid_t) | (
        ~pick_t & (pdf > 1e-12) & (cos_i > 0.0) & (woz > 0.0))
    bop_r = jnp.where(valid, bop_r, 0.0)
    bop_g = jnp.where(valid, bop_g, 0.0)
    bop_b = jnp.where(valid, bop_b, 0.0)

    # world-space wi
    k2x = wix * t1x + wiy * t2x + wiz * nx
    k2y = wix * t1y + wiy * t2y + wiz * ny
    k2z = wix * t1z + wiy * t2z + wiz * nz

    tpx = jnp.where(hit, tpx * bop_r, tpx)
    tpy = jnp.where(hit, tpy * bop_g, tpy)
    tpz = jnp.where(hit, tpz * bop_b, tpz)

    # new origin with scale-adaptive offset along the (signed) geom normal
    # (adv: a Fresnel-reflected thick-glass sample stays on the front side)
    if adv:
        crossing = pick_t & (thin_sel | ~refl_pick)
    else:
        crossing = pick_t
    osign = jnp.where(crossing, -1.0, 1.0)
    ulp = jnp.float32(2.0 ** -16)
    feps = jnp.float32(1.0 / 65536.0)
    offx = gnx * osign * jnp.maximum(jnp.abs(posx) * ulp, feps)
    offy = gny * osign * jnp.maximum(jnp.abs(posy) * ulp, feps)
    offz = gnz * osign * jnp.maximum(jnp.abs(posz) * ulp, feps)
    ox = jnp.where(hit, posx + offx, ox)
    oy = jnp.where(hit, posy + offy, oy)
    oz = jnp.where(hit, posz + offz, oz)
    dx = jnp.where(hit, k2x, dx)
    dy = jnp.where(hit, k2y, dy)
    dz = jnp.where(hit, k2z, dz)

    if vol is not None:
        # ---- volume walk step (rgen:461-477 + miss stepVolume) ----
        # non-hit rays keep their ORIGINAL origin/direction through the
        # where(hit, ...) updates above, so step math reads them directly
        step = vol["step"]
        ts = vol["t_sample"]
        dm_s = ts * params_ref[P_METERS]
        ms_r, ms_g, ms_b = vol["ms"]
        vt_r, vt_g, vt_b = vol["mt"]
        p3_r, p3_g, p3_b = vol["p3"]
        trv_r = jnp.exp(-vt_r * dm_s)
        trv_g = jnp.exp(-vt_g * dm_s)
        trv_b = jnp.exp(-vt_b * dm_s)
        pdf_w = jnp.maximum(p3_r * vt_r * trv_r + p3_g * vt_g * trv_g
                            + p3_b * vt_b * trv_b, 1e-20)
        tpx = jnp.where(step, tpx * ms_r * trv_r / pdf_w, tpx)
        tpy = jnp.where(step, tpy * ms_g * trv_g / pdf_w, tpy)
        tpz = jnp.where(step, tpz * ms_b * trv_b / pdf_w, tpz)
        ox = jnp.where(step, ox + dx * ts, ox)
        oy = jnp.where(step, oy + dy * ts, oy)
        oz = jnp.where(step, oz + dz * ts, oz)
        # Henyey-Greenstein phase around the current direction
        rng_h1, xh0 = _pcg_next(rng)
        rng_h2, xh1 = _pcg_next(rng_h1)
        rng = jnp.where(step, rng_h2, rng)
        g_hg = vol["gbias"]
        iso = jnp.abs(g_hg) < 1e-3
        sq_hg = (1.0 - g_hg * g_hg) / jnp.maximum(
            1.0 - g_hg + 2.0 * g_hg * xh0, 1e-9)
        g_safe = jnp.where(jnp.abs(g_hg) < 1e-9, 1.0, g_hg)
        cos_hg = jnp.where(iso, 1.0 - 2.0 * xh0,
                           (1.0 + g_hg * g_hg - sq_hg * sq_hg)
                           / (2.0 * g_safe))
        cos_hg = jnp.clip(cos_hg, -1.0, 1.0)
        sin_hg = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_hg * cos_hg))
        phi_hg = 2.0 * PI * xh1
        vsign = jnp.where(dz >= 0.0, 1.0, -1.0)
        va_o = -1.0 / (vsign + dz)
        vb_o = dx * dy * va_o
        v1x = 1.0 + vsign * dx * dx * va_o
        v1y = vsign * vb_o
        v1z = -vsign * dx
        v2x = vb_o
        v2y = vsign + dy * dy * va_o
        v2z = -dy
        shx = sin_hg * jnp.cos(phi_hg)
        shy = sin_hg * jnp.sin(phi_hg)
        sc_x = v1x * shx + v2x * shy + dx * cos_hg
        sc_y = v1y * shx + v2y * shy + dy * cos_hg
        sc_z = v1z * shx + v2z * shy + dz * cos_hg
        dx = jnp.where(step, sc_x, dx)
        dy = jnp.where(step, sc_y, dy)
        dz = jnp.where(step, sc_z, dz)

    # ---- NEE (rp_main.chit sampleLight:30-129 + rgen:397-438) ----
    shadow_count = jnp.zeros_like(radx)
    if nee:
        nee_able = hit & valid & ~pick_t
        rng_n1, k0 = _pcg_next(rng)
        rng_n2, k1 = _pcg_next(rng_n1)
        rng_n3, k2l = _pcg_next(rng_n2)
        rng_n4, k3 = _pcg_next(rng_n3)
        rng = jnp.where(nee_able, rng_n4, rng)

        if static.light_types:
            (ldx, ldy, ldz, ldist, pw_r, pw_g, pw_b, ipdf_l, ds0, ds1) = \
                _sample_lights_fused(light_ref, static.light_types,
                                     k0, k1, k2l, k3, posx, posy, posz)
            pw_scale = params_ref[P_LIGHT_MULT] * params_ref[P_EXP2_EXPOSURE]
            pw_r = pw_r * pw_scale
            pw_g = pw_g * pw_scale
            pw_b = pw_b * pw_scale
            ipdf_l = ipdf_l * float(len(static.light_types))

            # evaluate the BSDF toward the light (local frame)
            lwx = ldx * t1x + ldy * t1y + ldz * t1z
            lwy = ldx * t2x + ldy * t2y + ldz * t2z
            lwz = ldx * nx + ldy * ny + ldz * nz
            efd_r, efd_g, efd_b, efg_r, efg_g, efg_b, epdf = eval_lobes(lwx, lwy, lwz)

            gdot = ldx * gnx + ldy * gny + ldz * gnz
            nee_valid = nee_able & (ldist > 0.0) & (gdot > 0.0) & (epdf > 0.0)

            # reference quirk: throughput here includes this bounce's
            # bsdf_over_pdf (rp_main.chit:360-389 then :393-444)
            c_r = tpx * pw_r * ipdf_l * (efd_r * ds0 + efg_r * ds1)
            c_g = tpy * pw_g * ipdf_l * (efd_g * ds0 + efg_g * ds1)
            c_b = tpz * pw_b * ipdf_l * (efd_b * ds0 + efg_b * ds1)
            c_r = jnp.where(nee_valid, c_r, 0.0)
            c_g = jnp.where(nee_valid, c_g, 0.0)
            c_b = jnp.where(nee_valid, c_b, 0.0)
            lum_c = 0.2126 * c_r + 0.7152 * c_g + 0.0722 * c_b
            do_trace = (lum_c > 1e-6) & (ldist > 1e-9)

            # shadow occlusion from the offset origin toward the light
            if static.clustered:
                acc, cache, occ128, _clus, _attrs = _clu_scratch_views(
                    scratch, static)
                _trace_clustered_occluded(
                    tri_ref, l1_ref, l2_ref, cache, occ128, acc,
                    ox, oy, oz, ldx, ldy, ldz, ldist, do_trace, rng,
                    n_l1=static.n_l1, cutout=static.cutout, inst=inst)
                occluded = acc[0] > 0.5
            else:
                def tread2(row, t):
                    return tri_ref[row, t]

                if static.cutout:
                    skey = rng ^ jnp.uint32(0x5BD1E995)
                    # shadow row: textured materials carry UV-mean opacity
                    opac_row = tr_opac_sh_row(static.tangents)

                # f32 0/1 carry: Mosaic cannot legalize i1 vector loop carries
                def occl_body(t, occ):
                    tt, _u, _v, ok = _tri_hit_test(
                        tread2, t, ox, oy, oz, ldx, ldy, ldz, SHADOW_TMIN)
                    if static.cutout:
                        xi = _cutout_xi8(skey, t.astype(jnp.uint32))
                        ok = ok & (xi < tread2(opac_row, t))
                    return jnp.maximum(occ, (ok & (tt < ldist)).astype(jnp.float32))

                occluded = jax.lax.fori_loop(
                    0, static.n_tris, occl_body,
                    jnp.zeros_like(radx)) > 0.5

            add = do_trace & ~occluded
            radx = radx + jnp.where(add, c_r, 0.0)
            rady = rady + jnp.where(add, c_g, 0.0)
            radz = radz + jnp.where(add, c_b, 0.0)
            shadow_count = do_trace.astype(jnp.float32)

    # ---- termination: miss, absorb, throughput cutoff, russian roulette ----
    terminate = miss | (hit & ~valid)
    tp_len2 = tpx * tpx + tpy * tpy + tpz * tpz
    terminate = terminate | (alive & (tp_len2 < 1e-18))

    do_rr = alive & (bounce > params_ref[P_RR_OFFSET])
    rng_rr, krr = _pcg_next(rng)
    rng = jnp.where(do_rr, rng_rr, rng)
    max_tp = jnp.maximum(tpx, jnp.maximum(tpy, tpz))
    p_rr = jnp.minimum(max_tp, params_ref[P_RR_INV_MIN])
    rr_kill = do_rr & (krr > p_rr)
    # the ~miss guard keeps the throughput rows equal to the AT-MISS value,
    # which the XLA dome post-pass multiplies into the dome radiance; the
    # general integrator applies the dome before RR for the same effect
    rr_scale = jnp.where(do_rr & ~rr_kill & ~miss, 1.0 / jnp.maximum(p_rr, 1e-20), 1.0)
    tpx, tpy, tpz = tpx * rr_scale, tpy * rr_scale, tpz * rr_scale
    terminate = terminate | rr_kill

    new_alive = alive & ~terminate
    alive_out = new_alive.astype(jnp.float32)
    if static.volumes:
        # toggle the medium on transmission through non-thin-walled surfaces
        # (integrator stack==0: medium_idx = 1 - medium_idx); adv: only a
        # REFRACTED sample crosses the interface. f32 0/1 math: Mosaic
        # cannot select on i1 vectors
        if adv:
            toggled = hit & valid & pick_t & (thinw <= 0.5) & ~refl_pick
        else:
            toggled = hit & valid & pick_t & (thinw <= 0.5)
        inside_f = jnp.where(inside, 1.0, 0.0)
        inside_new = jnp.where(toggled, 1.0 - inside_f, inside_f)
        if vol is not None:
            # scatter encoding: alive = 2 + medium material id + 64 * walk.
            # Entering stores the hit material as the medium and resets
            # the walk (chit:478); a walk step increments it.
            entering = toggled & front
            mid_new = jnp.where(
                entering, jnp.clip(jnp.round(hit_mat_f), 0.0, 63.0),
                vol["mid_f"])
            walk_new = jnp.where(
                toggled, 0.0,
                jnp.where(vol["step"], vol["walk_f"] + 1.0, vol["walk_f"]))
            enc_new = 2.0 + mid_new + 64.0 * walk_new
            alive_out = jnp.where(new_alive & (inside_new > 0.5),
                                  enc_new, alive_out)
        else:
            alive_out = jnp.where(new_alive & (inside_new > 0.5), 2.0,
                                  alive_out)

    out_ref[0] = ox
    out_ref[1] = oy
    out_ref[2] = oz
    out_ref[3] = dx
    out_ref[4] = dy
    out_ref[5] = dz
    out_ref[6] = tpx
    out_ref[7] = tpy
    out_ref[8] = tpz
    out_ref[9] = radx
    out_ref[10] = rady
    out_ref[11] = radz
    out_ref[12] = jax.lax.bitcast_convert_type(rng, jnp.float32)
    out_ref[13] = alive_out
    out_ref[14] = miss_rec
    # traced-segment accounting: one segment per alive ray this bounce
    # (the volume encodings ride alive_f > 1, so count the MASK, not the
    # row value) plus NEE shadow rays
    out_ref[15] = s15 + jnp.where(alive, 1.0, 0.0) + shadow_count


def _sample_lights_fused(light_ref, light_types, k0, k1, k2, k3,
                         posx, posy, posz):
    """Per-slot light sampling, generated from the static type list.

    Reproduces render/lights.py sample_light slot-for-slot: the type is
    chosen by k0 against the cumulative type counts, the slot within the
    type by k1 — with every slot evaluated and masked (uniform control
    flow). Returns (dir xyz, dist, power rgb, inv_pdf, ds0, ds1); the caller
    applies the intensity multiplier, exposure and the *total-count factor.
    """
    counts = [0, 0, 0, 0]
    for t in light_types:
        counts[t] += 1
    total = float(len(light_types))
    cs = float(counts[LT_SPHERE])
    cd = float(counts[LT_DISTANT])
    cr = float(counts[LT_RECT])

    pick = k0 * total
    is_sph = pick <= cs
    is_dst = (~is_sph) & (pick <= cs + cd)
    is_rct = (~is_sph) & (~is_dst) & (pick <= cs + cd + cr)
    is_dsk = (~is_sph) & (~is_dst) & (~is_rct)
    type_mask = {LT_SPHERE: is_sph, LT_DISTANT: is_dst, LT_RECT: is_rct, LT_DISK: is_dsk}

    # within-type slot index (render/lights.py idx())
    within = {}
    for t in (LT_SPHERE, LT_DISTANT, LT_RECT, LT_DISK):
        c = counts[t]
        if c > 1:
            within[t] = jnp.minimum((k1 * float(c)).astype(jnp.int32), c - 1)

    z = jnp.zeros_like(k0)
    ldx, ldy, ldz, ldist = z, z, z, z
    pw_r, pw_g, pw_b = z, z, z
    ipdf, ds0, ds1 = z, z, z

    seen = [0, 0, 0, 0]
    for l, t in enumerate(light_types):
        j = seen[t]
        seen[t] += 1
        mask = type_mask[t]
        if counts[t] > 1:
            mask = mask & (within[t] == j)

        g = lambda c: light_ref[l, c]  # noqa: E731

        if t == LT_SPHERE:
            # chit:33-53 / lights.py:197-210
            a_s = 1.0 - 2.0 * k2
            b_s = jnp.sqrt(jnp.maximum(0.0, 1.0 - a_s * a_s))
            phi = 2.0 * PI * k3
            lx = b_s * jnp.cos(phi) * g(3)
            ly = b_s * jnp.sin(phi) * g(4)
            lz = a_s * g(5)
            vx = g(0) + lx - posx
            vy = g(1) + ly - posy
            vz = g(2) + lz - posz
            dist = jnp.sqrt(vx * vx + vy * vy + vz * vz)
            inv_d = jnp.where(dist > 0.0, 1.0 / jnp.maximum(dist, 1e-30), 0.0)
            sdx, sdy, sdz = vx * inv_d, vy * inv_d, vz * inv_d
            nl = jnp.sqrt(lx * lx + ly * ly + lz * lz)
            inv_nl = jnp.where(nl > 0.0, 1.0 / jnp.maximum(nl, 1e-30), 0.0)
            cosl = jnp.maximum(0.0, -(sdx * lx + sdy * ly + sdz * lz) * inv_nl)
            area = g(9)
            num = jnp.where(area > 0.0, area * cosl, 1.0)
            d2 = dist * dist
            s_ipdf = jnp.where(d2 > 0.0, num / jnp.maximum(d2, 1e-30), 0.0)
        elif t == LT_DISTANT:
            # chit:55-78 / lights.py:213-226
            phi = k2 * 2.0 * PI - PI
            theta = k3 * g(9)
            st_, ct_ = jnp.sin(theta), jnp.cos(theta)
            cp_, sp_ = jnp.cos(phi), jnp.sin(phi)
            px_ = st_ * (cp_ * g(3) + sp_ * g(6)) + ct_ * g(0)
            py_ = st_ * (cp_ * g(4) + sp_ * g(7)) + ct_ * g(1)
            pz_ = st_ * (cp_ * g(5) + sp_ * g(8)) + ct_ * g(2)
            pinv = jax.lax.rsqrt(jnp.maximum(px_ * px_ + py_ * py_ + pz_ * pz_, 1e-40))
            has_angle = g(9) > 0.0
            sdx = jnp.where(has_angle, px_ * pinv, g(0) + 0.0 * k2)
            sdy = jnp.where(has_angle, py_ * pinv, g(1) + 0.0 * k2)
            sdz = jnp.where(has_angle, pz_ * pinv, g(2) + 0.0 * k2)
            dist = jnp.full_like(k2, 100000.0)
            s_ipdf = g(10) + 0.0 * k2
        else:
            # rect chit:80-105 / disk chit:107-127
            if t == LT_RECT:
                on0 = (k2 - 0.5) * g(9)
                on1 = (k3 - 0.5) * g(10)
                area = g(9) * g(10)
            else:
                a_ = 2.0 * k2 - 1.0
                b_ = 2.0 * k3 - 1.0
                use_a = (a_ * a_) > (b_ * b_)
                r0 = jnp.where(use_a, g(9) * a_, g(9) * b_)
                r1_ = jnp.where(use_a, g(10) * a_, g(10) * b_)
                ba = jnp.where(a_ == 0.0, 0.0, b_ / jnp.where(a_ == 0.0, 1.0, a_))
                ab = jnp.where(b_ == 0.0, 0.0, a_ / jnp.where(b_ == 0.0, 1.0, b_))
                phi = jnp.where(use_a, (PI / 4.0) * ba, (PI / 2.0) - (PI / 4.0) * ab)
                on0 = r0 * jnp.cos(phi)
                on1 = r1_ * jnp.sin(phi)
                area = g(9) * g(10) * PI
            sx_ = g(0) + on0 * g(3) + on1 * g(6)
            sy_ = g(1) + on0 * g(4) + on1 * g(7)
            sz_ = g(2) + on0 * g(5) + on1 * g(8)
            vx = sx_ - posx
            vy = sy_ - posy
            vz = sz_ - posz
            dist = jnp.sqrt(vx * vx + vy * vy + vz * vz)
            inv_d = jnp.where(dist > 0.0, 1.0 / jnp.maximum(dist, 1e-30), 0.0)
            sdx, sdy, sdz = vx * inv_d, vy * inv_d, vz * inv_d
            cosl = jnp.maximum(0.0, -(sdx * g(11) + sdy * g(12) + sdz * g(13)))
            num = jnp.where(area > 0.0, area * cosl, 1.0)
            d2 = dist * dist
            s_ipdf = jnp.where(d2 > 0.0, num / jnp.maximum(d2, 1e-30), 0.0)

        ldx = jnp.where(mask, sdx, ldx)
        ldy = jnp.where(mask, sdy, ldy)
        ldz = jnp.where(mask, sdz, ldz)
        ldist = jnp.where(mask, dist, ldist)
        pw_r = jnp.where(mask, g(14) + 0.0 * k0, pw_r)
        pw_g = jnp.where(mask, g(15) + 0.0 * k0, pw_g)
        pw_b = jnp.where(mask, g(16) + 0.0 * k0, pw_b)
        ipdf = jnp.where(mask, s_ipdf, ipdf)
        ds0 = jnp.where(mask, g(17) + 0.0 * k0, ds0)
        ds1 = jnp.where(mask, g(18) + 0.0 * k0, ds1)

    return ldx, ldy, ldz, ldist, pw_r, pw_g, pw_b, ipdf, ds0, ds1


# ---------------------------------------------------------------------------
# host-side dispatch
# ---------------------------------------------------------------------------

def pack_state(origins, dirs, rng, r_pad: int):
    """[R,3]x2 + [R] u32 -> [16, r_pad/128, 128] kernel state."""
    r = origins.shape[0]

    def comp(x, fill=0.0):
        x = jnp.pad(x, (0, r_pad - r), constant_values=fill)
        return x.reshape(r_pad // 128, 128)

    rows = [
        comp(origins[:, 0]), comp(origins[:, 1]), comp(origins[:, 2]),
        comp(dirs[:, 0]), comp(dirs[:, 1]), comp(dirs[:, 2]),
        comp(jnp.ones((r,), jnp.float32)), comp(jnp.ones((r,), jnp.float32)),
        comp(jnp.ones((r,), jnp.float32)),
        comp(jnp.zeros((r,), jnp.float32)), comp(jnp.zeros((r,), jnp.float32)),
        comp(jnp.zeros((r,), jnp.float32)),
        comp(jax.lax.bitcast_convert_type(rng, jnp.float32)),
        comp(jnp.ones((r,), jnp.float32)),  # alive (padding stays 0 = dead)
        comp(jnp.zeros((r,), jnp.float32)),  # miss record
        comp(jnp.zeros((r,), jnp.float32)),  # traced-segment counter
    ]
    return jnp.stack(rows, axis=0)


def unpack_rows(state, first_row: int, n_rows: int, r: int):
    """[16, r_pad/128, 128] -> [r, n_rows] slice of state rows."""
    rows = state[first_row:first_row + n_rows]
    return rows.reshape(n_rows, -1)[:, :r].T


def unpack_radiance(state, r: int):
    return unpack_rows(state, 9, 3, r)



def _eff_block_rows(static: FusedStatic, nb: int) -> int:
    """Effective kernel block rows: static.block_rows clamped to the state
    and forced to divide it exactly (small test states pad to 1024 rays =
    8 chunks, below the resident default of 16). Mosaic requires block
    sublane extents that are multiples of 8, and a grid that tiles the
    array exactly — callers must pad the ray state to a multiple of 1024
    rays (pack_state's r_pad contract)."""
    br = min(static.block_rows, nb)
    br -= br % 8
    while br >= 8 and nb % br:
        br -= 8
    if br < 8:
        raise ValueError(
            f"ray state of {nb} chunks is not a multiple of 8 (1024 rays); "
            "pad with pack_state(..., r_pad) first")
    return br


def _inst_specs_args(static: FusedStatic, scene: FusedScene):
    """in_specs + args for the instance tables (instanced mode only)."""
    if not static.instanced:
        return [], ()
    return [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # inst transforms [n_l1, 16]
        pl.BlockSpec(memory_space=pltpu.SMEM),  # entry -> unique cluster
        pl.BlockSpec(memory_space=pltpu.VMEM),  # pass-2 gather rows
        pl.BlockSpec(memory_space=pltpu.VMEM),  # m24 hi/lo transforms
    ], (scene.inst_smem, scene.inst_map, scene.inst_attr, scene.inst_m24)


def _plan_specs(static: FusedStatic):
    """in_specs + per-block index maps for the XLA-computed walk plan."""
    c_pad = static.n_l1 * L1_FAN
    plan_len = 2 * static.n_l1 + c_pad * (2 if _FAN_SORT else 1)
    return [
        pl.BlockSpec((1, 1, plan_len), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),  # order | dists | ten2 [| fan]
        pl.BlockSpec(memory_space=pltpu.SMEM),  # global scene box [8]
        pl.BlockSpec((1, 3, RAY_BLOCK, 8), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),  # transposed ray matrix
    ]


@partial(jax.jit, static_argnames=("static", "nee"))
def bounce_step(params, scene: FusedScene, state, *, static: FusedStatic, nee: bool):
    """One fused bounce over the whole ray state [16, R/128, 128]."""
    br = _eff_block_rows(static, state.shape[1])
    n_blocks = state.shape[1] // br
    kernel = partial(_bounce_kernel, static=static, nee=nee)
    plan_specs: list = []
    plan_args: tuple = ()
    # non-clustered: triangle table lives in SMEM — the kernel reads
    # per-triangle SCALARS broadcast against the whole ray block, and only
    # SMEM supports dynamic scalar indexing
    tri_spec, scratch_shapes = _tri_specs(static)
    inst_specs, inst_args = _inst_specs_args(static, scene)
    if static.clustered:
        plan_args = _cluster_walk_plan(state, scene.l1_aabbs, scene.l2_aabbs)
        plan_specs = _plan_specs(static)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params
            tri_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),  # materials
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lights
            pl.BlockSpec(memory_space=pltpu.SMEM),  # L1 AABBs
            pl.BlockSpec(memory_space=pltpu.SMEM),  # L2 AABBs
            *inst_specs,
            *plan_specs,
            _block_spec(STATE_ROWS, br),
        ],
        out_specs=_block_spec(STATE_ROWS, br),
        out_shape=jax.ShapeDtypeStruct(state.shape, jnp.float32),
        input_output_aliases={6 + len(inst_specs) + len(plan_specs): 0},
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # the group cache + [1024,384] matmul temporaries exceed the
            # default 16M scoped-vmem budget in clustered mode
            vmem_limit_bytes=_clu_vmem_limit(static),
        ),
    )(params, scene.tris, scene.mats, scene.lights,
      scene.l1_aabbs, scene.l2_aabbs, *inst_args, *plan_args, state)




# ---------------------------------------------------------------------------
# split-bounce textured mode: trace and shade as separate kernels
# ---------------------------------------------------------------------------

def _trace_kernel(params_ref, tri_ref, l1_ref, l2_ref, *rest,
                  static: FusedStatic, xla_p2: bool = False):
    inst = None
    if static.instanced:
        inst_smem_ref, inst_map_ref, inst_attr_ref, inst_m24_ref, *rest = rest
        inst = (inst_smem_ref, inst_map_ref, inst_attr_ref, inst_m24_ref)
    if static.clustered:
        (plan_ref, gbox_ref, lhs_ref,
         state_ref, hit_ref, *scratch) = rest
    else:
        state_ref, hit_ref, *scratch = rest
    any_alive = jnp.max(state_ref[13]) > 0.5

    @pl.when(jnp.logical_not(any_alive))
    def _():
        hit_ref[...] = jnp.zeros_like(hit_ref)

    @pl.when(any_alive)
    def _():
        s = lambda c: state_ref[c]  # noqa: E731
        ox, oy, oz = s(0), s(1), s(2)
        dx, dy, dz = s(3), s(4), s(5)
        alive = s(13) > 0.5
        alive_f = s(13)
        tmin = params_ref[P_TMIN]

        if static.clustered and xla_p2:
            # slim winner output: [0]=win tri id, [1]=pass-1 best t (scene
            # exit cap for misses); _finalize_hits builds the real hitbuf
            acc, cache, best128, clus128, attrs_acc = _clu_scratch_views(
                scratch, static)
            _trace_clustered_matrix(
                tri_ref, l1_ref, l2_ref, plan_ref,
                gbox_ref, lhs_ref, cache, best128, clus128, attrs_acc, acc,
                ox, oy, oz, dx, dy, dz, tmin, alive_f, n_l1=static.n_l1,
                cutout=static.cutout, inst=inst, skip_p2=True)
            hit_ref[0] = acc[3]
            hit_ref[1] = acc[0]
            for pad_row in range(2, hit_ref.shape[0]):
                hit_ref[pad_row] = jnp.zeros(hit_ref.shape[1:], jnp.float32)
            return

        if static.clustered:
            acc, cache, best128, clus128, attrs_acc = _clu_scratch_views(
                scratch, static)
            _trace_clustered_matrix(
                tri_ref, l1_ref, l2_ref, plan_ref,
                gbox_ref, lhs_ref, cache, best128, clus128, attrs_acc, acc,
                ox, oy, oz, dx, dy, dz, tmin, alive_f, n_l1=static.n_l1,
                want_uv=True, tangents=static.tangents,
                cutout=static.cutout, inst=inst)
            best_t, u, v = acc[0], acc[1], acc[2]
            (gnx, gny, gnz, n0x, n0y, n0z,
             n1x, n1y, n1z, n2x, n2y, n2z, mat_f, dsided) = tuple(
                acc[4 + i] for i in range(14))
            uvx, uvy = acc[18], acc[19]
            if static.tangents:
                tnx, tny, tnz, tbs = acc[20], acc[21], acc[22], acc[23]
            hit = alive & (acc[3] >= 0.0)
        else:
            def tread(row, t):
                return tri_ref[row, t]

            cut_arg = None
            if static.cutout:
                cut_arg = (jax.lax.bitcast_convert_type(s(12), jnp.uint32),
                           tr_opac_row(static.tangents))
            body = _closest_body_factory(tread, ox, oy, oz, dx, dy, dz, tmin,
                                         want_uv=True,
                                         want_tan=static.tangents,
                                         cutout=cut_arg)
            carry = jax.lax.fori_loop(
                0, static.n_tris, body,
                _hit_carry_init(ox.shape, want_uv=True,
                                want_tan=static.tangents))
            (best_t, u, v, gnx, gny, gnz, n0x, n0y, n0z,
             n1x, n1y, n1z, n2x, n2y, n2z, mat_f, dsided,
             uvx, uvy) = carry[:19]
            if static.tangents:
                tnx, tny, tnz, tbs = carry[19:23]
            hit = alive & (best_t < FLOAT_MAX)

        posx = ox + best_t * dx
        posy = oy + best_t * dy
        posz = oz + best_t * dz
        w = 1.0 - u - v
        nx = w * n0x + u * n1x + v * n2x
        ny = w * n0y + u * n1y + v * n2y
        nz = w * n0z + u * n1z + v * n2z
        nlen = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-20))
        nx, ny, nz = nx * nlen, ny * nlen, nz * nlen
        front = (gnx * -dx + gny * -dy + gnz * -dz) >= 0.0
        fsign = jnp.where(front, 1.0, -1.0)

        hit_ref[H_HIT] = hit.astype(jnp.float32)
        hit_ref[H_T] = best_t
        hit_ref[H_UVX] = uvx
        hit_ref[H_UVY] = uvy
        hit_ref[H_MAT] = mat_f
        hit_ref[H_GN + 0] = gnx * fsign
        hit_ref[H_GN + 1] = gny * fsign
        hit_ref[H_GN + 2] = gnz * fsign
        hit_ref[H_N + 0] = nx * fsign
        hit_ref[H_N + 1] = ny * fsign
        hit_ref[H_N + 2] = nz * fsign
        hit_ref[H_FRONT] = front.astype(jnp.float32)
        hit_ref[H_DS] = dsided
        hit_ref[H_POS + 0] = posx
        hit_ref[H_POS + 1] = posy
        hit_ref[H_POS + 2] = posz
        if static.tangents:
            # orthonormalize the interpolated tangent against the
            # front-flipped shading normal (integrator.py shading state);
            # the XLA stage derives the bitangent as cross(n, t) * sign
            fnx, fny, fnz = nx * fsign, ny * fsign, nz * fsign
            tdn = tnx * fnx + tny * fny + tnz * fnz
            tx = tnx - fnx * tdn
            ty = tny - fny * tdn
            tz = tnz - fnz * tdn
            tlen = jax.lax.rsqrt(jnp.maximum(tx * tx + ty * ty + tz * tz,
                                             1e-20))
            hit_ref[H_TAN + 0] = tx * tlen
            hit_ref[H_TAN + 1] = ty * tlen
            hit_ref[H_TAN + 2] = tz * tlen
            hit_ref[H_BS] = tbs
            for pad_row in range(H_BS + 1, HIT_ROWS_TAN):
                hit_ref[pad_row] = jnp.zeros(hit_ref.shape[1:], jnp.float32)


def _shade_kernel(params_ref, tri_ref, mat_ref, light_ref, l1_ref, l2_ref,
                  *rest, static: FusedStatic, nee: bool):
    inst = None
    if static.instanced:
        inst_smem_ref, inst_map_ref, inst_attr_ref, inst_m24_ref, *rest = rest
        inst = (inst_smem_ref, inst_map_ref, inst_attr_ref, inst_m24_ref)
    state_ref, hit_ref, par_ref, out_ref, *scratch = rest
    any_alive = jnp.max(state_ref[13]) > 0.5

    @pl.when(jnp.logical_not(any_alive))
    def _():
        out_ref[...] = state_ref[...]

    @pl.when(any_alive)
    def _():
        s = lambda c: state_ref[c]  # noqa: E731
        ox, oy, oz = s(0), s(1), s(2)
        dx, dy, dz = s(3), s(4), s(5)
        tpx, tpy, tpz = s(6), s(7), s(8)
        radx, rady, radz = s(9), s(10), s(11)
        rng = jax.lax.bitcast_convert_type(s(12), jnp.uint32)
        alive = s(13) > 0.5
        alive_f = s(13)

        hit = alive & (hit_ref[H_HIT] > 0.5)
        miss = alive & ~hit
        radx = radx + jnp.where(miss, tpx * params_ref[P_BG_R], 0.0)
        rady = rady + jnp.where(miss, tpy * params_ref[P_BG_G], 0.0)
        radz = radz + jnp.where(miss, tpz * params_ref[P_BG_B], 0.0)
        miss_rec = jnp.where(miss, params_ref[P_BOUNCE] + 1.0, s(14))

        # untextured params from the SMEM table; textured ones (per the
        # static slim layout) override from the XLA stage's parbuf rows
        (base_r, base_g, base_b, metallic, roughness, ior,
         em_r, em_g, em_b, transm, thinw, bf_edf,
         va_r, va_g, va_b, coat, coat_rough, aniso, aniso_rot) = \
            _resolve_material_rows(
                mat_ref, hit_ref[H_MAT], static.n_mats, static.volumes,
                static.advanced)
        for name, row in slim_param_layout(static.textured_params):
            if name == "base_color":
                base_r, base_g, base_b = (par_ref[row], par_ref[row + 1],
                                          par_ref[row + 2])
            elif name == "emissive":
                em_r, em_g, em_b = (par_ref[row], par_ref[row + 1],
                                    par_ref[row + 2])
            elif name == "metallic":
                metallic = par_ref[row]
            elif name == "roughness":
                roughness = par_ref[row]

        _shade_core(
            params_ref, tri_ref, light_ref, l1_ref, l2_ref, out_ref, scratch,
            static, nee, inst=inst,
            s15=s(15), ox=ox, oy=oy, oz=oz, dx=dx, dy=dy, dz=dz,
            tpx=tpx, tpy=tpy, tpz=tpz, radx=radx, rady=rady, radz=radz,
            rng=rng, alive=alive, alive_f=alive_f, hit=hit, miss=miss,
            miss_rec=miss_rec,
            posx=hit_ref[H_POS + 0], posy=hit_ref[H_POS + 1], posz=hit_ref[H_POS + 2],
            gnx=hit_ref[H_GN + 0], gny=hit_ref[H_GN + 1], gnz=hit_ref[H_GN + 2],
            nx=hit_ref[H_N + 0], ny=hit_ref[H_N + 1], nz=hit_ref[H_N + 2],
            front=hit_ref[H_FRONT] > 0.5, dsided=hit_ref[H_DS],
            base_r=base_r, base_g=base_g, base_b=base_b, metallic=metallic,
            roughness=roughness, ior=ior, em_r=em_r, em_g=em_g, em_b=em_b,
            transm=transm, thinw=thinw, bf_edf=bf_edf,
            va_r=va_r, va_g=va_g, va_b=va_b,
            coat=coat, coat_rough=coat_rough, aniso=aniso,
            aniso_rot=aniso_rot,
            tanx=hit_ref[H_TAN + 0] if static.tangents else None,
            tany=hit_ref[H_TAN + 1] if static.tangents else None,
            tanz=hit_ref[H_TAN + 2] if static.tangents else None,
            tbs=hit_ref[H_BS] if static.tangents else None)


def _tri_specs(static: FusedStatic):
    if static.clustered:
        if static.clu_vmem:
            # whole cluster table as a VMEM input: the index map is
            # constant, so Mosaic's pipeline fetches it once per
            # pallas_call and keeps it resident across grid programs
            tri_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        else:
            tri_spec = pl.BlockSpec(memory_space=pl.ANY)
        n_rows = clu_row_count(static.tangents)
        acc_rows = CLU_ACC_ROWS_TAN if static.tangents else CLU_ACC_ROWS
        scratch_shapes = [
            pltpu.VMEM((acc_rows, BLOCK_ROWS, 128), jnp.float32),
        ]
        if not static.clu_vmem:
            scratch_shapes += [
                pltpu.VMEM((CACHE_SLOTS, L1_FAN, n_rows, 128),
                           jnp.float32),                        # group cache
                pltpu.SemaphoreType.DMA,                        # group sem
                pltpu.SMEM((CACHE_SLOTS,), jnp.int32),          # cache tags
            ]
        scratch_shapes += [
            pltpu.VMEM((RAY_BLOCK, 128), jnp.float32),          # best/lane
            pltpu.VMEM((RAY_BLOCK, 128), jnp.float32),          # cluster/lane
            pltpu.VMEM((RAY_BLOCK, n_rows), jnp.float32),       # attr matmul
        ]
    else:
        tri_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        scratch_shapes = []
    return tri_spec, scratch_shapes


def _clu_scratch_views(scratch, static: FusedStatic):
    """(acc, cache-or-None, best128, clus128, attrs_acc) from the scratch
    list laid out by _tri_specs. best128 doubles as the occlusion walk's
    per-lane flag array (the closest-hit walk is done with it by then)."""
    acc = scratch[0]
    if static.clu_vmem:
        cache = None
        best128, clus128, attrs_acc = scratch[1], scratch[2], scratch[3]
    else:
        cache = (scratch[1], scratch[2], scratch[3])
        best128, clus128, attrs_acc = scratch[4], scratch[5], scratch[6]
    return acc, cache, best128, clus128, attrs_acc


def _clu_vmem_limit(static: FusedStatic):
    """Scoped-VMEM budget: the resident cluster table (up to 56 MB) plus
    state blocks and dot temporaries; v5e has 128 MiB physical VMEM."""
    if not static.clustered:
        return None
    return 100 * 1024 * 1024 if static.clu_vmem else 64 * 1024 * 1024


def _block_spec(rows, block_rows=BLOCK_ROWS):
    return pl.BlockSpec((rows, block_rows, 128), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)


@partial(jax.jit, static_argnames=("static",))
def _finalize_hits(scene: FusedScene, state, winbuf, static: FusedStatic):
    """XLA pass 2 for the split trace (GATLING_XLA_P2): per-ray gathers of
    the winner's attribute rows from the gather-major cluster table replace
    the kernel's serial candidate-list scan + one-hot matmuls. Same math as
    the in-kernel pass 2 / trace epilogue — t/u/v recomputed EXACTLY from
    the f32 rows, instance covector transforms, facing flip, tangent
    orthonormalization — so the returned hitbuf is row-for-row the
    trace_step contract."""
    chunks = state.shape[1]
    rr = chunks * 128
    ox, oy, oz = (state[i].reshape(rr) for i in range(3))
    dx, dy, dz = (state[i].reshape(rr) for i in range(3, 6))
    alive = state[13].reshape(rr) > 0.5
    win = winbuf[0].reshape(rr)
    t_pass1 = winbuf[1].reshape(rr)
    hit = alive & (win >= 0.0)
    wsafe = jnp.where(hit, win, 0.0).astype(jnp.int32)
    c = wsafe // CLUSTER_SIZE
    lane = wsafe - c * CLUSTER_SIZE

    if static.instanced:
        uc = scene.inst_map[c]
        rows = scene.tris_g[uc, lane]                     # [R, rows]
        ia = scene.inst_attr[c // L1_FAN]                 # [R, 24]
        ia = jnp.where(hit[:, None], ia, 0.0)
    else:
        rows = scene.tris_g[c, lane]
    rows = jnp.where(hit[:, None], rows, 0.0)
    r = lambda i: rows[:, i]  # noqa: E731

    def _safe(nd):
        return jnp.where(jnp.abs(nd) > 1e-20,
                         nd, jnp.where(nd >= 0.0, 1e-20, -1e-20))

    if static.instanced:
        A = lambda j, i: ia[:, 3 * j + i]  # noqa: E731 — A3[j, i]
        # local rays; t is the same parameter in both frames
        olx = ox * A(0, 0) + oy * A(1, 0) + oz * A(2, 0) + ia[:, 9]
        oly = ox * A(0, 1) + oy * A(1, 1) + oz * A(2, 1) + ia[:, 10]
        olz = ox * A(0, 2) + oy * A(1, 2) + oz * A(2, 2) + ia[:, 11]
        dlx = dx * A(0, 0) + dy * A(1, 0) + dz * A(2, 0)
        dly = dx * A(0, 1) + dy * A(1, 1) + dz * A(2, 1)
        dlz = dx * A(0, 2) + dy * A(1, 2) + dz * A(2, 2)
        ndw = r(CLU_N) * dlx + r(CLU_N + 1) * dly + r(CLU_N + 2) * dlz
        pow_ = (r(CLU_N) * olx + r(CLU_N + 1) * oly + r(CLU_N + 2) * olz
                + r(CLU_N + 3))
        t = jnp.where(hit, -pow_ / _safe(ndw), t_pass1)
        pxl = olx + t * dlx
        pyl = oly + t * dly
        pzl = olz + t * dlz
        u = (r(CLU_R1) * pxl + r(CLU_R1 + 1) * pyl + r(CLU_R1 + 2) * pzl
             + r(CLU_R1 + 3))
        v = (r(CLU_R2) * pxl + r(CLU_R2 + 1) * pyl + r(CLU_R2 + 2) * pzl
             + r(CLU_R2 + 3))
        u = jnp.where(hit, u, 0.0)
        v = jnp.where(hit, v, 0.0)

        # normals are covectors: n_w = n_l @ A3ᵀ
        def covec(r0):
            nlx, nly, nlz = r(r0), r(r0 + 1), r(r0 + 2)
            return (nlx * A(0, 0) + nly * A(0, 1) + nlz * A(0, 2),
                    nlx * A(1, 0) + nly * A(1, 1) + nlz * A(1, 2),
                    nlx * A(2, 0) + nly * A(2, 1) + nlz * A(2, 2))

        gnx, gny, gnz = covec(CLU_GN)
        glen = jax.lax.rsqrt(jnp.maximum(
            gnx * gnx + gny * gny + gnz * gnz, 1e-20))
        gnx, gny, gnz = gnx * glen, gny * glen, gnz * glen
        (n0x, n0y, n0z) = covec(CLU_N0)
        (n1x, n1y, n1z) = covec(CLU_N1)
        (n2x, n2y, n2z) = covec(CLU_N2)
        mat_f = ia[:, 12]
        dsided = ia[:, 15]

        if static.tangents:
            # tangents are VECTORS: local -> world is A^{-1} (exact
            # adjugate; A^T — the covec transform — would skew the uv
            # frame under non-uniform instance scale)
            a00, a01, a02 = A(0, 0), A(0, 1), A(0, 2)
            a10, a11, a12 = A(1, 0), A(1, 1), A(1, 2)
            a20, a21, a22 = A(2, 0), A(2, 1), A(2, 2)
            det = (a00 * (a11 * a22 - a12 * a21)
                   - a01 * (a10 * a22 - a12 * a20)
                   + a02 * (a10 * a21 - a11 * a20))
            idet = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
            i00 = (a11 * a22 - a12 * a21) * idet
            i01 = (a02 * a21 - a01 * a22) * idet
            i02 = (a01 * a12 - a02 * a11) * idet
            i10 = (a12 * a20 - a10 * a22) * idet
            i11 = (a00 * a22 - a02 * a20) * idet
            i12 = (a02 * a10 - a00 * a12) * idet
            i20 = (a10 * a21 - a11 * a20) * idet
            i21 = (a01 * a20 - a00 * a21) * idet
            i22 = (a00 * a11 - a01 * a10) * idet

            def vec_l2w(x, y, z):
                return (x * i00 + y * i10 + z * i20,
                        x * i01 + y * i11 + z * i21,
                        x * i02 + y * i12 + z * i22)
        else:
            vec_l2w = None
    else:
        ndw = r(CLU_N) * dx + r(CLU_N + 1) * dy + r(CLU_N + 2) * dz
        pow_ = (r(CLU_N) * ox + r(CLU_N + 1) * oy + r(CLU_N + 2) * oz
                + r(CLU_N + 3))
        t = jnp.where(hit, -pow_ / _safe(ndw), t_pass1)
        pxw = ox + t * dx
        pyw = oy + t * dy
        pzw = oz + t * dz
        u = (r(CLU_R1) * pxw + r(CLU_R1 + 1) * pyw + r(CLU_R1 + 2) * pzw
             + r(CLU_R1 + 3))
        v = (r(CLU_R2) * pxw + r(CLU_R2 + 1) * pyw + r(CLU_R2 + 2) * pzw
             + r(CLU_R2 + 3))
        u = jnp.where(hit, u, 0.0)
        v = jnp.where(hit, v, 0.0)
        gnx, gny, gnz = r(CLU_GN), r(CLU_GN + 1), r(CLU_GN + 2)
        n0x, n0y, n0z = r(CLU_N0), r(CLU_N0 + 1), r(CLU_N0 + 2)
        n1x, n1y, n1z = r(CLU_N1), r(CLU_N1 + 1), r(CLU_N1 + 2)
        n2x, n2y, n2z = r(CLU_N2), r(CLU_N2 + 1), r(CLU_N2 + 2)
        mat_f = r(CLU_MAT)
        dsided = r(CLU_DS)

    # trace epilogue (same math as the in-kernel finalize)
    posx = ox + t * dx
    posy = oy + t * dy
    posz = oz + t * dz
    w = 1.0 - u - v
    uvx = w * r(CLU_UV) + u * r(CLU_UV + 2) + v * r(CLU_UV + 4)
    uvy = w * r(CLU_UV + 1) + u * r(CLU_UV + 3) + v * r(CLU_UV + 5)
    nx = w * n0x + u * n1x + v * n2x
    ny = w * n0y + u * n1y + v * n2y
    nz = w * n0z + u * n1z + v * n2z
    nlen = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-20))
    nx, ny, nz = nx * nlen, ny * nlen, nz * nlen
    front = (gnx * -dx + gny * -dy + gnz * -dz) >= 0.0
    fsign = jnp.where(front, 1.0, -1.0)

    out = [hit.astype(jnp.float32), t, uvx, uvy, mat_f,
           gnx * fsign, gny * fsign, gnz * fsign,
           nx * fsign, ny * fsign, nz * fsign,
           front.astype(jnp.float32), dsided, posx, posy, posz]
    if static.tangents:
        tnx = w * r(CLU_T0) + u * r(CLU_T1) + v * r(CLU_T2)
        tny = w * r(CLU_T0 + 1) + u * r(CLU_T1 + 1) + v * r(CLU_T2 + 1)
        tnz = w * r(CLU_T0 + 2) + u * r(CLU_T1 + 2) + v * r(CLU_T2 + 2)
        tbs = w * r(CLU_BS) + u * r(CLU_BS + 1) + v * r(CLU_BS + 2)
        if static.instanced:
            tnx, tny, tnz = vec_l2w(tnx, tny, tnz)
        fnx, fny, fnz = nx * fsign, ny * fsign, nz * fsign
        tdn = tnx * fnx + tny * fny + tnz * fnz
        tx = tnx - fnx * tdn
        ty = tny - fny * tdn
        tz = tnz - fnz * tdn
        tlen = jax.lax.rsqrt(jnp.maximum(tx * tx + ty * ty + tz * tz, 1e-20))
        out += [tx * tlen, ty * tlen, tz * tlen, tbs]
        out += [jnp.zeros(rr, jnp.float32)] * (HIT_ROWS_TAN - len(out))
    return jnp.stack(out).reshape(len(out), chunks, 128)


def trace_step(params, scene: FusedScene, state, *, static: FusedStatic):
    """Textured-mode trace: closest hit + shading-state rows (no shading)."""
    br = _eff_block_rows(static, state.shape[1])
    n_blocks = state.shape[1] // br
    tri_spec, scratch_shapes = _tri_specs(static)
    xp2 = static.clustered and _XLA_P2 and scene.tris_g is not None
    kernel = partial(_trace_kernel, static=static, xla_p2=xp2)
    out_rows = 8 if xp2 else hit_row_count(static.tangents)
    plan_specs: list = []
    plan_args: tuple = ()
    if static.clustered:
        plan_args = _cluster_walk_plan(state, scene.l1_aabbs, scene.l2_aabbs)
        plan_specs = _plan_specs(static)
    inst_specs, inst_args = _inst_specs_args(static, scene)
    hitbuf = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params
            tri_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),  # L1 AABBs
            pl.BlockSpec(memory_space=pltpu.SMEM),  # L2 AABBs
            *inst_specs,
            *plan_specs,
            _block_spec(STATE_ROWS, br),
        ],
        out_specs=_block_spec(out_rows, br),
        out_shape=jax.ShapeDtypeStruct(
            (out_rows,) + state.shape[1:], jnp.float32),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_clu_vmem_limit(static),
        ),
    )(params, scene.tris, scene.l1_aabbs, scene.l2_aabbs, *inst_args,
      *plan_args, state)
    if xp2:
        return _finalize_hits(scene, state, hitbuf, static)
    return hitbuf


@partial(jax.jit, static_argnames=("static", "nee"))
def shade_step(params, scene: FusedScene, state, hitbuf, parbuf, *,
               static: FusedStatic, nee: bool):
    """Textured-mode shade: emission + BSDF + NEE shadow walk + RR, with
    per-ray material rows from the XLA texture stage."""
    br = _eff_block_rows(static, state.shape[1])
    n_blocks = state.shape[1] // br
    tri_spec, scratch_shapes = _tri_specs(static)
    kernel = partial(_shade_kernel, static=static, nee=nee)
    inst_specs, inst_args = _inst_specs_args(static, scene)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params
            tri_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),  # materials
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lights
            pl.BlockSpec(memory_space=pltpu.SMEM),  # L1 AABBs
            pl.BlockSpec(memory_space=pltpu.SMEM),  # L2 AABBs
            *inst_specs,
            _block_spec(STATE_ROWS, br),
            _block_spec(hit_row_count(static.tangents), br),
            _block_spec(slim_param_rows(static.textured_params), br),
        ],
        out_specs=_block_spec(STATE_ROWS, br),
        out_shape=jax.ShapeDtypeStruct(state.shape, jnp.float32),
        input_output_aliases={6 + len(inst_specs): 0},
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_clu_vmem_limit(static),
        ),
    )(params, scene.tris, scene.mats, scene.lights, scene.l1_aabbs,
      scene.l2_aabbs, *inst_args, state, hitbuf, parbuf)


def make_params(config, uniforms, bounce) -> jnp.ndarray:
    """Pack the per-bounce scalar parameters (SMEM vector)."""
    zero = jnp.float32(0.0)
    return jnp.stack([
        zero, zero, zero,  # constant background (dome handled in post-pass)
        uniforms.rr_inv_min_term_prob,
        jnp.float32(config.rr_bounce_offset),
        bounce.astype(jnp.float32),
        jnp.exp2(uniforms.camera.sensor_exposure),
        jnp.float32(0.0),  # tmin
        uniforms.light_intensity_multiplier,
        uniforms.meters_per_scene_unit,
        uniforms.max_volume_walk_length.astype(jnp.float32),
    ])
