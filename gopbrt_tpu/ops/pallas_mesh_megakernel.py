"""Pallas TPU MESH megakernel: the bounce loop fused with cluster traversal.

Round-3 measured the BVH-class workload (BASELINE config 3, the 10k-triangle
mesh) at 0.25-0.5 Mrays/s — 30-60x below the reference baseline — because
the jnp wavefront chain pays ~an HBM round-trip per op between bounces and
the standalone cluster intersector relaunches per query.  This kernel is
the prescribed fix (VERDICT r3 task 3b): the whole path-trace loop for
cluster-table scenes runs in ONE kernel launch, path state resident in
VMEM/registers, with the two-level cluster traversal
(ops/pallas_cluster.py's layout) inlined as the closest-hit and any-hit
inner loops.

Structure per grid step (RROWS x RB = 8192 rays):
  * the triangle table ([K*M, 16]: 9 world verts | material | area-light)
    lives whole in VMEM; cluster AABBs in SMEM; the <=32 non-triangle
    primitives ("extras": floor disks, emitter spheres) in SMEM scalars;
  * traversal runs one [1, RB] ray row at a time so the 8 sublanes carry 8
    triangles per VPU op (pallas_cluster's layout); a per-cluster slab
    test culls blocks, and any-hit shadow rows poison resolved lanes;
  * the winner's 11 attributes are resolved by a second masked sweep over
    only the clusters that contain winners (pl.when-gated), then shading,
    NEE + shadow traversal, BSDF sampling and Russian roulette all run at
    full [8, RB] width exactly like the brute megakernel;
  * supported lobes: matte (constant / planar-checker kd), PLASTIC
    (Lambert + GGX reflection — the config-3 mesh material,
    pkg/materials/plastic semantics via PBRT; reference has no plastic),
    mirror, and smooth glass.  Math mirrors ops/bsdf.py op-for-op on the
    same counter RNG streams (ops/rng.py), so per-lane radiance matches
    the jnp chain (tests/test_mesh_megakernel.py).

Gradients: path-replay backward through the jnp chain, like
``pallas_megakernel.path_li_fused``.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gopbrt_tpu.ops.geom import SHADOW_EPSILON
from gopbrt_tpu.ops.intersect import Primitives, SPHERE, DISK, TRIANGLE
from gopbrt_tpu.ops.pallas_intersect import _prim_test, _flatten_w2o
from gopbrt_tpu.ops.pallas_megakernel import (
    PI,
    _fresnel_diel,
    _ggx_d,
    _ggx_lambda,
    INV_PI,
    _hash_combine,
    _to_unit,
    _dot3,
    _cross3,
    _normalize3,
    _coord_system,
    _power_heuristic,
    _concentric_disk,
    _offset_dist,
    sphere_area_pdf_li,
    _light_tables,
    _LA_TWO,
    _LA_RAD,
)
from gopbrt_tpu.ops.rng import (
    DIM_BOUNCE_BASE,
    DIMS_PER_BOUNCE,
    D_LIGHT_PICK,
    D_LIGHT_UV,
    D_BSDF_UV,
    D_BSDF_LOBE,
    D_RR,
)

RB = 1024       # ray lanes per traversal row
RROWS = 8       # rows per grid step (f32 sublane tiling)
BLOCK = RROWS * RB
M = 128         # triangles per cluster (M=64 measured equal-or-slightly-
                # slower with the batched slab phase: member volume is not
                # the current bottleneck — BENCH_NOTES round 4)
SUB = 8         # triangles tested per VPU op
_BIG = 1e30

# profiling-only ablations (benchmarks/profile_mesh.py): comma-separated
# stage names to skip, read once at import.  Never set in production.
_ABLATE = frozenset(
    filter(None, os.environ.get("GOPBRT_MESH_ABLATE", "").split(","))
)
# phase-split octant reorder (round 5): 0 disables for A/B measurement
_REORDER = int(os.environ.get("GOPBRT_MESH_REORDER", "1"))
# re-sort the wavefront before every bounce below this index (the sorted
# order decays after each scatter); bounces >= this run in one fused tail
_RESORT_UNTIL = int(os.environ.get("GOPBRT_MESH_RESORT_UNTIL", "2"))

# triangle record columns (f32[K*M, _RC_K]), Havel-Herout precomputed-
# plane form (On Fast Construction of SAH-based Bounding Volume
# Hierarchies / "Yet Faster Ray-Triangle Intersection", Havel & Herout
# 2010 — a public-domain standard):
#   N = e1 x e2 (geometric normal, unnormalized), d_n = N.v0
#   U = (e2 x N)/|N|^2, d_u = -U.v0   ->  u = U.P + d_u
#   V = (N x e1)/|N|^2, d_v = -V.v0   ->  v = V.P + d_v
# The member test needs only 3 dot products + the plane solve (~25%
# fewer VPU ops than Moller-Trumbore from vertices), and the resolve
# sweep reads just _RC_RES leading columns: N (the normal, no cross
# needed), e1 (dpdu tangent, reflection.go:120-145 frame), material and
# area-light id.  All precomputation is f32 on the host.
_RC_N = 0       # 0-2   N
_RC_E1 = 3      # 3-5   e1 (dpdu)
_RC_MAT = 6
_RC_ALID = 7
_RC_RES = 8     # resolved attrs: N | e1 | mat | alid
_RC_DN = 8
_RC_U = 9       # 9-11  U
_RC_DU = 12
_RC_V3 = 13     # 13-15 V
_RC_DV = 16
_RC_K = 24

# per-material shade columns (SMEM f32[NM, _MS_K])
_MS_C1 = 0       # 0-2  kd constant / checker colour 1
_MS_C2 = 3       # 3-5  checker colour 2
_MS_CHK = 6      # is_checker flag
_MS_VS = 7       # 7-9  planar mapping s axis
_MS_VT = 10      # 10-12 planar mapping t axis
_MS_DS = 13      # 13-14 mapping offsets
_MS_TSS = 15     # |vs| (checker AA filter width)
_MS_TST = 16     # |vt|
_MS_MIR = 17     # mirror flag
_MS_KS = 18      # 18-20 kr (mirror) / ks (plastic GGX) / kr (glass)
_MS_GLS = 21     # smooth-glass flag
_MS_KT = 22      # 22-24 glass transmittance
_MS_ETA = 25     # dielectric IOR (glass interface / plastic fresnel)
_MS_PLA = 26     # plastic flag
_MS_ALPHA = 27   # GGX alpha (already remapped at build)
_MS_K = 28

# extras aux columns (SMEM f32[E, 3])
_EX_MAT = 0
_EX_ALID = 1
_EX_SCALE2 = 2


class MeshTables:
    """Device-side tables for the mesh megakernel (host-built per scene).

    Registered pytree riding Scene.meshkernel: triangle clusters in BVH
    leaf order + the small non-triangle "extras" tables + the per-material
    shade table.  ``order`` maps kernel winner ids (cluster slot, or
    EXTRA_BASE+e) back to original primitive ids for debugging/tests.
    """

    def __init__(self, tri, cbounds, ex_type, ex_w2o, ex_par,
                 ex_aux, mshade, order, n_clusters, n_extras, n_mats):
        self.tri = tri            # f32[K*M, _RC_K]
        self.cbounds = cbounds    # f32[K, 8]
        self.ex_type = ex_type    # i32[E]
        self.ex_w2o = ex_w2o      # f32[E, 12]
        self.ex_par = ex_par      # f32[E, 9]
        self.ex_aux = ex_aux      # f32[E, 3]
        self.mshade = mshade      # f32[NM, _MS_K]
        self.order = order        # i32[K*M + E] slot -> original prim id
        self.n_clusters = n_clusters
        self.n_extras = n_extras
        self.n_mats = n_mats

    def tree_flatten(self):
        return (
            (self.tri, self.cbounds, self.ex_type,
             self.ex_w2o, self.ex_par, self.ex_aux, self.mshade, self.order),
            (self.n_clusters, self.n_extras, self.n_mats),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


jax.tree_util.register_pytree_node(
    MeshTables, MeshTables.tree_flatten, MeshTables.tree_unflatten
)


def _mat_shade_np(scene) -> np.ndarray:
    """Per-material shade table (host; see _MS_* layout)."""
    mats = scene.materials
    tex = scene.textures
    nm = int(mats.mat_type.shape[0])
    out = np.zeros((nm, _MS_K), np.float32)
    mt = np.asarray(mats.mat_type)
    kd = np.asarray(mats.kd)
    kdt = np.asarray(mats.kd_tex)
    kr = np.asarray(mats.kr)
    kt = np.asarray(mats.kt)
    eta = np.asarray(mats.eta)
    rough = np.asarray(mats.roughness)
    ttype = np.asarray(tex.tex_type)
    v1 = np.asarray(tex.value1)
    v2 = np.asarray(tex.value2)
    vs = np.asarray(tex.vs)
    vt = np.asarray(tex.vt)
    ds = np.asarray(tex.dsdt)
    for i in range(nm):
        spec = mt[i] in (1, 2)  # MIRROR / GLASS: no diffuse lobe
        c1 = np.zeros(3) if spec else kd[i]
        c2 = c1
        chk = 0.0
        mvs = np.zeros(3)
        mvt = np.zeros(3)
        mds = np.zeros(2)
        t = int(kdt[i])
        if t >= 0 and not spec:
            if ttype[t] == 0:  # TEX_CONSTANT
                c1 = v1[t]
                c2 = c1
            else:  # TEX_CHECKERBOARD (planar — gated by mesh_ok)
                c1 = v1[t]
                c2 = v2[t]
                chk = 1.0
                mvs = vs[t]
                mvt = vt[t]
                mds = ds[t]
        out[i, _MS_C1:_MS_C1 + 3] = c1
        out[i, _MS_C2:_MS_C2 + 3] = c2
        out[i, _MS_CHK] = chk
        out[i, _MS_VS:_MS_VS + 3] = mvs
        out[i, _MS_VT:_MS_VT + 3] = mvt
        out[i, _MS_DS:_MS_DS + 2] = mds
        out[i, _MS_TSS] = float(np.linalg.norm(mvs))
        out[i, _MS_TST] = float(np.linalg.norm(mvt))
        out[i, _MS_MIR] = 1.0 if mt[i] == 1 else 0.0
        out[i, _MS_KS:_MS_KS + 3] = kr[i]
        out[i, _MS_GLS] = 1.0 if mt[i] == 2 else 0.0
        out[i, _MS_KT:_MS_KT + 3] = kt[i]
        out[i, _MS_ETA] = eta[i]
        out[i, _MS_PLA] = 1.0 if mt[i] == 3 else 0.0
        out[i, _MS_ALPHA] = max(float(rough[i]), 1e-3)
    return out


def build_mesh_tables(scene, prims: Primitives, lo: np.ndarray,
                      hi: np.ndarray, order: np.ndarray) -> MeshTables:
    """Host build: triangle-only clusters in BVH leaf order + extras.

    lo/hi: per-prim world AABBs [P,3]; order: the SAH BVH's leaf
    permutation (spatially coherent).  Non-triangle primitives become
    SMEM "extras" tested brute-force over the full block (the demo-style
    loop) — the config-3 scene has exactly 2.
    """
    ptype = np.asarray(prims.prim_type)
    params = np.asarray(prims.params)
    w2o = np.asarray(_flatten_w2o(prims))
    mat = np.asarray(prims.material_id)
    alid = np.asarray(prims.area_light_id)
    order = np.asarray(order, np.int64)
    tri_ids = order[ptype[order] == TRIANGLE]
    ex_ids = order[ptype[order] != TRIANGLE]
    nt = len(tri_ids)
    ne = len(ex_ids)
    k = max(1, -(-nt // M))
    total = k * M
    rec = np.zeros((total, _RC_K), np.float32)
    # pad rows stay all-zero: N = 0 -> |N.d| degenerate -> guaranteed miss
    p9 = params[tri_ids].astype(np.float32)
    v0 = p9[:, 0:3]
    e1 = p9[:, 3:6] - v0
    e2 = p9[:, 6:9] - v0
    nrm = np.cross(e1, e2).astype(np.float32)
    n2 = np.maximum((nrm * nrm).sum(-1, keepdims=True), 1e-30).astype(np.float32)
    uu = (np.cross(e2, nrm).astype(np.float32) / n2).astype(np.float32)
    vv = (np.cross(nrm, e1).astype(np.float32) / n2).astype(np.float32)
    rec[:nt, _RC_N:_RC_N + 3] = nrm
    rec[:nt, _RC_E1:_RC_E1 + 3] = e1
    rec[:nt, _RC_MAT] = mat[tri_ids].astype(np.float32)
    rec[:nt, _RC_ALID] = alid[tri_ids].astype(np.float32)
    rec[nt:, _RC_ALID] = -1.0
    rec[:nt, _RC_DN] = (nrm * v0).sum(-1)
    rec[:nt, _RC_U:_RC_U + 3] = uu
    rec[:nt, _RC_DU] = -(uu * v0).sum(-1)
    rec[:nt, _RC_V3:_RC_V3 + 3] = vv
    rec[:nt, _RC_DV] = -(vv * v0).sum(-1)
    cb = np.zeros((k, 8), np.float32)
    cb[:, 0:3] = 3e37
    cb[:, 3:6] = -3e37
    lo_t, hi_t = np.asarray(lo)[tri_ids], np.asarray(hi)[tri_ids]
    for c in range(k):
        a, b = c * M, min((c + 1) * M, nt)
        if a < nt:
            cb[c, 0:3] = lo_t[a:b].min(axis=0)
            cb[c, 3:6] = hi_t[a:b].max(axis=0)
    # extras: uniform-scale sigma^2 from w2o rows (norm 1/sigma)
    ex_w2o = w2o[ex_ids] if ne else np.zeros((1, 12), np.float32)
    ex_par = params[ex_ids] if ne else np.zeros((1, 9), np.float32)
    ex_type = (ptype[ex_ids] if ne else np.zeros((1,), np.int32)).astype(np.int32)
    ex_aux = np.zeros((max(ne, 1), 3), np.float32)
    if ne:
        inv_s2 = np.sum(ex_w2o[:, 0:3] * ex_w2o[:, 0:3], axis=-1)
        ex_aux[:, _EX_MAT] = mat[ex_ids]
        ex_aux[:, _EX_ALID] = alid[ex_ids]
        ex_aux[:, _EX_SCALE2] = 1.0 / np.maximum(inv_s2, 1e-30)
    else:
        ex_aux[:, _EX_ALID] = -1.0
    slot_to_prim = np.full((total + max(ne, 1),), -1, np.int32)
    slot_to_prim[:nt] = tri_ids.astype(np.int32)
    slot_to_prim[total:total + ne] = ex_ids.astype(np.int32)
    return MeshTables(
        tri=jnp.asarray(rec),
        cbounds=jnp.asarray(cb),
        ex_type=jnp.asarray(ex_type),
        ex_w2o=jnp.asarray(ex_w2o),
        ex_par=jnp.asarray(ex_par),
        ex_aux=jnp.asarray(ex_aux),
        mshade=jnp.asarray(_mat_shade_np(scene)),
        order=jnp.asarray(slot_to_prim),
        n_clusters=k,
        n_extras=ne,
        n_mats=int(scene.materials.mat_type.shape[0]),
    )


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _tri_test_h(nx, ny, nz, dn, ux, uy, uz, du, vx, vy, vz, dv,
                ox, oy, oz, dx, dy, dz, t_limit):
    """Havel-Herout plane-form ray-triangle test -> candidate t (_BIG miss).

    Same accept region as the Möller-Trumbore test the jnp chain uses
    (triangle.go:79-130 semantics: u>=0, v>=0, u+v<=1, t in range,
    |N.d| degenerate cut) — t/u/v differ from the vertex form only in
    f32 rounding, so discrete decisions flip on the rare edge lane."""
    den = nx * dx + ny * dy + nz * dz
    degen = jnp.abs(den) < 1e-12
    tt = (dn - (nx * ox + ny * oy + nz * oz)) / jnp.where(degen, 1.0, den)
    px = ox + tt * dx
    py = oy + tt * dy
    pz = oz + tt * dz
    u = ux * px + uy * py + uz * pz + du
    v = vx * px + vy * py + vz * pz + dv
    vt = (
        (~degen)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (tt > 1e-4)
        & (tt < t_limit)
    )
    return jnp.where(vt, tt, _BIG)


def _mesh_kernel(
    # static
    n_clusters, n_extras, n_mats, n_lights, n_bounces, rr_start,
    rr_threshold, ex_types, use_cone,
    # SMEM
    seed_ref, cb_ref, ext_ref, exw_ref, exp_ref, exa_ref, msh_ref,
    ltype_ref, lpos_ref, lint_ref, laux_ref, lcdf_ref, scal_ref,
    # VMEM in: rays + full path state (round 5: the bounce loop can run
    # in phases — camera bounce, then an octant reorder on the host,
    # then the remaining bounces — so state enters and leaves the kernel)
    tri_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    pix_ref, samp_ref, alive_ref,
    br_ref, bg_ref, bb_ref, lri_ref, lgi_ref, lbi_ref,
    spc_ref, ppd_ref, cwi_ref, esi_ref,
    # out: radiance + full carried state
    lr_ref, lg_ref, lb_ref,
    pox_ref, poy_ref, poz_ref, pdx_ref, pdy_ref, pdz_ref,
    pbr_ref, pbg_ref, pbb_ref, pal_ref, psp_ref, ppp_ref, pcw_ref,
    pes_ref,
    # scratch
    r_o0, r_o1, r_o2, r_d0, r_d1, r_d2, r_tm,   # ray rows for traversal
    o_t, o_slot,                                 # traversal results
    t8, i8,                                      # per-row bests [RROWS*SUB, RB]
    tc8,                                         # per-lane current min [RROWS, RB]
    acc_sc,                                      # [_RC_RES*SUB, RB] resolve
    attr_sc,                                     # [_RC_RES*RROWS, RB]
    keys_sc, ord_sc, bins_sc,                    # cluster-order scratch (SMEM)
):
    f32 = jnp.float32
    seed = seed_ref[0]
    func_int = scal_ref[0]
    world_radius = scal_ref[1]
    cone_sp = scal_ref[3]
    start_b = scal_ref[4].astype(jnp.int32)  # absolute index of bounce 0
    EXTRA_BASE = n_clusters * M

    pix = pix_ref[:]
    samp = samp_ref[:]
    h = _hash_combine(jnp.full(pix.shape, seed, jnp.uint32), pix)
    h_ps = _hash_combine(h, samp)
    sub_off = jax.lax.broadcasted_iota(jnp.int32, (SUB, RB), 0)

    def store_rays(ox, oy, oz, dx, dy, dz, tm):
        r_o0[:] = ox
        r_o1[:] = oy
        r_o2[:] = oz
        r_d0[:] = dx
        r_d1[:] = dy
        r_d2[:] = dz
        r_tm[:] = tm

    def trace_rows(any_hit):
        """Cluster traversal of the rays in r_* scratches; winners into
        o_t/o_slot.  any_hit: first accepted hit poisons the lane (see
        pallas_cluster._trace_row).

        Layout (round-4 restructure): the slab phase runs BATCHED over all
        RROWS rows as [RROWS, RB] ops — the per-row [1, RB] formulation
        left 7/8 of the VPU idle and serialized RROWS x K tiny loop
        iterations, which the depth sweep showed dominating the bounce
        cost.  Member tests stay per-row ([SUB,1] prim columns vs [1,RB]
        rays), gated per row by its slab mask; each row's running best-t
        lives in its [SUB, RB] slice of t8/i8, with a separate per-lane
        current-min (tc8) feeding the batched slab culling.

        NOTE: an 8-cluster SUPERCLUSTER pre-cull was also tried
        (pl.when(any(slab)) around a fori of pl.when member loops) and
        MISCOMPILES under Mosaic — doubly-nested predication around
        scratch mutation silently produced wrong compiled images while
        interpret mode stayed exact.  Single-level pl.when only.
        """
        OX, OY, OZ = r_o0[:], r_o1[:], r_o2[:]
        DX, DY, DZ = r_d0[:], r_d1[:], r_d2[:]
        TM = r_tm[:]
        inv = lambda v: 1.0 / jnp.where(
            jnp.abs(v) < 1e-20, jnp.where(v < 0, -1e-20, 1e-20), v
        )
        IDX, IDY, IDZ = inv(DX), inv(DY), inv(DZ)

        # ---- near-to-far cluster order (round-5): visiting clusters by
        # distance from the block's mean ray origin makes the running
        # per-lane best (tc8) cap the slab far plane early, so far
        # clusters fail the slab and their member loops are pl.when-
        # skipped.  A coarse 16-bin counting sort over squared centroid
        # distance costs ~3 vector reductions + ~4 scalar sweeps of K —
        # noise next to one member loop.  Pure scalar SMEM loops, no
        # nested predication (the round-4 supercluster lesson).
        nrm = 1.0 / (RROWS * RB)
        mx = jnp.sum(OX) * nrm
        my = jnp.sum(OY) * nrm
        mz = jnp.sum(OZ) * nrm
        NB = 16

        def key_body(c, mm):
            cx = 0.5 * (cb_ref[c, 0] + cb_ref[c, 3]) - mx
            cy = 0.5 * (cb_ref[c, 1] + cb_ref[c, 4]) - my
            cz = 0.5 * (cb_ref[c, 2] + cb_ref[c, 5]) - mz
            kk = cx * cx + cy * cy + cz * cz
            keys_sc[c] = kk
            return (jnp.minimum(mm[0], kk), jnp.maximum(mm[1], kk))

        kmin, kmax = jax.lax.fori_loop(
            0, n_clusters, key_body,
            (jnp.float32(3e38), jnp.float32(-3e38)),
        )
        for b in range(NB + 1):
            bins_sc[b] = 0
        binf = NB / jnp.maximum(kmax - kmin, 1e-30)

        def cnt_body(c, _):
            b = jnp.clip(
                ((keys_sc[c] - kmin) * binf).astype(jnp.int32), 0, NB - 1
            )
            bins_sc[b + 1] = bins_sc[b + 1] + 1
            return 0

        jax.lax.fori_loop(0, n_clusters, cnt_body, 0)
        for b in range(1, NB + 1):
            bins_sc[b] = bins_sc[b] + bins_sc[b - 1]

        def place_body(c, _):
            b = jnp.clip(
                ((keys_sc[c] - kmin) * binf).astype(jnp.int32), 0, NB - 1
            )
            p = bins_sc[b]
            ord_sc[p] = c
            bins_sc[b] = p + 1
            return 0

        jax.lax.fori_loop(0, n_clusters, place_body, 0)
        if any_hit:
            tc0 = jnp.where(TM <= 2e-4, -1.0, TM)
        else:
            tc0 = TM
        tc8[:] = tc0
        for r in range(RROWS):
            t8[r * SUB : (r + 1) * SUB, :] = jnp.broadcast_to(
                tc0[r : r + 1, :], (SUB, RB)
            )
        i8[:] = jnp.full((RROWS * SUB, RB), -1, jnp.int32)

        def cluster_body(ci, _):
            c = ord_sc[ci]
            # batched slab: cluster AABB vs ALL rows at once
            lox, loy, loz = cb_ref[c, 0], cb_ref[c, 1], cb_ref[c, 2]
            hix, hiy, hiz = cb_ref[c, 3], cb_ref[c, 4], cb_ref[c, 5]
            tx0 = (lox - OX) * IDX
            tx1 = (hix - OX) * IDX
            ty0 = (loy - OY) * IDY
            ty1 = (hiy - OY) * IDY
            tz0 = (loz - OZ) * IDZ
            tz1 = (hiz - OZ) * IDZ
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                jnp.maximum(jnp.minimum(tz0, tz1), 0.0),
            )
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                jnp.minimum(jnp.maximum(tz0, tz1), tc8[:]),
            ) * 1.0001
            hit8 = tn <= tf

            for r in range(RROWS) if "member" not in _ABLATE else ():
                @pl.when(jnp.any(hit8[r : r + 1, :]))
                def _(r=r):
                    rs = slice(r * SUB, (r + 1) * SUB)
                    ox = r_o0[r : r + 1, :]
                    oy = r_o1[r : r + 1, :]
                    oz = r_o2[r : r + 1, :]
                    dx = r_d0[r : r + 1, :]
                    dy = r_d1[r : r + 1, :]
                    dz = r_d2[r : r + 1, :]
                    ctile = tri_ref[pl.ds(c * M, M), :]
                    for j in range(M // SUB):
                        tile = ctile[j * SUB : (j + 1) * SUB, :]
                        col = lambda k, tile=tile: tile[:, k : k + 1]
                        t_best = t8[rs, :]
                        tp = _tri_test_h(
                            col(_RC_N), col(_RC_N + 1), col(_RC_N + 2),
                            col(_RC_DN),
                            col(_RC_U), col(_RC_U + 1), col(_RC_U + 2),
                            col(_RC_DU),
                            col(_RC_V3), col(_RC_V3 + 1), col(_RC_V3 + 2),
                            col(_RC_DV),
                            ox, oy, oz, dx, dy, dz, t_best,
                        )
                        better = tp < t_best
                        t8[rs, :] = jnp.where(better, tp, t_best)
                        i8[rs, :] = jnp.where(
                            better, c * M + j * SUB + sub_off, i8[rs, :]
                        )
                    row_min = jnp.min(t8[rs, :], axis=0, keepdims=True)
                    if any_hit:
                        occ_row = jnp.max(i8[rs, :], axis=0, keepdims=True) >= 0
                        t8[rs, :] = jnp.where(
                            jnp.broadcast_to(occ_row, (SUB, RB)), -1.0,
                            t8[rs, :],
                        )
                        row_min = jnp.where(occ_row, -1.0, row_min)
                    tc8[r : r + 1, :] = row_min

            return 0

        jax.lax.fori_loop(0, n_clusters, cluster_body, 0)

        for r in range(RROWS):
            rs = slice(r * SUB, (r + 1) * SUB)
            if any_hit:
                o_t[r : r + 1, :] = TM[r : r + 1, :]
                o_slot[r : r + 1, :] = jnp.max(i8[rs, :], axis=0, keepdims=True)
            else:
                t_all = t8[rs, :]
                i_all = i8[rs, :]
                t_best = t_all[0:1]
                i_best = i_all[0:1]
                for srow in range(1, SUB):
                    cand_t = t_all[srow : srow + 1]
                    cand_i = i_all[srow : srow + 1]
                    better = cand_t < t_best
                    t_best = jnp.where(better, cand_t, t_best)
                    i_best = jnp.where(better, cand_i, i_best)
                o_t[r : r + 1, :] = t_best
                o_slot[r : r + 1, :] = i_best

    def extras_pass(ox, oy, oz, dx, dy, dz, t_in, idx_in, any_hit, tmax=None):
        """Test the non-triangle extras over the full [RROWS, RB] block
        (demo-style SMEM loop).  Closest: tightens (t, idx); any-hit:
        occludes against the original tmax."""
        t_best, idx_best = t_in, idx_in
        occ = None if not any_hit else (idx_in >= 0)
        for e in range(n_extras):
            m = [exw_ref[e, k] for k in range(12)]
            pr = [exp_ref[e, k] for k in range(9)]
            lim = tmax if any_hit else t_best
            tp = _prim_test(ext_ref[e], m, pr, ox, oy, oz, dx, dy, dz, lim,
                            types=ex_types)
            if any_hit:
                occ = occ | (tp < tmax)
            else:
                better = tp < t_best
                t_best = jnp.where(better, tp, t_best)
                idx_best = jnp.where(better, EXTRA_BASE + e, idx_best)
        if any_hit:
            return occ
        return t_best, idx_best

    def resolve_tris():
        """Winner-attribute sweep: for each row, accumulate the _RC_RES
        leading record columns (N | e1 | mat | alid) of the winning slot
        over pl.when-gated clusters.  Hit geometry needs nothing else:
        p = o + t*d, n = norm(N), dpdu = e1."""

        def row_body(r, _):
            slot = o_slot[pl.ds(r, 1), :]
            acc_sc[:] = jnp.zeros((_RC_RES * SUB, RB), f32)
            # sweep only the [min, max] winner-cluster range of this row:
            # coherent rows touch 1-3 clusters instead of all K; rows with
            # no triangle winner get an empty loop (cmax = -1 < cmin)
            cid = jnp.where(slot >= 0, slot // M, n_clusters)
            cmin = jnp.min(cid)
            cmax = jnp.max(jnp.where(slot >= 0, slot // M, -1))

            def c_body(c, _):
                in_c = (slot >= c * M) & (slot < (c + 1) * M)

                @pl.when(jnp.any(in_c))
                def _():
                    # (a dynamic [jmin, jmax] winner-tile sub-loop was
                    # also tried here: 186.8 vs 183.9 ms — the dynamic
                    # fori overhead beats the unrolled 16 tiles; static)
                    ctile = tri_ref[pl.ds(c * M, M), :]
                    for j in range(M // SUB):
                        tile = ctile[j * SUB : (j + 1) * SUB, :]
                        sid = c * M + j * SUB + sub_off
                        msk = sid == slot
                        for a in range(_RC_RES):
                            cur = acc_sc[a * SUB : (a + 1) * SUB, :]
                            acc_sc[a * SUB : (a + 1) * SUB, :] = cur + jnp.where(
                                msk, tile[:, a : a + 1], 0.0
                            )

                return 0

            jax.lax.fori_loop(cmin, cmax + 1, c_body, 0)
            for a in range(_RC_RES):
                red = jnp.sum(
                    acc_sc[a * SUB : (a + 1) * SUB, :], axis=0, keepdims=True
                )
                attr_sc[pl.ds(a * RROWS + r, 1), :] = red
            return 0

        jax.lax.fori_loop(0, RROWS, row_body, 0)

    def sel_light(idx):
        zeros = jnp.zeros(idx.shape, f32)
        lt = zeros
        lp = [zeros] * 3
        li = [zeros] * 3
        aux = [zeros] * 6
        for l in range(n_lights):
            is_l = idx == l
            lt = jnp.where(is_l, ltype_ref[l].astype(f32), lt)
            lp = [jnp.where(is_l, lpos_ref[l, k], lp[k]) for k in range(3)]
            li = [jnp.where(is_l, lint_ref[l, k], li[k]) for k in range(3)]
            aux = [jnp.where(is_l, laux_ref[l, k], aux[k]) for k in range(6)]
        return lt, lp, li, aux

    def sel_mat(col, mat_i, default=0.0):
        v = jnp.full(mat_i.shape, default, f32)
        for mt in range(n_mats):
            v = jnp.where(mat_i == mt, msh_ref[mt, col], v)
        return v

    def bounce(bounce_idx, st):
        (ox, oy, oz, dx, dy, dz, bR, bG, bB, LR, LG, LB,
         alive_f, spec_f, prev_pdf, cw, es) = st
        alive = alive_f > 0.5
        b_abs = bounce_idx + start_b  # absolute bounce (RNG dims + RR)
        dim0 = (
            jnp.uint32(DIM_BOUNCE_BASE)
            + b_abs.astype(jnp.uint32) * jnp.uint32(DIMS_PER_BOUNCE)
        )

        def u1(off):
            return _to_unit(_hash_combine(h_ps, dim0 + jnp.uint32(off)))

        # ---- closest hit: cluster traversal + extras ----------------------
        t_lim = jnp.where(alive, jnp.full(ox.shape, _BIG, f32), 1e-4)
        store_rays(ox, oy, oz, dx, dy, dz, t_lim)
        trace_rows(False)
        if "closest2" in _ABLATE:  # profiling: stage is idempotent, 2x it
            trace_rows(False)
        t = o_t[:]
        idx = o_slot[:]
        if n_extras:
            t, idx = extras_pass(ox, oy, oz, dx, dy, dz, t, idx, False)
        hit = (idx >= 0) & alive
        is_ext = idx >= EXTRA_BASE
        is_tri = (idx >= 0) & ~is_ext
        # clamp extras winners out of the tri-resolve (they'd never match)
        if "resolve" in _ABLATE:  # profiling: plausible fixed attrs
            attr_sc[:] = jnp.zeros((_RC_RES * RROWS, RB), f32)
            attr_sc[2 * RROWS : 3 * RROWS, :] = jnp.ones((RROWS, RB), f32)
            attr_sc[4 * RROWS : 5 * RROWS, :] = jnp.ones((RROWS, RB), f32)
            attr_sc[7 * RROWS : 8 * RROWS, :] = -jnp.ones((RROWS, RB), f32)
        else:
            resolve_tris()
            if "resolve2" in _ABLATE:  # profiling: idempotent, 2x it
                resolve_tris()

        def attr(a):
            return attr_sc[a * RROWS : (a + 1) * RROWS, :]

        ngx, ngy, ngz = attr(0), attr(1), attr(2)
        e1x, e1y, e1z = attr(3), attr(4), attr(5)
        mat_tri = attr(6)
        alid_tri = attr(7)

        # ---- extras winner attributes (small SMEM loop) -------------------
        zeros = jnp.zeros(ox.shape, f32)
        m = [zeros] * 12
        epr = [zeros] * 9
        ptype_f = zeros
        mat_ex = zeros
        alid_ex = zeros - 1.0
        scale2 = zeros + 1.0
        for e in range(n_extras):
            is_e = idx == EXTRA_BASE + e
            m = [jnp.where(is_e, exw_ref[e, k], m[k]) for k in range(12)]
            epr = [jnp.where(is_e, exp_ref[e, k], epr[k]) for k in range(9)]
            ptype_f = jnp.where(is_e, ext_ref[e].astype(f32), ptype_f)
            mat_ex = jnp.where(is_e, exa_ref[e, _EX_MAT], mat_ex)
            alid_ex = jnp.where(is_e, exa_ref[e, _EX_ALID], alid_ex)
            scale2 = jnp.where(is_e, exa_ref[e, _EX_SCALE2], scale2)

        # ---- winner geometry ----------------------------------------------
        # triangles (world space): p = o + t d, n = norm(N), dpdu = e1
        # (ops/intersect._triangle_geometry conventions; N = e1 x e2 is
        # resolved straight from the record)
        ntx, nty, ntz = _normalize3(ngx, ngy, ngz, 1e-30)
        ptx = ox + dx * t
        pty = oy + dy * t
        ptz = oz + dz * t

        # extras (sphere/disk, object space + uniform-scale transform):
        # identical math to pallas_megakernel's winner block
        oox = m[0] * ox + m[1] * oy + m[2] * oz + m[3]
        ooy = m[4] * ox + m[5] * oy + m[6] * oz + m[7]
        ooz = m[8] * ox + m[9] * oy + m[10] * oz + m[11]
        odx = m[0] * dx + m[1] * dy + m[2] * dz
        ody = m[4] * dx + m[5] * dy + m[6] * dz
        odz = m[8] * dx + m[9] * dy + m[10] * dz
        pox = oox + odx * t
        poy = ooy + ody * t
        poz = ooz + odz * t
        radius = epr[0]
        is_sph = ptype_f < 0.5
        plen = jnp.sqrt(jnp.maximum(pox * pox + poy * poy + poz * poz, 1e-20))
        s_rep = jnp.where(is_sph, radius / plen, 1.0)
        pox, poy, poz = pox * s_rep, poy * s_rep, poz * s_rep
        inv_r = 1.0 / jnp.maximum(radius, 1e-20)
        nx_o = jnp.where(is_sph, pox * inv_r, 0.0)
        ny_o = jnp.where(is_sph, poy * inv_r, 0.0)
        nz_o = jnp.where(is_sph, poz * inv_r, 1.0)
        dux_o, duy_o, duz_o = -poy, pox, jnp.zeros_like(pox)

        def w2oT(vx, vy, vz):
            return (
                m[0] * vx + m[4] * vy + m[8] * vz,
                m[1] * vx + m[5] * vy + m[9] * vz,
                m[2] * vx + m[6] * vy + m[10] * vz,
            )

        nex, ney, nez = _normalize3(*w2oT(nx_o, ny_o, nz_o), 1e-30)
        duex, duey, duez = w2oT(dux_o, duy_o, duz_o)
        plx, ply, plz = w2oT(pox - m[3], poy - m[7], poz - m[11])
        pex = scale2 * plx
        pey = scale2 * ply
        pez = scale2 * plz

        # merge triangle / extras lanes
        px = jnp.where(is_tri, ptx, pex)
        py = jnp.where(is_tri, pty, pey)
        pz = jnp.where(is_tri, ptz, pez)
        nx = jnp.where(is_tri, ntx, nex)
        ny = jnp.where(is_tri, nty, ney)
        nz = jnp.where(is_tri, ntz, nez)
        dux = jnp.where(is_tri, e1x, duex)
        duy = jnp.where(is_tri, e1y, duey)
        duz = jnp.where(is_tri, e1z, duez)
        mat_f = jnp.where(is_tri, mat_tri, mat_ex)
        alid = jnp.where(
            is_tri, alid_tri, jnp.where(is_ext, alid_ex, -1.0)
        ).astype(jnp.int32)
        mat_i = (mat_f + 0.5).astype(jnp.int32)
        wox, woy, woz = _normalize3(-dx, -dy, -dz, 1e-30)

        # ---- emitted radiance at emitter hits (path.go:48-63 + MIS) -------
        is_emit = hit & (alid >= 0)
        if n_lights > 0:
            _, _, eint, eaux = sel_light(jnp.maximum(alid, 0))
            facing = _dot3(nx, ny, nz, wox, woy, woz) > 0.0
            emit_on = (eaux[_LA_TWO] > 0.5) | facing
            l_pdf = sphere_area_pdf_li(
                ox, oy, oz, dx, dy, dz,
                eaux[1], eaux[2], eaux[3], eaux[_LA_RAD],
            )
            pick_pmf = jnp.where(
                func_int > 0.0,
                eaux[5] / jnp.maximum(func_int * n_lights, 1e-20),
                1.0 / n_lights,
            )
            w_bsdf = jnp.where(
                spec_f > 0.5,
                1.0,
                _power_heuristic(prev_pdf, l_pdf * pick_pmf),
            )
            gain = jnp.where(is_emit & emit_on, w_bsdf, 0.0)
            LR = LR + bR * eint[0] * gain
            LG = LG + bG * eint[1] * gain
            LB = LB + bB * eint[2] * gain

        alive = alive & hit

        # ---- material columns at the hit ----------------------------------
        kdr = sel_mat(_MS_C1, mat_i)
        kdg = sel_mat(_MS_C1 + 1, mat_i)
        kdb = sel_mat(_MS_C1 + 2, mat_i)
        is_chk = sel_mat(_MS_CHK, mat_i) > 0.5
        is_mir = sel_mat(_MS_MIR, mat_i) > 0.5
        is_gls = sel_mat(_MS_GLS, mat_i) > 0.5
        is_pla = sel_mat(_MS_PLA, mat_i) > 0.5
        ksr = sel_mat(_MS_KS, mat_i)
        ksg = sel_mat(_MS_KS + 1, mat_i)
        ksb = sel_mat(_MS_KS + 2, mat_i)
        eta_m = jnp.maximum(sel_mat(_MS_ETA, mat_i), 1e-3)
        alpha = jnp.maximum(sel_mat(_MS_ALPHA, mat_i), 1e-3)

        if use_cone:
            fw_hit = cw + cone_sp * jnp.abs(t)
            fw_surf = fw_hit * jax.lax.rsqrt(
                jnp.maximum(jnp.abs(_dot3(nx, ny, nz, wox, woy, woz)), 0.05)
            )
        # planar checker (closed-form box filter when use_cone, as in
        # pallas_megakernel / ops/texture.py)
        vsx = sel_mat(_MS_VS, mat_i)
        vsy = sel_mat(_MS_VS + 1, mat_i)
        vsz = sel_mat(_MS_VS + 2, mat_i)
        vtx = sel_mat(_MS_VT, mat_i)
        vty = sel_mat(_MS_VT + 1, mat_i)
        vtz = sel_mat(_MS_VT + 2, mat_i)
        s_t = sel_mat(_MS_DS, mat_i) + _dot3(px, py, pz, vsx, vsy, vsz)
        t_t = sel_mat(_MS_DS + 1, mat_i) + _dot3(px, py, pz, vtx, vty, vtz)
        c2r = sel_mat(_MS_C2, mat_i)
        c2g = sel_mat(_MS_C2 + 1, mat_i)
        c2b = sel_mat(_MS_C2 + 2, mat_i)
        if use_cone:
            def bump_int(x):
                hh = x * 0.5
                fh = jnp.floor(hh)
                return fh + 2.0 * jnp.maximum(hh - fh - 0.5, 0.0)

            ds_ = jnp.maximum(fw_surf * sel_mat(_MS_TSS, mat_i), 1e-8)
            dt_ = jnp.maximum(fw_surf * sel_mat(_MS_TST, mat_i), 1e-8)
            s_int = (bump_int(s_t + ds_) - bump_int(s_t - ds_)) / (2.0 * ds_)
            t_int = (bump_int(t_t + dt_) - bump_int(t_t - dt_)) / (2.0 * dt_)
            a2 = jnp.clip(s_int + t_int - 2.0 * s_int * t_int, 0.0, 1.0)
            kdr = jnp.where(is_chk, kdr + a2 * (c2r - kdr), kdr)
            kdg = jnp.where(is_chk, kdg + a2 * (c2g - kdg), kdg)
            kdb = jnp.where(is_chk, kdb + a2 * (c2b - kdb), kdb)
        else:
            par = jnp.floor(s_t) + jnp.floor(t_t)
            par = par - 2.0 * jnp.floor(par * 0.5)
            odd = (par > 0.5) & is_chk
            kdr = jnp.where(odd, c2r, kdr)
            kdg = jnp.where(odd, c2g, kdg)
            kdb = jnp.where(odd, c2b, kdb)

        # ---- shading frame (reflection.go:120-145) ------------------------
        nd = _dot3(nx, ny, nz, dux, duy, duz)
        ssx, ssy, ssz = dux - nx * nd, duy - ny * nd, duz - nz * nd
        bad = ssx * ssx + ssy * ssy + ssz * ssz < 1e-12
        (fbx, fby, fbz), _ = _coord_system(nx, ny, nz)
        ssx = jnp.where(bad, fbx, ssx)
        ssy = jnp.where(bad, fby, ssy)
        ssz = jnp.where(bad, fbz, ssz)
        ssx, ssy, ssz = _normalize3(ssx, ssy, ssz, 1e-30)
        tsx, tsy, tsz = _cross3(nx, ny, nz, ssx, ssy, ssz)
        cos_o = _dot3(wox, woy, woz, nx, ny, nz)
        aco = jnp.abs(cos_o)

        d_off = _offset_dist(nx, ny, nz, px, py, pz)

        def plastic_spec(wix, wiy, wiz, cos_i):
            """GGX reflection term of the plastic lobe evaluated in world
            space (microfacet_reflection_f, reflection.go:670-736):
            returns (spec scalar, mf half-vector pdf) — both zero when
            not same-hemisphere / degenerate."""
            whx, why, whz = wix + wox, wiy + woy, wiz + woz
            wh2 = whx * whx + why * why + whz * whz
            whx, why, whz = _normalize3(whx, why, whz, 1e-20)
            c_wh = _dot3(whx, why, whz, nx, ny, nz)
            # orient wh to the +n hemisphere for the Fresnel argument
            sgn_h = jnp.where(c_wh < 0.0, -1.0, 1.0)
            fr = _fresnel_diel(
                _dot3(wix, wiy, wiz, sgn_h * whx, sgn_h * why, sgn_h * whz),
                eta_m,
            )
            dterm = _ggx_d(c_wh, alpha)
            g = 1.0 / (
                1.0 + _ggx_lambda(cos_o, alpha) + _ggx_lambda(cos_i, alpha)
            )
            aci = jnp.abs(cos_i)
            same = cos_o * cos_i > 0.0
            degen = (aco < 1e-7) | (aci < 1e-7) | (wh2 < 1e-14)
            spec = jnp.where(
                same & ~degen,
                fr * dterm * g / jnp.maximum(4.0 * aco * aci, 1e-7),
                0.0,
            )
            dot_oh = _dot3(wox, woy, woz, whx, why, whz)
            mf_pdf = jnp.where(
                same,
                dterm * jnp.abs(c_wh) / jnp.maximum(4.0 * jnp.abs(dot_oh), 1e-7),
                0.0,
            )
            return spec, mf_pdf

        # ---- NEE: one-light estimate (integrator.go:48-77, 79-195) --------
        if n_lights > 0 and "nee" not in _ABLATE:
            u_pick = u1(D_LIGHT_PICK)
            cnt = jnp.zeros(u_pick.shape, jnp.int32)
            for i in range(n_lights + 1):
                cnt = cnt + (lcdf_ref[i] <= u_pick).astype(jnp.int32)
            lidx = jnp.clip(cnt - 1, 0, n_lights - 1)
            lt, lp, lin, laux = sel_light(lidx)
            pick_pmf = jnp.where(
                func_int > 0.0,
                laux[5] / (jnp.maximum(func_int, 1e-30) * n_lights),
                1.0 / n_lights,
            )
            ul0 = u1(D_LIGHT_UV)
            ul1 = u1(D_LIGHT_UV + 1)

            tlx, tly, tlz = lp[0] - px, lp[1] - py, lp[2] - pz
            d2 = tlx * tlx + tly * tly + tlz * tlz
            dist_pt = jnp.sqrt(d2)
            wix_pt, wiy_pt, wiz_pt = _normalize3(tlx, tly, tlz, 1e-20)
            inv_d2 = 1.0 / jnp.maximum(d2, 1e-12)

            cx, cy, cz, rad = laux[1], laux[2], laux[3], laux[4]
            tcx, tcy, tcz = cx - px, cy - py, cz - pz
            dc2 = tcx * tcx + tcy * tcy + tcz * tcz
            dc = jnp.sqrt(dc2)
            outside = dc > rad * 1.00001
            inv_dc = 1.0 / jnp.maximum(dc, 1e-12)
            wcx, wcy, wcz = tcx * inv_dc, tcy * inv_dc, tcz * inv_dc
            (v2x_, v2y_, v2z_), (v3x_, v3y_, v3z_) = _coord_system(wcx, wcy, wcz)
            sin2_tmax = jnp.clip(rad * rad / jnp.maximum(dc2, 1e-20), 0.0, 1.0)
            cos_tmax = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_tmax))
            cos_t = (1.0 - ul0) + ul0 * cos_tmax
            sin2_t = jnp.maximum(0.0, 1.0 - cos_t * cos_t)
            ds2 = dc * cos_t - jnp.sqrt(
                jnp.maximum(0.0, rad * rad - dc2 * sin2_t)
            )
            cos_a = (dc2 + rad * rad - ds2 * ds2) / jnp.maximum(
                2.0 * dc * rad, 1e-12
            )
            sin_a = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_a * cos_a))
            phi = 2.0 * PI * ul1
            sa_cp = sin_a * jnp.cos(phi)
            sa_sp = sin_a * jnp.sin(phi)
            nox = -v2x_ * sa_cp - v3x_ * sa_sp - wcx * cos_a
            noy = -v2y_ * sa_cp - v3y_ * sa_sp - wcy * cos_a
            noz = -v2z_ * sa_cp - v3z_ * sa_sp - wcz * cos_a
            plx_o = cx + rad * nox
            ply_o = cy + rad * noy
            plz_o = cz + rad * noz
            wix_o, wiy_o, wiz_o = _normalize3(
                plx_o - px, ply_o - py, plz_o - pz, 1e-20
            )
            pdf_out = 1.0 / (
                2.0 * PI * (1.0 - jnp.minimum(cos_tmax, 1.0 - 1e-7))
            )
            z_in = 1.0 - 2.0 * ul0
            r_in = jnp.sqrt(jnp.maximum(0.0, 1.0 - z_in * z_in))
            nix = r_in * jnp.cos(phi)
            niy = r_in * jnp.sin(phi)
            niz = z_in
            plx_i, ply_i, plz_i = cx + rad * nix, cy + rad * niy, cz + rad * niz
            wvx, wvy, wvz = plx_i - px, ply_i - py, plz_i - pz
            d2i = wvx * wvx + wvy * wvy + wvz * wvz
            wix_i, wiy_i, wiz_i = _normalize3(wvx, wvy, wvz, 1e-20)
            cos_li = jnp.abs(_dot3(nix, niy, niz, -wix_i, -wiy_i, -wiz_i))
            pdf_in = d2i / jnp.maximum(cos_li * 4.0 * PI * rad * rad, 1e-12)
            wix_ar = jnp.where(outside, wix_o, wix_i)
            wiy_ar = jnp.where(outside, wiy_o, wiy_i)
            wiz_ar = jnp.where(outside, wiz_o, wiz_i)
            nlx = jnp.where(outside, nox, nix)
            nly = jnp.where(outside, noy, niy)
            nlz = jnp.where(outside, noz, niz)
            plx_a = jnp.where(outside, plx_o, plx_i)
            ply_a = jnp.where(outside, ply_o, ply_i)
            plz_a = jnp.where(outside, plz_o, plz_i)
            pdf_ar = jnp.where(outside, pdf_out, pdf_in)
            dist_ar = jnp.sqrt(
                (plx_a - px) ** 2 + (ply_a - py) ** 2 + (plz_a - pz) ** 2
            )
            facing_l = _dot3(nlx, nly, nlz, -wix_ar, -wiy_ar, -wiz_ar) > 0.0
            area_on = ((laux[_LA_TWO] > 0.5) | facing_l) & (pdf_ar > 0.0)

            is_pt = lt < 0.5
            is_di = (lt > 0.5) & (lt < 1.5)
            is_delta = is_pt | is_di
            wix = jnp.where(is_pt, wix_pt, jnp.where(is_di, lp[0], wix_ar))
            wiy = jnp.where(is_pt, wiy_pt, jnp.where(is_di, lp[1], wiy_ar))
            wiz = jnp.where(is_pt, wiz_pt, jnp.where(is_di, lp[2], wiz_ar))
            li_gain = jnp.where(
                is_pt, inv_d2, jnp.where(is_di | area_on, 1.0, 0.0)
            )
            lir = lin[0] * li_gain
            lig = lin[1] * li_gain
            lib = lin[2] * li_gain
            ls_pdf = jnp.where(is_delta, 1.0, pdf_ar)
            dist = jnp.where(
                is_pt, dist_pt, jnp.where(is_di, 2.0 * world_radius, dist_ar)
            )

            # f(wo, wi)*|cos| and pdf per material class
            cos_i = _dot3(wix, wiy, wiz, nx, ny, nz)
            same = cos_o * cos_i > 0.0
            aci = jnp.abs(cos_i)
            cos_gain = jnp.where(same, aci, 0.0)
            cos_pdf = jnp.where(same, aci * INV_PI, 0.0)
            spec_s, mf_pdf = plastic_spec(wix, wiy, wiz, cos_i)
            fR_n = kdr * INV_PI * cos_gain
            fG_n = kdg * INV_PI * cos_gain
            fB_n = kdb * INV_PI * cos_gain
            fR_n = jnp.where(is_pla, fR_n + ksr * spec_s * cos_gain, fR_n)
            fG_n = jnp.where(is_pla, fG_n + ksg * spec_s * cos_gain, fG_n)
            fB_n = jnp.where(is_pla, fB_n + ksb * spec_s * cos_gain, fB_n)
            b_pdf = jnp.where(is_pla, 0.5 * (cos_pdf + mf_pdf), cos_pdf)
            f_max = jnp.maximum(fR_n, jnp.maximum(fG_n, fB_n))
            li_max = jnp.maximum(lir, jnp.maximum(lig, lib))
            contributes = (
                alive & ~is_mir & ~is_gls
                & (ls_pdf > 0.0) & (li_max > 0.0) & (f_max > 0.0)
            )

            # shadow ray: cluster any-hit + extras
            sgn = jnp.where(cos_i < 0.0, -1.0, 1.0)
            shx = px + sgn * d_off * nx
            shy = py + sgn * d_off * ny
            shz = pz + sgn * d_off * nz
            t_sh = jnp.maximum(dist * (1.0 - SHADOW_EPSILON) - 1e-3, 1e-4)
            t_sh = jnp.where(contributes, t_sh, 1e-6)
            if "shadow" in _ABLATE:  # profiling: skip occlusion traversal
                vis = contributes
            else:
                store_rays(shx, shy, shz, wix, wiy, wiz, t_sh)
                trace_rows(True)
                occ = o_slot[:] >= 0
                if n_extras:
                    occ = extras_pass(
                        shx, shy, shz, wix, wiy, wiz, o_t[:],
                        jnp.where(occ, 0, -1), True, tmax=t_sh,
                    )
                vis = contributes & ~occ

            weight = jnp.where(
                is_delta, 1.0, _power_heuristic(ls_pdf, b_pdf)
            )
            gain = (
                weight
                / jnp.maximum(ls_pdf, 1e-20)
                / jnp.maximum(pick_pmf, 1e-20)
            )
            gain = jnp.where(vis, gain, 0.0)
            LR = LR + bR * fR_n * lir * gain
            LG = LG + bG * fG_n * lig * gain
            LB = LB + bB * fB_n * lib * gain

        # ---- BSDF sample ---------------------------------------------------
        ub0 = u1(D_BSDF_UV)
        ub1 = u1(D_BSDF_UV + 1)
        u_lobe = u1(D_BSDF_LOBE)
        # matte: cosine hemisphere on wo's side (shared with plastic diffuse)
        dxl, dyl = _concentric_disk(ub0, ub1)
        zl = jnp.sqrt(jnp.maximum(0.0, 1.0 - dxl * dxl - dyl * dyl))
        zl = jnp.where(cos_o < 0.0, -zl, zl)
        wix_c = ssx * dxl + tsx * dyl + nx * zl
        wiy_c = ssy * dxl + tsy * dyl + ny * zl
        wiz_c = ssz * dxl + tsz * dyl + nz * zl
        pdf_cos = jnp.abs(zl) * INV_PI
        cos_c = jnp.abs(zl)
        kd_max = jnp.maximum(kdr, jnp.maximum(kdg, kdb))
        ok = (pdf_cos > 1e-9) & (kd_max * INV_PI > 0.0) & (cos_o * zl > 0.0)
        thr = jnp.where(
            ok, (INV_PI * cos_c) / jnp.maximum(pdf_cos, 1e-20), 0.0
        )
        wix_n, wiy_n, wiz_n = wix_c, wiy_c, wiz_c
        pdf_b = pdf_cos
        fR = kdr * thr
        fG = kdg * thr
        fB = kdb * thr

        # plastic: 0.5/0.5 diffuse vs GGX half-vector (bsdf_sample plastic
        # branch, ops/bsdf.py; pdf averaged, f = full two-lobe sum)
        tan2w = alpha * alpha * ub0 / jnp.maximum(1.0 - ub0, 1e-7)
        ctw = 1.0 / jnp.sqrt(1.0 + tan2w)
        stw = jnp.sqrt(jnp.maximum(0.0, 1.0 - ctw * ctw))
        phiw = 2.0 * PI * ub1
        whx_l = stw * jnp.cos(phiw)
        why_l = stw * jnp.sin(phiw)
        # world wh, flipped into wo's hemisphere (local flip = sign(cos_o))
        flip_h = jnp.where(cos_o < 0.0, -1.0, 1.0)
        whx = (ssx * whx_l + tsx * why_l + nx * ctw) * flip_h
        why = (ssy * whx_l + tsy * why_l + ny * ctw) * flip_h
        whz = (ssz * whx_l + tsz * why_l + nz * ctw) * flip_h
        doh = _dot3(wox, woy, woz, whx, why, whz)
        wix_g2 = 2.0 * doh * whx - wox
        wiy_g2 = 2.0 * doh * why - woy
        wiz_g2 = 2.0 * doh * whz - woz
        wix_g2, wiy_g2, wiz_g2 = _normalize3(wix_g2, wiy_g2, wiz_g2, 1e-20)
        choose_diff = u_lobe < 0.5
        wix_p = jnp.where(choose_diff, wix_c, wix_g2)
        wiy_p = jnp.where(choose_diff, wiy_c, wiy_g2)
        wiz_p = jnp.where(choose_diff, wiz_c, wiz_g2)
        cos_ip = _dot3(wix_p, wiy_p, wiz_p, nx, ny, nz)
        same_p = cos_o * cos_ip > 0.0
        spec_p, mf_pdf_p = plastic_spec(wix_p, wiy_p, wiz_p, cos_ip)
        acip = jnp.abs(cos_ip)
        cos_pdf_p = jnp.where(same_p, acip * INV_PI, 0.0)
        pdf_pla = 0.5 * (cos_pdf_p + mf_pdf_p)
        diff_p = jnp.where(same_p, INV_PI, 0.0)
        fR_p = kdr * diff_p + ksr * spec_p
        fG_p = kdg * diff_p + ksg * spec_p
        fB_p = kdb * diff_p + ksb * spec_p
        fp_max = jnp.maximum(fR_p, jnp.maximum(fG_p, fB_p))
        ok_pla = (pdf_pla > 1e-9) & (fp_max > 0.0)
        thr_p = jnp.where(ok_pla, acip / jnp.maximum(pdf_pla, 1e-20), 0.0)

        # mirror: delta reflection (mirror.go:21-32)
        wix_m = 2.0 * cos_o * nx - wox
        wiy_m = 2.0 * cos_o * ny - woy
        wiz_m = 2.0 * cos_o * nz - woz
        ks_max = jnp.maximum(ksr, jnp.maximum(ksg, ksb))

        # smooth glass: FresnelSpecular (reflection.go:465-536, bug #8 fixed)
        entering = cos_o > 0.0
        F = _fresnel_diel(cos_o, eta_m)
        choose_r = u_lobe < F
        eta_ratio = jnp.where(entering, 1.0 / eta_m, eta_m)
        sgn_e = jnp.where(entering, 1.0, -1.0)
        ci_g = jnp.abs(jnp.clip(cos_o, -1.0, 1.0))
        sin2_tt = eta_ratio * eta_ratio * (1.0 - ci_g * ci_g)
        ok_t = sin2_tt < 1.0
        cos_tt = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_tt))
        coef = (eta_ratio * ci_g - cos_tt) * sgn_e
        wtx, wty, wtz = _normalize3(
            coef * nx - eta_ratio * wox,
            coef * ny - eta_ratio * woy,
            coef * nz - eta_ratio * woz,
            1e-20,
        )
        ktr = sel_mat(_MS_KT, mat_i)
        ktg = sel_mat(_MS_KT + 1, mat_i)
        ktb = sel_mat(_MS_KT + 2, mat_i)
        kt_max = jnp.maximum(ktr, jnp.maximum(ktg, ktb))
        er2 = eta_ratio * eta_ratio
        ok_g = (
            (choose_r & (F > 1e-9) & (ks_max > 0.0))
            | (~choose_r & ((1.0 - F) > 1e-9) & ok_t & (kt_max > 0.0))
        )
        wix_gl = jnp.where(choose_r, wix_m, wtx)
        wiy_gl = jnp.where(choose_r, wiy_m, wty)
        wiz_gl = jnp.where(choose_r, wiz_m, wtz)
        pdf_gl = jnp.where(choose_r, F, 1.0 - F)
        fR_gl = jnp.where(choose_r, ksr, er2 * ktr)
        fG_gl = jnp.where(choose_r, ksg, er2 * ktg)
        fB_gl = jnp.where(choose_r, ksb, er2 * ktb)

        # merge lobes (logic ops only between bool vectors — Mosaic)
        plain = ~is_pla & ~is_mir & ~is_gls
        ok = (
            (plain & ok)
            | (is_pla & ok_pla)
            | (is_mir & (ks_max > 0.0))
            | (is_gls & ok_g)
        )
        wix_n = jnp.where(
            is_mir, wix_m,
            jnp.where(is_gls, wix_gl, jnp.where(is_pla, wix_p, wix_n)),
        )
        wiy_n = jnp.where(
            is_mir, wiy_m,
            jnp.where(is_gls, wiy_gl, jnp.where(is_pla, wiy_p, wiy_n)),
        )
        wiz_n = jnp.where(
            is_mir, wiz_m,
            jnp.where(is_gls, wiz_gl, jnp.where(is_pla, wiz_p, wiz_n)),
        )
        pdf_b = jnp.where(
            is_mir, 1.0,
            jnp.where(is_gls, pdf_gl, jnp.where(is_pla, pdf_pla, pdf_b)),
        )
        fR = jnp.where(
            is_mir, ksr, jnp.where(is_gls, fR_gl, jnp.where(is_pla, fR_p * thr_p, fR)),
        )
        fG = jnp.where(
            is_mir, ksg, jnp.where(is_gls, fG_gl, jnp.where(is_pla, fG_p * thr_p, fG)),
        )
        fB = jnp.where(
            is_mir, ksb, jnp.where(is_gls, fB_gl, jnp.where(is_pla, fB_p * thr_p, fB)),
        )
        ok_f = jnp.where(ok, 1.0, 0.0)
        bR = bR * fR * ok_f
        bG = bG * fG * ok_f
        bB = bB * fB * ok_f
        es = jnp.where(is_gls & ~choose_r & ok_t, es / jnp.maximum(er2, 1e-20), es)
        alive = alive & ok & (jnp.maximum(bR, jnp.maximum(bG, bB)) > 0.0)

        sgn_n = jnp.where(
            _dot3(wix_n, wiy_n, wiz_n, nx, ny, nz) < 0.0, -1.0, 1.0
        )
        ox = px + sgn_n * d_off * nx
        oy = py + sgn_n * d_off * ny
        oz = pz + sgn_n * d_off * nz
        dx, dy, dz = wix_n, wiy_n, wiz_n

        # ---- Russian roulette (path.go:143-153) ---------------------------
        rr_max = jnp.maximum(bR, jnp.maximum(bG, bB)) * es
        q = jnp.maximum(0.05, 1.0 - rr_max)
        u_rr = u1(D_RR)
        do_rr = (b_abs >= rr_start) & (rr_max < rr_threshold)
        killed = do_rr & (u_rr < q)
        surv = jnp.where(do_rr & ~killed, 1.0 / (1.0 - q), 1.0)
        bR, bG, bB = bR * surv, bG * surv, bB * surv
        alive = alive & ~killed

        return (
            ox, oy, oz, dx, dy, dz, bR, bG, bB, LR, LG, LB,
            jnp.where(alive, 1.0, 0.0).astype(f32),
            jnp.where(is_mir | is_gls, 1.0, 0.0).astype(f32),
            pdf_b,
            fw_hit if use_cone else cw,
            es,
        )

    state = (
        ox_ref[:], oy_ref[:], oz_ref[:],
        dx_ref[:], dy_ref[:], dz_ref[:],
        br_ref[:], bg_ref[:], bb_ref[:],
        lri_ref[:], lgi_ref[:], lbi_ref[:],
        alive_ref[:],
        spc_ref[:],
        ppd_ref[:],
        cwi_ref[:],
        esi_ref[:],
    )
    # Data-dependent bounce loop: exit the block as soon as every lane is
    # dead.  Re-measured in isolation round 5 (the round-4 number was
    # tainted by the miscompiling supercluster cull): 225.5 -> 201.5 ms
    # on the config-3 bench — grid steps covering sky-dominated bands go
    # fully dead after a bounce or two and skip the rest of the loop.
    # (The brute megakernel measured the same construct 20x SLOWER on
    # the closed demo scene, where blocks never die; see BENCH_NOTES.)
    # "nowexit" ablation restores the static fori_loop for A/B runs.
    if "nowexit" in _ABLATE:
        state = jax.lax.fori_loop(0, n_bounces, bounce, state)
    else:
        def w_cond(si):
            return (si[0] < n_bounces) & (jnp.sum(si[1][12]) > 0.0)

        def w_body(si):
            return (si[0] + 1, bounce(si[0], si[1]))

        _, state = jax.lax.while_loop(w_cond, w_body, (jnp.int32(0), state))
    lr_ref[:] = state[9]
    lg_ref[:] = state[10]
    lb_ref[:] = state[11]
    pox_ref[:] = state[0]
    poy_ref[:] = state[1]
    poz_ref[:] = state[2]
    pdx_ref[:] = state[3]
    pdy_ref[:] = state[4]
    pdz_ref[:] = state[5]
    pbr_ref[:] = state[6]
    pbg_ref[:] = state[7]
    pbb_ref[:] = state[8]
    pal_ref[:] = state[12]
    psp_ref[:] = state[13]
    ppp_ref[:] = state[14]
    pcw_ref[:] = state[15]
    pes_ref[:] = state[16]


# ---------------------------------------------------------------------------
# Host-side wrapper
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_depth", "rr_start", "rr_threshold", "interpret", "use_cone",
        "reorder_on", "resort_until",
    ),
)
def _mesh_li_fwd(
    scene, o, d, pixel, sample, seed, cone_w0, cone_sp,
    max_depth=5, rr_start=3, rr_threshold=1.0, interpret=False,
    use_cone=False, reorder_on=None, resort_until=None,
):
    # explicit static args (jit-cache-safe); default from the env flags
    if reorder_on is None:
        reorder_on = _REORDER != 0
    if resort_until is None:
        resort_until = _RESORT_UNTIL
    mt: MeshTables = scene.meshkernel
    n = o.shape[0]
    l_cnt = scene.lights.count
    pad = (-n) % BLOCK
    if pad:
        zf = jnp.zeros((pad,), jnp.float32)
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate(
            [d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], d.dtype), (pad, 1))]
        )
        pixel = jnp.concatenate([pixel, jnp.zeros((pad,), jnp.uint32)])
        sample = jnp.concatenate([sample, jnp.zeros((pad,), jnp.uint32)])
        alive0 = jnp.concatenate([jnp.ones((n,), jnp.float32), zf])
    else:
        alive0 = jnp.ones((n,), jnp.float32)
    total = n + pad
    rows = total // RB

    def as2d(x):
        return x.reshape(rows, RB)

    grid = (rows // RROWS,)
    ray_spec = pl.BlockSpec((RROWS, RB), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.SMEM
    )
    ex_types = tuple(
        t for t in (SPHERE, DISK) if t in scene.prims.types
    ) or (SPHERE,)
    ltype, lpos, lint, laux = _light_tables(scene)
    lcdf = scene.light_cdf
    e_cnt = max(mt.n_extras, 1)

    def phase(st, start_b, n_bounces):
        """Run n_bounces of the fused loop starting at absolute bounce
        start_b; st is the dict of 16 per-lane state arrays (flat [total])
        plus pixel/sample.  Returns the updated dict + accumulated L."""
        kernel = functools.partial(
            _mesh_kernel,
            mt.n_clusters, mt.n_extras, mt.n_mats, l_cnt,
            n_bounces, rr_start, rr_threshold, ex_types, use_cone,
        )
        scal = jnp.stack(
            [
                scene.light_func_int.astype(jnp.float32),
                scene.world_radius.astype(jnp.float32),
                jnp.asarray(cone_w0, jnp.float32),
                jnp.asarray(cone_sp, jnp.float32),
                jnp.asarray(jnp.float32(start_b)),
            ]
        )
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                smem((1,)),                      # seed
                smem(tuple(mt.cbounds.shape)),   # cluster bounds
                smem((e_cnt,)),                  # extras type
                smem((e_cnt, 12)),               # extras w2o
                smem((e_cnt, 9)),                # extras params
                smem((e_cnt, 3)),                # extras aux
                smem((mt.n_mats, _MS_K)),        # material shade table
                smem((l_cnt,)),
                smem((l_cnt, 3)),
                smem((l_cnt, 3)),
                smem((l_cnt, 8)),
                smem((l_cnt + 1,)),
                smem((5,)),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # tri table, whole
            ] + [ray_spec] * 19,
            out_specs=[ray_spec] * 17,
            out_shape=[jax.ShapeDtypeStruct((rows, RB), jnp.float32)] * 17,
            scratch_shapes=[
                pltpu.VMEM((RROWS, RB), jnp.float32),  # r_o0
                pltpu.VMEM((RROWS, RB), jnp.float32),
                pltpu.VMEM((RROWS, RB), jnp.float32),
                pltpu.VMEM((RROWS, RB), jnp.float32),  # r_d0
                pltpu.VMEM((RROWS, RB), jnp.float32),
                pltpu.VMEM((RROWS, RB), jnp.float32),
                pltpu.VMEM((RROWS, RB), jnp.float32),  # r_tm
                pltpu.VMEM((RROWS, RB), jnp.float32),  # o_t
                pltpu.VMEM((RROWS, RB), jnp.int32),    # o_slot
                pltpu.VMEM((RROWS * SUB, RB), jnp.float32),  # t8
                pltpu.VMEM((RROWS * SUB, RB), jnp.int32),    # i8
                pltpu.VMEM((RROWS, RB), jnp.float32),  # tc8
                pltpu.VMEM((_RC_RES * SUB, RB), jnp.float32),    # acc_sc
                pltpu.VMEM((_RC_RES * RROWS, RB), jnp.float32),  # attr_sc
                pltpu.SMEM((mt.n_clusters,), jnp.float32),       # keys_sc
                pltpu.SMEM((mt.n_clusters,), jnp.int32),         # ord_sc
                pltpu.SMEM((17,), jnp.int32),                    # bins_sc
            ],
            interpret=interpret,
        )(
            jnp.asarray(seed, jnp.uint32).reshape(1),
            mt.cbounds,
            mt.ex_type,
            mt.ex_w2o,
            mt.ex_par,
            mt.ex_aux,
            mt.mshade,
            ltype,
            lpos,
            lint,
            laux,
            lcdf,
            scal,
            mt.tri,
            as2d(st["ox"]), as2d(st["oy"]), as2d(st["oz"]),
            as2d(st["dx"]), as2d(st["dy"]), as2d(st["dz"]),
            as2d(st["pixel"]), as2d(st["sample"]),
            as2d(st["alive"]),
            as2d(st["br"]), as2d(st["bg"]), as2d(st["bb"]),
            as2d(st["lr"]), as2d(st["lg"]), as2d(st["lb"]),
            as2d(st["spec"]), as2d(st["ppdf"]),
            as2d(st["cw"]), as2d(st["es"]),
        )
        flat = [x.reshape(total) for x in outs]
        return dict(
            lr=flat[0], lg=flat[1], lb=flat[2],
            ox=flat[3], oy=flat[4], oz=flat[5],
            dx=flat[6], dy=flat[7], dz=flat[8],
            br=flat[9], bg=flat[10], bb=flat[11],
            alive=flat[12], spec=flat[13], ppdf=flat[14],
            cw=flat[15], es=flat[16],
            pixel=st["pixel"], sample=st["sample"],
        )

    zeros = jnp.zeros((total,), jnp.float32)
    st = dict(
        ox=o[:, 0], oy=o[:, 1], oz=o[:, 2],
        dx=d[:, 0], dy=d[:, 1], dz=d[:, 2],
        br=zeros + 1.0, bg=zeros + 1.0, bb=zeros + 1.0,
        lr=zeros, lg=zeros, lb=zeros,
        alive=alive0, spec=zeros + 1.0, ppdf=zeros,
        cw=zeros + jnp.float32(cone_w0), es=zeros + 1.0,
        pixel=pixel.astype(jnp.uint32), sample=sample.astype(jnp.uint32),
    )

    if max_depth <= 1 or not reorder_on:
        st = phase(st, 0, max_depth)
        L = jnp.stack([st["lr"], st["lg"], st["lb"]], axis=-1)[:n]
    else:
        # PHASE SPLIT + OCTANT REORDER (round 5): run the coherent camera
        # bounce, then sort the wavefront by bounce-ray direction octant
        # with dead lanes grouped LAST — rows become direction-coherent
        # (the near-to-far cluster order and slab culls work again) and
        # all-dead blocks skip the remaining bounces entirely via the
        # in-kernel exit (compaction-lite without a compaction kernel).
        # Per-lane math is order-independent (counter RNG rides pixel/
        # sample), so the result is exactly the unsorted estimator.
        def reorder(st):
            # sort key: direction octant (3 bits) x 4^3 origin cell (6
            # bits), dead lanes last.  Octant is the major key — the slab
            # cull cares most about direction agreement within a row; the
            # origin cell then groups rays whose near-to-far cluster order
            # agrees.
            def cell(v):
                lo = jnp.min(v)
                sc = 3.999 / jnp.maximum(jnp.max(v) - lo, 1e-6)
                return jnp.clip(((v - lo) * sc).astype(jnp.int32), 0, 3)

            octant = (
                (st["dx"] < 0).astype(jnp.int32) * 4
                + (st["dy"] < 0).astype(jnp.int32) * 2
                + (st["dz"] < 0).astype(jnp.int32)
            )
            ocell = cell(st["ox"]) * 16 + cell(st["oy"]) * 4 + cell(st["oz"])
            key = jnp.where(
                st["alive"] < 0.5, jnp.int32(8 * 64), octant * 64 + ocell
            )
            perm = jnp.argsort(key, stable=True)
            f32b = lambda u: jax.lax.bitcast_convert_type(u, jnp.float32)
            u32b = lambda f: jax.lax.bitcast_convert_type(f, jnp.uint32)
            keys17 = ("ox", "oy", "oz", "dx", "dy", "dz", "br", "bg", "bb",
                      "lr", "lg", "lb", "alive", "spec", "ppdf", "cw", "es")
            packed = jnp.stack(
                [st[k] for k in keys17]
                + [f32b(st["pixel"]), f32b(st["sample"])], axis=-1,
            )
            packed = jnp.take(packed, perm, axis=0)
            st = {k: packed[:, i] for i, k in enumerate(keys17)}
            st["pixel"] = u32b(packed[:, 17])
            st["sample"] = u32b(packed[:, 18])
            return st, perm

        st = phase(st, 0, 1)
        perms = []
        for b in range(1, max_depth):
            st, perm = reorder(st)
            perms.append(perm)
            left = max_depth - b
            nb = left if b >= resort_until else 1
            st = phase(st, b, nb)
            if nb == left:
                break
        Lp = jnp.stack([st["lr"], st["lg"], st["lb"]], axis=-1)
        # undo the whole sort chain, innermost last
        for p_ in reversed(perms):
            Lp = jnp.take(Lp, jnp.argsort(p_), axis=0)
        L = Lp[:n]
    bad = ~jnp.all(jnp.isfinite(L), axis=-1)
    return jnp.where(bad[..., None], 0.0, jnp.maximum(L, 0.0))


@functools.lru_cache(maxsize=32)
def _make_mesh_fused(cfg, interpret, use_cone):
    """custom_vjp closure: kernel forward, path-replay backward through the
    jnp chain (same RNG streams) — see pallas_megakernel._make_fused."""

    @jax.custom_vjp
    def f(scene, o, d, pixel, sample, seed, cone_w0, cone_sp):
        return _mesh_li_fwd(
            scene, o, d, pixel, sample, seed, cone_w0, cone_sp,
            max_depth=cfg.max_depth, rr_start=cfg.rr_start_depth,
            rr_threshold=cfg.rr_threshold, interpret=interpret,
            use_cone=use_cone,
        )

    def fwd(scene, o, d, pixel, sample, seed, cone_w0, cone_sp):
        return f(scene, o, d, pixel, sample, seed, cone_w0, cone_sp), (
            scene, o, d, pixel, sample, seed, cone_w0, cone_sp,
        )

    def bwd(res, g):
        from gopbrt_tpu.models import integrators

        scene, o, d, pixel, sample, seed, cone_w0, cone_sp = res

        def replay(scene, o, d, w0, sp):
            return integrators._li_jnp(
                scene, o, d, pixel, sample, seed, cfg,
                cone=((w0, sp) if use_cone else None),
            )

        _, vjp = jax.vjp(replay, scene, o, d, cone_w0, cone_sp)
        gs, go, gd, gw0, gsp = vjp(g)
        f0 = lambda x: np.zeros(np.shape(x), jax.dtypes.float0)
        return gs, go, gd, f0(pixel), f0(sample), f0(seed), gw0, gsp

    f.defvjp(fwd, bwd)
    return f


def mesh_li_fused(scene, o, d, pixel, sample, seed, cfg, interpret=False,
                  cone=None):
    """Drop-in for integrators.li on mesh fast-path scenes
    (scene.fastinfo.mesh_ok + scene.meshkernel attached)."""
    n = o.shape[0]
    pixel = jnp.broadcast_to(jnp.asarray(pixel, jnp.uint32), (n,))
    sample = jnp.broadcast_to(jnp.asarray(sample, jnp.uint32), (n,))
    use_cone = cone is not None
    w0 = jnp.asarray(cone[0] if use_cone else 0.0, jnp.float32)
    sp = jnp.asarray(cone[1] if use_cone else 0.0, jnp.float32)
    return _make_mesh_fused(cfg, interpret, use_cone)(
        scene, o, d, pixel, sample, jnp.asarray(seed, jnp.uint32), w0, sp
    )
