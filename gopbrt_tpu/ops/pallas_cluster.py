"""Pallas TPU two-level intersection: cluster culling + prim-per-sublane.

The TPU-native replacement for divergent per-ray BVH traversal
(``pkg/accelerator/bvh.go:659-765``).  A stack-based traversal is a scalar,
gather-heavy algorithm — measured at ~125 us/ray as an XLA lockstep
while_loop (per-lane node gathers serialize).  This kernel re-shapes the
problem to what the VPU actually does well:

  * primitives are ordered by the SAH BVH's leaf order (spatially coherent)
    and chunked into K clusters of M consecutive prims with precomputed
    AABBs — the "two-level BVH" flattened to one level of culling;
  * each grid step holds a block of RB rays in VMEM ([1, RB] lane vectors);
  * per cluster: a slab test of the cluster AABB against the whole block
    (pure VPU), then ``pl.when(any hit)`` skips the member tests for blocks
    that miss the cluster — divergence is paid at block granularity, not
    per lane;
  * member tests process 8 primitives per VPU op: prim attributes load as
    [8, 1] sublane columns straight from VMEM (no scalar/gather path) and
    broadcast against the [1, RB] rays — the shared ``_prim_test`` math
    evaluates [8, RB] ray-prim pairs per instruction;
  * running (t_best, prim) lives in VMEM scratch; sublanes reduce at the
    end.

Rays arrive in image order (row bands), so primary and shadow blocks are
coherent and most clusters are skipped; incoherent bounce blocks degrade
toward brute force over clusters their rays touch — still gather-free.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gopbrt_tpu.ops.intersect import Primitives, SPHERE, DISK, TRIANGLE
from gopbrt_tpu.ops.pallas_intersect import _prim_test, _flatten_w2o

RB = 1024       # ray lanes per row
RROWS = 8       # ray rows per grid step (f32 sublane tiling requires 8)
M = 128         # prims per cluster (16 sublane-steps of 8)
SUB = 8         # prims tested per VPU op (f32 sublane count)
_BIG = 1e30

# prim-record columns (f32[P_pad, 24]): 12 w2o | 9 params | ptype | pad
_C_W2O = 0
_C_PAR = 12
_C_TYPE = 21
_C_K = 24


class Clusters:
    """Device-side cluster table (host-built once per scene).

    Registered as a pytree so it can ride the Scene; the prim order mapping
    (cluster slot -> original prim id) stays on device for the final
    winner-id translation.
    """

    def __init__(self, tri, cbounds, order, n_prims, n_clusters):
        self.tri = tri            # f32[K*M, _C_K]
        self.cbounds = cbounds    # f32[K, 8] (lo3, hi3, pad)
        self.order = order        # int32[K*M] slot -> original prim id (-1 pad)
        self.n_prims = n_prims
        self.n_clusters = n_clusters

    def tree_flatten(self):
        return (self.tri, self.cbounds, self.order), (self.n_prims, self.n_clusters)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


jax.tree_util.register_pytree_node(
    Clusters, Clusters.tree_flatten, Clusters.tree_unflatten
)


def build_clusters(prims: Primitives, lo: np.ndarray, hi: np.ndarray,
                   order: np.ndarray) -> Clusters:
    """Host build: chunk BVH-leaf-ordered prims into M-sized clusters.

    lo/hi: per-prim world AABBs [P,3]; order: spatially coherent permutation
    (LinearBVH.prim_order).  Padding slots carry a far-away zero-radius
    sphere record that can never hit.
    """
    p = int(prims.prim_type.shape[0])
    order = np.asarray(order, np.int64)
    k = max(1, -(-p // M))
    total = k * M
    rec = np.zeros((total, _C_K), np.float32)
    # pad record: zero-radius sphere translated to 1e30 (guaranteed miss)
    rec[:, _C_W2O + 3] = 1e30
    rec[:, _C_TYPE] = float(SPHERE)
    w2o = np.asarray(_flatten_w2o(prims))
    params = np.asarray(prims.params)
    ptype = np.asarray(prims.prim_type)
    rec[:p, _C_W2O:_C_W2O + 12] = w2o[order]
    rec[:p, _C_PAR:_C_PAR + 9] = params[order]
    rec[:p, _C_TYPE] = ptype[order].astype(np.float32)
    slot_to_prim = np.full((total,), -1, np.int32)
    slot_to_prim[:p] = order.astype(np.int32)
    cb = np.zeros((k, 8), np.float32)
    cb[:, 0:3] = np.inf
    cb[:, 3:6] = -np.inf
    lo_o, hi_o = np.asarray(lo)[order], np.asarray(hi)[order]
    for c in range(k):
        a, b = c * M, min((c + 1) * M, p)
        if a < p:
            cb[c, 0:3] = lo_o[a:b].min(axis=0)
            cb[c, 3:6] = hi_o[a:b].max(axis=0)
    # empty/pad clusters keep the inverted box (slab test always misses)
    cb = np.nan_to_num(cb, posinf=3e37, neginf=-3e37)
    return Clusters(
        tri=jnp.asarray(rec),
        cbounds=jnp.asarray(cb),
        order=jnp.asarray(slot_to_prim),
        n_prims=p,
        n_clusters=k,
    )


def _cluster_kernel(
    n_clusters, types, full_sph, full_disk, any_hit,
    cb_ref,  # SMEM f32[K, 8]
    tri_ref,  # VMEM f32[K*M, _C_K]
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,  # [RROWS, RB]
    t_out, idx_out,  # [RROWS, RB]
    t_sc, idx_sc,  # scratch [SUB, RB]
):
    # one row of RB rays at a time: ray data stays a [1, RB] lane vector so
    # the SUB sublanes carry 8 different primitives per VPU op
    for r in range(RROWS):
        _trace_row(
            n_clusters, types, full_sph, full_disk, any_hit,
            cb_ref, tri_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
            t_out, idx_out, t_sc, idx_sc, r,
        )


def _trace_row(
    n_clusters, types, full_sph, full_disk, any_hit,
    cb_ref, tri_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
    t_out, idx_out, t_sc, idx_sc, r,
):
    ox, oy, oz = ox_ref[r : r + 1, :], oy_ref[r : r + 1, :], oz_ref[r : r + 1, :]
    dx, dy, dz = dx_ref[r : r + 1, :], dy_ref[r : r + 1, :], dz_ref[r : r + 1, :]
    tmax = tmax_ref[r : r + 1, :]
    inv = lambda v: 1.0 / jnp.where(
        jnp.abs(v) < 1e-20, jnp.where(v < 0, -1e-20, 1e-20), v
    )
    idx, idy, idz = inv(dx), inv(dy), inv(dz)

    if any_hit:
        # TRUE any-hit (bvh.go:767-823 IntersectP): lanes that are dead
        # (t_max <= 2e-4, the integrators' masked shadow rays) start with a
        # poisoned t so the slab test culls every cluster for them; lanes
        # that find any hit get poisoned the same way below.  Once a whole
        # block is resolved the ``pl.when(any(hit_box))`` gate skips the
        # member tests of every remaining cluster — the early-out.
        t_sc[:] = jnp.broadcast_to(
            jnp.where(tmax <= 2e-4, -1.0, tmax), (SUB, RB)
        )
    else:
        t_sc[:] = jnp.broadcast_to(tmax, (SUB, RB))
    idx_sc[:] = jnp.full((SUB, RB), -1, jnp.int32)
    # sublane slot offsets 0..7 for global prim-slot ids
    sub_off = jax.lax.broadcasted_iota(jnp.int32, (SUB, RB), 0)

    def cluster_body(c, _):
        # slab test of the cluster AABB against the whole block (SMEM
        # scalars x [1, RB] vectors; bounds.go:149-185 semantics)
        lox, loy, loz = cb_ref[c, 0], cb_ref[c, 1], cb_ref[c, 2]
        hix, hiy, hiz = cb_ref[c, 3], cb_ref[c, 4], cb_ref[c, 5]
        t_cur = jnp.min(t_sc[:], axis=0, keepdims=True)
        tx0 = (lox - ox) * idx
        tx1 = (hix - ox) * idx
        ty0 = (loy - oy) * idy
        ty1 = (hiy - oy) * idy
        tz0 = (loz - oz) * idz
        tz1 = (hiz - oz) * idz
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.maximum(jnp.minimum(tz0, tz1), 0.0),
        )
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.minimum(jnp.maximum(tz0, tz1), t_cur),
        ) * 1.0001
        hit_box = tn <= tf

        @pl.when(jnp.any(hit_box))
        def _():
            # one [M, _C_K] cluster-tile load, then static [SUB] slices —
            # per-step dynamic loads would serialize the member loop
            ctile = tri_ref[pl.ds(c * M, M), :]
            for j in range(M // SUB):
                tile = ctile[j * SUB : (j + 1) * SUB, :]
                m = [tile[:, _C_W2O + k : _C_W2O + k + 1] for k in range(12)]
                pr = [tile[:, _C_PAR + k : _C_PAR + k + 1] for k in range(9)]
                pt = tile[:, _C_TYPE : _C_TYPE + 1].astype(jnp.int32)
                t_best = t_sc[:]
                tp = _prim_test(
                    pt, m, pr, ox, oy, oz, dx, dy, dz, t_best,
                    types=types, full_sph=full_sph, full_disk=full_disk,
                )
                better = tp < t_best
                t_sc[:] = jnp.where(better, tp, t_best)
                idx_sc[:] = jnp.where(
                    better, c * M + j * SUB + sub_off, idx_sc[:]
                )
            if any_hit:
                # poison resolved lanes: every later cluster slab-misses
                # them, and fully resolved blocks skip member tests
                occ_row = jnp.max(idx_sc[:], axis=0, keepdims=True) >= 0
                t_sc[:] = jnp.where(
                    jnp.broadcast_to(occ_row, (SUB, RB)), -1.0, t_sc[:]
                )

        return 0

    jax.lax.fori_loop(0, n_clusters, cluster_body, 0)

    if any_hit:
        # no winner reduction: occluded iff any sublane accepted a hit
        occ = jnp.max(idx_sc[:], axis=0, keepdims=True)
        t_out[r : r + 1, :] = tmax
        idx_out[r : r + 1, :] = occ
        return

    # reduce the SUB per-sublane bests to the row winner
    t_all = t_sc[:]
    i_all = idx_sc[:]
    t_best = t_all[0:1]
    i_best = i_all[0:1]
    for srow in range(1, SUB):
        cand_t = t_all[srow : srow + 1]
        cand_i = i_all[srow : srow + 1]
        better = cand_t < t_best
        t_best = jnp.where(better, cand_t, t_best)
        i_best = jnp.where(better, cand_i, i_best)
    t_out[r : r + 1, :] = t_best
    idx_out[r : r + 1, :] = i_best


def _cluster_call(clusters: Clusters, prims: Primitives, o, d, t_max,
                  interpret, any_hit):
    n = o.shape[0]
    pad = (-n) % (RROWS * RB)
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate(
            [d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], d.dtype), (pad, 1))]
        )
        t_max = jnp.concatenate([t_max, jnp.full((pad,), -1.0, t_max.dtype)])
    total = n + pad
    rows = total // RB

    def as2d(x):
        return x.reshape(rows, RB)

    ray_spec = pl.BlockSpec((RROWS, RB), lambda i: (i, 0), memory_space=pltpu.VMEM)
    pinfo = prims.pinfo
    kernel = functools.partial(
        _cluster_kernel,
        clusters.n_clusters,
        prims.types,
        pinfo.all_full_spheres if pinfo is not None else False,
        pinfo.all_full_disks if pinfo is not None else False,
        any_hit,
    )
    t, slot = pl.pallas_call(
        kernel,
        grid=(rows // RROWS,),
        in_specs=[
            pl.BlockSpec(
                (clusters.n_clusters, 8),
                lambda i: (0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tri table, whole
            ray_spec, ray_spec, ray_spec,
            ray_spec, ray_spec, ray_spec,
            ray_spec,
        ],
        out_specs=[ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, RB), jnp.float32),
            jax.ShapeDtypeStruct((rows, RB), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((SUB, RB), jnp.float32),
            pltpu.VMEM((SUB, RB), jnp.int32),
        ],
        interpret=interpret,
    )(
        clusters.cbounds,
        clusters.tri,
        as2d(o[:, 0]), as2d(o[:, 1]), as2d(o[:, 2]),
        as2d(d[:, 0]), as2d(d[:, 1]), as2d(d[:, 2]),
        as2d(t_max),
    )
    return t, slot, total


@functools.partial(jax.jit, static_argnames=("interpret",))
def cluster_intersect(clusters: Clusters, prims: Primitives, o, d, t_max,
                      interpret=False):
    """Closest hit over the cluster table: (hit[N], t[N], prim_idx[N])."""
    n = o.shape[0]
    t, slot, total = _cluster_call(
        clusters, prims, o, d, t_max, interpret, False
    )
    slot = slot.reshape(total)[:n]
    t = t.reshape(total)[:n]
    hit = slot >= 0
    # slot -> original prim id (one [N] gather; slots are BVH-leaf order)
    prim = clusters.order[jnp.maximum(slot, 0)]
    return hit, jnp.where(hit, t, t_max[:n]), jnp.maximum(prim, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def cluster_intersect_p(clusters: Clusters, prims: Primitives, o, d, t_max,
                        interpret=False):
    """TRUE any-hit variant (shadow rays): first accepted hit poisons the
    lane so later clusters slab-cull it; fully resolved blocks skip member
    tests entirely.  Returns bool[N]."""
    n = o.shape[0]
    _, occ, total = _cluster_call(
        clusters, prims, o, d, t_max, interpret, True
    )
    return occ.reshape(total)[:n] >= 0
