"""Pallas TPU kernel: fused ray-scene intersection over the primitive table.

The "native tier" of the framework (SURVEY §2.1): the reference's hot
intersection loop — BVH leaf tests + robust sphere/disk intersects
(``pkg/accelerator/bvh.go:659-765``, ``pkg/pbrt/sphere.go:64-135``,
``pkg/shapes/disk.go:64-159``) — as a single fused TPU kernel.

Why a kernel: the jnp brute-force path lowers to a chain of HBM-bound
elementwise ops over [P, N] intermediates (~2 orders of magnitude off
roofline).  Here each grid step loads a block of rays into VMEM once,
loops over primitives with their (tiny) tables resident in SMEM, and keeps
the running (t_best, idx_best) in registers — the classic
wavefront-ray-casting layout, mapped to the VPU.

Layout notes (see pallas_guide):
  * rays as separate per-component [N] arrays -> lane-major [BLOCK] vectors
  * primitive scalars in SMEM, read per loop iteration
  * static unroll for small P; lax.fori_loop beyond
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gopbrt_tpu.ops.intersect import Primitives, SPHERE, DISK, TRIANGLE

SUB = 8  # sublane dim of a block (f32 native tile height)
LANE = 1024  # lane dim of a block
BLOCK = SUB * LANE  # rays per grid step
_BIG = 1e30
UNROLL_MAX = 32  # static-unroll primitive loop below this count


def _prim_test(ptype, m, pr, ox, oy, oz, dx, dy, dz, t_limit,
               types=(SPHERE, DISK, TRIANGLE), full_sph=False, full_disk=False):
    """One primitive vs a block of rays -> candidate t ([B] f32, _BIG miss).

    ptype/m/pr are scalars (python or traced); rays are [B] vectors.
    m: 12 affine world->object entries (row-major 3x4); pr: 9 params.
    types/full_sph/full_disk are STATIC (from Primitives.pinfo): absent
    shape kernels and the partial-sphere/disk clip tests compile out.
    """
    if SPHERE in types or DISK in types:
        # world->object transform (triangles live in world space)
        oox = m[0] * ox + m[1] * oy + m[2] * oz + m[3]
        ooy = m[4] * ox + m[5] * oy + m[6] * oz + m[7]
        ooz = m[8] * ox + m[9] * oy + m[10] * oz + m[11]
        odx = m[0] * dx + m[1] * dy + m[2] * dz
        ody = m[4] * dx + m[5] * dy + m[6] * dz
        odz = m[8] * dx + m[9] * dy + m[10] * dz

    if (SPHERE in types and not full_sph) or (DISK in types and not full_disk):
        # phi <= phi_max without atan2 (unsupported in Pallas TPU lowering):
        # wedge test against the phi_max ray via sign of the 2D cross product.
        sin_pm = jnp.sin(pr[3])
        cos_pm = jnp.cos(pr[3])
        pm_le_pi = pr[3] <= math.pi

        def in_wedge(x, y):
            # (Mosaic cannot select between i1 vectors — use logical ops)
            cross = x * sin_pm - y * cos_pm
            narrow = (y >= 0.0) & (cross >= 0.0)
            wide = ~((y < 0.0) & (cross < 0.0))
            return (pm_le_pi & narrow) | (~pm_le_pi & wide)

    t_best = None

    if SPHERE in types:
        # --- sphere (params: radius, zmin, zmax, phimax) — recentred
        # quadratic (perpendicular-foot form; see ops.intersect._sphere_roots)
        radius = pr[0]
        a = odx * odx + ody * ody + odz * odz
        safe_a = jnp.where(a == 0.0, 1.0, a)
        t_foot = -(oox * odx + ooy * ody + ooz * odz) / safe_a
        fx = oox + odx * t_foot
        fy = ooy + ody * t_foot
        fz = ooz + odz * t_foot
        disc_core = radius * radius - (fx * fx + fy * fy + fz * fz)
        ok = (disc_core >= 0.0) & (a > 0.0)
        delta = jnp.sqrt(jnp.maximum(disc_core, 0.0) / safe_a)
        lo = t_foot - delta
        hi = t_foot + delta
        olen = jnp.sqrt(jnp.maximum(oox * oox + ooy * ooy + ooz * ooz, 1.0))
        dlen = jnp.sqrt(jnp.maximum(a, 1e-20))
        t_eps = 1e-4 * olen / dlen

        if full_sph:
            def clip_ok(t):
                return True
        else:
            def clip_ok(t):
                px = oox + odx * t
                py = ooy + ody * t
                pz = ooz + odz * t
                norm = jnp.sqrt(jnp.maximum(px * px + py * py + pz * pz, 1e-20))
                s = radius / norm
                pz = pz * s
                ppx = px * s
                ppy = py * s
                full = (pr[1] <= -radius) & (pr[2] >= radius) & (
                    pr[3] >= 2.0 * math.pi - 1e-6
                )
                part = (pz >= pr[1]) & (pz <= pr[2]) & in_wedge(ppx, ppy)
                return full | part

        v0 = ok & (lo > t_eps) & (lo < t_limit) & clip_ok(lo)
        v1 = ok & (hi > t_eps) & (hi < t_limit) & clip_ok(hi)
        t_best = jnp.where(v0, lo, jnp.where(v1, hi, _BIG))

    if DISK in types:
        # --- disk (params: height, radius, inner, phimax)
        parallel = jnp.abs(odz) < 1e-12
        t_pl = (pr[0] - ooz) / jnp.where(parallel, 1.0, odz)
        pxd = oox + odx * t_pl
        pyd = ooy + ody * t_pl
        d2 = pxd * pxd + pyd * pyd
        vd = (
            (~parallel)
            & (t_pl > 1e-4)
            & (t_pl < t_limit)
            & (d2 <= pr[1] * pr[1])
        )
        if not full_disk:
            fd = pr[3] >= 2.0 * math.pi - 1e-6
            vd = vd & (d2 >= pr[2] * pr[2]) & (fd | in_wedge(pxd, pyd))
        t_dsk = jnp.where(vd, t_pl, _BIG)
        if t_best is None:
            t_best = t_dsk
        else:
            t_best = jnp.where(ptype == DISK, t_dsk, t_best)

    if TRIANGLE in types:
        # --- triangle (params: 3 world-space vertices), Moller-Trumbore
        e1x, e1y, e1z = pr[3] - pr[0], pr[4] - pr[1], pr[5] - pr[2]
        e2x, e2y, e2z = pr[6] - pr[0], pr[7] - pr[1], pr[8] - pr[2]
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        degen = jnp.abs(det) < 1e-12
        inv_det = 1.0 / jnp.where(degen, 1.0, det)
        tvx, tvy, tvz = ox - pr[0], oy - pr[1], oz - pr[2]
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
        tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
        vt = (
            (~degen)
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (tt > 1e-4)
            & (tt < t_limit)
        )
        t_tri = jnp.where(vt, tt, _BIG)
        if t_best is None:
            t_best = t_tri
        else:
            t_best = jnp.where(ptype == TRIANGLE, t_tri, t_best)

    return t_best


def _intersect_kernel(
    n_prims, any_hit, types, full_sph, full_disk,
    ptype_ref, w2o_ref, params_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
    t_out, idx_out,
):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    t_best = tmax_ref[:]
    idx_best = jnp.full(ox.shape, -1, jnp.int32)

    def step(p, t_best, idx_best):
        ptype = ptype_ref[p]
        m = [w2o_ref[p, k] for k in range(12)]
        pr = [params_ref[p, k] for k in range(9)]
        tp = _prim_test(ptype, m, pr, ox, oy, oz, dx, dy, dz, t_best,
                        types=types, full_sph=full_sph, full_disk=full_disk)
        better = tp < t_best
        return (
            jnp.where(better, tp, t_best),
            jnp.where(better, p, idx_best),
        )

    if n_prims <= UNROLL_MAX:
        for p in range(n_prims):
            t_best, idx_best = step(p, t_best, idx_best)
    else:
        def body(p, carry):
            return step(p, *carry)

        t_best, idx_best = jax.lax.fori_loop(
            0, n_prims, body, (t_best, idx_best)
        )
    t_out[:] = t_best
    idx_out[:] = idx_best


def _flatten_w2o(prims: Primitives) -> jnp.ndarray:
    """[P, 12] row-major affine world->object (rows 0..2 of the 4x4)."""
    return prims.world_to_obj[:, :3, :].reshape(prims.count, 12)


@functools.partial(jax.jit, static_argnames=("interpret",))
def intersect_brute_pallas(prims: Primitives, o, d, t_max, interpret=False):
    """Drop-in replacement for ops.intersect.intersect_brute (phase-1).

    Returns (hit[N], t[N], prim_idx[N]).  Rays padded to BLOCK multiples.
    """
    n = o.shape[0]
    p_cnt = prims.count
    pad = (-n) % BLOCK
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], d.dtype), (pad, 1))])
        t_max = jnp.concatenate([t_max, jnp.full((pad,), -1.0, t_max.dtype)])
    total = n + pad
    rows = total // LANE

    def as2d(x):
        return x.reshape(rows, LANE)

    grid = (rows // SUB,)
    ray_spec = pl.BlockSpec(
        (SUB, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    smem = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.SMEM
    )
    pinfo = prims.pinfo
    kernel = functools.partial(
        _intersect_kernel, p_cnt, False,
        prims.types,
        pinfo.all_full_spheres if pinfo is not None else False,
        pinfo.all_full_disks if pinfo is not None else False,
    )
    t, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            smem((p_cnt,)),
            smem((p_cnt, 12)),
            smem((p_cnt, 9)),
            ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
            ray_spec,
        ],
        out_specs=[ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANE), jnp.int32),
        ],
        interpret=interpret,
    )(
        prims.prim_type,
        _flatten_w2o(prims),
        prims.params,
        as2d(o[:, 0]), as2d(o[:, 1]), as2d(o[:, 2]),
        as2d(d[:, 0]), as2d(d[:, 1]), as2d(d[:, 2]),
        as2d(t_max),
    )
    t, idx = t.reshape(total)[:n], idx.reshape(total)[:n]
    hit = idx >= 0
    return hit, jnp.where(hit, t, t_max[:n]), jnp.maximum(idx, 0)


def _intersect_any_kernel(
    n_prims, types, full_sph, full_disk,
    ptype_ref, w2o_ref, params_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
    occ_out,
):
    """TRUE any-hit (VisibilityTester.Unoccluded, light.go:46-48): no winner
    reduction, and the primitive loop exits as soon as every lane in the
    block is resolved (occluded, or dead: t_max <= 2e-4 marks the masked
    shadow rays the integrators emit for non-contributing lanes).  Shadow
    rays are ~half of all traversal work (one per NEE vertex,
    integrator.go:87-130) — this is the early-out the reference's
    IntersectP traversal gets from its stack walk (bvh.go:767-823)."""
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tmax = tmax_ref[:]
    dead = tmax <= 2e-4
    occ0 = jnp.zeros(ox.shape, jnp.int32)

    def step(p, occ):
        ptype = ptype_ref[p]
        m = [w2o_ref[p, k] for k in range(12)]
        pr = [params_ref[p, k] for k in range(9)]
        tp = _prim_test(ptype, m, pr, ox, oy, oz, dx, dy, dz, tmax,
                        types=types, full_sph=full_sph, full_disk=full_disk)
        return occ | (tp < tmax).astype(jnp.int32)

    if n_prims <= UNROLL_MAX:
        occ = occ0
        for p in range(n_prims):
            occ = step(p, occ)
    else:
        def cond(carry):
            p, occ = carry
            return (p < n_prims) & ~jnp.all((occ > 0) | dead)

        def body(carry):
            p, occ = carry
            return p + 1, step(p, occ)

        _, occ = jax.lax.while_loop(cond, body, (jnp.int32(0), occ0))
    occ_out[:] = occ


@functools.partial(jax.jit, static_argnames=("interpret",))
def intersect_p_brute_pallas(prims: Primitives, o, d, t_max, interpret=False):
    """Any-hit variant (shadow rays). Returns bool[N]."""
    n = o.shape[0]
    p_cnt = prims.count
    pad = (-n) % BLOCK
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], d.dtype), (pad, 1))])
        t_max = jnp.concatenate([t_max, jnp.full((pad,), -1.0, t_max.dtype)])
    total = n + pad
    rows = total // LANE

    def as2d(x):
        return x.reshape(rows, LANE)

    grid = (rows // SUB,)
    ray_spec = pl.BlockSpec(
        (SUB, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    smem = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.SMEM
    )
    pinfo = prims.pinfo
    kernel = functools.partial(
        _intersect_any_kernel, p_cnt,
        prims.types,
        pinfo.all_full_spheres if pinfo is not None else False,
        pinfo.all_full_disks if pinfo is not None else False,
    )
    occ = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            smem((p_cnt,)),
            smem((p_cnt, 12)),
            smem((p_cnt, 9)),
            ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
            ray_spec,
        ],
        out_specs=[ray_spec],
        out_shape=[jax.ShapeDtypeStruct((rows, LANE), jnp.int32)],
        interpret=interpret,
    )(
        prims.prim_type,
        _flatten_w2o(prims),
        prims.params,
        as2d(o[:, 0]), as2d(o[:, 1]), as2d(o[:, 2]),
        as2d(d[:, 0]), as2d(d[:, 1]), as2d(d[:, 2]),
        as2d(t_max),
    )[0]
    return occ.reshape(total)[:n] > 0
