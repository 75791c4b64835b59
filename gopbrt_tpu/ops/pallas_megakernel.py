"""Pallas TPU bounce MEGAKERNEL: the whole path-tracing loop in one kernel.

Round-2 profiling (BENCH_NOTES.md) showed the per-bounce jnp shading chain
costs ~280 of 313 ms/pass in XLA relayout copies and HBM round-trips between
fusions, while the Pallas intersect kernels cost 33.5 ms.  This kernel is
the prescribed fix: each grid step loads a block of camera rays into VMEM
once and carries the per-lane path state (o, d, beta, L, masks, MIS pdf)
through ALL bounces in VMEM — intersect, shade, NEE + shadow ray, BSDF
sample, and Russian roulette fused into a single launch.  State never
touches HBM between bounces.

Scope (the closed fast-path set, ops/static_info.FastPathInfo — the demo
workload of the reference, ``internal/render/server.go:30-164``):
  shapes     sphere / disk (partial clips supported via the shared
             ``pallas_intersect._prim_test``)
  materials  matte with sigma == 0 (pure Lambert; kd constant or planar
             checkerboard), mirror (delta reflection, constant kr), and
             SMOOTH glass (FresnelSpecular R/T with etaScale,
             reflection.go:465-536, ref bug #8 fixed like the jnp chain)
  lights     point / distant / sphere diffuse-area, global (uniform/power)
             light distribution
  transforms rigid + uniform scale, det > 0, no reverse orientation
Scenes outside the set run the general jnp wavefront chain in
models/integrators.py; gradients run there too (path-replay backward, see
``path_li_fused``).

The math intentionally mirrors the jnp chain op-for-op — same counter-based
RNG streams (ops/rng.py dimension layout), same warps, same MIS weights
(EstimateDirect semantics, ``pkg/pbrt/integrator.go:79-195``; Path.Li loop,
``pkg/integrator/path.go:32-157``) — so both backends estimate the same
integral with the same sample sequences and can be cross-checked
statistically (tests/test_megakernel.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gopbrt_tpu.ops.geom import ONE_MINUS_EPSILON, SHADOW_EPSILON
from gopbrt_tpu.ops.pallas_intersect import _prim_test, _flatten_w2o
from gopbrt_tpu.ops.rng import (
    DIM_BOUNCE_BASE,
    DIMS_PER_BOUNCE,
    D_LIGHT_PICK,
    D_LIGHT_UV,
    D_BSDF_UV,
    D_BSDF_LOBE,
    D_RR,
)

SUB = 8
LANE = 256
BLOCK = SUB * LANE
_BIG = 1e30
PI = math.pi
INV_PI = 1.0 / math.pi
_GOLDEN = 0x9E3779B9
# split the fused bounce loop after this many bounces and sort the
# wavefront dead-lanes-last before the tail (round 5); <= 0 disables
import os as _os
_BRUTE_SPLIT = int(_os.environ.get("GOPBRT_BRUTE_SPLIT", "0"))

# shade-table column layout (per primitive, f32[P, _SH_K])
_SH_C1 = 0        # 0-2  kd constant / checker colour 1
_SH_C2 = 3        # 3-5  checker colour 2
_SH_CHK = 6       # is_checker flag
_SH_VS = 7        # 7-9  planar mapping s axis
_SH_VT = 10       # 10-12 planar mapping t axis
_SH_DS = 13       # 13-14 mapping offsets
_SH_ALID = 15     # area_light_id (-1 none)
_SH_SCALE2 = 16   # sigma^2 of the uniform scale (o2w_lin = s^2 * w2o_lin^T)
_SH_TSS = 17      # |vs| texture-mapping scale (checker AA filter width)
_SH_TST = 18      # |vt|
_SH_MIR = 19      # is_mirror flag (SpecularReflection, reflection.go:538-574)
_SH_KR = 20       # 20-22 mirror/glass reflectance
_SH_GLS = 23      # is SMOOTH glass flag (FresnelSpecular, reflection.go:465-536)
_SH_KT = 24       # 24-26 glass transmittance
_SH_ETA = 27      # glass interior IOR
_SH_RGL = 28      # is ROUGH glass flag (GGX R+T, glass.go:49-72; quirk #5)
_SH_ALPHA = 29    # GGX alpha (already remapped at build)
_SH_K = 30

# light aux column layout (per light, f32[L, 8])
_LA_TWO = 0       # two_sided flag
_LA_CX = 1        # 1-3 sphere-emitter world center
_LA_RAD = 4       # sphere-emitter world radius
_LA_FUNC = 5      # light-distribution func value
_LA_K = 8


# ---------------------------------------------------------------------------
# In-kernel helpers on component triples ([SUB, LANE] f32 arrays)
# ---------------------------------------------------------------------------


def _hash_u32(x):
    """lowbias32 (ops/rng.hash_u32), on a u32 vector."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def _hash_combine(h, v):
    return _hash_u32(h ^ (v + jnp.uint32(_GOLDEN) + (h << 6) + (h >> 2)))


def _to_unit(x):
    """u32 -> f32 in [0,1) — MUST match ops/rng.u32_to_unit bit-for-bit
    (mantissa trick; Mosaic has no u32->f32 convert)."""
    bits = jnp.uint32(0x3F800000) | (x >> jnp.uint32(9))
    return jax.lax.bitcast_convert_type(bits, jnp.float32) - 1.0


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _cross3(ax, ay, az, bx, by, bz):
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _normalize3(x, y, z, eps):
    n2 = x * x + y * y + z * z
    inv = jnp.where(n2 > eps, 1.0, 0.0) / jnp.sqrt(
        jnp.maximum(n2, max(eps, 1e-30))
    )
    return x * inv, y * inv, z * inv


def _coord_system(vx, vy, vz):
    """Branch-free Duff frame (geom.coordinate_system) on triples."""
    sign = jnp.where(vz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + vz)
    b = vx * vy * a
    ux, uy, uz = 1.0 + sign * vx * vx * a, sign * b, -sign * vx
    wx, wy, wz = b, sign + vy * vy * a, -vy
    return (ux, uy, uz), (wx, wy, wz)


def _fresnel_diel(cos_i, eta):
    """Unpolarised dielectric Fresnel on triples (reflection.go:21-42):
    handles exiting rays (cos_i < 0) by swapping indices."""
    ci0 = jnp.clip(cos_i, -1.0, 1.0)
    entering = ci0 > 0.0
    ei = jnp.where(entering, 1.0, eta)
    et = jnp.where(entering, eta, 1.0)
    ci = jnp.abs(ci0)
    sin_i = jnp.sqrt(jnp.maximum(0.0, 1.0 - ci * ci))
    sin_t = ei / et * sin_i
    tir = sin_t >= 1.0
    ct = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_t * sin_t))
    r_parl = (et * ci - ei * ct) / jnp.maximum(et * ci + ei * ct, 1e-20)
    r_perp = (ei * ci - et * ct) / jnp.maximum(ei * ci + et * ct, 1e-20)
    return jnp.where(tir, 1.0, 0.5 * (r_parl * r_parl + r_perp * r_perp))


def _ggx_d(c_wh, alpha):
    """Isotropic GGX D from cos(wh, n) (microfacet.go:47-55)."""
    c2 = c_wh * c_wh
    t2 = (1.0 - c2) / jnp.maximum(c2, 1e-20)
    a2 = alpha * alpha
    e = t2 / jnp.maximum(a2, 1e-12)
    d = 1.0 / (PI * a2 * c2 * c2 * (1.0 + e) ** 2 + 1e-20)
    return jnp.where(c2 > 1e-16, d, 0.0)


def _ggx_lambda(c_w, alpha):
    """Smith Λ from cos(w, n) (microfacet.go:56-64)."""
    c2 = jnp.maximum(c_w * c_w, 1e-20)
    abs_tan = jnp.sqrt(jnp.maximum(0.0, 1.0 - c2) / c2)
    a2t2 = (alpha * abs_tan) ** 2
    return (-1.0 + jnp.sqrt(1.0 + a2t2)) / 2.0


def _power_heuristic(f, g):
    f2 = f * f
    g2 = g * g
    denom = f2 + g2
    return jnp.where(denom > 0.0, f2 / jnp.where(denom > 0.0, denom, 1.0), 0.0)


def _concentric_disk(u0, u1):
    """Shirley-Chiu map (ops/sampling.concentric_sample_disk) on lanes."""
    ox = 2.0 * u0 - 1.0
    oy = 2.0 * u1 - 1.0
    zero = (ox == 0.0) & (oy == 0.0)
    use_x = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(use_x, ox, oy)
    sx = ox / jnp.where(oy == 0.0, 1.0, oy)
    sy = oy / jnp.where(ox == 0.0, 1.0, ox)
    theta = jnp.where(use_x, (PI / 4.0) * sy, (PI / 2.0) - (PI / 4.0) * sx)
    dx = r * jnp.cos(theta)
    dy = r * jnp.sin(theta)
    return jnp.where(zero, 0.0, dx), jnp.where(zero, 0.0, dy)


def _offset_dist(nx, ny, nz, px, py, pz):
    """Spawn-ray offset distance: dot(|n|, p_err + 1e-4) with the world
    p_err approximated by gamma7*|p| (interaction.go:68 + ray.go:57-74;
    conservative vs the jnp chain's exact transformed error)."""
    g7 = 7.0 * 5.96e-08 / (1.0 - 7.0 * 5.96e-08)
    err = g7 * (jnp.abs(px) + jnp.abs(py) + jnp.abs(pz))
    return (jnp.abs(nx) + jnp.abs(ny) + jnp.abs(nz)) * 1e-4 + (
        jnp.abs(nx) * err + jnp.abs(ny) * err + jnp.abs(nz) * err
    )


def sphere_area_pdf_li(rx, ry, rz, wx, wy, wz, cx, cy, cz, rad):
    """Solid-angle pdf that sphere-cone sampling generates w from r
    (ops/lights.pdf_li sphere branch; sphere.go:346-363).  Shared by the
    brute and mesh megakernels (emitter-hit MIS weighting)."""
    tcx, tcy, tcz = cx - rx, cy - ry, cz - rz
    dc2 = tcx * tcx + tcy * tcy + tcz * tcz
    outside = dc2 > rad * rad * 1.00002
    sin2_tmax = jnp.clip(rad * rad / jnp.maximum(dc2, 1e-20), 0.0, 1.0)
    cos_tmax = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_tmax))
    ncx, ncy, ncz = _normalize3(tcx, tcy, tcz, 1e-20)
    cos_w = _dot3(ncx, ncy, ncz, wx, wy, wz)
    in_cone = cos_w >= cos_tmax - 1e-6
    pdf_cone = 1.0 / (
        2.0 * PI * (1.0 - jnp.minimum(cos_tmax, 1.0 - 1e-7))
    )
    pdf_out = jnp.where(outside & in_cone, pdf_cone, 0.0)
    # inside: analytic forward root of |oc + t w|^2 = rad^2
    ocx, ocy, ocz = -tcx, -tcy, -tcz
    b_half = _dot3(ocx, ocy, ocz, wx, wy, wz)
    oc2 = ocx * ocx + ocy * ocy + ocz * ocz
    disc = jnp.maximum(rad * rad - (oc2 - b_half * b_half), 0.0)
    t_hit = -b_half + jnp.sqrt(disc)
    nhx, nhy, nhz = _normalize3(
        ocx + wx * t_hit, ocy + wy * t_hit, ocz + wz * t_hit, 1e-20
    )
    cos_hit = jnp.abs(_dot3(nhx, nhy, nhz, wx, wy, wz))
    pdf_in = (t_hit * t_hit) / jnp.maximum(
        cos_hit * 4.0 * PI * rad * rad, 1e-12
    )
    return jnp.where(outside, pdf_out, pdf_in)


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _mega_kernel(
    # static
    n_prims, n_lights, n_bounces, rr_start, rr_threshold,
    types, full_sph, full_disk, any_checker, use_cone, any_glass, any_rough,
    # SMEM tables
    seed_ref, ptype_ref, w2o_ref, params_ref, shade_ref,
    ltype_ref, lpos_ref, lint_ref, laux_ref, lcdf_ref, scal_ref,
    # VMEM rays + full path state (round 5: the bounce loop can run in
    # phases with a host-side dead-lane sort between them, so state
    # enters and leaves the kernel)
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    pix_ref, samp_ref, alive_ref,
    br_ref, bg_ref, bb_ref, lri_ref, lgi_ref, lbi_ref,
    spc_ref, ppd_ref, cwi_ref, esi_ref,
    # outputs: radiance + carried state
    lr_ref, lg_ref, lb_ref,
    pox_ref, poy_ref, poz_ref, pdx_ref, pdy_ref, pdz_ref,
    pbr_ref, pbg_ref, pbb_ref, pal_ref, psp_ref, ppp_ref, pcw_ref,
    pes_ref,
    # scratch: path state between bounces + block-alive count
    st_sc, na_sc,
):
    f32 = jnp.float32
    seed = seed_ref[0]
    func_int = scal_ref[0]
    world_radius = scal_ref[1]
    cone_sp = scal_ref[3]
    start_b = scal_ref[4].astype(jnp.int32)  # absolute index of bounce 0

    # per-lane RNG stream base: hash_combine(hash_combine(seed, pixel), samp)
    pix = pix_ref[:]
    samp = samp_ref[:]
    h = _hash_combine(jnp.full(pix.shape, seed, jnp.uint32), pix)
    h_ps = _hash_combine(h, samp)

    def closest_hit(ox, oy, oz, dx, dy, dz, t_lim):
        t_best = t_lim
        idx_best = jnp.full(ox.shape, -1, jnp.int32)

        def step(p, t_best, idx_best):
            m = [w2o_ref[p, k] for k in range(12)]
            pr = [params_ref[p, k] for k in range(9)]
            tp = _prim_test(ptype_ref[p], m, pr, ox, oy, oz, dx, dy, dz,
                            t_best, types=types, full_sph=full_sph,
                            full_disk=full_disk)
            better = tp < t_best
            return jnp.where(better, tp, t_best), jnp.where(better, p, idx_best)

        if n_prims <= 32:
            for p in range(n_prims):
                t_best, idx_best = step(p, t_best, idx_best)
        else:
            t_best, idx_best = jax.lax.fori_loop(
                0, n_prims, lambda p, c: step(p, *c), (t_best, idx_best)
            )
        return t_best, idx_best

    def sel_prim(idx):
        """Winner-takes-row select over the prim tables: returns
        (w2o[12], radius, ptype_f, shade[18]) per lane."""
        zeros = jnp.zeros(idx.shape, f32)
        m = [zeros] * 12
        shade = [zeros] * _SH_K
        radius = zeros
        ptype_f = zeros

        def step(p, carry):
            m, shade, radius, ptype_f = carry
            is_p = idx == p
            m = [jnp.where(is_p, w2o_ref[p, k], m[k]) for k in range(12)]
            shade = [
                jnp.where(is_p, shade_ref[p, k], shade[k]) for k in range(_SH_K)
            ]
            radius = jnp.where(is_p, params_ref[p, 0], radius)
            ptype_f = jnp.where(
                is_p, ptype_ref[p].astype(f32), ptype_f
            )
            return m, shade, radius, ptype_f

        carry = (m, shade, radius, ptype_f)
        if n_prims <= 32:
            for p in range(n_prims):
                carry = step(p, carry)
        else:
            carry = jax.lax.fori_loop(0, n_prims, step, carry)
        return carry

    def sel_light(idx):
        """Per-lane light-attribute select: idx int32 lanes -> columns."""
        zeros = jnp.zeros(idx.shape, f32)
        lt = zeros
        lp = [zeros] * 3
        li = [zeros] * 3
        aux = [zeros] * 6  # two_sided, cx, cy, cz, rad, func

        def step(l, carry):
            lt, lp, li, aux = carry
            is_l = idx == l
            lt = jnp.where(is_l, ltype_ref[l].astype(f32), lt)
            lp = [jnp.where(is_l, lpos_ref[l, k], lp[k]) for k in range(3)]
            li = [jnp.where(is_l, lint_ref[l, k], li[k]) for k in range(3)]
            aux = [jnp.where(is_l, laux_ref[l, k], aux[k]) for k in range(6)]
            return lt, lp, li, aux

        carry = (lt, lp, li, aux)
        for l in range(n_lights):
            carry = step(l, carry)
        return carry

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

        # ---- closest hit --------------------------------------------------
        t, idx = closest_hit(ox, oy, oz, dx, dy, dz, jnp.full(ox.shape, _BIG, f32))
        hit = (idx >= 0) & alive

        # ---- winner geometry ----------------------------------------------
        m, shade, radius, ptype_f = sel_prim(idx)
        # object-space hit + reprojection (sphere.go:100-104)
        oox = m[0] * ox + m[1] * oy + m[2] * oz + m[3]
        ooy = m[4] * ox + m[5] * oy + m[6] * oz + m[7]
        ooz = m[8] * ox + m[9] * oy + m[10] * oz + m[11]
        odx = m[0] * dx + m[1] * dy + m[2] * dz
        ody = m[4] * dx + m[5] * dy + m[6] * dz
        odz = m[8] * dx + m[9] * dy + m[10] * dz
        pox = oox + odx * t
        poy = ooy + ody * t
        poz = ooz + odz * t
        is_sph = ptype_f < 0.5  # SPHERE=0, DISK=1
        # sphere: reproject onto the surface; normal = p/r; dpdu = (-y, x, 0)
        plen = jnp.sqrt(jnp.maximum(pox * pox + poy * poy + poz * poz, 1e-20))
        s_rep = jnp.where(is_sph, radius / plen, 1.0)
        pox, poy, poz = pox * s_rep, poy * s_rep, poz * s_rep
        inv_r = 1.0 / jnp.maximum(radius, 1e-20)
        nx_o = jnp.where(is_sph, pox * inv_r, 0.0)
        ny_o = jnp.where(is_sph, poy * inv_r, 0.0)
        nz_o = jnp.where(is_sph, poz * inv_r, 1.0)
        # both shapes: dpdu ~ (-y, x, 0) in object space
        dux_o, duy_o, duz_o = -poy, pox, jnp.zeros_like(pox)
        # object->world: o2w_lin = scale2 * w2o_lin^T; normals/directions
        # only need the transpose (uniform scale; FastPathInfo guarantees)
        scale2 = shade[_SH_SCALE2]

        def w2oT(vx, vy, vz):
            return (
                m[0] * vx + m[4] * vy + m[8] * vz,
                m[1] * vx + m[5] * vy + m[9] * vz,
                m[2] * vx + m[6] * vy + m[10] * vz,
            )

        nx, ny, nz = _normalize3(*w2oT(nx_o, ny_o, nz_o), 1e-30)
        dux, duy, duz = w2oT(dux_o, duy_o, duz_o)
        # world hit point: o2w @ p_obj with o2w_t = -o2w_lin @ w2o_t
        plx, ply, plz = w2oT(pox - m[3], poy - m[7], poz - m[11])
        px = scale2 * plx
        py = scale2 * ply
        pz = scale2 * plz
        wox, woy, woz = _normalize3(-dx, -dy, -dz, 1e-30)

        # ---- emitted radiance at emitter hits (path.go:48-63 + MIS) -------
        alid = shade[_SH_ALID].astype(jnp.int32)
        is_emit = hit & (alid >= 0)
        if n_lights > 0:
            _, _, eint, eaux = sel_light(jnp.maximum(alid, 0))
            facing = _dot3(nx, ny, nz, wox, woy, woz) > 0.0
            emit_on = (eaux[_LA_TWO] > 0.5) | facing
            # MIS: light pdf as seen from the previous vertex (the ray
            # origin), times the pick pmf (integrator.go:133-192)
            l_pdf = sphere_area_pdf_li(
                ox, oy, oz, dx, dy, dz,
                eaux[_LA_CX], eaux[_LA_CX + 1], eaux[_LA_CX + 2],
                eaux[_LA_RAD],
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

        # ---- kd at hit (constant or planar checker; optional closed-form
        # box-filter AA over the ray-cone footprint, ops/texture.py) --------
        kdr, kdg, kdb = shade[_SH_C1], shade[_SH_C1 + 1], shade[_SH_C1 + 2]
        if use_cone:
            fw_hit = cw + cone_sp * jnp.abs(t)
            # surface-projected footprint (sqrt-of-grazing-stretch: the
            # geometric mean of the anisotropic 1/cos elongation) — must
            # match the jnp chain (models/integrators._bounce_once)
            fw_surf = fw_hit * jax.lax.rsqrt(
                jnp.maximum(jnp.abs(_dot3(nx, ny, nz, wox, woy, woz)), 0.05)
            )
        if any_checker:
            s_t = shade[_SH_DS] + _dot3(
                px, py, pz, shade[_SH_VS], shade[_SH_VS + 1], shade[_SH_VS + 2]
            )
            t_t = shade[_SH_DS + 1] + _dot3(
                px, py, pz, shade[_SH_VT], shade[_SH_VT + 1], shade[_SH_VT + 2]
            )
            if use_cone:
                def bump_int(x):
                    h = x * 0.5
                    fh = jnp.floor(h)
                    return fh + 2.0 * jnp.maximum(h - fh - 0.5, 0.0)

                ds_ = jnp.maximum(fw_surf * shade[_SH_TSS], 1e-8)
                dt_ = jnp.maximum(fw_surf * shade[_SH_TST], 1e-8)
                s_int = (bump_int(s_t + ds_) - bump_int(s_t - ds_)) / (2.0 * ds_)
                t_int = (bump_int(t_t + dt_) - bump_int(t_t - dt_)) / (2.0 * dt_)
                a2 = jnp.clip(s_int + t_int - 2.0 * s_int * t_int, 0.0, 1.0)
                chk = shade[_SH_CHK] > 0.5
                kdr = jnp.where(chk, kdr + a2 * (shade[_SH_C2] - kdr), kdr)
                kdg = jnp.where(chk, kdg + a2 * (shade[_SH_C2 + 1] - kdg), kdg)
                kdb = jnp.where(chk, kdb + a2 * (shade[_SH_C2 + 2] - kdb), kdb)
            else:
                par = jnp.floor(s_t) + jnp.floor(t_t)
                par = par - 2.0 * jnp.floor(par * 0.5)  # 0 or 1
                odd = (par > 0.5) & (shade[_SH_CHK] > 0.5)
                kdr = jnp.where(odd, shade[_SH_C2], kdr)
                kdg = jnp.where(odd, shade[_SH_C2 + 1], kdg)
                kdb = jnp.where(odd, shade[_SH_C2 + 2], kdb)

        # ---- shading frame (BSDF constructor, reflection.go:120-145) ------
        nd = _dot3(nx, ny, nz, dux, duy, duz)
        ssx, ssy, ssz = dux - nx * nd, duy - ny * nd, duz - nz * nd
        bad = ssx * ssx + ssy * ssy + ssz * ssz < 1e-12
        (fbx, fby, fbz), _ = _coord_system(nx, ny, nz)
        ssx = jnp.where(bad, fbx, ssx)
        ssy = jnp.where(bad, fby, ssy)
        ssz = jnp.where(bad, fbz, ssz)
        ssx, ssy, ssz = _normalize3(ssx, ssy, ssz, 1e-30)
        tsx, tsy, tsz = _cross3(nx, ny, nz, ssx, ssy, ssz)
        cos_o = _dot3(wox, woy, woz, nx, ny, nz)  # wo_local.z

        d_off = _offset_dist(nx, ny, nz, px, py, pz)

        if any_rough:
            # ---- rough glass (GGX R+T, glass.go:49-72; reflection.go:
            # 670-835 with quirk #5 NDF sampling and the round-5
            # transmission-denominator fix) — world-frame evaluation,
            # mirrors ops/bsdf._glass_rough_f + the glass bsdf_pdf branch
            # op-for-op so per-lane radiance matches the jnp chain
            is_rgl = shade[_SH_RGL] > 0.5
            alpha_g = jnp.maximum(shade[_SH_ALPHA], 1e-3)
            eta_rg = jnp.maximum(shade[_SH_ETA], 1e-3)
            aco_r = jnp.abs(cos_o)
            F_o_rgl = _fresnel_diel(cos_o, eta_rg)

            def rough_glass_eval(wix_e, wiy_e, wiz_e):
                """-> (refl, trans, pdf): scalar reflection/transmission
                lobe values (multiply kr/kt and |cos_i| outside) and the
                Fresnel-weighted half-vector sampling pdf toward wi."""
                ci_e = _dot3(wix_e, wiy_e, wiz_e, nx, ny, nz)
                same_e = cos_o * ci_e > 0.0
                aci_e = jnp.abs(ci_e)
                # reflection half-vector
                hx = wix_e + wox
                hy = wiy_e + woy
                hz = wiz_e + woz
                h2 = hx * hx + hy * hy + hz * hz
                hx, hy, hz = _normalize3(hx, hy, hz, 1e-20)
                c_wh = _dot3(hx, hy, hz, nx, ny, nz)
                sgn_h = jnp.where(c_wh < 0.0, -1.0, 1.0)
                fr_r = _fresnel_diel(
                    _dot3(wix_e, wiy_e, wiz_e,
                          sgn_h * hx, sgn_h * hy, sgn_h * hz),
                    eta_rg,
                )
                d_r = _ggx_d(c_wh, alpha_g)
                g_e = 1.0 / (
                    1.0
                    + _ggx_lambda(cos_o, alpha_g)
                    + _ggx_lambda(ci_e, alpha_g)
                )
                degen_r = (aco_r < 1e-7) | (aci_e < 1e-7) | (h2 < 1e-14)
                refl = jnp.where(
                    same_e & ~degen_r,
                    fr_r * d_r * g_e
                    / jnp.maximum(4.0 * aco_r * aci_e, 1e-7),
                    0.0,
                )
                doh_r = _dot3(wox, woy, woz, hx, hy, hz)
                mf_pdf_r = jnp.where(
                    same_e,
                    d_r * jnp.abs(c_wh)
                    / jnp.maximum(4.0 * jnp.abs(doh_r), 1e-7),
                    0.0,
                )
                # transmission half-vector: wh ~ wo + eta*wi, +n oriented
                eta_t = jnp.where(cos_o > 0.0, eta_rg, 1.0 / eta_rg)
                thx = wox + wix_e * eta_t
                thy = woy + wiy_e * eta_t
                thz = woz + wiz_e * eta_t
                thx, thy, thz = _normalize3(thx, thy, thz, 1e-20)
                c_th = _dot3(thx, thy, thz, nx, ny, nz)
                sgn_t = jnp.where(c_th < 0.0, -1.0, 1.0)
                thx, thy, thz = sgn_t * thx, sgn_t * thy, sgn_t * thz
                c_th = sgn_t * c_th
                do_h = _dot3(wox, woy, woz, thx, thy, thz)
                di_h = _dot3(wix_e, wiy_e, wiz_e, thx, thy, thz)
                denom = do_h + eta_t * di_h
                fr_t = _fresnel_diel(do_h, eta_rg)
                d_t = _ggx_d(c_th, alpha_g)
                # eta^2 * (1/eta)^2 cancels (radiance factor via etaScale)
                degen_t = same_e | (aci_e < 1e-7) | (aco_r < 1e-7)
                trans = jnp.where(
                    degen_t,
                    0.0,
                    (1.0 - fr_t)
                    * jnp.abs(
                        d_t * g_e * jnp.abs(di_h) * jnp.abs(do_h)
                        / jnp.maximum(
                            jnp.abs(ci_e * cos_o) * denom * denom, 1e-10
                        )
                    ),
                )
                dwh_dwi = jnp.abs(
                    eta_t * eta_t * di_h
                ) / jnp.maximum(denom * denom, 1e-10)
                mf_pdf_t = d_t * jnp.abs(c_th) * dwh_dwi
                pdf_e = jnp.where(
                    same_e,
                    F_o_rgl * mf_pdf_r,
                    (1.0 - F_o_rgl) * mf_pdf_t,
                )
                return refl, trans, pdf_e

        # ---- NEE: one-light estimate (integrator.go:48-77, 79-195) --------
        if n_lights > 0:
            u_pick = u1(D_LIGHT_PICK)
            # Distribution1D discrete sample: count cdf entries <= u
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

            # point light: Li = I/d^2 (point.go:44-49)
            tlx, tly, tlz = lp[0] - px, lp[1] - py, lp[2] - pz
            d2 = tlx * tlx + tly * tly + tlz * tlz
            dist_pt = jnp.sqrt(d2)
            wix_pt, wiy_pt, wiz_pt = _normalize3(tlx, tly, tlz, 1e-20)
            inv_d2 = 1.0 / jnp.maximum(d2, 1e-12)

            # area sphere: cone/inside sampling (sphere.go:287-344)
            cx, cy, cz, rad = laux[1], laux[2], laux[3], laux[4]
            tcx, tcy, tcz = cx - px, cy - py, cz - pz
            dc2 = tcx * tcx + tcy * tcy + tcz * tcz
            dc = jnp.sqrt(dc2)
            outside = dc > rad * 1.00001
            inv_dc = 1.0 / jnp.maximum(dc, 1e-12)
            wcx, wcy, wcz = tcx * inv_dc, tcy * inv_dc, tcz * inv_dc
            (v2x, v2y, v2z), (v3x, v3y, v3z) = _coord_system(wcx, wcy, wcz)
            sin2_tmax = jnp.clip(rad * rad / jnp.maximum(dc2, 1e-20), 0.0, 1.0)
            cos_tmax = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_tmax))
            cos_t = (1.0 - ul0) + ul0 * cos_tmax
            sin2_t = jnp.maximum(0.0, 1.0 - cos_t * cos_t)
            ds_ = dc * cos_t - jnp.sqrt(
                jnp.maximum(0.0, rad * rad - dc2 * sin2_t)
            )
            cos_a = (dc2 + rad * rad - ds_ * ds_) / jnp.maximum(
                2.0 * dc * rad, 1e-12
            )
            sin_a = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_a * cos_a))
            phi = 2.0 * PI * ul1
            sa_cp = sin_a * jnp.cos(phi)
            sa_sp = sin_a * jnp.sin(phi)
            nox = -v2x * sa_cp - v3x * sa_sp - wcx * cos_a
            noy = -v2y * sa_cp - v3y * sa_sp - wcy * cos_a
            noz = -v2z * sa_cp - v3z * sa_sp - wcz * cos_a
            plx_o = cx + rad * nox
            ply_o = cy + rad * noy
            plz_o = cz + rad * noz
            wix_o, wiy_o, wiz_o = _normalize3(
                plx_o - px, ply_o - py, plz_o - pz, 1e-20
            )
            pdf_out = 1.0 / (
                2.0 * PI * (1.0 - jnp.minimum(cos_tmax, 1.0 - 1e-7))
            )
            # inside: uniform area + conversion
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

            is_pt = lt < 0.5            # LIGHT_POINT = 0
            is_di = (lt > 0.5) & (lt < 1.5)  # LIGHT_DISTANT = 1
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

            # f = kd/pi * |cos(wi, ns)| on the same hemisphere
            cos_i = _dot3(wix, wiy, wiz, nx, ny, nz)
            same = cos_o * cos_i > 0.0
            f_gain = jnp.where(same, INV_PI * jnp.abs(cos_i), 0.0)
            b_pdf = jnp.where(same, jnp.abs(cos_i) * INV_PI, 0.0)
            fR_n = kdr * f_gain
            fG_n = kdg * f_gain
            fB_n = kdb * f_gain
            if any_rough:
                # rough-glass lanes: GGX R/T toward the light + MIS pdf
                r_e, t_e, p_e = rough_glass_eval(wix, wiy, wiz)
                aci_n = jnp.abs(cos_i)
                fR_n = jnp.where(
                    is_rgl,
                    (shade[_SH_KR] * r_e + shade[_SH_KT] * t_e) * aci_n,
                    fR_n,
                )
                fG_n = jnp.where(
                    is_rgl,
                    (shade[_SH_KR + 1] * r_e + shade[_SH_KT + 1] * t_e)
                    * aci_n,
                    fG_n,
                )
                fB_n = jnp.where(
                    is_rgl,
                    (shade[_SH_KR + 2] * r_e + shade[_SH_KT + 2] * t_e)
                    * aci_n,
                    fB_n,
                )
                b_pdf = jnp.where(is_rgl, p_e, b_pdf)
            f_max = jnp.maximum(fR_n, jnp.maximum(fG_n, fB_n))
            li_max = jnp.maximum(lir, jnp.maximum(lig, lib))
            is_spec = shade[_SH_MIR] > 0.5
            if any_glass:
                is_spec = is_spec | (shade[_SH_GLS] > 0.5)
            contributes = (
                alive & ~is_spec & (ls_pdf > 0.0) & (li_max > 0.0) & (f_max > 0.0)
            )

            # shadow ray (VisibilityTester.Unoccluded, light.go:46-48)
            sgn = jnp.where(_dot3(wix, wiy, wiz, nx, ny, nz) < 0.0, -1.0, 1.0)
            shx = px + sgn * d_off * nx
            shy = py + sgn * d_off * ny
            shz = pz + sgn * d_off * nz
            t_sh = jnp.maximum(dist * (1.0 - SHADOW_EPSILON) - 1e-3, 1e-4)
            # any-hit loop: dead/non-contributing lanes get zero-length rays
            t_sh = jnp.where(contributes, t_sh, 1e-6)
            _, sh_idx = closest_hit(shx, shy, shz, wix, wiy, wiz, t_sh)
            vis = contributes & (sh_idx < 0)

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

        # ---- BSDF sample: cosine hemisphere (path.go:91-101) --------------
        ub0 = u1(D_BSDF_UV)
        ub1 = u1(D_BSDF_UV + 1)
        dxl, dyl = _concentric_disk(ub0, ub1)
        zl = jnp.sqrt(jnp.maximum(0.0, 1.0 - dxl * dxl - dyl * dyl))
        zl = jnp.where(cos_o < 0.0, -zl, zl)  # sample on wo's side
        wix_n = ssx * dxl + tsx * dyl + nx * zl
        wiy_n = ssy * dxl + tsy * dyl + ny * zl
        wiz_n = ssz * dxl + tsz * dyl + nz * zl
        pdf_b = jnp.abs(zl) * INV_PI
        cos_n = jnp.abs(_dot3(wix_n, wiy_n, wiz_n, nx, ny, nz))
        kd_max = jnp.maximum(kdr, jnp.maximum(kdg, kdb))
        # same-hemisphere edge (bsdf_f masks f to 0 when wo grazes)
        ok = (pdf_b > 1e-9) & (kd_max * INV_PI > 0.0) & (cos_o * zl > 0.0)
        thr = jnp.where(
            ok, (INV_PI * cos_n) / jnp.maximum(pdf_b, 1e-20), 0.0
        )
        # mirror lanes: delta reflection (SpecularReflection with FresnelNoOp,
        # mirror.go:21-32): wi = 2(wo.ns)ns - wo, f*cos/pdf == kr, pdf = 1
        is_mir = shade[_SH_MIR] > 0.5
        wix_m = 2.0 * cos_o * nx - wox
        wiy_m = 2.0 * cos_o * ny - woy
        wiz_m = 2.0 * cos_o * nz - woz
        kr_max = jnp.maximum(
            shade[_SH_KR], jnp.maximum(shade[_SH_KR + 1], shade[_SH_KR + 2])
        )

        if any_glass:
            # smooth-glass lanes: FresnelSpecular (reflection.go:465-536,
            # ref bug #8 fixed exactly like the jnp chain, ops/bsdf.py):
            # pick R with prob F, T with prob 1-F; the f*cos/pdf throughput
            # collapses to kr (reflect) or eta_ratio^2 * kt (transmit,
            # radiance transport), and etaScale tracks 1/eta_ratio^2 for
            # Russian roulette (path.go:105).  Compiled out (static
            # any_glass) for glass-free scenes — register pressure.
            is_gls = shade[_SH_GLS] > 0.5
            eta_g = jnp.maximum(shade[_SH_ETA], 1e-3)
            entering = cos_o > 0.0
            # dielectric Fresnel at |cos_o| (reflection.go:21-42)
            ci = jnp.abs(jnp.clip(cos_o, -1.0, 1.0))
            ei = jnp.where(entering, 1.0, eta_g)
            et = jnp.where(entering, eta_g, 1.0)
            sin_i = jnp.sqrt(jnp.maximum(0.0, 1.0 - ci * ci))
            sin_t = ei / et * sin_i
            tir = sin_t >= 1.0
            ct_f = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_t * sin_t))
            r_parl = (et * ci - ei * ct_f) / jnp.maximum(et * ci + ei * ct_f, 1e-20)
            r_perp = (ei * ci - et * ct_f) / jnp.maximum(ei * ci + et * ct_f, 1e-20)
            F = jnp.where(tir, 1.0, 0.5 * (r_parl * r_parl + r_perp * r_perp))
            u_lobe = u1(D_BSDF_LOBE)
            choose_r = u_lobe < F
            # refraction about the oriented normal (reflection.go:106-118)
            eta_ratio = jnp.where(entering, 1.0 / eta_g, eta_g)
            sgn_e = jnp.where(entering, 1.0, -1.0)
            sin2_tt = eta_ratio * eta_ratio * (1.0 - ci * ci)
            ok_t = sin2_tt < 1.0
            cos_tt = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_tt))
            coef = (eta_ratio * ci - cos_tt) * sgn_e
            wtx, wty, wtz = _normalize3(
                coef * nx - eta_ratio * wox,
                coef * ny - eta_ratio * woy,
                coef * nz - eta_ratio * woz,
                1e-20,
            )
            ktr, ktg, ktb = shade[_SH_KT], shade[_SH_KT + 1], shade[_SH_KT + 2]
            kt_max = jnp.maximum(ktr, jnp.maximum(ktg, ktb))
            er2 = eta_ratio * eta_ratio
            ok_g = (
                (choose_r & (F > 1e-9) & (kr_max > 0.0))
                | (~choose_r & ((1.0 - F) > 1e-9) & ok_t & (kt_max > 0.0))
            )
            wix_g = jnp.where(choose_r, wix_m, wtx)
            wiy_g = jnp.where(choose_r, wiy_m, wty)
            wiz_g = jnp.where(choose_r, wiz_m, wtz)
            pdf_g = jnp.where(choose_r, F, 1.0 - F)
            fR_g = jnp.where(choose_r, shade[_SH_KR], er2 * ktr)
            fG_g = jnp.where(choose_r, shade[_SH_KR + 1], er2 * ktg)
            fB_g = jnp.where(choose_r, shade[_SH_KR + 2], er2 * ktb)

            if any_rough:
                # ---- rough glass sample: GGX NDF half-vector, Fresnel
                # R/T choice at the half-vector (ops/bsdf.bsdf_sample
                # rough-glass branch; glass.go:49-72 semantics)
                tan2w = alpha_g * alpha_g * ub0 / jnp.maximum(1.0 - ub0, 1e-7)
                ctw = 1.0 / jnp.sqrt(1.0 + tan2w)
                stw = jnp.sqrt(jnp.maximum(0.0, 1.0 - ctw * ctw))
                phiw = 2.0 * PI * ub1
                cpw = stw * jnp.cos(phiw)
                spw = stw * jnp.sin(phiw)
                flip_h = jnp.where(cos_o < 0.0, -1.0, 1.0)
                whx_s = (ssx * cpw + tsx * spw + nx * ctw) * flip_h
                why_s = (ssy * cpw + tsy * spw + ny * ctw) * flip_h
                whz_s = (ssz * cpw + tsz * spw + nz * ctw) * flip_h
                doh_s = _dot3(wox, woy, woz, whx_s, why_s, whz_s)
                fr_wh = _fresnel_diel(doh_s, eta_rg)
                choose_rg = u_lobe < fr_wh
                # reflection about wh
                wix_rr, wiy_rr, wiz_rr = _normalize3(
                    2.0 * doh_s * whx_s - wox,
                    2.0 * doh_s * why_s - woy,
                    2.0 * doh_s * whz_s - woz,
                    1e-20,
                )
                # refraction about wh oriented toward wo
                sgn_o = jnp.where(doh_s < 0.0, -1.0, 1.0)
                ci_h = jnp.abs(doh_s)
                sin2_h = er2 * (1.0 - ci_h * ci_h)
                ok_mt = sin2_h < 1.0
                cth_h = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_h))
                coef_h = eta_ratio * ci_h - cth_h
                wix_tt, wiy_tt, wiz_tt = _normalize3(
                    coef_h * sgn_o * whx_s - eta_ratio * wox,
                    coef_h * sgn_o * why_s - eta_ratio * woy,
                    coef_h * sgn_o * whz_s - eta_ratio * woz,
                    1e-20,
                )
                wix_rg = jnp.where(choose_rg, wix_rr, wix_tt)
                wiy_rg = jnp.where(choose_rg, wiy_rr, wiy_tt)
                wiz_rg = jnp.where(choose_rg, wiz_rr, wiz_tt)
                r_s, t_s, pdf_rg = rough_glass_eval(wix_rg, wiy_rg, wiz_rg)
                aci_s = jnp.abs(_dot3(wix_rg, wiy_rg, wiz_rg, nx, ny, nz))
                thr_rg = jnp.where(
                    pdf_rg > 1e-9, aci_s / jnp.maximum(pdf_rg, 1e-20), 0.0
                )
                fR_rg = (shade[_SH_KR] * r_s + ktr * t_s) * thr_rg
                fG_rg = (shade[_SH_KR + 1] * r_s + ktg * t_s) * thr_rg
                fB_rg = (shade[_SH_KR + 2] * r_s + ktb * t_s) * thr_rg
                ok_rg = (pdf_rg > 1e-9) & (
                    jnp.maximum(fR_rg, jnp.maximum(fG_rg, fB_rg)) > 0.0
                )
            # NOTE: no jnp.where on bool vectors — Mosaic cannot select
            # between i1 vectors (pallas_intersect.py:66-70); logical ops.
            not_spec = ~is_mir & ~is_gls
            if any_rough:
                not_spec = not_spec & ~is_rgl
                ok = (
                    (is_mir & (kr_max > 0.0))
                    | (is_gls & ok_g)
                    | (is_rgl & ok_rg)
                    | (not_spec & ok)
                )
                sel3 = lambda a_m, a_g, a_r, a_d: jnp.where(
                    is_mir, a_m,
                    jnp.where(is_gls, a_g, jnp.where(is_rgl, a_r, a_d)),
                )
                wix_n = sel3(wix_m, wix_g, wix_rg, wix_n)
                wiy_n = sel3(wiy_m, wiy_g, wiy_rg, wiy_n)
                wiz_n = sel3(wiz_m, wiz_g, wiz_rg, wiz_n)
                pdf_b = sel3(jnp.ones_like(pdf_b), pdf_g, pdf_rg, pdf_b)
                fR = sel3(shade[_SH_KR], fR_g, fR_rg, kdr * thr)
                fG = sel3(shade[_SH_KR + 1], fG_g, fG_rg, kdg * thr)
                fB = sel3(shade[_SH_KR + 2], fB_g, fB_rg, kdb * thr)
                es_new = jnp.where(
                    (is_gls & ~choose_r & ok_t)
                    | (is_rgl & ~choose_rg & ok_mt),
                    es / jnp.maximum(er2, 1e-20),
                    es,
                )
                spec_next = is_mir | is_gls  # rough glass is NOT delta
            else:
                ok = (is_mir & (kr_max > 0.0)) | (is_gls & ok_g) | (not_spec & ok)
                wix_n = jnp.where(is_mir, wix_m, jnp.where(is_gls, wix_g, wix_n))
                wiy_n = jnp.where(is_mir, wiy_m, jnp.where(is_gls, wiy_g, wiy_n))
                wiz_n = jnp.where(is_mir, wiz_m, jnp.where(is_gls, wiz_g, wiz_n))
                pdf_b = jnp.where(is_mir, 1.0, jnp.where(is_gls, pdf_g, pdf_b))
                fR = jnp.where(is_mir, shade[_SH_KR], jnp.where(is_gls, fR_g, kdr * thr))
                fG = jnp.where(is_mir, shade[_SH_KR + 1], jnp.where(is_gls, fG_g, kdg * thr))
                fB = jnp.where(is_mir, shade[_SH_KR + 2], jnp.where(is_gls, fB_g, kdb * thr))
                # radiance scaling across refraction boundaries (path.go:105)
                es_new = jnp.where(
                    is_gls & ~choose_r & ok_t, es / jnp.maximum(er2, 1e-20), es
                )
                spec_next = is_mir | is_gls
        else:
            ok = (is_mir & (kr_max > 0.0)) | (~is_mir & ok)
            wix_n = jnp.where(is_mir, wix_m, wix_n)
            wiy_n = jnp.where(is_mir, wiy_m, wiy_n)
            wiz_n = jnp.where(is_mir, wiz_m, wiz_n)
            pdf_b = jnp.where(is_mir, 1.0, pdf_b)
            fR = jnp.where(is_mir, shade[_SH_KR], kdr * thr)
            fG = jnp.where(is_mir, shade[_SH_KR + 1], kdg * thr)
            fB = jnp.where(is_mir, shade[_SH_KR + 2], kdb * thr)
            es_new = es
            spec_next = is_mir
        ok_f = jnp.where(ok, 1.0, 0.0)
        bR = bR * fR * ok_f
        bG = bG * fG * ok_f
        bB = bB * fB * ok_f
        es = es_new
        alive = alive & ok & (jnp.maximum(bR, jnp.maximum(bG, bB)) > 0.0)

        sgn_n = jnp.where(
            _dot3(wix_n, wiy_n, wiz_n, nx, ny, nz) < 0.0, -1.0, 1.0
        )
        ox = px + sgn_n * d_off * nx
        oy = py + sgn_n * d_off * ny
        oz = pz + sgn_n * d_off * nz
        dx, dy, dz = wix_n, wiy_n, wiz_n

        # ---- Russian roulette (path.go:143-153); beta is weighted by the
        # accumulated etaScale exactly like the jnp chain --------------------
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
            # specular continuation (mirror or smooth-glass delta lobe)
            jnp.where(spec_next, 1.0, 0.0).astype(f32),
            pdf_b,
            fw_hit if use_cone else cw,
            es,
        )

    state = (
        ox_ref[:], oy_ref[:], oz_ref[:],
        dx_ref[:], dy_ref[:], dz_ref[:],
        br_ref[:], bg_ref[:], bb_ref[:],        # beta
        lri_ref[:], lgi_ref[:], lbi_ref[:],     # L
        alive_ref[:],                           # alive (f32 0/1)
        spc_ref[:],                             # specular
        ppd_ref[:],                             # prev_bsdf_pdf
        cwi_ref[:],                             # ray-cone footprint width
        esi_ref[:],                             # etaScale (path.go:105-115)
    )
    # Block-level all-dead early exit, round-5 formulation.  Round 4 tried
    # a lax.while_loop over the 17-array register-carried state and
    # measured it 20x SLOWER (the data-dependent loop forces the ~550 KB
    # carry through VMEM every iteration and blocks the unrolled
    # scheduling).  This version makes the VMEM round-trip EXPLICIT and
    # cheap: state lives in one scratch buffer between bounces, the trip
    # count stays static (fori_loop, unrolled), and each bounce body is
    # pl.when-gated on a block-alive scalar — a fully dead block pays one
    # scalar test per remaining bounce.  Single-level predication around
    # scratch mutation only (the round-4 supercluster Mosaic lesson).
    _NS = len(state)

    def save(st):
        for i, a in enumerate(st):
            st_sc[i * SUB : (i + 1) * SUB, :] = a

    def load():
        return tuple(
            st_sc[i * SUB : (i + 1) * SUB, :] for i in range(_NS)
        )

    save(state)
    na_sc[0] = jnp.sum(alive_ref[:])

    def outer(i, _):
        @pl.when(na_sc[0] > 0.0)
        def _():
            st = bounce(i, load())
            save(st)
            na_sc[0] = jnp.sum(st[12])

        return 0

    jax.lax.fori_loop(0, n_bounces, outer, 0)
    state = load()
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


def _shade_table(scene) -> jnp.ndarray:
    """Per-primitive shading record f32[P, 18] (see column layout above).
    Tiny vectorised gathers at trace time; XLA folds them into setup."""
    prims = scene.prims
    mats = scene.materials
    tex = scene.textures
    mid = prims.material_id
    is_mirror = mats.mat_type[mid] == 1  # bsdf.MIRROR
    glass = mats.mat_type[mid] == 2  # bsdf.GLASS
    rough = mats.roughness[mid] > 1e-4
    is_glass = glass & ~rough   # smooth: FresnelSpecular delta lobe
    is_rough = glass & rough    # rough: GGX R+T lobes
    kd = jnp.where((is_mirror | glass)[:, None], 0.0, mats.kd[mid])
    kt_id = mats.kd_tex[mid]
    safe = jnp.maximum(kt_id, 0)
    is_tex = kt_id >= 0
    ttype = tex.tex_type[safe]
    is_chk = is_tex & (ttype == 1)  # TEX_CHECKERBOARD
    c1 = jnp.where(is_tex[:, None], tex.value1[safe], kd)
    c2 = jnp.where(is_chk[:, None], tex.value2[safe], c1)
    vs = tex.vs[safe]
    vt = tex.vt[safe]
    ds = tex.dsdt[safe]
    # uniform-scale sigma^2 from w2o: rows of w2o_lin have norm 1/sigma
    w2o = prims.world_to_obj
    lin = w2o[:, :3, :3]
    inv_s2 = jnp.sum(lin[:, 0, :] * lin[:, 0, :], axis=-1)
    scale2 = 1.0 / jnp.maximum(inv_s2, 1e-30)
    cols = [
        c1,
        c2,
        is_chk.astype(jnp.float32)[:, None],
        vs,
        vt,
        ds,
        prims.area_light_id.astype(jnp.float32)[:, None],
        scale2[:, None],
        jnp.sqrt(jnp.sum(vs * vs, axis=-1))[:, None],  # |vs| (checker AA)
        jnp.sqrt(jnp.sum(vt * vt, axis=-1))[:, None],  # |vt|
        is_mirror.astype(jnp.float32)[:, None],
        mats.kr[mid],
        is_glass.astype(jnp.float32)[:, None],
        mats.kt[mid],
        mats.eta[mid][:, None],
        is_rough.astype(jnp.float32)[:, None],
        jnp.maximum(mats.roughness[mid], 1e-3)[:, None],
    ]
    return jnp.concatenate(cols, axis=1)


def _light_tables(scene):
    """(ltype i32[L], lpos f32[L,3], lint f32[L,3], laux f32[L,8])."""
    lights = scene.lights
    o2w = lights.o2w
    center = o2w[:, :3, 3]
    scale = jnp.sqrt(jnp.sum(o2w[:, :3, 0] * o2w[:, :3, 0], axis=-1))
    radius_w = lights.params[:, 0] * scale
    laux = jnp.concatenate(
        [
            lights.two_sided.astype(jnp.float32)[:, None],
            center,
            radius_w[:, None],
            scene.light_func[:, None],
            jnp.zeros((lights.count, 2), jnp.float32),
        ],
        axis=1,
    )
    return lights.light_type, lights.p, lights.intensity, laux


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_depth", "rr_start", "rr_threshold", "interpret", "use_cone",
        "split_at",
    ),
)
def _li_fused_fwd(
    scene, o, d, pixel, sample, seed, cone_w0, cone_sp,
    max_depth=10, rr_start=3, rr_threshold=1.0, interpret=False,
    use_cone=False, split_at=None,
):
    # explicit static arg (jit-cache-safe); defaults from the env flag
    if split_at is None:
        split_at = _BRUTE_SPLIT
    n = o.shape[0]
    prims = scene.prims
    p_cnt = prims.count
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
    rows = total // LANE

    def as2d(x):
        return x.reshape(rows, LANE)

    grid = (rows // SUB,)
    ray_spec = pl.BlockSpec((SUB, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.SMEM
    )
    pinfo = prims.pinfo
    fi = scene.fastinfo
    ltype, lpos, lint, laux = _light_tables(scene)
    lcdf = scene.light_cdf

    def phase(st, start_b, n_bounces):
        kernel = functools.partial(
            _mega_kernel,
            p_cnt, l_cnt, n_bounces, rr_start, rr_threshold,
            prims.types,
            pinfo.all_full_spheres if pinfo is not None else False,
            pinfo.all_full_disks if pinfo is not None else False,
            True,  # any_checker: cheap; keep general
            use_cone,
            # glass lobes compiled only when the materials exist (static);
            # the rough branch lives inside the glass block, so rough
            # implies the smooth machinery is compiled too
            (getattr(fi, "has_glass", True)
             or getattr(fi, "has_rough_glass", True))
            if fi is not None else True,
            getattr(fi, "has_rough_glass", True) if fi is not None else True,
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
                smem((1,)),          # seed
                smem((p_cnt,)),      # ptype
                smem((p_cnt, 12)),   # w2o
                smem((p_cnt, 9)),    # params
                smem((p_cnt, _SH_K)),  # shade
                smem((l_cnt,)),      # ltype
                smem((l_cnt, 3)),    # lpos
                smem((l_cnt, 3)),    # lint
                smem((l_cnt, _LA_K)),  # laux
                smem((l_cnt + 1,)),  # lcdf
                smem((5,)),          # scalars
            ] + [ray_spec] * 19,
            out_specs=[ray_spec] * 17,
            out_shape=[jax.ShapeDtypeStruct((rows, LANE), jnp.float32)] * 17,
            scratch_shapes=[
                pltpu.VMEM((17 * SUB, LANE), jnp.float32),  # st_sc
                pltpu.SMEM((1,), jnp.float32),              # na_sc
            ],
            interpret=interpret,
        )(
            jnp.asarray(seed, jnp.uint32).reshape(1),
            prims.prim_type,
            _flatten_w2o(prims),
            prims.params,
            _shade_table(scene),
            ltype,
            lpos,
            lint,
            laux,
            lcdf,
            scal,
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

    def compact(st):
        """Sort the wavefront dead-lanes-last: all-dead blocks then skip
        every remaining bounce via the kernel's block-alive gate —
        compaction-lite without a compaction kernel.  Per-lane math is
        order-independent (counter RNG rides pixel/sample)."""
        perm = jnp.argsort(st["alive"] < 0.5, stable=True)
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

    # Compaction split: MEASURED A LOSS on the demo workload and
    # DISABLED by default (round 5): splits at 2/3/4 bench 32.8/34.3/
    # 34.3 Mrays/s vs 46.5 unsplit — at 2.07M lanes the argsort + packed
    # row gather costs more than the dead-block savings the in-kernel
    # block-alive exit (with 2048-ray blocks) already reclaims.  Kept
    # env-gated (GOPBRT_BRUTE_SPLIT) because the MESH kernel's version
    # of the same machinery is a 2x win there (traversal coherence, not
    # just dead-lane grouping — see pallas_mesh_megakernel).
    if split_at <= 0 or max_depth <= split_at:
        st = phase(st, 0, max_depth)
        L = jnp.stack([st["lr"], st["lg"], st["lb"]], axis=-1)[:n]
    else:
        st = phase(st, 0, split_at)
        st, perm = compact(st)
        st = phase(st, split_at, max_depth - split_at)
        Lp = jnp.stack([st["lr"], st["lg"], st["lb"]], axis=-1)
        L = jnp.take(Lp, jnp.argsort(perm), axis=0)[:n]
    # NaN/Inf sanitization (renderWorker, integrator.go:256-262)
    bad = ~jnp.all(jnp.isfinite(L), axis=-1)
    return jnp.where(bad[..., None], 0.0, jnp.maximum(L, 0.0))


# ---------------------------------------------------------------------------
# Differentiable wrapper: megakernel forward, path-replay backward.
#
# The kernel is forward-only.  For gradients we re-trace the SAME paths
# through the differentiable jnp wavefront chain (identical RNG streams, so
# the replayed estimator equals the primal up to float noise) and
# backpropagate there — path-replay backpropagation, the standard trick for
# megakernel differentiable renderers.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _make_fused(cfg, interpret, use_cone):
    """custom_vjp closure per static (cfg, interpret, use_cone).  All traced
    values (scene, rays, counters, seed, cone scalars) are explicit
    arguments — custom_vjp functions must not close over tracers."""

    @jax.custom_vjp
    def f(scene, o, d, pixel, sample, seed, cone_w0, cone_sp):
        return _li_fused_fwd(
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


def path_li_fused(scene, o, d, pixel, sample, seed, cfg, interpret=False,
                  cone=None):
    """Drop-in for integrators.li on fast-path scenes (scene.fastinfo.ok):
    megakernel forward, path-replay backward through the jnp chain.

    cone: optional (width0, spread) ray-cone scalars enabling the in-kernel
    closed-form checker box filter (texture AA)."""
    n = o.shape[0]
    pixel = jnp.broadcast_to(jnp.asarray(pixel, jnp.uint32), (n,))
    sample = jnp.broadcast_to(jnp.asarray(sample, jnp.uint32), (n,))
    use_cone = cone is not None
    w0 = jnp.asarray(cone[0] if use_cone else 0.0, jnp.float32)
    sp = jnp.asarray(cone[1] if use_cone else 0.0, jnp.float32)
    return _make_fused(cfg, interpret, use_cone)(
        scene, o, d, pixel, sample, jnp.asarray(seed, jnp.uint32), w0, sp
    )
