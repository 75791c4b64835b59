"""Texture evaluation over SoA tables.

Replaces the reference's SpectrumTexture/FloatTexture interfaces +
TextureMapping2D (``pkg/pbrt/texture.go``) and the procedural checkerboard
(``pkg/textures/checkerboard.go``) with an integer-tagged table evaluated
branch-free at hit points.  Image textures (not in the reference) are
supported as a parity extra via a shared atlas array — bilinear lookup is a
gather, which XLA maps well.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from gopbrt_tpu.ops.geom import dot

# texture types
TEX_CONSTANT = 0
TEX_CHECKERBOARD = 1
TEX_UV = 2  # debug: visualises (u, v)
TEX_IMAGE = 3

# mapping types (texture.go:9-46)
MAP_UV = 0
MAP_PLANAR = 1


class Textures(NamedTuple):
    """SoA texture table.

    value1/value2: checkerboard colours (tex1/tex2, checkerboard.go:15-20)
    or the constant value in value1.
    mapping/vs/vt/dsdt: UVMapping2D scale-offset or PlanarMapping2D vectors
    (texture.go:9-46).
    image_*: per-texture window into the shared image atlas.
    """

    tex_type: jnp.ndarray  # int32[T]
    value1: jnp.ndarray  # f32[T,3]
    value2: jnp.ndarray  # f32[T,3]
    mapping: jnp.ndarray  # int32[T]
    vs: jnp.ndarray  # f32[T,3]  planar s axis (or [su, sv, 0] for uv)
    vt: jnp.ndarray  # f32[T,3]  planar t axis (or [du, dv, 0] for uv)
    dsdt: jnp.ndarray  # f32[T,2] offsets
    atlas: jnp.ndarray  # f32[H,W,3] shared image atlas (1x1 black if unused)
    image_rect: jnp.ndarray  # int32[T,4] (y0, x0, h, w) window in atlas


def default_textures() -> Textures:
    return Textures(
        tex_type=jnp.zeros((1,), jnp.int32),
        value1=jnp.ones((1, 3), jnp.float32),
        value2=jnp.zeros((1, 3), jnp.float32),
        mapping=jnp.zeros((1,), jnp.int32),
        vs=jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32), (1, 1)),
        vt=jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (1, 1)),
        dsdt=jnp.zeros((1, 2), jnp.float32),
        atlas=jnp.zeros((1, 1, 3), jnp.float32),
        image_rect=jnp.zeros((1, 4), jnp.int32),
    )


def _st(tex: Textures, tex_id, p, uv):
    """Mapped (s, t) (texture.go UVMapping2D.Map / PlanarMapping2D.Map)."""
    mapping = tex.mapping[tex_id]
    vs = tex.vs[tex_id]
    vt = tex.vt[tex_id]
    ds = tex.dsdt[tex_id]
    s_uv = uv[..., 0] * vs[..., 0] + ds[..., 0]
    t_uv = uv[..., 1] * vt[..., 1] + ds[..., 1]
    s_pl = ds[..., 0] + dot(p, vs)
    t_pl = ds[..., 1] + dot(p, vt)
    s = jnp.where(mapping == MAP_UV, s_uv, s_pl)
    t = jnp.where(mapping == MAP_UV, t_uv, t_pl)
    return s, t


def _image_lookup(tex: Textures, tex_id, s, t):
    """Bilinear atlas fetch with wrap addressing.

    s/t are sanitized first: masked (missed) lanes carry garbage uv, and
    a NaN uv makes the bilinear WEIGHTS NaN — harmless forward (the
    result is where-masked) but the gather adjoint then scatters
    NaN * 0-cotangent into the ATLAS gradient, poisoning inverse
    rendering (round-5 fix, pinned by tests/test_grad.py)."""
    s = jnp.nan_to_num(s, nan=0.0, posinf=0.0, neginf=0.0)
    t = jnp.nan_to_num(t, nan=0.0, posinf=0.0, neginf=0.0)
    rect = tex.image_rect[tex_id]  # [...,4]
    y0, x0, h, w = rect[..., 0], rect[..., 1], rect[..., 2], rect[..., 3]
    h = jnp.maximum(h, 1)
    w = jnp.maximum(w, 1)
    fx = (s % 1.0) * w.astype(jnp.float32) - 0.5
    fy = (t % 1.0) * h.astype(jnp.float32) - 0.5
    x_lo = jnp.floor(fx).astype(jnp.int32)
    y_lo = jnp.floor(fy).astype(jnp.int32)
    ax = fx - x_lo.astype(jnp.float32)
    ay = fy - y_lo.astype(jnp.float32)

    def fetch(yy, xx):
        yy = y0 + (yy % h)
        xx = x0 + (xx % w)
        return tex.atlas[yy, xx]

    c00 = fetch(y_lo, x_lo)
    c01 = fetch(y_lo, x_lo + 1)
    c10 = fetch(y_lo + 1, x_lo)
    c11 = fetch(y_lo + 1, x_lo + 1)
    ax = ax[..., None]
    ay = ay[..., None]
    return (
        c00 * (1 - ax) * (1 - ay)
        + c01 * ax * (1 - ay)
        + c10 * (1 - ax) * ay
        + c11 * ax * ay
    )


def _bump_int(x):
    """∫₀ˣ (checker parity) closed form: floor(x/2) + 2·max(x/2 − floor(x/2)
    − .5, 0) — the PBRT box-filtered checkerboard helper (the reference
    declares the ClosedForm AA method but never implements it,
    checkerboard.go:8-13,38-39)."""
    h = x * 0.5
    return jnp.floor(h) + 2.0 * jnp.maximum(h - jnp.floor(h) - 0.5, 0.0)


def _checker_filtered(v1, v2, s, t, fw_s, fw_t):
    """Box-filtered checkerboard over the (s,t) filter footprint: exact
    fractional coverage of the two colours (PBRT's ClosedForm branch)."""
    ds = jnp.maximum(fw_s, 1e-8)
    dt = jnp.maximum(fw_t, 1e-8)
    s0, s1 = s - ds, s + ds
    t0, t1 = t - dt, t + dt
    # fraction of [x0,x1] covered by odd checks along one axis
    s_int = (_bump_int(s1) - _bump_int(s0)) / (2.0 * ds)
    t_int = (_bump_int(t1) - _bump_int(t0)) / (2.0 * dt)
    area2 = s_int + t_int - 2.0 * s_int * t_int  # odd-parity area fraction
    area2 = jnp.clip(area2, 0.0, 1.0)
    return v1 * (1.0 - area2)[..., None] + v2 * area2[..., None]


def eval_spectrum(tex: Textures, tex_id, p, uv, fw=None):
    """Evaluate spectrum texture tex_id (batched, tex_id may vary per lane).

    Checkerboard: floor(s)+floor(t) parity (checkerboard.go:30-40); when a
    filter footprint ``fw`` (f32[N] width in world units, from the ray-cone
    tracker replacing the reference's ray differentials,
    camera.go:192-242 + interaction.go:225-297) is given, the box-filtered
    closed form is used instead — the AA method the reference declares but
    leaves unimplemented (checkerboard.go:8-13).
    tex_id < 0 returns value-less black (callers treat <0 as constant kd).
    """
    safe_id = jnp.maximum(tex_id, 0)
    ttype = tex.tex_type[safe_id]
    v1 = tex.value1[safe_id]
    v2 = tex.value2[safe_id]
    s, t = _st(tex, safe_id, p, uv)
    parity = (jnp.floor(s).astype(jnp.int32) + jnp.floor(t).astype(jnp.int32)) % 2
    checker = jnp.where((parity == 0)[..., None], v1, v2)
    if fw is not None:
        # world-space cone width -> (s,t) widths via the mapping scale:
        # planar mapping is linear (|vs|, |vt| per world unit); uv mapping
        # uses the same row vectors' [su, sv] scales against dpdu-free
        # footprint (conservative: treat uv ≈ world here; exact duvdx needs
        # dpdu projection, done by the caller when available)
        vs = tex.vs[safe_id]
        vt = tex.vt[safe_id]
        scale_s = jnp.sqrt(jnp.sum(vs * vs, axis=-1))
        scale_t = jnp.sqrt(jnp.sum(vt * vt, axis=-1))
        checker_aa = _checker_filtered(
            v1, v2, s, t, fw * scale_s, fw * scale_t
        )
        checker = checker_aa
    uv_dbg = jnp.stack([uv[..., 0] % 1.0, uv[..., 1] % 1.0, jnp.zeros_like(s)], axis=-1)
    img = _image_lookup(tex, safe_id, s, t)
    out = jnp.where(
        (ttype == TEX_CONSTANT)[..., None],
        v1,
        jnp.where(
            (ttype == TEX_CHECKERBOARD)[..., None],
            checker,
            jnp.where((ttype == TEX_UV)[..., None], uv_dbg, img),
        ),
    )
    return jnp.where((tex_id < 0)[..., None], 0.0, out)
