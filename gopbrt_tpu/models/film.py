"""Film: filtered sample accumulation as differentiable scatter-add.

Replaces the reference's Film/FilmTile machinery — per-worker tiles with a
filter-table rasterizer merged under a mutex (``pkg/pbrt/film.go:211-248``
AddSample, ``:115-132`` MergeFilmTile) — with a single scatter-add over the
whole image.  There is no tile/mutex analogue: on TPU every sample's filter
taps become ``image.at[py, px].add(w * L)``, XLA turns that into a fused
scatter, and cross-device accumulation is a ``psum`` (parallel/shard.py).

Fixes reference quirk #2 (SURVEY §6): WriteImage ignores filterWeightSum
and gamma (film.go:142-179).  ``develop`` normalizes by the weight sum and
applies sRGB encoding by default; ``compat_go=True`` reproduces the
reference behaviour for golden comparisons.
"""

from __future__ import annotations

from typing import NamedTuple

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from gopbrt_tpu.ops.filters import Filter, box_filter, evaluate


class Film(NamedTuple):
    """Accumulated film state (a pytree — carried through jit/grad/psum)."""

    rgb: jnp.ndarray  # f32[H,W,3] weighted radiance sum
    weight: jnp.ndarray  # f32[H,W]  filter weight sum


def new_film(width: int, height: int) -> Film:
    return Film(
        rgb=jnp.zeros((height, width, 3), jnp.float32),
        weight=jnp.zeros((height, width), jnp.float32),
    )


def add_samples(film: Film, p_film: jnp.ndarray, L: jnp.ndarray,
                filt: Filter = box_filter(1.0)) -> Film:
    """Splat samples at continuous film coords p_film[N,2] with radiance
    L[N,3] (film.go:211-248 AddSample, vectorised).

    The filter support is rasterized as a static (K x K) footprint of
    scatter taps per sample; out-of-image taps are dropped (mode='drop'),
    which also implements crop windows for free.  Differentiable w.r.t. L.
    """
    h, w = film.weight.shape
    r = filt.radius
    # discrete pixels touched: ceil(p - 0.5 - r) .. floor(p - 0.5 + r)
    k = int(np.floor(2 * r)) + 1
    base_x = jnp.ceil(p_film[:, 0] - 0.5 - r).astype(jnp.int32)
    base_y = jnp.ceil(p_film[:, 1] - 0.5 - r).astype(jnp.int32)
    rgb, wsum = film.rgb, film.weight
    for oy in range(k):
        for ox in range(k):
            px = base_x + ox
            py = base_y + oy
            # offset from pixel center to sample (film.go:232-241)
            dx = px.astype(jnp.float32) + 0.5 - p_film[:, 0]
            dy = py.astype(jnp.float32) + 0.5 - p_film[:, 1]
            fw = evaluate(filt, dx, dy)
            rgb = rgb.at[py, px].add(fw[:, None] * L, mode="drop")
            wsum = wsum.at[py, px].add(fw, mode="drop")
    return Film(rgb=rgb, weight=wsum)


def add_samples_rows(film: Film, row0, jitter: jnp.ndarray, L: jnp.ndarray,
                     filt: Filter = box_filter(1.0)) -> Film:
    """Row-aligned dense splat: one sample per pixel for a contiguous band
    of image rows starting at (traced) row ``row0``.

    Same math as :func:`add_samples`, but because lanes are laid out in
    image order the filter footprint becomes a static set of *shifted
    dense adds* instead of a scatter — on TPU this is the difference
    between ~1 ms and hundreds of ms per wavefront (scatters serialize on
    colliding indices).  Taps that fall outside the image are discarded
    via the pad margins.  Differentiable w.r.t. L.

    jitter: f32[rows, W, 2] sample offset within each pixel in [0, 1)^2.
    L:      f32[rows, W, 3].
    """
    rows, w_img = L.shape[0], L.shape[1]
    h_img = film.weight.shape[0]
    assert film.weight.shape[1] == w_img
    r = filt.radius
    rr = int(np.ceil(r))
    jx = jitter[..., 0]
    jy = jitter[..., 1]
    # samples on padding rows beyond the image contribute nothing — their
    # filter taps would otherwise bleed into the last valid rows
    row_valid = (
        jnp.asarray(row0, jnp.int32) + jnp.arange(rows, dtype=jnp.int32)
    ) < h_img  # [rows]

    acc_rgb = jnp.zeros((rows + 2 * rr, w_img + 2 * rr, 3), jnp.float32)
    acc_w = jnp.zeros((rows + 2 * rr, w_img + 2 * rr), jnp.float32)
    for oy in range(-rr, rr + 1):
        for ox in range(-rr, rr + 1):
            # offset from tap pixel center (x+ox+0.5) to sample (x+jx)
            fw = evaluate(filt, ox + 0.5 - jx, oy + 0.5 - jy)
            fw = jnp.where(row_valid[:, None], fw, 0.0)
            ys = slice(oy + rr, oy + rr + rows)
            xs = slice(ox + rr, ox + rr + w_img)
            acc_rgb = acc_rgb.at[ys, xs].add(fw[..., None] * L)
            acc_w = acc_w.at[ys, xs].add(fw)

    # fold the accumulator band into the film at dynamic row offset;
    # bottom pad has `rows` slack so the final (partially off-image) band
    # clips instead of clamping out of alignment
    pad_rgb = jnp.pad(film.rgb, ((rr, rr + rows), (0, 0), (0, 0)))
    pad_w = jnp.pad(film.weight, ((rr, rr + rows), (0, 0)))
    row0 = jnp.asarray(row0, jnp.int32)
    slab_rgb = jax.lax.dynamic_slice(
        pad_rgb, (row0, 0, 0), (rows + 2 * rr, w_img, 3)
    ) + acc_rgb[:, rr : rr + w_img]
    slab_w = jax.lax.dynamic_slice(
        pad_w, (row0, 0), (rows + 2 * rr, w_img)
    ) + acc_w[:, rr : rr + w_img]
    pad_rgb = jax.lax.dynamic_update_slice(pad_rgb, slab_rgb, (row0, 0, 0))
    pad_w = jax.lax.dynamic_update_slice(pad_w, slab_w, (row0, 0))
    return Film(
        rgb=pad_rgb[rr : rr + h_img], weight=pad_w[rr : rr + h_img]
    )


def splat_band_halo(row0, jitter: jnp.ndarray, L: jnp.ndarray, h_img: int,
                    filt: Filter = box_filter(1.0)):
    """Band splat returning the halo-extended accumulators instead of
    folding into a film: (rgb f32[rows+2*rr, W, 3], w f32[rows+2*rr, W])
    where rr = ceil(filter radius).  The first/last rr rows are the filter
    taps that land on the neighbouring bands — the per-device piece of the
    band-sharded film (parallel/shard.py exchanges them over ICI with
    ppermute instead of psum-ing a replicated full film).

    Same tap math as :func:`add_samples_rows`; samples on padding rows at or
    beyond ``h_img`` are masked out.
    """
    rows, w_img = L.shape[0], L.shape[1]
    r = filt.radius
    rr = int(np.ceil(r))
    jx = jitter[..., 0]
    jy = jitter[..., 1]
    row_valid = (
        jnp.asarray(row0, jnp.int32) + jnp.arange(rows, dtype=jnp.int32)
    ) < h_img
    acc_rgb = jnp.zeros((rows + 2 * rr, w_img + 2 * rr, 3), jnp.float32)
    acc_w = jnp.zeros((rows + 2 * rr, w_img + 2 * rr), jnp.float32)
    for oy in range(-rr, rr + 1):
        for ox in range(-rr, rr + 1):
            fw = evaluate(filt, ox + 0.5 - jx, oy + 0.5 - jy)
            fw = jnp.where(row_valid[:, None], fw, 0.0)
            ys = slice(oy + rr, oy + rr + rows)
            xs = slice(ox + rr, ox + rr + w_img)
            acc_rgb = acc_rgb.at[ys, xs].add(fw[..., None] * L)
            acc_w = acc_w.at[ys, xs].add(fw)
    return acc_rgb[:, rr : rr + w_img], acc_w[:, rr : rr + w_img]


def merge(a: Film, b: Film) -> Film:
    """Combine two accumulations (MergeFilmTile semantics, film.go:115-132
    — but associative/commutative, so it's also the psum reducer)."""
    return Film(rgb=a.rgb + b.rgb, weight=a.weight + b.weight)


@partial(jax.jit, static_argnames=("gamma", "compat_go"))
def develop(film: Film, gamma: bool = True, compat_go: bool = False) -> jnp.ndarray:
    """Resolve accumulated film to display RGB in [0,1] (f32[H,W,3]).

    compat_go reproduces film.go:142-179: no weight normalization, no gamma
    (for golden-image comparison against the reference's PNGs).

    Jitted (round 5): unjitted, the normalize+sRGB chain dispatched op by
    op — ~4.5 s/frame at 1080p through a remote-TPU tunnel vs ~10 ms
    fused, dwarfing the traced render passes in the end-to-end time.
    """
    if compat_go:
        return jnp.clip(film.rgb, 0.0, 1.0)
    img = film.rgb / jnp.maximum(film.weight[..., None], 1e-8)
    img = jnp.maximum(img, 0.0)
    if gamma:
        img = srgb_encode(img)
    return jnp.clip(img, 0.0, 1.0)


def srgb_encode(x: jnp.ndarray) -> jnp.ndarray:
    x = jnp.maximum(x, 0.0)
    return jnp.where(
        x <= 0.0031308, 12.92 * x, 1.055 * jnp.power(jnp.maximum(x, 1e-8), 1 / 2.4) - 0.055
    )


@jax.jit
def _quantize8(img) -> jnp.ndarray:
    return jnp.round(jnp.clip(img, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def to_uint8(img) -> np.ndarray:
    # quantize ON DEVICE (one fused call, 4x smaller D2H transfer)
    return np.asarray(_quantize8(img))


def write_png(path: str, img) -> str:
    """PNG output (film.go:142-179's WriteImage endpoint).

    compress_level=1: zlib's fastest setting cuts the 1080p encode from
    ~0.6 s to ~0.2 s on this class of host for ~15% larger files — the
    encode sits on the serving path (BENCH_NOTES round-5 e2e breakdown).
    """
    from PIL import Image

    Image.fromarray(to_uint8(img)).save(path, compress_level=1)
    return path
