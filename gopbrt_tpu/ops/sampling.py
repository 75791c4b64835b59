"""Monte-Carlo sampling warps, 1D distributions, low-discrepancy sequences.

Counterpart of ``pkg/pbrt/sampling.go`` (warps, Distribution1D, MIS
heuristics) and ``pkg/pbrt/lowdiscrepancy.go`` (radical inverse) — all as
pure, batch-vectorised functions.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from gopbrt_tpu.ops.geom import (
    ONE_MINUS_EPSILON,
    PI,
    INV_PI,
    INV_2PI,
    INV_4PI,
    PI_OVER_2,
    PI_OVER_4,
)

# ---------------------------------------------------------------------------
# Warps (sampling.go:147-202)
# ---------------------------------------------------------------------------


def uniform_sample_hemisphere(u: jnp.ndarray) -> jnp.ndarray:
    z = u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2 * PI * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def uniform_hemisphere_pdf() -> float:
    return INV_2PI


def uniform_sample_sphere(u: jnp.ndarray) -> jnp.ndarray:
    z = 1.0 - 2.0 * u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2 * PI * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def uniform_sphere_pdf() -> float:
    return INV_4PI


def uniform_sample_cone(u: jnp.ndarray, cos_theta_max) -> jnp.ndarray:
    cos_theta = (1.0 - u[..., 0]) + u[..., 0] * cos_theta_max
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = 2 * PI * u[..., 1]
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def uniform_cone_pdf(cos_theta_max):
    return 1.0 / (2.0 * PI * (1.0 - cos_theta_max))


def concentric_sample_disk(u: jnp.ndarray) -> jnp.ndarray:
    """Shirley–Chiu concentric disk map (sampling.go ConcentricSampleDisk)."""
    off = 2.0 * u - 1.0
    ox, oy = off[..., 0], off[..., 1]
    zero = (ox == 0.0) & (oy == 0.0)
    use_x = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(use_x, ox, oy)
    safe = lambda a, b: a / jnp.where(b == 0.0, 1.0, b)
    theta = jnp.where(
        use_x, PI_OVER_4 * safe(oy, ox), PI_OVER_2 - PI_OVER_4 * safe(ox, oy)
    )
    pt = r[..., None] * jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
    return jnp.where(zero[..., None], 0.0, pt)


def cosine_sample_hemisphere(u: jnp.ndarray) -> jnp.ndarray:
    d = concentric_sample_disk(u)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - d[..., 0] ** 2 - d[..., 1] ** 2))
    return jnp.concatenate([d, z[..., None]], axis=-1)


def cosine_hemisphere_pdf(cos_theta):
    return cos_theta * INV_PI


def uniform_sample_triangle(u: jnp.ndarray) -> jnp.ndarray:
    """Barycentric (b0, b1) uniform on a triangle."""
    su0 = jnp.sqrt(u[..., 0])
    return jnp.stack([1.0 - su0, u[..., 1] * su0], axis=-1)


# ---------------------------------------------------------------------------
# MIS heuristics (sampling.go:204-212)
# ---------------------------------------------------------------------------


def balance_heuristic(nf, f_pdf, ng, g_pdf):
    return (nf * f_pdf) / (nf * f_pdf + ng * g_pdf)


def power_heuristic(nf, f_pdf, ng, g_pdf):
    f = nf * f_pdf
    g = ng * g_pdf
    denom = f * f + g * g
    return jnp.where(denom > 0.0, f * f / jnp.where(denom > 0.0, denom, 1.0), 0.0)


# ---------------------------------------------------------------------------
# Distribution1D (sampling.go:5-55): CDF tables as arrays.
# Build happens at scene-setup time; sampling is a vectorised searchsorted.
# ---------------------------------------------------------------------------


def distribution_1d(func: jnp.ndarray):
    """Build (func, cdf, func_int) from non-negative weights func[n].

    Counterpart of NewDistribution1D.  Uniform fallback when all-zero.
    """
    func = jnp.asarray(func, jnp.float32)
    n = func.shape[-1]
    cdf = jnp.concatenate(
        [jnp.zeros(func.shape[:-1] + (1,), jnp.float32), jnp.cumsum(func, axis=-1) / n],
        axis=-1,
    )
    func_int = cdf[..., -1]
    cdf = jnp.where(
        func_int[..., None] > 0.0,
        cdf / jnp.where(func_int[..., None] > 0.0, func_int[..., None], 1.0),
        jnp.arange(n + 1, dtype=jnp.float32) / n,
    )
    return func, cdf, func_int


def sample_discrete(func, cdf, func_int, u):
    """Sample index ~ func; returns (index, pmf). Vectorised over u."""
    n = func.shape[-1]
    idx = jnp.clip(jnp.searchsorted(cdf, u, side="right") - 1, 0, n - 1)
    pmf = jnp.where(
        func_int > 0.0, jnp.take(func, idx, axis=-1) / (jnp.maximum(func_int, 1e-30) * n), 1.0 / n
    )
    return idx, pmf


def sample_discrete_rows(func_rows, cdf_rows, int_rows, u):
    """Per-lane discrete sampling from *row-wise* distributions: lane i
    samples from (func_rows[i], cdf_rows[i]).  Powers the spatial light
    distribution (the reference declares LightStrategy Spatial but returns
    nil, lightdistribution.go:11-19 — implemented here).  Vectorised
    comparison-count replaces searchsorted (L is small)."""
    n = func_rows.shape[-1]
    idx = jnp.clip(
        jnp.sum((cdf_rows <= u[..., None]).astype(jnp.int32), axis=-1) - 1,
        0,
        n - 1,
    )
    f = jnp.take_along_axis(func_rows, idx[..., None], axis=-1)[..., 0]
    pmf = jnp.where(
        int_rows > 0.0, f / (jnp.maximum(int_rows, 1e-30) * n), 1.0 / n
    )
    return idx, pmf


def pmf_rows(func_rows, int_rows, idx):
    """pmf that sample_discrete_rows would return index ``idx`` per lane."""
    n = func_rows.shape[-1]
    f = jnp.take_along_axis(func_rows, idx[..., None], axis=-1)[..., 0]
    return jnp.where(
        int_rows > 0.0, f / (jnp.maximum(int_rows, 1e-30) * n), 1.0 / n
    )


def sample_continuous(func, cdf, func_int, u):
    """Sample x in [0,1) ~ func; returns (x, pdf, index)."""
    n = func.shape[-1]
    idx = jnp.clip(jnp.searchsorted(cdf, u, side="right") - 1, 0, n - 1)
    c0 = jnp.take(cdf, idx)
    c1 = jnp.take(cdf, idx + 1)
    du = jnp.where(c1 > c0, (u - c0) / jnp.where(c1 > c0, c1 - c0, 1.0), u - c0)
    pdf = jnp.where(func_int > 0, jnp.take(func, idx) / jnp.maximum(func_int, 1e-30), 0.0)
    x = (idx.astype(jnp.float32) + du) / n
    return x, pdf, idx


# ---------------------------------------------------------------------------
# Low-discrepancy: radical inverse (lowdiscrepancy.go:210-244) as pure fns.
# Used for Halton-style samplers and shape solid-angle estimates.
# ---------------------------------------------------------------------------

# first 64 primes — enough dimensions for depth-10 paths with ~5 dims/bounce
PRIMES = np.array(
    [
        2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61,
        67, 71, 73, 79, 83, 89, 97, 101, 103, 107, 109, 113, 127, 131, 137,
        139, 149, 151, 157, 163, 167, 173, 179, 181, 191, 193, 197, 199, 211,
        223, 227, 229, 233, 239, 241, 251, 257, 263, 269, 271, 277, 281, 283,
        293, 307, 311,
    ],
    dtype=np.uint32,
)


def reverse_bits_32(x: jnp.ndarray) -> jnp.ndarray:
    x = jnp.asarray(x).astype(jnp.uint32)
    x = ((x << 16) | (x >> 16)) & jnp.uint32(0xFFFFFFFF)
    x = ((x & jnp.uint32(0x00FF00FF)) << 8) | ((x & jnp.uint32(0xFF00FF00)) >> 8)
    x = ((x & jnp.uint32(0x0F0F0F0F)) << 4) | ((x & jnp.uint32(0xF0F0F0F0)) >> 4)
    x = ((x & jnp.uint32(0x33333333)) << 2) | ((x & jnp.uint32(0xCCCCCCCC)) >> 2)
    x = ((x & jnp.uint32(0x55555555)) << 1) | ((x & jnp.uint32(0xAAAAAAAA)) >> 1)
    return x


def radical_inverse_base2(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.minimum(
        reverse_bits_32(a).astype(jnp.float32) * jnp.float32(2.3283064365386963e-10),
        jnp.float32(ONE_MINUS_EPSILON),
    )


def radical_inverse(base_index: int, a: jnp.ndarray) -> jnp.ndarray:
    """RadicalInverse (lowdiscrepancy.go:226-244) for a *static* base index.

    Fixed-iteration digit loop (16 digits covers uint32 for base>=3).
    """
    if base_index == 0:
        return radical_inverse_base2(a)
    base = int(PRIMES[base_index])
    inv_base = 1.0 / base
    a = jnp.asarray(a).astype(jnp.uint32)
    rev = jnp.zeros_like(a)
    inv_base_n = jnp.ones(a.shape, jnp.float32)
    n_digits = int(np.ceil(32 / np.log2(base)))
    for _ in range(n_digits):
        live = a > 0  # mask = PBRT's `for a > 0` loop, avoids u32 overflow
        digit = a % base
        rev = jnp.where(live, rev * base + digit, rev)
        inv_base_n = jnp.where(live, inv_base_n * inv_base, inv_base_n)
        a = a // base
    return jnp.minimum(
        rev.astype(jnp.float32) * inv_base_n, jnp.float32(ONE_MINUS_EPSILON)
    )
