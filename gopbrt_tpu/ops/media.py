"""Participating media: transmittance + phase functions.

The reference defines the interfaces only — ``Medium{Tr, Sample}``,
``PhaseFunction`` (``pkg/pbrt/medium.go:5-25``) and the Henyey–Greenstein
phase function (``pkg/pbrt/interaction.go:309-331``) — but ships no
concrete medium: ``handleMedia`` is always false in its integrators
(path.go:85).  Here the interface set is completed with a working
homogeneous medium (Beer–Lambert transmittance + distance sampling), used
by the volumetric-transmittance shadow path (``Scene.IntersectTr`` /
``VisibilityTester.Tr``, scene.go:58-77 / light.go:50-73 analogue).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gopbrt_tpu.ops.geom import INV_4PI, PI, dot


class HomogeneousMedium(NamedTuple):
    """sigma_a/sigma_s per RGB channel, HG asymmetry g.  A single global
    medium (the "camera medium"); bounded regions use MediaTable below."""

    sigma_a: jnp.ndarray  # f32[3]
    sigma_s: jnp.ndarray  # f32[3]
    g: jnp.ndarray  # f32[]

    @property
    def sigma_t(self) -> jnp.ndarray:
        return self.sigma_a + self.sigma_s


class MediaTable(NamedTuple):
    """SoA table of homogeneous media for PER-PRIMITIVE medium interfaces
    (the working MediumAccessor/MediumInterface, ``pkg/pbrt/medium.go:15-25``
    — the reference declares the accessors but ships no concrete Medium).

    Each primitive carries (medium_inside, medium_outside) ids into this
    table; -1 everywhere means vacuum.  Rays track their current medium id
    per lane; id -1 samples zero sigma (no attenuation, no scattering), so
    vacuum lanes flow through the same math at no radiometric cost.
    """

    sigma_a: jnp.ndarray  # f32[M,3]
    sigma_s: jnp.ndarray  # f32[M,3]
    g: jnp.ndarray  # f32[M]

    @property
    def count(self) -> int:
        return self.sigma_a.shape[0]


def table_lookup(media: MediaTable, mid: jnp.ndarray):
    """Per-lane medium coefficients: (sigma_t[N,3], sigma_s[N,3], g[N]).

    mid int32[N]; -1 (vacuum) yields zeros.  The table is tiny, so the
    gather is a one-hot matmul under the hood (ops/intersect.gather_rows).
    """
    from gopbrt_tpu.ops.intersect import gather_rows

    safe = jnp.maximum(mid, 0)
    in_med = (mid >= 0)[..., None].astype(jnp.float32)
    sig_t = gather_rows(media.sigma_a + media.sigma_s, safe) * in_med
    sig_s = gather_rows(media.sigma_s, safe) * in_med
    g = media.g[safe] * in_med[..., 0]
    return sig_t, sig_s, g


def transmittance(medium: HomogeneousMedium, dist: jnp.ndarray) -> jnp.ndarray:
    """Beer–Lambert Tr = exp(-sigma_t * d) (Medium.Tr).  dist[N] -> [N,3]."""
    return jnp.exp(-medium.sigma_t * jnp.maximum(dist, 0.0)[..., None])


def sample_distance(medium: HomogeneousMedium, u: jnp.ndarray, channel: jnp.ndarray):
    """Sample a scattering distance ~ sigma_t exp(-sigma_t d) on the chosen
    RGB channel (Medium.Sample).  Returns t; the spectral channel-MIS
    throughput weight is the caller's job (integrators._bounce_once).
    The single home of the distance-sampling clamps."""
    st = medium.sigma_t[channel]
    return -jnp.log(jnp.maximum(1.0 - u, 1e-7)) / jnp.maximum(st, 1e-20)


def hg_phase(cos_theta: jnp.ndarray, g) -> jnp.ndarray:
    """Henyey–Greenstein p(cosθ) (interaction.go:309-317 PhaseHG)."""
    denom = 1.0 + g * g + 2.0 * g * cos_theta
    return INV_4PI * (1.0 - g * g) / jnp.maximum(
        denom * jnp.sqrt(jnp.maximum(denom, 1e-12)), 1e-12
    )


def hg_sample(u: jnp.ndarray, g) -> jnp.ndarray:
    """Sample cosθ ~ HG where θ is measured from the PROPAGATION direction
    (-wo): E[cosθ] = g, forward scattering for g > 0.  NOTE the convention:
    ``hg_phase`` takes dot(wo, wi) (PBRT PhaseHG, interaction.go:309-317),
    whose mean is -g — callers building wi in a frame around wo must negate
    this cosine (see ``sample_phase``)."""
    g = jnp.asarray(g)
    iso = jnp.abs(g) < 1e-3
    cos_iso = 1.0 - 2.0 * u
    sq = (1.0 - g * g) / jnp.maximum(1.0 - g + 2.0 * g * u, 1e-10)
    two_g = jnp.where(jnp.abs(g) < 5e-4, 1e-3, 2.0 * g)  # sign-preserving
    cos_hg = (1.0 + g * g - sq * sq) / two_g
    return jnp.where(iso, cos_iso, jnp.clip(cos_hg, -1.0, 1.0))


def sample_phase(wo: jnp.ndarray, u2: jnp.ndarray, g):
    """Sample a scattered direction from the HG phase function at a medium
    vertex (PhaseFunction.SampleP, interaction.go:319-331).

    wo[..., 3] points BACK along the incoming ray (toward the previous
    vertex, PBRT convention).  Returns (wi, pdf) with wi[..., 3] the new
    propagation direction and pdf == hg_phase(dot(wo, wi), g) — HG
    importance-samples itself exactly, so f/pdf == 1.

    Forward scattering (g > 0) concentrates wi around -wo (the ray keeps
    going); this is the fix for the round-2 mirror-flip (ADVICE r2 #1):
    dot(wo, wi) must follow hg_phase(., g), whose mean is -g, so the
    propagation-frame cosine from ``hg_sample`` is negated here.
    """
    from gopbrt_tpu.ops import geom

    cos_t = -hg_sample(u2[..., 0], g)  # distributed as hg_phase(., g)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 2.0 * PI * u2[..., 1]
    vx, vy = geom.coordinate_system(wo)
    wi = (
        vx * (sin_t * jnp.cos(phi))[..., None]
        + vy * (sin_t * jnp.sin(phi))[..., None]
        + wo * cos_t[..., None]
    )
    return wi, hg_phase(cos_t, g)
