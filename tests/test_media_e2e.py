"""End-to-end participating-media tests: the volumetric transmittance path
the reference plumbs but can never exercise (Scene.IntersectTr
scene.go:58-77, VisibilityTester.Tr light.go:50-73, handleMedia
integrator.go:110-117 — no concrete Medium exists there).

Here a scene-level HomogeneousMedium drives (a) Beer-Lambert attenuation of
camera->surface segments via distance-sampling weights, (b) Tr on every NEE
shadow ray, and (c) HG in-scatter vertices.  Each test has an analytic or
quadrature expectation.
"""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from gopbrt_tpu.models import integrators
from gopbrt_tpu.models.scene import SceneBuilder


def _disk_light_scene(sigma_a=None, sigma_s=None, g=0.0):
    """White matte disk at z=0 facing +z; point light on the axis at z=3."""
    b = SceneBuilder()
    m = b.matte(kd=(1.0, 1.0, 1.0))
    b.disk(np.eye(4), radius=50.0, material=m)
    # I = 9*pi so the unattenuated radiance at the disk center is exactly 1:
    # L = kd/pi * cos(0) * I / r^2 = (1/pi) * 9*pi / 9 = 1
    b.point_light((0.0, 0.0, 3.0), (9 * math.pi,) * 3)
    if sigma_a is not None:
        b.set_medium(sigma_a, sigma_s or (0.0, 0.0, 0.0), g)
    return b.build(accelerator="none")


def _trace_center(scene, n=20000, depth=1, o=(0.0, 0.0, 5.0), d=(0.0, 0.0, -1.0)):
    o = jnp.broadcast_to(jnp.asarray(o, jnp.float32), (n, 3))
    d = jnp.broadcast_to(jnp.asarray(d, jnp.float32), (n, 3))
    pix = jnp.arange(n, dtype=jnp.uint32)
    L = integrators.li(
        scene, o, d, pix, jnp.uint32(0), jnp.uint32(7),
        integrators.PathConfig(max_depth=depth),
    )
    return np.asarray(L).mean(axis=0)


class TestBeerLambertAttenuation:
    def test_fog_attenuates_point_light_exponentially(self):
        """Camera 5 units from the disk, light 3 units: radiance must drop
        by exp(-sigma_t * (5 + 3)) — segment Tr (distance-sampling weight)
        times shadow-ray Tr (VisibilityTester.Tr analogue)."""
        clear = _trace_center(_disk_light_scene())
        sigma = 0.1
        foggy = _trace_center(_disk_light_scene(sigma_a=(sigma,) * 3), n=60000)
        expected = math.exp(-sigma * (5.0 + 3.0))
        assert clear[0] == pytest.approx(1.0, rel=0.02)
        ratio = foggy / clear
        np.testing.assert_allclose(ratio, expected, rtol=0.05)

    def test_chromatic_absorption(self):
        """Per-channel sigma_a attenuates channels independently."""
        clear = _trace_center(_disk_light_scene())
        sig = (0.02, 0.08, 0.2)
        foggy = _trace_center(_disk_light_scene(sigma_a=sig), n=60000)
        expected = np.exp(-np.asarray(sig) * 8.0)
        np.testing.assert_allclose(foggy / clear, expected, rtol=0.08)


class TestInScattering:
    def test_single_scatter_matches_quadrature(self):
        """A ray through isotropic fog past a point light: the in-scattered
        radiance must match the single-scattering line integral
          L = int_0^inf Tr(s) sigma_s p_iso I Tr(r(s)) / r(s)^2 ds.
        depth=1 truncates after the first scatter vertex, so the estimator
        computes exactly the single-scattering term."""
        sigma_a, sigma_s = 0.18, 0.02  # sigma_t = 0.2, albedo 0.1
        light_p = np.array([0.0, 2.0, -10.0])
        intensity = 50.0

        b = SceneBuilder()
        m = b.matte(kd=(0.0, 0.0, 0.0))
        # keep one far-away black sphere so the scene is non-empty
        far = np.eye(4)
        far[:3, 3] = (0.0, -500.0, 0.0)
        b.sphere(far, 1.0, m)
        b.point_light(tuple(light_p), (intensity,) * 3)
        b.set_medium((sigma_a,) * 3, (sigma_s,) * 3, g=0.0)
        scene = b.build(accelerator="none")

        got = _trace_center(
            scene, n=120000, depth=1, o=(0.0, 0.0, 0.0), d=(0.0, 0.0, -1.0)
        )

        # quadrature along the ray
        st = sigma_a + sigma_s
        s = np.linspace(0.0, 60.0 / st, 400000)
        p = np.stack([np.zeros_like(s), np.zeros_like(s), -s], axis=-1)
        r = np.linalg.norm(p - light_p, axis=-1)
        integrand = (
            np.exp(-st * s) * sigma_s * (1.0 / (4 * math.pi))
            * intensity * np.exp(-st * r) / r**2
        )
        expected = np.trapezoid(integrand, s)
        np.testing.assert_allclose(got, expected, rtol=0.06)

    def test_hg_anisotropy_shifts_energy(self):
        """With g>0 (forward scattering), a light BEHIND the ray origin
        receives less in-scattered NEE than with g<0 (backward), sanity for
        the phase-function NEE branch."""
        def run(g):
            b = SceneBuilder()
            m = b.matte(kd=(0.0, 0.0, 0.0))
            far = np.eye(4)
            far[:3, 3] = (0.0, -500.0, 0.0)
            b.sphere(far, 1.0, m)
            b.point_light((0.0, 0.0, 6.0), (50.0,) * 3)  # behind the origin
            b.set_medium((0.1,) * 3, (0.1,) * 3, g=g)
            scene = b.build(accelerator="none")
            return _trace_center(
                scene, n=40000, depth=1, o=(0.0, 0.0, 0.0), d=(0.0, 0.0, -1.0)
            )[0]

        forward, backward = run(0.7), run(-0.7)
        assert backward > 2.0 * forward

    def test_multibounce_anisotropic_matches_numpy_reference(self):
        """Depth-3 anisotropic (g=0.7) in-scattering in a surface-free fog
        against an independently written NumPy tracer (same physics, the
        textbook propagation-frame formulation).  Exercises the
        phase-SAMPLED continuation at depth >= 2 — the path that was
        mirror-flipped in round 2 (ADVICE r2 #1)."""
        sigma_a, sigma_s, g = 0.05, 0.25, 0.7
        light_p = np.array([0.0, 2.0, -8.0])
        intensity, depth = 40.0, 3

        b = SceneBuilder()
        m = b.matte(kd=(0.0, 0.0, 0.0))
        far = np.eye(4)
        far[:3, 3] = (0.0, -500.0, 0.0)
        b.sphere(far, 1.0, m)
        b.point_light(tuple(light_p), (intensity,) * 3)
        b.set_medium((sigma_a,) * 3, (sigma_s,) * 3, g=g)
        scene = b.build(accelerator="none")
        got = _trace_center(
            scene, n=150000, depth=depth, o=(0.0, 0.0, 0.0), d=(0.0, 0.0, -1.0)
        )

        # --- independent NumPy reference (propagation-frame convention:
        # cos(theta) has mean g w.r.t. the CURRENT direction of travel) ---
        rng = np.random.default_rng(11)
        n = 400000
        st = sigma_a + sigma_s
        o = np.zeros((n, 3))
        d = np.tile([0.0, 0.0, -1.0], (n, 1))
        beta = np.ones(n)
        L = np.zeros(n)

        def hg_std(c):  # standard HG: peak at c=+1 for g>0, mean cosine g
            return (1 - g * g) / (4 * np.pi * (1 + g * g - 2 * g * c) ** 1.5)

        for _ in range(depth):
            t = -np.log1p(-rng.random(n)) / st
            p = o + d * t[:, None]
            beta = beta * (sigma_s / st)  # Tr*sigma_s/pdf for a gray medium
            wl = light_p - p
            r = np.linalg.norm(wl, axis=-1)
            wl = wl / r[:, None]
            ph = hg_std(np.sum(d * wl, axis=-1))
            L += beta * ph * intensity * np.exp(-st * r) / r**2
            # HG continuation around the propagation direction d; f/pdf = 1
            sq = (1 - g * g) / (1 - g + 2 * g * rng.random(n))
            c = np.clip((1 + g * g - sq * sq) / (2 * g), -1.0, 1.0)
            s = np.sqrt(np.maximum(1 - c * c, 0.0))
            phi = 2 * np.pi * rng.random(n)
            a = np.where(np.abs(d[:, 0:1]) < 0.9, [[1.0, 0, 0]], [[0, 1.0, 0]])
            vx = np.cross(a, d)
            vx /= np.linalg.norm(vx, axis=-1, keepdims=True)
            vy = np.cross(d, vx)
            d = (
                vx * (s * np.cos(phi))[:, None]
                + vy * (s * np.sin(phi))[:, None]
                + d * c[:, None]
            )
            o = p
        expected = L.mean()
        np.testing.assert_allclose(got, expected, rtol=0.08)


class TestDirectIntegratorMedium:
    def test_li_direct_attenuates_segments_and_shadows(self):
        """li_direct under fog: absorption-only — camera segment Tr times
        shadow-ray Tr, same exp(-sigma*(5+3)) as the path integrator on a
        pure-absorption scene (ADVICE r2 #2: round 2 attenuated only the
        shadow ray)."""
        import jax.numpy as jnp2

        def direct_center(scene, n=50000):
            o = jnp2.broadcast_to(jnp2.asarray([0.0, 0.0, 5.0]), (n, 3))
            d = jnp2.broadcast_to(jnp2.asarray([0.0, 0.0, -1.0]), (n, 3))
            pix = jnp2.arange(n, dtype=jnp2.uint32)
            L = integrators.li_direct(
                scene, o, d, pix, jnp2.uint32(0), jnp2.uint32(7), max_depth=2
            )
            return np.asarray(L).mean(axis=0)

        sigma = 0.1
        clear = direct_center(_disk_light_scene())
        foggy = direct_center(_disk_light_scene(sigma_a=(sigma,) * 3))
        np.testing.assert_allclose(
            foggy / clear, math.exp(-sigma * 8.0), rtol=0.05
        )


class TestMediumOffByDefault:
    def test_no_medium_identical_to_round1_path(self):
        """Scenes without set_medium compile no medium code and keep the
        medium=None pytree slot."""
        scene = _disk_light_scene()
        assert scene.medium is None
