"""Media + quaternion/animated-transform tests (interfaces the reference
left as stubs, completed here)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gopbrt_tpu.ops import geom, media, quaternion as quat


class TestMedia:
    def med(self, sa=0.1, ss=0.4, g=0.0):
        return media.HomogeneousMedium(
            sigma_a=jnp.full((3,), sa), sigma_s=jnp.full((3,), ss),
            g=jnp.asarray(g),
        )

    def test_transmittance_beer_lambert(self):
        m = self.med()
        tr = np.asarray(media.transmittance(m, jnp.asarray([0.0, 1.0, 2.0])))
        np.testing.assert_allclose(tr[0], 1.0)
        np.testing.assert_allclose(tr[1], np.exp(-0.5), rtol=1e-5)
        np.testing.assert_allclose(tr[2], np.exp(-1.0), rtol=1e-5)

    def test_distance_sampling_mean(self):
        m = self.med(sa=0.0, ss=2.0)
        u = jnp.asarray(np.random.default_rng(0).random(1 << 15), jnp.float32)
        t = np.asarray(media.sample_distance(m, u, jnp.zeros((1 << 15,), jnp.int32)))
        np.testing.assert_allclose(t.mean(), 0.5, rtol=0.02)  # mean = 1/sigma_t

    def test_hg_phase_normalizes(self):
        # ∫ p dω = 2π ∫ p(cosθ) dcosθ = 1
        for g in (0.0, 0.4, -0.7):
            c = jnp.linspace(-1.0, 1.0, 4097)
            p = np.asarray(media.hg_phase(c, g))
            integral = 2 * np.pi * np.trapezoid(p, np.asarray(c))
            assert integral == pytest.approx(1.0, rel=1e-3)

    def test_hg_sample_matches_mean_cosine(self):
        # E[cosθ] under HG = g
        for g in (0.0, 0.5, -0.3):
            u = jnp.asarray(np.random.default_rng(1).random(1 << 15), jnp.float32)
            c = np.asarray(media.hg_sample(u, g))
            assert c.mean() == pytest.approx(g, abs=0.02)

    def test_sample_phase_distribution_matches_pdf(self):
        """dot(wo, wi) from sample_phase must follow hg_phase(., g) exactly
        (ADVICE r2 #1: the round-2 version was mirror-flipped for g != 0,
        scattering forward-media backward with an inconsistent pdf)."""
        n = 1 << 16
        rng = np.random.default_rng(3)
        for g in (0.7, -0.4):
            wo = jnp.broadcast_to(
                jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 3)
            )
            u2 = jnp.asarray(rng.random((n, 2)), jnp.float32)
            wi, pdf = media.sample_phase(wo, u2, g)
            wi, pdf = np.asarray(wi), np.asarray(pdf)
            c = np.sum(np.asarray(wo) * wi, axis=-1)
            # unit directions; pdf is consistent with the realized angle
            np.testing.assert_allclose(
                np.linalg.norm(wi, axis=-1), 1.0, atol=1e-5
            )
            np.testing.assert_allclose(
                pdf, np.asarray(media.hg_phase(jnp.asarray(c), g)), rtol=1e-4
            )
            # forward medium (g>0) must continue forward: E[dot(wo,wi)] = -g
            assert c.mean() == pytest.approx(-g, abs=0.02)
            # binned chi-square-style density check against the EXACT HG
            # cdf: F(x) = (1-g^2)/(2g) * (1/(1-g) - 1/sqrt(1+g^2+2gx)),
            # the integral of the marginal 2*pi*hg_phase(., g)
            def cdf(x):
                return (1 - g * g) / (2 * g) * (
                    1.0 / (1 - g) - 1.0 / np.sqrt(1 + g * g + 2 * g * x)
                )

            edges = np.linspace(-1.0, 1.0, 21)
            counts, _ = np.histogram(c, bins=edges)
            expected_mass = cdf(edges[1:]) - cdf(edges[:-1])
            np.testing.assert_allclose(
                counts / n, expected_mass, rtol=0.12, atol=3e-4
            )


class TestQuaternion:
    def test_matrix_roundtrip(self):
        rng = np.random.default_rng(2)
        for _ in range(10):
            axis = rng.normal(size=3)
            deg = rng.uniform(-179, 179)
            m = np.asarray(geom.rotate(deg, axis))
            q = quat.quat_from_matrix(jnp.asarray(m))
            m2 = np.asarray(quat.quat_to_matrix(q))
            np.testing.assert_allclose(m2, m, atol=2e-5)

    def test_slerp_endpoints_and_midpoint(self):
        qa = quat.quat_from_matrix(jnp.asarray(geom.rotate_z(0.0)))
        qb = quat.quat_from_matrix(jnp.asarray(geom.rotate_z(90.0)))
        q_mid = quat.slerp(jnp.asarray(0.5), qa, qb)
        m_mid = np.asarray(quat.quat_to_matrix(q_mid))
        np.testing.assert_allclose(m_mid, np.asarray(geom.rotate_z(45.0)), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(quat.slerp(jnp.asarray(0.0), qa, qb)), np.asarray(qa), atol=1e-6
        )


class TestAnimatedTransform:
    def test_identity_animation(self):
        m = geom.translate([1.0, 2.0, 3.0])
        at = quat.animated_transform(m, m)
        np.testing.assert_allclose(
            np.asarray(quat.interpolate(at, 0.5)), np.asarray(m), atol=1e-6
        )

    def test_translation_animation(self):
        a = geom.translate([0.0, 0.0, 0.0])
        b = geom.translate([10.0, 0.0, 0.0])
        at = quat.animated_transform(a, b)
        mid = np.asarray(quat.interpolate(at, 0.5))
        np.testing.assert_allclose(mid[:3, 3], [5.0, 0.0, 0.0], atol=1e-5)

    def test_rotation_animation_slerps(self):
        # quirk #9: the reference nil-derefs on any real animation; we must
        # interpolate rotations properly
        a = geom.rotate_z(0.0)
        b = geom.rotate_z(90.0)
        at = quat.animated_transform(a, b)
        mid = np.asarray(quat.interpolate(at, 0.5))
        np.testing.assert_allclose(mid, np.asarray(geom.rotate_z(45.0)), atol=1e-4)

    def test_mixed_trs(self):
        a = np.asarray(geom.matmul(geom.translate([1.0, 0.0, 0.0]), geom.rotate_x(10.0)))
        b = np.asarray(geom.matmul(geom.translate([3.0, 0.0, 0.0]), geom.rotate_x(70.0)))
        at = quat.animated_transform(a, b)
        mid = np.asarray(quat.interpolate(at, 0.5))
        expect = np.asarray(
            geom.matmul(geom.translate([2.0, 0.0, 0.0]), geom.rotate_x(40.0))
        )
        np.testing.assert_allclose(mid, expect, atol=1e-3)

    def test_time_clamping(self):
        a = geom.translate([0.0, 0.0, 0.0])
        b = geom.translate([10.0, 0.0, 0.0])
        at = quat.animated_transform(a, b, 0.2, 0.8)
        np.testing.assert_allclose(
            np.asarray(quat.interpolate(at, 0.0)), np.asarray(a), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(quat.interpolate(at, 1.0)), np.asarray(b), atol=1e-5
        )
